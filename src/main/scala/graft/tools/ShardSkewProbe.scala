package graft.tools

import graft.cdc._
import graft.cdc.provider.{ChangeLogProvider, FileChangeLogProvider, ProviderRegistry}
import org.apache.spark.sql.SparkSession

import java.io.{BufferedWriter, FileWriter}
import java.nio.file.{Files, Paths}

/** Dev probe backing the round-17 event-weighted shard boundaries: the
  * hot-RANGE skew case the round-16 known-limit comment named
  * (CdcLogSource catchupShards — snapshot-equalized boundaries drain a
  * key-concentrated backlog serially). Three interleaved variants over the
  * SAME skewed catch-up (90% of events inside 2% of the keyspace):
  *
  *   A. shards=1              — the reference-parity serial reader
  *                              (BinlogSplitReader.java:194-240).
  *   B. shards=8, fallback    — snapshot-equalized boundaries forced by a
  *                              wrapper that hides logShardBoundaries: the
  *                              hot range lands in ONE shard, so the
  *                              backlog still drains ~serially (the r16
  *                              behavior being fixed).
  *   C. shards=8, weighted    — boundaries split by LOG density (this
  *                              round): every shard carries ~1/8 of the
  *                              events.
  *
  * Expected shape: A ≈ B >> C. Prints per-run times and the A/C, B/C
  * ratios of per-variant minima over 2 reps (interleaved, warm-up trio
  * first — same discipline as Q141Probe).
  *
  * Usage: runMain graft.tools.ShardSkewProbe [events] [keys]
  * (defaults 3,000,000 events over 1,000,000 snapshot keys). */
object ShardSkewProbe {

  /** Delegates everything but hides the weighted-boundary probe — forces
    * the planner's snapshot-equalized fallback (variant B). */
  private final class NoWeights(under: ChangeLogProvider)
    extends graft.cdc.provider.ForwardingChangeLogProvider {
    override protected val delegate: ChangeLogProvider = under
    override def logShardBoundaries(t: TableId, from: Long, to: Long,
        n: Int): Seq[ChunkKey.Key] = Seq.empty
  }

  def main(args: Array[String]): Unit = {
    val events = args.lift(0).map(_.toInt).getOrElse(3000000)
    val keys = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- fixture: uniform snapshot, hot-range log --------------------------
    // hot range = keys [hot0, hot0 + keys/50): 2% of the keyspace carrying
    // 90% of the events; the rest scatter uniformly. Driver-side render —
    // this is a fixture writer, not an engine path (a few hundred MB).
    val root = Files.createTempDirectory("graft_shardskew_")
    val d = root.resolve("db.t")
    Files.createDirectories(d)
    Files.writeString(d.resolve("meta.json"),
      """{"db":"db","table":"t","primaryKey":["k"],"schema":"k BIGINT, v STRING","baseOffset":0}""")
    val hot0 = (keys * 9) / 10
    val hotSpan = math.max(1L, keys / 50)
    def writeLines(path: String)(emit: BufferedWriter => Unit): Unit = {
      val w = new BufferedWriter(new FileWriter(path), 1 << 20)
      try emit(w) finally w.close()
    }
    writeLines(d.resolve("snapshot.jsonl").toString) { w =>
      var k = 1L
      while (k <= keys) { w.write(s"""{"k":$k,"v":"base"}"""); w.newLine(); k += 1 }
    }
    writeLines(d.resolve("log.jsonl").toString) { w =>
      var o = 1L
      while (o <= events) {
        // 9 of 10 events in the hot range, deterministic placement
        val k = if (o % 10 != 0) hot0 + (o * 2654435761L % hotSpan)
                else 1L + (o * 40503L % keys)
        w.write(s"""{"offset":$o,"op":"u","tsMs":$o,"before":{"k":$k,"v":"?"},"after":{"k":$k,"v":"v$o"}}""")
        w.newLine()
        o += 1
      }
    }
    println(s"fixture: $keys snapshot keys, $events events, hot range " +
      s"[$hot0, ${hot0 + hotSpan}) carries 90%")

    val file = new FileChangeLogProvider(root.toString)
    ProviderRegistry.register("skew-weighted", file)
    ProviderRegistry.register("skew-fallback", new NoWeights(file))

    def run(provider: String, shards: Int): Double = {
      import org.apache.spark.sql.streaming.Trigger
      val tmp = Files.createTempDirectory("graft_shardskew_run_")
      val t0 = System.nanoTime()
      val stream = spark.readStream.format("cdc-log")
        .option("provider.name", provider)
        .option("scan.startup.mode", "earliest")
        .option("metadata.columns", "op_offset,row_kind")
        .option("scan.log.catchup.shards", shards.toString)
        .option("scan.log.catchup.min-offsets-per-shard", "256")
        .load()
      val q = graft.streaming.UpsertSink
        .upsertParquet(stream, Seq("k"), tmp.resolve("state").toString, numBuckets = 16)
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      val n = graft.streaming.UpsertSink
        .readState(spark, tmp.resolve("state").toString).count()
      println(f"$provider%s shards=$shards%d: $dt%.2fs ($n rows)")
      val walk = Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder()).iterator()
        .forEachRemaining(p => Files.deleteIfExists(p))
      finally walk.close()
      dt
    }

    // warm-up trio (index builds, codegen), then interleaved 2-rep minima
    run("skew-weighted", 1); run("skew-fallback", 8); run("skew-weighted", 8)
    val serial = Seq(run("skew-weighted", 1), run("skew-weighted", 1)).min
    val fallback = Seq(run("skew-fallback", 8), run("skew-fallback", 8)).min
    val weighted = Seq(run("skew-weighted", 8), run("skew-weighted", 8)).min
    println(f"serial(min)=$serial%.2fs fallback8(min)=$fallback%.2fs " +
      f"weighted8(min)=$weighted%.2fs | serial/weighted=${serial / weighted}%.2fx " +
      f"fallback/weighted=${fallback / weighted}%.2fx")
    val walk = Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder()).iterator()
      .forEachRemaining(p => Files.deleteIfExists(p))
    finally walk.close()
    spark.stop()
  }
}
