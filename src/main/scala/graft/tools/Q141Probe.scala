package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe backing the q141 scale notes: the SAME catch-up pipeline
  * (earliest-mode replay of the whole event log into the upsert sink) run
  * serial (shards=1, the reference-parity single binlog reader) vs sharded
  * (shards=8), interleaved A/B with two reps each — the wall-clock LEVER
  * the round-15 verdict asked the shard work to demonstrate
  * (BinlogSplitReader.java:194-240 is the serial design being improved
  * on). Prints per-run times and the serial/sharded ratio of the min. */
object Q141Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = graft.queries.CdcQueries.writeTemporalProviderTable(
      spark, dir, sentinels = false)

    def run(shards: Int): Double = {
      import org.apache.spark.sql.streaming.Trigger
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_q141probe_")
      val t0 = System.nanoTime()
      val stream = spark.readStream.format("cdc-log").option("path", root)
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
      println(f"shards=$shards%d: $dt%.2fs ($n rows materialized)")
      // the count above is the state's only use — drop the run's tree
      // (six multi-million-row states per invocation otherwise pile up)
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder()).iterator()
        .forEachRemaining(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
      dt
    }

    // interleaved A/B, warm-up pair first (fixture index builds, codegen)
    run(1); run(8)
    val serial = Seq(run(1), run(1)).min
    val sharded = Seq(run(8), run(8)).min
    println(f"serial(min)=$serial%.2fs sharded(min)=$sharded%.2fs " +
      f"lever=${serial / sharded}%.2fx")
    spark.stop()
  }
}
