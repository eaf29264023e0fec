package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Dev probe backing SCALE_PROBE_sf1.md's q74 cause analysis: the gate
  * query pins `scan.incremental.snapshot.chunk.size` = 12000 at every SF
  * (to force a real multi-cohort run), so 10× data ⇒ 8× more micro-batches
  * ⇒ the measured 6-7× ratio is per-batch fixed cost, not per-event cost.
  *
  * This probe runs the same source → UpsertSink pipeline with the chunk
  * size scaled to the data (the knob's entire purpose — a production
  * deployment sizes chunks to rows-per-split, reference
  * flink-connector-base `SourceOptions` SCAN_INCREMENTAL_SNAPSHOT_CHUNK_SIZE
  * default 8096 is likewise a per-deployment tuning knob), keeping the
  * micro-batch COUNT constant across SFs. If the engine is per-event
  * linear, the scaled-knob ratio collapses toward ~1-2×.
  *
  * Usage: runMain graft.tools.ScaleKnobProbe <sfDir> <chunkSize> [reps]
  */
object ScaleKnobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val chunkSize = args.lift(1).getOrElse("12000")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = graft.queries.CdcQueries.writeFileProviderTable(spark, dir)
    val times = (1 to reps).map { run =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_knobprobe_")
      graft.queries.Fixtures.deleteTreeOnExit(tmp)
      val stream = spark.readStream.format("cdc-log").option("path", root)
        .option("metadata.columns", "op_offset,row_kind")
        .option("scan.incremental.snapshot.chunk.size", chunkSize)
        .option("scan.snapshot.max-chunks-per-batch", "8")
        .load()
      val state = tmp.resolve("state").toString
      val t0 = System.nanoTime()
      val q = graft.streaming.UpsertSink
        .upsertParquet(stream, Seq("k"), state, numBuckets = 16)
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = graft.streaming.UpsertSink.readState(spark, state).count()
      val el = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.length
      println(f"KNOBPROBE dir=$dir chunkSize=$chunkSize run=$run: " +
        f"$el%.2fs rows=$rows batches>=$batches")
      spark.catalog.clearCache(); System.gc()
      el
    }
    println(f"KNOBPROBE MIN dir=$dir chunkSize=$chunkSize: ${times.min}%.2fs")
    spark.stop()
  }
}
