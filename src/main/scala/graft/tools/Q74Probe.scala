package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-micro-batch durations of the q74 streaming gate query,
  * to locate where its wall-clock goes (snapshot cohorts vs log batches vs
  * state-store commit overhead). */
object Q74Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val root = tm("fixture")(graft.queries.CdcQueries.writeFileProviderTable(spark, dir))
    (1 to 2).foreach { run =>
      tm(s"q74 run $run") {
        import org.apache.spark.sql.streaming.Trigger
        val tmp = java.nio.file.Files.createTempDirectory("graft_q74probe_")
        val ss = graft.queries.StreamFixtures.streamSession(spark)
        val stream = ss.readStream.format("cdc-log").option("path", root)
          .option("metadata.columns", "op_offset,row_kind")
          .option("scan.incremental.snapshot.chunk.size", "12000")
          .option("scan.snapshot.max-chunks-per-batch", "8")
          .load()
        val qname = "q74p_" + run
        val q = graft.operators.ChangelogOps.materializeStreaming(stream, Seq("k"))
          .writeStream.outputMode("complete").format("memory").queryName(qname)
          .option("checkpointLocation", tmp.toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        q.recentProgress.foreach { p =>
          println(f"  batch ${p.batchId}%2d rows=${p.numInputRows}%7d " +
            f"total=${p.durationMs.getOrDefault("triggerExecution", 0L)}%6dms " +
            f"addBatch=${p.durationMs.getOrDefault("addBatch", 0L)}%6dms " +
            f"getBatch=${p.durationMs.getOrDefault("getBatch", 0L)}%4dms " +
            f"latestOffset=${p.durationMs.getOrDefault("latestOffset", 0L)}%4dms " +
            f"commit=${p.durationMs.getOrDefault("commitOffsets", 0L)}%4dms")
        }
        ss.table(qname).count()
      }
    }
    spark.stop()
  }
}
