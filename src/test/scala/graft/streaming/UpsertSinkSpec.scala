package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def row(k: Long, v: Double, op: String, off: Long, rk: String) =
    (k, v, op, off, rk)
  private val cols = Seq("k", "v", "op", "op_offset", "row_kind")

  test("streamed upsert materializes across micro-batches and restarts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_upsert_")
    val in = tmp.resolve("in").toString
    val out = tmp.resolve("state").toString
    val ckpt = tmp.resolve("ckpt").toString

    // run 1: insert k=1,2; update k=1
    Seq(row(1L, 10.0, "c", 1, "+I"), row(2L, 20.0, "c", 2, "+I"),
      row(1L, 10.0, "u", 3, "-U"), row(1L, 11.0, "u", 3, "+U"))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def runOnce(): Unit = {
      UpsertSink.recover(spark, out)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val q = UpsertSink.upsertParquet(stream, Seq("k"), out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    val s1 = spark.read.parquet(out).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(s1.toSeq == Seq((1L, 11.0), (2L, 20.0)))

    // run 2 (restart, same checkpoint): delete k=2, insert k=3
    Seq(row(2L, 20.0, "d", 4, "+I"), row(3L, 30.0, "c", 5, "+I"))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(in)
    runOnce()
    val s2 = spark.read.parquet(out).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(s2.toSeq == Seq((1L, 11.0), (3L, 30.0)))
  }

  test("replaying a batch is a no-op (idempotent merge algebra)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_upsert2_")
    val out = tmp.resolve("state").toString
    val b1 = Seq(row(1L, 1.0, "c", 1, "+I"), row(2L, 2.0, "c", 2, "+I")).toDF(cols: _*)
    val b2 = Seq(row(1L, 1.5, "u", 3, "+U"), row(2L, 2.0, "d", 4, "+I")).toDF(cols: _*)
    UpsertSink.mergeBatch(b1, Seq("k"), out)
    UpsertSink.mergeBatch(b2, Seq("k"), out)
    val once = spark.read.parquet(out).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    UpsertSink.mergeBatch(b2, Seq("k"), out) // failure replay
    val twice = spark.read.parquet(out).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(once == Seq((1L, 1.5)) && twice == once)
  }

  test("recover restores the last complete snapshot after a torn swap") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_upsert3_")
    val out = tmp.resolve("state").toString
    UpsertSink.mergeBatch(
      Seq(row(7L, 7.0, "c", 1, "+I")).toDF(cols: _*), Seq("k"), out)
    // simulate a crash between the two renames: target gone, __old present
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(out),
      new org.apache.hadoop.fs.Path(out + "__old"))
    UpsertSink.recover(spark, out)
    assert(spark.read.parquet(out).count() == 1)
  }
}
