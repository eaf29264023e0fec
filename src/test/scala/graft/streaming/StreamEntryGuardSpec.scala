package graft.streaming

import graft.SparkSpec
import graft.operators.BucketedOps
import org.apache.spark.sql.functions._

/** ORPHAN GUARD AT STREAMING ENTRY (round-15 verdict, what's-missing #4 /
  * round-16 ask #5): [[ClusterMaintenanceStream.processBatch]] takes
  * caller-supplied prior-state DataFrames, so nothing in the batch path can
  * check the stored roots — a production caller passing raw
  * `spark.table(...)` over a stranded phase-B swap would stream a WHOLE DAY
  * against a mixed root that every gate read refuses. Pins:
  *
  *   1. [[ClusterMaintenanceStream.openDay]] refuses a mixed root loudly at
  *      stream START (before the first batch), naming the table and cure;
  *      on healthy tables it returns the same resolution as raw reads.
  *   2. [[ClusterMaintenanceStream.closeDay]] refuses a FOREIGN stranded
  *      swap at entry, before any fold work runs (no onStep fires) — while
  *      its OWN cadence compaction's replay stays exempt (the
  *      CompactionCadenceSpec kill cells keep covering convergence).
  */
class StreamEntryGuardSpec extends SparkSpec {
  import spark.implicits._

  private def freshPair(tag: String): (String, String) = {
    val nonce = System.nanoTime()
    val atbl = BucketedOps.ensureBucketed(
      Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "cluster_id"),
      s"seg_a_$tag|$nonce", "doc_id", buckets = 4)
    val itbl = BucketedOps.ensureBucketed(
      Seq((100L, 1L, 3L), (200L, 2L, 4L)).toDF("h", "doc_id", "n_sh"),
      s"seg_i_$tag|$nonce", "h", buckets = 4)
    (atbl, itbl)
  }

  /** Strand a compaction inside phase B under a FOREIGN jobId and never
    * replay it — the state the entry guard exists to make loud. */
  private def strand(tbl: String, key: String): Unit = {
    // the table needs a second generation so phase B has something to mix
    val extra =
      if (key == "doc_id") Seq((9L, 9L)).toDF("doc_id", "cluster_id")
      else Seq((900L, 9L, 1L)).toDF("h", "doc_id", "n_sh")
    BucketedOps.idempotentAppend(extra.repartition(1), tbl, key,
      buckets = 4, jobId = "g2")
    val killed = intercept[RuntimeException] {
      BucketedOps.compactManifest(spark, tbl, key, buckets = 4,
        jobId = "foreign-weekly", resolve = identity,
        onStep = s => if (s == "renamed") throw new RuntimeException("killed"))
    }
    assert(killed.getMessage.contains("killed"))
  }

  test("openDay on healthy tables resolves the same state as raw reads") {
    val (atbl, itbl) = freshPair("ok")
    val (idx, assign) = ClusterMaintenanceStream.openDay(spark, itbl, atbl)
    assert(idx.count() == spark.table(itbl).count())
    assert(assign.groupBy("doc_id").agg(min("cluster_id").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("openDay refuses a mixed assignment root loudly at stream start") {
    val (atbl, itbl) = freshPair("mixa")
    strand(atbl, "doc_id")
    val ex = intercept[IllegalStateException] {
      ClusterMaintenanceStream.openDay(spark, itbl, atbl)
    }
    assert(ex.getMessage.contains(atbl) &&
      ex.getMessage.contains("compact:foreign-weekly"),
      s"refusal must name the table and the stranded swap: ${ex.getMessage}")
  }

  test("openDay refuses a mixed index root too") {
    val (atbl, itbl) = freshPair("mixi")
    strand(itbl, "h")
    val ex = intercept[IllegalStateException] {
      ClusterMaintenanceStream.openDay(spark, itbl, atbl)
    }
    assert(ex.getMessage.contains(itbl))
  }

  test("closeDay refuses a foreign stranded swap at entry, before any fold") {
    val (atbl, itbl) = freshPair("close")
    strand(atbl, "doc_id")
    val tmp = java.nio.file.Files.createTempDirectory("graft_seg_close")
    tmp.toFile.deleteOnExit()
    Seq((300L, 10L, 2L)).toDF("h", "doc_id", "n_sh")
      .write.parquet(tmp.resolve("idx").resolve("batch=0").toString)
    Seq((10L, 5L)).toDF("doc_id", "cluster_id")
      .write.parquet(tmp.resolve("delta").resolve("batch=0").toString)
    var steps = Seq.empty[String]
    val ex = intercept[IllegalStateException] {
      ClusterMaintenanceStream.closeDay(spark,
        tmp.resolve("idx").toString, tmp.resolve("delta").toString,
        itbl, atbl, idxBuckets = 4, assignBuckets = 4, jobId = "day9",
        onStep = s => steps :+= s)
    }
    assert(ex.getMessage.contains(atbl))
    assert(steps.isEmpty, s"entry guard must fire before any fold step: $steps")
  }
}
