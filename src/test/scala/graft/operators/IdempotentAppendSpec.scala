package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The manifest-append failure story (round-11 verdict #4): the day-2
  * jobs append additive rows (df / hist / bigram counts) into bucketed
  * tables, and a crashed-then-replayed plain append DOUBLE-COUNTS — no
  * resolve algebra saves an additive family. [[BucketedOps
  * .idempotentAppend]] must land one logical day exactly once across any
  * number of crashes: a kill mid-promote is injected for real here, and
  * the replay must converge to the clean single-append state. */
class IdempotentAppendSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): String = {
    val base = Seq(("a", 10L), ("b", 20L), ("c", 30L), ("d", 40L), ("e", 50L))
      .toDF("term", "df")
    BucketedOps.ensureBucketed(base, s"idem_$tag|${System.nanoTime()}", "term", buckets = 4)
  }

  private def delta = Seq(("a", 1L), ("b", 2L), ("f", 7L), ("g", 9L))
    .toDF("term", "df").repartition(1)

  private def sums(tbl: String): Map[String, Long] =
    spark.table(tbl).groupBy("term").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private val expected = Map("a" -> 11L, "b" -> 22L, "c" -> 30L,
    "d" -> 40L, "e" -> 50L, "f" -> 7L, "g" -> 9L)

  test("append lands once; a committed replay is a no-op") {
    val tbl = freshTable("happy")
    BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "day2")
    assert(sums(tbl) == expected)
    val files = spark.table(tbl).inputFiles.sorted.toSeq
    // the failure-mode replay: same jobId, delta already committed
    BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "day2")
    assert(sums(tbl) == expected, "replay after commit double-counted")
    assert(spark.table(tbl).inputFiles.sorted.toSeq == files,
      "replay after commit changed the table's files")
    // a DIFFERENT day is a new logical append and must land
    BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "day3")
    assert(sums(tbl) == expected.map { case (k, v) =>
      k -> (v + delta.collect().map(r => r.getString(0) -> r.getLong(1))
        .toMap.getOrElse(k, 0L)) })
  }

  test("kill at EVERY promote index, replay with the same jobId: delta lands exactly once") {
    // the delta spans >= 2 buckets in one task, so the promote loop moves
    // several files — kill after each one in turn (kill-point sweep, the
    // FailoverMatrix rule: a single kill point can miss an ordering bug)
    val nFiles = {
      val probe = freshTable("probe")
      BucketedOps.idempotentAppend(delta, probe, "term", buckets = 4, jobId = "day2")
      spark.table(probe).inputFiles.count(_.contains("graft-append-day2-"))
    }
    assert(nFiles >= 2, s"need a multi-file promote to sweep, got $nFiles")
    (1 to nFiles).foreach { killAt =>
      val tbl = freshTable(s"kill$killAt")
      val killed = intercept[RuntimeException] {
        BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4,
          jobId = "day2", onFilePromoted = n =>
            if (n == killAt) throw new RuntimeException("injected kill mid-promote"))
      }
      assert(killed.getMessage.contains("injected kill"))
      // torn state: some files promoted, no commit marker — a reader sees a
      // monotone under-count, never a double-count
      val torn = sums(tbl)
      assert(torn.forall { case (k, v) => v <= expected(k) },
        s"torn state after kill@$killAt must under-count, got $torn")
      // the replayed job must first UNDO the partial promote, then land clean
      BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "day2")
      assert(sums(tbl) == expected,
        s"replay after kill@$killAt did not converge to the single append")
    }
  }

  test("the promoted files keep the bucketed layout: grouping on the key stays exchange-free") {
    val tbl = freshTable("plan")
    BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "day2")
    val plan = spark.table(tbl).groupBy("term").agg(sum("df"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket placement lost across the promote — aggregate shuffled:\n$plan")
  }
}
