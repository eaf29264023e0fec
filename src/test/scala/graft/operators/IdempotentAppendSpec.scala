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
      spark.table(probe).inputFiles.count(_.contains("graft-append_day2_"))
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

  test("date-shaped jobIds don't prefix-collide: replaying 2026-08 leaves 2026-08-15's files intact") {
    // the `_` delimiter sits outside the jobId charset, so the replay's
    // undo glob for `2026-08` must not match `2026-08-15`'s committed
    // data files (a `-` delimiter made that a silent permanent delete)
    val tbl = freshTable("datejob")
    BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "2026-08-15")
    val afterFirst = sums(tbl)
    assert(afterFirst == expected)
    // jobId `2026-08` is a DIFFERENT logical job: it lands its own copy...
    BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "2026-08")
    val afterBoth = sums(tbl)
    // ...and replaying it (commit marker present → undo glob runs on a
    // no-op path only after a kill; force the undo path by deleting its
    // marker, the worst case for the glob) must only ever delete ITS OWN
    // files, never 2026-08-15's
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(loc, "_graft_append_2026-08.commit"), false)
    BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "2026-08")
    assert(sums(tbl) == afterBoth,
      "replaying jobId 2026-08 corrupted jobId 2026-08-15's committed data")
  }

  test("a mismatched (key, buckets) declaration is rejected before any file moves") {
    val tbl = freshTable("spec")
    val before = spark.table(tbl).inputFiles.sorted.toSeq
    intercept[IllegalArgumentException] {
      BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 8, jobId = "day2")
    }
    intercept[IllegalArgumentException] {
      BucketedOps.idempotentAppend(delta, tbl, "df", buckets = 4, jobId = "day2")
    }
    assert(spark.table(tbl).inputFiles.sorted.toSeq == before,
      "a rejected append must leave the table untouched")
  }

  test("two jobs racing one table: the lease serializes, both days land exactly once") {
    // day-2 and a late day-1 backfill arrive concurrently (round-12
    // verdict #7). The writer lease admits ONE at a time — the loser
    // fails fast with ConcurrentModificationException and retries, the
    // production pattern for a fail-fast advisory lock. After both
    // converge, each day's delta is in the table exactly once.
    val tbl = freshTable("race")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      def attempt(jobId: String): java.util.concurrent.Future[Int] =
        pool.submit({ () =>
          gate.await()
          var tries = 0
          var done = false
          while (!done) {
            tries += 1
            try {
              BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = jobId)
              done = true
            } catch {
              case _: java.util.ConcurrentModificationException => Thread.sleep(50)
            }
          }
          tries
        }: java.util.concurrent.Callable[Int])
      val fa = attempt("day2"); val fb = attempt("backfill-day1")
      gate.countDown()
      fa.get(120, java.util.concurrent.TimeUnit.SECONDS)
      fb.get(120, java.util.concurrent.TimeUnit.SECONDS)
    } finally pool.shutdownNow()
    val deltaSums = delta.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums(tbl) == expected.map { case (k, v) =>
      k -> (v + deltaSums.getOrElse(k, 0L)) },
      "racing jobs must each land exactly once")
    // and each job's replay stays a no-op
    BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "day2")
    BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "backfill-day1")
    assert(sums(tbl) == expected.map { case (k, v) =>
      k -> (v + deltaSums.getOrElse(k, 0L)) })
  }

  test("a crashed holder's stale lease is broken by the OTHER job mid-append") {
    // simulate the crash debris a real process death leaves: a lock file
    // older than the TTL with no live refresher. The second job must
    // break it (single-winner rename), proceed, and land its day.
    val tbl = freshTable("stale")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(loc, "_graft_writer.lock")
    val out = fs.create(lock, false)
    out.write("dead-holder".getBytes("UTF-8")); out.close()
    fs.setTimes(lock, System.currentTimeMillis() -
      graft.streaming.UpsertSink.LeaseTtlMs - 1000, -1)
    BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "day2")
    assert(sums(tbl) == expected,
      "the takeover append must land exactly once over the dead holder's lease")
    // and the dead holder's eventual REPLAY (same jobId as what it was
    // trying to land) converges: marker present → no-op
    BucketedOps.idempotentAppend(delta, tbl, "term", buckets = 4, jobId = "day2")
    assert(sums(tbl) == expected)
  }
}
