package graft.streaming

import graft.SparkSpec
import graft.operators.BucketedOps
import org.apache.spark.sql.functions._

/** COMPACTION CADENCE (round-14 verdict, what's-missing #3 / round-15 ask
  * #3): the generation machinery must be SELF-OPERATING — nothing bounds
  * the documented O(days) generation growth if compactManifest only runs
  * when a user remembers it exists. [[BucketedOps.compactIfDue]] is the
  * policy leg (compact when `every`+ append generations are stored, or
  * when this jobId's own swap is caught mid-phase-B), and
  * [[ClusterMaintenanceStream.closeDay]]'s `compactEveryGenerations`
  * wires it into the day close. Pins:
  *
  *   1. THE POLICY — below threshold: no-op; at threshold: compacts,
  *      resolution unchanged, generation count resets so the next call is
  *      not due; the decision re-derives identically on replay.
  *   2. THE RE-TRIGGER — a phase-B crash may drop the generation count
  *      below threshold, but the unfinished-swap check still fires, so a
  *      replayed day close resumes the orphan instead of stranding it for
  *      the read guard to refuse on.
  *   3. THE WIRING — closeDay folds, then compacts both tables when due,
  *      then vacuums; a kill between the two compactions replays to
  *      convergence; q136 gates the whole choreography under q119's
  *      oracle.
  */
class CompactionCadenceSpec extends SparkSpec {
  import spark.implicits._

  private val sumResolve = (d: org.apache.spark.sql.DataFrame) =>
    d.groupBy("term").agg(sum("df").as("df"))

  private def sums(tbl: String): Map[String, Long] =
    spark.table(tbl).groupBy("term").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def freshDf(tag: String): String = {
    val tbl = BucketedOps.ensureBucketed(
      Seq(("a", 10L), ("b", 20L)).toDF("term", "df"),
      s"cad_$tag|${System.nanoTime()}", "term", buckets = 4)
    BucketedOps.idempotentAppend(
      Seq(("a", 1L), ("c", 3L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "day2")
    tbl
  }

  private val expectedDf = Map("a" -> 11L, "b" -> 20L, "c" -> 3L)

  test("compactIfDue: below threshold no-op, at threshold compacts and resets the count") {
    val tbl = freshDf("policy")
    assert(BucketedOps.appendGenerations(spark, tbl) == 1)
    // one stored generation, every=2: not due — files untouched
    val files = spark.table(tbl).inputFiles.sorted.toSeq
    assert(!BucketedOps.compactIfDue(spark, tbl, "term", buckets = 4,
      jobId = "wk1", resolve = sumResolve, every = 2))
    assert(spark.table(tbl).inputFiles.sorted.toSeq == files,
      "a not-due policy call must not touch the table")
    // second generation lands: now due
    BucketedOps.idempotentAppend(
      Seq(("b", 2L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "day3")
    assert(BucketedOps.appendGenerations(spark, tbl) == 2)
    assert(BucketedOps.compactIfDue(spark, tbl, "term", buckets = 4,
      jobId = "wk1", resolve = sumResolve, every = 2))
    assert(sums(tbl) == (expectedDf + ("b" -> 22L)),
      "policy-triggered compaction changed what readers resolve")
    assert(BucketedOps.appendGenerations(spark, tbl) == 0,
      "the swap must reset the generation count")
    // freshly compacted: the next identical policy call is not due
    assert(!BucketedOps.compactIfDue(spark, tbl, "term", buckets = 4,
      jobId = "wk2", resolve = sumResolve, every = 2))
  }

  test("compactIfDue re-triggers an unfinished swap even when the count fell below threshold") {
    val tbl = freshDf("retrigger")
    // orphan a compaction late in phase B: the old generations are already
    // retired (deleted), so the append-generation count reads 0
    intercept[RuntimeException] {
      BucketedOps.compactManifest(spark, tbl, "term", buckets = 4,
        jobId = "wk1", resolve = sumResolve,
        onStep = s => if (s == "retired") throw new RuntimeException("killed"))
    }
    assert(BucketedOps.appendGenerations(spark, tbl) == 0,
      "precondition: the partial swap should have renamed the append away")
    assert(BucketedOps.hasUnfinishedCompaction(spark, tbl, "wk1"))
    // the count alone says "not due" — the unfinished check must override
    assert(BucketedOps.compactIfDue(spark, tbl, "term", buckets = 4,
      jobId = "wk1", resolve = sumResolve, every = 99),
      "an unfinished swap must re-trigger regardless of the threshold")
    assert(!BucketedOps.hasUnfinishedCompaction(spark, tbl, "wk1"))
    assert(BucketedOps.readMaintained(spark, tbl)
        .groupBy("term").agg(sum("df").as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expectedDf,
      "the resumed swap must converge and lift the read guard")
  }

  test("compactIfDue due-by-count with an already-committed jobId returns false (replay-safe, not a silent success)") {
    val tbl = freshDf("reuse")
    // commit a compaction under 'wk1', then let a new generation accumulate
    BucketedOps.compactManifest(spark, tbl, "term", buckets = 4,
      jobId = "wk1", resolve = sumResolve)
    BucketedOps.idempotentAppend(
      Seq(("d", 7L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "day4")
    assert(BucketedOps.appendGenerations(spark, tbl) == 1)
    // due by count, but 'wk1' already committed: compactManifest would
    // no-op on its marker while a `true` return reports the cadence ran.
    // The honest-and-replay-safe answer is FALSE (ADVICE_r16 #2): a killed
    // closeDay replayed with the SAME jobId after a foreign append landed
    // must converge, not throw — and the constant-jobId abuser sees false
    // every day instead of a green API over unbounded generations.
    assert(!BucketedOps.compactIfDue(spark, tbl, "term", buckets = 4,
      jobId = "wk1", resolve = sumResolve, every = 1),
      "an already-committed jobId's cadence must report false, not re-run")
    assert(BucketedOps.appendGenerations(spark, tbl) == 1,
      "the false-returning call must not have touched the table")
    // a fresh jobId compacts as the policy intends
    assert(BucketedOps.compactIfDue(spark, tbl, "term", buckets = 4,
      jobId = "wk2", resolve = sumResolve, every = 1))
    assert(BucketedOps.appendGenerations(spark, tbl) == 0)
    assert(sums(tbl) == (expectedDf + ("d" -> 7L)))
  }

  /** closeDay fixture — FoldFailoverSpec's stored state + spools. */
  private def fresh(tag: String): (String, String, java.nio.file.Path) = {
    val nonce = System.nanoTime()
    val atbl = BucketedOps.ensureBucketed(
      Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "cluster_id"),
      s"cadday_a_$tag|$nonce", "doc_id", buckets = 4)
    val itbl = BucketedOps.ensureBucketed(
      Seq((100L, 1L, 3L), (200L, 2L, 4L)).toDF("h", "doc_id", "n_sh"),
      s"cadday_i_$tag|$nonce", "h", buckets = 4)
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_cadday_$tag")
    tmp.toFile.deleteOnExit()
    Seq((300L, 10L, 2L)).toDF("h", "doc_id", "n_sh")
      .write.parquet(tmp.resolve("idx").resolve("batch=0").toString)
    Seq((10L, 5L), (3L, 1L)).toDF("doc_id", "cluster_id")
      .write.parquet(tmp.resolve("delta").resolve("batch=0").toString)
    (atbl, itbl, tmp)
  }

  private def close(atbl: String, itbl: String, tmp: java.nio.file.Path,
      onStep: String => Unit = _ => ()): Unit =
    ClusterMaintenanceStream.closeDay(spark,
      tmp.resolve("idx").toString, tmp.resolve("delta").toString,
      itbl, atbl, idxBuckets = 4, assignBuckets = 4, jobId = "day2",
      vacuumHorizonMs = Some(7L * 24 * 3600 * 1000),
      compactEveryGenerations = Some(1), onStep = onStep)

  private def resolution(atbl: String): Map[Long, Long] =
    spark.table(atbl).groupBy("doc_id").agg(min("cluster_id").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val expectedRes = Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 10L -> 5L)

  test("closeDay with a cadence: fold, threshold crossed, both tables compacted, vacuum still runs") {
    val (atbl, itbl, tmp) = fresh("wire")
    var steps = Seq.empty[String]
    close(atbl, itbl, tmp, onStep = s => steps :+= s)
    assert(steps.containsSlice(Seq("idx-compacted", "assign-compacted", "vacuumed")) ||
      (steps.contains("idx-compacted") && steps.contains("assign-compacted") &&
        steps.indexOf("vacuumed") > steps.indexOf("assign-compacted")),
      s"fold -> compact -> vacuum ordering broken: $steps")
    assert(resolution(atbl) == expectedRes,
      "cadenced close changed what readers resolve")
    Seq(atbl, itbl).foreach { t =>
      assert(BucketedOps.appendGenerations(spark, t) == 0,
        s"$t not compacted by the policy")
      assert(spark.table(t).inputFiles.forall(_.contains("graft-compact_day2.c")),
        s"$t still holds pre-compaction generations")
    }
    // a replayed close is a pure no-op: folds see no spool, compactions
    // see their commit markers, nothing is due
    val files = spark.table(atbl).inputFiles.sorted.toSeq
    close(atbl, itbl, tmp)
    assert(spark.table(atbl).inputFiles.sorted.toSeq == files,
      "replaying a completed cadenced close changed the table")
  }

  test("kill between the two cadenced compactions: the replayed close lands the second") {
    val (atbl, itbl, tmp) = fresh("killmid")
    val killed = intercept[RuntimeException] {
      close(atbl, itbl, tmp, onStep = s =>
        if (s == "idx-compacted") throw new RuntimeException("injected kill"))
    }
    assert(killed.getMessage.contains("injected kill"))
    // spools are gone (folds completed), idx compacted, assign NOT yet
    assert(BucketedOps.appendGenerations(spark, itbl) == 0)
    assert(BucketedOps.appendGenerations(spark, atbl) == 1)
    close(atbl, itbl, tmp) // the replay
    assert(resolution(atbl) == expectedRes)
    assert(BucketedOps.appendGenerations(spark, atbl) == 0,
      "the replayed close must compact the table the crash skipped")
  }
}
