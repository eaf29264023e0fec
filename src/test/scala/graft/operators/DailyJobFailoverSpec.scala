package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions.contentHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The COMPOSITION failover cell (round-11 verdict #5): q122's legs are
  * individually kill-tested, but the q105/q123 bug class lives in the
  * composition — a daily job killed AFTER its ledger leg appended kept
  * hashes and BEFORE cluster maintenance, then re-run against the same
  * stored tables. The re-run must drain to exactly the uninterrupted
  * run's audit table: [[StagedJob.stagedDelta]] replays each committed
  * leg from its durable pre-append snapshot (never recomputing from the
  * polluted manifests) and [[BucketedOps.idempotentAppend]] makes every
  * landed append a no-op. */
class DailyJobFailoverSpec extends SparkSpec {
  import spark.implicits._

  private val priorDocs = Seq(
    (1L, "alpha beta gamma delta epsilon common tail words here"),
    (2L, "alpha beta gamma delta zeta common tail words here"),
    (10L, "one two three four five six seven eight nine"),
    (20L, "lonely unique text nothing shared with anyone at all"))
    .toDF("doc_id", "text")
  private val todayDocs = Seq(
    (101L, "alpha beta gamma delta epsilon common tail words here"), // exact dup of prior 1
    (102L, "one two three four five six seven eight ten"),           // near-dup of prior 10
    (103L, "totally fresh words never seen in any prior document"),
    (104L, "totally fresh words never seen in any prior document"),  // exact dup of 103
    (105L, "second fresh doc with its own completely new content"))
    .toDF("doc_id", "text")

  /** One independent copy of the stored lake state: kept-hash manifest,
    * assignment table, shingle index — each a fresh bucketed table. */
  private def freshState(tag: String): (String, String, String) = {
    val nonce = System.nanoTime()
    val htbl = BucketedOps.ensureBucketed(
      priorDocs.select(contentHash(col("text")).as("h")),
      s"djf_h_$tag|$nonce", "h", buckets = 4)
    val atbl = BucketedOps.ensureBucketed(
      ConnectedComponents.components(
        Dedup.ngramJaccardPairs(priorDocs, "doc_id", "text", n = 3, minJaccard = 0.3),
        "id_a", "id_b")
        .select(col("node").as("doc_id"), col("component").as("cluster_id")),
      s"djf_a_$tag|$nonce", "doc_id", buckets = 4)
    val audit = BucketedOps.ensureBucketed(
      todayDocs.limit(0).select(col("doc_id"), lit("x").as("verdict"),
        col("doc_id").as("cluster_id")),
      s"djf_audit_$tag|$nonce", "doc_id", buckets = 4)
    (htbl, atbl, audit)
  }

  /** The composed daily job, production-shaped: stage every leg's delta
    * durably against pre-append state, append through the idempotent
    * writer, with `hook` fired between legs (the kill injection point). */
  private def runJob(htbl: String, atbl: String, audit: String,
      stageDir: String, hook: String => Unit): Unit = {
    val s = spark
    // leg 1: incremental curation ledger vs the kept-hash manifest,
    // then append today's kept hashes into it
    val led = StagedJob.stagedDelta(s, stageDir, "ledger") {
      Curation.incrementalCurationLedger(
        todayDocs, s.table(htbl), "doc_id", "text",
        minQuality = 0.0, packIdStart = 100L)
    }
    BucketedOps.idempotentAppend(
      StagedJob.stagedDelta(s, stageDir, "kept-hashes") {
        todayDocs.join(led.filter(col("verdict") === "kept").select("doc_id"),
            Seq("doc_id"))
          .select(contentHash(col("text")).as("h"))
      }, htbl, "h", buckets = 4, jobId = "day2")
    hook("after-ledger")
    // leg 2: cluster maintenance vs the stored assignment
    val delta = StagedJob.stagedDelta(s, stageDir, "clusters") {
      val te = Dedup.ngramJaccardPairs(todayDocs, "doc_id", "text",
        n = 3, minJaccard = 0.3)
      val ce = Dedup.ngramJaccardPairsVsIndex(todayDocs, "doc_id", "text",
        Dedup.shingleIndex(priorDocs, "doc_id", "text", n = 3),
        n = 3, minJaccard = 0.3).filter(col("today_id") =!= col("prior_id"))
      ConnectedComponents.incrementalClusters(
        todayDocs.select("doc_id"), "doc_id",
        te, "id_a", "id_b", ce, "today_id", "prior_id", s.table(atbl))
    }
    BucketedOps.idempotentAppend(delta.select("doc_id", "cluster_id"),
      atbl, "doc_id", buckets = 4, jobId = "day2")
    hook("after-clusters")
    // leg 3: the audit rows the job publishes — ledger x final assignment
    BucketedOps.idempotentAppend(
      StagedJob.stagedDelta(s, stageDir, "audit") {
        led.select(col("doc_id"), col("verdict"))
          .join(delta.filter(col("scope") === "today")
            .select(col("doc_id"), col("cluster_id")), Seq("doc_id"))
      }, audit, "doc_id", buckets = 4, jobId = "day2")
  }

  private def snap(tbl: String): Seq[(Long, String, Long)] =
    spark.table(tbl).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2, x._3)).toSeq

  private def hashes(tbl: String): Seq[String] =
    spark.table(tbl).collect().map(_.getString(0)).sorted.toSeq

  test("kill between legs, re-run on the same stored tables: audit equals the uninterrupted run") {
    // control: the uninterrupted run
    val (h1, a1, au1) = freshState("ctl")
    val stage1 = java.nio.file.Files.createTempDirectory("graft_djf_ctl_")
    stage1.toFile.deleteOnExit()
    runJob(h1, a1, au1, stage1.toString, _ => ())

    // victim: killed after the ledger leg's append landed
    val (h2, a2, au2) = freshState("kill")
    val stage2 = java.nio.file.Files.createTempDirectory("graft_djf_kill_")
    stage2.toFile.deleteOnExit()
    val killed = intercept[RuntimeException] {
      runJob(h2, a2, au2, stage2.toString,
        leg => if (leg == "after-ledger") throw new RuntimeException("injected kill"))
    }
    assert(killed.getMessage == "injected kill")
    // the crash left the manifest already mutated — the exact state a
    // naive recompute-from-tables re-run would misread
    assert(hashes(h2).size > hashes(h1).size - 1, "kill must land after the append")
    runJob(h2, a2, au2, stage2.toString, _ => ()) // the re-run

    assert(snap(au2) == snap(au1),
      "replayed composition diverged from the uninterrupted run")
    assert(hashes(h2) == hashes(h1), "kept-hash manifests diverged")
    assert(spark.table(a2).groupBy("doc_id").agg(min("cluster_id")).collect().toSet
      == spark.table(a1).groupBy("doc_id").agg(min("cluster_id")).collect().toSet,
      "assignment tables diverged")
  }

  test("kill after the cluster leg instead: same convergence (kill-point sweep)") {
    val (h1, a1, au1) = freshState("ctl2")
    val stage1 = java.nio.file.Files.createTempDirectory("graft_djf_ctl2_")
    stage1.toFile.deleteOnExit()
    runJob(h1, a1, au1, stage1.toString, _ => ())
    val (h2, a2, au2) = freshState("kill2")
    val stage2 = java.nio.file.Files.createTempDirectory("graft_djf_kill2_")
    stage2.toFile.deleteOnExit()
    intercept[RuntimeException] {
      runJob(h2, a2, au2, stage2.toString,
        leg => if (leg == "after-clusters") throw new RuntimeException("injected kill"))
    }
    runJob(h2, a2, au2, stage2.toString, _ => ())
    assert(snap(au2) == snap(au1),
      "replay after the cluster-leg kill diverged from the uninterrupted run")
    assert(hashes(h2) == hashes(h1), "kept-hash manifests diverged")
  }

  test("the staged snapshot is load-bearing: a naive recompute after the crash misreads the manifest") {
    val (h3, a3, au3) = freshState("naive")
    val stage3 = java.nio.file.Files.createTempDirectory("graft_djf_naive_")
    stage3.toFile.deleteOnExit()
    intercept[RuntimeException] {
      runJob(h3, a3, au3, stage3.toString,
        leg => if (leg == "after-ledger") throw new RuntimeException("injected kill"))
    }
    // counterfactual: re-deriving the ledger from the LIVE manifest now
    // classifies today's kept docs as prior dups — the bug stagedDelta
    // exists to prevent (the real re-run above reads the staged ledger)
    val naive = Curation.incrementalCurationLedger(
      todayDocs, spark.table(h3), "doc_id", "text",
      minQuality = 0.0, packIdStart = 100L)
    val misread = naive.filter(col("verdict") === "drop_prior_dup").count()
    naive.unpersist()
    assert(misread > 0,
      "expected the polluted manifest to misclassify kept docs — " +
        "if this no longer happens, the counterfactual needs a new shape")
    val _ = (a3, au3)
  }
}
