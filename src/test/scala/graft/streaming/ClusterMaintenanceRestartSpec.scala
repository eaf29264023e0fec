package graft.streaming

import graft.SparkSpec
import graft.operators.{ConnectedComponents, Dedup}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The q123 deployment's failure story, exercised for real: the crawl
  * stream is KILLED mid-run and restarted against the same checkpoint
  * and spools; Structured Streaming re-runs the last uncommitted batch,
  * so the spool writes must be replay-idempotent (per-batch OVERWRITE
  * directories — an append would double the batch's index rows and
  * corrupt the probe join's shared counts). The drained final delta must
  * equal the one-shot from-scratch labeling regardless of where the kill
  * landed. A direct double-invocation of [[ClusterMaintenanceStream
  * .processBatch]] with the same batchId pins the no-op replay property
  * without relying on where the engine happens to cut batches. */
class ClusterMaintenanceRestartSpec extends SparkSpec {
  import spark.implicits._

  // prior corpus: two near-dup pairs + a singleton; today: docs that
  // bridge INTO the prior clusters and EACH OTHER across batches
  private val priorDocs = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta zeta"),
    (10L, "one two three four five"),
    (11L, "one two three four six"),
    (20L, "lonely unique text nothing shared")).toDF("doc_id", "text")
  private val todayDocs = Seq(
    (101L, "alpha beta gamma delta seven"),   // joins cluster {1,2}
    (102L, "one two three four seven"),       // joins {10,11}; bridges via 101? no — distinct
    (103L, "alpha beta gamma delta seven"),   // near-dup of 101 (cross-batch)
    (104L, "totally fresh words here now"),   // singleton
    (105L, "one two three four seven"),       // near-dup of 102 (cross-batch)
    (106L, "lonely unique text nothing else")) // attaches singleton 20
    .toDF("doc_id", "text")

  private def groundTruth: Map[Long, (Long, String)] = {
    val all = priorDocs.unionAll(todayDocs)
    val full = ConnectedComponents.components(
      Dedup.ngramJaccardPairs(all, "doc_id", "text", n = 3, minJaccard = 0.3),
      "id_a", "id_b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prior = ConnectedComponents.components(
      Dedup.ngramJaccardPairs(priorDocs, "doc_id", "text", n = 3, minJaccard = 0.3),
      "id_a", "id_b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val todayIds = todayDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    val priorIds = priorDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    val t = todayIds.map(n => n -> (full.getOrElse(n, n), "today"))
    val p = priorIds.flatMap { n =>
      val now = full.getOrElse(n, n); val was = prior.getOrElse(n, n)
      if (now != was) Some(n -> (now, "prior")) else None
    }
    (t ++ p).toMap
  }

  test("kill mid-stream, restart on the same checkpoint: delta matches one-shot") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms_restart_")
    tmp.toFile.deleteOnExit()
    val in = tmp.resolve("in").toString
    // 6 docs as 6 part files, 1 per micro-batch under maxFilesPerTrigger=1
    todayDocs.repartitionByRange(6, col("doc_id")).sortWithinPartitions("doc_id")
      .write.parquet(in)
    val priorIdx = Dedup.shingleIndex(priorDocs, "doc_id", "text", n = 3)
    val priorAssign = ConnectedComponents.components(
      Dedup.ngramJaccardPairs(priorDocs, "doc_id", "text", n = 3, minJaccard = 0.3),
      "id_a", "id_b")
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
      .persist()
    priorAssign.count()
    val spoolIdx = tmp.resolve("idx").toString
    val spoolDelta = tmp.resolve("delta").toString
    val ckpt = tmp.resolve("ckpt").toString
    val schema = spark.read.parquet(in).schema
    val batchesSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(killAfter: Int): Option[Throwable] = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          ClusterMaintenanceStream.processBatch(
            b, id, priorIdx, priorAssign, spoolIdx, spoolDelta)
          if (batchesSeen.incrementAndGet() == killAfter)
            throw new RuntimeException("injected kill")
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try { q.awaitTermination(); None }
      catch { case t: Throwable => Some(t) }
    }
    // deterministic kill point: maxFilesPerTrigger=1 over 6 single-row
    // part files = 6 batches; the kill fires after batch id=2's spools
    // are written but BEFORE its checkpoint commit, so the restart
    // REPLAYS batch 2 against its own prior spool output
    val killed = run(killAfter = 3)
    assert(killed.isDefined, "the injected kill must surface from the first run")
    assert(batchesSeen.get() == 3, "the kill must land mid-stream")
    // the restart run itself must terminate WITHOUT exception — a replay
    // that crashes (e.g. overwriting spool files its own plan reads,
    // the q105 race) must fail the spec here, not just via a diverged map
    val restart = run(killAfter = Int.MaxValue)
    assert(restart.isEmpty,
      s"the restarted run must replay cleanly, but threw: ${restart.mkString}")

    val got = ClusterMaintenanceStream.finalDelta(
        spark, priorAssign, spoolDelta, spark.read.parquet(in))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got == groundTruth,
      s"restarted run diverged from one-shot:\n got=$got\n exp=$groundTruth")
    priorAssign.unpersist()
  }

  test("kill mid-stream, restart, DAY CLOSE: folded tables equal the uninterrupted day's") {
    // the round-13 lifecycle composed with round-12's failure story: a
    // day-2 stream crashes mid-run, restarts from its checkpoint, drains,
    // and then the day CLOSES (closeDay folds spools into the stored
    // bucketed tables and clears them). The folded state — what day 3
    // reads — must be bit-equal to an uninterrupted day's fold.
    import graft.operators.BucketedOps
    def runDay(tag: String, killAfter: Int): (String, String) = {
      val nonce = System.nanoTime()
      val atbl = BucketedOps.ensureBucketed(
        ConnectedComponents.components(
          Dedup.ngramJaccardPairs(priorDocs, "doc_id", "text", n = 3, minJaccard = 0.3),
          "id_a", "id_b")
          .select(col("node").as("doc_id"), col("component").as("cluster_id")),
        s"cmsf_a_$tag|$nonce", "doc_id", buckets = 4)
      val itbl = BucketedOps.ensureBucketed(
        Dedup.shingleIndex(priorDocs, "doc_id", "text", n = 3),
        s"cmsf_i_$tag|$nonce", "h", buckets = 4)
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_cmsf_$tag")
      tmp.toFile.deleteOnExit()
      val in = tmp.resolve("in").toString
      todayDocs.repartitionByRange(6, col("doc_id")).sortWithinPartitions("doc_id")
        .write.parquet(in)
      val priorIdx = spark.table(itbl).persist()
      val priorAssign = spark.table(atbl).persist()
      priorIdx.count(); priorAssign.count()
      val spoolIdx = tmp.resolve("idx").toString
      val spoolDelta = tmp.resolve("delta").toString
      val schema = spark.read.parquet(in).schema
      val seen = new java.util.concurrent.atomic.AtomicInteger(0)
      def drain(kill: Int): Option[Throwable] = {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(in)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            ClusterMaintenanceStream.processBatch(
              b, id, priorIdx, priorAssign, spoolIdx, spoolDelta)
            if (seen.incrementAndGet() == kill)
              throw new RuntimeException("injected kill")
          }
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(Trigger.AvailableNow()).start()
        try { q.awaitTermination(); None }
        catch { case t: Throwable => Some(t) }
      }
      if (killAfter < Int.MaxValue) {
        assert(drain(killAfter).isDefined, s"[$tag] kill must surface")
        assert(drain(Int.MaxValue).isEmpty, s"[$tag] restart must replay cleanly")
      } else assert(drain(Int.MaxValue).isEmpty)
      ClusterMaintenanceStream.closeDay(spark, spoolIdx, spoolDelta,
        itbl, atbl, idxBuckets = 4, assignBuckets = 4, jobId = "day2")
      priorIdx.unpersist(); priorAssign.unpersist()
      assert(!tmp.resolve("idx").toFile.exists() && !tmp.resolve("delta").toFile.exists(),
        s"[$tag] day close must clear the spools")
      (atbl, itbl)
    }
    def resolution(atbl: String): Map[Long, Long] =
      spark.table(atbl).groupBy("doc_id").agg(min("cluster_id").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def idxRows(itbl: String): Set[(Long, Long, Long)] =
      spark.table(itbl).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (ca, ci) = runDay("ctl", Int.MaxValue)
    val (va, vi) = runDay("kill", killAfter = 3)
    assert(resolution(va) == resolution(ca),
      "restarted+folded assignment diverged from the uninterrupted day's")
    assert(idxRows(vi) == idxRows(ci),
      "restarted+folded shingle index diverged from the uninterrupted day's")
    // and the folded labeling is the from-scratch ground truth
    val all = priorDocs.unionAll(todayDocs)
    val full = ConnectedComponents.components(
      Dedup.ngramJaccardPairs(all, "doc_id", "text", n = 3, minJaccard = 0.3),
      "id_a", "id_b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // lake convention: a doc absent from the assignment table labels
    // itself (prior singletons never stored, unchanged attachments never
    // appended) — compare under that resolution
    val res = resolution(ca)
    all.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      assert(res.getOrElse(id, id) == full.getOrElse(id, id),
        s"doc $id: folded resolution ${res.getOrElse(id, id)} != " +
          s"from-scratch ${full.getOrElse(id, id)}")
    }
  }

  test("replaying a batch with the same batchId is a spool no-op") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms_replay_")
    tmp.toFile.deleteOnExit()
    val spoolIdx = tmp.resolve("idx").toString
    val spoolDelta = tmp.resolve("delta").toString
    val priorIdx = Dedup.shingleIndex(priorDocs, "doc_id", "text", n = 3)
    val priorAssign = ConnectedComponents.components(
      Dedup.ngramJaccardPairs(priorDocs, "doc_id", "text", n = 3, minJaccard = 0.3),
      "id_a", "id_b")
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
    val batch = todayDocs.filter(col("doc_id") <= 103L)
    ClusterMaintenanceStream.processBatch(batch, 0L, priorIdx, priorAssign,
      spoolIdx, spoolDelta)
    val once = ClusterMaintenanceStream.resolvedAssignment(
      spark, priorAssign, spoolDelta).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idxOnce = spark.read.parquet(spoolIdx).count()
    // the failure-mode replay: same batch, same id, spools already written
    ClusterMaintenanceStream.processBatch(batch, 0L, priorIdx, priorAssign,
      spoolIdx, spoolDelta)
    val twice = ClusterMaintenanceStream.resolvedAssignment(
      spark, priorAssign, spoolDelta).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twice == once, "replay changed the resolved assignment")
    assert(spark.read.parquet(spoolIdx).count() == idxOnce,
      "replay duplicated the batch's spooled index rows")
  }
}
