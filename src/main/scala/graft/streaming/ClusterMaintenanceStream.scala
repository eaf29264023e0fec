package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, Dedup}

/** Streaming incremental near-dup cluster maintenance — the deployment
  * form of [[graft.operators.ConnectedComponents.incrementalClusters]]:
  * the day's crawl arrives as a micro-batch stream and each batch joins
  * the stored near-dup graph WITHOUT recomputing it (gate q123).
  *
  * State model (all file-based, so a restart resumes from what is on
  * disk):
  *   - the PRIOR corpus enters as two read-only tables — the assignment
  *     (doc_id, cluster_id) and the shingle inverted index
  *     (h, doc_id, n_sh) — exactly [[graft.queries]] q115's stored state;
  *   - arrived docs' shingles spool under `spoolIdx/batch=<id>/`;
  *   - per-batch assignment deltas spool under `spoolDelta/batch=<id>/`.
  *
  * Soundness: added edges only ever MERGE components and labels only
  * ever DECREASE (a label is the min of its component), so
  *   (1) the CURRENT assignment at any point is min(cluster_id) per doc
  *       over (stored ∪ spooled deltas) — no read-modify-write;
  *   (2) applying batches SEQUENTIALLY against that resolved state gives
  *       the same final labels as one-shot clustering over all edges;
  *   (3) a batch REPLAYED after a failure is a no-op: its spool writes
  *       OVERWRITE its own batch=<id> directories (an append would
  *       double the batch's index rows and double the probe join's
  *       `shared` counts — wrong Jaccard), and its delta rows re-derive
  *       identically, collapsing under the min resolve.
  * (1)+(2) are property-pinned in ConnectedComponentsSpec; (3) under a
  * real kill-and-restart in ClusterMaintenanceRestartSpec.
  *
  * Scale shape per batch: the probe joins the batch's shingles against
  * (prior index ∪ spooled index) on the 64-bit shingle key; star
  * contraction runs on the CONTRACTED delta graph (O(|batch| + touched
  * clusters)); spool I/O is O(|batch|). Nothing is O(corpus) per batch.
  */
object ClusterMaintenanceStream {

  /** One micro-batch step — call from foreachBatch. Idempotent per
    * (batchId): replays overwrite their own spool directories. */
  def processBatch(batch: DataFrame, batchId: Long,
      priorIdx: DataFrame, priorAssign: DataFrame,
      spoolIdx: String, spoolDelta: String,
      n: Int = 3, minJaccard: Double = 0.3): Unit = {
    if (batch.isEmpty) return
    val s = batch.sparkSession
    val b = batch.persist(); b.count()
    try {
      Dedup.shingleIndex(b, "doc_id", "text", n = n)
        .write.mode("overwrite").parquet(s"$spoolIdx/batch=$batchId")
      val idx = priorIdx.unionByName(
        s.read.parquet(spoolIdx).select("h", "doc_id", "n_sh"))
      val ce = Dedup.ngramJaccardPairsVsIndex(b, "doc_id", "text",
          idx, n = n, minJaccard = minJaccard)
        .filter(col("today_id") =!= col("prior_id"))
      ConnectedComponents.incrementalClusters(
          b.select("doc_id"), "doc_id",
          ce.limit(0).select(col("today_id").as("id_a"),
            col("prior_id").as("id_b")), "id_a", "id_b",
          ce, "today_id", "prior_id",
          resolvedAssignment(s, priorAssign, spoolDelta))
        .select("doc_id", "cluster_id")
        .write.mode("overwrite").parquet(s"$spoolDelta/batch=$batchId")
    } finally { b.unpersist(); () }
  }

  /** The CURRENT assignment: min(cluster_id) per doc over the stored
    * table ∪ every spooled delta (labels only decrease, so min = latest). */
  def resolvedAssignment(s: SparkSession, priorAssign: DataFrame,
      spoolDelta: String): DataFrame =
    (if (new java.io.File(spoolDelta).exists)
       priorAssign.unionByName(
         s.read.parquet(spoolDelta).select("doc_id", "cluster_id"))
     else priorAssign)
      .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))

  /** The drained run's output in q115's contract: every today doc's final
    * assignment (`scope='today'`) plus prior docs whose assignment
    * changed (`scope='prior'`) — what the daily job appends to its
    * assignment table. */
  def finalDelta(s: SparkSession, priorAssign: DataFrame,
      spoolDelta: String, todayIds: DataFrame): DataFrame = {
    val resolved = resolvedAssignment(s, priorAssign, spoolDelta)
    val today = resolved.join(todayIds.select("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("cluster_id"), lit("today").as("scope"))
    val prior = resolved.join(todayIds.select("doc_id"), Seq("doc_id"), "left_anti")
      .join(priorAssign.withColumnRenamed("cluster_id", "orig"),
        Seq("doc_id"), "left")
      .filter(col("cluster_id") =!= coalesce(col("orig"), col("doc_id")))
      .select(col("doc_id"), col("cluster_id"), lit("prior").as("scope"))
    today.unionAll(prior)
  }
}
