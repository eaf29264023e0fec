package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composed pipeline a data team
  * actually runs before tokenization, as ONE auditable operator —
  *
  *   quality filter → language filter → exact dedup → near-dup cluster
  *   dedup → token-budget sequence packing
  *
  * The output is a per-document LEDGER, not just the survivors: every input
  * row appears exactly once with the verdict that removed it (first failing
  * stage wins) or its pack assignment if it survived the whole funnel.
  * Curation decisions are the provenance record auditors and ablation
  * studies need — "why is doc X not in the training set" must be answerable
  * without re-running the pipeline.
  *
  * Every stage is a previously-gated primitive (q28 quality, q29 lang-id,
  * q27 exact groups, q30/q57 Jaccard clusters, q60 packing), so the whole
  * composite is cross-engine-deterministic and sits under the DuckDB hash
  * gate as q91.
  *
  * Scale design (the 100 TB read):
  *   - Stages 1–2 are stateless codegen'd expressions on the scan — no
  *     shuffle, pushed into the same stage as the parquet read.
  *   - Exact dedup shuffles once on md5(text) (uniform keys, no skew).
  *   - Near-dup pair-gen runs ONLY on exact-dedup survivors (strictly
  *     smaller input), via the single-shuffle hashed-shingle self-join of
  *     [[Dedup.ngramJaccardPairs]]; clustering is O(log n) star-contraction.
  *   - Drop sets (exact-dup losers, near-dup losers) are tiny relative to
  *     the corpus — AQE broadcasts them back onto the ledger joins.
  *   - Packing is the distributed prefix-sum of [[Packing.sequentialPacks]]
  *     (range shuffle + O(partitions) offset table, no global window).
  */
object Curation {

  /** Per-document curation ledger: (doc_id, verdict, n_tokens, pack_id).
    *
    * verdict ∈ kept | drop_quality | drop_lang | drop_exact_dup |
    * drop_near_dup, evaluated in that order (a document failing several
    * stages reports the FIRST). pack_id is non-null iff verdict = kept:
    * sequential token-budget packs over the surviving set in id order.
    * Exact-dup groups keep the minimum id; near-dup clusters (connected
    * components of the Jaccard-pair graph over survivors) keep the
    * component's minimum id.
    */
  def curationLedger(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.2, keepLang: String = "en",
      shingleN: Int = 3, minJaccard: Double = 0.3,
      packBudget: Long = 256): DataFrame = {
    val base = docs.select(
      col(idCol).cast("bigint").as("doc_id"),
      col(textCol).as("text"),
      qualityScore(col(textCol)).as("quality"),
      langId(col(textCol)).as("lang_pred"),
      tokenCount(col(textCol)).as("n_tokens"))

    // stages 1+2: stateless filters fused into the scan stage
    val s2 = base.filter(col("quality") >= minQuality &&
      col("lang_pred") === keepLang)

    // stage 3: exact dedup — one shuffle keyed on the content hash
    val ex = s2.withColumn("keeper",
      min("doc_id").over(Window.partitionBy(contentHash(col("text")))))
    val exDrops = ex.filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"), lit(true).as("is_exact_dup"))
    val s3 = ex.filter(col("doc_id") === col("keeper"))
      .select("doc_id", "text", "n_tokens")

    // stage 4: near-dup clusters over the (smaller) survivor set only
    val pairs = Dedup.ngramJaccardPairs(s3, "doc_id", "text",
      n = shingleN, minJaccard = minJaccard)
    val comp = ConnectedComponents.components(pairs, "id_a", "id_b")
    // component = min reachable id, so the keeper is the component id itself
    val ndDrops = comp.filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"), lit(true).as("is_near_dup"))

    // stage 5: pack the survivors on a token budget
    val kept = s3.join(ndDrops.select("doc_id"), Seq("doc_id"), "left_anti")
    val packs = Packing.sequentialPacks(kept, "doc_id", "text", packBudget)
      .select(col("doc_id"), col("pack_id"))

    base
      .join(exDrops, Seq("doc_id"), "left")
      .join(ndDrops, Seq("doc_id"), "left")
      .join(packs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("quality") < minQuality, lit("drop_quality"))
          .when(col("lang_pred") =!= keepLang, lit("drop_lang"))
          .when(col("is_exact_dup"), lit("drop_exact_dup"))
          .when(col("is_near_dup"), lit("drop_near_dup"))
          .otherwise(lit("kept")).as("verdict"),
        col("n_tokens"), col("pack_id"))
  }
}
