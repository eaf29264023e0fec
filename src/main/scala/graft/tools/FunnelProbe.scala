package graft.tools

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q91 curation funnel at a given SF: where
  * do the seconds go (filters / exact dedup / pair-gen / components /
  * packing / full ledger)? Run twice per stage to shed codegen warmup.
  *
  * NOTE: the stages here deliberately reproduce the UNBARRIERED,
  * pre-refactor funnel shape (no persist fan-out barriers, no shared `h`
  * column) — this probe exists to measure what the duplicate-subplan
  * problem costs, which is exactly what [[graft.operators.Curation.ledger]]
  * no longer executes. Its per-stage numbers are the baseline the barrier
  * fix was measured against, not a timing of the current operator; the
  * `6_full_ledger` stage times the real operator for the comparison.
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.FunnelProbe" }}} */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val maxId = docs0.agg(max(col("doc_id")).as("id_off"))
    val docs = docs0.unionAll(docs0.filter(col("doc_id") % 50 === 0)
      .crossJoin(broadcast(maxId))
      .select((col("doc_id") + col("id_off") + 1L).as("doc_id"), col("text")))

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"FUNNEL $name run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
      }

    val base = docs.select(col("doc_id"), col("text"),
      qualityScore(col("text")).as("quality"),
      langId(col("text")).as("lang_pred"),
      tokenCount(col("text")).as("n_tokens"))
    val s2 = base.filter(col("quality") >= 0.2 && col("lang_pred") === "en")
    time("1_filters")(s2)
    val ex = s2.withColumn("keeper",
      min("doc_id").over(Window.partitionBy(contentHash(col("text")))))
    val s3 = ex.filter(col("doc_id") === col("keeper"))
      .select("doc_id", "text", "n_tokens")
    time("2_exact")(s3)
    time("3_pairs")(graft.operators.Dedup.ngramJaccardPairs(s3, "doc_id", "text",
      n = 3, minJaccard = 0.3))
    val pairs = graft.operators.Dedup.ngramJaccardPairs(s3, "doc_id", "text",
      n = 3, minJaccard = 0.3)
    time("4_components")(graft.operators.ConnectedComponents
      .components(pairs, "id_a", "id_b"))
    time("5_packs")(graft.operators.Packing.sequentialPacks(
      s3.limit(100000), "doc_id", "text", 256))
    time("6_full_ledger")(graft.operators.Curation.curationLedger(
      docs, "doc_id", "text"))
    spark.stop()
  }
}
