package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the "look before you train" step of a corpus
  * pipeline: per-column row/null/distinct counts and numeric ranges in
  * ONE pass over the data.
  *
  * Scale design: all statistics for all columns are computed in a single
  * wide aggregate (one scan, one reduce) rather than a per-column loop of
  * jobs. Exact distinct counts make Spark plan an Expand (each row
  * replicated once per DISTINCT aggregate) — acceptable for a bounded
  * column list; for wide tables swap `exact = false` to HLL++
  * (approx_count_distinct) and the Expand disappears. */
object Profiling {

  /** One output row per profiled numeric column:
    * (column, n, n_null, n_distinct, min, max) — min/max as double. */
  def numericProfile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty)
    // widen a single-split scan first (Par.widen): the count_distinct
    // battery EXPANDS rows (one projection per distinct column) and the
    // partial aggregate fuses into the scan stage — on a one-row-group
    // file all of it ran in a single task
    val dfW = Par.widen(df.select(cols.map(col): _*))
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nn"),
        (if (exact) count_distinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val wide = dfW.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row to one row per column — `stack` keeps it
    // a pure projection (no second aggregation)
    val stackArgs = cols.map { c =>
      s"'$c', ${c}__n, ${c}__nn, ${c}__nd, ${c}__min, ${c}__max"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) as (column, n, n_null, n_distinct, min, max)")
  }

  /** Categorical distribution drift of an increment against a maintained
    * histogram manifest — the daily "did the crawl change shape" monitor
    * of an ingest pipeline. `manifest` is the prior corpus's per-key
    * counts ((keys..., n), maintained by append + sum — addition composes
    * under disjoint doc sets, same soundness as the q105 manifests).
    *
    * Per key the output carries both counts, both totals, each side's
    * share (one IEEE division each — portable), and the EXACT integer
    * cross-product excess = n_today·total_prior − n_prior·total_today
    * (sign = over/under-represented today, zero = perfectly
    * proportional) — integer arithmetic, so the gate hash cannot wobble
    * on float order.
    *
    * Scale shape: one groupBy over TODAY only, a full-outer join of two
    * O(keys) aggregates, totals as a broadcast scalar. Never reads prior
    * rows — the manifest IS the prior corpus's shape. */
  def distributionDrift(today: DataFrame, keys: Seq[String],
      manifest: DataFrame): DataFrame = {
    require(keys.nonEmpty)
    val tc = today.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_today"))
    val pc = manifest.groupBy(keys.map(col): _*).agg(sum(col("n")).as("n_prior"))
    val joined = tc.join(pc, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        coalesce(col("n_today"), lit(0L)).as("n_today"),
        coalesce(col("n_prior"), lit(0L)).as("n_prior")): _*)
    val tot = joined.agg(sum("n_today").as("total_today"),
      sum("n_prior").as("total_prior"))
    joined.crossJoin(broadcast(tot))
      .withColumn("share_today",
        col("n_today").cast("double") / col("total_today").cast("double"))
      .withColumn("share_prior",
        col("n_prior").cast("double") / col("total_prior").cast("double"))
      .withColumn("excess",
        col("n_today") * col("total_prior") - col("n_prior") * col("total_today"))
  }
}
