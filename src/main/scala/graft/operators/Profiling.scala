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
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nn"),
        (if (exact) count_distinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row to one row per column — `stack` keeps it
    // a pure projection (no second aggregation)
    val stackArgs = cols.map { c =>
      s"'$c', ${c}__n, ${c}__nn, ${c}__nd, ${c}__min, ${c}__max"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) as (column, n, n_null, n_distinct, min, max)")
  }
}
