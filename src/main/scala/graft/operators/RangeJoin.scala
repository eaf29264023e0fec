package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed time-range (interval) join: pairs (l, r) with the same key and
  * `rts ∈ [lts − lower, lts + upper]` (timestamps as integer units, e.g.
  * µs). Spark's native plan for a range predicate under an equi-key is a
  * join-then-filter whose cost is per-key |L|·|R|; this operator buckets
  * time into windows of width `lower + upper`, replicates each LEFT row
  * into the ≤ 2-3 buckets its window can touch, equi-joins on
  * (key, bucket) — a plain hash-shuffle join — and applies the exact range
  * filter after. Replication factor is bounded by 3 regardless of data,
  * so cost is O(|L| + |R| + output), which is the shape that survives at
  * 100 TB (cf. interval-join implementations in stream engines).
  */
object RangeJoin {

  def timeRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      ltsCol: String, rtsCol: String, lower: Long, upper: Long): DataFrame = {
    require(lower >= 0 && upper >= 0)
    val w = math.max(lower + upper, 1L)
    val lB = left.withColumn("__b", explode(sequence(
      expr(s"($ltsCol - $lower) div $w"), expr(s"($ltsCol + $upper) div $w"))))
    val rB = right.withColumn("__b", expr(s"$rtsCol div $w"))
    lB.join(rB, keys :+ "__b")
      .filter(col(rtsCol) >= col(ltsCol) - lower && col(rtsCol) <= col(ltsCol) + upper)
      .drop("__b")
  }
}
