package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Approximate (sketch-based) counting — the tier a 100 TB pipeline uses
  * where exact answers cost a full shuffle of the keys:
  *
  *  - HLL++ distinct counts ([[approxDistinct]]): O(1) state per group vs
  *    an O(distinct) exact aggregation — vocabulary / user cardinalities.
  *  - Count-min sketch ([[countMinFrequencies]]): point frequency
  *    estimates with ε·N additive error — hot-key detection feeding
  *    [[SkewOps]] salting decisions without a full frequency table.
  *  - Bloom filter ([[bloomFilterOf]]): set membership with no false
  *    negatives — e.g. "was this doc id in yesterday's corpus" dedup
  *    pre-filters that skip the join for definite-misses.
  *
  * All three are Spark built-ins (codegen'd aggregates / merge-tree sketch
  * builds), wrapped here with the pipeline-facing shapes and error-bound
  * specs (SketchesSpec). Sketch results are engine-local by nature → the
  * gate query is rows-only; the bounds are what the specs assert. */
object Sketches {

  /** Per-group approximate + exact distinct counts (exact column optional
    * at scale; here it doubles as the error reference). */
  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      approx_count_distinct(col(valueCol), rsd).as("approx_distinct"),
      countDistinct(col(valueCol)).as("exact_distinct"),
      count(lit(1)).as("n"))

  /** Count-min sketch of a column, built distributed (merge-combine in the
    * aggregation), returned as a queryable driver-side sketch. */
  def countMinFrequencies(df: DataFrame, valueCol: String,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(valueCol, eps, confidence, seed)

  /** Bloom filter over a column, built distributed. */
  def bloomFilterOf(df: DataFrame, valueCol: String,
      expectedItems: Long, fpp: Double = 0.03): BloomFilter =
    df.stat.bloomFilter(valueCol, expectedItems, fpp)

  /** Membership pre-filter: keep only rows whose `valueCol` might be in
    * `filter` (definite-misses dropped executor-side — the standard join
    * pre-screen). Runs as Spark's own codegen'd
    * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * over the serialized sketch (the same expression the optimizer's
    * injected runtime filters use; it deserializes the literal once per
    * task and calls `mightContainLong` — exactly what the old Scala UDF
    * did, minus the per-row encoder round-trip). This removed the
    * library's last UDF. */
  def mightContain(df: DataFrame, valueCol: String, filter: BloomFilter): DataFrame =
    df.filter(mightContainCol(col(valueCol), filter))

  /** The membership test as a composable Column predicate (negatable —
    * [[graft.operators.Dedup.incrementalNewDocs]] routes definite-misses
    * down a join-free lane with `!mightContainCol(...)`). */
  def mightContainCol(value: org.apache.spark.sql.Column, filter: BloomFilter): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftglue.ColumnGlue
    import org.apache.spark.sql.types.BinaryType
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    ColumnGlue.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      ColumnGlue.expression(value.cast("long"))))
  }
}
