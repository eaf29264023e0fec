package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the latest right
  * row with the same key and `rightTs <= leftTs`. The staple of CDC state
  * reconstruction ("what did the dimension look like when this event
  * happened?") and feature back-filling in training pipelines. Spark has no
  * native operator; the naive range join explodes to |L|·|R| per key.
  *
  * Implementation: tag and union both sides, sort within each key by
  * (ts, tag) — right rows sort before left rows at equal timestamps, giving
  * inclusive `<=` semantics — and carry right-side values forward with
  * last(ignoreNulls) over an unbounded-preceding window. Cost: ONE shuffle
  * on the key + an in-partition sort, independent of time-range sizes —
  * the same plan shape a merge-based ASOF join uses in native engines.
  * At 100 TB this is the only shape that survives: no per-row range probe,
  * no broadcast of a time-versioned table.
  */
object AsOfJoin {

  /** @param left      event side
    * @param right     versioned side (deduplicate to one row per (key, ts)
    *                  first if ties are possible — ties are otherwise
    *                  resolved by which row sorts last)
    * @param keys      equi-join key columns (same names on both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightCols right value columns to attach (null when no match) */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == leftTs).toSeq
    // All right value columns ride in ONE struct carried by a single
    // last(ignoreNulls) — so the attached values always come from the same
    // matched right row. (Carrying each column independently would let an
    // older non-null value resurrect over the latest row's genuine NULL,
    // mixing fields of different right rows.) A right row whose values are
    // all NULL is still a non-null struct, so it correctly shadows earlier
    // rows; rows with no match at all yield a NULL struct → NULL fields.
    val rType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__tag")) ++
        leftCols.map(col) ++
        Seq(lit(null).cast(rType).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__tag")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(rightCols.map(c => col(c).as(c)): _*).as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__tag") === 1)
      .select(keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++ leftCols.map(col) ++
        rightCols.map(c => col("__r").getField(c).as(s"asof_$c")): _*)
  }
}
