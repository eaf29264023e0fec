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
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__tag")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).as(s"__r_$c")): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__tag")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1)
      .select(keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++ leftCols.map(col) ++
        rightCols.map(c => col(s"__r_$c").as(s"asof_$c")): _*)
  }
}
