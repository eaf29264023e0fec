package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's TimestampType
      // (micros) cannot represent; read it as BIGINT nanos and do all time
      // arithmetic in exact integer nanos (oracle side: epoch_ns(ts)).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}

/** Helpers shared by the query battery. */
object Q {
  val DEC: DecimalType = DecimalType(38, 6)

  /** Order-independent exact sum of a double expression.
    *
    * Per-row cast to DECIMAL(38,6) is deterministic across engines (a binary
    * double can never land exactly on a decimal rounding tie, since ties have
    * a factor of 5^k in the denominator), decimal addition is exact and
    * associative, and the final cast back to double is a single well-defined
    * rounding. Oracle-side mirror: CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE).
    * This makes float aggregates hash-comparable between Spark and DuckDB
    * regardless of partitioning / summation order.
    */
  def dsum(c: Column): Column = sum(c.cast(DEC)).cast("double")

  /** dsum over a window spec. */
  def dsumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DEC)).over(w).cast("double")

  val cnt: Column = count(lit(1))
}
