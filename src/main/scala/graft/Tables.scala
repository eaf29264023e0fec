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
      // The battery's contract: events.ts is BIGINT epoch-nanos, so all time
      // arithmetic is exact integer math (oracle side: epoch_ns(ts)). The
      // driver has generated the column as parquet TIMESTAMP(NANOS) in some
      // rounds and TIMESTAMP(MICROS) in others, so normalize at the single
      // load point instead of assuming a physical type:
      //  - NANOS: nanosAsLong reads the raw int64 — already nanos.
      //  - MICROS: read as TimestampType (NTZ inference off so the load is
      //    session-timezone-independent — the stored micros ARE the internal
      //    micros) and widen unix_micros×1000 to nanos.
      //  - INT64 (e.g. an Sf1Gen replica written from a nanos source): as-is.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
      df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    else df
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
