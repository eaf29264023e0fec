package graft.cdc

import graft.cdc.provider.ChangeLogProvider
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-history surface: DDL events as a control-plane DataFrame
  * (offset, database, table, ddl) + point-in-time schema reconstruction.
  *
  * The reference keeps a schema history store and evolves reader state
  * from DDL events (mysql/schema/MySqlSchema.java, debezium/history package).
  * Spark's fixed-schema streams can't widen data rows mid-stream, so the
  * supported evolution path is: watch this control stream → restart the
  * query with the new schema (README "Known gaps"); this class makes the
  * watching part first-class.
  */
object CdcSchemaHistory {

  /** All DDL events in (from, to] as a DataFrame (driver-side read: schema
    * logs are control-plane small — one row per DDL, not per data change). */
  def changes(spark: SparkSession, provider: ChangeLogProvider,
      fromExclusive: Long = 0L, toInclusive: Long = Long.MaxValue): DataFrame = {
    import spark.implicits._
    provider.schemaChanges(fromExclusive, toInclusive)
      .map { case (off, tid, ddl) => (off, tid.db, tid.table, ddl) }
      .toSeq.toDF("op_offset", "database_name", "table_name", "ddl")
  }

  /** Latest DDL per table at or before `offset` (point-in-time schema). */
  def schemaAt(spark: SparkSession, provider: ChangeLogProvider, offset: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("database_name", "table_name").orderBy(col("op_offset").desc)
    changes(spark, provider, 0L, offset)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
