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

  /** Promotion signal — the ergonomic half of F7's restart path: compares
    * the provider's CURRENT per-table schemas (name-unioned, first-seen
    * field order — the same union an extras-mode reader resolves) against
    * the schema a running query declared, and returns `Some(promoted)`
    * when a restart would turn `_extras`-carried columns into typed
    * physical ones. The promote-restart recipe is then three lines:
    *
    * {{{
    * CdcSchemaHistory.promotedSchema(provider, stream.schema).foreach { _ =>
    *   query.stop()                      // same checkpointLocation:
    *   restart(spark.readStream...load)  // no replay, no loss — offsets
    * }                                   // carry logPos, not schemas
    * }}}
    *
    * Spec-verified E2E (SchemaEvolutionSpec): a checkpointed stream
    * restarted this way resumes exactly after its committed offset with
    * the promoted column typed. */
  def promotedSchema(provider: ChangeLogProvider,
      declared: org.apache.spark.sql.types.StructType): Option[org.apache.spark.sql.types.StructType] = {
    import org.apache.spark.sql.types.StructField
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    provider.tables.foreach(_.schema.fields.foreach(f =>
      if (!acc.contains(f.name)) acc.put(f.name, f)))
    val current = org.apache.spark.sql.types.StructType(acc.values.toSeq)
    // compare against the declared PHYSICAL columns only (op/_extras/
    // metadata columns are source-appended, never provider columns)
    val declaredPhysical = declared.fields.takeWhile(f =>
      f.name != "op" && f.name != "_extras")
    // compare on (name, dataType) only: the promotion signal is about
    // columns and their types. Spark's streaming schema path may normalize
    // nullability or strip field metadata — full StructField equality would
    // then report a phantom promotion forever and turn user restart
    // automation into a restart loop
    def shape(fs: Seq[StructField]) = fs.map(f => (f.name, f.dataType))
    if (shape(current.fields.toSeq) == shape(declaredPhysical.toSeq)) None
    else Some(current)
  }
}
