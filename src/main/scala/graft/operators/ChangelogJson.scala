package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON envelope rendering of changelog rows — the Spark counterpart of
  * the reference's JsonDebeziumDeserializationSchema
  * (flink-connector-debezium-log/.../JsonDebeziumDeserializationSchema.java:67-87),
  * which renders each change event as a Debezium-style JSON string.
  *
  * Works on a cdc-log DataFrame read with
  * `metadata.columns = "database_name,table_name,op_ts,op_offset,row_kind"`:
  * each flattened row becomes one envelope; an update's two rows render as
  * a before-envelope and an after-envelope (the payload rides in `before`
  * or `after` according to row_kind/op, mirroring §1.3 semantics).
  * Pure `to_json(struct(...))` — codegen'd, no UDF.
  */
object ChangelogJson {

  def toEnvelope(changelog: DataFrame, physicalCols: Seq[String]): DataFrame = {
    val payload = struct(physicalCols.map(col): _*)
    val isBefore = col("op") === "d" || col("row_kind") === "-U"
    changelog.withColumn("json", to_json(struct(
      when(isBefore, payload).otherwise(lit(null)).as("before"),
      when(!isBefore, payload).otherwise(lit(null)).as("after"),
      struct(col("database_name").as("db"), col("table_name").as("table"),
        (unix_timestamp(col("op_ts")) * 1000).as("ts_ms"),
        col("op_offset").as("pos")).as("source"),
      col("op").as("op"))))
  }

  /** Parse envelopes back (for sink-side tests / round-trips). */
  def fromEnvelope(json: Column, payloadSchemaDdl: String): Column =
    from_json(json, org.apache.spark.sql.types.StructType.fromDDL(
      s"before STRUCT<$payloadSchemaDdl>, after STRUCT<$payloadSchemaDdl>, " +
        "source STRUCT<db STRING, table STRING, ts_ms BIGINT, pos BIGINT>, op STRING"))
}
