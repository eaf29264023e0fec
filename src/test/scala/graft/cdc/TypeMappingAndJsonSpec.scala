package graft.cdc

import graft.SparkSpec
import graft.cdc.types.TypeMapping
import graft.operators.ChangelogJson
import graft.cdc.provider.{InMemoryChangeLogProvider, ProviderRegistry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TypeMappingAndJsonSpec extends SparkSpec {

  test("MySQL type battery maps per the reference (MySqlTypeUtils.java:84-133)") {
    import TypeMapping.{mysqlToSpark => m}
    assert(m("TINYINT", precision = 1) === BooleanType) // :88
    assert(m("TINYINT") === ByteType)
    assert(m("TINYINT", unsigned = true) === ShortType)       // :89-91
    assert(m("SMALLINT", unsigned = true) === IntegerType)
    assert(m("INT", unsigned = true) === LongType)            // :96-99
    assert(m("BIGINT", unsigned = true) === DecimalType(20, 0)) // :100-101
    assert(m("DECIMAL", 10, 2) === DecimalType(10, 2))        // :106-107
    assert(m("DATETIME") === TimestampNTZType)                // :112-116
    assert(m("TIMESTAMP") === TimestampType)
    assert(m("TEXT") === StringType)
    assert(m("BLOB") === BinaryType)
    assert(m("SET") === ArrayType(StringType))                // SET → ARRAY<STRING>
    assert(m("GEOMETRY") === StringType)                      // GeoJSON string
  }

  test("column spec parser") {
    import TypeMapping.{parseMysqlColumn => p}
    assert(p("TINYINT(1)") === BooleanType)
    assert(p("int unsigned") === LongType)
    assert(p("DECIMAL(20, 4)") === DecimalType(20, 4))
    assert(p("VARCHAR(255)") === StringType)
    assertThrows[IllegalArgumentException](p("FROBNICATOR"))
  }

  test("JSON envelope round-trip (JsonDebeziumDeserializationSchema equivalent)") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("weight", DoubleType)))
    val meta = TableMeta(TableId("inventory", "products"), schema, Seq("id"))
    def row(id: Long, n: String, w: Double): Array[Any] = Array(id, n, w)
    val p = new InMemoryChangeLogProvider(meta, Seq(row(1, "a", 1.0)), Seq.empty)
    ProviderRegistry.register("json-env", p)
    p.append(
      LogRecord(1, ChangeOp.Update, meta.id, row(1, "a", 1.0), row(1, "a2", 1.5), 5000),
      LogRecord(2, ChangeOp.Delete, meta.id, row(1, "a2", 1.5), null, 6000))

    val df = spark.readStream.format("cdc-log")
      .option("provider.name", "json-env")
      .option("scan.startup.mode", "earliest")
      .option("metadata.columns", "database_name,table_name,op_ts,op_offset,row_kind")
      .load()
    val q = df.writeStream.format("memory").queryName("env_src").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val env = ChangelogJson.toEnvelope(spark.table("env_src"), Seq("id", "name", "weight"))
    val parsed = env.select(col("op_offset"), col("row_kind"),
      ChangelogJson.fromEnvelope(col("json"),
        "id BIGINT, name STRING, weight DOUBLE").as("e"))
    val rows = parsed.select(col("op_offset"), col("row_kind"),
      col("e.op"), col("e.before.name"), col("e.after.name"),
      col("e.source.db"), col("e.source.ts_ms")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)), r.getString(5), r.getLong(6)))
    // update → before-envelope (-U) and after-envelope (+U)
    assert(rows.contains((1L, "-U", "u", Some("a"), None, "inventory", 5000L)))
    assert(rows.contains((1L, "+U", "u", None, Some("a2"), "inventory", 5000L)))
    // delete → before-envelope with op 'd'
    assert(rows.contains((2L, "+I", "d", Some("a2"), None, "inventory", 6000L)))
  }
}
