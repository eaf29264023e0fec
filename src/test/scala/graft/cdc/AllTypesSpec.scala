package graft.cdc

import graft.SparkSpec
import graft.cdc.provider.{FileChangeLogProvider, InMemoryChangeLogProvider, ProviderRegistry}
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** All-types E2E through the DSv2 source — the Spark mirror of the
  * reference's testAllDataTypes ITCase (mysql/table/MySqlConnectorITCase
  * .java:345 over ddl/column_type_test.sql): every type `TypeMapping` can
  * emit is carried by a provider, converted by the runtime battery
  * (CatalystConverters), and read back with correct values. */
class AllTypesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("c_bool", BooleanType),
    StructField("c_byte", ByteType),
    StructField("c_short", ShortType),
    StructField("c_int", IntegerType),
    StructField("c_long", LongType),
    StructField("c_float", FloatType),
    StructField("c_double", DoubleType),
    StructField("c_dec", DecimalType(10, 2)),
    StructField("c_date", DateType),
    StructField("c_ts", TimestampType),
    StructField("c_ntz", TimestampNTZType),
    StructField("c_time", IntegerType), // TIME → millis-of-day
    StructField("c_str", StringType),
    StructField("c_bin", BinaryType),
    StructField("c_set", ArrayType(StringType)), // MySQL SET
    StructField("c_geo", StringType),            // geometry → GeoJSON
    StructField("c_map", MapType(StringType, LongType)),
    StructField("c_row", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))))
  private val meta = TableMeta(TableId("types", "all_types"), schema, Seq("id"))

  // values exercising the reference's physical-encoding tolerance:
  // BOOLEAN from Byte, DATE from LocalDate AND epoch-day int, TIMESTAMP
  // from java.sql.Timestamp AND micros, DECIMAL from String AND BigDecimal
  private def rowA: Array[Any] = Array[Any](
    1L, true, 42.toByte, 1000.toShort, 123456, 1234567890123L,
    1.5f, 2.25, new java.math.BigDecimal("12345.67"),
    java.time.LocalDate.of(2020, 3, 14),
    java.sql.Timestamp.valueOf("2020-03-14 01:59:26.535"),
    java.time.LocalDateTime.of(2020, 3, 14, 1, 59, 26),
    (3 * 3600 + 14 * 60) * 1000, "hello",
    Array[Byte](1, 2, 3), Seq("a", "b"),
    """{"type":"Point","coordinates":[1.0,2.0]}""",
    Map("k1" -> 7L, "k2" -> 8L),
    Array[Any](9, "nested"))

  private def rowB: Array[Any] = Array[Any](
    2L, 1.toByte /* bool from byte */, -1, -2L /* byte/short widened ints */,
    7.toShort /* int from short */, 42 /* long from int */,
    3.0 /* float from double */, 1.5f /* double from float */,
    "99.50" /* decimal from string */,
    18345 /* date from epoch-day int */,
    1584150000000000L /* ts from micros */,
    1584150000000000L /* ntz micros */,
    0, "world", java.nio.ByteBuffer.wrap(Array[Byte](4, 5)),
    "x,y,z" /* SET from comma string */, null,
    new java.util.HashMap[String, Long] { put("j", 1L) },
    null)

  test("every mapped type reads through the source with correct values (testAllDataTypes)") {
    val p = new InMemoryChangeLogProvider(meta, Seq(rowA, rowB), Seq.empty)
    ProviderRegistry.register("all-types", p)
    val df = spark.read.format("cdc-log").option("provider.name", "all-types").load()
    assert(df.schema.fields.map(f => (f.name, f.dataType)).take(schema.length) ===
      schema.fields.map(f => (f.name, f.dataType)))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.length === 2)

    val a = rows(0)
    assert(a.getBoolean(1) === true)
    assert(a.getByte(2) === 42.toByte)
    assert(a.getShort(3) === 1000.toShort)
    assert(a.getInt(4) === 123456)
    assert(a.getLong(5) === 1234567890123L)
    assert(a.getFloat(6) === 1.5f)
    assert(a.getDouble(7) === 2.25)
    assert(a.getDecimal(8) === new java.math.BigDecimal("12345.67"))
    assert(a.getDate(9).toLocalDate === java.time.LocalDate.of(2020, 3, 14))
    assert(a.getTimestamp(10) === java.sql.Timestamp.valueOf("2020-03-14 01:59:26.535"))
    assert(a.getAs[java.time.LocalDateTime](11) ===
      java.time.LocalDateTime.of(2020, 3, 14, 1, 59, 26))
    assert(a.getInt(12) === (3 * 3600 + 14 * 60) * 1000)
    assert(a.getString(13) === "hello")
    assert(a.getAs[Array[Byte]](14).toSeq === Seq[Byte](1, 2, 3))
    assert(a.getSeq[String](15) === Seq("a", "b"))
    assert(a.getString(16).contains("Point"))
    assert(a.getMap[String, Long](17) === Map("k1" -> 7L, "k2" -> 8L))
    assert(a.getStruct(18).getInt(0) === 9)
    assert(a.getStruct(18).getString(1) === "nested")

    val b = rows(1)
    assert(b.getBoolean(1) === true, "BOOLEAN accepts numeric encodings")
    assert(b.getByte(2) === (-1).toByte)
    assert(b.getShort(3) === (-2).toShort)
    assert(b.getInt(4) === 7)
    assert(b.getLong(5) === 42L)
    assert(b.getFloat(6) === 3.0f)
    assert(b.getDouble(7) === 1.5)
    assert(b.getDecimal(8) === new java.math.BigDecimal("99.50"))
    assert(b.getDate(9).toLocalDate === java.time.LocalDate.ofEpochDay(18345))
    assert(b.getAs[Array[Byte]](14).toSeq === Seq[Byte](4, 5))
    assert(b.getSeq[String](15) === Seq("x", "y", "z"), "SET decodes from a comma string")
    assert(b.isNullAt(16) && b.isNullAt(18))
    assert(b.getMap[String, Long](17) === Map("j" -> 1L))
  }

  test("server-time-zone: offset-less ZonedTimestamp interpreted in the server zone") {
    // the reference shifts server-local TIMESTAMP renderings by the
    // configured zone (MySqlSourceOptions server-time-zone, applied in
    // RowDataDebeziumDeserializeSchema.java:490-512) — mirror: an archived
    // Debezium topic whose ZonedTimestamp strings carry no offset
    val root = Files.createTempDirectory("cdctz").toString
    val dir = Paths.get(root, "tzdb.t")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("meta.json"), """{"primaryKey":["id"]}""")
    val sch =
      """{"type":"struct","fields":[
        |{"type":"struct","optional":true,"field":"before","fields":[{"type":"int64","field":"id"},{"type":"string","name":"io.debezium.time.ZonedTimestamp","field":"ts"}]},
        |{"type":"struct","optional":true,"field":"after","fields":[{"type":"int64","field":"id"},{"type":"string","name":"io.debezium.time.ZonedTimestamp","field":"ts"}]}
        |]}""".stripMargin.replace("\n", "")
    Files.writeString(dir.resolve("events.jsonl"),
      s"""{"schema":$sch,"payload":{"before":null,"after":{"id":1,"ts":"2020-03-14T01:00:00"},"op":"r","ts_ms":1}}
         |{"before":null,"after":{"id":2,"ts":"2020-03-14T01:00:00+02:00"},"op":"c","ts_ms":2}
         |""".stripMargin)
    // Berlin is UTC+1 on 2020-03-14 → the offset-less string shifts by -1h
    val p = new graft.cdc.provider.DebeziumJsonChangeLogProvider(root, "Europe/Berlin")
    val tid = TableId("tzdb", "t")
    val local = p.snapshotBase(tid, SnapshotSplit(tid, 0, None, None))._2.next()
    assert(local(1) === java.time.Instant.parse("2020-03-14T00:00:00Z").toEpochMilli * 1000L,
      "offset-less rendering interpreted in server-time-zone")
    // strings WITH an offset are absolute regardless of the option
    val abs = p.log(tid, 0L, 10L).next().after
    assert(abs(1) === java.time.Instant.parse("2020-03-13T23:00:00Z").toEpochMilli * 1000L)
    // default zone (UTC) keeps the old behavior: offset-less = UTC
    val pUtc = new graft.cdc.provider.DebeziumJsonChangeLogProvider(root)
    val utc = pUtc.snapshotBase(tid, SnapshotSplit(tid, 0, None, None))._2.next()
    assert(utc(1) === java.time.Instant.parse("2020-03-14T01:00:00Z").toEpochMilli * 1000L)
  }

  test("file provider round-trips the extended types (date/ntz/binary/decimal/array/struct)") {
    val root = Files.createTempDirectory("cdcalltypes").toString
    val dir = Paths.get(root, "types.wide")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("meta.json"),
      """{"db":"types","table":"wide","primaryKey":["id"],
        |"schema":"id BIGINT, d DATE, ntz TIMESTAMP_NTZ, bin BINARY, dec DECIMAL(8,3), tags ARRAY<STRING>, kv MAP<STRING,LONG>, nested STRUCT<a: INT, b: STRING>",
        |"baseOffset":0}""".stripMargin)
    Files.writeString(dir.resolve("snapshot.jsonl"),
      """{"id":1,"d":18345,"ntz":1584150000000000,"bin":"AQID","dec":"12.345","tags":["t1","t2"],"kv":{"a":1},"nested":{"a":5,"b":"x"}}
        |""".stripMargin)
    val df = spark.read.format("cdc-log").option("path", root).load()
    val r = df.collect().head
    assert(r.getDate(1).toLocalDate === java.time.LocalDate.ofEpochDay(18345))
    assert(r.getAs[Array[Byte]](3).toSeq === Seq[Byte](1, 2, 3))
    assert(r.getDecimal(4) === new java.math.BigDecimal("12.345"))
    assert(r.getSeq[String](5) === Seq("t1", "t2"))
    assert(r.getMap[String, Long](6) === Map("a" -> 1L))
    assert(r.getStruct(7).getInt(0) === 5 && r.getStruct(7).getString(1) === "x")
  }
}
