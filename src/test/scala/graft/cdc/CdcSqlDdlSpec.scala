package graft.cdc

import graft.SparkSpec
import graft.cdc.provider.{InMemoryChangeLogProvider, ProviderRegistry}
import org.apache.spark.sql.types._

/** SQL DDL surface (reference S11, mysql/table/MySqlTableSourceFactory):
  * `CREATE TABLE ... USING `cdc-log` OPTIONS (...)` + plain SQL over the
  * changelog — the Spark analogue of the reference's
  * `'connector'='mysql-cdc-log'` table factories. */
class CdcSqlDdlSpec extends SparkSpec {

  test("connector=debezium-embedded alias: DDL round-trip under the fake engine") {
    // S11 parity for the one provider users configure via DDL: the alias
    // parses capture.tables into TableMetas, routes debezium.* options
    // into engine properties, starts ONE shared engine per spool root,
    // and plain SQL folds the spooled changelog — the whole live-database
    // path minus the jars (ddlEngineFactory is the spec seam).
    import graft.cdc.provider.DebeziumEmbedded
    val spool = java.nio.file.Files.createTempDirectory("dbz_ddl_").toString
    var gotProps: java.util.Properties = null
    var deliver: DebeziumEmbedded.Record => Unit = null
    val old = DebeziumEmbedded.ddlEngineFactory
    DebeziumEmbedded.ddlEngineFactory = (p, rec, _) => {
      gotProps = p; deliver = rec
      () => ()
    }
    def env(id: Long, name: String, op: String): String = {
      val schema =
        """{"type":"struct","fields":[
          |{"type":"struct","optional":true,"field":"before","fields":[
          |  {"type":"int64","optional":false,"field":"id"},
          |  {"type":"string","optional":true,"field":"name"}]},
          |{"type":"struct","optional":true,"field":"after","fields":[
          |  {"type":"int64","optional":false,"field":"id"},
          |  {"type":"string","optional":true,"field":"name"}]}
          |]}""".stripMargin.replace("\n", "")
      val after = if (op == "d") "null" else s"""{"id":$id,"name":"$name"}"""
      s"""{"schema":$schema,"payload":{"before":null,"after":$after,"source":{},"op":"$op","ts_ms":1}}"""
    }
    spark.sql("DROP TABLE IF EXISTS dbz_ddl_products")
    try {
      spark.sql(s"""
        CREATE TABLE dbz_ddl_products
        USING `cdc-log`
        OPTIONS (
          `connector` 'debezium-embedded',
          `spool.root` '$spool',
          `capture.tables` 'inventory.products|id|id BIGINT, name STRING',
          `debezium.connector.class` 'io.debezium.connector.mysql.MySqlConnector',
          `debezium.database.hostname.ignored` 'not-dialed-here'
        )""")
      // first resolution of the table starts the shared engine, with the
      // debezium.* options (prefix stripped) as its properties
      assert(spark.table("dbz_ddl_products").columns.toSeq
        === Seq("id", "name", "op"))
      assert(deliver != null, "engine factory never invoked")
      assert(gotProps.getProperty("connector.class")
        === "io.debezium.connector.mysql.MySqlConnector")
      deliver(DebeziumEmbedded.Record("srv.inventory.products", env(1, "a", "r")))
      deliver(DebeziumEmbedded.Record("srv.inventory.products", env(2, "a", "r")))
      deliver(DebeziumEmbedded.Record("srv.inventory.products", env(3, "b", "c")))
      val rows = spark.sql(
        "SELECT name, COUNT(*) AS n FROM dbz_ddl_products GROUP BY name ORDER BY name")
        .collect().map(r => r.getString(0) -> r.getLong(1))
      assert(rows.toSeq === Seq("a" -> 2L, "b" -> 1L))
      assert(spark.table("dbz_ddl_products").columns.toSeq === Seq("id", "name", "op"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS dbz_ddl_products")
      DebeziumEmbedded.ddlEngineFactory = old
    }
  }

  test("CREATE TABLE USING cdc-log + SQL aggregation over the changelog") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("weight", DoubleType)))
    val meta = TableMeta(TableId("inventory", "ddl_products"), schema, Seq("id"))
    def row(id: Long, n: String, w: Double): Array[Any] = Array(id, n, w)
    val p = new InMemoryChangeLogProvider(meta,
      Seq(row(1, "a", 1.0), row(2, "a", 2.0), row(3, "b", 3.0)),
      Seq(LogRecord(1, ChangeOp.Update, meta.id, row(3, "b", 3.0), row(3, "a", 30.0), 100)),
      staleOffset = 0)
    ProviderRegistry.register("sql-ddl", p)

    spark.sql("DROP TABLE IF EXISTS cdc_ddl_products")
    spark.sql("""
      CREATE TABLE cdc_ddl_products
      USING `cdc-log`
      OPTIONS (
        `provider.name` 'sql-ddl',
        `metadata.columns` 'table_name'
      )""")
    try {
      // batch SQL = folded state at the current offset (ITCase-style query)
      val sums = spark.sql(
        "SELECT name, SUM(weight) AS w FROM cdc_ddl_products GROUP BY name ORDER BY name")
        .collect().map(r => r.getString(0) -> r.getDouble(1))
      assert(sums.toSeq === Seq("a" -> 33.0))
      val metaCols = spark.sql("SELECT table_name FROM cdc_ddl_products").collect()
      assert(metaCols.forall(_.getString(0) == "ddl_products"))
      // the op column is part of the declared SQL schema
      val cols = spark.table("cdc_ddl_products").columns.toSeq
      assert(cols === Seq("id", "name", "weight", "op", "table_name"))
    } finally spark.sql("DROP TABLE IF EXISTS cdc_ddl_products")
  }
}
