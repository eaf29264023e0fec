package graft.cdc

import graft.SparkSpec
import graft.cdc.provider.{InMemoryChangeLogProvider, ProviderRegistry}
import org.apache.spark.sql.types._

/** SQL DDL surface (reference S11, mysql/table/MySqlTableSourceFactory):
  * `CREATE TABLE ... USING `cdc-log` OPTIONS (...)` + plain SQL over the
  * changelog — the Spark analogue of the reference's
  * `'connector'='mysql-cdc-log'` table factories. */
class CdcSqlDdlSpec extends SparkSpec {
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
