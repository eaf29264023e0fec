package graft.cdc

import graft.SparkSpec
import graft.cdc.provider.{InMemoryChangeLogProvider, ProviderRegistry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class UpsertModeAndJdbcSqlSpec extends SparkSpec {

  test("upsert changelog mode: one +U per update, key-only -D per delete (MongoDB shape)") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("weight", DoubleType)))
    val meta = TableMeta(TableId("mongo", "coll"), schema, Seq("id"))
    def row(id: Long, n: String, w: Double): Array[Any] = Array(id, n, w)
    val keyOnly: Array[Any] = Array(7L, null, null) // documentKey-only before-image
    val p = new InMemoryChangeLogProvider(meta, Seq.empty, Seq(
      LogRecord(1, ChangeOp.Create, meta.id, null, row(7, "doc", 1.0), 100),
      LogRecord(2, ChangeOp.Update, meta.id, null, row(7, "doc2", 2.0), 200),
      LogRecord(3, ChangeOp.Delete, meta.id, keyOnly, null, 300)))
    ProviderRegistry.register("mongo-mode", p)
    val df = spark.readStream.format("cdc-log")
      .option("provider.name", "mongo-mode")
      .option("scan.startup.mode", "earliest")
      .option("changelog.mode", "upsert")
      .option("metadata.columns", "row_kind")
      .load()
    val q = df.writeStream.format("memory").queryName("mongo_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("mongo_sink").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(3), r.getString(4)))
    assert(rows.length === 3, "update must emit exactly ONE row in upsert mode")
    assert(rows.contains((7L, Some("doc"), "c", "+I")))
    assert(rows.contains((7L, Some("doc2"), "u", "+U")))
    assert(rows.contains((7L, None, "d", "-D")), "delete is key-only with -D kind")
  }

  test("JDBC scan SQL mirrors StatementUtils semantics") {
    val t = TableId("db", "orders")
    assert(JdbcSql.minMaxQuery(t, "id") ===
      "SELECT MIN(`id`), MAX(`id`) FROM `db`.`orders`")
    assert(JdbcSql.approxCountQuery(t) === "SHOW TABLE STATUS LIKE 'orders'")
    assert(JdbcSql.chunkBoundaryQuery(t, "id", 8096) ===
      "SELECT MAX(`id`) FROM (SELECT `id` FROM `db`.`orders` WHERE `id` >= ? " +
        "ORDER BY `id` ASC LIMIT 8096) AS T")
    assert(JdbcSql.rangeScanQuery(t, "id", hasLowerBound = true, hasUpperBound = true) ===
      "SELECT * FROM `db`.`orders` WHERE `id` >= ? AND `id` < ?")
    assert(JdbcSql.rangeScanQuery(t, "id", hasLowerBound = false, hasUpperBound = false) ===
      "SELECT * FROM `db`.`orders`")
  }
}
