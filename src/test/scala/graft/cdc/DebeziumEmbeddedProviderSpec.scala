package graft.cdc

import graft.cdc.provider.{DebeziumEmbedded, DebeziumEmbeddedChangeLogProvider}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The embedded-engine bridge, driven through its factory seam: a fake
  * engine delivers Debezium Json-format records (destination topic + JSON
  * envelope), and the provider must route/spool/parse them into the full
  * SPI — plus the Handover error contract and the actionable
  * missing-classpath failure of the REAL reflective factory (debezium is
  * deliberately absent from this build, which makes the negative path the
  * one integration fact we can pin offline). */
class DebeziumEmbeddedProviderSpec extends AnyFunSuite {

  private val meta = TableMeta(TableId("inventory", "products"),
    StructType.fromDDL("id BIGINT, name STRING"), Seq("id"))

  private def props(): java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("name", "t")
    p.setProperty("connector.class", "io.debezium.connector.mysql.MySqlConnector")
    p
  }

  /** A controllable fake engine: captures the sinks, counts closes. */
  private final class Fake {
    var onRecord: DebeziumEmbedded.Record => Unit = _
    var onError: Throwable => Unit = _
    var closed = 0
    val factory: DebeziumEmbedded.EngineFactory = (_, rec, err) => {
      onRecord = rec; onError = err
      () => closed += 1
    }
    def deliver(topic: String, json: String): Unit =
      onRecord(DebeziumEmbedded.Record(topic, json))
  }

  private def env(id: Long, name: String, op: String, prev: Option[(Long, String)] = None): String = {
    val schema =
      """{"type":"struct","fields":[
        |{"type":"struct","optional":true,"field":"before","fields":[
        |  {"type":"int64","optional":false,"field":"id"},
        |  {"type":"string","optional":true,"field":"name"}]},
        |{"type":"struct","optional":true,"field":"after","fields":[
        |  {"type":"int64","optional":false,"field":"id"},
        |  {"type":"string","optional":true,"field":"name"}]}
        |]}""".stripMargin.replace("\n", "")
    val before = prev.map { case (i, n) => s"""{"id":$i,"name":"$n"}""" }.getOrElse("null")
    val after = if (op == "d") "null" else s"""{"id":$id,"name":"$name"}"""
    s"""{"schema":$schema,"payload":{"before":$before,"after":$after,"source":{},"op":"$op","ts_ms":1}}"""
  }

  test("routes declared topics into the spool, drops heartbeats and undeclared tables, serves the SPI live") {
    val spool = Files.createTempDirectory("dbz_embed_").toString
    val fake = new Fake
    val p = new DebeziumEmbeddedChangeLogProvider(Seq(meta), props(), spool, fake.factory)
    try {
      // BEFORE any event: declared DDL is the planning schema
      assert(p.tables.map(_.id) === Seq(TableId("inventory", "products")))
      assert(p.tables.head.schema === meta.schema)
      assert(p.currentOffset === 0L)

      fake.deliver("dbzsrv.inventory.products", env(1, "scooter", "r"))
      fake.deliver("dbzsrv.inventory.products", env(2, "car", "r"))
      fake.deliver("__debezium-heartbeat.dbzsrv", """{"payload":null}""")
      fake.deliver("dbzsrv.other.table", env(9, "ghost", "c"))
      // snapshot ('r') records are the BASE at offset 0, not log events —
      // and the undeclared-topic 'c' must not have spooled anywhere
      assert(p.currentOffset === 0L)

      // a LIVE TAIL: more records arrive mid-life and the next probe sees them
      fake.deliver("dbzsrv.inventory.products", env(3, "hammer", "c"))
      fake.deliver("dbzsrv.inventory.products",
        env(1, "scooter-v2", "u", prev = Some((1L, "scooter"))))
      assert(p.currentOffset === 2L, "two log events past the snapshot block")

      val tid = TableId("inventory", "products")
      val recs = p.log(tid, 0L, p.currentOffset).toSeq
      assert(recs.map(_.op) === Seq(ChangeOp.Create, ChangeOp.Update))
      assert(recs.last.after.toSeq === Seq(1L, "scooter-v2"))
      assert(recs.last.before.toSeq === Seq(1L, "scooter"))
      // keyBounds plans over the snapshot ('r') block: keys 1 and 2
      val (mn, mx, cnt) = p.keyBounds(tid)
      assert(cnt === 2L && mn === ChunkKey.of(1L) && mx === ChunkKey.of(2L))
      p.validate()
    } finally p.close()
    assert(fake.closed === 1)
  }

  test("engine failure is re-thrown on the next SPI call (Handover contract)") {
    val spool = Files.createTempDirectory("dbz_embed_err_").toString
    val fake = new Fake
    val p = new DebeziumEmbeddedChangeLogProvider(Seq(meta), props(), spool, fake.factory)
    try {
      fake.deliver("s.inventory.products", env(1, "a", "c"))
      assert(p.currentOffset === 1L)
      fake.onError(new RuntimeException("binlog connection lost"))
      val e = intercept[IllegalStateException](p.currentOffset)
      assert(e.getCause.getMessage.contains("binlog connection lost"))
    } finally p.close()
  }

  test("validate() demands connector.class and name") {
    val spool = Files.createTempDirectory("dbz_embed_val_").toString
    val fake = new Fake
    val bad = new java.util.Properties()
    val p = new DebeziumEmbeddedChangeLogProvider(Seq(meta), bad, spool, fake.factory)
    try {
      val e = intercept[IllegalArgumentException](p.validate())
      assert(e.getMessage.contains("connector.class"))
    } finally p.close()
  }

  test("reflective factory without the debezium jars fails with the actionable boundary message") {
    val e = intercept[IllegalStateException] {
      DebeziumEmbedded.reflectiveFactory(props(), _ => (), _ => ())
    }
    assert(e.getMessage.contains("debezium-embedded"))
    assert(e.getMessage.contains("provider"))
    assert(e.getCause.isInstanceOf[ClassNotFoundException])
  }
}
