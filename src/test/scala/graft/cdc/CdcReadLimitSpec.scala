package graft.cdc

import graft.SparkSpec
import graft.cdc.provider.{InMemoryChangeLogProvider, ProviderRegistry}
import graft.cdc.source.{CdcMicroBatchStream, CdcOffset, CdcOptions}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadLimit}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Admission-control ReadLimit handling of the micro-batch stream: the
  * Kafka-source minOffsetsPerTrigger/maxTriggerDelay contract (hold a
  * batch until enough offsets accumulate or the delay elapses), maxRows
  * caps, and their composite. Driven against the offset state machine
  * directly — no streaming query needed. */
class CdcReadLimitSpec extends SparkSpec {
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))
  private val meta = TableMeta(TableId("db", "t"), schema, Seq("id"))

  private def mkStream(name: String, extra: Map[String, String] = Map.empty)
      : (InMemoryChangeLogProvider, CdcMicroBatchStream) = {
    val p = new InMemoryChangeLogProvider(meta, Seq(Array[Any](1L, "a")), Seq.empty)
    ProviderRegistry.register(name, p)
    val opts = CdcOptions.from(new CaseInsensitiveStringMap(
      (Map("provider.name" -> name, "scan.startup.mode" -> "latest") ++ extra).asJava))
    val stream = new CdcMicroBatchStream(opts, schema,
      CdcOptions.producedSchema(schema, Seq.empty), Seq(meta))
    (p, stream)
  }

  private def ins(off: Long, id: Long) =
    LogRecord(off, ChangeOp.Create, meta.id, null, Array[Any](id, s"n$id"), off)

  test("minRows holds the batch until enough offsets accumulate") {
    val (p, stream) = mkStream("rl-min")
    val o0 = stream.initialOffset().asInstanceOf[CdcOffset]
    p.append(ins(1, 10), ins(2, 11), ins(3, 12))
    val held = stream.latestOffset(o0, ReadLimit.minRows(10, 3600000L)).asInstanceOf[CdcOffset]
    assert(held.logPos === o0.logPos, "3 < 10 available offsets must hold the batch")
    val adv = stream.latestOffset(o0, ReadLimit.minRows(2, 3600000L)).asInstanceOf[CdcOffset]
    assert(adv.logPos === 3L)
  }

  test("minRows maxTriggerDelay elapsed → emit whatever is available") {
    val (p, stream) = mkStream("rl-delay")
    val o0 = stream.initialOffset().asInstanceOf[CdcOffset]
    p.append(ins(1, 10))
    val adv = stream.latestOffset(o0, ReadLimit.minRows(1000, 0L)).asInstanceOf[CdcOffset]
    assert(adv.logPos === 1L, "zero max delay must never hold")
  }

  test("composite minRows+maxRows: min gates, max caps") {
    val (p, stream) = mkStream("rl-comp")
    val o0 = stream.initialOffset().asInstanceOf[CdcOffset]
    p.append((1L to 6L).map(i => ins(i, 100 + i)): _*)
    val limit = ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(2, 3600000L), ReadLimit.maxRows(4)))
    val adv = stream.latestOffset(o0, limit).asInstanceOf[CdcOffset]
    assert(adv.logPos === o0.logPos + 4, "min satisfied → advance, capped by maxRows")
    val held = stream.latestOffset(adv, ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(5, 3600000L), ReadLimit.maxRows(4)))).asInstanceOf[CdcOffset]
    assert(held.logPos === adv.logPos, "2 remaining < min 5 → hold")
  }

  test("options surface as the default read limit") {
    val (_, stream) = mkStream("rl-opts", Map(
      "scan.log.min-offsets-per-batch" -> "5",
      "scan.log.max-offsets-per-batch" -> "7"))
    assert(stream.getDefaultReadLimit.isInstanceOf[CompositeReadLimit])
    val (_, plain) = mkStream("rl-opts2")
    assert(plain.getDefaultReadLimit === ReadLimit.allAvailable())
  }

  test("file-provider iterators are closeable for early reader termination") {
    val root = java.nio.file.Files.createTempDirectory("cdcclose")
    val dir = root.resolve("db.t")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("meta.json"),
      """{"db":"db","table":"t","primaryKey":["id"],"schema":"id BIGINT, name STRING","baseOffset":0}""")
    java.nio.file.Files.writeString(dir.resolve("log.jsonl"),
      """{"offset":1,"op":"c","before":null,"after":{"id":1,"name":"x"}}
        |{"offset":2,"op":"c","before":null,"after":{"id":2,"name":"y"}}
        |""".stripMargin)
    val p = new graft.cdc.provider.FileChangeLogProvider(root.toString)
    val it = p.log(TableId("db", "t"), 0L, 10L)
    assert(it.isInstanceOf[AutoCloseable])
    assert(it.next().offset === 1L)
    it.asInstanceOf[AutoCloseable].close() // early close must not throw
    it.asInstanceOf[AutoCloseable].close() // and is idempotent
  }
}
