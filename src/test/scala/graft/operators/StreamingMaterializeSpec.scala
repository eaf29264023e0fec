package graft.operators

import graft.SparkSpec
import graft.cdc._
import graft.cdc.provider.{InMemoryChangeLogProvider, ProviderRegistry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E2E: cdc-log stream → continuously-updated materialized state. */
class StreamingMaterializeSpec extends SparkSpec {
  test("streaming materialization tracks inserts, updates and deletes") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("weight", DoubleType)))
    val meta = TableMeta(TableId("inventory", "products"), schema, Seq("id"))
    def row(id: Long, n: String, w: Double): Array[Any] = Array(id, n, w)
    val p = new InMemoryChangeLogProvider(meta, Seq(row(1, "a", 1.0), row(2, "b", 2.0)), Seq.empty)
    ProviderRegistry.register("mat-stream", p)

    val changelog = spark.readStream.format("cdc-log")
      .option("provider.name", "mat-stream")
      .option("metadata.columns", "op_offset,row_kind")
      .load()
    val state = ChangelogOps.materializeStreaming(changelog, Seq("id"))
    val q = state.writeStream.format("memory").queryName("mat_sink")
      .outputMode("update").start()
    def current(): Map[Long, (String, Double, String)] = {
      // update sink appends updated rows per batch: highest op_offset per id
      // is the current state
      spark.table("mat_sink").collect()
        .groupBy(_.getLong(0)).map { case (id, rows) =>
          val r = rows.maxBy(_.getLong(4))
          id -> ((r.getString(1), r.getDouble(2), r.getString(3)))
        }
    }
    try {
      q.processAllAvailable()
      assert(current() === Map(
        1L -> (("a", 1.0, "r")), 2L -> (("b", 2.0, "r"))))

      p.append(
        LogRecord(10, ChangeOp.Update, meta.id, row(1, "a", 1.0), row(1, "a2", 1.5), 1000),
        LogRecord(11, ChangeOp.Create, meta.id, null, row(3, "c", 3.0), 2000))
      q.processAllAvailable()
      val s1 = current()
      assert(s1(1L) === (("a2", 1.5, "u")), "after-image wins over before-image")
      assert(s1(3L) === (("c", 3.0, "c")))

      p.append(LogRecord(12, ChangeOp.Delete, meta.id, row(2, "b", 2.0), null, 3000))
      q.processAllAvailable()
      val s2 = current()
      assert(s2(2L)._3 === "d", "delete surfaces as a tombstone (op='d')")
      val live = s2.filter(_._2._3 != "d")
      assert(live.keySet === Set(1L, 3L))
    } finally q.stop()
  }
}
