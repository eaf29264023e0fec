package graft.streaming

import graft.SparkSpec
import graft.operators.ChangelogOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** scd2ClosedIntervals: the streaming SCD2 must reproduce EXACTLY the
  * `valid_to IS NOT NULL` subset of the batch derivation, with state
  * crossing micro-batch boundaries and within-batch arrival unordered. */
class Scd2StreamingSpec extends SparkSpec {

  private def ev(k: Long, price: Double, st: String, off: Long,
      del: Boolean = false) = Scd2Event(k, price, st, off, del)

  /** Batch reference over the same events, via the production operator:
    * changelog rows shaped like CdcQueries' derived changelog. */
  private def batchClosed(evs: Seq[Scd2Event]) = {
    import spark.implicits._
    val cl = evs.toDF()
      .select(col("k"), col("price"), col("st"),
        when(col("isDelete"), "d").otherwise("u").as("op"),
        col("offset").as("op_offset"),
        when(col("isDelete"), "+I").otherwise("+U").as("row_kind"))
    ChangelogOps.scd2History(cl, Seq("k"), "op_offset")
      .filter(col("valid_to").isNotNull)
      .select("k", "price", "st", "valid_from", "valid_to")
      .collect().map(_.toSeq).toSet
  }

  test("streaming == batch closed intervals; state survives micro-batches; deletes close without reopening") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Scd2Event]
    val q = StreamingOps.scd2ClosedIntervals(in.toDS()).toDF()
      .writeStream.format("memory").queryName("scd2_sink").outputMode("append").start()
    val all = Seq(
      // batch 1: k=1 insert then update (unordered arrival!), k=2 insert
      Seq(ev(1, 10.0, "A", 101), ev(1, 11.0, "A", 102), ev(2, 20.0, "B", 103)),
      // batch 2: k=1 delete (closes the update version), k=2 update
      Seq(ev(1, 0.0, "A", 201, del = true), ev(2, 21.0, "B", 202)),
      // batch 3: k=1 re-inserted after its delete, then updated; k=3 insert stays open
      Seq(ev(1, 12.0, "C", 301), ev(1, 13.0, "C", 302), ev(3, 30.0, "D", 303)))
    try {
      // feed batch 1 REVERSED: within-batch order must not matter
      in.addData(all(0).reverse: _*); q.processAllAvailable()
      val afterB1 = spark.table("scd2_sink").count()
      assert(afterB1 === 1, s"batch 1 should close exactly k=1's insert, got $afterB1")
      in.addData(all(1): _*); q.processAllAvailable()
      in.addData(all(2).reverse: _*); q.processAllAvailable()
      val got = spark.table("scd2_sink")
        .select("k", "price", "st", "valid_from", "valid_to")
        .collect().map(_.toSeq).toSet
      assert(got === batchClosed(all.flatten), s"streaming/batch drift: $got")
      // the delete closed 11.0@102 at 201 and nothing reopened until 301
      assert(got.contains(Seq(1L, 11.0, "A", 102L, 201L)))
      assert(got.contains(Seq(1L, 12.0, "C", 301L, 302L)))
      // open versions (k=1@302, k=2@202, k=3@303) are NOT emitted
      assert(!got.exists(r => r(3) == 302L && r(0) == 1L && r(4) != null))
      assert(got.size === 4)
    } finally q.stop()
  }

  test("a key deleted in the same batch it was inserted emits its single interval") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Scd2Event]
    val q = StreamingOps.scd2ClosedIntervals(in.toDS()).toDF()
      .writeStream.format("memory").queryName("scd2_sink2").outputMode("append").start()
    try {
      in.addData(ev(7, 70.0, "X", 401, del = true), ev(7, 70.0, "X", 400))
      q.processAllAvailable()
      val got = spark.table("scd2_sink2")
        .select("k", "price", "st", "valid_from", "valid_to")
        .collect().map(_.toSeq).toSet
      assert(got === Set(Seq(7L, 70.0, "X", 400L, 401L)))
    } finally q.stop()
  }
}
