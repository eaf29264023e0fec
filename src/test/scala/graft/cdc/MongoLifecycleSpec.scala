package graft.cdc

import graft.SparkSpec
import graft.cdc.provider.{ProviderRegistry, SocketChangeLogProvider}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The full MongoDB connector lifecycle, end to end, over the socket
  * provider (reference mongodb/internal/MongoDBConnectorSourceTask.java):
  *
  *   1. `copy.existing` snapshot — the server's CURRENT collection is
  *      copied as the base (history before the copy is unobtainable, as
  *      with a truncated oplog) and the source runs its ordinary chunked
  *      snapshot flow over it;
  *   2. change-stream phase — post-copy events stream from the position
  *      the copy pinned;
  *   3. invalidate — the server ends the subscription (collection drop/
  *      rename); the provider exposes the `startAfter` token and reads
  *      nothing past the invalidate;
  *   4. re-resume — a NEW provider life resumes strictly after the
  *      invalidate; the same checkpointed query continues. No loss, no
  *      duplicates, across all four phases.
  */
class MongoLifecycleSpec extends SparkSpec {
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))
  private val meta = TableMeta(TableId("mongo", "coll"), schema, Seq("id"))

  private def ev(off: Long, op: String, id: Long, v: String): String = op match {
    case "c" => s"""{"offset":$off,"op":"c","tsMs":${off * 10},"before":null,"after":{"id":$id,"v":"$v"}}"""
    case "u" => s"""{"offset":$off,"op":"u","tsMs":${off * 10},"before":{"id":$id,"v":"?"},"after":{"id":$id,"v":"$v"}}"""
    case "d" => s"""{"offset":$off,"op":"d","tsMs":${off * 10},"before":{"id":$id,"v":"$v"},"after":null}"""
  }

  private def awaitOffset(p: SocketChangeLogProvider, target: Long): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (p.currentOffset < target && System.nanoTime() < deadline) Thread.sleep(10)
    assert(p.currentOffset >= target, s"socket spool never reached offset $target")
  }

  private def awaitInvalidated(p: SocketChangeLogProvider): String = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (p.invalidated.isEmpty && System.nanoTime() < deadline) Thread.sleep(10)
    assert(p.invalidated.isDefined, "invalidate event never surfaced")
    p.invalidated.get
  }

  test("copy.existing snapshot -> change stream -> invalidate -> re-resume: exactly-once") {
    // the collection holds {1->a, 2->b} as of offset 2; offsets 1-2 are
    // pre-copy history the stream can NEVER serve (truncated oplog)
    val server = new CopyResumableServer(Seq(1L -> "a", 2L -> "b"), collectionAsOf = 2L)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mongo_life_")
    val outDir = tmp.resolve("out").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("cdc-log")
        .option("provider.name", "mongo-life")
        .option("metadata.columns", "op_offset,row_kind")
        .load()
        .writeStream.format("parquet")
        .option("path", outDir)
        .outputMode("append")
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // columns: id, v, op, op_offset, row_kind
    def sink(): Seq[(Long, String, String, Long, String)] =
      spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
          r.getString(4))).toSeq

    try {
      // ---- phase 1: copy.existing snapshot ----
      val p1 = new SocketChangeLogProvider("localhost", server.port, meta,
        copyExisting = true)
      ProviderRegistry.register("mongo-life", p1)
      assert(p1.currentOffset === 2L, "the copy pins the collection's as-of offset")
      runOnce()
      val r1 = sink()
      assert(r1.filter(_._3 == "r").map(x => (x._1, x._2)).sorted ===
        Seq((1L, "a"), (2L, "b")), s"copied base wrong: $r1")
      assert(r1.forall(_._3 == "r"), "phase 1 must be snapshot-only")

      // ---- phase 2: change stream from the copy-pinned position ----
      server.publish(ev(3, "u", 1, "a2"))
      awaitOffset(p1, 3)
      runOnce()
      val r2 = sink()
      assert(r2.filter(_._4 == 3L).map(_._5).sorted === Seq("+U", "-U"),
        s"post-copy update not streamed: $r2")

      // ---- phase 3: invalidate ends the subscription ----
      server.publish("""{"offset":4,"op":"invalidate"}""")
      val token = awaitInvalidated(p1)
      // published after the invalidate: this provider life must never see it
      server.publish(ev(5, "c", 3, "c"))
      Thread.sleep(200)
      assert(p1.currentOffset === 3L,
        "a dead subscription must not deliver past the invalidate")
      p1.close()

      // ---- phase 4: re-resume strictly after the invalidate ----
      val p2 = new SocketChangeLogProvider("localhost", server.port, meta,
        resumeFrom = Some(token))
      ProviderRegistry.register("mongo-life", p2)
      awaitOffset(p2, 5)
      // no replay over the wire: nothing at or below the invalidate arrived
      assert(p2.log(meta.id, 0, 4).isEmpty,
        "re-resumed client must not re-receive pre-invalidate events")
      runOnce() // same checkpoint, new provider life
      val r3 = sink()
      assert(r3.filter(_._4 > 3L).map(x => (x._1, x._2, x._3)) ===
        Seq((3L, "c", "c")), s"post-invalidate event lost or duplicated: $r3")
      assert(r3.size === r2.size + 1, "exactly one event crossed the invalidate")

      // net effect across all four phases: the materialized state
      val state = r3.filterNot(_._5 == "-U")
        .groupBy(_._1).map { case (_, vs) => vs.maxBy(_._4) }
        .filterNot(_._3 == "d").map(x => (x._1, x._2)).toSeq.sorted
      assert(state === Seq((1L, "a2"), (2L, "b"), (3L, "c")))
      p2.close()
    } finally server.close()
  }
}
