package graft.cdc

import graft.SparkSpec
import graft.cdc.provider.{ChangeLogProvider, InMemoryChangeLogProvider, ProviderRegistry}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Trigger.AvailableNow: the bounded CDC catch-up run — processes exactly
  * what existed at query start, ignores events committed during the run,
  * and a later run picks them up from the same checkpoint. */
class CdcAvailableNowSpec extends SparkSpec {
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))
  private val meta = TableMeta(TableId("inv", "an"), schema, Seq("id"))

  /** Appends a late event on the SECOND currentOffset probe — i.e. after
    * prepareForTriggerAvailableNow has pinned the bound. */
  private final class LateWriteProvider(val inner: InMemoryChangeLogProvider,
      late: LogRecord) extends ChangeLogProvider {
    private var calls = 0
    override def tables: Seq[TableMeta] = inner.tables
    override def currentOffset: Long = synchronized {
      calls += 1
      if (calls == 2) inner.append(late)
      inner.currentOffset
    }
    override def keyBounds(t: TableId): (ChunkKey.Key, ChunkKey.Key, Long) = inner.keyBounds(t)
    override def nextChunkEnd(t: TableId, from: ChunkKey.Key, n: Int): Option[ChunkKey.Key] =
      inner.nextChunkEnd(t, from, n)
    override def snapshotBase(t: TableId, r: SnapshotSplit): (Long, Iterator[Array[Any]]) =
      inner.snapshotBase(t, r)
    override def log(t: TableId, from: Long, to: Long): Iterator[LogRecord] =
      inner.log(t, from, to)
  }

  test("AvailableNow processes exactly the prepared bound; next run resumes") {
    val inner = new InMemoryChangeLogProvider(meta, Seq(Array[Any](1L, "a")), Seq(
      LogRecord(1, ChangeOp.Create, meta.id, null, Array[Any](2L, "b"), 100)))
    val p = new LateWriteProvider(inner,
      LogRecord(9, ChangeOp.Create, meta.id, null, Array[Any](9L, "late"), 900))
    ProviderRegistry.register("available-now", p)
    val ckpt = Files.createTempDirectory("cdc-an-ckpt").toString
    val out = Files.createTempDirectory("cdc-an-out").toString

    def runOnce(): Unit = {
      val q = spark.readStream.format("cdc-log").option("provider.name", "available-now")
        .load().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    val first = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(2))).toSet
    // snapshot folds the pre-start log; the mid-run write (offset 9) is
    // excluded by the prepared bound
    assert(first === Set((1L, "r"), (2L, "r")), s"got $first")

    runOnce()
    val second = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(second === Set((1L, "r"), (2L, "r"), (9L, "c")),
      s"next run must pick up the late write, got $second")
  }
}
