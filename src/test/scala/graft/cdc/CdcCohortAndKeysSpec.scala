package graft.cdc

import graft.SparkSpec
import graft.cdc.provider.{ChangeLogProvider, InMemoryChangeLogProvider, ProviderRegistry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E2E coverage for round-2 source work:
  *  - string / composite primary keys through the full DSv2 path
  *  - multi-cohort snapshots (scan.snapshot.max-chunks-per-batch) with
  *    DIFFERENT per-cohort high watermarks under concurrent writes, and the
  *    log-phase emit filter making the result exactly-once (reference
  *    BinlogSplitReader.shouldEmit via FinishedSnapshotSplitInfo)
  *  - mid-stream newly-added tables without restart (reference W7,
  *    MySqlSourceReader.java:227-271)
  *  - the hard snapshot-consistency contract: a provider whose base races
  *    past the pinned high watermark fails loudly instead of duplicating
  */
class CdcCohortAndKeysSpec extends SparkSpec {

  // -------------------------------------------------------------------------
  // string / composite PKs
  // -------------------------------------------------------------------------

  test("string primary key: chunked batch read + streaming mutations E2E") {
    val schema = StructType(Seq(StructField("sku", StringType), StructField("qty", LongType)))
    val meta = TableMeta(TableId("inv", "stock"), schema, Seq("sku"))
    val base = Seq("ant", "bee", "cat", "dog", "eel", "fox", "gnu", "hen")
      .zipWithIndex.map { case (s, i) => Array[Any](s, i.toLong) }
    val p = new InMemoryChangeLogProvider(meta, base, Seq(
      LogRecord(1, ChangeOp.Update, meta.id, Array[Any]("cat", 2L), Array[Any]("cat", 99L), 100)),
      staleOffset = 0)
    ProviderRegistry.register("string-pk", p)
    val df = spark.read.format("cdc-log")
      .option("provider.name", "string-pk")
      .option("scan.incremental.snapshot.chunk.size", "3")
      .load()
    assert(df.rdd.getNumPartitions >= 2, "string PK must still snapshot in parallel chunks")
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === base.map(_(0)).toSet)
    assert(rows("cat") === 99L, "catch-up fold must work on string keys")

    // streaming: a post-snapshot delete keyed by string arrives exactly once
    val q = spark.readStream.format("cdc-log").option("provider.name", "string-pk")
      .option("scan.incremental.snapshot.chunk.size", "3")
      .load().writeStream.format("memory").queryName("string_pk_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      p.append(LogRecord(2, ChangeOp.Delete, meta.id, Array[Any]("bee", 1L), null, 200))
      q.processAllAvailable()
      val sink = spark.table("string_pk_sink").collect()
      assert(sink.count(_.getString(2) == "d") === 1)
      assert(sink.filter(_.getString(2) == "d").head.getString(0) === "bee")
    } finally q.stop()
  }

  test("composite primary key (region, id): chunk planning and fold E2E") {
    val schema = StructType(Seq(StructField("region", StringType),
      StructField("id", LongType), StructField("v", DoubleType)))
    val meta = TableMeta(TableId("inv", "multi"), schema, Seq("region", "id"))
    val base = for (r <- Seq("east", "west"); i <- 0L until 5L)
      yield Array[Any](r, i, i.toDouble)
    val p = new InMemoryChangeLogProvider(meta, base, Seq(
      LogRecord(1, ChangeOp.Update, meta.id,
        Array[Any]("west", 3L, 3.0), Array[Any]("west", 3L, 33.0), 100)), staleOffset = 0)
    ProviderRegistry.register("composite-pk", p)
    val df = spark.read.format("cdc-log")
      .option("provider.name", "composite-pk")
      .option("scan.incremental.snapshot.chunk.size", "4")
      .load()
    assert(df.rdd.getNumPartitions >= 2, "composite PK must chunk in parallel")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows.size === 10)
    assert(rows(("west", 3L)) === 33.0, "catch-up fold must key on the full composite PK")
  }

  // -------------------------------------------------------------------------
  // multi-cohort snapshot + emit filter
  // -------------------------------------------------------------------------

  /** A provider under concurrent writes: each currentOffset probe (one per
    * planning step) first commits the next scripted mutation — so snapshot
    * cohorts admitted in successive micro-batches pin DIFFERENT high
    * watermarks, exactly the situation the per-chunk emit filter exists
    * for. */
  private final class BusyProvider(meta: TableMeta, base: Seq[Array[Any]],
      script: Iterator[LogRecord]) extends ChangeLogProvider {
    val inner = new InMemoryChangeLogProvider(meta, base, Seq.empty, staleOffset = 0)
    override def tables: Seq[TableMeta] = inner.tables
    override def currentOffset: Long = {
      if (script.hasNext) inner.append(script.next())
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

  test("multi-cohort snapshot: per-cohort HWs differ and the emit filter makes it exactly-once") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("weight", DoubleType)))
    val meta = TableMeta(TableId("inv", "cohorts"), schema, Seq("id"))
    def row(id: Long, n: String, w: Double): Array[Any] = Array(id, n, w)
    val base = (1L to 6L).map(i => row(i, s"p$i", i.toDouble))
    // mutations committed DURING the snapshot, one per planning step
    val script = Iterator(
      LogRecord(1, ChangeOp.Update, meta.id, row(1, "p1", 1.0), row(1, "a1", 1.0), 100),
      LogRecord(2, ChangeOp.Update, meta.id, row(3, "p3", 3.0), row(3, "a3", 3.0), 200),
      LogRecord(3, ChangeOp.Update, meta.id, row(5, "p5", 5.0), row(5, "a5", 5.0), 300),
      LogRecord(4, ChangeOp.Create, meta.id, null, row(9, "a9", 9.0), 400))
    val p = new BusyProvider(meta, base, script)
    ProviderRegistry.register("cohorts", p)

    val q = spark.readStream.format("cdc-log")
      .option("provider.name", "cohorts")
      .option("scan.incremental.snapshot.chunk.size", "2")
      .option("scan.snapshot.max-chunks-per-batch", "1") // one chunk per micro-batch
      .option("metadata.columns", "op_offset,row_kind")
      .load().writeStream.format("memory").queryName("cohort_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val snap = spark.table("cohort_sink").collect()
      val rRows = snap.filter(_.getString(3) == "r")
      // cohorts pinned different HWs → snapshot rows carry >= 2 distinct
      // consistency offsets (op_offset on op='r' rows is the chunk's HW)
      assert(rRows.map(_.getLong(4)).distinct.length >= 2,
        s"expected differing per-cohort HWs, got ${rRows.map(_.getLong(4)).toSeq}")
      // every scripted mutation is visible exactly once: folded into its
      // chunk's 'r' row, never ALSO emitted as a log row (offsets 1..4)
      val logRows = snap.filterNot(_.getString(3) == "r")
      assert(logRows.filter(_.getLong(4) <= 4).isEmpty,
        s"emit filter must suppress events already folded into chunks: ${logRows.toSeq}")
      val byId = rRows.map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(byId(1L) === "a1" && byId(3L) === "a3" && byId(5L) === "a5",
        "later cohorts must fold the later mutations")
      assert(byId.contains(9L), "insert during snapshot folds into the covering chunk")

      // a post-snapshot mutation flows as a normal log event, exactly once
      p.inner.append(LogRecord(5, ChangeOp.Update, meta.id, row(2, "p2", 2.0), row(2, "b2", 2.0), 500))
      q.processAllAvailable()
      val after = spark.table("cohort_sink").collect().filterNot(_.getString(3) == "r")
      assert(after.map(r => (r.getLong(4), r.getString(5))).sorted.toSeq ===
        Seq((5L, "+U"), (5L, "-U")), s"got ${after.toSeq}")
    } finally q.stop()
  }

  // -------------------------------------------------------------------------
  // mid-stream newly-added tables (W7-lite)
  // -------------------------------------------------------------------------

  /** Composite provider whose table set can GROW mid-stream — the moral
    * equivalent of creating a new sharding table in the database. */
  private final class GrowableProvider(initial: Seq[ChangeLogProvider]) extends ChangeLogProvider {
    @volatile var parts: Seq[ChangeLogProvider] = initial
    def add(p: ChangeLogProvider): Unit = parts = parts :+ p
    private def owner(t: TableId): ChangeLogProvider =
      parts.find(_.tables.exists(_.id == t)).getOrElse(
        throw new IllegalArgumentException(s"no provider owns $t"))
    override def tables: Seq[TableMeta] = parts.flatMap(_.tables)
    override def currentOffset: Long = parts.map(_.currentOffset).foldLeft(0L)(math.max)
    override def keyBounds(t: TableId): (ChunkKey.Key, ChunkKey.Key, Long) = owner(t).keyBounds(t)
    override def nextChunkEnd(t: TableId, from: ChunkKey.Key, n: Int): Option[ChunkKey.Key] =
      owner(t).nextChunkEnd(t, from, n)
    override def snapshotBase(t: TableId, r: SnapshotSplit): (Long, Iterator[Array[Any]]) =
      owner(t).snapshotBase(t, r)
    override def log(t: TableId, from: Long, to: Long): Iterator[LogRecord] =
      owner(t).log(t, from, to)
  }

  test("newly-added table mid-stream: snapshot + log flow without restart (W7-lite)") {
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val m1 = TableMeta(TableId("shard", "user_1"), schema, Seq("id"))
    val m2 = TableMeta(TableId("shard", "user_2"), schema, Seq("id"))
    val p1 = new InMemoryChangeLogProvider(m1, Seq(Array[Any](1L, "u1")), Seq.empty)
    val g = new GrowableProvider(Seq(p1))
    ProviderRegistry.register("growable", g)

    val q = spark.readStream.format("cdc-log")
      .option("provider.name", "growable")
      .option("table-name", "user_.*")
      .option("metadata.columns", "table_name,op_offset")
      .load().writeStream.format("memory").queryName("grow_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("grow_sink").count() === 1)

      // "CREATE TABLE user_2" + pre-existing rows and log history
      val p2 = new InMemoryChangeLogProvider(m2, Seq(Array[Any](2L, "u2")), Seq(
        LogRecord(5, ChangeOp.Create, m2.id, null, Array[Any](3L, "u3"), 500)))
      g.add(p2)
      q.processAllAvailable()
      val rows = spark.table("grow_sink").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSet
      // user_2's base AND its pre-discovery log are folded into its
      // snapshot (op='r'); nothing duplicates as a log event
      assert(rows === Set((1L, "r", "user_1"), (2L, "r", "user_2"), (3L, "r", "user_2")),
        s"got $rows")

      // post-discovery mutations on the new table flow as log events
      p2.append(LogRecord(6, ChangeOp.Create, m2.id, null, Array[Any](4L, "u4"), 600))
      q.processAllAvailable()
      val after = spark.table("grow_sink").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSet
      assert(after.contains((4L, "c", "user_2")))
      assert(after.size === 4, "no duplicates after the new-table transition")
    } finally q.stop()
  }

  // -------------------------------------------------------------------------
  // racing provider → executor-side HW adoption (batch path)
  // -------------------------------------------------------------------------

  test("a provider whose base races past the pinned HW: chunk adopts the newer base (batch)") {
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val meta = TableMeta(TableId("inv", "racy"), schema, Seq("id"))
    // staleOffset=50 simulates a store that serves a NEWER base than the
    // planning-time pin (currentOffset=0, no log). Batch reads have no log
    // phase to reconcile against, so the chunk simply reflects the newer
    // base — exactly once, no failure. (The streaming path additionally
    // reports the observed HW back — CdcRacingBaseSpec.)
    val p = new InMemoryChangeLogProvider(meta, Seq(Array[Any](1L, "a")), Seq.empty,
      staleOffset = 50)
    ProviderRegistry.register("racy", p)
    val rows = spark.read.format("cdc-log").option("provider.name", "racy").load().collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ===
      Seq((1L, "a", "r")))
  }
}
