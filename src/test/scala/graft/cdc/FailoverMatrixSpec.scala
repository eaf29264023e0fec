package graft.cdc

import graft.SparkSpec
import graft.cdc.provider.{ProviderRegistry, SocketChangeLogProvider}
import graft.cdc.source.CdcOffset
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The reference's kill-and-restore failover matrix as one E2E battery —
  * the Spark analogue of mysql/source/MySqlSourceITCase.java:105-135
  * (testTaskManagerFailover / testJobManagerFailover × snapshot/binlog
  * phases): a REAL checkpointed streaming query is killed while running —
  * `query.stop()` interrupts whatever batch is in flight, exactly like a
  * driver loss; the planned-but-uncommitted batch replays on restart — in
  * each phase × each provider, then restored from the same checkpoint, and
  * the sink must hold exactly-once counts:
  *
  *   | phase \ provider  | file (JSONL store) | socket (live wire, copy.existing) |
  *   | mid-snapshot-cohort | cell 1           | cell 3                            |
  *   | mid-log             | cell 2           | cell 4                            |
  *
  * The kill is phase-targeted, not time-targeted: the driver polls the
  * checkpoint's offset log and stops the query the moment the planned
  * offset shows the wanted phase (≥1 finished cohort but snapshot not
  * done / log position strictly inside the event range), then ASSERTS the
  * phase from the last planned offset — a kill that raced past its phase
  * fails the test rather than silently testing nothing. */
class FailoverMatrixSpec extends SparkSpec {
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private val BaseKeys = 200
  private val NumEvents = 40

  /** Post-snapshot events, offsets 1..40: updates on low keys, deletes on
    * high keys, creates of fresh keys. */
  private def eventLine(off: Long): String = (off % 4) match {
    case 1 => s"""{"offset":$off,"op":"u","tsMs":${off * 10},"before":{"id":$off,"v":"v$off"},"after":{"id":$off,"v":"u$off"}}"""
    case 2 => s"""{"offset":$off,"op":"d","tsMs":${off * 10},"before":{"id":${100 + off},"v":"v${100 + off}"},"after":null}"""
    case 3 => s"""{"offset":$off,"op":"c","tsMs":${off * 10},"before":null,"after":{"id":${1000 + off},"v":"c$off"}}"""
    case _ => s"""{"offset":$off,"op":"u","tsMs":${off * 10},"before":{"id":${50 + off},"v":"v${50 + off}"},"after":{"id":${50 + off},"v":"w$off"}}"""
  }

  /** Closed-form expected final state: base {i -> v_i} + the 40 events. */
  private def expectedState: Seq[(Long, String)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    (1 to BaseKeys).foreach(i => m.put(i.toLong, s"v$i"))
    (1L to NumEvents).foreach { off =>
      (off % 4) match {
        case 1 => m.put(off, s"u$off")
        case 2 => m.remove(100 + off)
        case 3 => m.put(1000 + off, s"c$off")
        case _ => m.put(50 + off, s"w$off")
      }
    }
    m.toSeq.sortBy(_._1)
  }

  // --- checkpoint phase inspection --------------------------------------

  private def latestPlannedOffset(ckpt: Path): Option[CdcOffset] = {
    val dir = ckpt.resolve("offsets")
    if (!Files.isDirectory(dir)) return None
    val batches = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.forall(_.isDigit)).toSeq
    if (batches.isEmpty) return None
    val latest = batches.maxBy(_.getFileName.toString.toLong)
    val lines = Files.readAllLines(latest).asScala.filter(_.trim.nonEmpty)
    // offset-log format: "v1" header, metadata JSON, then one line per
    // source — ours is the single source, so the LAST line is its offset
    lines.lastOption.filter(_.startsWith("{")).map(CdcOffset.parse)
  }

  /** Run with a live trigger, kill the query the moment the planned offset
    * satisfies `phase`, assert the kill landed in-phase, return. */
  private def runUntilPhaseThenKill(providerOpts: Map[String, String],
      outDir: String, ckpt: Path, phase: CdcOffset => Boolean,
      phaseName: String): Unit = {
    var reader = spark.readStream.format("cdc-log")
    providerOpts.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.option("metadata.columns", "op_offset,row_kind").load()
      .writeStream.format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!latestPlannedOffset(ckpt).exists(phase) &&
        System.nanoTime() < deadline) {
        if (q.exception.isDefined) throw q.exception.get
        Thread.sleep(10)
      }
    } finally q.stop() // the kill: interrupts whatever batch is in flight
    val off = latestPlannedOffset(ckpt)
    assert(off.exists(phase),
      s"kill missed the $phaseName window: last planned offset = $off")
  }

  /** Restore from the same checkpoint and drain to the end. */
  private def restore(providerOpts: Map[String, String], outDir: String,
      ckpt: Path): Unit = {
    var reader = spark.readStream.format("cdc-log")
    providerOpts.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.option("metadata.columns", "op_offset,row_kind").load()
      .writeStream.format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  // --- exactly-once verification ----------------------------------------

  /** The full exactly-once audit: every base key snapshotted exactly once,
    * every event present with exactly its changelog arity, and the
    * materialized state equal to the closed form. */
  private def verifyExactlyOnce(outDir: String, label: String): Unit = {
    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSeq // id, v, op, op_offset, row_kind

    // snapshot rows: exactly one 'r' per base key — a replayed chunk would
    // duplicate its whole range, a lost one would drop it
    val snap = rows.filter(_._3 == "r")
    assert(snap.size === BaseKeys, s"$label: ${snap.size} snapshot rows != $BaseKeys")
    assert(snap.map(_._1).distinct.size === BaseKeys, s"$label: duplicated snapshot keys")

    // log rows: exact changelog arity per offset — u → -U/+U pair,
    // c → +I, d → ONE op='d' row from the before-image with RowKind +I
    // (full-mode delete-as-insert, RowDataDebeziumDeserializeSchema:127-132)
    val log = rows.filterNot(_._3 == "r").groupBy(_._4)
    (1L to NumEvents).foreach { off =>
      val got = log.getOrElse(off, Seq.empty).map(x => (x._3, x._5)).sorted
      val want = (off % 4) match {
        case 1 | 0 => Seq(("u", "+U"), ("u", "-U"))
        case 2     => Seq(("d", "+I"))
        case _     => Seq(("c", "+I"))
      }
      assert(got === want, s"$label: offset $off rows $got != $want")
    }
    assert(log.keySet === (1L to NumEvents).toSet, s"$label: stray offsets ${log.keySet}")

    // materialized state == closed form (a key whose last row is the
    // delete's before-image row drops out)
    val state = rows.filterNot(_._5 == "-U")
      .groupBy(_._1).map { case (_, vs) => vs.maxBy(_._4) }
      .filterNot(_._3 == "d")
      .map(x => (x._1, x._2)).toSeq.sorted
    assert(state === expectedState, s"$label: materialized state diverged")
  }

  private def midSnapshot(o: CdcOffset): Boolean =
    !o.snapshotDone && o.finished.values.flatten.nonEmpty
  private def midLog(o: CdcOffset): Boolean =
    o.snapshotDone && o.logPos > 0 && o.logPos < NumEvents

  // options forcing many small batches so both phases have kill windows:
  // 200 keys / chunk.size 50 = 4+ cohort batches, 40 events / 10 = 4 log
  // batches
  private def paceOpts: Map[String, String] = Map(
    "scan.incremental.snapshot.chunk.size" -> "50",
    "scan.snapshot.max-chunks-per-batch" -> "1",
    "scan.log.max-offsets-per-batch" -> "10")

  // --- the file cells ----------------------------------------------------

  private def mkFileFixture(): Path = {
    val root = Files.createTempDirectory("failover_file_")
    val dir = root.resolve("db.t")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("meta.json"),
      """{"db":"db","table":"t","primaryKey":["id"],"schema":"id BIGINT, v STRING","baseOffset":0}""")
    Files.writeString(dir.resolve("snapshot.jsonl"),
      (1 to BaseKeys).map(i => s"""{"id":$i,"v":"v$i"}""").mkString("", "\n", "\n"))
    root
  }

  private def appendFileEvents(root: Path): Unit = {
    val log = root.resolve("db.t").resolve("log.jsonl")
    Files.writeString(log,
      (1L to NumEvents).map(eventLine).mkString("", "\n", "\n"))
  }

  private def fileCell(killPhase: String): Unit = {
    val root = mkFileFixture()
    val tmp = Files.createTempDirectory(s"failover_file_${killPhase}_")
    val outDir = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt")
    val opts = paceOpts + ("path" -> root.toString)
    if (killPhase == "snapshot") {
      runUntilPhaseThenKill(opts, outDir, ckpt, midSnapshot, "mid-snapshot")
      restore(opts, outDir, ckpt)           // finish the snapshot
      appendFileEvents(root)                // events arrive after recovery
      restore(opts, outDir, ckpt)           // drain the log
    } else {
      restore(opts, outDir, ckpt)           // snapshot completes cleanly
      appendFileEvents(root)
      runUntilPhaseThenKill(opts, outDir, ckpt, midLog, "mid-log")
      restore(opts, outDir, ckpt)           // drain the rest of the log
    }
    verifyExactlyOnce(outDir, s"file/$killPhase")
  }

  test("cell 1: file provider, kill mid-snapshot-cohort, restore: exactly-once") {
    fileCell("snapshot")
  }
  test("cell 2: file provider, kill mid-log, restore: exactly-once") {
    fileCell("log")
  }

  test("cell 2b: SHARDED log catch-up, kill mid-log, restore: exactly-once") {
    // same choreography as cell 2, with every log batch split into 4
    // key-range shards (window 10 / min-per-shard 2). The kill interrupts
    // a batch whose shards may have PARTIALLY completed; the restore
    // re-plans the same (start, end] window — possibly with re-derived
    // boundaries — and the per-offset changelog-arity audit below is
    // exactly what catches a duplicated shard (doubled rows) or a lost
    // one (missing offsets). The 1000+off creates land BEYOND the probed
    // snapshot bounds, pinning the unbounded-last-shard path under
    // replay.
    val root = mkFileFixture()
    val tmp = Files.createTempDirectory("failover_shard_")
    val outDir = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt")
    val opts = paceOpts + ("path" -> root.toString) +
      ("scan.log.catchup.shards" -> "4") +
      ("scan.log.catchup.min-offsets-per-shard" -> "2")
    restore(opts, outDir, ckpt) // snapshot completes cleanly
    appendFileEvents(root)
    runUntilPhaseThenKill(opts, outDir, ckpt, midLog, "mid-log")
    restore(opts, outDir, ckpt) // drain the rest, sharded
    verifyExactlyOnce(outDir, "file/sharded-log")
  }

  // --- the socket cells (live wire, copy.existing base) ------------------

  private def socketCell(killPhase: String): Unit = {
    val server = new CopyResumableServer(
      (1 to BaseKeys).map(i => i.toLong -> s"v$i"), collectionAsOf = 0L)
    val meta = TableMeta(TableId("db", "t"), schema, Seq("id"))
    val name = s"failover-socket-$killPhase"
    val provider = new SocketChangeLogProvider("localhost", server.port, meta,
      copyExisting = true)
    val tmp = Files.createTempDirectory(s"failover_socket_${killPhase}_")
    val outDir = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt")
    val opts = paceOpts + ("provider.name" -> name)
    try {
      ProviderRegistry.register(name, provider)
      def publishAll(): Unit = {
        (1L to NumEvents).foreach(off => server.publish(eventLine(off)))
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (provider.currentOffset < NumEvents && System.nanoTime() < deadline)
          Thread.sleep(10)
        assert(provider.currentOffset >= NumEvents, "events never reached the spool")
      }
      if (killPhase == "snapshot") {
        runUntilPhaseThenKill(opts, outDir, ckpt, midSnapshot, "mid-snapshot")
        restore(opts, outDir, ckpt)
        publishAll()
        restore(opts, outDir, ckpt)
      } else {
        restore(opts, outDir, ckpt)
        publishAll()
        runUntilPhaseThenKill(opts, outDir, ckpt, midLog, "mid-log")
        restore(opts, outDir, ckpt)
      }
      verifyExactlyOnce(outDir, s"socket/$killPhase")
    } finally {
      provider.close()
      server.close()
    }
  }

  test("cell 3: socket provider (copy.existing), kill mid-snapshot-cohort, restore: exactly-once") {
    socketCell("snapshot")
  }
  test("cell 4: socket provider (copy.existing), kill mid-log, restore: exactly-once") {
    socketCell("log")
  }

  // --- cell 5: kill MID-PROMOTE-RESTART ----------------------------------
  // The F7 typed-promotion path at its most delicate point: life 1 drains
  // the v1 log; the table drifts (ADD COLUMN w DOUBLE) and the promotion
  // signal fires; life 2 restarts from the SAME checkpoint with the
  // promoted schema and is KILLED strictly inside the post-drift log
  // (planned-but-uncommitted batch in flight); life 3 restores and drains.
  // The audit then holds the whole history to exactly-once: v1 snapshot
  // once, every pre-drift event at v1 arity, every post-drift event at v2
  // arity with `w` TYPED (not stringified), final state = closed form.

  private val DriftAt = 20L // events 1..20 are v1-shaped, 21..40 v2-shaped

  private def eventLineV2(off: Long): String = (off % 4) match {
    case 1 => s"""{"offset":$off,"op":"u","tsMs":${off * 10},"before":{"id":$off,"v":"v$off","w":null},"after":{"id":$off,"v":"u$off","w":${off}.5}}"""
    case 2 => s"""{"offset":$off,"op":"d","tsMs":${off * 10},"before":{"id":${100 + off},"v":"v${100 + off}","w":null},"after":null}"""
    case 3 => s"""{"offset":$off,"op":"c","tsMs":${off * 10},"before":null,"after":{"id":${1000 + off},"v":"c$off","w":${off}.5}}"""
    case _ => s"""{"offset":$off,"op":"u","tsMs":${off * 10},"before":{"id":${50 + off},"v":"v${50 + off}","w":null},"after":{"id":${50 + off},"v":"w$off","w":${off}.5}}"""
  }

  test("cell 5: kill mid-promote-restart — drift signaled, promoted life killed in-flight, restore: exactly-once with w typed") {
    import graft.cdc.provider.FileChangeLogProvider
    val root = mkFileFixture()
    val tmp = Files.createTempDirectory("failover_promote_")
    val outDir = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt")
    val metaPath = root.resolve("db.t").resolve("meta.json")
    val logPath = root.resolve("db.t").resolve("log.jsonl")
    val opts = paceOpts + ("path" -> root.toString)

    // life 1: snapshot completes clean, THEN the v1 half of the log
    // arrives and is drained (events written before the snapshot would
    // fold into the chunks under the high watermark, never flowing as
    // change rows — the same resume-after contract q92's fixture honors)
    restore(opts, outDir, ckpt)
    Files.writeString(logPath,
      (1L to DriftAt).map(eventLine).mkString("", "\n", "\n"))
    restore(opts, outDir, ckpt)
    val declaredV1 = spark.readStream.format("cdc-log")
      .option("path", root.toString).load().schema
    assert(CdcSchemaHistory.promotedSchema(new FileChangeLogProvider(root.toString),
      declaredV1).isEmpty, "no drift yet → no promotion signal")

    // the drift: ALTER TABLE ADD COLUMN w DOUBLE + v2-shaped events
    Files.writeString(metaPath,
      """{"db":"db","table":"t","primaryKey":["id"],"schema":"id BIGINT, v STRING, w DOUBLE","baseOffset":0}""")
    Files.writeString(logPath,
      Files.readString(logPath) +
        ((DriftAt + 1) to NumEvents).map(eventLineV2).mkString("", "\n", "\n"))
    val promoted = CdcSchemaHistory.promotedSchema(
      new FileChangeLogProvider(root.toString), declaredV1)
    assert(promoted.exists(_.fieldNames.toSeq == Seq("id", "v", "w")),
      s"drift must raise the promotion signal, got $promoted")

    // life 2: promoted restart, killed strictly inside the post-drift log
    // (5-offset batches → planned offsets 25/30/35/40, three kill windows)
    val promotePace = opts + ("scan.log.max-offsets-per-batch" -> "5")
    runUntilPhaseThenKill(promotePace, outDir, ckpt,
      o => o.snapshotDone && o.logPos > DriftAt && o.logPos < NumEvents,
      "mid-promote-restart")

    // life 3: restore from the same checkpoint, drain to the end
    restore(promotePace, outDir, ckpt)

    // exactly-once audit over BOTH schema eras (mergeSchema: the sink's
    // files carry v1 and v2 layouts)
    val rows = spark.read.option("mergeSchema", "true").parquet(outDir).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"),
        r.getAs[Any]("w"), r.getAs[String]("op"), r.getAs[Long]("op_offset"),
        r.getAs[String]("row_kind"))).toSeq
    val snap = rows.filter(_._4 == "r")
    assert(snap.size === BaseKeys && snap.map(_._1).distinct.size === BaseKeys,
      s"promote cell: snapshot not exactly-once (${snap.size})")
    assert(snap.forall(_._3 == null), "v1 snapshot rows must carry null w")
    val log = rows.filterNot(_._4 == "r").groupBy(_._5)
    (1L to NumEvents).foreach { off =>
      val got = log.getOrElse(off, Seq.empty).map(x => (x._4, x._6)).sorted
      val want = (off % 4) match {
        case 1 | 0 => Seq(("u", "+U"), ("u", "-U"))
        case 2     => Seq(("d", "+I"))
        case _     => Seq(("c", "+I"))
      }
      assert(got === want, s"promote cell: offset $off rows $got != $want")
      // post-drift after-images carry w TYPED; the kill/replay must not
      // have left a stringified or dropped column behind
      if (off > DriftAt && (off % 4 == 1 || off % 4 == 3 || off % 4 == 0)) {
        val afters = log(off).filter(x => x._6 == "+U" || x._6 == "+I")
        assert(afters.nonEmpty && afters.forall(_._3 == off + 0.5),
          s"promote cell: offset $off w not typed: ${log(off)}")
      }
    }
    assert(log.keySet === (1L to NumEvents).toSet,
      s"promote cell: stray offsets ${log.keySet}")
  }
}
