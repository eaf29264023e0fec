package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The temporal-join hot-key fan-out contract (round-7 verdict "What's
  * wrong #4") and its mitigation:
  *
  *   - STRESS: one dimension key updated 10³ times inside the horizon makes
  *     the plain [[StreamingOps.temporalJoin]] stage-1 emit 10³ intermediate
  *     rows per event; [[StreamingOps.temporalJoinCompacted]] bounds that to
  *     O(updates-per-grain + horizon/grain). The fan-out is a static
  *     property of the join conditions, so it is measured exactly, in batch,
  *     on the very frames the streaming operators join.
  *   - EQUIVALENCE: both constructions produce the SAME rows — streaming,
  *     across micro-batches, inner and outer, including the
  *     compacted-channel-only case (in-force version in a closed grain
  *     older than one grain) that the raw channel cannot see.
  *   - PLAN: the compacted form chains windowed-agg → two symmetric hash
  *     joins → union → windowed-agg, all state watermark-bounded.
  */
class TemporalCompactionSpec extends SparkSpec {
  import java.sql.Timestamp
  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private val horizonMs = 120000L // 2 min
  private val grainMs = 30000L    // 30 s → horizon/grain = 4

  test("hot key with 1000 in-horizon versions: compacted bounds the stage-1 fan-out") {
    import spark.implicits._
    val horizonS = 3600L // 1 h horizon for the stress shape
    val grainS = 60L     // 1 min grain → horizon/grain = 60
    // key 1: 1000 versions spread over the hour before t=3600
    val dims = spark.range(1000).select(lit(1L).as("v_key"), col("id").as("ver_id"),
      timestamp_seconds(lit(3600L) - col("id") * horizonS / 1000).as("vts"),
      col("id").cast("double").as("value"))
    val events = Seq((1L, 100L, ts(3600))).toDF("e_key", "event_id", "ets")
    // plain stage 1: every in-horizon version pairs with the event
    val rawPairs = events.join(dims,
      expr(s"e_key = v_key AND vts <= ets AND vts >= ets - interval $horizonS seconds"))
    assert(rawPairs.count() === 1000L)
    // compacted channels: last-grain raw + one row per closed grain
    val rawChannel = events.join(dims,
      expr(s"e_key = v_key AND vts <= ets AND vts >= ets - interval $grainS seconds"))
    val comp = StreamingOps.compactVersions(dims, "vts", "v_key", s"$grainS seconds",
      payload = Seq("value"), tieCols = Seq("ver_id"))
    val compChannel = events.join(comp,
      expr(s"e_key = v_key AND __grain_t < ets AND __grain_t >= ets - interval $horizonS seconds"))
    val fanOut = rawChannel.count() + compChannel.count()
    // ≤ updates-per-grain (1000/60 ≈ 17) + horizon/grain (60) ≈ 77 — a 13×
    // reduction; the bound is structural, not data luck
    assert(fanOut <= 80, s"compacted fan-out $fanOut")
    assert(fanOut >= 60, s"suspiciously low fan-out $fanOut — channels missing rows?")
  }

  /** Drives both constructions over the same MemoryStream feed; returns
    * (plain rows, compacted rows) as comparable sets. */
  private def runBoth(outer: Boolean): (Set[(Long, Option[Long], Option[Double])],
      Set[(Long, Option[Long], Option[Double])]) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val jt = if (outer) "leftOuter" else "inner"

    def drive(compacted: Boolean): Set[(Long, Option[Long], Option[Double])] = {
      val eIn = MemoryStream[(Long, Long, Timestamp)]
      val vIn = MemoryStream[(Long, Long, Timestamp, Double)]
      val e = eIn.toDF().toDF("e_key", "event_id", "ets")
      val v = vIn.toDF().toDF("v_key", "ver_id", "vts", "value")
      val joined =
        if (compacted) StreamingOps.temporalJoinCompacted(e, "ets", v, "vts",
          "e_key", "v_key", horizonMs, grainMs, lateness = "10 seconds",
          eCols = Seq("e_key", "event_id"), payload = Seq("value"),
          tieCols = Seq("ver_id"), joinType = jt)
        else StreamingOps.temporalJoin(e, "ets", v, "vts",
          "e_key", "v_key", horizonMs, lateness = "10 seconds",
          eCols = Seq("e_key", "event_id"), payload = Seq("value"),
          tieCols = Seq("ver_id"), joinType = jt)
      val name = s"tjc_${if (compacted) "c" else "p"}_${if (outer) "o" else "i"}"
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // key 1 versions across three grains: v10@t10 [0,30), v11@t40
        // [30,60), v12@t95 [90,120); key 2's only version is stale for its
        // event; key 3 has none
        vIn.addData((1L, 10L, ts(10), 7.0), (1L, 11L, ts(40), 8.0),
          (1L, 12L, ts(95), 9.5), (2L, 20L, ts(15), 9.0))
        // e100@t30→v10 (closed-grain channel); e105@t47→v11 (same-grain raw
        // channel: grain [30,60) still open at t47); e101@t50→v11;
        // e102@t100→v12 (raw: [70,100]); e103@t130→v12 (compacted ONLY:
        // raw window [100,130] misses t95, grain [90,120) closed at 120);
        // e104@t200: v20 is 185 s stale (> 2 min horizon) → inner drops,
        // outer keeps null; e106 key 3 → no version at all
        eIn.addData((1L, 100L, ts(30)), (1L, 105L, ts(47)), (1L, 101L, ts(50)),
          (1L, 102L, ts(100)), (1L, 103L, ts(130)), (2L, 104L, ts(200)),
          (3L, 106L, ts(30)))
        q.processAllAvailable()
        // watermark pushes: compaction adds one stateful stage, so flush
        // with three sentinel waves (each advances both sides)
        Seq(1000L, 2000L, 3000L, 4000L).foreach { t =>
          eIn.addData((9L, 900L + t, ts(t))); vIn.addData((9L, 90L, ts(t), 0.0))
          q.processAllAvailable()
        }
        if (compacted) {
          val ops = q.lastProgress.stateOperators.map(_.operatorName.toLowerCase)
          assert(ops.count(_.contains("symmetrichashjoin")) === 2, ops.mkString(","))
          assert(ops.count(_.contains("statestoresave")) >= 2, ops.mkString(","))
        }
        spark.table(name).select("event_id", "ver_id", "value")
          .where(col("event_id") < 900)
          .collect().map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      } finally q.stop()
    }
    (drive(compacted = false), drive(compacted = true))
  }

  test("streaming equivalence, inner: compacted = plain = in-force versions") {
    val (plain, compacted) = runBoth(outer = false)
    val expected = Set[(Long, Option[Long], Option[Double])](
      (100L, Some(10L), Some(7.0)), (105L, Some(11L), Some(8.0)),
      (101L, Some(11L), Some(8.0)), (102L, Some(12L), Some(9.5)),
      (103L, Some(12L), Some(9.5)))
    assert(plain === expected)
    assert(compacted === expected)
  }

  test("streaming equivalence, outer: unmatched events keep NULL version columns") {
    val (plain, compacted) = runBoth(outer = true)
    val expected = Set[(Long, Option[Long], Option[Double])](
      (100L, Some(10L), Some(7.0)), (105L, Some(11L), Some(8.0)),
      (101L, Some(11L), Some(8.0)), (102L, Some(12L), Some(9.5)),
      (103L, Some(12L), Some(9.5)), (104L, None, None), (106L, None, None))
    assert(plain === expected)
    assert(compacted === expected)
  }
}
