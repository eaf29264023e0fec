package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
/** Session totals accumulate as exact decimals (each event value quantized
  * to 6 dp exactly like the `graft.Q.dsum` oracle pattern), so the emitted
  * sum is independent of arrival/merge order — a plain double += would make
  * multi-batch streaming results order-dependent and unverifiable. */
final case class SessionState(start: Long, lastTs: Long, nEvents: Long, totalValue: BigDecimal)
final case class Session(user_id: Long, start_ts: Long, end_ts: Long, n_events: Long,
    total_value: Double)

/** Structured Streaming operators over event/changelog streams.
  *
  * The reference delegates all stream processing to Flink SQL (SURVEY.md
  * §2.5/§2.7 W9); this is the Spark-side equivalent surface: event-time
  * watermarks + windowed aggregation, stateful sessionization
  * (flatMapGroupsWithState), and streaming dedup — each one a standard
  * building block of a streaming training-data ingest.
  *
  * Scale notes: all state is keyed (user/window/content-hash) and lives in
  * the state store, partitioned by the shuffle on the grouping key; late
  * data beyond the watermark is dropped, which bounds state size.
  */
object StreamingOps {

  /** Tumbling-window event counts with a watermark (late events beyond
    * `lateness` are dropped; state for closed windows is evicted). */
  def windowedCounts(events: DataFrame, tsCol: String, lateness: String,
      window_ : String): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      // decimal-exact sum: incremental state merges in arrival order, and
      // only an associative exact sum makes the result independent of it
      // (and oracle-checkable)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(graft.Q.DEC)).cast("double").as("total_value"))

  /** Gap-based sessionization: a session closes when no event arrives for
    * `gapMs` (event time). Emits one row per closed session. State per
    * user is O(1) — the reference pattern for clickstream/training-log
    * sessionization via flatMapGroupsWithState. */
  def sessionize(events: Dataset[Event], gapMs: Long,
      lateness: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    // mirror of the dsum oracle pattern: exact 6-dp quantization per event
    def dec(v: Double): BigDecimal = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    events.withWatermark("ts", lateness).as[Event].groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap with no new events → close
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.start, s.lastTs, s.nEvents, s.totalValue.toDouble))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var out = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + dec(e.value)))
                case Some(s) => // gap exceeded → close previous, open new
                  out ::= Session(userId, s.start, s.lastTs, s.nEvents, s.totalValue.toDouble)
                  cur = Some(SessionState(t, t, 1, dec(e.value)))
                case None =>
                  cur = Some(SessionState(t, t, 1, dec(e.value)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session when the event-time watermark passes last+gap
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            out.reverseIterator
          }
      }
  }

  /** Streaming exact dedup by content hash within the watermark horizon —
    * the ingest-time guard of the dedup pipeline (state = one hash per
    * distinct doc inside the horizon). */
  def streamingDedup(docs: DataFrame, tsCol: String, textCol: String,
      lateness: String): DataFrame =
    docs.withColumn("__h", md5(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicates("__h")
      .drop("__h")

  /** Keep the first event per key seen on the stream. The event-time
    * column is deliberately NOT in the dedup key, so state is one entry
    * per distinct key for the stream's lifetime (Spark only evicts dedup
    * state when the watermark column is part of the key) — the right
    * semantics for "first occurrence ever" with a bounded key domain.
    * For unbounded key domains use `dropDuplicatesWithinWatermark`
    * (bounded state, duplicates only suppressed inside the horizon).
    * With arrival order = event-time order, the kept row is exactly the
    * min-timestamp row per key. */
  def firstPerKey(events: DataFrame, tsCol: String, keys: Seq[String],
      lateness: String): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicates(keys)

  /** Watermarked stream-stream interval join — the Flink-SQL interval-join
    * shape the reference's users run over changelogs (SURVEY.md §2.4: the
    * reference delegates joins to Flink SQL, where `l.ts BETWEEN r.ts AND
    * r.ts + INTERVAL` is the canonical stream enrichment). Spark plans it
    * as StreamingSymmetricHashJoinExec: both sides' state is keyed by the
    * equi-join key and BOUNDED by the watermark + the time-range condition
    * — a left row is evicted once the watermark passes `lTs + windowMs`,
    * a right row once it passes `rTs` — so joining two firehoses holds
    * O(rate × horizon) state per side, not O(stream). Inner join in
    * append mode emits each qualifying pair exactly once regardless of
    * micro-batch boundaries, which is what makes the result
    * oracle-checkable against the equivalent static interval join.
    *
    * `lateness` must cover the worst arrival skew between the two sides;
    * rows later than it can be dropped before their matches arrive. */
  def intervalJoin(left: DataFrame, lTs: String, right: DataFrame, rTs: String,
      lKey: String, rKey: String, windowMs: Long, lateness: String): DataFrame =
    left.withWatermark(lTs, lateness)
      .join(right.withWatermark(rTs, lateness),
        expr(s"$lKey = $rKey AND $rTs >= $lTs AND " +
          s"$rTs <= $lTs + interval ${windowMs / 1000} seconds"))

  /** Streaming event-time temporal join — Flink SQL's
    * `FOR SYSTEM_TIME AS OF probe.ts` (the canonical CDC enrichment: join
    * each probe-side event to the version of a changelog-fed dimension
    * that was current at the event's own timestamp), re-expressed with
    * Spark's built-in stateful operators instead of custom state:
    *
    *   1. a watermarked stream-stream interval join pairs each event with
    *      every dimension version in `[eTs - horizonMs, eTs]` (the
    *      bounded-staleness window — a version older than the horizon is
    *      treated as expired, which is what bounds the state), then
    *   2. a windowed streaming aggregation picks, per event, the version
    *      with the greatest `(vTs, tieCols...)` — i.e. the version in
    *      force at eTs — via `max_by` over a struct (lexicographic, so
    *      ties at the same version timestamp resolve deterministically).
    *
    * Spark plans this as StreamingSymmetricHashJoinExec feeding a
    * stateful aggregation (multiple chained stateful operators, supported
    * in append mode since watermark propagation landed); both states are
    * watermark-bounded: join state is O(rate × horizon) per side, agg
    * state holds only events whose window the watermark hasn't passed.
    * Nothing here is O(stream) — two firehoses enrich in bounded memory.
    *
    * `joinType = "inner"` (default) drops events with no version inside
    * the horizon; `"leftOuter"` keeps them with NULL version columns —
    * Flink's temporal OUTER join. The outer null rows are emitted by the
    * join only once the dimension watermark proves no version can still
    * arrive (state eviction), and the downstream aggregation accepts them
    * because late-record filtering uses the UPSTREAM operator's watermark
    * (Spark's multi-stateful-operator watermark propagation); `max_by`
    * ignores null orderings, so a group holding only the outer null row
    * aggregates to a NULL version struct — exactly outer semantics.
    * `payload` columns are carried from the dimension side; `eCols` from
    * the event side (must include `eKey` and an event id that makes rows
    * unique — the aggregation groups on them plus the event-time window).
    * Reference: flink-connector docs' temporal join over cdc changelogs
    * (SURVEY.md §2.4 — the reference delegates this to Flink SQL).
    *
    * ==Hot-key version fan-out — READ BEFORE RUNNING AT SCALE==
    * Stage 1 materializes every (event, version-in-horizon) PAIR before
    * stage 2 discards all but one: a dimension key updated U times inside
    * the horizon emits O(U) intermediate rows PER EVENT on that key. This
    * is the exact skew CDC dimensions exhibit — one busy row updated
    * thousands of times an hour — and unlike Flink's O(1)-latest-version
    * temporal state, the blowup here is `event_rate × update_rate ×
    * horizon`, unbounded in the horizon. The contract for using THIS
    * method is therefore: `max per-key updates within horizonMs` must be
    * small (say ≤ tens). When it isn't, use [[temporalJoinCompacted]],
    * which bounds the fan-out to O(updates-per-grain + horizon/grain) per
    * event by pre-compacting older versions to one per (key, grain) — same
    * answer, proven under the same oracle gate (q89), stress-measured in
    * TemporalCompactionSpec (1000-version hot key: 1000 pairs/event raw
    * vs ~70 compacted at horizon/grain = 60). */
  def temporalJoin(events: DataFrame, eTs: String, dims: DataFrame, vTs: String,
      eKey: String, vKey: String, horizonMs: Long, lateness: String,
      eCols: Seq[String], payload: Seq[String], tieCols: Seq[String],
      joinType: String = "inner"): DataFrame = {
    val joined = events.withWatermark(eTs, lateness)
      .join(dims.withWatermark(vTs, lateness),
        expr(s"$eKey = $vKey AND $vTs <= $eTs AND " +
          s"$vTs >= $eTs - interval ${horizonMs / 1000} seconds"), joinType)
    pickLatestPerEvent(joined, eTs, vTs, eCols, payload, tieCols)
  }

  /** Stage 2 of the temporal joins: per (event-window, event) pick the
    * version with the greatest (vTs, tieCols...) — the version in force.
    * Only window(eTs) may carry the event-time tag into the aggregation
    * (Spark rejects two tagged columns); the event's own timestamp rides
    * along as plain micros and is re-materialized after the agg. */
  private def pickLatestPerEvent(joined: DataFrame, eTs: String, vTs: String,
      eCols: Seq[String], payload: Seq[String], tieCols: Seq[String]): DataFrame = {
    val ord = struct((col(vTs) +: tieCols.map(col)): _*)
    val picked = struct((col(vTs) +: (tieCols ++ payload).map(col)): _*)
    joined
      .groupBy((window(col(eTs), "1 minute") +:
        unix_micros(col(eTs)).as("__ets_us") +: eCols.map(col)): _*)
      .agg(max_by(picked, ord).as("v"))
      .select((timestamp_micros(col("__ets_us")).as(eTs) +: eCols.map(col)) ++
        (col(s"v.$vTs").as("version_ts") +: (tieCols ++ payload).map(c => col(s"v.$c"))): _*)
  }

  /** Last version per (key, calendar grain) — the pre-compaction stage of
    * [[temporalJoinCompacted]]. Streaming: `dims` must already carry a
    * watermark on `vTs`; the windowed max_by emits each (key, grain) row
    * once the watermark closes the grain (append mode), so downstream sees
    * a compacted changelog — the Kafka-compacted-topic shape, as a Spark
    * stateful operator. Output: vKey, `__grain_t` (the grain's
    * event-time-tagged window_time, i.e. grain end − 1 µs), and the picked
    * version's vTs/tieCols/payload. State: O(keys × open grains). */
  def compactVersions(dims: DataFrame, vTs: String, vKey: String, grain: String,
      payload: Seq[String], tieCols: Seq[String]): DataFrame = {
    val ord = struct((col(vTs) +: tieCols.map(col)): _*)
    val picked = struct((col(vTs) +: (tieCols ++ payload).map(col)): _*)
    dims.groupBy(window(col(vTs), grain), col(vKey))
      .agg(max_by(picked, ord).as("__v"))
      // the picked vTs must shed its event-time tag (it rides through the
      // struct with watermark metadata attached, and a stream may carry
      // only ONE tagged column — __grain_t is the one downstream state
      // reasoning needs); round-tripping through micros re-materializes it
      // as a plain value column
      .select((col(vKey) +: window_time(col("window")).as("__grain_t") +:
        timestamp_micros(unix_micros(col(s"__v.$vTs"))).as(vTs) +:
        (tieCols ++ payload).map(c => col(s"__v.$c"))): _*)
  }

  /** [[temporalJoin]] with the hot-key fan-out BOUNDED: identical answer
    * (same oracle gate — q89 runs this form), different intermediate
    * volume. Two version channels feed the same stage-2 argmax:
    *
    *   - RAW: events ⋈ versions with `vTs ∈ [eTs − grainMs, eTs]` — only
    *     the last grain's updates pair per event, O(updates-per-grain);
    *   - COMPACTED: events ⋈ [[compactVersions]] output with
    *     `__grain_t ∈ [eTs − horizonMs, eTs)` — one row per (key, closed
    *     grain), O(horizonMs / grainMs) pairs per event, then a residual
    *     exact filter `vTs ≥ eTs − horizon` trims the conservatively
    *     admitted oldest grain.
    *
    * Correctness (why the union always contains the in-force version): let
    * v = the latest version with vTs ≤ eTs. If v's calendar grain closed at
    * or before eTs, v is the LAST version in that grain — any later v' in
    * the grain would have vTs < grainEnd ≤ eTs, contradicting v's
    * maximality — so the compacted channel carries it. Otherwise v lives in
    * eTs's own (still-open) grain, so eTs − vTs < grainMs and the raw
    * channel carries it. Every candidate either channel offers satisfies
    * vTs ≤ eTs (compacted: vTs < grainEnd = __grain_t + 1µs ≤ eTs), so the
    * argmax over the union is exactly v; a version offered by both
    * channels is a bit-identical duplicate and cannot change an argmax.
    * Ties on vTs fall in one calendar grain by construction and resolve by
    * the same (vTs, tieCols) ordering in both the compaction and stage 2.
    *
    * Scale: per-event fan-out drops from O(U_horizon) to O(U_grain +
    * horizon/grain); raw-join version state drops from O(rate × horizon)
    * to O(rate × grain); the compacted join holds O(keys × horizon/grain).
    * Pick grainMs ≈ horizon / update-rate-per-grain to balance the two
    * terms. The cost is one extra micro-batch of result latency (a grain's
    * versions join only after the watermark closes the grain).
    *
    * Chained-stateful note: this plans as windowed-agg → stream-stream
    * join → union → windowed-agg — the multi-stateful-operator shapes
    * Spark supports in append mode; TemporalCompactionSpec pins the
    * operator chain and the streaming/batch equivalence. */
  def temporalJoinCompacted(events: DataFrame, eTs: String, dims: DataFrame, vTs: String,
      eKey: String, vKey: String, horizonMs: Long, grainMs: Long, lateness: String,
      eCols: Seq[String], payload: Seq[String], tieCols: Seq[String],
      joinType: String = "inner"): DataFrame = {
    require(grainMs > 0 && grainMs <= horizonMs && grainMs % 1000 == 0,
      s"grainMs must be a positive whole-second value <= horizonMs, got $grainMs " +
        "(horizon divisibility is NOT required: grains are epoch-aligned and the " +
        "residual filter trims the oldest admitted grain)")
    val e = events.withWatermark(eTs, lateness)
    val d = dims.withWatermark(vTs, lateness)
    val shape = (col(eTs) +: eCols.map(col)) ++ ((vTs +: (tieCols ++ payload)).map(col))
    val raw = e.join(d,
      expr(s"$eKey = $vKey AND $vTs <= $eTs AND " +
        s"$vTs >= $eTs - interval ${grainMs / 1000} seconds"), joinType)
      .select(shape: _*)
    val comp = compactVersions(d, vTs, vKey, s"${grainMs / 1000} seconds", payload, tieCols)
    val compJ = e.join(comp,
      expr(s"$eKey = $vKey AND __grain_t < $eTs AND " +
        s"__grain_t >= $eTs - interval ${horizonMs / 1000} seconds"), joinType)
      .select(shape: _*)
    val unioned = raw.unionByName(compJ)
      .where(expr(s"$vTs IS NULL OR $vTs >= $eTs - interval ${horizonMs / 1000} seconds"))
    pickLatestPerEvent(unioned, eTs, vTs, eCols, payload, tieCols)
  }

  /** Incremental SCD Type-2 maintenance from a changelog stream: emits a
    * history row the moment a version is SUPERSEDED (by a newer version
    * or a delete) — the streaming complement of the batch
    * [[graft.operators.ChangelogOps.scd2History]], whose
    * `valid_to IS NOT NULL` subset this reproduces exactly (q99 gates
    * that equality through the DuckDB oracle; open versions stay in
    * state and are the materialized current table, which q74/q78 already
    * cover through the upsert path).
    *
    * Scale contract — why the streaming form is the 100 TB shape: the
    * batch derivation windows over the ENTIRE accumulated history every
    * run (shuffle grows with total versions ever), while this operator's
    * state is ONE open version per live key, O(live keys), and each
    * day's increment shuffles only that day's events. Events for a key
    * must arrive in ascending `offset` order ACROSS micro-batches (the
    * cdc-log source replays the log in offset order — its contract);
    * within one batch the group's rows arrive unordered, so each
    * invocation sorts its batch slice (bounded: one batch × one key).
    * Emission is append-only — an interval row is final the instant the
    * closing event is seen, so no retraction is ever needed (the same
    * design choice as the reference's delete-as-insert op column). */
  def scd2ClosedIntervals(events: Dataset[Scd2Event]): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.k)
      .flatMapGroupsWithState[Scd2Open, Scd2Closed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k, it, state: GroupState[Scd2Open]) =>
          val evs = it.toArray.sortBy(_.offset)
          val out = Seq.newBuilder[Scd2Closed]
          var open = state.getOption
          evs.foreach { e =>
            open.foreach(o =>
              out += Scd2Closed(k, o.price, o.st, o.offset, e.offset))
            open = if (e.isDelete) None
                   else Some(Scd2Open(e.price, e.st, e.offset))
          }
          open match {
            case Some(o) => state.update(o)
            case None    => if (state.exists) state.remove()
          }
          out.result().iterator
      }
  }

  /** Streaming LSH bucket claims — the stateful heart of dedup-at-ingest:
    * the input is a stream of (doc, band, bhv) band rows (see
    * `Dedup.md5BandsPerRow`) arriving in doc order; each (band, bhv)
    * bucket is CLAIMED by the first document that presents it, and the
    * operator emits one (band, bhv, first_doc) row per bucket, exactly
    * once, in the micro-batch where the claim happens.
    *
    * Determinism the hash gate depends on: the per-batch winner is the
    * MIN doc id over the batch's group (order-free — groupByKey hands the
    * whole batch's rows for a key to one invocation), and cross-batch the
    * state blocks re-emission, so with doc-ordered arrival the winner is
    * the global min per bucket — a closed-form SQL fact, unlike
    * dropDuplicates' partition-arrival-order row pick.
    *
    * State is one boolean per distinct bucket (the claim), partitioned by
    * the shuffle on the bucket key — the same O(buckets) footprint a
    * Bloom-style ingest filter would hold, but exact. */
  def lshBucketClaims(bands: Dataset[BandRow]): Dataset[BucketClaim] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(r => (r.band, r.bhv))
      .flatMapGroupsWithState[Boolean, BucketClaim](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((band, bhv), it, state: GroupState[Boolean]) =>
          if (state.exists) { it.foreach(_ => ()); Iterator.empty } // already claimed
          else {
            state.update(true)
            Iterator(BucketClaim(band, bhv, it.map(_.doc_id).min))
          }
      }
  }
}

final case class BandRow(doc_id: Long, band: Int, bhv: Long)
final case class BucketClaim(band: Int, bhv: Long, first_doc: Long)

/** One state-bearing changelog event for [[StreamingOps.scd2ClosedIntervals]]
  * (`isDelete` events close the open version without opening one). */
final case class Scd2Event(k: Long, price: Double, st: String,
    offset: Long, isDelete: Boolean)
/** Per-key state: the currently-open version. */
final case class Scd2Open(price: Double, st: String, offset: Long)
/** A closed SCD2 interval — append-only, final on emission. */
final case class Scd2Closed(k: Long, price: Double, st: String,
    valid_from: Long, valid_to: Long)
