package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The COMPOSED TAKEDOWN under fire — the purge legs are gated one family
  * at a time (q134 value-keyed, q137/q140 doc-attributed, q138 additive),
  * but a real takedown runs them as ONE job over one tombstone set, and
  * the composition is where crashes land between legs (the
  * DailyJobFailoverSpec argument applied to deletes). Four legs over one
  * doc set:
  *
  *   1. assignment purge        — compactManifest deleteSet on doc_id
  *   2. shingle-index purge     — compactManifest deleteSet on doc_id
  *   3. kept-hash purge         — compactManifest deleteSet on the
  *                                set-difference hashes (value-keyed)
  *   4. df subtraction          — negative-count idempotentAppend, then
  *                                net-out compaction
  *
  * Each leg is independently replay-idempotent under its jobId, so the
  * composed job's crash recovery is simply RE-RUN FROM THE TOP: committed
  * legs no-op on their markers, the interrupted leg resumes its phase,
  * later legs run fresh. Pinned: a kill after EVERY leg (and inside leg
  * 1's phase B) replays to the uninterrupted run's exact state — and
  * mid-crash, the interrupted table refuses reads through the orphan
  * guard rather than serving a torn root. */
class TakedownFailoverSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon common tail words here"),
    (2L, "alpha beta gamma delta zeta common tail words here"),
    (10L, "one two three four five six seven eight nine"),
    (20L, "lonely unique text nothing shared with anyone at all"),
    (21L, "alpha beta gamma delta epsilon common tail words here")) // exact dup of doc 1
    .toDF("doc_id", "text")
  // tombstone docs 10 (singleton) and 20 (singleton); doc 1 stays, so its
  // hash — shared with nobody deleted — must survive untouched
  private val tombIds = Seq(10L, 20L)

  private def freshState(tag: String): (String, String, String, String) = {
    val nonce = System.nanoTime()
    val atbl = BucketedOps.ensureBucketed(
      ConnectedComponents.components(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.3),
        "id_a", "id_b")
        .select(col("node").as("doc_id"), col("component").as("cluster_id"))
        .unionByName(Seq((10L, 10L), (20L, 20L)).toDF("doc_id", "cluster_id")),
      s"tdf_a_$tag|$nonce", "doc_id", buckets = 4)
    val itbl = BucketedOps.ensureBucketed(
      Dedup.shingleIndex(docs, "doc_id", "text", n = 3),
      s"tdf_i_$tag|$nonce", "h", buckets = 4)
    val htbl = BucketedOps.ensureBucketed(
      docs.select(md5(col("text")).as("h")).distinct(),
      s"tdf_h_$tag|$nonce", "h", buckets = 4)
    val dtbl = BucketedOps.ensureBucketed(
      TfIdf.dfManifest(docs, "doc_id", "text"),
      s"tdf_d_$tag|$nonce", "term", buckets = 4)
    (atbl, itbl, htbl, dtbl)
  }

  /** The composed takedown; `hook` fires after each completed leg. */
  private def takedown(atbl: String, itbl: String, htbl: String, dtbl: String,
      hook: String => Unit = _ => (),
      onPhaseB: String => Unit = _ => ()): Unit = {
    val tomb = docs.filter(col("doc_id").isin(tombIds: _*))
    val live = docs.filter(!col("doc_id").isin(tombIds: _*))
    BucketedOps.compactManifest(spark, atbl, "doc_id", buckets = 4,
      jobId = "td1",
      resolve = _.groupBy("doc_id").agg(min("cluster_id").as("cluster_id")),
      deleteSet = Some(tomb.select("doc_id")), onStep = onPhaseB)
    hook("assign-purged")
    BucketedOps.compactManifest(spark, itbl, "h", buckets = 4,
      jobId = "td1", resolve = _.distinct(),
      deleteSet = Some(tomb.select("doc_id")))
    hook("index-purged")
    val delH = tomb.select(md5(col("text")).as("h"))
      .join(live.select(md5(col("text")).as("h")), Seq("h"), "left_anti")
    BucketedOps.compactManifest(spark, htbl, "h", buckets = 4,
      jobId = "td1", resolve = _.distinct(), deleteSet = Some(delH))
    hook("hashes-purged")
    BucketedOps.idempotentAppend(
      TfIdf.dfManifest(tomb, "doc_id", "text")
        .select(col("term"), (-col("df")).as("df")).repartition(1),
      dtbl, "term", buckets = 4, jobId = "td1")
    BucketedOps.compactManifest(spark, dtbl, "term", buckets = 4,
      jobId = "td1.net",
      resolve = _.groupBy("term").agg(sum("df").as("df")).filter(col("df") =!= 0L))
    hook("df-subtracted")
  }

  /** The state every run must converge to. */
  private def assertConverged(atbl: String, itbl: String, htbl: String,
      dtbl: String, cell: String): Unit = {
    val live = docs.filter(!col("doc_id").isin(tombIds: _*))
    assert(spark.table(atbl).filter(col("doc_id").isin(tombIds: _*)).count() == 0,
      s"[$cell] tombstoned assignments survive")
    assert(spark.table(itbl).filter(col("doc_id").isin(tombIds: _*)).count() == 0,
      s"[$cell] tombstoned shingle rows survive")
    val liveHashes = live.select(md5(col("text")).as("h")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(spark.table(htbl).collect().map(_.getString(0)).sorted.toSeq == liveHashes,
      s"[$cell] hash purge diverged from the live set (shared values must survive)")
    val expectedDf = TfIdf.dfManifest(live, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotDf = BucketedOps.readMaintained(spark, dtbl)
      .groupBy("term").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotDf == expectedDf, s"[$cell] df after subtraction != live-corpus df")
  }

  test("uninterrupted composed takedown: all four families purged, shared values survive") {
    val (a, i, h, d) = freshState("ctl")
    takedown(a, i, h, d)
    assertConverged(a, i, h, d, "ctl")
    // the whole composition replays as a no-op chain
    val files = spark.table(d).inputFiles.sorted.toSeq
    takedown(a, i, h, d)
    assertConverged(a, i, h, d, "ctl-replay")
    assert(spark.table(d).inputFiles.sorted.toSeq == files,
      "a replayed completed takedown changed the df table")
  }

  test("kill after every leg: re-running from the top converges each time") {
    Seq("assign-purged", "index-purged", "hashes-purged").foreach { at =>
      val (a, i, h, d) = freshState(at.replace("-", ""))
      intercept[RuntimeException] {
        takedown(a, i, h, d, hook = s =>
          if (s == at) throw new RuntimeException(s"injected kill at $at"))
      }
      takedown(a, i, h, d) // replay from the top
      assertConverged(a, i, h, d, s"kill@$at")
    }
  }

  test("kill inside leg 1's phase B: the table refuses reads until the replayed job cures it") {
    val (a, i, h, d) = freshState("phaseB")
    intercept[RuntimeException] {
      takedown(a, i, h, d, onPhaseB = s =>
        if (s == "retired") throw new RuntimeException("injected kill"))
    }
    // mid-crash: the interrupted table is guarded, the untouched legs read
    intercept[IllegalStateException] { BucketedOps.readMaintained(spark, a) }
    assert(BucketedOps.readMaintained(spark, i).count() > 0)
    takedown(a, i, h, d) // replay resumes leg 1's swap, runs legs 2-4
    assertConverged(a, i, h, d, "phaseB")
  }
}
