package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GENERATION COMPACTION under fire (round-13 verdict, next-round ask #2):
  * [[BucketedOps.compactManifest]] rewrites an append-maintained manifest
  * as ONE resolved generation and swaps it in under the writer lease. The
  * operator's contract has three legs, each pinned here:
  *
  *   1. READER EQUALITY — resolution (sum per key / min per doc / distinct
  *      set rows) is identical before and after the swap; only file count
  *      and per-key row count change.
  *   2. CRASH CONVERGENCE — a kill in ANY window (after staging, after the
  *      promote marker, mid-rename, after renames, mid-retire, after
  *      retires) replays with the same jobId to exactly the compacted
  *      state; a kill BEFORE the promote marker leaves the live generation
  *      untouched.
  *   3. TOMBSTONE PURGE — `deleteSet` rows vanish; rows NOT matching it are
  *      bit-equal; for value-keyed manifests a value shared with a live doc
  *      survives when the caller passes the documented set difference.
  *
  * Plus the lifecycle hazard the scaladoc documents: compaction renames
  * every prior generation away, so it is a REPLAY BARRIER for append
  * jobIds — a marker-present replay stays a no-op, but a replay whose
  * marker was vacuumed re-lands (why vacuumAppendMarkers' horizon must
  * cover the time since the last compaction). */
class CompactManifestSpec extends SparkSpec {
  import spark.implicits._

  /** An additive (term, df) manifest with THREE landed generations: the
    * base ingest plus two daily idempotentAppends. */
  private def freshAdditive(tag: String): String = {
    val tbl = BucketedOps.ensureBucketed(
      Seq(("a", 10L), ("b", 20L), ("c", 30L), ("d", 40L)).toDF("term", "df"),
      s"cmp_add_$tag|${System.nanoTime()}", "term", buckets = 4)
    BucketedOps.idempotentAppend(
      Seq(("a", 1L), ("b", 2L), ("e", 5L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "day2")
    BucketedOps.idempotentAppend(
      Seq(("a", 7L), ("e", 1L), ("f", 9L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "day3")
    tbl
  }

  private val additiveExpected = Map("a" -> 18L, "b" -> 22L, "c" -> 30L,
    "d" -> 40L, "e" -> 6L, "f" -> 9L)

  private def sums(tbl: String): Map[String, Long] =
    spark.table(tbl).groupBy("term").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private val sumResolve: DataFrame => DataFrame =
    _.groupBy("term").agg(sum("df").as("df"))

  private def compactAdd(tbl: String, jobId: String = "gen1",
      deleteSet: Option[DataFrame] = None,
      onStep: String => Unit = _ => (),
      onFilePromoted: Int => Unit = _ => (),
      onFileRetired: Int => Unit = _ => ()): Unit =
    BucketedOps.compactManifest(spark, tbl, "term", buckets = 4,
      jobId = jobId, resolve = sumResolve, deleteSet = deleteSet,
      onStep = onStep, onFilePromoted = onFilePromoted,
      onFileRetired = onFileRetired)

  test("three generations collapse to one: reader sums unchanged, one row per key, appends keep landing") {
    val tbl = freshAdditive("happy")
    val preFiles = spark.table(tbl).inputFiles.length
    assert(sums(tbl) == additiveExpected)
    compactAdd(tbl)
    assert(sums(tbl) == additiveExpected,
      "compaction changed what readers resolve — it may only change where rows live")
    assert(spark.table(tbl).count() == additiveExpected.size.toLong,
      "the compacted generation must hold exactly one resolved row per key")
    assert(spark.table(tbl).inputFiles.length < preFiles,
      "compaction must shrink the file count (that is its point)")
    assert(spark.table(tbl).inputFiles.forall(_.contains("graft-compact_gen1_")),
      "every surviving data file must belong to the compacting jobId's generation")
    // day N+1's append lands ON the compacted table...
    BucketedOps.idempotentAppend(
      Seq(("a", 2L), ("g", 3L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "day4")
    val afterDay4 = additiveExpected ++ Map("a" -> 20L, "g" -> 3L)
    assert(sums(tbl) == afterDay4, "the post-compaction append must accumulate")
    // ...and a SECOND compaction collapses compacted + appended generations
    compactAdd(tbl, jobId = "gen2")
    assert(sums(tbl) == afterDay4)
    assert(spark.table(tbl).count() == afterDay4.size.toLong)
  }

  test("replaying a committed compaction is a no-op") {
    val tbl = freshAdditive("replay")
    compactAdd(tbl)
    val files = spark.table(tbl).inputFiles.sorted.toSeq
    compactAdd(tbl) // same jobId, commit marker present
    assert(spark.table(tbl).inputFiles.sorted.toSeq == files,
      "a committed compaction's replay changed the table")
    assert(sums(tbl) == additiveExpected)
  }

  test("kill swept across every compaction window: replay converges to the compacted state") {
    // phase-A kill: the live generation must be untouched (staging is
    // invisible — the stage dir is underscore-prefixed inside the root)
    val tblA = freshAdditive("killA")
    val preFiles = spark.table(tblA).inputFiles.sorted.toSeq
    val killedA = intercept[RuntimeException] {
      compactAdd(tblA, onStep = s =>
        if (s == "staged") throw new RuntimeException("injected kill at staged"))
    }
    assert(killedA.getMessage.contains("injected kill"))
    assert(spark.table(tblA).inputFiles.sorted.toSeq == preFiles,
      "a pre-promote kill must leave the live generation untouched")
    assert(sums(tblA) == additiveExpected)
    compactAdd(tblA) // replay restages from scratch
    assert(sums(tblA) == additiveExpected, "replay after staged-kill diverged")
    assert(spark.table(tblA).count() == additiveExpected.size.toLong)

    // phase-B kills: promote marker exists, replay resumes the swap
    Seq("promoted", "renamed", "retired").foreach { at =>
      val tbl = freshAdditive(s"kill_$at")
      val killed = intercept[RuntimeException] {
        compactAdd(tbl, onStep = s =>
          if (s == at) throw new RuntimeException(s"injected kill at $at"))
      }
      assert(killed.getMessage.contains("injected kill"))
      compactAdd(tbl) // the replay
      assert(sums(tbl) == additiveExpected, s"replay after kill@$at diverged")
      assert(spark.table(tbl).count() == additiveExpected.size.toLong,
        s"replay after kill@$at did not end single-generation")
      assert(spark.table(tbl).inputFiles.forall(_.contains("graft-compact_gen1_")),
        s"replay after kill@$at left old-generation files in the root")
    }

    // mid-rename and mid-retire kills (the per-file windows)
    val tblR = freshAdditive("killRename")
    intercept[RuntimeException] {
      compactAdd(tblR, onFilePromoted = n =>
        if (n == 1) throw new RuntimeException("injected kill mid-rename"))
    }
    compactAdd(tblR)
    assert(sums(tblR) == additiveExpected, "replay after mid-rename kill diverged")
    assert(spark.table(tblR).count() == additiveExpected.size.toLong)

    val tblD = freshAdditive("killRetire")
    intercept[RuntimeException] {
      compactAdd(tblD, onFileRetired = n =>
        if (n == 1) throw new RuntimeException("injected kill mid-retire"))
    }
    compactAdd(tblD)
    assert(sums(tblD) == additiveExpected, "replay after mid-retire kill diverged")
    assert(spark.table(tblD).inputFiles.forall(_.contains("graft-compact_gen1_")))
  }

  test("min-resolve family: label manifest compacts to one min row per doc") {
    val tbl = BucketedOps.ensureBucketed(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "cluster_id"),
      s"cmp_min|${System.nanoTime()}", "doc_id", buckets = 4)
    BucketedOps.idempotentAppend(
      Seq((1L, 5L), (3L, 30L), (4L, 4L)).toDF("doc_id", "cluster_id").repartition(1),
      tbl, "doc_id", buckets = 4, jobId = "day2")
    val expected = Map(1L -> 5L, 2L -> 20L, 3L -> 30L, 4L -> 4L)
    BucketedOps.compactManifest(spark, tbl, "doc_id", buckets = 4,
      jobId = "gen1",
      resolve = _.groupBy("doc_id").agg(min("cluster_id").as("cluster_id")))
    assert(spark.table(tbl).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == expected,
      "min-family compaction must store exactly the resolved labels")
    assert(spark.table(tbl).count() == expected.size.toLong)
  }

  test("tombstone purge, doc-attributed rows: deleted docs vanish, survivors bit-equal") {
    val tbl = BucketedOps.ensureBucketed(
      Seq((100L, 1L, 3L), (200L, 1L, 3L), (300L, 2L, 4L), (400L, 3L, 2L))
        .toDF("h", "doc_id", "n_sh"),
      s"cmp_tomb|${System.nanoTime()}", "h", buckets = 4)
    BucketedOps.idempotentAppend(
      Seq((500L, 4L, 1L), (100L, 4L, 1L)).toDF("h", "doc_id", "n_sh").repartition(1),
      tbl, "h", buckets = 4, jobId = "day2")
    val survivors = spark.table(tbl).filter(col("doc_id") =!= 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq
    BucketedOps.compactManifest(spark, tbl, "h", buckets = 4, jobId = "gen1",
      resolve = _.distinct(),
      deleteSet = Some(Seq(1L).toDF("doc_id")))
    val after = spark.table(tbl).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity).toSeq
    assert(after == survivors,
      "purge must remove exactly the tombstoned doc's rows and keep the rest bit-equal")
    assert(!after.exists(_._2 == 1L))
    // h=100 survives through docs 2..4? no — h=100 rows belonged to docs 1
    // and 4; doc 4's row must remain (the value is shared with a live doc)
    assert(after.contains((100L, 4L, 1L)),
      "a value shared with a live doc must survive the purge")
  }

  test("tombstone purge, value-keyed rows: the set-difference contract keeps shared values alive") {
    // the manifest carries VALUES only (content hashes) — no doc
    // attribution. Docs: d1 (deleted) held hashes {10, 30}; d2 (live)
    // holds {20, 30}. The caller must pass deleted MINUS surviving = {10};
    // passing d1's raw hashes would over-purge the shared 30.
    val tbl = BucketedOps.ensureBucketed(
      Seq(10L, 20L, 30L).toDF("h"),
      s"cmp_vk|${System.nanoTime()}", "h", buckets = 4)
    val deletedDocHashes = Seq(10L, 30L).toDF("h")
    val survivingDocHashes = Seq(20L, 30L).toDF("h")
    val deleteSet = deletedDocHashes.join(survivingDocHashes, Seq("h"), "left_anti")
    BucketedOps.compactManifest(spark, tbl, "h", buckets = 4, jobId = "gen1",
      resolve = _.distinct(), deleteSet = Some(deleteSet))
    assert(spark.table(tbl).collect().map(_.getLong(0)).sorted.toSeq == Seq(20L, 30L),
      "the purge must drop only values belonging exclusively to deleted docs")
  }

  test("additive-family delete: negative-count append nets out, compaction drops zeroed keys") {
    // the doc-attributed purge is a row anti-join; the ADDITIVE families
    // (df/bigram/span counts) have no doc attribution, so their delete is
    // a different algebra: append the doc's contributions NEGATED —
    // readers' sum-resolve is correct from that moment, before any
    // compaction — then compact with a net-out resolve that drops keys
    // whose count reached zero (absent row ≡ sum 0 for every reader).
    val tbl = freshAdditive("negdel")
    // takedown: a doc that contributed (a,1) in day2 and all of f's 9
    BucketedOps.idempotentAppend(
      Seq(("a", -1L), ("f", -9L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "takedown1")
    val purged = Map("a" -> 17L, "b" -> 22L, "c" -> 30L, "d" -> 40L, "e" -> 6L)
    assert(sums(tbl) == purged + ("f" -> 0L),
      "sum-resolve must already net the negatives before any compaction")
    // the takedown append replays idempotently like any other generation
    BucketedOps.idempotentAppend(
      Seq(("a", -1L), ("f", -9L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "takedown1")
    assert(sums(tbl) == purged + ("f" -> 0L))
    // compaction nets out and DROPS the zeroed key
    BucketedOps.compactManifest(spark, tbl, "term", buckets = 4,
      jobId = "tk", resolve = d => sumResolve(d).filter(col("df") =!= 0L))
    assert(sums(tbl) == purged,
      "net-out compaction changed surviving keys")
    assert(spark.table(tbl).filter(col("term") === "f").count() == 0,
      "a key whose count reached zero must leave the manifest")
    assert(spark.table(tbl).count() == purged.size.toLong)
  }

  test("compaction is a replay barrier: marker-present append replays no-op; a vacuumed marker re-lands") {
    val tbl = freshAdditive("barrier")
    compactAdd(tbl)
    // the committed day-2 append replays as a no-op — its marker survived
    BucketedOps.idempotentAppend(
      Seq(("a", 1L), ("b", 2L), ("e", 5L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "day2")
    assert(sums(tbl) == additiveExpected,
      "a marker-present append replay after compaction must be a no-op")
    // the documented hazard: vacuum day-2's marker, then replay — the undo
    // glob finds nothing (compaction renamed the generation away) and the
    // day RE-LANDS. This is WHY vacuumAppendMarkers' horizon must cover
    // the time since the last compaction.
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(loc, "_graft_append_day2.commit"), false)
    BucketedOps.idempotentAppend(
      Seq(("a", 1L), ("b", 2L), ("e", 5L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "day2")
    assert(sums(tbl) == Map("a" -> 19L, "b" -> 24L, "c" -> 30L,
      "d" -> 40L, "e" -> 11L, "f" -> 9L),
      "a vacuumed-marker replay across a compaction re-lands the day — " +
        "the hazard the horizon rule exists for (if this stops re-landing, " +
        "the barrier documentation is stale)")
  }

  test("a compaction racing a same-table append: the lease serializes, both land, resolution converges") {
    // the production hazard the writer lease exists for, at the NEW
    // operator: a retention job compacting while the daily append
    // arrives. The lease admits one at a time; the loser fails fast with
    // ConcurrentModificationException and retries (the IdempotentAppendSpec
    // racing pattern). Whichever order wins, the final resolution must be
    // base ∪ day2 ∪ day3 ∪ day4 — compaction only moves rows.
    val tbl = freshAdditive("racecmp")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      def retrying(op: () => Unit): java.util.concurrent.Future[_] =
        pool.submit({ () =>
          gate.await()
          var done = false
          while (!done) {
            try { op(); done = true }
            catch {
              case _: java.util.ConcurrentModificationException => Thread.sleep(50)
            }
          }
        }: Runnable)
      val fc = retrying(() => compactAdd(tbl, jobId = "gen1"))
      val fa = retrying(() => BucketedOps.idempotentAppend(
        Seq(("a", 2L), ("g", 3L)).toDF("term", "df").repartition(1),
        tbl, "term", buckets = 4, jobId = "day4"))
      gate.countDown()
      fc.get(180, java.util.concurrent.TimeUnit.SECONDS)
      fa.get(180, java.util.concurrent.TimeUnit.SECONDS)
    } finally pool.shutdownNow()
    assert(sums(tbl) == (additiveExpected ++ Map("a" -> 20L, "g" -> 3L)),
      "racing compaction and append must both land exactly once")
    // replays of both stay no-ops (their markers survived the race)
    compactAdd(tbl, jobId = "gen1")
    BucketedOps.idempotentAppend(
      Seq(("a", 2L), ("g", 3L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "day4")
    assert(sums(tbl) == (additiveExpected ++ Map("a" -> 20L, "g" -> 3L)))
  }

  test("the compacted generation keeps the bucketed layout: key aggregate stays exchange-free") {
    val tbl = freshAdditive("plan")
    compactAdd(tbl)
    val plan = spark.table(tbl).groupBy("term").agg(sum("df"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket placement lost across the compaction swap — aggregate shuffled:\n$plan")
  }

  test("a mismatched (key, buckets) declaration or schema-changing resolve is rejected before any file moves") {
    val tbl = freshAdditive("guard")
    val before = spark.table(tbl).inputFiles.sorted.toSeq
    intercept[IllegalArgumentException] {
      BucketedOps.compactManifest(spark, tbl, "term", buckets = 8,
        jobId = "gen1", resolve = sumResolve)
    }
    intercept[IllegalArgumentException] {
      BucketedOps.compactManifest(spark, tbl, "df", buckets = 4,
        jobId = "gen1", resolve = sumResolve)
    }
    intercept[IllegalArgumentException] {
      BucketedOps.compactManifest(spark, tbl, "term", buckets = 4,
        jobId = "gen1", resolve = _.groupBy("term").agg(sum("df").as("total")))
    }
    assert(spark.table(tbl).inputFiles.sorted.toSeq == before,
      "a rejected compaction must leave the table untouched")
    assert(sums(tbl) == additiveExpected)
  }
}
