package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MANIFEST SCHEMA MIGRATION under fire (round-14 verdict, what's-missing
  * #4 / round-15 ask #6): [[BucketedOps.migrateManifest]] is the two-phase
  * swap with an ADD-COLUMN resolve and an idempotent catalog ALTER inside
  * the swap. Pins:
  *
  *   1. EVOLUTION — the migrated table reads TYPED with the new column,
  *      the next day's append carries it, readers resolve across the
  *      migrated + appended generations, and the bucketed layout survives
  *      (key aggregate stays exchange-free).
  *   2. CRASH CONVERGENCE — a kill in any window (staged, promoted,
  *      renamed, retired, reregistered) replays with the same jobId to the
  *      migrated state; a pre-promote kill leaves the live generation and
  *      old schema untouched.
  *   3. GUARD INTEGRATION — between promote and commit the orphan guard
  *      refuses reads and foreign writers exactly as for an unfinished
  *      compaction; the jobId's own replay is exempt.
  *   4. REJECTIONS — non-additive resolves (dropped/reordered columns, no
  *      new column) are rejected before any file moves.
  */
class MigrateManifestSpec extends SparkSpec {
  import spark.implicits._

  /** (term, df) manifest with a base generation + one append. */
  private def fresh(tag: String): String = {
    val tbl = BucketedOps.ensureBucketed(
      Seq(("a", 10L), ("b", 20L)).toDF("term", "df"),
      s"mig_$tag|${System.nanoTime()}", "term", buckets = 4)
    BucketedOps.idempotentAppend(
      Seq(("a", 1L), ("c", 3L)).toDF("term", "df").repartition(1),
      tbl, "term", buckets = 4, jobId = "day2")
    tbl
  }

  private val addFirstSeen: DataFrame => DataFrame =
    _.groupBy("term").agg(sum("df").as("df"))
      .withColumn("first_seen_day", lit(1L))

  private def migrate(tbl: String, onStep: String => Unit = _ => ()): Unit =
    BucketedOps.migrateManifest(spark, tbl, "term", buckets = 4,
      jobId = "mig1", resolve = addFirstSeen, onStep = onStep)

  /** Readers' contract on the evolved table: sum(df), min(first_seen_day). */
  private def resolved(tbl: String): Map[String, (Long, Long)] =
    spark.table(tbl).groupBy("term")
      .agg(sum("df").as("df"), min("first_seen_day").as("fs"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private val migrated = Map("a" -> ((11L, 1L)), "b" -> ((20L, 1L)), "c" -> ((3L, 1L)))

  test("add-column migration: typed reads, next-day append carries the column, layout survives") {
    val tbl = fresh("happy")
    migrate(tbl)
    assert(spark.table(tbl).schema.fieldNames.toSeq == Seq("term", "df", "first_seen_day"),
      "the catalog entry must carry the evolved schema, typed")
    assert(resolved(tbl) == migrated)
    assert(spark.table(tbl).inputFiles.forall(_.contains("graft-migrate_mig1_")),
      "only the migrated generation may remain")
    // the NEXT day's append works typed against the evolved shape...
    BucketedOps.idempotentAppend(
      Seq(("a", 2L, 3L), ("e", 5L, 3L)).toDF("term", "df", "first_seen_day")
        .repartition(1),
      tbl, "term", buckets = 4, jobId = "day3")
    assert(resolved(tbl) ==
      (migrated ++ Map("a" -> ((13L, 1L)), "e" -> ((5L, 3L)))),
      "readers must resolve across migrated + appended generations")
    // ...a replayed migration is a marker no-op...
    val files = spark.table(tbl).inputFiles.sorted.toSeq
    migrate(tbl)
    assert(spark.table(tbl).inputFiles.sorted.toSeq == files)
    // ...and the bucketed layout survived the swap (zero-exchange agg)
    val plan = spark.table(tbl).groupBy("term").agg(sum("df"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket placement lost across the migration swap:\n$plan")
    // a LATER compaction folds the evolved generations to one row per key
    BucketedOps.compactManifest(spark, tbl, "term", buckets = 4, jobId = "gen2",
      resolve = _.groupBy("term").agg(sum("df").as("df"),
        min("first_seen_day").as("first_seen_day")))
    assert(resolved(tbl) == (migrated ++ Map("a" -> ((13L, 1L)), "e" -> ((5L, 3L)))))
    assert(spark.table(tbl).count() == 4)
  }

  test("kill swept across every migration window: replay converges; pre-promote kill leaves old schema") {
    // phase-A kill: live generation and OLD schema untouched
    val tblA = fresh("killA")
    intercept[RuntimeException] {
      migrate(tblA, onStep = s =>
        if (s == "staged") throw new RuntimeException("injected kill"))
    }
    assert(spark.table(tblA).schema.fieldNames.toSeq == Seq("term", "df"),
      "a pre-promote kill must leave the catalog schema unchanged")
    assert(spark.table(tblA).groupBy("term").agg(sum("df")).count() == 3)
    migrate(tblA)
    assert(resolved(tblA) == migrated, "replay after staged-kill diverged")

    // phase-B kills: promote marker exists, replay resumes and ALTERs
    Seq("promoted", "renamed", "retired", "reregistered").foreach { at =>
      val tbl = fresh(s"kill_$at")
      intercept[RuntimeException] {
        migrate(tbl, onStep = s =>
          if (s == at) throw new RuntimeException(s"injected kill at $at"))
      }
      migrate(tbl) // the replay
      assert(spark.table(tbl).schema.fieldNames.toSeq ==
        Seq("term", "df", "first_seen_day"), s"replay after kill@$at lost the ALTER")
      assert(resolved(tbl) == migrated, s"replay after kill@$at diverged")
      assert(spark.table(tbl).inputFiles.forall(_.contains("graft-migrate_mig1_")),
        s"replay after kill@$at left old generations")
    }
  }

  test("mid-phase-B the orphan guard refuses reads and foreign writers; the replay lifts it") {
    val tbl = fresh("guard")
    intercept[RuntimeException] {
      migrate(tbl, onStep = s =>
        if (s == "renamed") throw new RuntimeException("killed"))
    }
    val exR = intercept[IllegalStateException] {
      BucketedOps.readMaintained(spark, tbl)
    }
    assert(exR.getMessage.contains("mig1"))
    intercept[IllegalStateException] {
      BucketedOps.idempotentAppend(
        Seq(("z", 1L)).toDF("term", "df").repartition(1),
        tbl, "term", buckets = 4, jobId = "day9")
    }
    intercept[IllegalStateException] {
      BucketedOps.compactManifest(spark, tbl, "term", buckets = 4,
        jobId = "other", resolve = identity)
    }
    migrate(tbl) // own-jobId replay is exempt and cures
    assert(BucketedOps.readMaintained(spark, tbl)
      .schema.fieldNames.toSeq == Seq("term", "df", "first_seen_day"))
    assert(resolved(tbl) == migrated)
  }

  test("the orphan exemption is family-qualified: a migrate orphan cannot be 'replayed' by compactManifest") {
    // a compact commit under the SAME bare jobId must not mask a migrate
    // orphan, and compactManifest's own-jobId exemption must not admit it:
    // a compaction replaying over a torn migrate root would resolve the
    // mixed generations into a committed generation and LAUNDER the
    // double-count past every future guard check
    val tbl = fresh("family")
    intercept[RuntimeException] {
      migrate(tbl, onStep = s =>
        if (s == "renamed") throw new RuntimeException("killed"))
    }
    val exC = intercept[IllegalStateException] {
      BucketedOps.compactManifest(spark, tbl, "term", buckets = 4,
        jobId = "mig1", // the orphan's bare jobId — must NOT be exempt here
        resolve = _.groupBy("term").agg(sum("df").as("df")))
    }
    assert(exC.getMessage.contains("migrate:mig1"),
      s"the refusal must name the family-qualified orphan: ${exC.getMessage}")
    // compactIfDue's unfinished-swap check is compact-family only: it must
    // not claim the migrate orphan (its cure is compactManifest)
    assert(!BucketedOps.hasUnfinishedCompaction(spark, tbl, "mig1"))
    migrate(tbl) // only the right operator cures it
    assert(resolved(tbl) == migrated)
  }

  test("a torn promote payload (crash during the marker write) restages phase A instead of being trusted") {
    val tbl = fresh("tornmarker")
    intercept[RuntimeException] {
      migrate(tbl, onStep = s =>
        if (s == "promoted") throw new RuntimeException("killed"))
    }
    // simulate the marker write itself tearing: truncate the payload so
    // the end sentinel is gone (a mid-write crash or a torn copy+delete)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val promote = new org.apache.hadoop.fs.Path(loc, "_graft_migrate_mig1.promote")
    val o = fs.create(promote, true)
    try o.write("term STRING,df BIGINT".getBytes("UTF-8")) finally o.close()
    // replay: must NOT trust the torn DDL (a parsable truncation would
    // silently skip the ALTER after retiring the old generation) — the
    // sentinel check drops the marker and phase A restages from scratch
    migrate(tbl)
    assert(spark.table(tbl).schema.fieldNames.toSeq ==
      Seq("term", "df", "first_seen_day"),
      "replay over a torn promote payload lost the schema evolution")
    assert(resolved(tbl) == migrated)
  }

  test("non-additive resolves are rejected before any file moves") {
    val tbl = fresh("reject")
    val before = spark.table(tbl).inputFiles.sorted.toSeq
    // no new column (that is compactManifest's job)
    intercept[IllegalArgumentException] {
      BucketedOps.migrateManifest(spark, tbl, "term", buckets = 4,
        jobId = "m", resolve = _.groupBy("term").agg(sum("df").as("df")))
    }
    // dropped column
    intercept[IllegalArgumentException] {
      BucketedOps.migrateManifest(spark, tbl, "term", buckets = 4,
        jobId = "m", resolve = _.select(col("term"), lit(1L).as("x")))
    }
    // reordered columns
    intercept[IllegalArgumentException] {
      BucketedOps.migrateManifest(spark, tbl, "term", buckets = 4,
        jobId = "m", resolve = d => d.select(col("df"), col("term"), lit(1L).as("x")))
    }
    assert(spark.table(tbl).inputFiles.sorted.toSeq == before,
      "a rejected migration must leave the table untouched")
    assert(spark.table(tbl).schema.fieldNames.toSeq == Seq("term", "df"))
  }

  test("a vacuum crash mid-removal never manufactures an orphan: promotes delete before commits") {
    // the differential: deleting a swap's COMMIT first would leave
    // promote-without-commit — the guard would refuse the healthy table
    // and prescribe a "replay" whose phase B (no stage dir) retires every
    // later generation. The vacuum deletes commits LAST, so a kill after
    // ANY single removal leaves either both markers or only the commit.
    val tbl = fresh("vacorder")
    migrate(tbl)
    intercept[RuntimeException] {
      BucketedOps.vacuumAppendMarkers(spark, tbl, horizonMs = 0L,
        onEntryRemoved = n =>
          if (n == 1) throw new RuntimeException("killed mid-vacuum"))
    }
    // whatever was removed first, the table must still read through the
    // guard (no orphan manufactured)…
    assert(BucketedOps.readMaintained(spark, tbl).count() > 0)
    // …and the replayed vacuum finishes the job
    BucketedOps.vacuumAppendMarkers(spark, tbl, horizonMs = 0L)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(loc,
      "_graft_migrate_*")).isEmpty)
    assert(resolved(tbl) == migrated)
  }

  test("migrate markers vacuum like compact markers: commits age out, an orphan promote is pinned") {
    val tbl = fresh("vac")
    migrate(tbl)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(n: String) = fs.exists(new org.apache.hadoop.fs.Path(loc, n))
    assert(exists("_graft_migrate_mig1.commit"))
    BucketedOps.vacuumAppendMarkers(spark, tbl, horizonMs = 0L)
    assert(!exists("_graft_migrate_mig1.commit"),
      "an aged migrate commit (and its promote) must vacuum")
    assert(!exists("_graft_migrate_mig1.promote"))
    // an ORPHAN promote is never vacuumed — it pins the unfinished swap
    val tbl2 = fresh("vac2")
    intercept[RuntimeException] {
      migrate(tbl2, onStep = s =>
        if (s == "renamed") throw new RuntimeException("killed"))
    }
    val loc2 = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl2)).location)
    val fs2 = loc2.getFileSystem(spark.sparkContext.hadoopConfiguration)
    BucketedOps.vacuumAppendMarkers(spark, tbl2, horizonMs = 0L)
    assert(fs2.exists(new org.apache.hadoop.fs.Path(loc2, "_graft_migrate_mig1.promote")),
      "a promote without its commit pins an unfinished swap — never vacuumed")
    migrate(tbl2)
    assert(resolved(tbl2) == migrated)
  }
}
