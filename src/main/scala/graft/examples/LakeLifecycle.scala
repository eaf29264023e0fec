package graft.examples

import graft.operators.{BucketedOps, Dedup, TfIdf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The maintained-lake LIFECYCLE end-to-end, at demo scale — every write
  * path a long-running corpus needs, composed in the order a production
  * deployment runs them:
  *
  *   day 0   ingest → bucketed manifest tables (df counts, kept hashes)
  *   day 1   arrives as a MICRO-BATCH STREAM: per-batch deltas spool under
  *           batch=<id>; the DAY CLOSE folds the spool into the stored
  *           buckets exactly once and clears it (BucketedOps.foldSpool)
  *   day 2   arrives as a batch job: idempotentAppend (crash-replay lands
  *           exactly once per jobId)
  *   weekly  marker-retention GC (vacuumAppendMarkers) + GENERATION
  *           COMPACTION BY POLICY (BucketedOps.compactIfDue: compact when
  *           N+ append generations are stored — the system decides, not
  *           an operator's memory): the appended generations collapse to
  *           one resolved row per key — readers can't tell
  *   migrate the manifest gains a column MID-HISTORY (BucketedOps
  *           .migrateManifest): ADD-COLUMN evolution as the same
  *           kill-swept two-phase swap, existing rows backfilled, the
  *           catalog ALTERed inside the swap — resolution unchanged
  *   takedown a tombstoned doc's values leave the manifests
  *           (compactManifest deleteSet, under the set-difference
  *           contract: deleted docs' values MINUS live docs' values)
  *
  * After every phase the reader's resolution (sum(df) per term / distinct
  * hashes) is recomputed the same way — the lifecycle's invariant is that
  * folds, appends, vacuums, and compactions change WHERE rows live, never
  * what readers resolve; only the takedown changes answers, and only for
  * the tombstoned doc. Every write runs under the single-writer lease
  * (pluggable per scheme — UpsertSink.registerWriterLease — and refused
  * outright on documented-non-atomic object stores).
  *
  * {{{ sbt "runMain graft.examples.LakeLifecycle [sfDir]" }}}
  */
object LakeLifecycle {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").appName("lake-lifecycle").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val day0 = docs.filter(col("doc_id") % 3 === 0)
    val day1 = docs.filter(col("doc_id") % 3 === 1)
    val day2 = docs.filter(col("doc_id") % 3 === 2)

    def dfSum(tbl: String): Long =
      spark.table(tbl).groupBy("term").agg(sum("df").as("df"))
        .agg(sum("df")).head().getLong(0)
    def hashes(tbl: String): Long = spark.table(tbl).distinct().count()

    // ---- day 0: ingest the first generation as bucketed tables --------
    val dfTbl = BucketedOps.ensureBucketed(
      TfIdf.dfManifest(day0, "doc_id", "text"),
      s"lifecycle_df|$dir|${System.nanoTime()}", "term", buckets = 8)
    val hTbl = BucketedOps.ensureBucketed(
      day0.select(md5(col("text")).as("h")).distinct(),
      s"lifecycle_h|$dir|${System.nanoTime()}", "h", buckets = 8)
    println(s"day 0: df mass ${dfSum(dfTbl)}, ${hashes(hTbl)} kept hashes")

    // ---- day 1: a real micro-batch stream, then the day close ---------
    val stage = java.nio.file.Files.createTempDirectory("lifecycle_")
    day1.repartition(6).write.parquet(stage.resolve("in").toString)
    val spool = stage.resolve("spool").toString
    val schema = spark.read.parquet(stage.resolve("in").toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(stage.resolve("in").toString)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          TfIdf.dfManifest(batch, "doc_id", "text")
            .write.mode("overwrite").parquet(s"$spool/batch=$batchId")
      }
      .option("checkpointLocation", stage.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val preFold = spark.table(dfTbl).select("term", "df")
      .unionByName(spark.read.parquet(spool).select("term", "df"))
      .groupBy("term").agg(sum("df").as("df")).agg(sum("df")).head().getLong(0)
    BucketedOps.foldSpool(spark, spool, dfTbl, "term", buckets = 8,
      jobId = "day1", resolve = _.groupBy("term").agg(sum("df").as("df")))
    println(s"day 1 folded: df mass ${dfSum(dfTbl)} (streamed view saw $preFold — must match)")
    require(dfSum(dfTbl) == preFold, "fold changed what readers resolve")
    BucketedOps.idempotentAppend(
      day1.select(md5(col("text")).as("h")).distinct(), hTbl, "h",
      buckets = 8, jobId = "day1")

    // ---- day 2: the batch append path (replay-idempotent) -------------
    BucketedOps.idempotentAppend(TfIdf.dfManifest(day2, "doc_id", "text"),
      dfTbl, "term", buckets = 8, jobId = "day2")
    BucketedOps.idempotentAppend(TfIdf.dfManifest(day2, "doc_id", "text"),
      dfTbl, "term", buckets = 8, jobId = "day2") // crash-replay: no-op
    BucketedOps.idempotentAppend(
      day2.select(md5(col("text")).as("h")).distinct(), hTbl, "h",
      buckets = 8, jobId = "day2")
    val fullMass = dfSum(dfTbl)
    println(s"day 2 appended (replay was a no-op): df mass $fullMass")

    // ---- weekly: marker GC + CADENCE-TRIGGERED compaction --------------
    // horizon beyond the replay window; fresh markers survive, which is
    // the point — vacuum is for last week's bookkeeping
    BucketedOps.vacuumAppendMarkers(spark, dfTbl, horizonMs = 7L * 24 * 3600 * 1000)
    val filesBefore = spark.table(dfTbl).inputFiles.length
    // the weekly job doesn't compact by hand — it declares a POLICY:
    // compact when 2+ append generations are stored. The df table holds
    // day1+day2 = 2 generations (due); after the swap the count resets to
    // 0, so next week's identical call is a no-op until growth resumes.
    val dfResolve = (d: DataFrame) => d.groupBy("term").agg(sum("df").as("df"))
    require(BucketedOps.compactIfDue(spark, dfTbl, "term", buckets = 8,
      jobId = "week1", resolve = dfResolve, every = 2),
      "2 stored generations must trip the every-2 policy")
    require(!BucketedOps.compactIfDue(spark, dfTbl, "term", buckets = 8,
      jobId = "week1b", resolve = dfResolve, every = 2),
      "a freshly compacted table must not be due again")
    BucketedOps.compactIfDue(spark, hTbl, "h", buckets = 8,
      jobId = "week1", resolve = _.distinct(), every = 2)
    println(s"weekly cadence compaction: df mass ${dfSum(dfTbl)} (unchanged), " +
      s"${filesBefore} -> ${spark.table(dfTbl).inputFiles.length} files, " +
      "one resolved row per term")
    require(dfSum(dfTbl) == fullMass, "compaction changed what readers resolve")

    // ---- schema migration: the manifest gains a column MID-HISTORY ----
    // ADD-COLUMN evolution as the same two-phase swap (the promote marker
    // carries the new schema's DDL; every crash window kill-swept in
    // MigrateManifestSpec): existing rows backfill first_seen_day = 0 and
    // the catalog evolves via one idempotent ALTER inside the swap.
    // Reader resolution on the ORIGINAL columns is untouched.
    BucketedOps.migrateManifest(spark, dfTbl, "term", buckets = 8,
      jobId = "mig1",
      resolve = _.groupBy("term").agg(sum("df").as("df"))
        .withColumn("first_seen_day", lit(0L)))
    require(spark.table(dfTbl).columns.toSeq ==
      Seq("term", "df", "first_seen_day"),
      "migration must append the new column in place")
    require(dfSum(dfTbl) == fullMass, "migration changed what readers resolve")
    println(s"schema migration: df manifest evolved to " +
      s"(${spark.table(dfTbl).columns.mkString(", ")}), df mass unchanged")

    // ---- takedown: tombstone one day-0 doc ----------------------------
    // the set-difference contract: the manifests carry VALUES, so purge
    // only values belonging exclusively to the deleted doc
    val tomb = day0.orderBy("doc_id").limit(1)
    val live = docs.join(tomb.select("doc_id"), Seq("doc_id"), "left_anti")
    val delH = tomb.select(md5(col("text")).as("h"))
      .join(live.select(md5(col("text")).as("h")), Seq("h"), "left_anti")
    val before = hashes(hTbl)
    BucketedOps.compactManifest(spark, hTbl, "h", buckets = 8,
      jobId = "takedown1", resolve = _.distinct(), deleteSet = Some(delH))
    println(s"takedown: $before -> ${hashes(hTbl)} kept hashes " +
      "(the tombstoned doc's re-post would now be admitted again)")
    // the ADDITIVE family's takedown is a different algebra — df rows
    // carry no doc attribution, so the doc's contributions are appended
    // NEGATED (readers' sum is correct from this moment) and the next
    // compaction nets them out, dropping zeroed terms. On the MIGRATED
    // schema the subtraction rows carry each extra column's NEUTRAL
    // element (min → Long.MaxValue): a negative-count row must cancel
    // counts without perturbing any other resolved aggregate
    BucketedOps.idempotentAppend(
      TfIdf.dfManifest(tomb, "doc_id", "text")
        .select(col("term"), (-col("df")).as("df"))
        .withColumn("first_seen_day", lit(Long.MaxValue)),
      dfTbl, "term", buckets = 8, jobId = "takedown1")
    BucketedOps.compactManifest(spark, dfTbl, "term", buckets = 8,
      jobId = "takedown1",
      resolve = _.groupBy("term").agg(sum("df").as("df"),
          min("first_seen_day").as("first_seen_day"))
        .filter(col("df") =!= 0L))
    require(spark.table(dfTbl).filter(col("first_seen_day") === Long.MaxValue)
      .isEmpty, "no term may resolve to the subtraction rows' neutral day")
    val tombTokens = tomb.select(explode(split(col("text"), " "))).distinct().count()
    println(s"takedown (additive): df mass ${dfSum(dfTbl)} after subtracting the " +
      s"doc's $tombTokens distinct terms' contributions")
    require(dfSum(dfTbl) == fullMass - tombTokens,
      "additive takedown must subtract exactly the doc's df contributions")

    spark.stop()
    println("lifecycle complete: stream fold, idempotent append, vacuum, " +
      "compaction, schema migration, tombstone — reader resolution " +
      "invariant throughout")
  }
}
