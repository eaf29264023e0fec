package graft.streaming

import graft.operators.ChangelogOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Idempotent materialized-view sink for op-column changelog streams —
  * the missing half of "any Spark sink works": plain appends are fine for
  * the changelog itself, but consumers usually want the CURRENT STATE
  * table, updated in place, surviving failures without duplicates.
  *
  * Each micro-batch merges into the parquet target by primary key with
  * last-writer-wins on (op_offset, after-image-wins); deletes drop the
  * row. The merge is a pure function of (previous state ∪ batch), so
  * REPLAYING a batch after a failure re-derives the identical snapshot —
  * idempotence comes from the merge algebra, not from sink-side dedup
  * bookkeeping. The new snapshot is written beside the target and swapped
  * in with two directory renames, so a crash mid-write leaves either the
  * old or the new snapshot, never a torn mix.
  *
  * Scale: the merge is one keyed shuffle over |state| + |batch| rows (the
  * same cost any copy-on-write table format pays per commit). For
  * petabyte state, swap the parquet rewrite for a MERGE INTO on a table
  * format with deletion vectors; the streaming contract here (foreachBatch
  * + deterministic merge) stays identical. */
object UpsertSink {

  /** Wire a changelog stream (read with
    * `metadata.columns = "op_offset,row_kind"`) to a parquet current-state
    * table at `path`. Returns the writer; caller sets checkpoint/trigger. */
  def upsertParquet(changelog: DataFrame, pkCols: Seq[String],
      path: String): DataStreamWriter[Row] =
    changelog.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      mergeBatch(batch, pkCols, path)
    }

  /** One merge step: previous snapshot ∪ batch → last-wins state. Exposed
    * for tests and for batch backfills (same algebra, no stream). */
  def mergeBatch(batch: DataFrame, pkCols: Seq[String], path: String): Unit = {
    val spark = batch.sparkSession
    // A previous merge may have died between its two renames (target gone,
    // __old holding the last complete snapshot). Restore it BEFORE looking
    // for the target, or the merge below would silently rebuild state from
    // this batch alone. No-op in the common case.
    recover(spark, path)
    val target = new Path(path)
    val tmp = new Path(path + "__tmp")
    val old = new Path(path + "__old")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Hadoop FileSystem#rename reports failure by returning false; treating
    // that as success and proceeding to the deletes would destroy the only
    // complete snapshot.
    def renameOrDie(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"rename $src -> $dst failed; " +
          "aborting merge (snapshot left intact for recover())")

    // previous state re-enters the merge as a changelog of plain inserts
    // that lose to ANY batch event for the same key (offset -1)
    val prev =
      if (fs.exists(target))
        spark.read.parquet(path)
          .withColumn("op", lit("r"))
          .withColumn("op_offset", lit(-1L))
          .withColumn("row_kind", lit("+I"))
      else batch.limit(0)

    val merged = ChangelogOps.materializeExact(prev.unionByName(batch), pkCols)
    merged.write.mode("overwrite").parquet(tmp.toString)

    // two renames: old snapshot aside, new snapshot in. A crash between
    // them leaves __old (+ __tmp); the recover() at the top of the next
    // merge restores from __old before anything else happens.
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target)) renameOrDie(target, old)
    renameOrDie(tmp, target)
    fs.delete(old, true)
  }

  /** Crash recovery: if a previous merge died between its two renames,
    * put the last complete snapshot back. Call before starting the query
    * (cheap no-op in the common case). */
  def recover(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val target = new Path(path)
    val old = new Path(path + "__old")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(target) && fs.exists(old)) fs.rename(old, target)
    fs.delete(new Path(path + "__tmp"), true)
  }
}
