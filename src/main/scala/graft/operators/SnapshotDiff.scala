package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of the same table — the
  * snapshot-comparison CDC mode a pipeline falls back to when no
  * transaction log exists (the inverse of the log-fed path in
  * [[graft.cdc]]: instead of folding a changelog into state, recover the
  * change set from two states). Also the core of dataset versioning:
  * "what changed between yesterday's lake snapshot and today's".
  *
  * Scale design: ONE full-outer sort-merge/shuffled-hash join
  * co-partitioned on the key — both sides shuffle exactly once, and with
  * a [[BucketedOps]] layout on the key even that exchange disappears.
  * The per-column comparisons are null-safe-equality expressions inside
  * whole-stage codegen (no UDF, no row serialization), and the output is
  * the DELTA only (`added`/`removed`/`changed`) unless `includeUnchanged`
  * is set — at 100 TB the diff of two mostly-identical snapshots must
  * emit O(|delta|), not O(|snapshot|).
  *
  * Presence on either side is detected by a constant marker column, not
  * key nullability, so nullable keys cannot be misread as absence.
  * `changed_cols` is the comma-joined list of differing non-key columns
  * in schema order (a STRING, not an array — deterministic and
  * hash-gateable); for `added`/`removed` rows it is empty (there is no
  * counterpart to differ from). */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(oldSnap.columns.sameElements(newSnap.columns),
      s"snapshot schemas differ: ${oldSnap.columns.mkString(",")} vs " +
        newSnap.columns.mkString(","))
    keys.foreach(k => require(oldSnap.columns.contains(k), s"missing key column $k"))
    val nonKey = oldSnap.columns.filterNot(keys.contains).toSeq

    val a = oldSnap.withColumn("__a", lit(true)).as("a")
    val b = newSnap.withColumn("__b", lit(true)).as("b")
    // null-safe key equality: a NULL key value matches only a NULL key
    // value, mirroring how a key-preserving writer would treat the row
    val joinCond = keys.map(k => col(s"a.$k") <=> col(s"b.$k")).reduce(_ && _)
    val j = a.join(b, joinCond, "full_outer")

    // one slot per non-key column: its name when the two sides differ
    // (null-safe — NULL→value and value→NULL are changes), else NULL;
    // array_compact drops the NULLs, array_join fixes schema order
    val changedArr = array_compact(array(nonKey.map(c =>
      when(!(col(s"a.$c") <=> col(s"b.$c")), lit(c))): _*))
    val present = (m: String) => col(m).isNotNull
    val changeType = when(!present("__a"), lit("added"))
      .when(!present("__b"), lit("removed"))
      .when(size(changedArr) > 0, lit("changed"))
      .otherwise(lit("unchanged"))
    val changedCols = when(present("__a") && present("__b"),
      array_join(changedArr, ",")).otherwise(lit(""))

    val keyOut = keys.map(k => coalesce(col(s"b.$k"), col(s"a.$k")).as(k))
    val out = j.select(keyOut ++ Seq(
      changeType.as("change_type"),
      changedCols.as("changed_cols"),
      when(present("__a") && present("__b"), size(changedArr).cast("bigint"))
        .otherwise(lit(0L)).as("n_changed_cols")): _*)
    if (includeUnchanged) out else out.filter(col("change_type") =!= "unchanged")
  }
}
