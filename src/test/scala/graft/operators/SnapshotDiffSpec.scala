package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SnapshotDiffSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("price", DoubleType),
    StructField("st", StringType)))

  private def snap(rows: (java.lang.Long, java.lang.Double, String)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*), schema)

  test("classifies added/removed/changed with per-column change lists") {
    val old = snap((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
    val nw  = snap((1L, 10.0, "A"), (2L, 21.0, "B"), (4L, 40.0, "D"))
    val got = SnapshotDiff.diff(old, nw, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got === Set(
      (2L, "changed", "price", 1L),
      (3L, "removed", "", 0L),
      (4L, "added", "", 0L)))
  }

  test("includeUnchanged keeps identical rows; multi-column changes list schema order") {
    val old = snap((1L, 10.0, "A"), (2L, 20.0, "B"))
    val nw  = snap((1L, 10.0, "A"), (2L, 22.0, "Z"))
    val all = SnapshotDiff.diff(old, nw, Seq("k"), includeUnchanged = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(all === Set((1L, "unchanged", ""), (2L, "changed", "price,st")))
  }

  test("null handling: NULL→value is a change; NULL==NULL is not; nullable non-key columns on added rows") {
    val old = snap((1L, null, "A"), (2L, 20.0, null))
    val nw  = snap((1L, 15.0, "A"), (2L, 20.0, null), (3L, null, null))
    val got = SnapshotDiff.diff(old, nw, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got === Set((1L, "changed", "price", 1L), (3L, "added", "", 0L)))
  }

  test("rejects mismatched schemas and missing keys") {
    val old = snap((1L, 10.0, "A"))
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, old.withColumnRenamed("st", "status"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, old, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, old, Seq.empty)
    }
  }

  test("delta-only output: identical snapshots diff to zero rows") {
    val old = snap((1L, 10.0, "A"), (2L, 20.0, "B"))
    assert(SnapshotDiff.diff(old, snap((1L, 10.0, "A"), (2L, 20.0, "B")), Seq("k")).count() === 0)
  }
}
