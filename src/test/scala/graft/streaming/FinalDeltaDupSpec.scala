package graft.streaming

import graft.SparkSpec

/** Pins [[ClusterMaintenanceStream.finalDelta]]'s prior leg against an
  * APPEND-MAINTAINED assignment table (round-12 verdict "What's wrong
  * #1"): such a table carries duplicate doc_ids — a doc's current label is
  * the MIN of its rows, the stale higher-label rows are history. The delta
  * a daily job appends and audits must therefore min-reduce the stored
  * label per doc BEFORE the changed-filter: the raw-row join emitted one
  * 'prior' row PER stale row, including spurious "changed" rows when the
  * resolved label equals the doc's true latest. */
class FinalDeltaDupSpec extends SparkSpec {
  import spark.implicits._

  test("one delta row per changed doc; zero spurious rows when resolved == latest stored") {
    // q119 table shape: doc 5 merged down 10 -> 7 on an earlier day (two
    // stored rows), doc 7 likewise 9 -> 8, doc 6 never touched
    val priorAssign = Seq(
      (5L, 10L), (5L, 7L),
      (6L, 6L),
      (7L, 9L), (7L, 8L)).toDF("doc_id", "cluster_id")
    val tmp = java.nio.file.Files.createTempDirectory("graft_fdd_")
    tmp.toFile.deleteOnExit()
    val spoolDelta = tmp.resolve("delta").toString
    // today's batch: doc 100 joins cluster 3 and drags prior doc 7 down
    // to 3; doc 5 is re-confirmed at its CURRENT label 7 (the spurious-
    // row trap: 5's stale (5,10) row passes a raw =!= filter)
    Seq((100L, 3L), (7L, 3L), (5L, 7L)).toDF("doc_id", "cluster_id")
      .write.parquet(s"$spoolDelta/batch=0")
    val todayIds = Seq(Tuple1(100L)).toDF("doc_id")
    val delta = ClusterMaintenanceStream.finalDelta(
        spark, priorAssign, spoolDelta, todayIds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(delta == Seq((7L, 3L, "prior"), (100L, 3L, "today")),
      s"expected exactly one changed-prior row (doc 7) and one today row, got $delta")
  }
}
