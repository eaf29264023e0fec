package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdHistorySpec extends SparkSpec {
  import spark.implicits._

  test("scd2 intervals: updates chain, deletes close, current flagged") {
    // key 1: insert@10 → update@20 (two-row pair) → delete@30
    // key 2: insert@11, never touched again
    val cl = Seq(
      (1L, 100.0, "c", 10L, "+I"),
      (1L, 100.0, "u", 20L, "-U"),
      (1L, 110.0, "u", 20L, "+U"),
      (1L, 110.0, "d", 30L, "+I"),
      (2L, 50.0, "c", 11L, "+I")
    ).toDF("k", "price", "op", "op_offset", "row_kind")

    val h = ChangelogOps.scd2History(cl, Seq("k"), "op_offset")
      .select("k", "price", "valid_from", "valid_to", "is_current")
      .orderBy("k", "valid_from").collect()

    assert(h.length == 3)
    // key 1 v1: [10, 20), superseded
    assert(h(0).getLong(0) == 1 && h(0).getDouble(1) == 100.0 &&
      h(0).getLong(2) == 10 && h(0).getLong(3) == 20 && !h(0).getBoolean(4))
    // key 1 v2: [20, 30) closed by the delete — no current row for key 1
    assert(h(1).getDouble(1) == 110.0 && h(1).getLong(3) == 30 && !h(1).getBoolean(4))
    // key 2: open interval, current
    assert(h(2).getLong(0) == 2 && h(2).isNullAt(3) && h(2).getBoolean(4))
  }
}
