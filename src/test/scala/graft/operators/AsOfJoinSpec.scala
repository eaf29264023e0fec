package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  test("as-of join: latest right at or before left ts; null when none") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e1"), (1L, 200L, "e2"), (2L, 50L, "e3"))
      .toDF("k", "ts", "ev")
    val right = Seq((1L, 90L, 9.0), (1L, 100L, 10.0), (1L, 150L, 15.0), (2L, 60L, 6.0))
      .toDF("k", "rts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(out === Set(
      (1L, 100L, "e1", Some(10.0)),  // ts tie → inclusive
      (1L, 200L, "e2", Some(15.0)),  // latest ≤ 200
      (2L, 50L, "e3", None)))        // right only at 60 > 50 → null
  }

  test("as-of join plan: single shuffle on the key, no range cross product") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e1")).toDF("k", "ts", "ev")
    val right = Seq((1L, 90L, 9.0)).toDF("k", "rts", "v")
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not degenerate to a product join:\n$plan")
  }
}
