package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  test("bucketed range join matches brute force on boundaries") {
    import spark.implicits._
    val left = Seq((1L, 1000L, "p1"), (1L, 2000L, "p2"), (2L, 500L, "p3"))
      .toDF("k", "lts", "lv")
    val right = Seq((1L, 900L, "a"), (1L, 1000L, "b"), (1L, 899L, "c"),
      (1L, 2100L, "d"), (2L, 499L, "e")).toDF("k", "rts", "rv")
    // window [lts-100, lts+0]
    val got = RangeJoin.timeRangeJoin(left, right, Seq("k"), "lts", "rts", 100L, 0L)
      .select("lv", "rv").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // brute force: p1 window [900,1000] → a,b; p2 [1900,2000] → none;
    // p3 [400,500] → e; 'c'@899 and 'd'@2100 excluded (boundary checks)
    assert(got === Set(("p1", "a"), ("p1", "b"), ("p3", "e")))
  }

  test("asymmetric window [lts, lts+upper]") {
    import spark.implicits._
    val left = Seq((1L, 1000L, "p")).toDF("k", "lts", "lv")
    val right = Seq((1L, 999L, "x"), (1L, 1000L, "y"), (1L, 1500L, "z"),
      (1L, 1501L, "w")).toDF("k", "rts", "rv")
    val got = RangeJoin.timeRangeJoin(left, right, Seq("k"), "lts", "rts", 0L, 500L)
      .select("rv").collect().map(_.getString(0)).toSet
    assert(got === Set("y", "z"))
  }
}
