package graft.operators

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("contamination counts planted 5-gram overlap exactly") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // contains the benchmark's first 5-gram verbatim, once, in 6 shingles
      (1L, "so the quick brown fox jumps away from all danger"),
      // fully disjoint vocabulary
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // a full verbatim copy of the benchmark doc: every shingle matches
      (3L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")

    val out = Dedup.contaminationCheck(corpus, bench, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()

    assert(out(0).getLong(1) == 6 && out(0).getLong(2) == 1)
    assert(out(0).getDouble(3) == 1.0 / 6.0)
    assert(out(1).getLong(2) == 0 && out(1).getDouble(3) == 0.0)
    assert(out(2).getLong(1) == 6 && out(2).getLong(2) == 6)
    assert(out(2).getDouble(3) == 1.0)
  }
}
