package graft.operators

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition stats on hand-computed fixtures") {
    val docs = Seq(
      (1L, "a b a b a"),        // 5 tokens, 2 distinct; bigrams: ab,ba,ab,ba → top 2/4
      (2L, "x y z"),            // all distinct; bigrams xy,yz → top 1/2; trigram 1/1
      (3L, "w w w w"),          // degenerate: 1 distinct, all grams equal
      (4L, "solo")              // 1 token: no bigrams/trigrams → fracs 0
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()

    def row(i: Int) = out(i)
    assert(row(0).getLong(1) == 5 && row(0).getLong(2) == 2)
    assert(row(0).getDouble(3) == 3.0 / 5.0)       // dup_token_frac
    assert(row(0).getDouble(4) == 2.0 / 4.0)       // top bigram "a b"
    assert(row(0).getDouble(5) == 2.0 / 3.0)       // trigrams: aba,bab,aba

    assert(row(1).getDouble(3) == 0.0)
    assert(row(1).getDouble(4) == 1.0 / 2.0)
    assert(row(1).getDouble(5) == 1.0)

    assert(row(2).getLong(2) == 1)
    assert(row(2).getDouble(3) == 3.0 / 4.0)
    assert(row(2).getDouble(4) == 1.0 && row(2).getDouble(5) == 1.0)

    assert(row(3).getLong(1) == 1)
    assert(row(3).getDouble(4) == 0.0 && row(3).getDouble(5) == 0.0)
  }

  test("multiset shingles keep multiplicity, dedup helper does not") {
    val df = Seq(Tuple1("a b a b")).toDF("text")
    val multi = df.select(TextStats.wordShinglesMulti($"text", 2)).head().getSeq[String](0)
    assert(multi == Seq("a b", "b a", "a b"))
    val dedup = df.select(graft.functions.TextFunctions.wordShingles($"text", 2))
      .head().getSeq[String](0)
    assert(dedup.toSet == Set("a b", "b a"))
  }
}
