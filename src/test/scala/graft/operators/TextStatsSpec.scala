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

  test("removeRepeatedSpans: covered tokens cut, order kept, edge docs survive") {
    // spanLen=3, minCount=2: "p q r" appears in docs 1 and 2 (cross-doc
    // boilerplate); "m m m" appears twice WITHIN doc 3 (self-repeat);
    // doc 4 is unique text; doc 5 is shorter than the span length;
    // doc 6 is NOTHING BUT the repeated span (fully covered).
    val docs = Seq(
      (1L, "a p q r b"),
      (2L, "c d p q r"),
      (3L, "m m m x m m m"),
      (4L, "u v w y z"),
      (5L, "s t"),
      (6L, "p q r")
    ).toDF("doc_id", "text")
    val out = TextStats.removeRepeatedSpans(docs, "doc_id", "text",
        spanLen = 3, minCount = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 5L, 3L, "a b")), s"got ${out(0)}")
    assert(out(1) == ((2L, 5L, 3L, "c d")), s"got ${out(1)}")
    // doc 3: "m m m" occurs at positions 1 and 5 (and "m m m" count=2
    // plus windows "m m x","m x m","x m m" are unique) → covered 1-3,5-7;
    // "x" at 4 survives
    assert(out(2) == ((3L, 7L, 6L, "x")), s"got ${out(2)}")
    assert(out(3) == ((4L, 5L, 0L, "u v w y z")), s"got ${out(3)}")
    assert(out(4) == ((5L, 2L, 0L, "s t")), s"got ${out(4)}")
    // fully covered: empty clean_text, not a vanished row
    assert(out(5) == ((6L, 3L, 3L, "")), s"got ${out(5)}")
  }

  test("removeRepeatedSubstrings: keeps the first copy, removes only runs >= minRun") {
    // spanLen=3, minCount=2, minRun=5:
    // docs 1+2 share the 6-token run "a b c d e f" — doc 1 (globally
    // first) keeps it, doc 2 loses exactly the run; docs 3+4 share only
    // a 4-token overlap (below minRun) — BOTH survive untouched; doc 5
    // is one token repeated — the first window's copy survives, the
    // 9-token echo island goes.
    val docs = Seq(
      (1L, "h1 a b c d e f t1"),
      (2L, "h2 h3 a b c d e f t2"),
      (3L, "x y z q r"),
      (4L, "x y z q s"),
      (5L, "m m m m m m m m m m")
    ).toDF("doc_id", "text")
    val out = TextStats.removeRepeatedSubstrings(docs, "doc_id", "text",
        spanLen = 3, minCount = 2, minRun = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 8L, 0L, "h1 a b c d e f t1")), s"got ${out(0)}")
    assert(out(1) == ((2L, 9L, 6L, "h2 h3 t2")), s"got ${out(1)}")
    assert(out(2) == ((3L, 5L, 0L, "x y z q r")), s"got ${out(2)}")
    assert(out(3) == ((4L, 5L, 0L, "x y z q s")), s"got ${out(3)}")
    assert(out(4) == ((5L, 10L, 9L, "m")), s"got ${out(4)}")
  }

  test("incrementalRemoveRepeatedSpans ≡ from-scratch pass over the union, restricted to today") {
    // window counts add under disjoint doc sets, so cleaning today
    // against the prior corpus's (span, n) manifest must equal running
    // removeRepeatedSpans over (prior ∪ today) and keeping today's rows —
    // including the case where the duplicate lives ONLY across the day
    // boundary (one copy prior, one today) and the case where the prior
    // corpus alone already repeats the span (today's single copy cut)
    val rep = (1 to 8).map(i => s"w$i").mkString(" ")     // one 8-token window
    val rep2 = (11 to 18).map(i => s"v$i").mkString(" ")
    val prior = Seq(
      (1L, s"alpha $rep beta"),                            // rep: 1 prior copy
      (2L, s"$rep2 one"), (3L, s"$rep2 two")               // rep2: repeated IN prior
    ).toDF("doc_id", "text")
    val today = Seq(
      (10L, s"gamma $rep delta"),                          // cross-boundary dup
      (11L, s"start $rep2 end"),                           // prior-only dup
      (12L, "totally fresh words nothing repeated here at all")
    ).toDF("doc_id", "text")
    val manifest = TextStats.spanManifest(prior, "doc_id", "text")
    val inc = TextStats.incrementalRemoveRepeatedSpans(
        today, "doc_id", "text", manifest)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val scratch = TextStats.removeRepeatedSpans(
        prior.unionAll(today), "doc_id", "text")
      .filter($"doc_id" >= 10L).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(inc.toSeq == scratch.toSeq,
      "incremental cleaning diverged from the from-scratch union pass")
    // and the interesting rows really were cut (the fixture is not vacuous)
    assert(inc(0)._3 == 8L && inc(1)._3 == 8L && inc(2)._3 == 0L)
    // a spanLen mismatching the manifest's build would make the span join
    // never match — prior counts silently 0, cross-boundary dups kept; the
    // operator must refuse loudly instead (manifest spans are 8 tokens,
    // caller declares 6)
    val ex = intercept[IllegalArgumentException] {
      TextStats.incrementalRemoveRepeatedSpans(
        today, "doc_id", "text", manifest, spanLen = 6)
    }
    assert(ex.getMessage.contains("spanLen=8") && ex.getMessage.contains("spanLen=6"),
      s"the refusal must name both lengths: ${ex.getMessage}")
  }

  test("bigramFluency: OOV rate and hit mass against a reference manifest") {
    val ref = Seq((10L, "the cat sat"), (11L, "the cat ran")).toDF("doc_id", "text")
    val manifest = TextStats.bigramManifest(ref, "doc_id", "text")
    // manifest: "the cat"→2, "cat sat"→1, "cat ran"→1
    val today = Seq(
      (1L, "the cat sat"),   // bigrams: the-cat(2), cat-sat(1) → 0 oov, mass 3
      (2L, "a cat sat"),     // a-cat oov, cat-sat(1) → 1 oov, mass 1
      (3L, "zz qq"),         // zz-qq oov → 1 oov, mass 0
      (4L, "solo")           // no bigrams
    ).toDF("doc_id", "text")
    val out = TextStats.bigramFluency(today, "doc_id", "text", manifest)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out(0) == ((1L, 2L, 0L, 3L, 0.0, 1.5)))
    assert(out(1) == ((2L, 2L, 1L, 1L, 0.5, 0.5)))
    assert(out(2) == ((3L, 1L, 1L, 0L, 1.0, 0.0)))
    assert(out(3) == ((4L, 0L, 0L, 0L, 0.0, 0.0)))
  }
}
