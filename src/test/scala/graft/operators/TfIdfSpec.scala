package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the incremental TF-IDF contract (q116): scoring an increment
  * against the additive df manifest equals the from-scratch corpus run
  * restricted to the increment, and the manifest itself composes by
  * append + sum. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val prior = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a cat and a dog")).toDF("doc_id", "text")
  private val today = Seq(
    (10L, "the cat runs"),
    (11L, "a new dog runs fast")).toDF("doc_id", "text")

  test("incrementalTopTerms ≡ from-scratch topTerms restricted to today") {
    val manifest = TfIdf.dfManifest(prior, "doc_id", "text")
    val inc = TfIdf.incrementalTopTerms(today, "doc_id", "text",
      manifest, priorN = 3L, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))).toSet
    val full = TfIdf.topTerms(prior.unionAll(today), "doc_id", "text", k = 3)
      .filter(col("id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))).toSet
    assert(inc == full)
  }

  test("df manifest composes by append + sum") {
    val merged = TfIdf.dfManifest(prior, "doc_id", "text")
      .unionAll(TfIdf.dfManifest(today, "doc_id", "text"))
      .groupBy("term").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val scratch = TfIdf.dfManifest(prior.unionAll(today), "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == scratch)
  }

  test("distributionDrift: exact counts, keys from either side, zero-excess iff proportional") {
    val t = Seq(("s0", "en"), ("s0", "en"), ("s1", "de")).toDF("source", "lang")
    val m = Seq(("s0", "en", 4L), ("s2", "fr", 2L)).toDF("source", "lang", "n")
    val out = Profiling.distributionDrift(t, Seq("source", "lang"), m)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(8))).toMap
    // totals: today 3, prior 6
    assert(out(("s0", "en")) == ((2L, 4L, 0L)))          // 2*6 - 4*3 = 0: proportional
    assert(out(("s1", "de")) == ((1L, 0L, 6L)))          // new key: over-represented
    assert(out(("s2", "fr")) == ((0L, 2L, -6L)))         // vanished key: under
  }
}
