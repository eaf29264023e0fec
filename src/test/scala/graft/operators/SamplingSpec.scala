package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic-sampling contracts: membership is a pure function of the
  * id (stable under repartition), proportions track the percentages, and
  * strata get their own rates. */
class SamplingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"
  private lazy val docs = graft.Tables.t(spark, dir, "documents")

  test("split proportions track 80/10/10 and are repartition-stable") {
    val s1 = Sampling.split(docs, "doc_id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = s1.values.sum.toDouble
    assert(math.abs(s1("train") / n - 0.8) < 0.06, s1)
    assert(math.abs(s1("val") / n - 0.1) < 0.05, s1)
    assert(math.abs(s1("test") / n - 0.1) < 0.05, s1)
    val ids1 = Sampling.split(docs, "doc_id").filter(col("split") === "val")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.split(docs.repartition(13), "doc_id").filter(col("split") === "val")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2, "membership must not depend on partitioning")
  }

  test("stratified sampling applies per-stratum rates") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("de" -> 100), defaultPct = 10)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") === total("de"), "100% stratum must keep everything")
    val headKept = (byLang.keySet - "de").map(l => byLang.getOrElse(l, 0L)).sum.toDouble
    val headTotal = (total.keySet - "de").map(total).sum.toDouble
    assert(headKept / headTotal < 0.2, s"default 10% kept ${headKept / headTotal}")
  }

  test("quotaPerGroup caps every group at the quota, deterministically") {
    val q = Sampling.quotaPerGroup(docs, "doc_id", "source", quota = 3)
    val counts = q.groupBy("source").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 3) && counts.nonEmpty)
    val ids1 = q.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.quotaPerGroup(docs.repartition(17), "doc_id", "source", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2, "quota selection must not depend on partitioning")
  }

  test("weightedSample inclusion rate tracks the weight") {
    // constant weight 0.3 → ~30% kept; weight 1.0 → everything kept
    val kept = Sampling.weightedSample(docs, "doc_id", lit(0.3)).count().toDouble
    assert(math.abs(kept / docs.count() - 0.3) < 0.07, kept)
    assert(Sampling.weightedSample(docs, "doc_id", lit(1.0)).count() == docs.count())
    assert(Sampling.weightedSample(docs, "doc_id", lit(0.0)).count() == 0)
  }
}
