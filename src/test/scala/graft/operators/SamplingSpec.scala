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

  test("sourceMixture: multiplicity tracks the rate; exact for whole rates; epochs 0-based") {
    val mixed = Sampling.sourceMixture(docs, "doc_id", "source",
      rates = Map("src0" -> 3.0, "src1" -> 1.5, "src2" -> 0.0), defaultRate = 1.0)
    val per = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // whole rates are EXACT per id (3 copies each / dropped entirely)
    assert(per("src0") === 3 * base("src0"))
    assert(!per.contains("src2"))
    // fractional rates converge in expectation over the id population
    val r1 = per("src1").toDouble / base("src1")
    assert(math.abs(r1 - 1.5) < 0.25, s"src1 multiplicity $r1")
    // unlisted sources ride at defaultRate = 1.0, exactly once
    (base.keySet -- Set("src0", "src1", "src2")).foreach(s =>
      assert(per(s) === base(s), s"default-rate source $s"))
    // per-row epochs are 0..copies-1 — distinguishable, densely numbered
    val eps = mixed.filter(col("source") === "src0").groupBy("doc_id")
      .agg(sort_array(collect_list("epoch")).as("eps"))
      .select("eps").collect().map(_.getSeq[Long](0))
    assert(eps.nonEmpty && eps.forall(_ == Seq(0L, 1L, 2L)))
    // determinism: copy counts are a pure function of the id, not the run
    val again = Sampling.sourceMixture(docs.repartition(13), "doc_id", "source",
      rates = Map("src0" -> 3.0, "src1" -> 1.5, "src2" -> 0.0), defaultRate = 1.0)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === per)
    // plan: literal CASE + explode — no join, no shuffle
    val plan = mixed.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"mixture must stay a per-row flatMap:\n$plan")
  }

  test("leakageSafeSplit: no near-dup pair straddles a split; the per-doc split demonstrably would") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.3)
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs)
    val splitOf = out.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(splitOf.size === docs.count(), "every doc gets a verdict")
    val ps = pairs.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.nonEmpty, "fixture must actually have near-dup pairs")
    ps.foreach { case (a, b) =>
      assert(splitOf(a) === splitOf(b), s"near-dup pair ($a,$b) straddles the split")
    }
    // contrast: the per-doc split separates two IDENTICAL docs whose ids
    // hash apart — the leakage this operator exists to prevent
    val perDoc = Sampling.split(docs, "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val (ia, ib) = (for { a <- ids.view; b <- ids.view
      if a < b && perDoc(a) != perDoc(b) } yield (a, b)).head
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val sess = spark
    import sess.implicits._
    val synth = Seq((ia, txt), (ib, txt)).toDF("doc_id", "text")
    val sp = Dedup.ngramJaccardPairs(synth, "doc_id", "text", n = 3, minJaccard = 0.3)
    val safe = Sampling.leakageSafeSplit(synth, "doc_id", sp).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(safe(ia) === safe(ib), "identical docs must land in one split")
    assert(perDoc(ia) !== perDoc(ib), "the per-doc split would have separated them")
  }

  test("incrementalLeakageSafeSplit: a cross-fence merge re-lands the whole cluster on one side") {
    val sess = spark
    import sess.implicits._
    // two prior clusters engineered onto OPPOSITE sides of the fence:
    // reps are the cluster minima, so scan for two ids whose hash buckets
    // split train/test, then give each a near-dup partner
    val bucketOf = (id: Long) => Sampling.splitLabels("rep")(
      Seq(id).toDF("rep")).collect().head.getString(2)
    val candidates = (1L to 60L).map(i => i -> bucketOf(i))
    val trainRep = candidates.find(_._2 == "train").get._1
    val testRep = candidates.collect { case (i, s) if s == "test" && i > trainRep => i }.head
    val txtA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val txtB = "one two three four five six seven eight nine ten"
    val prior = Seq((trainRep, txtA), (trainRep + 1000, txtA),
      (testRep, txtB), (testRep + 1000, txtB)).toDF("doc_id", "text")
    val priorPairs = Dedup.ngramJaccardPairs(prior, "doc_id", "text", 3, 0.3)
    val priorAssign = ConnectedComponents.components(priorPairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
    // today: one bridge doc near-dup to BOTH clusters (merges them)
    val bridge = 5000L
    val today = Seq((bridge, txtA + " " + txtB)).toDF("doc_id", "text")
    val cross = Dedup.ngramJaccardPairsVsIndex(today, "doc_id", "text",
      Dedup.shingleIndex(prior, "doc_id", "text"), 3, 0.3)
    assert(cross.count() === 4, "bridge must reach all four prior docs")
    val out = Sampling.incrementalLeakageSafeSplit(
      ConnectedComponents.incrementalClusters(
        today.select("doc_id"), "doc_id",
        Dedup.ngramJaccardPairs(today, "doc_id", "text", 3, 0.3), "id_a", "id_b",
        cross, "today_id", "prior_id", priorAssign))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getString(4)))
      .toMap
    // merged rep = min over both clusters = trainRep ⇒ EVERY member of the
    // merged cluster (bridge + the test-side docs) re-lands on train
    assert(out(bridge) === ((trainRep, "today", "train")))
    assert(out(testRep) === ((trainRep, "prior", "train")),
      "old test-side rep must move to the merged side")
    assert(out(testRep + 1000) === ((trainRep, "prior", "train")))
    // train-side docs' assignment did not change ⇒ no delta rows for them
    assert(!out.contains(trainRep) && !out.contains(trainRep + 1000),
      "unchanged prior docs must not appear in the delta")
  }

  test("tokenBudgetMixture: two-level bucketed sum ≡ naive window; crossing doc kept; minimal") {
    import org.apache.spark.sql.expressions.Window
    val toks = graft.functions.TextFunctions.tokenCount(col("text"))
    val budgets = Map("src0" -> 800L, "src1" -> 100L, "src2" -> Long.MaxValue)
    val out = Sampling.tokenBudgetMixture(docs.select("doc_id", "source", "text"),
      "doc_id", "source", toks, budgets, defaultBudget = 300L)
    val got = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    // the naive corpus-wide window (what the oracle runs) — bit-identical
    val wNaive = Window.partitionBy("source")
      .orderBy(Dedup.portableH31(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def budgetExpr = when(col("source") === "src0", 800L)
      .when(col("source") === "src1", 100L)
      .when(col("source") === "src2", Long.MaxValue).otherwise(300L)
    val naive = docs.select(col("doc_id"), col("source"), toks.as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(wNaive).cast("bigint"))
      .filter(col("cum_tokens") - col("n_tokens") < budgetExpr)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === naive)

    // ... and invariant to the bucket count (range-bucketing preserves the
    // global hash order, so the two-level sum can't depend on nBuckets)
    val b4 = Sampling.tokenBudgetMixture(docs.select("doc_id", "source", "text"),
      "doc_id", "source", toks, budgets, defaultBudget = 300L, nBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(b4 === got)

    // budget semantics per source: every kept doc starts under the budget,
    // the crossing doc is kept (kept mass reaches >= budget when the
    // source has the mass), and kept - last == under budget (minimality)
    val bySource = got.groupBy(_._2)
    val mass = docs.select(col("source"), toks.as("n"))
      .groupBy("source").agg(sum("n").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rows) =>
      val budget = budgets.getOrElse(src, 300L)
      val keptMass = rows.toSeq.map(_._3).sum
      rows.foreach { case (id, _, n, cum) =>
        assert(cum - n < budget, s"$src/$id starts at ${cum - n} >= $budget")
      }
      if (budget == Long.MaxValue)
        assert(keptMass === mass(src), s"$src unbounded must keep everything")
      else if (mass(src) >= budget) {
        assert(keptMass >= budget, s"$src kept $keptMass < budget $budget")
        val last = rows.maxBy(_._4)
        assert(keptMass - last._3 < budget, s"$src keeps a doc past the crossing")
      } else assert(keptMass === mass(src), s"$src under-massed must keep everything")
    }
    // the starved source actually truncates (the fixture is interesting)
    assert(bySource("src1").size < docs.filter(col("source") === "src1").count())
  }

  test("epochShards: one shard each, dense positions, repartition-stable, epoch re-permutes") {
    val ids = docs.select("doc_id")
    val n = ids.count()
    val e0 = Sampling.epochShards(ids, "doc_id", nshards = 8, epoch = 0)
    assert(e0.count() === n, "placement is a permutation — no row gained or lost")
    // per shard: positions are exactly 1..|shard| (dense, unique)
    val per = e0.groupBy("shard").agg(count(lit(1)).as("n"),
      countDistinct("pos").as("d"), min("pos").as("mn"), max("pos").as("mx")).collect()
    assert(per.length === 8, "all shards populated at this size")
    per.foreach { r =>
      val (cnt, dst, mn, mx) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dst === cnt && mn === 1L && mx === cnt, s"shard ${r.getLong(0)}: $cnt/$dst/$mn/$mx")
    }
    // hash-uniform: no shard more than 2× the mean at this corpus size
    val sizes = per.map(_.getLong(1))
    assert(sizes.max.toDouble / (n.toDouble / 8) < 2.0, sizes.mkString(","))
    // placement is a pure function of (id, epoch) — partitioning-invariant
    val a = e0.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Sampling.epochShards(ids.repartition(13), "doc_id", nshards = 8, epoch = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    // a new epoch RE-permutes: most rows move shard, and within-shard
    // orders decorrelate (the whole point of an epoch reshuffle)
    val m0 = a.map(t => t._1 -> t._2).toMap
    val m1 = Sampling.epochShards(ids, "doc_id", nshards = 8, epoch = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = m0.count { case (id, s0) => m1(id) != s0 }
    assert(moved > n / 2, s"epoch 1 moved only $moved of $n")
    // exactly ONE exchange (on shard) — the export plan's repartition
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val pp = e0.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    val plan = pp.toString()
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }
}
