package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training pipelines.
  *
  * `sample(fraction)` is nondeterministic across runs and engines; training
  * pipelines need REPRODUCIBLE membership ("this doc is always in val"),
  * stable under reruns, repartitions, and engine swaps. These operators
  * derive membership from the portable md5 hash ([[Dedup.portableH31]] —
  * bit-identical in every engine), so splits are pure functions of the id:
  * no shuffle, no state, embarrassingly parallel, and oracle-checkable.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id — the split primitive. */
  def hashBucket(idCol: Column, buckets: Int = 100): Column =
    pmod(Dedup.portableH31(idCol.cast("string")), lit(buckets.toLong))

  /** Deterministic train/val/test labels by cumulative percentage
    * (e.g. 80/10/10). Percentages must sum to 100. */
  def split(df: DataFrame, idCol: String, trainPct: Int = 80, valPct: Int = 10,
      labelCol: String = "split"): DataFrame = {
    require(trainPct + valPct < 100 && trainPct > 0 && valPct >= 0)
    val b = hashBucket(col(idCol))
    df.withColumn(labelCol,
      when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test"))
  }

  /** Deterministic p% sample: rows whose bucket falls under `pct`. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < pct)

  /** Per-stratum deterministic sampling: different percentages per value of
    * `stratumCol` (e.g. keep 100% of rare languages, 5% of the head) —
    * membership still a pure function of the id. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(stratumCol) === k, p).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < pct)
  }

  /** Domain/source quota: keep at most `quota` rows per value of
    * `groupCol`, chosen deterministically (ranked by the portable id hash,
    * id as tie-break) — the "cap any one domain's share of the corpus"
    * curation step. One keyed shuffle; a group's candidates sort inside
    * one task, so the bound is the largest group's size, not the corpus —
    * for pathological hot groups pre-thin with [[hashSample]] first. */
  def quotaPerGroup(df: DataFrame, idCol: String, groupCol: String,
      quota: Int, rankCol: String = "quota_rank"): DataFrame = {
    require(quota > 0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(Dedup.portableH31(col(idCol).cast("string")), col(idCol))
    df.withColumn(rankCol, row_number().over(w).cast("bigint"))
      .filter(col(rankCol) <= quota)
  }

  /** Per-row weighted coin flip, derandomized: keep a row iff its hash
    * bucket (of 1e6) falls under `weight` ∈ [0,1] — inclusion probability
    * equals the weight across the id population, membership reproducible
    * across runs/engines. Weight is any deterministic Column (quality
    * score, length ramp, ...). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.filter(
      hashBucket(col(idCol), 1000000).cast("double") < weight * lit(1000000.0))

  /** Deterministic EPOCH SHARD PLACEMENT — the global training shuffle,
    * derandomized: every row lands in exactly one of `nshards` training
    * shards with a deterministic position inside it, and the whole
    * placement is a pure function of (id, epoch). shard =
    * H31("e<epoch>:" || id) mod nshards; pos = the row's 1-based rank
    * inside its shard by (hash, id). Reading shard files in pos order IS
    * the epoch's shuffled visit order: uniform, reproducible across runs,
    * partitionings, and engines (oracle-checkable), and a different epoch
    * seed re-permutes everything — no `orderBy(rand())`, whose output is
    * neither stable nor resumable.
    *
    * Scale shape: the hash and shard columns are embarrassingly parallel;
    * the ONLY exchange is one hash-partition on `shard`, and the per-shard
    * rank sorts each shard inside its own task — exactly the
    * repartition + sortWithinPartitions a shard-file writer pays anyway,
    * so the placement plan IS the export plan (write with
    * `.partitionBy(shard)` and the files come out in visit order). Shard
    * skew is hash-uniform (±√ over |corpus|/nshards); size `nshards` so a
    * shard fits one task (100 TB / 4096 shards ≈ 25 GB sorted spill-free
    * on a standard executor). */
  def epochShards(df: DataFrame, idCol: String, nshards: Int, epoch: Long,
      shardCol: String = "shard", posCol: String = "pos"): DataFrame = {
    require(nshards > 0, s"nshards must be positive, got $nshards")
    require(epoch >= 0, s"epoch must be non-negative, got $epoch")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col("__h"), col(idCol))
    df.withColumn("__h",
        Dedup.portableH31(concat(lit(s"e$epoch:"), col(idCol).cast("string"))))
      .withColumn(shardCol, pmod(col("__h"), lit(nshards.toLong)))
      .withColumn(posCol, row_number().over(w).cast("bigint"))
      .drop("__h")
  }

  /** LEAKAGE-SAFE train/val/test split: membership is decided by the
    * document's near-dup CLUSTER, not the document itself. A per-doc hash
    * split ([[split]]) routinely puts two near-duplicates on opposite
    * sides of the train/test fence — the classic eval-leakage bug: the
    * model "generalizes" to test docs it effectively saw in training.
    * Here every doc's bucket comes from its cluster representative (the
    * connected-component label over the near-dup pair graph; singletons
    * represent themselves), so a whole near-dup cluster moves as one unit
    * and no pair ever straddles a split boundary.
    *
    * `pairs` is any near-dup pair set — n-gram Jaccard
    * ([[Dedup.ngramJaccardPairs]]), MinHash-LSH, SemDeDup cosine pairs —
    * the split composes with whichever similarity the pipeline already
    * computes. Scale shape: components is the O(log n) star-contraction
    * ([[ConnectedComponents]]); the label join is one keyed shuffle of
    * (id, rep) pairs; membership stays a pure function of (pair graph,
    * id) — reproducible and oracle-checkable. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100 && trainPct > 0 && valPct >= 0)
    val comp = ConnectedComponents.components(pairs, aCol, bCol)
      .select(col("node").as(idCol), col("component").as("rep"))
    df.select(col(idCol)).join(comp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("rep"), col(idCol)).as("rep"))
      .transform(splitLabels("rep", trainPct, valPct))
  }

  /** The split's bucket arithmetic as a reusable projection: appends
    * (bucket, split) derived from `repCol` — shared by
    * [[leakageSafeSplit]] and its incremental form
    * [[incrementalLeakageSafeSplit]] so the two cannot drift. */
  def splitLabels(repCol: String, trainPct: Int = 80, valPct: Int = 10)
      (df: DataFrame): DataFrame = {
    require(trainPct + valPct < 100 && trainPct > 0 && valPct >= 0)
    df.withColumn("bucket", hashBucket(col(repCol)))
      .withColumn("split", when(col("bucket") < trainPct, "train")
        .when(col("bucket") < trainPct + valPct, "val").otherwise("test"))
  }

  /** Incremental leakage-safe split maintenance — the q118 composition:
    * [[ConnectedComponents.incrementalClusters]]' output (today's
    * assignments + the changed-prior delta) pushed through the SAME
    * bucket arithmetic as the static split. Today's docs land where their
    * (possibly merged) cluster representative hashes; prior docs in the
    * delta RE-hash on their NEW representative — when an edge merges two
    * clusters that sat on opposite sides of the train/test fence, the
    * whole merged cluster re-lands on ONE side (the new rep's), restoring
    * the no-straddle invariant a frozen split loses as the corpus grows.
    * Emits (doc_id, rep, scope, bucket, split); O(|today| + |delta|)
    * rows, never the corpus. */
  def incrementalLeakageSafeSplit(assignments: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    assignments
      .select(col("doc_id"), col("cluster_id").as("rep"), col("scope"))
      .transform(splitLabels("rep", trainPct, valPct))

  /** TOKEN-BUDGET MIXTURE — the composition control a pretraining run
    * actually specifies ("X tokens of web, Y of code"), not row counts:
    * per source, documents are taken in portable-hash order until the
    * source's token budget is exhausted — a doc is kept iff the cumulative
    * token count BEFORE it is under the budget (so the crossing doc is
    * kept and every budgeted source with enough mass reaches ≥ its
    * budget). Membership is a pure function of (id, token counts, budget):
    * reproducible across runs, partitionings, and engines.
    *
    * NOT the naive corpus-wide window. A per-source prefix sum with a
    * handful of sources would serialize the whole corpus through a few
    * window tasks; instead the hash range is RANGE-bucketed
    * (bucket = h / ceil(P31/nBuckets) — bucket order IS hash order, so
    * (bucket, h, id) ordering equals (h, id) ordering and the two-level
    * sum is exactly the global one):
    *   1. per (source, bucket) token totals — one map-side-combined agg;
    *   2. exclusive prefix offsets over the tiny (sources × nBuckets)
    *      frame — broadcast back;
    *   3. buckets whose offset already exceeds the budget are PRUNED
    *      before any sort (their every doc has cum_before ≥ offset ≥
    *      budget) — the corpus past the budget is never windowed, so the
    *      expensive stage reads ~budget worth of data, not the corpus;
    *   4. intra-bucket running sums in parallel across sources × buckets
    *      partitions, shifted by the bucket offset.
    * Emits (idCol, sourceCol, n_tokens, cum_tokens) for kept docs. */
  def tokenBudgetMixture(df: DataFrame, idCol: String, sourceCol: String,
      tokensCol: Column, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue, nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0), s"budgets must be >= 0")
    val P31 = 2147483647L
    val span = (P31 + nBuckets - 1) / nBuckets
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (k, b)) =>
      when(col(sourceCol) === k, b).otherwise(acc)
    }
    val base = df
      .withColumn("__h", Dedup.portableH31(col(idCol).cast("string")))
      .withColumn("__b", (col("__h") / lit(span)).cast("long"))
      .withColumn("n_tokens", tokensCol.cast("bigint"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col("__b"))
    val offsets = base.groupBy(col(sourceCol), col("__b"))
      .agg(sum("n_tokens").as("__bt"))
      .withColumn("__off", sum("__bt").over(wOff) - col("__bt"))
      .select(col(sourceCol), col("__b"), col("__off"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol), col("__b")).orderBy(col("__h"), col(idCol))
    base.join(broadcast(offsets), Seq(sourceCol, "__b"))
      .filter(col("__off") < budget) // bucket pruning — exact, see scaladoc
      .withColumn("cum_tokens", (col("__off") + sum("n_tokens").over(wIn)).cast("bigint"))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Deterministic epoch-weighted source MIXTURE — materializing "train on
    * source A for 2.5 epochs, B for 0.5, drop C" as row multiplicity: each
    * row is emitted floor(rate) times plus one more copy iff its
    * 1e6-bucket hash falls under frac(rate)·1e6, so a source's expected
    * multiplicity equals its rate and the EXACT copy count is a pure
    * function of the id — reproducible across runs, partitionings, and
    * engines (oracle-checkable), unlike `df.sample(withReplacement)`.
    * The `epoch` column (0-based copy index) distinguishes repeats so a
    * downstream shuffle/pack can salt on it.
    *
    * Scale: the rate table folds into a literal CASE (no join — mixture
    * tables are human-sized), copies explode from a per-row sequence:
    * NO shuffle, embarrassingly parallel, output rows ≈ Σ rate·|source|.
    * Rates quantized to 1e-6; unlisted sources use `defaultRate`. */
  def sourceMixture(df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      epochCol: String = "epoch"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1000),
      s"rates must be in [0, 1000], got $rates / default $defaultRate")
    def quant(r: Double): (Long, Long) = {
      val micro = math.round(r * 1e6)
      (micro / 1000000L, micro % 1000000L)
    }
    val (defWhole, defFrac) = quant(defaultRate)
    val (whole, frac) = rates.foldLeft((lit(defWhole), lit(defFrac))) {
      case ((w, f), (k, r)) =>
        val (qw, qf) = quant(r)
        (when(col(sourceCol) === k, qw).otherwise(w),
          when(col(sourceCol) === k, qf).otherwise(f))
    }
    val copies = whole + when(hashBucket(col(idCol), 1000000) < frac, 1L).otherwise(0L)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn(epochCol, explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }
}
