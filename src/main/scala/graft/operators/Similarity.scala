package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over embedding columns (array<float>).
  *
  * Two tiers, mirroring how ANN is actually deployed at 100 TB:
  *  - exact brute-force top-k (the baseline + the per-bucket verifier),
  *    expressed with higher-order functions so the dot product stays in
  *    whole-stage codegen;
  *  - IVF (inverted-file) index: centroids learned with distributed
  *    k-means iterations, vectors partitioned by nearest centroid, queries
  *    probe only `nprobe` cells — the candidate set shrinks by
  *    ncells/nprobe, and the centroid table is broadcast (never shuffled).
  */
object Similarity {

  /** Plain double dot product of two array<float> columns (codegen hot path). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, t) => acc + t)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column, n2a: Column, n2b: Column): Column =
    dot(a, b) / (sqrt(n2a) * sqrt(n2b))

  /** Exact quantized dot product: each component is quantized to
    * floor(x · 2^24) — floor of an exact power-of-two-scaled double is
    * bit-deterministic in every engine (unlike double↔decimal conversions,
    * which differ at the last ulp between shortest-repr and exact-binary
    * implementations) — then summed as 64-bit integers (order-free, exact).
    * |xi| ≤ 2^24 → products ≤ 2^48, 64-term sums ≤ 2^54: ANSI-safe. */
  def dotQuantized(a: Column, b: Column): Column = {
    val S = lit(16777216.0) // 2^24
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast("double") * S) * floor(y.cast("double") * S)),
      lit(0L), (acc, t) => acc + t)
  }

  /** Brute-force dot-product top-k (embeddings are unit-normalized, so dot
    * IS cosine — the standard retrieval formulation). `score_q` is the
    * exact integer quantized dot (hash-identical across engines); ranking
    * is (score_q desc, cid). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c).filter(col("qid") =!= col("cid"))
      .withColumn("score_q", dotQuantized(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("score_q").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("score_q"))
  }

  // -------------------------------------------------------------------------
  // IVF
  // -------------------------------------------------------------------------

  /** Learn `ncells` centroids by distributed k-means (Lloyd iterations as
    * DataFrame ops). Seeds = the `ncells` lowest-id vectors (deterministic).
    * Each iteration: broadcast centroids, assign by max cosine, average.
    * Returns (cell, centroid array<double>). */
  def ivfCentroids(emb: DataFrame, idCol: String, vecCol: String,
      ncells: Int, iters: Int = 2): DataFrame = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    var centroids = emb.orderBy(idCol).limit(ncells)
      .select((row_number().over(Window.orderBy(idCol)) - 1).as("cell"),
        transform(col(vecCol), _.cast("double")).as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assignCells(emb, idCol, vecCol, centroids)
      centroids = assigned
        .select(col("cell"), posexplode(col(vecCol)))
        .groupBy("cell", "pos").agg(avg(col("col").cast("double")).as("m"))
        .groupBy("cell").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), x => x.getField("m")).as("centroid"))
    }
    centroids
  }

  /** Assign every vector to its max-cosine cell (ties → lowest cell id).
    * Centroid table is tiny → broadcast cross join; the argmax is a hash
    * aggregation over max(struct(sim, −cell, payload)) — no sort, map-side
    * partial, one shuffle on the vector id. Returns (idCol, vecCol, cell). */
  def assignCells(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val scored = emb.select(col(idCol), col(vecCol)).crossJoin(broadcast(centroids))
      .withColumn("__sim", dot(col(vecCol), col("centroid")) / sqrt(norm2(col("centroid"))))
    scored.groupBy(idCol)
      .agg(max(struct(col("__sim").as("s"), (-col("cell")).as("negc"),
        col("cell").as("cell"), col(vecCol).as("v"))).as("m"))
      .select(col(idCol), col("m.v").as(vecCol), col("m.cell").as("cell"))
  }

  /** IVF ANN: probe the `nprobe` nearest cells per query, exact cosine only
    * inside those cells. corpus-side assignment is computed once (in a real
    * pipeline: persisted/bucketed by cell). */
  def ivfTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, ncells: Int, nprobe: Int, iters: Int = 2): DataFrame = {
    val centroids = ivfCentroids(emb, idCol, vecCol, ncells, iters)
    val corpusCells = assignCells(emb, idCol, vecCol, centroids)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"), col("cell"))
      .withColumn("cn2", norm2(col("cv")))
    // query → nprobe candidate cells
    val qScored = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", dot(col("qv"), col("centroid")) / sqrt(norm2(col("centroid"))))
    val wq = Window.partitionBy("qid").orderBy(col("__sim").desc, col("cell"))
    val qCells = qScored.withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nprobe).select(col("qid"), col("qv"), col("cell"))
      .withColumn("qn2", norm2(col("qv")))
    val scored = qCells.join(corpusCells, "cell").filter(col("qid") =!= col("cid"))
      .withColumn("score", dot(col("qv"), col("cv")) / (sqrt(col("qn2")) * sqrt(col("cn2"))))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("score"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * IVF-blocked (pairs only compared within a cell — the standard
    * embedding-dedup recipe; same-cell misses are the recall tradeoff). */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      minSim: Double, ncells: Int = 16): DataFrame = {
    val centroids = ivfCentroids(emb, idCol, vecCol, ncells)
    val cells = assignCells(emb, idCol, vecCol, centroids)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("cell"))
      .withColumn("n2", norm2(col("v")))
    cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("sim",
        dot(col("a.v"), col("b.v")) / (sqrt(col("a.n2")) * sqrt(col("b.n2"))))
      .filter(col("sim") >= minSim)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("sim"))
  }
}
