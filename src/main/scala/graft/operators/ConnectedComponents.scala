package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step of a near-dup pipeline: LSH/Jaccard emits PAIRS, but dedup needs
  * CLUSTERS (keep one doc per component, drop the rest).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges in
  * O(log² n) rounds on any graph (O(log n) in practice), unlike plain
  * min-label propagation whose round count is the graph DIAMETER (a
  * 10M-node chain would need 10M shuffles; star operations contract
  * chains exponentially).
  *
  * Scale design:
  *   - Each round is two groupBy-min shuffles and two joins keyed on node
  *     id — no collect_list, so a hot node (one doc near-duplicated a
  *     million times) never materializes its neighborhood in one row; the
  *     min aggregates partially map-side.
  *   - `localCheckpoint` truncates the lineage each round — without it the
  *     plan doubles per iteration and Catalyst analysis time explodes
  *     (classic iterative-DataFrame trap).
  *   - Fixpoint detection compares (count, xxhash64-sum) of the edge set —
  *     one cheap aggregate per round instead of an except().isEmpty
  *     anti-join. Collision odds are ~2⁻⁶⁴ per round; the hard `maxRounds`
  *     cap bounds the worst case and throws rather than looping forever.
  */
object ConnectedComponents {

  /** (node, component) for every node in `edges`, component = min node id
    * reachable. Input: two columns (src, dst), any integral type; self
    * loops and duplicates tolerated. */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    // canonical undirected edge set (u < v), bigint nodes
    var e = edges
      .select(col(srcCol).cast("bigint").as("u"), col(dstCol).cast("bigint").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()

    var sig = signature(e)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == sig
      e = next; sig = nextSig; rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds")
    // at fixpoint the edge set is a star forest: (member, center) with
    // center = component min. Centers themselves get a self row.
    e.select(col("v").as("node"), col("u").as("component"))
      .union(e.select(col("u").as("node"), col("u").as("component")))
      .distinct()
  }

  /** Cluster assignment for near-dup pairs: (id, cluster_id, keep) where
    * cluster_id = min doc id in the component and keep marks the one
    * canonical doc per cluster. */
  def dedupClusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    components(pairs, aCol, bCol)
      .select(col("node").as("id"), col("component").as("cluster_id"),
        (col("node") === col("component")).as("keep"))

  /** large-star: every node u links its LARGER neighbors to the minimum of
    * its closed neighborhood. Two shuffles: groupBy(u).min, join on u. */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = bothDirections(e)
    val mins = nbrs.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))
    nbrs.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(least(col("v"), col("m")).as("u"), greatest(col("v"), col("m")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** small-star: every node u links its SMALLER-or-equal neighbors (and
    * itself) to the minimum among them. */
  private def smallStar(e: DataFrame): DataFrame = {
    val nbrs = bothDirections(e).filter(col("v") < col("u"))
    val mins = nbrs.groupBy("u").agg(min(col("v")).as("m"))
    nbrs.join(mins, "u")
      .select(col("v"), col("m"))
      .union(mins.select(col("u").as("v"), col("m")))
      .filter(col("v") =!= col("m"))
      .select(least(col("v"), col("m")).as("u"), greatest(col("v"), col("m")).as("v"))
      .distinct()
  }

  private def bothDirections(e: DataFrame): DataFrame =
    e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))

  /** One-aggregate fingerprint of an edge set (order-independent; bit_xor
    * can't overflow, unlike a sum under ANSI arithmetic). */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
