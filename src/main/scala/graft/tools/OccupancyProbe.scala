package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measures the invariant [[Similarity.autoCells]] exists to hold: per-cell
  * occupancy (and so candidate-pair counts) stays FLAT from sf0.1 to sf1
  * when the cell count scales with the corpus, where a pinned ncells grows
  * occupancy linearly and pairs quadratically (SCALE_PROBE_sf1.md footnote).
  * For each dir it reports, at both the pinned gate value (32) and the
  * auto default: cell count, mean/max occupancy, and Σ n_c·(n_c−1)/2
  * within-cell candidate pairs.
  * Usage: runMain graft.tools.OccupancyProbe <sf0.1Dir> <sf1Dir> */
object OccupancyProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    dirs.foreach { dir =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      // the pair-enumeration operating point — this probe audits the
      // dedup-family shape, whose per-cell cost is quadratic
      val auto = Similarity.autoCells(n, Similarity.PairOccupancy)
      Seq("pinned" -> 32, "auto" -> auto).foreach { case (label, nc) =>
        val cents = Similarity.ivfCentroidsPortable(emb, "vec_id", "embedding", nc)
        val occ = Similarity.assignCellsPortable(emb, "vec_id", "embedding", cents)
          .groupBy("cell").count()
        val row = occ.agg(count(lit(1)).as("cells"), avg("count").as("mean"),
          max("count").as("max"),
          sum((col("count") * (col("count") - 1) / 2).cast("long")).as("pairs")).head()
        println(f"OCCUPANCY $dir%-22s n=$n%7d $label%-6s ncells=$nc%4d " +
          f"live_cells=${row.getLong(0)}%4d mean_occ=${row.getDouble(1)}%9.1f " +
          f"max_occ=${row.getLong(2)}%6d cand_pairs=${row.getLong(3)}%d")
      }
    }
    spark.stop()
  }
}
