package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measures the stored-index incremental-ANN DAILY LEG's dependence on the
  * prior-corpus size (round-10 ask: "an sf1 point showing the daily leg's
  * cost independent of |prior|"): with |today| and the query set FIXED,
  * the daily leg over a 4× larger stored prior index must pay the same
  * assignment cost — only the probed-cell candidate scan (nprobe/ncells of
  * the index) may grow. Contrast row: the from-documents form, which
  * re-trains and re-assigns the prior corpus inline every run (the
  * O(|prior|) term the stored path removes).
  *
  * Index builds happen OUTSIDE the timed region (they are generation-time
  * ingest, amortized), exactly as q104's gate harness does.
  * Usage: runMain graft.tools.Q104Probe <sfDir> [reps] */
object Q104Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.t(spark, dir, "embeddings")
    val today = e.filter(col("vec_id") % 6 === 1) // 1/6 corpus, FIXED
    val qs = e.filter(col("vec_id") < 50)

    def storedIndex(prior: DataFrame, tag: String): (DataFrame, DataFrame) = {
      val cents = Similarity.ivfCentroidsPortable(prior, "vec_id", "embedding",
        ncells = 8, iters = 1)
      val cells = Similarity.assignCellsPortable(prior, "vec_id", "embedding", cents)
      val base = java.nio.file.Files.createTempDirectory(s"q104probe_$tag")
      graft.queries.Fixtures.deleteTreeOnExit(base)
      cents.write.mode("overwrite").parquet(s"$base/cent")
      cells.write.mode("overwrite").parquet(s"$base/idx")
      (spark.read.parquet(s"$base/cent"), spark.read.parquet(s"$base/idx"))
    }
    val priorSmall = e.filter(col("vec_id") % 6 === 0)                    // 1/6
    val priorLarge = e.filter((col("vec_id") % 6).isin(0, 2, 4, 5))       // 4/6
    val nS = priorSmall.count(); val nL = priorLarge.count(); val nT = today.count()
    println(s"Q104PROBE sizes: prior_small=$nS prior_large=$nL (4x) today=$nT (fixed)")
    val (centS, idxS) = storedIndex(priorSmall, "small")
    val (centL, idxL) = storedIndex(priorLarge, "large")

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        spark.catalog.clearCache(); System.gc()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"Q104PROBE $label min=${ts.map(_._1).min}%6.2f s  " +
        f"(all: ${ts.map(t => f"${t._1}%.2f").mkString(", ")}; ${ts.head._2} rows)")
    }
    def daily(cent: DataFrame, idx: DataFrame): Long =
      Similarity.ivfAppendTopKPortableStored(cent, idx, today, qs,
        "vec_id", "embedding", k = 3, nprobe = 2).count()
    // warm-up (codegen/JIT), not timed
    daily(centS, idxS)
    time("daily_leg prior=1/6 (stored)")(daily(centS, idxS))
    time("daily_leg prior=4/6 (stored, 4x prior)")(daily(centL, idxL))
    time("from_documents prior=4/6 (inline re-train+re-assign)")(
      Similarity.ivfAppendTopKPortable(priorLarge, today, qs,
        "vec_id", "embedding", k = 3, ncells = 8, nprobe = 2, iters = 1).count())
    spark.stop()
  }
}
