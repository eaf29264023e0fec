package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Scale-probe companion (dev tool): demonstrates that q39/q81's
  * super-linear sf1 scaling is the FIXED ncells=32 parameter, not the
  * operator — holding per-cell occupancy constant (ncells ∝ corpus)
  * restores linear cost, which is how an IVF-blocked pair enumeration is
  * actually deployed at scale.
  * Usage: runMain graft.tools.Sf1Extras <sf0.1Dir> <sf1Dir> */
object Sf1Extras {
  def main(args: Array[String]): Unit = {
    val sf01 = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val sf1 = args.lift(1).getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SF1EXTRA $label ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    def pairs(dir: String, ncells: Int): Long =
      Similarity.cosineNearDupPairsPortable(
        spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        minSim = 0.35, ncells = ncells).count()
    // warm-up (codegen/JIT)
    pairs(sf01, 32)
    time("pairs sf0.1 ncells=32 (gate shape)")(pairs(sf01, 32))
    time("pairs sf1   ncells=32 (fixed param: cells 10x fatter)")(pairs(sf1, 32))
    time("pairs sf1   ncells=320 (per-cell occupancy held constant)")(pairs(sf1, 320))
    spark.stop()
  }
}
