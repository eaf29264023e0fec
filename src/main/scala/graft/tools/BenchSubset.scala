package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run a subset of gate queries in ONE JVM in order, timing each —
  * for isolating cross-query bench-context effects (broadcast/GC buildup).
  * Usage: runMain graft.tools.BenchSubset <sfDir> <q1> <q2> ...
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gcBetween = sys.env.get("BENCH_GC").contains("1")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"$n%-35s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$rows")
      if (gcBetween) { spark.catalog.clearCache(); System.gc() }
    }
    spark.stop()
  }
}
