package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of one gate query
  * (and optionally times it). Usage:
  *   runMain graft.tools.ExplainQuery <queryName> [sfDir] [--time]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val sfDir = args.drop(1).headOption.filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.contains("--time")) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"rows=$n elapsed=${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
