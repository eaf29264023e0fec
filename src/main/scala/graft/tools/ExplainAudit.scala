package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: print formatted physical plans for selected gate queries so
  * pushdown / broadcast / codegen can be reviewed.
  * {{{ sbt "runMain graft.tools.ExplainAudit q02_selective_filter_agg" }}} */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_selective_filter_agg", "q03_join_topk", "q05_multiway_join")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
