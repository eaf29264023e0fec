package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry: time selected queries twice in one JVM to
  * separate codegen/JIT warmup from steady-state compute.
  * {{{ sbt "runMain graft.tools.Profile q30_ngram_jaccard_pairs ..." }}} */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"PROFILE $name run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
