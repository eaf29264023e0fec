package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: phase timings of q73 (file-provider table write vs source
  * read) to locate fixed costs. */
object Q73Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val root = tm("write table")(graft.queries.CdcQueries.writeFileProviderTable(spark, dir))
    val df = spark.read.format("cdc-log").option("path", root)
      .option("scan.incremental.snapshot.chunk.size", "12000").load()
    tm("plan + first count")(df.count())
    tm("second count")(df.count())
    spark.stop()
  }
}
