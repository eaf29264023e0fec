package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch stage-timing probe for q35 (IVF). */
object Q35Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    time("warm count")(e.count())
    // full query twice
    (1 to 2).foreach { i =>
      time(s"full ivfTopK #$i")(Similarity.ivfTopK(e, e.filter(col("vec_id") < 50),
        "vec_id", "embedding", k = 3, ncells = 8, nprobe = 2, iters = 1).count())
    }
    val t0 = System.nanoTime()
    val cents = time("ivfCentroids")(Similarity.ivfCentroids(e, "vec_id", "embedding", 8, 1))
    time("centroids.count")(cents.count())
    val cells = time("assignCells build+count")(
      Similarity.assignCells(e, "vec_id", "embedding", cents).count())
    println(s"total breakdown: ${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
