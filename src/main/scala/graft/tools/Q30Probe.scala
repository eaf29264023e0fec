package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Scratch stage-timing probe for q30 (kept out of the gate; dev tool). */
object Q30Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val sh = df.select(col("doc_id").as("id"),
        explode(wordShingles(col("text"), 3)).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
    time("sh.count")(println(sh.count()))
    val shc = sh.cache()
    time("sh.cache.count")(println(shc.count()))
    val pairsCached = shc.as("a").join(shc.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    time("pairs-from-cached.count")(println(pairsCached.count()))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    time("pairs-uncached.count")(println(pairs.count()))
    val shR = sh.repartition(col("h"))
    val pairsR = shR.as("a").join(shR.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    time("pairs-repartitioned.count")(println(pairsR.count()))
    time("pairs-repartitioned-again.count")(println(pairsR.count()))
    spark.stop()
  }
}
