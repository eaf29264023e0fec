package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data generator: synthesizes an sf1-scale dataset by writing
  * `factor` disjoint replicas of an sf0.1 source dir (the driver only
  * generates up to sf0.1 locally — this exists solely to measure how the
  * engine's heaviest queries scale one decade past the gate SF; it is NOT
  * a gate input).
  *
  * Construction preserves the statistics that drive each heavy query's
  * cost model, rather than naively duplicating rows (naive duplication
  * would plant an artificial 10-clique of exact/near duplicates on every
  * row and force any pair-enumerating operator quadratically — measuring
  * the data, not the engine):
  *  - orders: primary key remapped per replica (k + i·span); all other
  *    columns as-is. The q43/q74/q78 changelog derives from the key, so
  *    replicas contribute disjoint key ranges.
  *  - documents: doc_id remapped; replica i > 0 prefixes every token with
  *    "r<i>" — within-replica shingle/near-dup structure is identical to
  *    the source, cross-replica shingles can never match → pair density
  *    scales linearly like a real corpus, not quadratically like copies.
  *  - embeddings: vec_id remapped; replica i > 0 gets fresh deterministic
  *    pseudo-random unit vectors (xxhash64-seeded components, normalized)
  *    — matching the source corpus's near-random geometry, so cell
  *    occupancy grows linearly and no artificial sim≈1 pairs appear.
  *
  * Usage: runMain graft.tools.Sf1Gen [srcDir] [dstDir] [factor] */
object Sf1Gen {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String, remap: (DataFrame, Int, Long) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val keyCol = Map("orders" -> "o_orderkey", "documents" -> "doc_id",
        "embeddings" -> "vec_id")(name)
      // disjoint id spans per replica: span = next power of 10 above max
      val maxKey = base.agg(max(col(keyCol))).head().getLong(0)
      var span = 1L
      while (span <= maxKey) span *= 10
      val out = (0 until factor).map(i => remap(base, i, span)).reduce(_.unionAll(_))
      // spread over many files so the probe reads multi-split inputs like
      // a real warehouse table (not one 5 MB file = one task)
      out.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"SF1GEN $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    replicate("orders", (df, i, span) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * span)))

    replicate("documents", (df, i, span) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * span))
        .withColumn("text",
          if (i == 0) col("text")
          else concat_ws(" ", transform(split(col("text"), " "),
            t => concat(lit(s"r$i"), t)))))

    replicate("embeddings", (df, i, span) => {
      val d = df.withColumn("vec_id", col("vec_id") + lit(i * span))
      if (i == 0) d
      else {
        val dim = df.select(size(col("embedding"))).head().getInt(0)
        // deterministic pseudo-random components in [-1, 1), then normalize
        val raw = transform(sequence(lit(0), lit(dim - 1)), j =>
          (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(2000001L)) - 1000000L)
            .cast("double") / 1000000.0)
        val n = sqrt(aggregate(raw, lit(0.0), (a, x) => a + x * x))
        d.withColumn("embedding",
          transform(raw, x => (x / n).cast("float")))
      }
    })
    spark.stop()
  }
}
