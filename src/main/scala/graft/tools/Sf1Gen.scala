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
  * Round 7 extends the probe to the FULL battery, so every table is
  * replicated — fact tables get disjoint key spans with FK-consistent
  * remaps (lineitem.l_orderkey follows orders.o_orderkey, l_partkey /
  * l_suppkey follow part / supplier, o_custkey follows customer, so join
  * selectivities and per-key group sizes are preserved at 10× cardinality),
  * while the tiny dimensions region/nation are copied as-is (dimension
  * tables don't scale with fact data in a real warehouse either; nation
  * FKs on customer/supplier stay valid unchanged).
  *
  * Usage: runMain graft.tools.Sf1Gen [srcDir] [dstDir] [factor] [tables]
  * `tables` (comma-separated, default all) restricts generation — e.g. the
  * sf10 q141 probe needs only `orders` and skips the 60M-row lineitem. */
object Sf1Gen {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val only: Option[Set[String]] = args.lift(3).map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // events.ts physical type varies by round (TESTDATA.md): NANOS reads
      // as BIGINT via nanosAsLong (replica written back as plain INT64);
      // MICROS must read as TimestampType — NTZ inference OFF, exactly as
      // Tables.t loads it. Without the second conf a micros source
      // round-trips as TIMESTAMP_NTZ with Spark row metadata pinning the
      // type, and Tables.t's unix_micros normalization then fails on the
      // replica (r8: q84/q89/q90 errored at sf1 on exactly this).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // disjoint id spans per replica: span = next power of 10 above max.
    // Spans are computed ONCE per key domain so foreign keys remap with
    // exactly the same offset as the primary keys they reference.
    def spanOf(name: String, keyCol: String): Long = {
      val maxKey = spark.read.parquet(s"$src/$name.parquet")
        .agg(max(col(keyCol).cast("long"))).head().getLong(0)
      var span = 1L
      while (span <= maxKey) span *= 10
      span
    }
    val custSpan = spanOf("customer", "c_custkey")
    val suppSpan = spanOf("supplier", "s_suppkey")
    val partSpan = spanOf("part", "p_partkey")
    val ordSpan = spanOf("orders", "o_orderkey")

    def wanted(name: String): Boolean = only.forall(_.contains(name))

    def write(name: String, out: DataFrame): Unit = {
      if (!wanted(name)) return
      // spread over many files so the probe reads multi-split inputs like
      // a real warehouse table (not one 5 MB file = one task)
      out.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"SF1GEN $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    def replicate(name: String)(remap: (DataFrame, Int) => DataFrame): Unit = {
      if (!wanted(name)) return
      val base = spark.read.parquet(s"$src/$name.parquet")
      write(name, (0 until factor).map(i => remap(base, i)).reduce(_.unionAll(_)))
    }

    // tiny dimensions: copied, not replicated (their FKs stay valid)
    Seq("region", "nation").foreach { name =>
      write(name, spark.read.parquet(s"$src/$name.parquet"))
    }

    replicate("customer") { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * custSpan))
    }
    replicate("supplier") { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppSpan))
    }
    replicate("part") { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * partSpan))
    }
    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordSpan))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custSpan))
    }
    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * ordSpan))
        .withColumn("l_partkey", col("l_partkey") + lit(i * partSpan))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppSpan))
    }

    // events: ids remapped per replica; ts kept as-is, so the same time
    // range holds 10× the events — a 10×-throughput stream, which is what
    // scaling an event table means (sessionize/window group sizes grow 10×
    // per user only if user_id were shared; remapping user_id keeps
    // per-user session shape constant and user count ×10, like real growth)
    val evSpan = spanOf("events", "event_id")
    val userSpan = spanOf("events", "user_id")
    replicate("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * evSpan))
        .withColumn("user_id", col("user_id") + lit(i * userSpan))
    }

    val docSpan = spanOf("documents", "doc_id")
    replicate("documents") { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * docSpan))
        .withColumn("text",
          if (i == 0) col("text")
          else concat_ws(" ", transform(split(col("text"), " "),
            t => concat(lit(s"r$i"), t))))
    }

    val vecSpan = if (wanted("embeddings")) spanOf("embeddings", "vec_id") else 0L
    val dim = if (!wanted("embeddings")) 0 else spark.read.parquet(s"$src/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    replicate("embeddings") { (df, i) =>
      val d = df.withColumn("vec_id", col("vec_id") + lit(i * vecSpan))
      if (i == 0) d
      else {
        // deterministic pseudo-random components in [-1, 1), then normalize
        val raw = transform(sequence(lit(0), lit(dim - 1)), j =>
          (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(2000001L)) - 1000000L)
            .cast("double") / 1000000.0)
        val n = sqrt(aggregate(raw, lit(0.0), (a, x) => a + x * x))
        d.withColumn("embedding",
          transform(raw, x => (x / n).cast("float")))
      }
    }
    spark.stop()
  }
}
