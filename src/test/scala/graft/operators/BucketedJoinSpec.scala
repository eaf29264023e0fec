package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The co-located-join recipe for repeated large joins at 100 TB: bucket
  * both fact tables by the join key at write time; Spark then joins them
  * with NO shuffle exchange — the bucket layout IS the partitioning. This
  * spec pins the plan shape so a regression (bucketing not picked up,
  * exchange reintroduced) fails loudly. */
class BucketedJoinSpec extends SparkSpec {

  test("join of tables bucketed on the key runs without a shuffle exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    // and it still computes the right thing
    val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = joined.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === expect)
  }

  test("ensureBucketed with an explicit location writes the layout THERE, and a fresh catalog entry reads it back shuffle-free") {
    val lake = java.nio.file.Files.createTempDirectory("graft_lake_").toString
    val loc = lake + "/orders_by_key"
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val name = BucketedOps.ensureBucketed(o, "lake-orders", "o_orderkey", 8,
      location = Some(loc))
    // the files live at the caller's path — the durable-lake contract a
    // production ingest needs (createTempDirectory is only the None default)
    val files = new java.io.File(loc).listFiles()
    assert(files != null && files.exists(_.getName.endsWith(".parquet")),
      s"no parquet files at explicit location $loc")
    // same id+location → cached, same table
    assert(BucketedOps.ensureBucketed(o, "lake-orders", "o_orderkey", 8,
      location = Some(loc)) === name)
    // the layout is usable as a bucketed table: per-key agg with no shuffle
    val agg = spark.table(name).groupBy("o_orderkey")
      .agg(sum("o_totalprice").as("t"))
    val plan = agg.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed layout at explicit location must not shuffle:\n$plan")
    assert(agg.count() === o.select("o_orderkey").distinct().count())

    // a LATER "session" (different cache identity: different id) over the
    // same location must REGISTER the existing layout, not re-ingest it —
    // a rewrite would clobber files under the first table's feet
    val parts = new java.io.File(loc).listFiles().filter(_.getName.startsWith("part-"))
    val mtimes = parts.map(f => f.getName -> f.lastModified()).toMap
    val name2 = BucketedOps.ensureBucketed(o, "lake-orders-second-life", "o_orderkey", 8,
      location = Some(loc))
    assert(name2 !== name)
    val after = new java.io.File(loc).listFiles().filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after === mtimes, "existing durable layout must not be rewritten")
    // and the registered table still plans bucketed (no shuffle, same rows)
    val agg2 = spark.table(name2).groupBy("o_orderkey")
      .agg(sum("o_totalprice").as("t"))
    assert(!agg2.queryExecution.executedPlan.toString().contains("Exchange hashpartitioning"),
      "registered layout must keep the bucketed plan")
    assert(agg2.count() === agg.count())

    // a registration that disagrees with the ingested spec must FAIL LOUDLY
    // (wrong bucket count or key would silently drop join matches)
    intercept[IllegalArgumentException](
      BucketedOps.ensureBucketed(o, "lake-orders-wrong-buckets", "o_orderkey", 16,
        location = Some(loc)))
    intercept[IllegalArgumentException](
      BucketedOps.ensureBucketed(o, "lake-orders-wrong-key", "o_totalprice", 8,
        location = Some(loc)))
    // ...as must registering a directory of unknown (manifest-less) parquet
    val bare = java.nio.file.Files.createTempDirectory("graft_bare_").toString + "/t"
    o.write.mode("overwrite").parquet(bare)
    intercept[IllegalArgumentException](
      BucketedOps.ensureBucketed(o, "lake-orders-bare", "o_orderkey", 8,
        location = Some(bare)))
  }
}
