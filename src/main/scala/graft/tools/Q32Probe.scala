package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch probe decomposing q32's per-run cost (dev tool, off the gate):
  * is the ~3 s at sf0.1 the crossJoin scoring, the top-k window, or
  * fixed per-job overhead? Times each piece twice in one JVM. */
object Q32Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"PROBE $label run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val S = lit(16777216.0)
    val quant = (v: org.apache.spark.sql.Column) =>
      transform(v, x => floor(x.cast("double") * S).cast("long"))
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), quant(col("embedding")).as("qa"))
    val c = e.select(col("vec_id").as("cid"), quant(col("embedding")).as("ca"))
    val dim = 64
    val scoreExpr = (1 to dim).map(i =>
      element_at(col("qa"), i) * element_at(col("ca"), i)).reduce(_ + _)

    time("0 bare count of embeddings")(e.count())
    time("1 quantize corpus only")(c.count())
    time("2 crossJoin no score")(
      q.crossJoin(c).filter(col("qid") =!= col("cid")).count())
    val scored = q.crossJoin(c).filter(col("qid") =!= col("cid"))
      .withColumn("score_q", scoreExpr)
    time("3 crossJoin + score agg")(scored.agg(sum("score_q")).collect())
    val w = Window.partitionBy("qid").orderBy(col("score_q").desc, col("cid"))
    val full = scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"), col("rank"), col("score_q"))
    time("4 full q32 shape")(full.count())
    time("5 via SparkEntry")(
      graft.SparkEntry.queries("q32_embedding_topk")(spark, sfDir).count())

    // variant A: constant-key equi join → BroadcastHashJoin (codegen-able)
    val qk = q.withColumn("__k", lit(1))
    val ck = c.withColumn("__k", lit(1))
    val scoredA = qk.join(broadcast(ck), "__k").drop("__k")
      .filter(col("qid") =!= col("cid"))
      .withColumn("score_q", scoreExpr)
    val fullA = scoredA.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"), col("rank"), col("score_q"))
    time("6 constant-key BHJ variant")(fullA.count())

    // variant B: repartitioned stream side (parallel BNLJ tasks)
    val scoredB = q.repartition(32).crossJoin(broadcast(c))
      .filter(col("qid") =!= col("cid")).withColumn("score_q", scoreExpr)
    val fullB = scoredB.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"), col("rank"), col("score_q"))
    time("7 repartitioned BNLJ variant")(fullB.count())

    println("---- plan of constant-key variant ----")
    fullA.explain("formatted")
    spark.stop()
  }
}
