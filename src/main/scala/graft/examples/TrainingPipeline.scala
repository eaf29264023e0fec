package graft.examples

import graft.functions.TextFunctions._
import graft.multimodal.MultimodalOps
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline over the synthetic corpus: the flow a
  * 100 TB ingest would run, at demo scale.
  *
  *   documents → exact dedup → near-dup pruning (MinHash-LSH candidates,
  *   exact-Jaccard verify) → quality/lang filtering → fingerprints →
  *   multimodal pack + feature kernels → ANN neighbours of the survivors.
  *
  * {{{ sbt "runMain graft.examples.TrainingPipeline [sfDir]" }}}
  */
object TrainingPipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").appName("training-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"ingest: ${docs.count()} docs")

    // 1. exact dedup (content hash). Persisted: three downstream consumers
    // (LSH candidates, Jaccard verify, the anti-join) would otherwise each
    // re-run the dedup lineage — the same persist a production pipeline
    // would place at every fan-out point.
    val exact = Dedup.dropExactDuplicates(docs, "doc_id", "text").persist()
    println(s"after exact dedup: ${exact.count()}")

    // 2. near-dup pruning: LSH candidates, verified by exact Jaccard ≥ 0.5;
    //    drop the higher doc_id of each verified pair
    val candidates = Dedup.minHashLshCandidates(exact, "doc_id", "text", n = 3, k = 64, bands = 32)
    val verified = Dedup.ngramJaccardPairs(exact, "doc_id", "text", n = 3, minJaccard = 0.5)
      .join(candidates, Seq("id_a", "id_b"), "left_semi")
    val losers = verified.select(col("id_b").as("doc_id")).distinct().persist()
    val nearDeduped = exact.join(losers, Seq("doc_id"), "left_anti")
    println(s"after near-dup pruning: ${nearDeduped.count()} (dropped ${losers.count()})")

    // 3. quality + language gate (fan-out point: fingerprints + multimodal)
    val gated = nearDeduped
      .withColumn("quality", qualityScore(col("text")))
      .withColumn("lang_pred", langId(col("text")))
      .filter(col("quality") > 0.3 && col("lang_pred") =!= "unknown")
      .persist()
    println(s"after quality/lang gate: ${gated.count()}")

    // 4. fingerprints for downstream exact lookup
    val finger = gated.select(col("doc_id"), contentHash(col("text")).as("content_hash"),
      minTokenHash(col("text")).as("vocab_fp"))
    println(s"fingerprints: ${finger.count()}")

    // 5. multimodal pack + per-partition kernels
    val media = MultimodalOps.toMediaDataset(MultimodalOps.packDocuments(gated))
    val features = MultimodalOps.extractFeatures(media, dim = 16)
    println(s"media features: ${features.count()} (image metas: " +
      s"${MultimodalOps.decodeImageMeta(media).count()})")

    // 6. ANN neighbours over the embeddings table (IVF)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val ann = Similarity.ivfTopK(emb, emb.limit(10), "vec_id", "embedding",
      k = 3, ncells = 8, nprobe = 2, iters = 1)
    println("sample ANN neighbours:")
    ann.show(9, false)
    spark.stop()
  }
}
