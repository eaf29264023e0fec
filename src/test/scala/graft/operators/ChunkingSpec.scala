package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Context-window chunking invariants: coverage (every token appears in
  * some chunk), overlap (consecutive chunks share exactly `overlap`
  * tokens until the tail), reconstruction (stride-prefixes reassemble the
  * doc), edges (short doc → one chunk), and the scale contract (single
  * projection, no shuffle, no UDF). */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int): String = (0 until n).map(i => s"t$i").mkString(" ")

  test("windows cover every token with exact overlap; no redundant suffix windows") {
    val df = Seq((1L, doc(150))).toDF("doc_id", "text")
    val chunks = Chunking.chunkDocs(df, "doc_id", "text", maxTokens = 64, overlap = 16)
      .orderBy("chunk_idx").collect()
    // starts 0, 48, 96 (144 would be dropped: 144 ≥ 150−16 → covered by 96's
    // window through token 149); lengths 64, 64, 54
    assert(chunks.map(_.getAs[Long]("start_tok")).toSeq === Seq(0L, 48L, 96L))
    assert(chunks.map(_.getAs[Long]("n_tokens")).toSeq === Seq(64L, 64L, 54L))
    val texts = chunks.map(_.getAs[String]("chunk_text").split(" ").toSeq)
    // overlap: chunk i's last 16 tokens == chunk i+1's first 16 (when full)
    assert(texts(0).takeRight(16) === texts(1).take(16))
    // coverage + reconstruction: stride-prefixes reassemble the doc exactly
    val rebuilt = texts.init.map(_.take(48)).flatten ++ texts.last
    assert(rebuilt.mkString(" ") === doc(150))
  }

  test("short doc → exactly one chunk; chunk_idx numbers from 0") {
    val df = Seq((1L, doc(10)), (2L, doc(64))).toDF("doc_id", "text")
    val got = Chunking.chunkDocs(df, "doc_id", "text", 64, 16)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), min("chunk_idx").as("lo"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1L, 0L), (2L, 1L, 0L)))
  }

  test("invalid parameters rejected loudly") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunkDocs(df, "doc_id", "text", 0, 0))
    intercept[IllegalArgumentException](Chunking.chunkDocs(df, "doc_id", "text", 8, 8))
  }

  test("plan: one projection stage, no shuffle, no UDF — per-row flatMap at 100 TB") {
    val df = Seq((1L, doc(200))).toDF("doc_id", "text")
    val plan = Chunking.chunkDocs(df, "doc_id", "text", 64, 16)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"),
      s"chunking must stay codegen built-ins:\n$plan")
  }
}
