package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus — the classic relevance /
  * keyword-extraction primitive of a text-training pipeline.
  *
  * The integer core (term frequency, document frequency, corpus size) is
  * exact in every engine, so the scoring variant score = tf·N / df (one
  * integer product + one IEEE division — idf without the log) is
  * bit-deterministic and sits under the DuckDB oracle hash gate. The
  * conventional log-idf weight is a monotone transform of N/df, so TOP-K
  * BY SCORE (what the pipeline consumes) is identical; [[logScore]] is
  * provided for when the actual log weight is wanted (transcendental →
  * engine-local, spec-checked not oracle-checked).
  *
  * Scale shape: one explode, two hash aggregations (tf on (doc, term), df
  * on term with map-side combine), one term-keyed join (terms ≪ corpus —
  * broadcastable for real vocabularies), and a per-doc window for top-k.
  * No collect, no cross join; N rides in as a broadcast scalar.
  */
object TfIdf {

  /** (id, term, tf, df, n_docs) for every (document, distinct term). */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = tok.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("term").agg(countDistinct(col("id")).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    tf.join(df, "term").crossJoin(broadcast(n))
  }

  /** Exact portable score: tf·N/df (integer product, one IEEE division). */
  def score(tf: org.apache.spark.sql.Column, dfC: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (tf * n).cast("double") / dfC.cast("double")

  /** Conventional log-idf weight tf·ln(N/df) — same top-k ranking as
    * [[score]] within a document (ln is monotone); engine-local floats. */
  def logScore(tf: org.apache.spark.sql.Column, dfC: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    tf.cast("double") * log(n.cast("double") / dfC.cast("double"))

  /** [[topTerms]] for a daily increment against an additively-maintained
    * document-frequency manifest — the incremental story's TF-IDF leg.
    * `dfManifest` is the prior corpus's (term, df) table and `priorN` its
    * doc count (both written by yesterday's job); today's scoring reads
    * ONLY them plus today's texts — never the prior corpus. df composes
    * by addition under disjoint doc sets (maintenance = append today's
    * per-term counts and sum; spec-pinned in TfIdfSpec), so scores equal
    * a from-scratch [[topTerms]] over (prior ∪ today) restricted to
    * today's docs — which is exactly what q116's oracle replays.
    *
    * Scale shape: one explode + two aggregations over TODAY only, one
    * term-keyed join against an O(vocab) manifest (bucketed on term →
    * zero manifest-side exchanges), corpus size rides as a broadcast
    * scalar. The daily cost is O(|today|), independent of the corpus. */
  def incrementalTopTerms(today: DataFrame, idCol: String, textCol: String,
      dfManifest: DataFrame, priorN: Long, k: Int): DataFrame = {
    val tok = today.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = tok.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfu = tok.groupBy("term").agg(countDistinct(col("id")).as("df_t"))
      .join(dfManifest.select(col("term"), col("df").as("df_p")), Seq("term"), "left")
      .select(col("term"), (col("df_t") + coalesce(col("df_p"), lit(0L))).as("df"))
    val n = today.select((countDistinct(col(idCol)) + lit(priorN)).as("n_docs"))
    val stats = tf.join(dfu, "term").crossJoin(broadcast(n))
      .withColumn("score", score(col("tf"), col("df"), col("n_docs")))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("term"))
    stats.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("id", "term", "tf", "df", "n_docs", "score", "rank")
  }

  /** The df manifest [[incrementalTopTerms]] consumes: (term, df) over a
    * corpus slice. Maintenance is append + sum on `term`. */
  def dfManifest(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("term"))
      .groupBy("term").agg(countDistinct(col("id")).as("df"))

  /** Top-k terms per document by [[score]], deterministic tiebreak on the
    * term. Returns (id, term, tf, df, n_docs, score, rank). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val stats = termStats(docs, idCol, textCol)
      .withColumn("score", score(col("tf"), col("df"), col("n_docs")))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("term"))
    stats.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("id", "term", "tf", "df", "n_docs", "score", "rank")
  }
}
