package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window document chunking — splitting long documents into
  * overlapping token windows for training-example assembly (the dual of
  * [[Packing]]: packing bundles short docs UP to a budget, chunking cuts
  * long docs DOWN to one).
  *
  * Tokens are the battery's whitespace tokens; a chunk is `maxTokens`
  * consecutive tokens starting every `maxTokens - overlap` (the standard
  * sliding-window recipe, last chunk short). NULL text contributes no
  * chunks; an empty STRING contributes one single-token chunk of "" —
  * `split("", " ")` is [""] in Spark and DuckDB alike, so emptiness
  * filtering belongs upstream (quality gate), not here. Everything is
  * built-in Catalyst expressions — `split` → `sequence` of starts →
  * `explode` → `slice`/`concat_ws` — one
  * codegen-fused projection, NO shuffle and NO UDF: chunking is a per-row
  * flatMap and must stay embarrassingly parallel at 100 TB (the explode
  * multiplies rows ~len/stride-fold; Spark sizes output partitions off
  * the INPUT scan, so pair with `spark.sql.files.maxPartitionBytes` when
  * the corpus carries book-length outliers).
  *
  * Deterministic and closed-form by construction, so the whole operator
  * replays in DuckDB (q93: string_split + generate_series + list_slice). */
object Chunking {

  /** One row per (doc, chunk): (idCol, chunk_idx, start_tok, n_tokens,
    * chunk_text). `start_tok` is 0-based; `chunk_idx` numbers chunks
    * per-doc from 0 in start order. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    val stride = maxTokens - overlap
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // chunk starts: 0, stride, 2·stride, … keeping a start s only while it
    // contributes NEW tokens — the previous chunk already covers through
    // s + overlap − 1, so s must satisfy s < n − overlap (s = 0 always
    // kept). This also guarantees total coverage: the last kept start is
    // ≥ n − maxTokens. sequence() is inclusive of its upper bound, so aim
    // it at the last multiple of stride ≤ max(n − overlap − 1, 0); the
    // n = 0 case must not produce a negative-length sequence, hence the
    // explicit when().
    val starts = when(n > 0,
      sequence(lit(0),
        (greatest(n - overlap - 1, lit(0)).cast("long") / stride).cast("int") * stride,
        lit(stride)))
      .otherwise(array())
    df.select(col(idCol), toks.as("__toks"), explode(starts).as("start_tok"))
      .select(col(idCol),
        (col("start_tok") / stride).cast("bigint").as("chunk_idx"),
        col("start_tok").cast("bigint"),
        least(lit(maxTokens), size(col("__toks")) - col("start_tok"))
          .cast("bigint").as("n_tokens"),
        // slice() is 1-based on positive starts
        concat_ws(" ", slice(col("__toks"), col("start_tok") + 1, lit(maxTokens)))
          .as("chunk_text"))
  }
}
