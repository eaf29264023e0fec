package graft.functions

import graft.operators.PiiScrub
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the graft function library: every text/dedup primitive
  * as a `graft_*` function callable from `spark.sql(...)`, mirroring the
  * reference's DDL-first user surface (a Flink SQL user writes
  * `SELECT ... FROM t` with built-in functions; a graft user gets the same
  * ergonomics on Spark).
  *
  * Two registration paths, same builders:
  *  - [[GraftExtensions]] via `spark.sql.extensions` config (the public
  *    `SparkSessionExtensions.injectFunction` API) — for sessions the
  *    library owns from construction;
  *  - [[GraftFunctions.register]] on an already-built session (the
  *    driver-gate situation) via the function registry.
  *
  * Every function resolves to the SAME native Catalyst expressions as the
  * Column API (`TextFunctions` / `ShingleExpressions` / `PiiScrub`) — the
  * SQL path is a name lookup, not a UDF wrapper, so whole-stage codegen
  * and oracle determinism are identical in both surfaces.
  */
object GraftFunctions {

  private def c(e: Expression): Column = ColumnGlue.column(e)
  private def x(col: Column): Expression = ColumnGlue.eagerExpression(col)

  /** Extract a literal Int argument (e.g. a shingle width): SQL call sites
    * pass `graft_shingle_hashes(text, 3)`. Any foldable int expression
    * works; a non-constant errors loudly at analysis time. */
  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other if other.foldable && other.dataType == IntegerType =>
      other.eval().asInstanceOf[Int]
    case other =>
      throw new IllegalArgumentException(
        s"$fn expects a constant INT, got: ${other.sql}")
  }

  private def unary(fn: String, f: Column => Column): Seq[Expression] => Expression = {
    case Seq(t) => x(f(c(t)))
    case args => throw new IllegalArgumentException(
      s"$fn expects 1 argument, got ${args.length}")
  }

  private def textAndN(fn: String, f: (Column, Int) => Column): Seq[Expression] => Expression = {
    case Seq(t, n) => x(f(c(t), litInt(n, fn)))
    case args => throw new IllegalArgumentException(
      s"$fn expects (text, n), got ${args.length} arguments")
  }

  /** name -> (builder, usage doc). */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_tokens", unary("graft_tokens", TextFunctions.tokens),
      "graft_tokens(text) - whitespace tokens as ARRAY<STRING>"),
    ("graft_token_count", unary("graft_token_count", TextFunctions.tokenCount),
      "graft_token_count(text) - whitespace token count"),
    ("graft_subword_count", unary("graft_subword_count", TextFunctions.subwordCount),
      "graft_subword_count(text) - BPE-ish subword count"),
    ("graft_punct_ratio", unary("graft_punct_ratio", TextFunctions.punctRatio),
      "graft_punct_ratio(text) - fraction of .,!? characters"),
    ("graft_stopword_ratio", unary("graft_stopword_ratio", t => TextFunctions.stopwordRatio(t)),
      "graft_stopword_ratio(text) - English stopword share of tokens"),
    ("graft_quality", unary("graft_quality", TextFunctions.qualityScore),
      "graft_quality(text) - heuristic quality score in [0,1]"),
    ("graft_lang_id", unary("graft_lang_id", TextFunctions.langId),
      "graft_lang_id(text) - stopword-profile language id (en/de/fr/unknown)"),
    ("graft_content_hash", unary("graft_content_hash", TextFunctions.contentHash),
      "graft_content_hash(text) - md5 exact-duplicate key"),
    ("graft_min_token_hash", unary("graft_min_token_hash", TextFunctions.minTokenHash),
      "graft_min_token_hash(text) - order-invariant vocabulary fingerprint"),
    ("graft_pii_scrub", unary("graft_pii_scrub", PiiScrub.scrubbed),
      "graft_pii_scrub(text) - emails/SSNs/phones/IPv4s redacted"),
    ("graft_word_shingles", textAndN("graft_word_shingles", TextFunctions.wordShingles),
      "graft_word_shingles(text, n) - distinct word n-grams"),
    ("graft_shingle_hashes", textAndN("graft_shingle_hashes", ShingleExpressions.wordShingleHashes),
      "graft_shingle_hashes(text, n) - 64-bit hashes of distinct word n-grams (native codegen)"))

  /** Register every graft_* function on an existing session. Idempotent. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder, _) =>
      ColumnGlue.registerFunction(spark, name, builder)
    }
}

/** `spark.sql.extensions`-style entry point:
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  * Injects the same function set through the public
  * `SparkSessionExtensions.injectFunction` API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder, _) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
}
