package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions` (Catalyst
  * expressions with whole-stage codegen) — no Scala UDFs, so the hot path
  * stays inside Tungsten at 100 TB. Cross-engine-deterministic by
  * construction: only rational arithmetic (no transcendentals whose last
  * ulp differs between libm implementations) and md5 (bit-identical
  * everywhere) are used, so every function can be oracle-checked.
  */
object TextFunctions {

  /** Whitespace tokens (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word-level n-gram shingles, de-duplicated — the input unit for
    * Jaccard / MinHash dedup. */
  def wordShingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    array_distinct(
      transform(sequence(lit(0), greatest(size(ts) - n, lit(0))),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
  }

  def tokenCount(text: Column): Column = size(tokens(text)).cast("bigint")

  /** BPE-ish subword count: alpha runs + digit runs + individual
    * punctuation marks (regex is identical RE2/Java syntax). */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).cast("bigint")

  /** Fraction of '.'/','/'!'/'?' characters. */
  def punctRatio(text: Column): Column = {
    val stripped = translate(text, ".,!?", "")
    (length(text) - length(stripped)).cast("double") /
      greatest(length(text), lit(1)).cast("double")
  }

  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "for")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu")
  val FrStop: Seq[String] = Seq("le", "la", "et", "les", "des", "est", "un", "une")

  /** Count of tokens that are in `words`. */
  def stopwordCount(text: Column, words: Seq[String] = EnStop): Column =
    size(filter(tokens(text), t => words.foldLeft(lit(false))((acc, w) => acc || t === w)))
      .cast("bigint")

  def stopwordRatio(text: Column, words: Seq[String] = EnStop): Column =
    stopwordCount(text, words).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Heuristic quality score in [0,1]: longer docs (capped), low
    * punctuation noise, healthy (but not degenerate) stopword share.
    * Pure rational arithmetic — oracle-expressible. */
  def qualityScore(text: Column): Column =
    (least(tokenCount(text), lit(100)).cast("double") / 100.0) *
      (lit(1.0) - punctRatio(text)) *
      (lit(1.0) - stopwordRatio(text))

  /** Stopword-profile language ID (n-gram-heuristic family): the language
    * whose stopword list hits most; 'unknown' on zero hits; ties resolve
    * en > de > fr (fixed priority). */
  def langId(text: Column): Column = {
    val en = stopwordCount(text, EnStop)
    val de = stopwordCount(text, DeStop)
    val fr = stopwordCount(text, FrStop)
    when(greatest(en, de, fr) === 0, lit("unknown"))
      .when(en >= de && en >= fr, lit("en"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Content fingerprint: md5 of the full text — exact-duplicate key. */
  def contentHash(text: Column): Column = md5(text)

  /** Order-invariant vocabulary fingerprint: the minimum md5 over the
    * token set (a 1-permutation MinHash with md5 as the random order —
    * deterministic and portable across engines). */
  def minTokenHash(text: Column): Column =
    array_min(transform(array_distinct(tokens(text)), t => md5(t)))
}
