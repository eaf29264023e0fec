package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation.
  *
  * Large-scale corpora are scrubbed of personally identifiable information
  * before training; the standard first line is regex redaction of
  * well-structured identifiers (emails, phone numbers, national-id
  * patterns, IP addresses). Everything here is `regexp_replace` /
  * `regexp_count` — native codegen'd Catalyst expressions, no UDFs, so the
  * scan stays inside whole-stage codegen at 100 TB.
  *
  * Cross-engine determinism: every pattern uses only syntax with identical
  * semantics in java.util.regex (Spark) and RE2 (DuckDB) — character
  * classes, bounded repetition, `\b` word boundaries, alternation. No
  * lookbehind (RE2 has none), no backreferences, no possessive
  * quantifiers. Replacement is global in both engines (DuckDB needs the
  * 'g' flag — the oracle SQL carries it).
  */
object PiiScrub {

  /** (category, pattern, replacement token), applied IN ORDER.
    * Order matters: emails first (an IPv4-shaped substring inside an email
    * local part must redact as part of the email, not as an IP); SSN
    * before phone (3-2-4 vs 3-3-4 digit groups are disjoint, but keeping
    * the more specific pattern first is cheap insurance). */
  val Rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** Number of matches of one category in `text` (counted BEFORE any
    * redaction — counts are per-category independent of rule order for
    * these mutually-exclusive patterns, except that an email is counted
    * only as an email; see [[detect]]). */
  private def countAfter(text: Column, upToExclusive: Int): Column = {
    // Count category i on the text with rules 0..i-1 already applied, so
    // e.g. digits inside an already-redacted email never count as an IP.
    val scrubbedPrefix = Rules.take(upToExclusive).foldLeft(text) {
      case (c, (_, pat, rep)) => regexp_replace(c, pat, rep)
    }
    regexp_count(scrubbedPrefix, lit(Rules(upToExclusive)._2)).cast("bigint")
  }

  /** Redacted text: all categories replaced by their tokens, in order. */
  def scrubbed(text: Column): Column =
    Rules.foldLeft(text) { case (c, (_, pat, rep)) => regexp_replace(c, pat, rep) }

  /** Per-row PII audit: one `n_<category>` count per rule plus the
    * redacted text. One projection, no shuffle — composes with any scan. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val withCounts = Rules.zipWithIndex.foldLeft(df) {
      case (d, ((name, _, _), i)) =>
        d.withColumn(s"n_$name", countAfter(col(textCol), i))
    }
    withCounts.withColumn(s"${textCol}_scrubbed", scrubbed(col(textCol)))
  }

  /** Corpus-level PII summary: total matches per category and the number
    * of affected rows. Single aggregation, map-side partial. */
  def summary(df: DataFrame, textCol: String): DataFrame = {
    val counted = scrub(df, textCol)
    val aggs = Rules.map { case (name, _, _) => sum(col(s"n_$name")).as(s"total_$name") } :+
      sum(when(Rules.map(r => col(s"n_${r._1}") > 0).reduce(_ || _), 1L).otherwise(0L))
        .as("rows_with_pii") :+
      count(lit(1)).as("rows_total")
    counted.agg(aggs.head, aggs.tail: _*)
  }
}
