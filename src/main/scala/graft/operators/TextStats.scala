package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for training-data curation — the
  * "remove boilerplate / degenerate text" tier of a corpus pipeline
  * (cf. the repetition filters described in the Gopher and MassiveText
  * papers): a page of navigation links or a scraped log file shows up as
  * a high duplicate-token fraction or a single n-gram dominating the
  * text, long before any cross-doc dedup runs.
  *
  * Scale design: token/distinct counts are per-row array ops (codegen'd,
  * zero shuffle). Top-n-gram fractions need a per-(doc, gram) count —
  * that is one hash-partitioned shuffle keyed on (doc_id, gram_hash);
  * grams are hashed to 64-bit BEFORE the exchange so the shuffle carries
  * longs, not strings, and the two-level aggregation partially combines
  * map-side. Nothing is quadratic in document length (a per-row HOF
  * "count occurrences of each distinct gram" would be O(tokens ×
  * distinct) per doc — a 50k-token page would take minutes).
  */
object TextStats {

  /** All word n-gram shingles of `text` WITH multiplicity (unlike
    * TextFunctions.wordShingles, which dedups for Jaccard); empty array
    * when the doc has fewer than n tokens. */
  def wordShinglesMulti(text: Column, n: Int): Column = {
    val ts = tokens(text)
    when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - (n - 1)),
        i => concat_ws(" ", slice(ts, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document repetition profile:
    * (doc_id, n_tokens, n_distinct, dup_token_frac,
    *  top_bigram_frac, top_trigram_frac). Fractions are exact integer
    *  ratios evaluated in double — cross-engine deterministic. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))

    val uni = base.select(col("doc_id"),
      size(tokens(col("__text"))).cast("bigint").as("n_tokens"),
      size(array_distinct(tokens(col("__text")))).cast("bigint").as("n_distinct"))

    def topFrac(n: Int, outCol: String): DataFrame =
      base.select(col("doc_id"),
          explode(wordShinglesMulti(col("__text"), n)).as("__g"))
        // hash before the shuffle: the exchange moves (bigint, bigint)
        .select(col("doc_id"), xxhash64(col("__g")).as("__h"))
        .groupBy("doc_id", "__h").agg(count(lit(1)).as("__c"))
        .groupBy("doc_id")
        .agg((max(col("__c")).cast("double") / sum(col("__c")).cast("double"))
          .as(outCol))

    uni
      .join(topFrac(2, "top_bigram_frac"), Seq("doc_id"), "left")
      .join(topFrac(3, "top_trigram_frac"), Seq("doc_id"), "left")
      .na.fill(0.0, Seq("top_bigram_frac", "top_trigram_frac"))
      .withColumn("dup_token_frac",
        (col("n_tokens") - col("n_distinct")).cast("double") /
          col("n_tokens").cast("double"))
      .select("doc_id", "n_tokens", "n_distinct", "dup_token_frac",
        "top_bigram_frac", "top_trigram_frac")
  }

  /** Cross-document repeated-span fraction — the corpus-level duplication
    * signal behind exact-substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): for each document, the
    * fraction of its distinct `w`-token windows whose text also appears in
    * at least one OTHER document. Docs built from boilerplate score near
    * 1.0; original text scores near 0.
    *
    * Returns (doc_id, n_spans, n_shared_spans, shared_frac).
    *
    * Scale design: one explode of per-doc distinct spans, hashed to a
    * compact key BEFORE the exchange, then a single hash-partitioned
    * aggregation on the span key counting distinct docs (exactly 2 levels:
    * map-side partial + final), and one shuffle join back on the key to
    * attribute shared spans to docs. No collect_list, no window over the
    * whole corpus, nothing quadratic — a hot span (in millions of docs)
    * costs one long-keyed aggregation row, not a materialized pair list.
    *
    * `portable = true` keys spans by md5 (bit-identical in any engine →
    * oracle-checkable); `false` uses xxhash64 (halves the shuffle width —
    * the production path). Both have collision odds ~|spans|²/2^64⁺ —
    * negligible. */
  def repeatedSpanStats(df: DataFrame, idCol: String, textCol: String,
      w: Int, portable: Boolean = false): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    def key(g: Column): Column = if (portable) md5(g) else xxhash64(g)

    val spans = base.select(col("doc_id"),
        explode(array_distinct(wordShinglesMulti(col("__text"), w))).as("__g"))
      .select(col("doc_id"), key(col("__g")).as("__k"))

    // spans seen in >= 2 docs; spans are distinct per doc, so count == docs
    val sharedKeys = spans.groupBy("__k").agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= 2).select("__k")

    val perDoc = spans.join(sharedKeys.withColumn("__shared", lit(1L)), Seq("__k"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("__shared"), lit(0L))).as("n_shared_spans"))

    // left join back to base so span-less docs (< w tokens) report 0
    base.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_shared_spans"), lit(0L)).as("n_shared_spans"),
        when(coalesce(col("n_spans"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_shared_spans").cast("double") / col("n_spans").cast("double"))
          .as("shared_frac"))
  }

  /** Unigram-LM token-rarity scoring — the cheap perplexity proxy of a
    * corpus pipeline (a doc whose tokens are all corpus-frequent is
    * boilerplate-ish; one full of corpus-rare tokens is noise/garble; the
    * quality band lives in between). Two passes over the exploded tokens:
    * corpus counts (one shuffle keyed on token — Zipf-bounded cardinality,
    * map-side combined), then a token→count join (same key, so the
    * exchange is reused / broadcastable when the vocab fits) aggregated
    * per doc. The mean frequency uses the decimal-exact dsum pattern so
    * results hash-match across engines; integer `rarest` is the doc's
    * hardest token. `splitOn` must match the oracle's tokenization. */
  def tokenRarity(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", splitOn: String = " "): DataFrame = {
    import graft.Q.{cnt, dsum}
    val toks = docs.select(col(idCol), explode(split(col(textCol), splitOn)).as("tok"))
    val counts = toks.groupBy("tok").agg(cnt.as("__c"))
    toks.join(counts, "tok")
      .groupBy(idCol)
      .agg(cnt.as("n_tokens"),
        (dsum(col("__c")) / cnt).as("mean_tok_freq"),
        min(col("__c")).as("rarest"))
  }

  /** Cross-document repeated-span catalog — the cross-doc complement of
    * [[repeatedSpanStats]] and the seed step of exact-substring dedup (cf.
    * "Deduplicating Training Data Makes Language Models Better": long
    * byte-spans shared verbatim across documents are memorization fuel).
    * Emits every `spanLen`-char window at `stride` offsets and keeps spans
    * occurring in ≥ `minDocs` distinct docs. One shuffle keyed on the
    * span; at 100 TB the span key should be hashed to 64-bit pre-shuffle
    * (carry longs, not strings — re-derive the top spans by a second
    * filtered pass); kept as strings here so the result is directly
    * SQL-oracle-comparable. */
  def crossDocSpans(docs: DataFrame, spanLen: Int = 32, stride: Int = 16,
      minDocs: Int = 2, topK: Int = 100, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import graft.Q.cnt
    val windows = docs.filter(length(col(textCol)) >= spanLen)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, length($textCol) - ${spanLen - 1}, $stride), " +
          s"i -> substring($textCol, i, $spanLen))")).as("span"))
    windows.groupBy("span")
      .agg(countDistinct(col(idCol)).as("n_docs"), cnt.as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))
      .limit(topK)
  }

  /** Substring-level dedup — the "remove the duplicated text itself"
    * cleaning pass (cf. Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"): doc-level dedup keeps one of two
    * near-identical PAGES, but corpora are full of repeated SPANS inside
    * otherwise-distinct pages (boilerplate, license headers, quoted
    * chunks) that doc-level ops never touch. This is the practical
    * fixed-length variant of the paper's suffix-array pass: every
    * `spanLen`-token window occurring ≥ `minCount` times CORPUS-WIDE
    * marks its token positions as duplicated, and each doc is rewritten
    * with the covered tokens removed ([[removeRepeatedSubstrings]] is the
    * paper-faithful extension: maximal runs ≥ minRun, first copy kept).
    *
    * Fully relational — no per-row quadratic HOF: one windowed explode
    * (doc, pos, span), one hash aggregation on the span (map-side
    * combined), a keyed join back, an interval explode to covered
    * positions, a LEFT ANTI join of the token stream against them, and a
    * per-doc ordered reassembly (sort_array over (pos, token) structs —
    * deterministic, oracle-matchable). Everything shuffles on doc_id or
    * the span key, never broadcast-scale state. At petabyte scale hash
    * the span to 64-bit before the exchange (the q80 trick); the string
    * key is kept so DuckDB groups bit-identically.
    *
    * Returns (doc_id, n_tokens, n_removed, clean_text); a fully-covered
    * doc keeps an empty clean_text rather than vanishing — the caller
    * decides the drop policy. */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 8, minCount: Int = 2): DataFrame = {
    require(spanLen >= 2 && minCount >= 2)
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
    val spans = spanRows(base, spanLen)
    val dup = spans.groupBy("s").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount).select("s")
    rewriteWithoutSpans(base, spans, dup, spanLen)
  }

  /** The (s, n) span-count manifest of a corpus — the stored state of the
    * DAILY incremental substring-dedup leg ([[incrementalRemoveRepeatedSpans]]),
    * the third additive manifest family beside df (q116/q120) and bigram
    * counts (q124): window counts compose by ADDITION under disjoint doc
    * sets, so the daily job appends its own day's counts
    * ([[graft.operators.BucketedOps.idempotentAppend]] into buckets on
    * `s`) and readers resolve sum(n) per span bucket-locally. The span
    * STRING is the key so DuckDB groups bit-identically and the cleaning
    * semantics stay exactly q125's (a 64-bit hash key would be lighter at
    * petabyte scale but admits collisions that REMOVE innocent text — for
    * an exact-substring op the string is the datum; a deployment wanting
    * the hash key fronts it with a verify lane like the q95 Bloom
    * pattern). */
  def spanManifest(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 8): DataFrame = {
    require(spanLen >= 2)
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
    spanRows(base, spanLen).groupBy("s").agg(count(lit(1)).as("n"))
  }

  /** DAILY incremental substring dedup — [[removeRepeatedSpans]]'s
    * maintenance form (the q116 pattern applied to the span family):
    * today's crawl is cleaned against the CORPUS-WIDE span statistics
    * without reading any prior text — a window is duplicated iff its
    * today-count plus the stored manifest count reaches `minCount`, which
    * equals the from-scratch count over (prior ∪ today) because counts
    * add under disjoint doc sets. Daily cost: O(|today|) explode + one
    * today-sized aggregation + a join against the manifest at ITS OWN
    * distribution (sum-resolve bucket-local when the manifest is
    * bucketed on `s` — the q120 lake layout); prior texts never move.
    * Output rows are today's docs only, in [[removeRepeatedSpans]]'s
    * (doc_id, n_tokens, n_removed, clean_text) contract — and must equal
    * the from-scratch corpus-wide pass restricted to today (gate q135,
    * one closed form for both shapes). */
  def incrementalRemoveRepeatedSpans(today: DataFrame, idCol: String,
      textCol: String, spanManifest: DataFrame,
      spanLen: Int = 8, minCount: Int = 2): DataFrame = {
    require(spanLen >= 2 && minCount >= 2)
    // the manifest carries no spanLen metadata (it is a plain (s, n)
    // table), so a caller passing a spanLen DIFFERENT from the one the
    // manifest was built with would join today's spans against keys that
    // can never match: prior counts silently resolve to 0 and every
    // cross-boundary duplicate is UNDER-removed with no error anywhere.
    // Spans are spanLen tokens joined by single spaces and tokens carry
    // no spaces, so sampled manifest keys must split back into exactly
    // spanLen parts — loud on mismatch (an empty manifest — day 1 — has
    // nothing to contradict and passes). COST: the probe is an EAGER
    // limit(8) action at construction time — one tiny driver job per
    // invocation. A daily batch caller never notices; a caller composing
    // this PER MICRO-BATCH pays a driver job per batch and should
    // validate the manifest once at stream start instead (the probe is
    // deliberately not deferred: under-removal is silent, and the first
    // action of the composed plan is the wrong place to discover a
    // day-one misconfiguration). Columns resolve by POSITION — the
    // manifest contract is (span, count) in that order, whatever the
    // caller named them. EXACTLY two, distinctly named: a wider frame
    // (e.g. after an ADD-COLUMN migration) would silently take whatever
    // sits at position 1 as the count, and duplicate names would make the
    // later by-name col() selects ambiguous (ADVICE_r16 #5) — both are
    // caller bugs to surface, not guess through.
    require(spanManifest.columns.length == 2,
      s"span manifest must be exactly (span, count), got " +
        s"${spanManifest.columns.mkString("(", ", ", ")")} — project the " +
        "2-column manifest before passing it")
    require(spanManifest.columns.distinct.length == 2,
      s"span manifest column names must be distinct, got " +
        s"${spanManifest.columns.mkString("(", ", ", ")")}")
    val spanC = spanManifest.columns(0)
    val countC = spanManifest.columns(1)
    val sampled = spanManifest.select(col(spanC)).limit(8).collect()
    sampled.foreach { r =>
      // split with limit -1: Java's default drops TRAILING empty strings,
      // so a span whose last token is empty (doc text with a double or
      // trailing space) would read one token short and falsely refuse a
      // correctly-built manifest
      val got = r.getString(0).split(" ", -1).length
      require(got == spanLen,
        s"span manifest was built with spanLen=$got but caller declared " +
          s"spanLen=$spanLen — the join would never match and prior counts " +
          "would silently resolve to 0 (under-removal); rebuild the " +
          "manifest or pass the matching spanLen")
    }
    val base = today.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
    val spans = spanRows(base, spanLen)
    val todayCounts = spans.groupBy("s").agg(count(lit(1)).as("__t"))
    // resolve the append-maintained manifest (sum per span — one row per
    // span after a compaction, one per day's append before it)
    val prior = spanManifest.select(col(spanC).as("s"), col(countC).as("n"))
      .groupBy("s").agg(sum("n").as("__p"))
    val dup = todayCounts.join(prior, Seq("s"), "left")
      .filter(col("__t") + coalesce(col("__p"), lit(0L)) >= minCount)
      .select("s")
    rewriteWithoutSpans(base, spans, dup, spanLen)
  }

  /** One windowed explode to (doc_id, i, s) span rows — shared by the
    * one-shot and incremental passes and the manifest builder so the
    * three derivations cannot drift. */
  private def spanRows(base: DataFrame, spanLen: Int): DataFrame =
    base.select(col("doc_id"),
        explode(when(size(col("ts")) >= spanLen,
          transform(sequence(lit(1), size(col("ts")) - (spanLen - 1)),
            i => struct(i.as("i"),
              concat_ws(" ", slice(col("ts"), i, lit(spanLen))).as("s"))))
          .otherwise(array().cast("array<struct<i:int,s:string>>"))).as("sp"))
      .select(col("doc_id"), col("sp.i").as("i"), col("sp.s").as("s"))

  /** The rewrite tail shared by both passes: mark `dup` spans' token
    * positions covered, drop them from the token stream, reassemble. */
  private def rewriteWithoutSpans(base: DataFrame, spans: DataFrame,
      dup: DataFrame, spanLen: Int): DataFrame = {
    val covered = spans.join(dup, "s")
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + (spanLen - 1))).as("p"))
      .distinct()
    val toks = base.select(col("doc_id"), posexplode(col("ts")))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("tok"))
    val kept = toks.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id").agg(
        count(lit(1)).as("__n_kept"),
        concat_ws(" ", transform(sort_array(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok"))).as("clean_text"))
    base.select(col("doc_id"), size(col("ts")).cast("bigint").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** The suffix-array-faithful extension of [[removeRepeatedSpans]] (the
    * gap that method's scaladoc names): Lee et al.'s ExactSubstr pass
    * removes MAXIMAL repeated substrings of length ≥ k tokens and KEEPS
    * ONE occurrence — the canonical copy survives, only the echoes go.
    * The fixed-length variant instead deletes every copy of every
    * repeated window, first occurrence included.
    *
    * Bounded two-pass construction, no suffix array needed:
    *   1. SEED: every `spanLen`-token window occurring ≥ `minCount` times
    *      corpus-wide, exactly the [[removeRepeatedSpans]] windows. Per
    *      span, ONE aggregation also yields the globally-first occurrence
    *      (min over (doc_id, pos) structs — an agg with map-side combine,
    *      deliberately NOT a row_number window: a boilerplate span with
    *      millions of occurrences would make a per-span sort window the
    *      skew hotspot; min is commutative and combines early).
    *   2. EXTEND-AND-MERGE: every NON-first occurrence marks its
    *      interval; overlapping intervals union into per-doc islands
    *      (gaps-and-islands over the covered positions — the window runs
    *      per doc, bounded by document length, never corpus-wide), and
    *      only islands of ≥ `minRun` tokens are removed. A true repeated
    *      substring of length L ≥ minRun has all its windows repeated, so
    *      its later occurrences become exactly an L-token island — removed
    *      in full while its first occurrence survives. (Islands chained
    *      from DISTINCT overlapping repeats can over-approximate a single
    *      maximal repeat — the standard seed-and-extend trade; the
    *      suffix array's exactness is what it buys for its global sort.)
    *
    * Same output contract as [[removeRepeatedSpans]]:
    * (doc_id, n_tokens, n_removed, clean_text). Shuffles on the span key
    * (hash to 64-bit at petabyte scale — the q80 trick; strings kept for
    * cross-engine oracle checkability) and on doc_id. */
  def removeRepeatedSubstrings(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 8, minCount: Int = 2, minRun: Int = 12): DataFrame = {
    require(spanLen >= 2 && minCount >= 2 && minRun >= spanLen,
      s"need spanLen>=2, minCount>=2, minRun>=spanLen; got ($spanLen,$minCount,$minRun)")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
    val spans = base.select(col("doc_id"),
        explode(when(size(col("ts")) >= spanLen,
          transform(sequence(lit(1), size(col("ts")) - (spanLen - 1)),
            i => struct(i.as("i"),
              concat_ws(" ", slice(col("ts"), i, lit(spanLen))).as("s"))))
          .otherwise(array().cast("array<struct<i:int,s:string>>"))).as("sp"))
      .select(col("doc_id"), col("sp.i").as("i"), col("sp.s").as("s"))
    val stats = spans.groupBy("s").agg(
        count(lit(1)).as("__n"),
        min(struct(col("doc_id"), col("i"))).as("__first"))
      .filter(col("__n") >= minCount)
      .select("s", "__first")
    val seeds = spans.join(stats, "s")
      .filter(col("doc_id") =!= col("__first.doc_id") ||
        col("i") =!= col("__first.i"))
    val covered = seeds
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + (spanLen - 1))).as("p"))
      .distinct()
    val isl = covered.withColumn("__grp",
      col("p") - row_number().over(Window.partitionBy("doc_id").orderBy("p")))
    val removed = isl
      .withColumn("__len",
        count(lit(1)).over(Window.partitionBy(col("doc_id"), col("__grp"))))
      .filter(col("__len") >= minRun)
      .select("doc_id", "p")
    val toks = base.select(col("doc_id"), posexplode(col("ts")))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("tok"))
    val kept = toks.join(removed, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id").agg(
        count(lit(1)).as("__n_kept"),
        concat_ws(" ", transform(sort_array(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok"))).as("clean_text"))
    base.select(col("doc_id"), size(col("ts")).cast("bigint").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** The (bigram, count) manifest [[bigramFluency]] consumes: multiset
    * word-bigram counts over a corpus slice. Counts compose by ADDITION
    * under disjoint doc sets, so maintenance is append + sum on `bg` —
    * the same grow-only algebra as the TF-IDF df manifest. Persist it
    * bucketed on `bg` and both the daily sum-resolve and the scoring
    * join consume it at its on-disk distribution. */
  def bigramManifest(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(explode(wordShinglesMulti(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("n"))

  /** Bigram-LM fluency signals — the language-model quality-filter tier
    * of a corpus pipeline (cf. the CCNet/KenLM-style perplexity filters):
    * a doc whose word bigrams rarely appear in the reference corpus is
    * boilerplate, gibberish, or the wrong register. The score here is the
    * hash-gateable integer core of that idea: per doc, the bigram count,
    * how many are OUT-OF-VOCABULARY vs the manifest, the total reference
    * mass its bigrams hit, and the two exact-division rates (oov_rate
    * high = unseen text; mean_hit low = rare constructions). The log-space
    * perplexity is a monotone transform of per-bigram hit probabilities —
    * engine-local floats, deliberately left out of the gate (same split
    * as TfIdf.score vs logScore).
    *
    * Scale shape: one explode over TODAY only, one join keyed on the
    * bigram against the O(bigram-vocab) manifest (bucketed on `bg` →
    * zero manifest-side exchanges), one groupBy(doc). Never reads prior
    * texts — the manifest IS the reference corpus. At petabyte vocab,
    * hash `bg` to a 64-bit key before the exchange (the q80 trick); the
    * string form is kept here for cross-engine oracle checkability. */
  def bigramFluency(today: DataFrame, idCol: String, textCol: String,
      manifest: DataFrame): DataFrame = {
    val bgs = today.select(col(idCol).as("doc_id"),
      explode(wordShinglesMulti(col(textCol), 2)).as("bg"))
    val per = bgs.join(manifest.select(col("bg"), col("n")), Seq("bg"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("n").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("n"), lit(0L))).as("hit_mass"))
    today.select(col(idCol).as("doc_id")).distinct()
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("hit_mass"), lit(0L)).as("hit_mass"))
      .withColumn("oov_rate", col("n_oov").cast("double") /
        greatest(col("n_bigrams"), lit(1L)).cast("double"))
      .withColumn("mean_hit", col("hit_mass").cast("double") /
        greatest(col("n_bigrams"), lit(1L)).cast("double"))
  }
}
