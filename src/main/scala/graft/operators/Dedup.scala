package graft.operators

import graft.functions.ShingleExpressions
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every variant is one explode + one hash-partitioned
  * shuffle keyed on something small (hash / band bucket / shingle), never
  * an O(n²) cross join. Candidate generation and verification are separate
  * stages so the quadratic step only ever runs inside tiny buckets.
  */
object Dedup {

  /** Exact dedup by content hash: one groupBy(md5) shuffle, map-side
    * partial aggregation. Returns (hash, n_copies, keeper) per group. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(contentHash(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper"))

  /** Rows minus exact duplicates (keeper = min id per hash). */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__h", contentHash(col(textCol)))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("__h").orderBy(idCol)))
      .filter(col("__rn") === 1).drop("__h", "__rn")

  /** Near-duplicate pairs by exact word-n-gram Jaccard: explode distinct
    * shingles, self-join on the hashed shingle, count shared per pair,
    * Jaccard = |∩| / (|A|+|B|−|∩|).
    *
    * Scale notes: shingles are hashed to 64-bit keys before the join, so
    * the shuffle moves (id, long) pairs instead of strings (collision odds
    * ~|S|²/2⁶⁴ — negligible). The per-shingle df(s)² candidate pairs are
    * STREAMED out of a distributed self-join — each task covers many
    * shingle keys and feeds pairs incrementally into the map-side partial
    * agg on (id_a, id_b). Both join inputs are the identical subplan, so
    * Spark plans ONE exchange and reuses it (ReuseExchange). A
    * groupBy(h)+collect_list reformulation (round 1) materialized every
    * pair of a hot shingle inside one row of one task — per-key work can't
    * be split below the row level, and the straggler measured 30× slower
    * at sf0.1 (98.7 s vs ~3 s). If df grows a heavy tail on larger
    * corpora, df-cap the join input and verify surviving candidates
    * exactly (same output; the cap only prunes pairs already above the
    * shared-count bound). */
  def ngramJaccardPairs(df0: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double): DataFrame = {
    // widen a narrow scan before the per-row shingle hashing (Par.widen);
    // the two derived legs below then share ONE exchange (ReuseExchange)
    // instead of re-scanning the text twice
    val df = Par.widen(df0.select(col(idCol), col(textCol)), col(idCol))
    // native one-pass shingle hashing (codegen'd WordShingleHashes) — same
    // values as xxhash64 over the HOF shingle pipeline, ~10× cheaper
    val sh = df.select(col(idCol).as("id"),
      explode(ShingleExpressions.wordShingleHashes(col(textCol), n)).as("h"))
    // set sizes come straight from the array — no second explode/shuffle
    val sizes = df.select(col(idCol).as("id"),
      size(ShingleExpressions.wordShingleHashes(col(textCol), n)).cast("bigint").as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "shared", "n_a", "n_b", "jaccard")
  }

  /** Shingle inverted index over a corpus: one row (h, doc_id, n_sh) per
    * DISTINCT word-n-gram shingle hash per document — the stored state
    * that lets tomorrow's crawl find its near-dup edges INTO this corpus
    * without re-reading its texts ([[ngramJaccardPairsVsIndex]]). The
    * per-doc set size rides denormalized on every row so the probe join
    * needs no second lookup. Persist it bucketed on `h`
    * ([[BucketedOps.ensureBucketed]]) and the daily probe's index side
    * plans zero exchanges — the scan's bucketing IS the distribution. */
  def shingleIndex(df0: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val df = Par.widen(df0.select(col(idCol), col(textCol)), col(idCol))
    df.select(col(idCol).as("doc_id"),
        ShingleExpressions.wordShingleHashes(col(textCol), n).as("hs"))
      .select(col("doc_id"), size(col("hs")).cast("bigint").as("n_sh"),
        explode(col("hs")).as("h"))
      .select("h", "doc_id", "n_sh")
  }

  /** Exact n-gram Jaccard pairs between `today` and a PRIOR corpus read
    * through its stored [[shingleIndex]] — the cross-day leg of
    * incremental near-dup clustering (q115). today's shingles hash-join
    * the index on the 64-bit shingle key (the only wide shuffle, and it
    * carries (id, long) rows); shared counts group by the (today, prior)
    * pair; Jaccard uses today's array size and the index's denormalized
    * `n_sh`. Same hashed-shingle convention as [[ngramJaccardPairs]], so
    * the union of the two pair sets is exactly what a from-scratch run
    * over (prior ∪ today) would emit for pairs touching today. Returns
    * (today_id, prior_id, jaccard). */
  def ngramJaccardPairsVsIndex(today0: DataFrame, idCol: String, textCol: String,
      index: DataFrame, n: Int = 3, minJaccard: Double = 0.3): DataFrame = {
    val today = Par.widen(today0.select(col(idCol), col(textCol)), col(idCol))
    val sh = today.select(col(idCol).as("tid"),
      explode(ShingleExpressions.wordShingleHashes(col(textCol), n)).as("h"))
    val sizes = today.select(col(idCol).as("tid"),
      size(ShingleExpressions.wordShingleHashes(col(textCol), n)).cast("bigint").as("n_t"))
    sh.join(index, "h")
      .groupBy(col("tid"), col("doc_id").as("pid"))
      .agg(count(lit(1)).as("shared"), max(col("n_sh")).as("n_p"))
      .join(sizes, "tid")
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_t") + col("n_p") - col("shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("tid").as("today_id"), col("pid").as("prior_id"), col("jaccard"))
  }

  // -------------------------------------------------------------------------
  // MinHash + LSH
  // -------------------------------------------------------------------------

  /** k universal-hash permutations h_i(x) = (a_i·x + b_i) mod p over a base
    * 31-bit shingle hash. p = 2^31−1 (Mersenne prime) keeps every product
    * under 2^62 — no Long overflow, so the expressions are ANSI-mode-safe
    * (Spark 4 throws on arithmetic overflow by default). Constants from a
    * fixed-seed PRNG — fully deterministic. */
  private val P31 = 2147483647L // 2^31 - 1
  private[graft] def hashParams(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((rnd.nextInt((P31 - 1).toInt).toLong + 1, rnd.nextInt(P31.toInt).toLong))
  }

  /** MinHash signature column: array<bigint> of length k for the document's
    * shingle set. One explode + one groupBy(id) with k min() partials —
    * map-side combined, no shuffle of raw text. */
  def minHashSignatures(df0: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64): DataFrame = {
    val df = Par.widen(df0.select(col(idCol), col(textCol)), col(idCol))
    // native murmur3 shingle hashes == hash(shingle).cast(long) (parity
    // spec-verified) — the HOF shingle pipeline never materializes
    val sh = df.select(col(idCol).as("id"),
      explode(ShingleExpressions.wordShingleMurmur(col(textCol), n)).as("hm"))
      .withColumn("h0", pmod(col("hm"), lit(P31)))
    val mins = hashParams(k).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h0") * a + b, lit(P31))).as(s"m$i")
    }
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: split the k-signature into `bands` bands of k/bands rows;
    * documents sharing any band land in the same bucket → candidate pair.
    * Buckets are the shuffle key, so the all-pairs step never materializes.
    * Returns candidate pairs with the estimated Jaccard (fraction of
    * matching signature components).
    *
    * Shuffle-width design: the band join key is `xxhash64(band, band_sig)`
    * — one 8-byte long instead of a k/bands-long array — and the k-long
    * signatures do NOT ride through the band self-join at all; they are
    * re-attached to the surviving candidate pairs by two id-keyed joins
    * against the (already materialized, exchange-reused) signature table.
    * At 100 TB the banded exchange is the dominant shuffle, so it carries
    * (id, long) only. A band-hash collision can only ADD a candidate pair
    * (odds ~2⁻⁶⁴ per bucket pair), never drop one — acceptable for a
    * candidate generator whose output is estimation-filtered anyway. */
  def minHashLshCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0)
    val r = k / bands
    // Barrier the signature fan-out (same rationale as the md5 twin
    // below): four plan legs consume it, and with the widened signature
    // pipeline each re-execution pays an exchange — persist wins.
    val sigs = minHashSignatures(df, idCol, textCol, n, k).persist()
    val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => slice(col("sig"), b * r + 1, lit(r)))))
      .select(col("id"), xxhash64(col("pos"), col("col")).as("bh"))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.bh") === col("y.bh") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b), x => x))
          .cast("double") / k.toDouble)
      .select("id_a", "id_b", "est_jaccard")
  }

  // -------------------------------------------------------------------------
  // Portable (md5-keyed) MinHash + LSH — oracle-checkable variant
  // -------------------------------------------------------------------------

  /** Distinct word-n-gram shingles as STRINGS, with the exact "no shingles
    * for docs shorter than n tokens" convention every SQL engine's
    * generate_series(1, len-n+1) produces — so the pipeline is portable. */
  private def shingleStrings(text: Column, n: Int): Column = {
    val ts = split(text, " ")
    array_distinct(
      when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", slice(ts, i, lit(n)))))
      .otherwise(array().cast("array<string>")))
  }

  /** Cross-engine-deterministic RAW 56-bit string hash: the 7 little-endian
    * bytes of md5 (== DuckDB `md5_number_upper(s) >> 8`, the little-endian
    * uint64 of the first 8 digest bytes). conv() of 14 hex chars < 2^56,
    * so the long cast is ANSI-safe. */
  private[graft] def portableH56(s: Column): Column = h56FromMd5Hex(md5(s))

  /** The 56-bit integer form of an ALREADY-computed md5 hex column —
    * [[portableH56]] minus its md5. Callers that carry an md5 column
    * anyway (e.g. [[incrementalNewDocs]]'s content hash) derive the
    * integer key from it directly rather than paying a second digest. */
  private[graft] def h56FromMd5Hex(h: Column): Column = {
    val le = concat(substring(h, 15, 2), substring(h, 13, 2), substring(h, 11, 2),
      substring(h, 9, 2), substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2))
    conv(le, 16, 10).cast("long")
  }

  /** Cross-engine-deterministic 31-bit shingle hash: [[portableH56]] mod
    * 2^31−1. ONE md5 per shingle — the k permutations then cost k integer
    * ops, not k hashes. */
  private[graft] def portableH31(s: Column): Column = pmod(portableH56(s), lit(P31))

  /** Cross-engine-deterministic SimHash: 56-bit signature over the
    * [[portableH56]] hashes of a document's DISTINCT tokens — the portable
    * twin of [[simHashSignatures]] (what q42's md5 MinHash is to q33): bit
    * b of the signature is set iff more distinct tokens have bit b set
    * than clear. All-integer votes → 56 codegen'd hash-aggregates with
    * map-side combine, one shuffle keyed on the doc id; DuckDB replays the
    * identical arithmetic from `md5_number_upper(t) >> 8`. */
  def md5SimHashSignatures(df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val df = Par.widen(df0.select(col(idCol), col(textCol)), col(idCol))
    val tok = df.select(col(idCol).as("id"),
        explode(shingleStrings(col(textCol), 1)).as("t"))
      .select(col("id"), portableH56(col("t")).as("h"))
    val votes = (0 until 56).map { b =>
      sum(when(col("h").bitwiseAND(1L << b) =!= 0, 1).otherwise(-1)).as(s"v$b")
    }
    tok.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 56).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** MinHash signature with a PORTABLE hash family: base hash =
    * [[portableH31]] (md5-derived, bit-identical in every engine), then the
    * same (a·h + b) mod 2^31−1 universal permutations as
    * [[minHashSignatures]] (shared fixed-seed constants). All-integer →
    * the k min()s hash-aggregate with map-side combine (min over STRINGS
    * would fall back to SortAggregate — measured 40× slower end-to-end),
    * and unlike the xxhash64 variant this one sits under the DuckDB-oracle
    * hash gate. */
  def md5MinHashSignatures(df0: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16): DataFrame = {
    val df = Par.widen(df0.select(col(idCol), col(textCol)), col(idCol))
    val sh = df.select(col(idCol).as("id"),
        explode(shingleStrings(col(textCol), n)).as("s"))
      .select(col("id"), portableH31(col("s")).as("h0"))
    val mins = hashParams(k).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h0") * a + b, lit(P31))).as(s"m$i")
    }
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** PER-ROW md5 MinHash band keys — the streaming-friendly form of the
    * banded signature: the k mins run as `array_min(transform(...))` over
    * the row's own shingle array (no aggregation, no shuffle), so the
    * whole banding is a stateless projection usable inside a streaming
    * query ahead of a stateful operator. Values are IDENTICAL to the
    * grouped [[md5MinHashSignatures]] (min over the same shingle set).
    * Output: (idCol, band, bhv) — same band keys as
    * [[md5MinHashLshCandidates]]. Docs with no shingles emit no rows. */
  def md5BandsPerRow(df0: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 8): DataFrame = {
    require(k == bands * 2, "portable LSH uses r=2 (band key = one packed long)")
    val df = Par.widen(df0, org.apache.spark.sql.functions.col(idCol)) // no-op on streams
    // materialize the shingle-hash array once per row (it feeds all k
    // mins; multi-referenced non-cheap expressions stay un-collapsed)
    val withHs = df.filter(size(split(col(textCol), " ")) >= n)
      .select(col(idCol),
        transform(shingleStrings(col(textCol), n), s => portableH31(s)).as("__hs"))
    val minCols = hashParams(k).map { case (a, b) =>
      array_min(transform(col("__hs"), h => pmod(h * a + b, lit(P31))))
    }
    val bandArr = array((0 until bands).map(b =>
      minCols(2 * b) * P31 + minCols(2 * b + 1)): _*)
    withHs.select(col(idCol), posexplode(bandArr))
      .select(col(idCol), col("pos").as("band"), col("col").as("bhv"))
  }

  /** LSH candidate pairs over [[md5MinHashSignatures]] (r = k/bands = 2):
    * band key = (band, m_even·(2^31−1) + m_odd) — one long per (doc, band),
    * exact in both engines (< 2^62), so the banded self-join shuffles
    * (id, band, long) only; signatures re-attach to the surviving pairs by
    * two id-keyed joins. est_jaccard = matching-component fraction, an
    * exact multiple of 1/k in both engines. */
  def md5MinHashLshCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 8): DataFrame = {
    require(k == bands * 2, "portable LSH uses r=2 (band key = one packed long)")
    // Barrier the signature table: FOUR plan legs consume it (both band
    // self-join sides + both verify joins). The round-11 A/B that kept the
    // legs un-barriered predates the widened (parallel) signature pipeline
    // — with the Par.widen exchange in each leg, re-executing the md5
    // shingle pass 4x measurably loses to materializing it once (q42
    // in-battery 4.9 s un-barriered vs 2.0 s barriered). The handle is
    // operator-internal; the battery's per-query clearCache releases it,
    // and at corpus scale this is exactly the persist-the-fan-out rule the
    // old comment already named as the expected flip.
    val sig = md5MinHashSignatures(df, idCol, textCol, n, k).persist()
    val banded = sig.select(col("id"), posexplode(array((0 until bands).map(b =>
        col(s"m${2 * b}") * P31 + col(s"m${2 * b + 1}")): _*)))
      .select(col("id"), col("pos").as("band"), col("col").as("bhv"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bhv") === col("y.bhv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val matches = (0 until k).map(i =>
      when(col(s"sa.m$i") === col(s"sb.m$i"), 1).otherwise(0)).reduce(_ + _)
    cand
      .join(sig.as("sa"), col("id_a") === col("sa.id"))
      .join(sig.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        (matches.cast("double") / k.toDouble).as("est_jaccard"))
  }

  // -------------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------------

  /** 64-bit SimHash per document: for each bit position, sum +1/-1 votes of
    * each distinct token's xxhash64 bit; bit set iff the vote is positive.
    * Computed as 64 codegen'd aggregates after one explode — no UDF. */
  def simHashSignatures(df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val df = Par.widen(df0.select(col(idCol), col(textCol)), col(idCol))
    // n=1 shingles = distinct tokens; hashes == xxhash64(token)
    val tok = df.select(col(idCol).as("id"),
      explode(ShingleExpressions.wordShingleHashes(col(textCol), 1)).as("h"))
    val votes = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(1L << b) =!= 0, 1).otherwise(-1)).as(s"v$b")
    }
    tok.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 64).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** Near-dup candidates: Hamming distance ≤ maxDist via 4×16-bit band
    * blocking (a pair within distance d ≤ 3 must agree on ≥1 of 4 bands). */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sigs = simHashSignatures(df, idCol, textCol)
    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_val")
    val popcnt = (x: Column) => bit_count(x)
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        popcnt(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxDist)
  }

  /** Benchmark decontamination: for each corpus doc, how many of its
    * distinct word n-gram shingles also occur anywhere in `benchmark`
    * (the held-out eval set a training corpus must not leak).
    *
    * Scale design: the benchmark side is SMALL by nature (eval suites are
    * thousands of docs, the corpus is billions), so its distinct shingle
    * hashes are broadcast — the 100 TB corpus is never shuffled, the whole
    * check is a map-side semi join + one groupBy(doc) count. Shingles are
    * 64-bit hashes end-to-end (native one-pass expression), never strings.
    * Output: (doc_id, n_shingles, n_matched, match_frac). */
  def contaminationCheck(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val shingles = ShingleExpressions.wordShingleHashes(col(textCol), n)
    val docSh = corpus.select(col(idCol).as("doc_id"), explode(shingles).as("h"))
    val benchSh = benchmark.select(explode(shingles).as("h")).distinct()
    val matched = docSh.join(broadcast(benchSh), "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_matched"))
    corpus.select(col(idCol).as("doc_id"),
        size(shingles).cast("bigint").as("n_shingles"))
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (coalesce(col("n_matched"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("match_frac"))
  }

  /** Incremental exact dedup against a prior corpus snapshot with a Bloom
    * pre-screen — "which of today's docs are NEW vs yesterday" without
    * joining the whole of today:
    *
    *   1. a Bloom filter over yesterday's content hashes (built
    *      distributed, collected driver-side) rides to the executors as an
    *      expression literal. Its size is O(|yesterday| · log(1/fpp))
    *      BITS — ~1.2 MB per 10⁶ docs at 3% fpp — linear in the prior
    *      corpus, NOT SF-independent: at 10¹⁰ docs the 3%-fpp sketch
    *      would be ~12 GB, which no driver literal survives.
    *      `sketchBudgetBytes` therefore caps it: when |yesterday|
    *      outgrows the budget, fpp auto-raises to the smallest rate whose
    *      optimal sketch still fits (fpp = e^(−8·budget·ln²2 / n), from
    *      m = −n·ln p/ln²2). The dial is SAFE because a false positive
    *      only demotes a row from the bypass lane into the exact lane —
    *      the pre-screen degrades toward the plain anti-join, never
    *      toward a wrong answer. At true 100 TB the next step is
    *      per-bucket Blooms co-partitioned with the exact lane's hash
    *      layout, removing the driver literal entirely.
    *   2. today's DEFINITE-MISSES (most of a fresh crawl) bypass the join
    *      entirely — Bloom has no false negatives, so they are provably
    *      new;
    *   3. only the possible-members (yesterday's size + the fpp tail)
    *      anti-join yesterday's exact hash set.
    *
    * The answer is EXACTLY the plain anti-join's — false positives only
    * move rows from the bypass lane into the exact lane — which is what
    * makes an approximate structure hash-gateable end-to-end (q95): the
    * oracle replays the plain anti-join and must agree bit-for-bit
    * regardless of where the fpp landed. At 100 TB this is the standard
    * daily-ingest shape: the join's left side shrinks from |today| to
    * ≈|yesterday ∩ today| + fpp·|today|.
    *
    * The Bloom keys are the 56-bit little-endian integer form of the md5
    * hex ([[h56FromMd5Hex]] — derived directly from the `h` column both
    * sides already carry, ONE digest per row); the EXACT lane compares
    * full md5 strings, so hash collisions cannot produce a wrong answer
    * either. */
  def incrementalNewDocs(today: DataFrame, yesterday: DataFrame,
      idCol: String, textCol: String, fpp: Double = 0.03,
      sketchBudgetBytes: Long = 64L << 20): DataFrame = {
    val yh = yesterday.select(md5(col(textCol)).as("h")).distinct()
    val withH = today.select(col(idCol), md5(col(textCol)).as("h"))
    val (_, newDocs) = bloomLaneSplit(withH, "h", yh, fpp, sketchBudgetBytes)
    newDocs.select(col(idCol), col("h"))
  }

  /** The Bloom lane split shared by [[incrementalNewDocs]] and the
    * incremental curation ledger's prior stage (q95/q102): partitions `df`
    * by membership of its `hashCol` (md5 hex) in `hashes`' `h` column —
    * returns (members, nonMembers), an EXACT partition. The Bloom over the
    * manifest's [[h56FromMd5Hex]] keys only routes: definite-misses join
    * nothing (provably non-members — no false negatives), possible-members
    * verify against the exact hash set via semi/anti joins, so fpp and
    * `sketchBudgetBytes` ([[budgetedFpp]]) affect cost, never the answer.
    * A NULL `hashCol` (md5 of a NULL text) routes to nonMembers — the same
    * verdict a plain anti-join gives a NULL-keyed row (NULL never equals a
    * manifest hash), so the partition stays exact with no vanishing lane.
    * Keeping the fpp/budget/h56 conventions in ONE place is the point —
    * the two call sites cannot drift. */
  private[graft] def bloomLaneSplit(df: DataFrame, hashCol: String,
      hashes: DataFrame, fpp: Double = 0.03,
      sketchBudgetBytes: Long = 64L << 20): (DataFrame, DataFrame) = {
    val prior = hashes.select(col("h")).distinct()
    val n = math.max(1L, prior.count())
    val bloom = graft.operators.Sketches.bloomFilterOf(
      prior.select(h56FromMd5Hex(col("h")).as("k")), "k", expectedItems = n,
      fpp = budgetedFpp(fpp, n, sketchBudgetBytes))
    // coalesce: might_contain(NULL) is NULL, which would fail BOTH lane
    // filters and silently drop the row from the partition
    val pred = coalesce(graft.operators.Sketches.mightContainCol(
      h56FromMd5Hex(col(hashCol)), bloom), lit(false))
    val maybe = df.filter(pred)
    val ref = prior.withColumnRenamed("h", "__ph")
    val members = maybe.join(ref, col(hashCol) === col("__ph"), "left_semi")
    val nonMembers = df.filter(!pred).unionAll(
      maybe.join(ref, col(hashCol) === col("__ph"), "left_anti"))
    (members, nonMembers)
  }

  /** The fpp that keeps an optimal Bloom sketch over `n` items within
    * `budgetBytes` (m = −n·ln p/ln²2 bits, inverted for p): never below
    * the requested `fpp` — budget headroom is not a reason to shrink the
    * sketch past what the caller asked for. Under extreme starvation fpp
    * approaches 1 and the pre-screen degrades to a no-op that routes
    * ~everything into the exact lane — slower, never wrong. The 0.999
    * ceiling only keeps the value inside BloomFilter.create's (0, 1)
    * domain. */
  private[graft] def budgetedFpp(fpp: Double, n: Long, budgetBytes: Long): Double = {
    val ln2sq = math.log(2) * math.log(2)
    val minFpp = math.exp(-(budgetBytes * 8.0 * ln2sq) / math.max(1L, n))
    math.min(0.999, math.max(fpp, minFpp))
  }

  /** [[incrementalNewDocs]] without the driver literal — per-bucket Bloom
    * filters CO-PARTITIONED with the data, the shape the pre-screen takes
    * once yesterday's corpus outgrows any single driver-held sketch:
    *
    *   1. yesterday's distinct content hashes are bucketed by
    *      `pmod(h56, nBuckets)` and each bucket builds its OWN exact-
    *      capacity Bloom in one distributed pass (`mapGroups` — sketch
    *      construction is genuinely imperative; Spark's own
    *      `df.stat.bloomFilter` is the same loop as an RDD aggregate).
    *      The blooms never leave the executors: nBuckets rows of
    *      O(|Y|/nBuckets · log(1/fpp)) bits each, so per-TASK memory —
    *      not driver memory — is the only bound, and it shrinks linearly
    *      as nBuckets grows.
    *   2. today co-groups with the bloom table on the SAME bucket key
    *      (one hash-partitioned shuffle — the exchange a bucketed lake
    *      layout à la [[BucketedOps]] would already provide for free).
    *      Each task deserializes its buckets' blooms ONCE and streams
    *      today's rows through them: definite-misses (a bucket with no
    *      yesterday docs, or a Bloom miss) are provably new and bypass
    *      the join; possible-members fall through to the exact lane.
    *   3. the exact lane anti-joins the possible-members (≈|Y∩T| plus the
    *      fpp tail, NOT all of today) against yesterday's hash set.
    *
    * Same contract as [[incrementalNewDocs]]: false positives only demote
    * rows into the exact lane, so the answer is EXACTLY the plain
    * anti-join's for every (nBuckets, fpp) — which is what lets q96 put
    * the whole distributed-sketch pipeline under the DuckDB hash gate.
    * `sketchBudgetBytes` is the TOTAL sketch budget; each bucket gets its
    * share and auto-raises fpp only if its exact key count overflows it
    * ([[budgetedFpp]] per bucket, with the bucket's real cardinality —
    * tighter than the single-sketch variant, which budgets the global
    * estimate). */
  def incrementalNewDocsBucketed(today: DataFrame, yesterday: DataFrame,
      idCol: String, textCol: String, nBuckets: Int = 64, fpp: Double = 0.03,
      sketchBudgetBytes: Long = 64L << 20): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.util.sketch.BloomFilter
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val perBucketBudget = math.max(64L, sketchBudgetBytes / nBuckets)
    val bucket = (k: Column) => pmod(k, lit(nBuckets.toLong))

    val yh = yesterday.select(md5(col(textCol)).as("h")).distinct()
    val yKeyed = yh.select(col("h"), h56FromMd5Hex(col("h")).as("k"))
      .withColumn("b", bucket(col("k")))
    val long2 = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    val blooms = yKeyed.select(col("b"), col("k")).as[(Long, Long)](long2)
      .groupByKey(_._1)(Encoders.scalaLong)
      .mapGroups { (b, it) =>
        // buffering the bucket's keys is the per-task memory contract
        // (|Y|/nBuckets longs) and buys an exact-capacity sketch
        val ks = it.map(_._2).toArray
        val bf = BloomFilter.create(math.max(1L, ks.length.toLong),
          budgetedFpp(fpp, ks.length.toLong, perBucketBudget))
        ks.foreach(bf.putLong)
        val bos = new ByteArrayOutputStream()
        bf.writeTo(bos)
        (b, bos.toByteArray)
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))

    val tKeyed = today.select(col(idCol), md5(col(textCol)).as("h"))
      .withColumn("__b", bucket(h56FromMd5Hex(col("h"))))
    val bIdx = tKeyed.schema.fieldIndex("__b")
    val hIdx = tKeyed.schema.fieldIndex("h")
    val idIdx = tKeyed.schema.fieldIndex(idCol)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      tKeyed.schema(idCol),
      org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("__maybe", org.apache.spark.sql.types.BooleanType)))
    val screened = tKeyed
      .groupByKey((r: Row) => r.getLong(bIdx))(Encoders.scalaLong)
      .cogroup(blooms.groupByKey(_._1)(Encoders.scalaLong)) { (_, tIt, bfIt) =>
        val bf = bfIt.buffered.headOption
          .map(t => BloomFilter.readFrom(new ByteArrayInputStream(t._2)))
        tIt.map { r =>
          val maybe = bf.exists(_.mightContainLong(
            h56OfMd5Hex(r.getString(hIdx))))
          Row(r.get(idIdx), r.getString(hIdx), maybe)
        }
      }(Encoders.row(outSchema))

    val definiteNew = screened.filter(!col("__maybe")).select(col(idCol), col("h"))
    val verifiedNew = screened.filter(col("__maybe"))
      .join(yh.withColumnRenamed("h", "__yh"), col("h") === col("__yh"), "left_anti")
      .select(col(idCol), col("h"))
    definiteNew.unionAll(verifiedNew)
  }

  /** JVM-side twin of [[h56FromMd5Hex]] (same 56-bit little-endian integer
    * from the same 14 hex digits), for executor-side membership tests —
    * kept adjacent so the two derivations can't drift apart silently;
    * PortableHashSpec pins them equal. */
  private[graft] def h56OfMd5Hex(h: String): Long =
    java.lang.Long.parseLong(
      h.substring(14, 16) + h.substring(12, 14) + h.substring(10, 12) +
        h.substring(8, 10) + h.substring(6, 8) + h.substring(4, 6) +
        h.substring(2, 4), 16)

  // -------------------------------------------------------------------------
  // Cross-day near-dup screen (the companion to the incremental exact lane)
  // -------------------------------------------------------------------------

  /** The LSH band manifest of a corpus: its DISTINCT (band, bhv) keys —
    * the second index a daily pipeline keeps beside the kept-hash
    * manifest of [[incrementalNewDocs]]. O(|corpus| × bands) longs, no
    * texts and no signatures, so it ships as a compact table (or lands
    * bucketed on (band, bhv) in the lake layout) and is maintained by
    * appending each day's kept docs' bands. */
  def bandManifest(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 8): DataFrame =
    md5BandsPerRow(docs, idCol, textCol, n, k, bands)
      .select("band", "bhv").distinct()

  /** Cross-day NEAR-dup screen: which of today's docs collide with the
    * prior corpus's [[bandManifest]] — the check [[incrementalNewDocs]]'s
    * exact lane cannot do (a re-crawl with one changed token hashes to a
    * different md5 but shares almost every MinHash band with its prior
    * version). Output, one row per today doc: (id, n_bands, n_hit,
    * near_dup_prior = n_hit > 0). Docs under `n` tokens emit no bands and
    * are never flagged (vacuously new — same rule as q83's ingest claims).
    *
    * This is a SCREEN, deliberately: candidates (band collisions), not
    * verified near-dups — the manifest holds no texts to verify against,
    * which is exactly what makes it cheap to keep. False positives route
    * candidates to whatever policy the pipeline wants (drop, dedup-review
    * queue, fetch-and-verify against the lake); false negatives are the
    * standard LSH miss probability (1−s^r)^b. Everything is a pure
    * function of the md5 band arithmetic, so the whole screen sits under
    * the DuckDB hash gate (q103).
    *
    * Scale: today's bands are O(|today| × bands) rows joined hash-on-
    * (band, bhv) against the manifest — one shuffle of longs, no
    * all-pairs, no text movement; with the manifest bucketed on the band
    * key the join co-locates like every other lake join.
    *
    * Precondition: `idCol` must be unique in `today` (a document table's
    * primary key). Duplicate ids would collapse into one output row with
    * their band counts merged — the per-ID (not per-input-row) aggregation
    * is deliberate, matching the one-row-per-document contract of every
    * other dedup screen here. */
  def nearDupVsPrior(today: DataFrame, priorBands: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 8): DataFrame = {
    val tb = md5BandsPerRow(today, idCol, textCol, n, k, bands)
    val manifest = priorBands.select(col("band"), col("bhv")).distinct()
    val per = tb.join(manifest.withColumn("__hit", lit(1L)),
        Seq("band", "bhv"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bands"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
    today.select(col(idCol)).distinct()
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bands"), lit(0L)).as("n_bands"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) > 0L).as("near_dup_prior"))
  }
}
