package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-storage co-located joins.
  *
  * At 100 TB the dominant cost of a repeated fact-fact join is the shuffle:
  * every execution re-hashes and re-transfers both sides even though the
  * join key never changes. Spark's answer is bucketed storage —
  * `bucketBy(n, key).sortBy(key)` at write time pins each row's file by
  * `hash(key) % n`, the scan then reports `HashPartitioning(key, n)`, and a
  * sort-merge join of two tables bucketed on the join key with the SAME
  * bucket count satisfies both children's distribution requirements with
  * ZERO exchanges — the join (and any downstream aggregate whose grouping
  * contains the bucket key) runs entirely map-side. This is the curated
  * "changelog lake" shape a CDC pipeline lands on at scale: pay one
  * bucketed write at ingest, then every downstream join/agg on the key is
  * shuffle-free forever (the analogue of the reference handing its
  * changelog to Flink SQL tables with a primary key the planner exploits —
  * SURVEY.md §2.4).
  *
  * The write is an index build, amortized across every query that follows;
  * [[ensureBucketed]] therefore caches per (session, logical id) the same
  * way an ingest job writes once. q87 puts the whole shape under the
  * DuckDB hash gate (values ≡ the plain join), and PlanAuditSpec pins the
  * zero-exchange plan so it cannot silently regress to a shuffle. */
object BucketedOps {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Write `df` as an external parquet table bucketed AND sorted by `key`
    * into `buckets` buckets, registered in the session catalog under a
    * deterministic name derived from `id`; returns the table name. Runs
    * once per (JVM, session, id) — later calls reuse the catalog entry,
    * exactly like production queries reusing an ingest-time layout.
    *
    * `location`: where the table's files land. A production ingest names a
    * durable path (lake directory, mounted object store) so the layout
    * outlives the session and other sessions can `ensureBucketed` over the
    * same location; when None (bench/test use) a temp directory is
    * created — that layout is per-machine scaffolding, not a lake. */
  def ensureBucketed(df: DataFrame, id: String, key: String, buckets: Int,
      location: Option[String] = None): String = {
    val session = df.sparkSession
    val cacheKey = System.identityHashCode(session).toString + "|" + id + "|" + key + "|" +
      buckets + "|" + location.getOrElse("")
    cache.computeIfAbsent(cacheKey, _ => {
      val name = "graft_bkt_" +
        java.lang.Long.toUnsignedString(
          org.apache.spark.unsafe.types.UTF8String.fromString(cacheKey).hashCode().toLong & 0xFFFFFFFFL, 16)
      val path = location.getOrElse(
        java.nio.file.Files.createTempDirectory(s"graft_bkt_").toString)
      df.write.mode("overwrite").option("path", path)
        .bucketBy(buckets, key).sortBy(key)
        .format("parquet").saveAsTable(name)
      name
    })
  }
}
