package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Battery: q01–q145, `queries.size` entries in total (no q66, and no
  * q33/q34 — the xxhash64 fast paths
  * were folded into their oracle-checked md5 twins q42/q82 in round 11:
  * identical band/vote pipelines, portable base hash, so the twins ARE
  * the check; the xxhash64 family stays quality-pinned in
  * DedupSimilaritySpec). EVERY battery entry is oracle-checked — q55's
  * estimates as a BOUNDED check (in-band boolean vs the oracle's
  * independent exact count, exact side also gated as q84). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelQueries.queries ++ CdcQueries.queries ++ DataQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelQueries.oracle ++ CdcQueries.oracle ++ DataQueries.oracle
}
