package graft.cdc

/** Pushed-down scan SQL generation for JDBC-backed providers — the Spark
  * counterpart of the reference's StatementUtils
  * (mysql/source/utils/StatementUtils.java): the handful of aggregate
  * probes and range scans the source pushes into the upstream database so
  * planning never scans data.
  */
object JdbcSql {

  /** SQL-dialect knobs: identifier quoting and LIMIT syntax. MySQL-family
    * is the default (backticks + LIMIT, as in the reference); ANSI covers
    * Derby/Postgres-style double quotes + FETCH FIRST. */
  final case class Dialect(quoteChar: String = "`", useFetchFirst: Boolean = false) {
    def q(id: String): String = quoteChar + id.replace(quoteChar, quoteChar * 2) + quoteChar
    def limit(n: Int): String =
      if (useFetchFirst) s"FETCH FIRST $n ROWS ONLY" else s"LIMIT $n"
  }
  val MySqlDialect: Dialect = Dialect()
  val AnsiDialect: Dialect = Dialect(quoteChar = "\"", useFetchFirst = true)

  def qualified(t: TableId, d: Dialect = MySqlDialect): String =
    s"${d.q(t.db)}.${d.q(t.table)}"

  /** SELECT MIN(pk), MAX(pk) (StatementUtils.java:40-56). */
  def minMaxQuery(t: TableId, pk: String, d: Dialect = MySqlDialect): String =
    s"SELECT MIN(${d.q(pk)}), MAX(${d.q(pk)}) FROM ${qualified(t, d)}"

  /** Approximate row count via table status (StatementUtils.java:58-76) —
    * MySQL-specific fast path. */
  def approxCountQuery(t: TableId): String =
    s"SHOW TABLE STATUS LIKE '${t.table}'"

  /** Portable exact row count — the fallback when the store has no cheap
    * statistics probe. */
  def countQuery(t: TableId, d: Dialect = MySqlDialect): String =
    s"SELECT COUNT(*) FROM ${qualified(t, d)}"

  /** Next chunk boundary: MAX(pk) of the next `chunkSize` keys past `from`
    * (StatementUtils.java:99-130). */
  def chunkBoundaryQuery(t: TableId, pk: String, chunkSize: Int,
      d: Dialect = MySqlDialect): String =
    s"SELECT MAX(${d.q(pk)}) FROM (" +
      s"SELECT ${d.q(pk)} FROM ${qualified(t, d)} WHERE ${d.q(pk)} >= ? " +
      s"ORDER BY ${d.q(pk)} ASC ${d.limit(chunkSize)}) AS T"

  /** Chunk range scan with half-open semantics (StatementUtils.java:132-188):
    * unbounded below / bounded / unbounded above. */
  def rangeScanQuery(t: TableId, pk: String,
      hasLowerBound: Boolean, hasUpperBound: Boolean,
      d: Dialect = MySqlDialect): String = {
    val base = s"SELECT * FROM ${qualified(t, d)}"
    (hasLowerBound, hasUpperBound) match {
      case (false, false) => base
      case (true, false)  => s"$base WHERE ${d.q(pk)} >= ?"
      case (false, true)  => s"$base WHERE ${d.q(pk)} < ?"
      case (true, true)   => s"$base WHERE ${d.q(pk)} >= ? AND ${d.q(pk)} < ?"
    }
  }

  /** Streaming-fetch hints for the chunk scan (StatementUtils.java:190-224:
    * fetchSize + MySQL streaming result sets). */
  val DefaultFetchSize = 1024
}
