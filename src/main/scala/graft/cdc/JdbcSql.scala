package graft.cdc

/** Pushed-down scan SQL generation for JDBC-backed providers — the Spark
  * counterpart of the reference's StatementUtils
  * (mysql/source/utils/StatementUtils.java): the handful of aggregate
  * probes and range scans the source pushes into the upstream database so
  * planning never scans data.
  */
object JdbcSql {
  private def q(id: String): String = "`" + id.replace("`", "``") + "`"
  def qualified(t: TableId): String = s"${q(t.db)}.${q(t.table)}"

  /** SELECT MIN(pk), MAX(pk) (StatementUtils.java:40-56). */
  def minMaxQuery(t: TableId, pk: String): String =
    s"SELECT MIN(${q(pk)}), MAX(${q(pk)}) FROM ${qualified(t)}"

  /** Approximate row count via table status (StatementUtils.java:58-76). */
  def approxCountQuery(t: TableId): String =
    s"SHOW TABLE STATUS LIKE '${t.table}'"

  /** Next chunk boundary: MAX(pk) of the next `chunkSize` keys past `from`
    * (StatementUtils.java:99-130). */
  def chunkBoundaryQuery(t: TableId, pk: String, chunkSize: Int): String =
    s"SELECT MAX(${q(pk)}) FROM (" +
      s"SELECT ${q(pk)} FROM ${qualified(t)} WHERE ${q(pk)} >= ? " +
      s"ORDER BY ${q(pk)} ASC LIMIT $chunkSize) AS T"

  /** Chunk range scan with half-open semantics (StatementUtils.java:132-188):
    * unbounded below / bounded / unbounded above. */
  def rangeScanQuery(t: TableId, pk: String,
      hasLowerBound: Boolean, hasUpperBound: Boolean): String = {
    val base = s"SELECT * FROM ${qualified(t)}"
    (hasLowerBound, hasUpperBound) match {
      case (false, false) => base
      case (true, false)  => s"$base WHERE ${q(pk)} >= ?"
      case (false, true)  => s"$base WHERE ${q(pk)} < ?"
      case (true, true)   => s"$base WHERE ${q(pk)} >= ? AND ${q(pk)} < ?"
    }
  }

  /** Streaming-fetch hints for the chunk scan (StatementUtils.java:190-224:
    * fetchSize + MySQL streaming result sets). */
  val DefaultFetchSize = 1024
}
