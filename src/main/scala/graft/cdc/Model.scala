package graft.cdc

import org.apache.spark.sql.types.StructType

/** Core changelog data model.
  *
  * Mirrors the reference's append-only op-column contract (the fork's one
  * deliberate semantic change vs upstream, see
  * flink-connector-debezium-log/src/main/java/cn/tenmg/cdc/log/debezium/table/RowDataDebeziumDeserializeSchema.java:117-146):
  * every change event carries an explicit op code (c/r/u/d) written as the
  * LAST column of each produced row, and deletes are emitted as plain append
  * rows built from the before-image. Spark Structured Streaming has no
  * retraction rows, so this append-only model maps onto it natively.
  */
object ChangeOp {
  val Create = "c"
  val Read   = "r" // snapshot
  val Update = "u"
  val Delete = "d"
  val all: Set[String] = Set(Create, Read, Update, Delete)
}

/** db.table identity (reference: io.debezium TableId used throughout, e.g.
  * flink-connector-mysql-cdc-log/.../source/utils/TableDiscoveryUtils.java). */
final case class TableId(db: String, table: String) {
  override def toString = s"$db.$table"
}
object TableId {
  def parse(s: String): TableId = s.split('.') match {
    case Array(d, t) => TableId(d, t)
    case _           => TableId("default", s)
  }
}

/** One raw change event in the log, before op-column flattening.
  *
  * `before`/`after` are positional field arrays matching the table schema.
  * `offset` is the total-ordered log position (reference BinlogOffset with
  * isAtOrAfter/isBefore, mysql/source/offset/BinlogOffset.java — our file/
  * synthetic logs use a single monotonically increasing Long).
  * `tsMs` is the source-side commit timestamp (source.ts_ms); snapshot reads
  * carry tsMs=0 (reference RecordUtils.java:197-225 forces ts_ms=0 on
  * snapshot rows so op_ts=0 marks snapshot reads).
  */
final case class LogRecord(
    offset: Long,
    op: String,
    tableId: TableId,
    before: Array[Any],
    after: Array[Any],
    tsMs: Long)

/** Table metadata a provider exposes (schema + primary key). */
final case class TableMeta(id: TableId, schema: StructType, primaryKey: Seq[String])

/** A snapshot chunk split: primary-key range [start, end).
  * null bound = unbounded (reference MySqlSnapshotSplit,
  * mysql/source/split/MySqlSnapshotSplit.java). Keys are compared with
  * ChunkSplitter.compareKey. */
final case class SnapshotSplit(
    tableId: TableId,
    splitId: Int,
    start: Option[Long],
    end: Option[Long]) {
  /** Reference RecordUtils.splitKeyRangeContains (used by the binlog emit
    * filter at mysql/debezium/reader/BinlogSplitReader.java:212-214). */
  def contains(key: Long): Boolean =
    start.forall(key >= _) && end.forall(key < _)
}

/** A finished chunk: its range plus the high watermark (log offset) the
  * chunk was consistent at. The log-phase emit filter needs the full list
  * (reference FinishedSnapshotSplitInfo, base/source/meta/split/). */
final case class FinishedSplitInfo(split: SnapshotSplit, highWatermark: Long)
