package graft.cdc

import scala.collection.mutable.ArrayBuffer

/** Snapshot chunk planning — a Scala re-derivation of the reference's
  * distribution-factor chunking (mysql/source/assigners/ChunkSplitter.java:
  * 76-118 generateSplits, :144-161 factor decision, :171-194 even split,
  * :197-245 uneven split, :284-309 factor math).
  *
  * Planning is driver-side and cheap: two MIN/MAX probes plus an approximate
  * row count decide between arithmetic even stepping (no further queries)
  * and query-driven uneven chunking (one boundary probe per chunk). At 100 TB
  * this is exactly the part that must NOT scan data — it only issues
  * aggregate probes the upstream store answers from its index/stats, then
  * hands each resulting range to a parallel executor-side reader.
  */
object ChunkSplitter {

  /** Config mirroring MySqlSourceOptions defaults
    * (mysql/source/config/MySqlSourceOptions.java:103-108,186-208). */
  final case class Config(
      chunkSize: Int = 8096,
      distributionFactorUpper: Double = 1000.0,
      distributionFactorLower: Double = 0.05)

  /** Boundary oracle for uneven chunking: the max key of the next chunk,
    * i.e. SELECT MAX(pk) FROM (SELECT pk FROM t WHERE pk >= from ORDER BY pk
    * LIMIT chunkSize) (reference StatementUtils.java:99-130). Returns None
    * when fewer than chunkSize keys remain past `from`. */
  type NextChunkEnd = (Long, Int) => Option[Long]

  /** (max - min + 1) / rowCount (reference ChunkSplitter.java:284-309). */
  def distributionFactor(min: Long, max: Long, rowCount: Long): Double =
    if (rowCount == 0) Double.MaxValue
    else (max - min + 1).toDouble / rowCount.toDouble

  def isEvenlyDistributed(factor: Double, cfg: Config): Boolean =
    factor >= cfg.distributionFactorLower && factor <= cfg.distributionFactorUpper

  /** Even case: arithmetic stepping by dynamicChunkSize = factor × chunkSize
    * (min 1) — zero extra queries (reference ChunkSplitter.java:155,171-194). */
  def splitEvenly(tableId: TableId, min: Long, max: Long, dynamicChunkSize: Long): Seq[SnapshotSplit] = {
    require(dynamicChunkSize >= 1)
    val out = ArrayBuffer.empty[SnapshotSplit]
    var start = min
    var id = 0
    var chunkStart: Option[Long] = None // first chunk unbounded below
    while (start <= max) {
      val end = start + dynamicChunkSize
      val chunkEnd = if (end > max) None else Some(end) // last chunk unbounded above
      out += SnapshotSplit(tableId, id, chunkStart, chunkEnd)
      chunkStart = Some(end)
      start = end
      id += 1
    }
    if (out.isEmpty) out += SnapshotSplit(tableId, 0, None, None)
    out.toSeq
  }

  /** Uneven case: each chunk end comes from a boundary probe
    * (reference ChunkSplitter.java:197-245). */
  def splitUnevenly(tableId: TableId, min: Long, max: Long, chunkSize: Int,
      nextChunkEnd: NextChunkEnd): Seq[SnapshotSplit] = {
    val out = ArrayBuffer.empty[SnapshotSplit]
    var id = 0
    var chunkStart: Option[Long] = None
    var from = min
    var done = false
    while (!done) {
      nextChunkEnd(from, chunkSize).filter(_ < max) match {
        case Some(end) if chunkStart.contains(end) =>
          // boundary did not advance (heavy duplicate keys): widen until it does
          from = end + 1
        case Some(end) =>
          out += SnapshotSplit(tableId, id, chunkStart, Some(end))
          chunkStart = Some(end); from = end; id += 1
        case None =>
          out += SnapshotSplit(tableId, id, chunkStart, None)
          done = true
      }
    }
    out.toSeq
  }

  /** Full planning flow (reference ChunkSplitter.generateSplits:76-118 +
    * splitTableIntoChunks:144-161). */
  def plan(tableId: TableId, min: Long, max: Long, approxRowCount: Long,
      cfg: Config = Config(), nextChunkEnd: NextChunkEnd): Seq[SnapshotSplit] = {
    val factor = distributionFactor(min, max, approxRowCount)
    if (isEvenlyDistributed(factor, cfg)) {
      val dynamic = math.max(math.round(factor * cfg.chunkSize), 1L)
      splitEvenly(tableId, min, max, dynamic)
    } else {
      splitUnevenly(tableId, min, max, cfg.chunkSize, nextChunkEnd)
    }
  }
}
