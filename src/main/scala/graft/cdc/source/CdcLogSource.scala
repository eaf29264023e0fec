package graft.cdc.source

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.cdc._
import graft.cdc.provider.{ChangeLogProvider, FileChangeLogProvider, ProviderRegistry}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** Resolved source options. Mirrors the reference's table-factory option
  * surface (mysql/source/config/MySqlSourceOptions.java:32-214,
  * mysql/table/StartupOptions.java:39-78) with the same keys where they
  * translate. Serializable — shipped inside every InputPartition. */
final case class CdcOptions(
    providerKind: String, // registry | file | class
    providerArg: String,
    databaseRegex: String,
    tableRegex: String,
    chunkSize: Int,
    startupMode: String, // initial | earliest | latest | timestamp | specific-offset
    startupTimestampMs: Long,
    startupSpecificOffset: Long,
    maxOffsetsPerBatch: Long,
    metadataCols: Seq[String],
    /** "full" = before+after update pairs (MySQL-family, §1.3); "upsert" =
      * no before-images: update → one +U row, delete → key-only -D row —
      * the MongoDB change-streams shape (MongoDBConnectorDeserializationSchema
      * .java:118-163, ChangelogMode without UPDATE_BEFORE). */
    changelogMode: String = "full") {

  def resolveProvider(): ChangeLogProvider = providerKind match {
    case "registry" => ProviderRegistry.get(providerArg)
    case "file"     => new FileChangeLogProvider(providerArg)
    case "class" => Class.forName(providerArg).getDeclaredConstructor()
      .newInstance().asInstanceOf[ChangeLogProvider]
    case other => throw new IllegalArgumentException(s"unknown provider kind '$other'")
  }

  def matchedTables(p: ChangeLogProvider): Seq[TableMeta] = {
    val ms = p.tables.filter(t =>
      t.id.db.matches(databaseRegex) && t.id.table.matches(tableRegex))
    require(ms.nonEmpty, s"no tables match database-name='$databaseRegex' table-name='$tableRegex'")
    require(ms.map(_.schema).distinct.size == 1,
      s"matched tables must share one schema (sharding-union contract): ${ms.map(_.id)}")
    ms
  }
}

object CdcOptions {
  val OpCol = "op"
  val MetaDatabaseName = "database_name"
  val MetaTableName = "table_name"
  val MetaOpTs = "op_ts"
  /** Log position of the event (snapshot rows: the watermark offset the
    * chunk is consistent at). Spark has no RowKind channel, so exact
    * changelog materialization needs the total order as data. */
  val MetaOffset = "op_offset"
  /** Flink RowKind shortString the reference attaches internally
    * (RowDataDebeziumDeserializeSchema.java:121-145): '+I' for c/r and for
    * the fork's delete-as-insert rows, '-U'/'+U' for the update pair —
    * the only way to tell an update's before-image from its after-image. */
  val MetaRowKind = "row_kind"

  def from(o: CaseInsensitiveStringMap): CdcOptions = {
    val (kind, arg) =
      if (o.containsKey("path")) ("file", o.get("path"))
      else if (o.containsKey("provider.name")) ("registry", o.get("provider.name"))
      else if (o.containsKey("provider.class")) ("class", o.get("provider.class"))
      else throw new IllegalArgumentException(
        "one of path / provider.name / provider.class is required")
    val meta = Option(o.get("metadata.columns")).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val bad = meta.filterNot(Set(MetaDatabaseName, MetaTableName, MetaOpTs, MetaOffset, MetaRowKind))
    require(bad.isEmpty, s"unknown metadata.columns: $bad")
    CdcOptions(kind, arg,
      o.getOrDefault("database-name", ".*"),
      o.getOrDefault("table-name", ".*"),
      o.getInt("scan.incremental.snapshot.chunk.size", 8096),
      o.getOrDefault("scan.startup.mode", "initial"),
      o.getLong("scan.startup.timestamp-millis", 0L),
      o.getLong("scan.startup.specific-offset", 0L),
      o.getLong("scan.log.max-offsets-per-batch", Long.MaxValue),
      meta,
      o.getOrDefault("changelog.mode", "full"))
  }

  /** physical ++ op STRING ++ requested metadata — the fork's contract of a
    * trailing op column (reference README.md:38-52,
    * RowDataDebeziumDeserializeSchema.java:125,131,137,143). */
  def producedSchema(physical: StructType, metadataCols: Seq[String]): StructType = {
    val metaFields = metadataCols.map {
      case MetaDatabaseName => StructField(MetaDatabaseName, StringType)
      case MetaTableName    => StructField(MetaTableName, StringType)
      case MetaOpTs         => StructField(MetaOpTs, TimestampType)
      case MetaOffset       => StructField(MetaOffset, LongType)
      case MetaRowKind      => StructField(MetaRowKind, StringType)
    }
    StructType((physical.fields.toSeq :+ StructField(OpCol, StringType)) ++ metaFields)
  }
}

// ---------------------------------------------------------------------------
// Offsets
// ---------------------------------------------------------------------------

/** Streaming offset: snapshot-phase flag + global log position + the planned
  * chunk ranges (persisted so planInputPartitions replays deterministically
  * after driver restart — the Spark analogue of the reference's
  * PendingSplitsState checkpointing,
  * mysql/source/assigners/state/PendingSplitsStateSerializer.java). */
final case class CdcOffset(
    snapshotDone: Boolean,
    logPos: Long,
    splits: Map[String, Seq[(Option[Long], Option[Long])]]) extends Offset {

  override def json(): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("snapshotDone", snapshotDone)
    root.put("logPos", logPos)
    val ts = root.putObject("splits")
    splits.toSeq.sortBy(_._1).foreach { case (t, rs) =>
      val arr = ts.putArray(t)
      rs.foreach { case (s, e) =>
        val pair = arr.addArray()
        s.fold(pair.addNull())(v => pair.add(v))
        e.fold(pair.addNull())(v => pair.add(v))
      }
    }
    m.writeValueAsString(root)
  }
}

object CdcOffset {
  def parse(json: String): CdcOffset = {
    val root = new ObjectMapper().readTree(json).asInstanceOf[ObjectNode]
    val splits = root.get("splits").properties().asScala.map { e =>
      val rs = e.getValue.elements().asScala.map { pair =>
        val it = pair.elements().asScala.toSeq
        (if (it(0).isNull) None else Some(it(0).asLong()),
         if (it(1).isNull) None else Some(it(1).asLong()))
      }.toSeq
      e.getKey -> rs
    }.toMap
    CdcOffset(root.get("snapshotDone").asBoolean(), root.get("logPos").asLong(), splits)
  }
}

// ---------------------------------------------------------------------------
// Partitions + readers
// ---------------------------------------------------------------------------

/** One snapshot chunk: read base rows, fold the catch-up log slice up to
  * `upTo` (the driver-pinned high watermark) — Normalizer.normalize is the
  * reference's RecordUtils.upsertBinlog running inside a Spark partition. */
final case class ChunkPartition(opts: CdcOptions, table: TableId, physical: StructType,
    pk: String, start: Option[Long], end: Option[Long], upTo: Long) extends InputPartition

/** One log slice (fromExclusive, toInclusive] for one table. Single
  * partition per table = the reference's single binlog reader; per-table
  * parallelism comes from multiplexing tables. */
final case class LogPartition(opts: CdcOptions, table: TableId, physical: StructType,
    fromExclusive: Long, toInclusive: Long) extends InputPartition

final case class CdcReaderFactory(produced: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: ChunkPartition => new ChunkReader(p, produced)
      case p: LogPartition   => new LogReader(p, produced)
    }
}

/** Converts provider field arrays to InternalRows of the produced schema,
  * appending op + metadata columns. Handles column pruning: `produced` is
  * the (possibly pruned) read schema. */
private[source] final class RowBuilder(physical: StructType, produced: StructType, table: TableId) {
  // for each produced field: Left(physicalIndex) or Right(special)
  private val slots: Array[Either[Int, String]] = produced.fields.map { f =>
    val i = physical.fieldNames.indexOf(f.name)
    if (i >= 0) Left(i) else Right(f.name)
  }
  private val types: Array[DataType] = produced.fields.map(_.dataType)
  private val dbU = UTF8String.fromString(table.db)
  private val tblU = UTF8String.fromString(table.table)

  private def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                 => null
    case (s: String, StringType)   => UTF8String.fromString(s)
    case (l: Long, LongType)       => l
    case (i: Int, IntegerType)     => i
    case (i: Int, LongType)        => i.toLong
    case (d: Double, DoubleType)   => d
    case (f: Float, FloatType)     => f
    case (b: Boolean, BooleanType) => b
    case (l: Long, TimestampType)  => l // already micros
    case (t: java.sql.Timestamp, TimestampType) => t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case (d: java.math.BigDecimal, dec: DecimalType) =>
      org.apache.spark.sql.types.Decimal(d, dec.precision, dec.scale)
    case (other, t) => throw new IllegalArgumentException(
      s"unsupported value ${other.getClass} for $t")
  }

  def build(fields: Array[Any], op: String, tsMs: Long, offset: Long,
      rowKind: String): InternalRow = {
    val out = new Array[Any](slots.length)
    var i = 0
    while (i < slots.length) {
      out(i) = slots(i) match {
        case Left(pi) => toCatalyst(fields(pi), types(i))
        case Right(CdcOptions.OpCol)            => UTF8String.fromString(op)
        case Right(CdcOptions.MetaDatabaseName) => dbU
        case Right(CdcOptions.MetaTableName)    => tblU
        case Right(CdcOptions.MetaOpTs)         => tsMs * 1000L // ms → micros
        case Right(CdcOptions.MetaOffset)       => offset
        case Right(CdcOptions.MetaRowKind)      => UTF8String.fromString(rowKind)
        case Right(other) => throw new IllegalStateException(s"unknown produced col $other")
      }
      i += 1
    }
    new GenericInternalRow(out)
  }
}

final class ChunkReader(p: ChunkPartition, produced: StructType)
  extends PartitionReader[InternalRow] {
  private val provider = p.opts.resolveProvider()
  private val builder = new RowBuilder(p.physical, produced, p.table)
  private val keyIdx = p.physical.fieldIndex(p.pk)
  private def keyOf(r: Array[Any]): Long = r(keyIdx) match {
    case l: Long => l; case i: Int => i.toLong
    case o       => throw new IllegalArgumentException(s"non-numeric chunk key $o")
  }
  private val iter: Iterator[InternalRow] = {
    val range = SnapshotSplit(p.table, 0, p.start, p.end)
    val (baseOffset, base) = provider.snapshotBase(p.table, range)
    val catchUp = provider.log(p.table, baseOffset, p.upTo)
      .filter(r => range.contains(keyOf(if (r.op == ChangeOp.Delete) r.before else r.after)))
    // snapshot rows: op='r', ts forced to 0 (reference RecordUtils.java:197-225)
    Normalizer.normalize(base, catchUp, keyOf)
      .map(builder.build(_, ChangeOp.Read, 0L, p.upTo, "+I"))
  }
  private var cur: InternalRow = _
  override def next(): Boolean = { if (iter.hasNext) { cur = iter.next(); true } else false }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

final class LogReader(p: LogPartition, produced: StructType)
  extends PartitionReader[InternalRow] {
  private val provider = p.opts.resolveProvider()
  private val builder = new RowBuilder(p.physical, produced, p.table)
  private val iter: Iterator[InternalRow] = {
    val raw = provider.log(p.table, p.fromExclusive, p.toInclusive)
    // F5 timestamp seek (reference SeekBinlogToTimestampFilter.java:62-79)
    val seeked =
      if (p.opts.startupMode == "timestamp") Normalizer.timestampSeek(raw, p.opts.startupTimestampMs)
      else raw
    seeked.flatMap { r =>
      r.op match {
        case ChangeOp.Create =>
          Iterator(builder.build(r.after, ChangeOp.Create, r.tsMs, r.offset, "+I"))
        // full mode: update → two rows (before then after), both op='u'
        // (reference RowDataDebeziumDeserializeSchema.java:133-145); RowKind
        // -U/+U rides in the row_kind metadata column when requested.
        // upsert mode (MongoDB change streams, no before-image): one +U row
        // (MongoDBConnectorDeserializationSchema.java:118-163)
        case ChangeOp.Update if p.opts.changelogMode == "upsert" =>
          Iterator(builder.build(r.after, ChangeOp.Update, r.tsMs, r.offset, "+U"))
        case ChangeOp.Update => Iterator(
          builder.build(r.before, ChangeOp.Update, r.tsMs, r.offset, "-U"),
          builder.build(r.after, ChangeOp.Update, r.tsMs, r.offset, "+U"))
        // full mode: delete → append row from the BEFORE image, op='d',
        // RowKind +I — the fork's delete-as-insert semantics
        // (RowDataDebeziumDeserializeSchema.java:127-132).
        // upsert mode: key-only -D row built from the documentKey
        case ChangeOp.Delete =>
          val kind = if (p.opts.changelogMode == "upsert") "-D" else "+I"
          Iterator(builder.build(r.before, ChangeOp.Delete, r.tsMs, r.offset, kind))
        case other => throw new IllegalStateException(s"unexpected op '$other' in log")
      }
    }
  }
  private var cur: InternalRow = _
  override def next(): Boolean = { if (iter.hasNext) { cur = iter.next(); true } else false }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

// ---------------------------------------------------------------------------
// Scan / stream
// ---------------------------------------------------------------------------

final class CdcScan(opts: CdcOptions, physical: StructType, produced: StructType,
    matched: Seq[TableMeta]) extends Scan {
  override def readSchema(): StructType = produced
  override def toBatch: Batch = new CdcBatch(opts, physical, produced, matched)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(opts, physical, produced, matched)
  override def description(): String =
    s"cdc-log tables=${matched.map(_.id).mkString(",")} mode=${opts.startupMode}"
}

/** Batch scan = parallel chunked snapshot at the current log position
  * (op='r' rows) — the snapshot phase as a standalone bounded read. */
final class CdcBatch(opts: CdcOptions, physical: StructType, produced: StructType,
    matched: Seq[TableMeta]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val provider = opts.resolveProvider()
    val upTo = provider.currentOffset
    CdcPlanner.chunkPartitions(opts, provider, matched, upTo).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = CdcReaderFactory(produced)
}

object CdcPlanner {
  /** Driver-side chunk planning across matched tables (reference
    * enumerator + ChunkSplitter role). */
  def chunkPartitions(opts: CdcOptions, provider: ChangeLogProvider,
      matched: Seq[TableMeta], upTo: Long): Seq[InputPartition] =
    matched.flatMap { tm =>
      planSplits(opts, provider, tm).map(sp =>
        ChunkPartition(opts, tm.id, tm.schema, tm.primaryKey.head, sp.start, sp.end, upTo))
    }

  def planSplits(opts: CdcOptions, provider: ChangeLogProvider, tm: TableMeta): Seq[SnapshotSplit] = {
    val (mn, mx, cnt) = provider.keyBounds(tm.id)
    if (cnt == 0) Seq(SnapshotSplit(tm.id, 0, None, None))
    else ChunkSplitter.plan(tm.id, mn, mx, cnt,
      ChunkSplitter.Config(chunkSize = opts.chunkSize),
      (from, sz) => provider.nextChunkEnd(tm.id, from, sz))
  }
}

final class CdcMicroBatchStream(opts: CdcOptions, physical: StructType,
    produced: StructType, matched: Seq[TableMeta]) extends MicroBatchStream {

  private lazy val provider = opts.resolveProvider()
  @volatile private var lastLogPos: Long = -1L

  override def initialOffset(): Offset = {
    val cur = provider.currentOffset
    opts.startupMode match {
      case "initial" =>
        val splits = matched.map { tm =>
          tm.id.toString -> CdcPlanner.planSplits(opts, provider, tm).map(s => (s.start, s.end))
        }.toMap
        CdcOffset(snapshotDone = false, logPos = cur, splits = splits)
      case "earliest"        => CdcOffset(snapshotDone = true, 0L, Map.empty)
      case "latest"          => CdcOffset(snapshotDone = true, cur, Map.empty)
      case "timestamp"       => CdcOffset(snapshotDone = true, 0L, Map.empty)
      case "specific-offset" => CdcOffset(snapshotDone = true, opts.startupSpecificOffset, Map.empty)
      case other => throw new IllegalArgumentException(s"unknown scan.startup.mode '$other'")
    }
  }

  override def latestOffset(): Offset = {
    val cur = provider.currentOffset
    // saturating add — lastLogPos + Long.MaxValue must not wrap negative
    val cap =
      if (lastLogPos < 0) cur
      else if (lastLogPos > Long.MaxValue - opts.maxOffsetsPerBatch) Long.MaxValue
      else lastLogPos + opts.maxOffsetsPerBatch
    CdcOffset(snapshotDone = true, math.min(cur, cap), Map.empty)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcOffset]
    val e = end.asInstanceOf[CdcOffset]
    lastLogPos = e.logPos
    val byId = matched.map(t => t.id.toString -> t).toMap
    val chunks: Seq[InputPartition] =
      if (!s.snapshotDone) s.splits.toSeq.sortBy(_._1).flatMap { case (tid, ranges) =>
        val tm = byId(tid)
        ranges.map { case (st, en) =>
          ChunkPartition(opts, tm.id, tm.schema, tm.primaryKey.head, st, en, s.logPos)
        }
      } else Seq.empty
    val logs: Seq[InputPartition] =
      if (e.logPos > s.logPos)
        matched.map(tm => LogPartition(opts, tm.id, tm.schema, s.logPos, e.logPos))
      else Seq.empty
    (chunks ++ logs).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = CdcReaderFactory(produced)
  override def deserializeOffset(json: String): Offset = CdcOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

// ---------------------------------------------------------------------------
// Table / provider registration
// ---------------------------------------------------------------------------

final class CdcScanBuilder(opts: CdcOptions, physical: StructType, full: StructType,
    matched: Seq[TableMeta]) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var pruned: StructType = full
  // Catalyst prunes unused columns down to the reader (free column pruning;
  // the reference strips computed/meta columns similarly,
  // flink-connector-debezium-log/.../utils/ResolvedSchemaUtils.java:33-40).
  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = StructType(full.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new CdcScan(opts, physical, pruned, matched)
}

final class CdcLogTable(opts: CdcOptions, physical: StructType, full: StructType,
    matched: Seq[TableMeta]) extends Table with SupportsRead {
  override def name(): String = s"cdc-log(${matched.map(_.id).mkString(",")})"
  override def schema(): StructType = full
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new CdcScanBuilder(opts, physical, full, matched)
}

/** `spark.read/readStream.format("cdc-log")` entry point (registered via
  * META-INF/services, the Spark analogue of the reference's
  * DynamicTableSourceFactory SPI, mysql/table/MySqlTableSourceFactory.java). */
final class CdcLogTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cdc-log"

  private def resolve(o: CaseInsensitiveStringMap): (CdcOptions, StructType, Seq[TableMeta]) = {
    val opts = CdcOptions.from(o)
    val matched = opts.matchedTables(opts.resolveProvider())
    (opts, matched.head.schema, matched)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (opts, physical, _) = resolve(options)
    CdcOptions.producedSchema(physical, opts.metadataCols)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val o = new CaseInsensitiveStringMap(properties)
    val (opts, physical, matched) = resolve(o)
    new CdcLogTable(opts, physical, schema, matched)
  }

  override def supportsExternalMetadata(): Boolean = false
}
