package graft.cdc.provider

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.cdc._
import org.apache.spark.sql.types._

import java.io.{BufferedReader, FileReader}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Append-only change-log-on-files provider (SURVEY.md §7.2
  * `FileLogProvider`): one directory per table
  *
  * {{{
  * <root>/<db>.<table>/meta.json       {"db","table","primaryKey":[..],
  *                                      "schema":"id BIGINT, name STRING",
  *                                      "baseOffset":N}
  * <root>/<db>.<table>/snapshot.jsonl  one JSON object per base row
  * <root>/<db>.<table>/log.jsonl       {"offset","op","tsMs","before","after"}
  * }}}
  *
  * Rows stream through a BufferedReader — per-reader memory is O(1) in table
  * size, matching the JDBC fetch-size streaming the reference relies on
  * (mysql/source/utils/StatementUtils.java:190-224). Files must be visible
  * to executors (shared/cluster filesystem), like any Spark file source.
  */
final class FileChangeLogProvider(root: String) extends ChangeLogProvider {
  private val mapper = new ObjectMapper()

  private case class TableFiles(meta: TableMeta, baseOffset: Long, dir: String)

  @transient private lazy val tableFiles: Seq[TableFiles] = {
    val dirs = Files.list(Paths.get(root)).iterator().asScala
      .filter(Files.isDirectory(_)).toSeq.sortBy(_.getFileName.toString)
    dirs.map { d =>
      val m = mapper.readTree(Files.readString(d.resolve("meta.json")))
      val id = TableId(m.get("db").asText(), m.get("table").asText())
      val pk = m.get("primaryKey").elements().asScala.map(_.asText()).toSeq
      val schema = StructType.fromDDL(m.get("schema").asText())
      TableFiles(TableMeta(id, schema, pk),
        if (m.has("baseOffset")) m.get("baseOffset").asLong() else 0L,
        d.toString)
    }
  }

  private def files(t: TableId): TableFiles =
    tableFiles.find(_.meta.id == t).getOrElse(
      throw new IllegalArgumentException(s"unknown table $t under $root"))

  override def tables: Seq[TableMeta] = tableFiles.map(_.meta)

  private def jsonLines[T](path: String)(f: JsonNode => T): CloseableIterator[T] = {
    if (!Files.exists(Paths.get(path)))
      return new CloseableIterator[T](Iterator.empty, () => ())
    val br = new BufferedReader(new FileReader(path))
    val it = new Iterator[T] {
      private var nextLine = br.readLine()
      def hasNext: Boolean = { if (nextLine == null) br.close(); nextLine != null }
      def next(): T = { val v = f(mapper.readTree(nextLine)); nextLine = br.readLine(); v }
    }
    new CloseableIterator(it, () => br.close())
  }

  private def decode(v: JsonNode, dt: DataType): Any =
    if (v == null || v.isNull) null
    else dt match {
      case LongType         => v.asLong()
      case IntegerType      => v.asInt()
      case ShortType        => v.asInt().toShort
      case ByteType         => v.asInt().toByte
      case DoubleType       => v.asDouble()
      case FloatType        => v.asDouble().toFloat
      case BooleanType      => v.asBoolean()
      case StringType       => v.asText()
      case TimestampType    => v.asLong() // micros since epoch
      case TimestampNTZType => v.asLong() // micros, unshifted frame
      case DateType         => v.asInt() // epoch days
      case _: DecimalType   => new java.math.BigDecimal(v.asText())
      case BinaryType       => java.util.Base64.getDecoder.decode(v.asText())
      case ArrayType(et, _) =>
        import scala.jdk.CollectionConverters._
        v.elements().asScala.map(decode(_, et)).toSeq
      case MapType(StringType, vt, _) =>
        import scala.jdk.CollectionConverters._
        v.properties().asScala.map(e => e.getKey -> decode(e.getValue, vt)).toMap
      case st: StructType =>
        st.fields.map(f => decode(v.get(f.name), f.dataType)): Array[Any]
      case other => throw new IllegalArgumentException(
        s"file provider cannot decode $other")
    }

  private def row(schema: StructType, node: JsonNode): Array[Any] =
    if (node == null || node.isNull) null
    else schema.fields.map(f => decode(node.get(f.name), f.dataType))

  override def currentOffset: Long =
    tableFiles.map { tf =>
      jsonLines(s"${tf.dir}/log.jsonl")(_.get("offset").asLong())
        .foldLeft(tf.baseOffset)(math.max)
    }.foldLeft(0L)(math.max)

  private def keyIdxs(tf: TableFiles): Seq[Int] = tf.meta.primaryKey.map(tf.meta.schema.fieldIndex)
  private def keyOf(tf: TableFiles, r: Array[Any]): ChunkKey.Key =
    ChunkKey.of(keyIdxs(tf).map(r): _*)

  override def keyBounds(table: TableId): (ChunkKey.Key, ChunkKey.Key, Long) = {
    val tf = files(table)
    var mn: ChunkKey.Key = null
    var mx: ChunkKey.Key = null
    var n = 0L
    jsonLines(s"${tf.dir}/snapshot.jsonl")(row(tf.meta.schema, _)).foreach { r =>
      val k = keyOf(tf, r)
      if (mn == null || ChunkKey.compare(k, mn) < 0) mn = k
      if (mx == null || ChunkKey.compare(k, mx) > 0) mx = k
      n += 1
    }
    if (n == 0) (ChunkKey.of(0L), ChunkKey.of(-1L), 0L) else (mn, mx, n)
  }

  override def nextChunkEnd(table: TableId, from: ChunkKey.Key, chunkSize: Int): Option[ChunkKey.Key] = {
    import ChunkKey.ordering
    val tf = files(table)
    val keys = jsonLines(s"${tf.dir}/snapshot.jsonl")(row(tf.meta.schema, _))
      .map(keyOf(tf, _)).filter(ChunkKey.compare(_, from) >= 0).toSeq.sorted.take(chunkSize)
    if (keys.size < chunkSize) None else Some(keys.last)
  }

  override def snapshotBase(table: TableId, range: SnapshotSplit): (Long, Iterator[Array[Any]]) = {
    val tf = files(table)
    val raw = jsonLines(s"${tf.dir}/snapshot.jsonl")(row(tf.meta.schema, _))
    (tf.baseOffset,
      new CloseableIterator(raw.filter(r => range.contains(keyOf(tf, r))), raw))
  }

  /** Optional `<table dir>/schema_log.jsonl`:
    * {"offset":N,"ddl":"ALTER TABLE ..."} per line. */
  override def schemaChanges(fromExclusive: Long, toInclusive: Long): Iterator[(Long, TableId, String)] =
    tableFiles.iterator.flatMap { tf =>
      jsonLines(s"${tf.dir}/schema_log.jsonl") { n =>
        (n.get("offset").asLong(), tf.meta.id, n.get("ddl").asText())
      }.filter(e => e._1 > fromExclusive && e._1 <= toInclusive)
    }

  override def log(table: TableId, fromExclusive: Long, toInclusive: Long): Iterator[LogRecord] = {
    val tf = files(table)
    val raw = jsonLines(s"${tf.dir}/log.jsonl") { n =>
      LogRecord(n.get("offset").asLong(), n.get("op").asText(), tf.meta.id,
        row(tf.meta.schema, n.get("before")), row(tf.meta.schema, n.get("after")),
        if (n.has("tsMs")) n.get("tsMs").asLong() else 0L)
    }
    new CloseableIterator(
      raw.filter(r => r.offset > fromExclusive && r.offset <= toInclusive), raw)
  }
}
