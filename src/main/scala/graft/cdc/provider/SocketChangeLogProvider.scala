package graft.cdc.provider

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.cdc._
import org.apache.spark.sql.types._

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** A ChangeLogProvider over a live TCP stream of JSONL change events — the
  * proof that the provider SPI carries a genuinely UNBOUNDED non-file
  * source end-to-end through snapshot cohorts and Trigger.AvailableNow.
  * This is the seam a real binlog/oplog client plugs into (What a live
  * MySQL client would be: the reference's embedded-engine thread,
  * DebeziumSourceFunction.java:109-368, feeding its Handover).
  *
  * Architecture = the reference's producer/consumer handover (W5,
  * debezium/internal/Handover.java:52-140) made Spark-shaped:
  *  - a daemon CLIENT THREAD tails the socket, parses one change event per
  *    line ({"offset","op","tsMs","before","after"} — FileChangeLogProvider
  *    conventions), and appends to an in-memory ordered spool;
  *  - SPI calls (currentOffset / log / snapshotBase) serve from the spool
  *    on the caller's thread — planning probes and partition readers never
  *    block on the network;
  *  - an error on the client thread is captured and re-thrown on the next
  *    SPI call (Handover's error-propagation contract, :107-140).
  *
  * The source is LOG-ONLY (empty base; `startup.mode=initial` folds the
  * spooled log into its single unbounded chunk), which is exactly what a
  * wire protocol gives you. The spool is retained so `log(from, to)` can
  * replay any slice (micro-batch retries, multi-cohort suppression); a
  * production client would spool to disk/object storage past a retention
  * bound — the SPI surface is identical.
  *
  * Lives behind ProviderRegistry (a live socket is not serializable): in
  * local mode readers share the JVM; on a cluster a live-client provider
  * registers per-executor via the `provider.class` path instead. */
final class SocketChangeLogProvider(host: String, port: Int, meta: TableMeta)
  extends ChangeLogProvider with AutoCloseable {

  @transient private val mapper = new ObjectMapper()
  @transient private val spool = scala.collection.mutable.ArrayBuffer.empty[LogRecord]
  @transient @volatile private var failure: Throwable = null
  @transient @volatile private var closed = false

  @transient private val socket = new Socket(host, port)

  @transient private val client = new Thread(() => {
    try {
      val in = new BufferedReader(
        new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
      var line = in.readLine()
      while (line != null && !closed) {
        if (line.trim.nonEmpty) {
          val rec = parse(mapper.readTree(line))
          synchronized {
            require(spool.isEmpty || rec.offset > spool.last.offset,
              s"socket log must be append-ordered: got ${rec.offset} after ${spool.last.offset}")
            spool += rec
          }
        }
        line = in.readLine()
      }
    } catch {
      case _: Throwable if closed => () // normal shutdown race
      case t: Throwable           => failure = t
    }
  }, s"cdc-socket-client-$host:$port")
  client.setDaemon(true)
  client.start()

  private def parse(n: JsonNode): LogRecord = {
    def row(node: JsonNode): Array[Any] =
      if (node == null || node.isNull) null
      else meta.schema.fields.map[Any] { f =>
        val v = node.get(f.name)
        if (v == null || v.isNull) null
        else f.dataType match {
          case LongType    => v.asLong()
          case IntegerType => v.asInt()
          case DoubleType  => v.asDouble()
          case BooleanType => v.asBoolean()
          case StringType  => v.asText()
          case other => throw new IllegalArgumentException(
            s"socket provider demo decodes scalar types only, got $other")
        }
      }
    LogRecord(n.get("offset").asLong(), n.get("op").asText(), meta.id,
      row(n.get("before")), row(n.get("after")),
      if (n.has("tsMs")) n.get("tsMs").asLong() else 0L)
  }

  private def checkFailure(): Unit = {
    val f = failure
    if (f != null) throw new IllegalStateException(
      s"cdc socket client for ${meta.id} died: ${f.getMessage}", f)
  }

  override def tables: Seq[TableMeta] = Seq(meta)

  override def currentOffset: Long = synchronized {
    checkFailure()
    if (spool.isEmpty) 0L else spool.last.offset
  }

  /** Log-only: the base is empty at offset 0; the chunk fold replays the
    * spool. */
  override def keyBounds(table: TableId): (ChunkKey.Key, ChunkKey.Key, Long) = {
    checkFailure()
    (ChunkKey.of(0L), ChunkKey.of(-1L), 0L)
  }

  override def nextChunkEnd(table: TableId, from: ChunkKey.Key, chunkSize: Int): Option[ChunkKey.Key] = None

  override def snapshotBase(table: TableId, range: SnapshotSplit): (Long, Iterator[Array[Any]]) = {
    checkFailure()
    (0L, Iterator.empty)
  }

  override def log(table: TableId, fromExclusive: Long, toInclusive: Long): Iterator[LogRecord] =
    synchronized {
      checkFailure()
      // spool is append-ordered; slice eagerly so the iterator needs no lock
      spool.filter(r => r.offset > fromExclusive && r.offset <= toInclusive).toSeq.iterator
    }

  override def validate(): Unit = {
    checkFailure()
    if (!client.isAlive && failure == null && !closed)
      throw new ValidationException(s"socket client thread for ${meta.id} is not running")
    val missing = meta.primaryKey.filterNot(meta.schema.fieldNames.contains)
    if (missing.nonEmpty)
      throw new ValidationException(
        s"table ${meta.id}: primaryKey columns ${missing.mkString(", ")} not in schema")
  }

  override def close(): Unit = {
    closed = true
    socket.close()
  }
}
