package graft.cdc

import java.net.ServerSocket
import java.nio.charset.StandardCharsets

/** Shared test server speaking the socket provider's wire protocol:
  * resume-capable change-stream bytes (`RESUME <n>` → bytes from position
  * n, plus everything published later) and the Mongo-style copy handshake
  * (`COPY` → `COPYBEGIN <pos> <asOfOffset>`, one JSON doc per line,
  * `COPYEND`, then change events from the pinned position). Used by
  * MongoLifecycleSpec and FailoverMatrixSpec. */
final class CopyResumableServer(
    collection: Seq[(Long, String)] = Seq.empty, collectionAsOf: Long = 0L) {
  private val server = new ServerSocket(0)
  private val published = new java.io.ByteArrayOutputStream()
  private val clients =
    new java.util.concurrent.CopyOnWriteArrayList[(java.io.OutputStream, Array[Int])]()
  def port: Int = server.getLocalPort
  @volatile private var closed = false
  private val acceptor = new Thread(() => {
    try while (!closed) {
      val s = server.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
      val handshake = in.readLine()
      val out = s.getOutputStream
      val from = CopyResumableServer.this.synchronized {
        if (handshake.trim == "COPY") {
          val pin = published.size()
          val frame = new StringBuilder(s"COPYBEGIN $pin $collectionAsOf\n")
          collection.foreach { case (id, v) =>
            frame ++= s"""{"id":$id,"v":"$v"}""" + "\n"
          }
          frame ++= "COPYEND\n"
          out.write(frame.toString.getBytes(StandardCharsets.UTF_8))
          out.flush()
          pin
        } else handshake.trim.split(" ")(1).toInt
      }
      val pos = Array(from)
      CopyResumableServer.this.synchronized { flushTo(out, pos) }
      clients.add((out, pos))
    } catch { case _: Throwable => () }
  })
  acceptor.setDaemon(true); acceptor.start()
  private def flushTo(out: java.io.OutputStream, pos: Array[Int]): Unit = {
    val bytes = published.toByteArray
    if (pos(0) < bytes.length) {
      out.write(bytes, pos(0), bytes.length - pos(0)); out.flush()
      pos(0) = bytes.length
    }
  }
  def publish(line: String): Unit = synchronized {
    published.write((line + "\n").getBytes(StandardCharsets.UTF_8))
    clients.forEach { case (out, pos) =>
      try flushTo(out, pos) catch { case _: Throwable => () }
    }
  }
  def close(): Unit = { closed = true; server.close() }
}
