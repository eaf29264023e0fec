package graft.cdc.provider

import java.io.{BufferedInputStream, FileInputStream, RandomAccessFile}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap

/** Byte-offset indexing over append-only JSONL files, shared by the
  * file-layout providers ([[FileChangeLogProvider]],
  * [[DebeziumJsonChangeLogProvider]]).
  *
  * The first touch of a file builds, in one streaming pass, a sorted
  * byte-offset index (key → [byteStart, byteStart+len)); every later probe
  * or range read binary-searches it and seeks straight to its rows, so a
  * plan of C chunks costs one scan + C range reads instead of C full
  * rescans — the same asymptotic shape as the reference's indexed range
  * scans (mysql/source/utils/StatementUtils.java:132-188, which never
  * rescan the table either). Index memory is O(rows) keys+longs — the
  * archived-topic analogue of a database's PK index; for a table too big
  * for that, use the JDBC provider against a real store instead.
  *
  * Files may grow between micro-batches (a live tail appending while a
  * stream runs): indexes self-invalidate when the file length OR mtime
  * changes — append-only is the file contract. */
private[cdc] object JsonlIndex {

  /** Parallel arrays: entry i spans file bytes [starts(i), starts(i)+lens(i))
    * and sorts by key (chunk key for snapshots, offset for logs). */
  final class FileIndex[K](val fileLen: Long, val fileMtime: Long,
      val keys: Array[AnyRef], val starts: Array[Long], val lens: Array[Int]) {
    def size: Int = starts.length
    def key(i: Int): K = keys(i).asInstanceOf[K]
    @volatile var lastUsed: Long = 0L
  }

  /** JVM-WIDE index cache keyed by absolute file path + variant. Each
    * partition task deserializes its own provider instance, so a
    * per-instance cache would rebuild the index once per CHUNK — exactly
    * the O(chunks × file) this index exists to remove. Per-JVM means: one
    * build on the driver for planning, at most one per executor for reads.
    * The cache is bounded to stop long-lived JVMs (test suites over many
    * tmp fixtures) accumulating dead indexes; when full it evicts the
    * least-recently-used entry, not the whole cache (hot entries survive). */
  private val idxCache = TrieMap.empty[String, FileIndex[_]]
  private val MaxCachedFiles = 64
  private val useStamp = new java.util.concurrent.atomic.AtomicLong()

  /** Build-or-fetch the `variant` index of `path`. `keyOf` is invoked once
    * per non-empty line IN FILE ORDER (so it may carry ordinal state, e.g.
    * a line-index offset counter); `None` excludes the line from the index
    * (tombstones, control events, rows of the other phase). */
  def cachedIndex[K](path: String, variant: String, keyOf: String => Option[K])
      (implicit ord: Ordering[K]): FileIndex[K] = {
    val abs = Paths.get(path).toAbsolutePath.toString + "#" + variant
    val p = Paths.get(path)
    val exists = Files.exists(p)
    val curLen = if (exists) Files.size(p) else 0L
    val curMtime = if (exists) Files.getLastModifiedTime(p).toMillis else 0L
    idxCache.get(abs) match {
      case Some(idx) if idx.fileLen == curLen && idx.fileMtime == curMtime =>
        idx.lastUsed = useStamp.incrementAndGet()
        idx.asInstanceOf[FileIndex[K]]
      case _ =>
        val entries = scanLines(path)
          .filter(_._1.nonEmpty)
          .flatMap { case (line, start, len) => keyOf(line).map((_, start, len)) }
          .toArray
        java.util.Arrays.sort(entries,
          Ordering.by[(K, Long, Int), K](_._1): java.util.Comparator[(K, Long, Int)])
        val idx = new FileIndex[K](curLen, curMtime,
          entries.map(_._1.asInstanceOf[AnyRef]),
          entries.map(_._2), entries.map(_._3))
        idx.lastUsed = useStamp.incrementAndGet()
        if (!idxCache.contains(abs) && idxCache.size >= MaxCachedFiles)
          idxCache.toSeq.minByOption(_._2.lastUsed).foreach(e => idxCache.remove(e._1))
        idxCache.put(abs, idx)
        idx
    }
  }

  /** A (len, mtime)-validated cached value derived from one file — the
    * generalization of [[cachedIndex]] for COMPOSITE builds: a provider
    * whose one file backs several index variants (the Debezium spool's
    * snapshot/log/(key,offset) indexes + schema transitions) builds them
    * all in ONE parse pass instead of one full scan per variant — at 100 TB
    * the difference between reading a spool once and reading it four
    * times. Same self-invalidation (append-only file growth) and LRU
    * discipline as the index cache. */
  final class Blob(val fileLen: Long, val fileMtime: Long, val endPos: Long,
      val cleanEnd: Boolean, val value: AnyRef) {
    @volatile var lastUsed: Long = 0L
  }
  private val blobCache = TrieMap.empty[String, Blob]

  /** Bytes actually scanned by [[cachedAppendOnly]] builds — test
    * observability for the incremental contract (a tail append must scan
    * ~the appended suffix, not the whole file). */
  private[cdc] val scannedBytes = new java.util.concurrent.atomic.AtomicLong()

  /** Build-or-extend a composite value over an APPEND-ONLY `path`.
    *
    * `build(prev, lines, fileLen, fileMtime)` receives the previous cached
    * value and a scan of ONLY the bytes it has not seen: on first touch
    * (or any non-append change — shrink, same-length mtime change,
    * growth after a newline-less final line) `prev` is None and `lines`
    * covers [0, len); on growth after a cleanly-terminated scan `prev` is
    * the cached value and `lines` covers just the appended suffix. This is
    * what keeps a LIVE tail's per-batch planning cost O(append): the
    * (len,mtime)-keyed full rebuild re-parsed the whole spool every
    * micro-batch — quadratic over the stream's life.
    *
    * The scan is BOUNDED at the length snapshot taken before it starts, so
    * lines appended mid-scan are left for the next probe instead of being
    * double-counted by a later extension. Append-only is the file contract
    * (same as [[cachedIndex]]); a rewritten-in-place file that happens to
    * keep growing is detected only via mtime when the length did not grow
    * — the contract violation the scaladoc has always excluded. */
  def cachedAppendOnly[T <: AnyRef](path: String, variant: String)
      (build: (Option[T], Iterator[(String, Long, Int)], Long, Long) => T): T = {
    val abs = Paths.get(path).toAbsolutePath.toString + "#" + variant
    val p = Paths.get(path)
    val exists = Files.exists(p)
    val curLen = if (exists) Files.size(p) else 0L
    val curMtime = if (exists) Files.getLastModifiedTime(p).toMillis else 0L
    blobCache.get(abs) match {
      case Some(b) if b.fileLen == curLen && b.fileMtime == curMtime =>
        b.lastUsed = useStamp.incrementAndGet()
        b.value.asInstanceOf[T]
      case cached =>
        val (prev, from) = cached match {
          case Some(b) if curLen > b.fileLen && b.cleanEnd && b.endPos <= b.fileLen =>
            (Some(b.value.asInstanceOf[T]), b.endPos)
          case _ => (None, 0L)
        }
        val scan = new BoundedScan(path, from, curLen)
        val v = build(prev, scan.lines, curLen, curMtime)
        scannedBytes.addAndGet(scan.endPos - from)
        val b = new Blob(curLen, curMtime, scan.endPos, scan.cleanEnd, v)
        b.lastUsed = useStamp.incrementAndGet()
        if (!blobCache.contains(abs) && blobCache.size >= MaxCachedFiles)
          blobCache.toSeq.minByOption(_._2.lastUsed).foreach(e => blobCache.remove(e._1))
        blobCache.put(abs, b)
        v
    }
  }

  /** [[scanLines]] restricted to byte window [from, until): yields the
    * window's lines; after drain, `endPos` is the byte after the last
    * newline consumed and `cleanEnd` says whether the window ended ON a
    * newline (the precondition for a later extension to resume at
    * `endPos` — a newline-less final line is still yielded, matching the
    * full scan, but marks the scan non-resumable). */
  private final class BoundedScan(path: String, from: Long, until: Long) {
    var endPos: Long = from
    var cleanEnd: Boolean = true
    def lines: Iterator[(String, Long, Int)] = {
      if (!Files.exists(Paths.get(path)) || from >= until) return Iterator.empty
      val fis = new FileInputStream(path)
      fis.getChannel.position(from)
      val in = new BufferedInputStream(fis, 1 << 16)
      val buf = new java.io.ByteArrayOutputStream(256)
      var pos = from
      new Iterator[(String, Long, Int)] {
        private var nextEntry: (String, Long, Int) = advance()
        private def advance(): (String, Long, Int) = {
          buf.reset()
          val start = pos
          var b = if (pos < until) in.read() else -1
          while (b != -1 && b != '\n') {
            buf.write(b); pos += 1
            b = if (pos < until) in.read() else -1
          }
          if (b == '\n') {
            pos += 1; endPos = pos; cleanEnd = true
            (new String(buf.toByteArray, StandardCharsets.UTF_8), start, buf.size())
          } else if (buf.size() == 0) { in.close(); null }
          else {
            endPos = pos; cleanEnd = false
            (new String(buf.toByteArray, StandardCharsets.UTF_8), start, buf.size())
          }
        }
        def hasNext: Boolean = nextEntry != null
        def next(): (String, Long, Int) = {
          val v = nextEntry
          nextEntry = if (v == null) null else advance()
          v
        }
      }
    }
  }

  /** Merge a sorted [[FileIndex]] with a (then-sorted) delta — the
    * extension half of [[packIndex]]: O(n + m) with no re-sort of the old
    * run. Stable (old entries first on equal keys). */
  def mergeIndex[K](old: FileIndex[K], delta: Array[(K, Long, Int)], fileLen: Long,
      fileMtime: Long)(implicit ord: Ordering[K]): FileIndex[K] = {
    if (old == null || old.size == 0) return packIndex(fileLen, fileMtime, delta)
    if (delta.isEmpty)
      return new FileIndex[K](fileLen, fileMtime, old.keys, old.starts, old.lens)
    java.util.Arrays.sort(delta,
      Ordering.by[(K, Long, Int), K](_._1): java.util.Comparator[(K, Long, Int)])
    val n = old.size
    val m = delta.length
    val keys = new Array[AnyRef](n + m)
    val starts = new Array[Long](n + m)
    val lens = new Array[Int](n + m)
    var i = 0; var j = 0; var o = 0
    while (i < n && j < m) {
      if (ord.compare(old.key(i), delta(j)._1) <= 0) {
        keys(o) = old.keys(i); starts(o) = old.starts(i); lens(o) = old.lens(i); i += 1
      } else {
        keys(o) = delta(j)._1.asInstanceOf[AnyRef]; starts(o) = delta(j)._2
        lens(o) = delta(j)._3; j += 1
      }
      o += 1
    }
    while (i < n) { keys(o) = old.keys(i); starts(o) = old.starts(i); lens(o) = old.lens(i); i += 1; o += 1 }
    while (j < m) { keys(o) = delta(j)._1.asInstanceOf[AnyRef]; starts(o) = delta(j)._2; lens(o) = delta(j)._3; j += 1; o += 1 }
    new FileIndex[K](fileLen, fileMtime, keys, starts, lens)
  }

  /** Sort-and-pack (key, byteStart, byteLen) entries into a [[FileIndex]]
    * — the tail half of [[cachedIndex]], for composite builds that collect
    * several variants' entries in one scan. */
  def packIndex[K](fileLen: Long, fileMtime: Long,
      entries: Array[(K, Long, Int)])(implicit ord: Ordering[K]): FileIndex[K] = {
    java.util.Arrays.sort(entries,
      Ordering.by[(K, Long, Int), K](_._1): java.util.Comparator[(K, Long, Int)])
    new FileIndex[K](fileLen, fileMtime,
      entries.map(_._1.asInstanceOf[AnyRef]), entries.map(_._2), entries.map(_._3))
  }

  /** One streaming pass over a JSONL file: (line, byteStart, byteLen) per
    * line. Byte-accurate (multi-byte UTF-8, optional trailing newline). */
  def scanLines(path: String): Iterator[(String, Long, Int)] = {
    if (!Files.exists(Paths.get(path))) return Iterator.empty
    val in = new BufferedInputStream(new FileInputStream(path), 1 << 16)
    val buf = new java.io.ByteArrayOutputStream(256)
    var pos = 0L
    new Iterator[(String, Long, Int)] {
      private var nextEntry: (String, Long, Int) = advance()
      private def advance(): (String, Long, Int) = {
        buf.reset()
        val start = pos
        var b = in.read()
        while (b != -1 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
        if (b == '\n') pos += 1
        if (buf.size() == 0 && b == -1) { in.close(); null }
        else (new String(buf.toByteArray, StandardCharsets.UTF_8), start, buf.size())
      }
      def hasNext: Boolean = nextEntry != null
      def next(): (String, Long, Int) = {
        val v = nextEntry
        nextEntry = if (v == null) null else advance()
        v
      }
    }
  }

  /** First index in [0, n) whose key is >= `key` under `cmp` (lower bound). */
  def lowerBound[K](idx: FileIndex[K], key: K, cmp: (K, K) => Int): Int = {
    var lo = 0
    var hi = idx.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(idx.key(mid), key) < 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** First index in [0, n) whose key is STRICTLY > `key` — the overflow-free
    * way to bound a half-open offset window (count in (from, to] =
    * upperBound(to) - upperBound(from); no +1 that could wrap at
    * Long.MaxValue — the ADVICE_r16 #3 class). */
  def upperBound[K](idx: FileIndex[K], key: K, cmp: (K, K) => Int): Int = {
    var lo = 0
    var hi = idx.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(idx.key(mid), key) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Seek-read the given index entries (in file order) and decode each line
    * with its index key. Contiguous runs — the common case for key-sorted
    * snapshot files — read sequentially through one RandomAccessFile. */
  def readEntries[K, T](path: String, picks: Array[Int], idx: FileIndex[K])
      (f: (String, K) => T): CloseableIterator[T] = {
    if (picks.isEmpty) return new CloseableIterator[T](Iterator.empty, () => ())
    val byPos = picks.sortBy(idx.starts(_))
    val raf = new RandomAccessFile(path, "r")
    val inner = byPos.iterator
    val it = new Iterator[T] {
      // close on exhaustion too (RandomAccessFile#close is idempotent), so
      // non-reader callers that drain the iterator don't leak the fd
      def hasNext: Boolean = { val h = inner.hasNext; if (!h) raf.close(); h }
      def next(): T = {
        val i = inner.next()
        raf.seek(idx.starts(i))
        val bytes = new Array[Byte](idx.lens(i))
        raf.readFully(bytes)
        f(new String(bytes, StandardCharsets.UTF_8), idx.key(i))
      }
    }
    new CloseableIterator(it, () => raf.close())
  }

  /** Interior boundary keys splitting the offset window's events into up to
    * `n` key ranges of ~equal EVENT COUNT, computed from (chunk key,
    * offset)-ASCENDING entries — two in-memory passes, no IO. Shared by
    * every key-indexed provider's
    * [[ChangeLogProvider.logShardBoundaries]] (file/debezium byte indexes
    * pass their index arrays, the socket spool its TreeMap keys). Returns
    * strictly-ascending distinct keys (fewer than n-1 when heavy keys
    * collapse neighbours); empty when the window holds fewer than n
    * events. */
  def shardBoundaries(entries: () => Iterator[(graft.cdc.ChunkKey.Key, Long)],
      fromExclusive: Long, toInclusive: Long, n: Int): Seq[graft.cdc.ChunkKey.Key] = {
    if (n <= 1) return Seq.empty
    var total = 0L
    entries().foreach { case (_, off) =>
      if (off > fromExclusive && off <= toInclusive) total += 1
    }
    if (total < n) return Seq.empty
    // entries are ascending by (key, offset): the c-th windowed entry's key
    // is the c-th smallest event key — boundary k means "shard starts at k"
    val out = Vector.newBuilder[graft.cdc.ChunkKey.Key]
    var last: graft.cdc.ChunkKey.Key = null
    var c = 0L
    var nextTarget = 1
    val it = entries()
    while (it.hasNext && nextTarget < n) {
      val (k, off) = it.next()
      if (off > fromExclusive && off <= toInclusive) {
        if (c == 0L) last = k // boundary must exceed the window's first key
        if (c >= nextTarget * total / n) {
          if (graft.cdc.ChunkKey.compare(k, last) > 0) {
            out += k
            last = k
          }
          nextTarget += 1
        }
        c += 1
      }
    }
    out.result()
  }

  /** [[shardBoundaries]] over a (key, offset)-sorted byte index. */
  def shardBoundaries(idx: FileIndex[(graft.cdc.ChunkKey.Key, Long)],
      fromExclusive: Long, toInclusive: Long, n: Int): Seq[graft.cdc.ChunkKey.Key] =
    shardBoundaries(() => Iterator.tabulate(idx.size)(idx.key),
      fromExclusive, toInclusive, n)
}
