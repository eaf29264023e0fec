package graft.queries

/** Per-JVM cache of staged stream-input directories for the streaming gate
  * queries (q52/q54/q61/q88/q89/q90).
  *
  * Staging a file stream means sorting the source table, writing it as
  * part files, and appending sentinel waves — ingest-side test scaffolding,
  * not query cost (in production the stream's input already exists; the
  * engine cost is the stateful processing). The same rule the bench already
  * applies to the CDC fixture and q87's bucketed layout. The staged layout
  * for a given (kind, source dir) is deterministic, so it is built ONCE per
  * JVM and each run only re-arms arrival order: fresh mtimes from "now", in
  * the staged group order, so the file source (which admits files by mtime)
  * replays the same arrival sequence for every run.
  */
private[queries] object StreamFixtures {

  /** A staged input dir plus its arrival groups: (files, mtime offset ms).
    * Files within a group share an offset (they may arrive together);
    * groups are ordered by offset. */
  final case class Stage(in: String, groups: Seq[(Seq[java.io.File], Long)])

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Stage]()

  /** Build-once per (kind, source dir): `build` writes the part files into
    * the passed directory and returns the arrival groups. */
  def ensure(kind: String, dir: String)(
      build: String => Seq[(Seq[java.io.File], Long)]): Stage =
    cache.computeIfAbsent(s"$kind|$dir", { _ =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_${kind}_")
      tmp.toFile.deleteOnExit()
      val in = tmp.resolve("in").toString
      Stage(in, build(in))
    })

  /** Re-arm arrival order for a fresh run (cheap: one utime per file).
    *
    * CONTRACT: queries sharing a stage (q89/q90 share "q89") must run
    * SEQUENTIALLY — arm() mutates the staged files' mtimes, so re-arming
    * while another query over the same stage is mid-run would silently
    * reorder its mtime-ordered arrival sequence. The gate queries hold
    * this: Verify and Bench run the battery one query at a time, and each
    * query drains its stream to completion before returning. The per-Stage
    * lock below makes the arm itself atomic (no interleaved half-armed
    * mtimes if two sessions race), but it cannot protect a RUNNING query —
    * that is the caller's sequencing obligation. */
  def arm(st: Stage): Stage = st.synchronized {
    val base = System.currentTimeMillis()
    st.groups.foreach { case (files, off) =>
      files.foreach(_.setLastModified(base + off))
    }
    st
  }

  /** Parquet part files of a directory in name order. */
  def parts(in: String): Seq[java.io.File] =
    new java.io.File(in).listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq
}
