package graft.tools

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch duration profiler, registered via
  * `-Dspark.sql.streaming.streamingQueryListeners=graft.tools.BatchProfListener`
  * so EVERY session (the battery's cloned stream sessions included) reports
  * into the shared static sums. durationMs keys: triggerExecution,
  * queryPlanning, addBatch, getBatch, latestOffset, walCommit,
  * commitOffsets. Profiling-only — never set in Bench/Verify. */
final class BatchProfListener extends StreamingQueryListener {
  import StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    BatchProfListener.batches.incrementAndGet()
    e.progress.durationMs.forEach { (k, v) =>
      BatchProfListener.sums.computeIfAbsent(k, _ => new AtomicLong).addAndGet(v)
    }
    e.progress.stateOperators.foreach { so =>
      BatchProfListener.stateMs.addAndGet(
        so.allUpdatesTimeMs + so.allRemovalsTimeMs + so.commitTimeMs)
      BatchProfListener.stateRows.addAndGet(so.numRowsTotal)
    }
  }
}

object BatchProfListener {
  val sums = new ConcurrentHashMap[String, AtomicLong]()
  val batches = new AtomicLong
  val stateMs = new AtomicLong
  val stateRows = new AtomicLong
  def report(name: String): Unit = {
    import scala.jdk.CollectionConverters._
    val parts = sums.asScala.toSeq.sortBy(-_._2.get)
      .map { case (k, v) => f"$k=${v.get / 1000.0}%.2fs" }.mkString(" ")
    println(f"  STREAM $name batches=${batches.get} $parts " +
      f"stateOpMs=${stateMs.get / 1000.0}%.2fs stateRows=${stateRows.get}")
    sums.clear(); batches.set(0); stateMs.set(0); stateRows.set(0)
  }
}
