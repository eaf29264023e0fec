package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Where does a query's wall-clock actually go? (guide §1: measure first.)
  *
  * Runs each named query twice in one JVM (run 1 = codegen/JIT warm-up,
  * run 2 = steady state) with a listener that aggregates, per run:
  *   - #jobs, #stages, #tasks
  *   - Σ task run time, Σ task deserialize/serialize, Σ GC, Σ shuffle
  *     read/write bytes, Σ spill
  *   - job-covered wall time (union of job intervals) vs query wall time —
  *     the GAP is driver-only time (planning, analysis, commit, listing),
  *     invisible to stage metrics.
  *
  * {{{ sbt "runMain graft.tools.ProfileJobs q123_stream_cluster_maintenance" }}}
  */
object ProfileJobs {
  final class Agg extends SparkListener {
    val jobs = new ConcurrentHashMap[Int, (Long, Long)]() // id -> (start, end)
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val taskTime = new LongAdder // ms
    val gcTime = new LongAdder
    val deserTime = new LongAdder
    val shufReadB = new LongAdder
    val shufWriteB = new LongAdder
    val spillB = new LongAdder
    val inputB = new LongAdder
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.put(j.jobId, (j.time, -1L))
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      val s = Option(jobs.get(j.jobId)).map(_._1).getOrElse(j.time)
      jobs.put(j.jobId, (s, j.time))
    }
    val stageTime = new ConcurrentHashMap[String, AtomicLong]() // name -> Σ task ms
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val i = sc.stageInfo
      val key = i.name.take(60)
      val ms = i.taskMetrics.executorRunTime
      stageTime.computeIfAbsent(key, _ => new AtomicLong).addAndGet(ms)
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        taskTime.add(m.executorRunTime)
        gcTime.add(m.jvmGCTime)
        deserTime.add(m.executorDeserializeTime + m.resultSerializationTime)
        shufReadB.add(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.add(m.shuffleWriteMetrics.bytesWritten)
        spillB.add(m.memoryBytesSpilled)
        inputB.add(m.inputMetrics.bytesRead)
      }
    }
    /** Union length of [start,end] job intervals, ms. */
    def jobCoveredMs: Long = {
      import scala.jdk.CollectionConverters._
      val iv = jobs.values.asScala.toSeq.filter(_._2 > 0).sortBy(_._1)
      var cov = 0L; var curS = -1L; var curE = -1L
      iv.foreach { case (s, e) =>
        if (curE < 0) { curS = s; curE = e }
        else if (s <= curE) curE = math.max(curE, e)
        else { cov += curE - curS; curS = s; curE = e }
      }
      if (curE >= 0) cov += curE - curS
      cov
    }
    def report(name: String, run: Int, wallMs: Long): Unit = {
      val mb = 1024.0 * 1024.0
      println(f"PROFILEJOBS $name run$run wall=${wallMs / 1000.0}%7.2fs " +
        f"jobs=${jobs.size}%4d stages=${stages.get}%5d tasks=${tasks.get}%6d " +
        f"jobCovered=${jobCoveredMs / 1000.0}%7.2fs driverGap=${(wallMs - jobCoveredMs) / 1000.0}%7.2fs " +
        f"taskTime=${taskTime.sum / 1000.0}%8.2fs gc=${gcTime.sum / 1000.0}%6.2fs " +
        f"deser=${deserTime.sum / 1000.0}%6.2fs " +
        f"shufR=${shufReadB.sum / mb}%8.1fMB shufW=${shufWriteB.sum / mb}%8.1fMB " +
        f"spill=${spillB.sum / mb}%6.1fMB input=${inputB.sum / mb}%8.1fMB")
      if (sys.env.contains("SPARK_GRAFT_PROFILE_STAGES")) {
        import scala.jdk.CollectionConverters._
        stageTime.asScala.toSeq.sortBy(-_._2.get).take(12).foreach { case (n, t) =>
          println(f"  STAGE ${t.get / 1000.0}%8.2fs  $n")
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_pricing_summary")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val agg = new Agg
        spark.sparkContext.addSparkListener(agg)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wallMs = (System.nanoTime() - t0) / 1000000
        // listener bus is async; give late task-end events a beat to land
        Thread.sleep(500)
        spark.sparkContext.removeSparkListener(agg)
        agg.report(name, i, wallMs)
        if (BatchProfListener.batches.get > 0) BatchProfListener.report(name)
        spark.catalog.clearCache(); System.gc()
      }
    }
    spark.stop()
  }
}
