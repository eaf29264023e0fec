package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Two-phase choreography for a COMPOSED daily job (the q122 shape: ledger
  * + screens + cluster maintenance over ONE crawl, several table appends).
  *
  * The failure mode this exists for: a multi-leg job crashes after leg 1's
  * append landed. [[BucketedOps.idempotentAppend]] makes every individual
  * append replay-safe, but the RE-RUN's later legs would recompute their
  * deltas from live tables leg 1 already mutated — e.g. a re-derived
  * curation ledger would find today's kept hashes already in the manifest
  * and misclassify every kept doc as `drop_prior_dup`. The q105 rule
  * ("derive everything you will append from a snapshot taken before the
  * first append") must therefore survive the crash: the snapshot has to be
  * DURABLE and keyed by the job, not a session-lifetime temp file.
  *
  * [[stagedDelta]] is that durable snapshot: phase 1 computes each leg's
  * delta against pre-append state and writes it under `stageDir` with a
  * commit marker; phase 2 applies the appends. A replay that finds the
  * marker reads the staged files back VERBATIM — it never recomputes from
  * tables the crashed attempt may have polluted. A crash mid-stage leaves
  * no marker, and the recompute is still sound because staging precedes
  * every append of the data it reads. DailyJobFailoverSpec kills the
  * composition between legs and pins drained-equals-uninterrupted; the
  * reference's analogous guarantee is checkpointed exactly-once state
  * (`mysql/source/DebeziumSourceFunction.java:307-366`).
  *
  * Scale note: the staged delta is the leg's OUTPUT (O(|today|) rows, the
  * thing the job was going to append anyway), never corpus-sized; one
  * extra parquet write+read per leg buys crash-consistency for the whole
  * composition. */
object StagedJob {

  /** Durable once-only materialization of a leg's delta: if
    * `stageDir/_<name>.commit` exists, read `stageDir/<name>` back;
    * otherwise run `compute`, write it there, then create the marker
    * (write-then-mark — a torn stage write has no marker and is simply
    * redone). All paths through Hadoop FileSystem, so `stageDir` may be
    * an object-store URI. */
  def stagedDelta(s: SparkSession, stageDir: String, name: String)
      (compute: => DataFrame): DataFrame = {
    require(name.matches("[A-Za-z0-9.-]+"),
      s"stage name must be [A-Za-z0-9.-]+ (used in file names): $name")
    val root = new org.apache.hadoop.fs.Path(stageDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val data = new org.apache.hadoop.fs.Path(root, name)
    val marker = new org.apache.hadoop.fs.Path(root, s"_$name.commit")
    if (!fs.exists(marker)) {
      fs.delete(data, true)
      compute.write.mode("overwrite").parquet(data.toString)
      fs.create(marker, true).close()
    }
    s.read.parquet(data.toString)
  }
}
