package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training pipelines.
  *
  * `sample(fraction)` is nondeterministic across runs and engines; training
  * pipelines need REPRODUCIBLE membership ("this doc is always in val"),
  * stable under reruns, repartitions, and engine swaps. These operators
  * derive membership from the portable md5 hash ([[Dedup.portableH31]] —
  * bit-identical in every engine), so splits are pure functions of the id:
  * no shuffle, no state, embarrassingly parallel, and oracle-checkable.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id — the split primitive. */
  def hashBucket(idCol: Column, buckets: Int = 100): Column =
    pmod(Dedup.portableH31(idCol.cast("string")), lit(buckets.toLong))

  /** Deterministic train/val/test labels by cumulative percentage
    * (e.g. 80/10/10). Percentages must sum to 100. */
  def split(df: DataFrame, idCol: String, trainPct: Int = 80, valPct: Int = 10,
      labelCol: String = "split"): DataFrame = {
    require(trainPct + valPct < 100 && trainPct > 0 && valPct >= 0)
    val b = hashBucket(col(idCol))
    df.withColumn(labelCol,
      when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test"))
  }

  /** Deterministic p% sample: rows whose bucket falls under `pct`. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < pct)

  /** Per-stratum deterministic sampling: different percentages per value of
    * `stratumCol` (e.g. keep 100% of rare languages, 5% of the head) —
    * membership still a pure function of the id. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(stratumCol) === k, p).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < pct)
  }
}
