package graft.operators

import graft.Q.DEC
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for wide aggregations and joins.
  *
  * At 100 TB a handful of hot keys (a viral document, a default user id, an
  * empty-string category) can pin an entire aggregation or join on one
  * task. These operators spread a hot key across `salt` sub-keys and
  * recombine — the classic two-phase/salted recipe, expressed so Catalyst
  * still sees plain hash aggregations (map-side combine on both phases).
  * AQE's skew-join handling covers sort-merge JOINS at runtime; salting
  * remains the tool for skewed AGGREGATIONS and broadcast-ineligible hot
  * joins, and is deterministic (salt = hash of a caller-chosen column). */
object SkewOps {

  /** Skew-safe exact sum+count aggregation: phase 1 aggregates on
    * (keys, hash(saltBy) % salt) — a hot key's rows spread over `salt`
    * parallel groups — phase 2 merges the partials on the true keys.
    * Decimal-exact sums make the two-phase result bit-identical to the
    * single-phase `groupBy(keys).agg(dsum, count)` regardless of how rows
    * split across salts (decimal addition is associative — same reason the
    * oracle hash gate can check this operator with a plain GROUP BY). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], saltBy: Column, salt: Int,
      valueCol: Column, sumName: String = "total", cntName: String = "n"): DataFrame = {
    require(salt > 0)
    val phase1 = df
      .groupBy((keys.map(col) :+ pmod(xxhash64(saltBy), lit(salt)).as("__salt")): _*)
      .agg(sum(valueCol.cast(DEC)).as("__psum"), count(lit(1)).as("__pn"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as(sumName), sum(col("__pn")).as(cntName))
  }

  /** Salted equi-join for a skewed LEFT side against a non-broadcastable
    * right side: left rows keep their salt, right rows replicate to all
    * `salt` sub-keys, and the join key becomes (keys, salt) — a hot key's
    * probe work spreads over `salt` tasks. Row multiset identical to the
    * plain join. Replication factor = `salt` on the right side only; use
    * for moderate salt values (4-32) where AQE skew splitting can't help
    * (e.g. a shuffled hash join or a streaming-static join). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBy: Column, salt: Int): DataFrame = {
    require(salt > 0)
    val l = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(salt)))
    val r = right.withColumn("__salt", explode(sequence(lit(0L), lit(salt - 1L))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
