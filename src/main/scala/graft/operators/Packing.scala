package graft.operators

import graft.functions.TextFunctions.tokenCount
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — grouping documents into ~budget-sized
  * token bundles for training-example assembly.
  *
  * Two variants:
  *   - [[sequentialPacks]]: pack = floor(exclusive-prefix-sum / budget) in
  *     doc-id order. Deterministic, order-preserving, SQL-expressible
  *     (oracle-checked); a pack may overflow by at most one document —
  *     the semantics of a streaming tokenizer that splits at pack
  *     boundaries. The prefix sum is DISTRIBUTED: range-repartition,
  *     per-partition local cumsum (mapPartitions — genuinely imperative
  *     per-partition logic), then a numPartitions-row offset table
  *     broadcast back. A naive `Window.orderBy` with no partition key
  *     funnels the entire corpus through ONE task; this shape never does.
  *   - [[greedyPacks]]: first-fit-decreasing within each range partition —
  *     tighter packing (no overflow; oversized docs isolate), pack ids
  *     partition-local. Not SQL-expressible; spec-asserted instead.
  */
object Packing {

  /** (doc_id, n_tokens, pack_id) with pack_id = exclusive-cumsum ÷ budget
    * in id order. Exactly equal to the single-window formulation, computed
    * without a global single-task window. */
  def sequentialPacks(df: DataFrame, idCol: String, textCol: String,
      budget: Long): DataFrame = {
    require(budget > 0)
    val spark = df.sparkSession
    import spark.implicits._

    val ranged = df
      .select(col(idCol).cast("bigint").as("doc_id"),
        tokenCount(col(textCol)).as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")

    // local EXCLUSIVE cumsum per range partition; RangePartitioner orders
    // partitions by key range, so partition id order == global id order
    val local = ranged.as[(Long, Long)].mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var acc = 0L
      it.map { case (id, n) => val e = acc; acc += n; (id, n, e, pid) }
    }.toDF("doc_id", "n_tokens", "local_excl", "pid")

    // per-partition totals → prefix offsets: numPartitions rows, driver-side
    val totals = local.groupBy("pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
    val offsetByPid = (totals.map(_._1) zip offsets.map(_._2)).toMap
    val offsetDf = spark.createDataset(offsetByPid.toSeq)(
      Encoders.product[(Int, Long)]).toDF("pid", "offset")

    local.join(broadcast(offsetDf), "pid")
      .select(col("doc_id"), col("n_tokens"),
        // `div`, not `/`: SQL `/` on bigints is DOUBLE division (inexact
        // past 2^53 — corpus-scale token cumsums get close)
        expr(s"(offset + local_excl) div ${budget}L").as("pack_id"))
  }

  /** First-fit-decreasing bin packing within each range partition of the
    * token-count distribution. No pack exceeds `budget` unless a single
    * document alone does (it then sits alone in its own pack). pack_id is
    * globally unique: pid * 2^40 + partition-local index. */
  def greedyPacks(df: DataFrame, idCol: String, textCol: String,
      budget: Long): DataFrame = {
    require(budget > 0)
    val spark = df.sparkSession
    import spark.implicits._

    df.select(col(idCol).cast("bigint").as("doc_id"),
        tokenCount(col(textCol)).as("n_tokens"))
      .repartitionByRange(col("n_tokens"), col("doc_id"))
      .sortWithinPartitions(col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long)].mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        // open packs as (pack_id, remaining); linear first-fit scan — pack
        // count per partition is bounded by partition rows, and partitions
        // are sized by the range shuffle, not the corpus
        val open = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var next = 0L
        it.map { case (id, n) =>
          val fit = open.indexWhere(_._2 >= n)
          val pack = if (fit >= 0) {
            val (p, rem) = open(fit); open(fit) = (p, rem - n); p
          } else {
            val p = pid * (1L << 40) + next; next += 1
            open += ((p, math.max(budget - n, 0L))); p
          }
          (id, n, pack)
        }
      }.toDF("doc_id", "n_tokens", "pack_id")
  }
}
