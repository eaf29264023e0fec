package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property pin of GENERATION COMPACTION's algebra through the real code
  * path ([[BucketedOps.compactManifest]] over real bucketed tables): for
  * ANY base generation, ANY sequence of appended days, a compaction
  * inserted at ANY position in that sequence, and ANY delete-set, the
  * final reader resolution equals the closed form over (base ∪ all
  * appends) minus the deleted keys' rows — for BOTH lake algebras (sum
  * per key, min per doc). Compaction composes with appends in any order
  * because `resolve` is idempotent and absorbs the union algebra
  * (sum-of-sums = sum, min∘min = min); the delete-set leg is exact
  * because the anti-join runs on the stored rows themselves.
  *
  * The example-based CompactManifestSpec pins the protocol (kill windows,
  * races, markers); this pins the MATH for shapes nobody hand-picked. */
class CompactAlgebraPropertySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private def check(p: Prop): Unit = {
    // each case builds a bucketed table, lands 1-3 appends, and runs a
    // real compaction — keep the case count modest
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(res.passed, res.status.toString)
  }

  private val scenarioGen = for {
    base <- Gen.listOfN(8, Gen.zip(Gen.choose(0L, 9L), Gen.choose(1L, 50L)))
    nDays <- Gen.choose(1, 3)
    days <- Gen.listOfN(nDays,
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 14L), Gen.choose(1L, 50L)))
        .map(_.take(8)))
    compactAt <- Gen.choose(0, nDays) // before day `compactAt`'s append
    nDel <- Gen.choose(0, 3)
    deleted <- Gen.listOfN(nDel, Gen.choose(0L, 14L))
  } yield (base, days, compactAt, deleted.distinct)

  test("sum algebra: compaction at any position + tombstones = closed form over surviving rows") {
    check(Prop.forAll(scenarioGen) { case (base, days, compactAt, deleted) =>
      val tbl = BucketedOps.ensureBucketed(
        base.toDF("k", "n"), s"cap_sum|${System.nanoTime()}", "k", buckets = 4)
      days.zipWithIndex.foreach { case (rows, i) =>
        if (i == compactAt)
          BucketedOps.compactManifest(spark, tbl, "k", buckets = 4,
            jobId = s"gen$i", resolve = _.groupBy("k").agg(sum("n").as("n")))
        BucketedOps.idempotentAppend(rows.toDF("k", "n").repartition(1),
          tbl, "k", buckets = 4, jobId = s"day$i")
      }
      // final compaction with the tombstone delete-set (doc-attributed:
      // the delete key IS the row key here)
      BucketedOps.compactManifest(spark, tbl, "k", buckets = 4,
        jobId = "genF", resolve = _.groupBy("k").agg(sum("n").as("n")),
        deleteSet = if (deleted.isEmpty) None
          else Some(deleted.toDF("k")))
      val expected = (base ++ days.flatten)
        .filterNot { case (k, _) => deleted.contains(k) }
        .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).sum }
      val got = spark.table(tbl).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(got == expected) :| s"expected=$expected got=$got compactAt=$compactAt del=$deleted"
    })
  }

  test("min algebra: compaction at any position = closed form min per doc") {
    check(Prop.forAll(scenarioGen) { case (base, days, compactAt, deleted) =>
      val tbl = BucketedOps.ensureBucketed(
        base.toDF("doc_id", "c"), s"cap_min|${System.nanoTime()}", "doc_id", buckets = 4)
      days.zipWithIndex.foreach { case (rows, i) =>
        if (i == compactAt)
          BucketedOps.compactManifest(spark, tbl, "doc_id", buckets = 4,
            jobId = s"gen$i", resolve = _.groupBy("doc_id").agg(min("c").as("c")))
        BucketedOps.idempotentAppend(rows.toDF("doc_id", "c").repartition(1),
          tbl, "doc_id", buckets = 4, jobId = s"day$i")
      }
      BucketedOps.compactManifest(spark, tbl, "doc_id", buckets = 4,
        jobId = "genF", resolve = _.groupBy("doc_id").agg(min("c").as("c")),
        deleteSet = if (deleted.isEmpty) None else Some(deleted.toDF("doc_id")))
      val expected = (base ++ days.flatten)
        .filterNot { case (k, _) => deleted.contains(k) }
        .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).min }
      val got = spark.table(tbl).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(got == expected) :| s"expected=$expected got=$got compactAt=$compactAt del=$deleted"
    })
  }

  test("additive delete: negated contributions + net-out compaction = closed form with them excluded") {
    // the q138 takedown algebra, property-shaped: the additive families'
    // delete cannot anti-join rows (no doc attribution) — it appends the
    // removed docs' per-key counts NEGATED and compacts with a resolve
    // that nets and drops zeroed keys. For ANY base + days and ANY subset
    // of those contributions withdrawn (never more than was contributed —
    // counts are contributions, not arbitrary integers), the final
    // resolution equals the closed form over the surviving contributions,
    // and keys netting to zero leave the table entirely. The mid-state is
    // pinned too: BEFORE the compaction readers' sum already nets.
    val gen = for {
      (base, days, compactAt, _) <- scenarioGen
      all = base ++ days.flatten
      mask <- Gen.listOfN(all.length, Gen.oneOf(true, false))
    } yield (base, days, compactAt, all.zip(mask).collect { case (kv, true) => kv })
    check(Prop.forAll(gen) { case (base, days, compactAt, withdrawn) =>
      val tbl = BucketedOps.ensureBucketed(
        base.toDF("k", "n"), s"cap_neg|${System.nanoTime()}", "k", buckets = 4)
      days.zipWithIndex.foreach { case (rows, i) =>
        if (i == compactAt)
          BucketedOps.compactManifest(spark, tbl, "k", buckets = 4,
            jobId = s"gen$i", resolve = _.groupBy("k").agg(sum("n").as("n")))
        BucketedOps.idempotentAppend(rows.toDF("k", "n").repartition(1),
          tbl, "k", buckets = 4, jobId = s"day$i")
      }
      val survivors = {
        val w = scala.collection.mutable.Map.empty[Long, Long]
        withdrawn.foreach { case (k, n) => w(k) = w.getOrElse(k, 0L) + n }
        (base ++ days.flatten).groupBy(_._1)
          .map { case (k, rows) => k -> (rows.map(_._2).sum - w.getOrElse(k, 0L)) }
          .filter(_._2 != 0L)
      }
      if (withdrawn.nonEmpty)
        BucketedOps.idempotentAppend(
          withdrawn.map { case (k, n) => (k, -n) }.toDF("k", "n").repartition(1),
          tbl, "k", buckets = 4, jobId = "takedown")
      // mid-state: sum-resolve already nets, before any compaction
      val mid = spark.table(tbl).groupBy("k").agg(sum("n").as("n"))
        .filter(col("n") =!= 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val midOk = Prop(mid == survivors) :| s"mid-state expected=$survivors got=$mid"
      BucketedOps.compactManifest(spark, tbl, "k", buckets = 4,
        jobId = "genF",
        resolve = _.groupBy("k").agg(sum("n").as("n")).filter(col("n") =!= 0L))
      val got = spark.table(tbl).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      midOk && (Prop(got == survivors) :|
        s"post-compact expected=$survivors got=$got withdrawn=$withdrawn")
    })
  }
}
