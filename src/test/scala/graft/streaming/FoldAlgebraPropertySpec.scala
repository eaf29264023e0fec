package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property test of the DAY-CLOSE FOLD's algebra, through the real code
  * path ([[graft.operators.BucketedOps.foldSpool]] over real bucketed
  * tables): for ANY stored state, ANY spool contents, and ANY partition
  * of the spool into batches, the post-fold stored-only reader resolution
  * equals the pre-fold (stored ∪ spool) resolution — for BOTH algebras
  * the lake uses (min per doc for label spools, where a doc may appear in
  * several batches with decreasing labels; sum per key for additive
  * count spools). The fold may only move rows, never change answers. */
class FoldAlgebraPropertySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private def check(p: Prop): Unit = {
    // each case builds a bucketed table and runs a real fold — keep modest
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  private val minScenarioGen = for {
    nStored <- Gen.choose(0, 12)
    stored <- Gen.listOfN(nStored, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
    nSpool <- Gen.choose(1, 20)
    spool <- Gen.listOfN(nSpool, Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 9L)))
    nBatches <- Gen.choose(1, 4)
    assignment <- Gen.listOfN(nSpool, Gen.choose(0, nBatches - 1))
  } yield (stored, spool, assignment)

  test("min algebra: fold preserves min-per-doc resolution for any spool batching") {
    check(Prop.forAll(minScenarioGen) { case (stored, spool, assignment) =>
      val storedDf =
        (if (stored.isEmpty) Seq((-1L, -1L)) else stored).toDF("doc_id", "cluster_id")
      val tbl = graft.operators.BucketedOps.ensureBucketed(
        storedDf, s"fap_min|${System.nanoTime()}", "doc_id", buckets = 4)
      val tmp = java.nio.file.Files.createTempDirectory("graft_fap_min_")
      tmp.toFile.deleteOnExit()
      spool.zip(assignment).groupBy(_._2).foreach { case (b, rows) =>
        rows.map(_._1).toDF("doc_id", "cluster_id")
          .write.parquet(tmp.resolve("sp").resolve(s"batch=$b").toString)
      }
      val before = spark.table(tbl).select("doc_id", "cluster_id")
        .unionByName(spool.toDF("doc_id", "cluster_id"))
        .groupBy("doc_id").agg(min("cluster_id").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.operators.BucketedOps.foldSpool(spark, tmp.resolve("sp").toString,
        tbl, "doc_id", buckets = 4, jobId = "day",
        resolve = _.groupBy("doc_id").agg(min("cluster_id").as("cluster_id")))
      val after = spark.table(tbl).groupBy("doc_id").agg(min("cluster_id").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(after == before) :| s"before=$before after=$after"
    })
  }

  private val sumScenarioGen = for {
    nStored <- Gen.choose(0, 12)
    stored <- Gen.listOfN(nStored, Gen.zip(Gen.choose(0L, 9L), Gen.choose(1L, 50L)))
    nSpool <- Gen.choose(1, 20)
    spool <- Gen.listOfN(nSpool, Gen.zip(Gen.choose(0L, 14L), Gen.choose(1L, 50L)))
    nBatches <- Gen.choose(1, 4)
    assignment <- Gen.listOfN(nSpool, Gen.choose(0, nBatches - 1))
  } yield (stored, spool, assignment)

  test("sum algebra: fold preserves sum-per-key resolution for any spool batching") {
    check(Prop.forAll(sumScenarioGen) { case (stored, spool, assignment) =>
      val storedDf =
        (if (stored.isEmpty) Seq((-1L, 0L)) else stored).toDF("k", "n")
      val tbl = graft.operators.BucketedOps.ensureBucketed(
        storedDf, s"fap_sum|${System.nanoTime()}", "k", buckets = 4)
      val tmp = java.nio.file.Files.createTempDirectory("graft_fap_sum_")
      tmp.toFile.deleteOnExit()
      spool.zip(assignment).groupBy(_._2).foreach { case (b, rows) =>
        rows.map(_._1).toDF("k", "n")
          .write.parquet(tmp.resolve("sp").resolve(s"batch=$b").toString)
      }
      val before = spark.table(tbl).select("k", "n")
        .unionByName(spool.toDF("k", "n"))
        .groupBy("k").agg(sum("n").as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.operators.BucketedOps.foldSpool(spark, tmp.resolve("sp").toString,
        tbl, "k", buckets = 4, jobId = "day",
        resolve = _.groupBy("k").agg(sum("n").as("n")))
      val after = spark.table(tbl).groupBy("k").agg(sum("n").as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(after == before) :| s"before=$before after=$after"
    })
  }
}
