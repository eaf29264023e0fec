package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int): (Long, String) =
    (id, Seq.fill(nTokens)("w").mkString(" "))

  test("sequentialPacks equals the single-window formulation") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 400L).map(i => doc(i, 1 + rnd.nextInt(50))).toDF("doc_id", "text")
      .repartition(7) // deliberately scrambled input partitioning
    val got = Packing.sequentialPacks(docs, "doc_id", "text", budget = 100)

    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expected = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .withColumn("pack_id", expr("coalesce(sum(n_tokens) over (order by doc_id rows between unbounded preceding and 1 preceding), 0) div 100"))
    assert(got.orderBy("doc_id").collect().toSeq ==
      expected.orderBy("doc_id").collect().toSeq)
    // packs are contiguous in id order and start at 0
    val packs = got.orderBy("doc_id").select("pack_id").as[Long].collect()
    assert(packs.head == 0L && packs.sameElements(packs.sorted))
  }

  test("greedyPacks: every doc packed once, no pack over budget unless singleton") {
    val rnd = new scala.util.Random(11)
    val sizes = (1L to 300L).map(i => (i, 1 + rnd.nextInt(80))) :+ (301L, 500) // oversized
    val docs = sizes.map { case (i, n) => doc(i, n) }.toDF("doc_id", "text")
    val out = Packing.greedyPacks(docs, "doc_id", "text", budget = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    assert(out.map(_._1).sorted.toSeq == (1L to 301L))
    val byPack = out.groupBy(_._3).values
    byPack.foreach { members =>
      val total = members.map(_._2).sum
      assert(total <= 128 || members.length == 1,
        s"pack over budget with ${members.length} members, $total tokens")
    }
    // FFD should do clearly better than one-doc-per-pack
    assert(byPack.size < out.length / 2)
  }
}
