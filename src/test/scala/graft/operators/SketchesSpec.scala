package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error-bound assertions for the sketch tier (engine-local results — the
  * bounds, not the bits, are the contract). */
class SketchesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"
  private lazy val events = graft.Tables.t(spark, dir, "events")

  test("HLL++ distinct counts are within the requested rsd") {
    val rows = Sketches.approxDistinct(events, Seq("event_type"), "user_id", rsd = 0.05)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_distinct").toDouble
      val exact = r.getAs[Long]("exact_distinct").toDouble
      assert(math.abs(approx - exact) / exact <= 0.15, // 3× rsd headroom
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("count-min frequencies: never undercount, bounded overcount") {
    val cms = Sketches.countMinFrequencies(events, "user_id", eps = 0.001)
    val truth = events.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val n = truth.map(_._2).sum
    truth.take(100).foreach { case (uid, cnt) =>
      val est = cms.estimateCount(uid)
      assert(est >= cnt, s"undercount for $uid")
      assert(est <= cnt + (0.001 * n).toLong + 1, s"overcount for $uid: $est vs $cnt")
    }
  }

  test("bloom filter: no false negatives; pre-filter keeps all true members") {
    val members = events.filter(col("event_type") === "purchase")
      .select("user_id").distinct()
    val bf = Sketches.bloomFilterOf(members, "user_id", expectedItems = 1000)
    members.collect().foreach(r => assert(bf.mightContainLong(r.getLong(0))))
    val kept = Sketches.mightContain(events, "user_id", bf)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val trueMembers = members.collect().map(_.getLong(0)).toSet
    assert(trueMembers.subsetOf(kept), "pre-filter dropped a true member")
  }
}
