package graft.operators

import graft.SparkSpec
import graft.Q.{cnt, dsum}
import org.apache.spark.sql.functions._

/** The salted decompositions must be observationally identical to their
  * plain counterparts — exactness is the whole point (decimal sums are
  * associative, so phase splits can't change the result). */
class SkewOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private lazy val events = graft.Tables.t(spark, dir, "events")

  test("saltedSumCount == plain groupBy for every salt") {
    val plain = events.groupBy("event_type")
      .agg(dsum(col("value")).as("total"), cnt.as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    for (salt <- Seq(1, 4, 16)) {
      val salted = SkewOps.saltedSumCount(events, Seq("event_type"),
          col("event_id"), salt, col("value"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      assert(salted === plain, s"salt=$salt diverged")
    }
  }

  test("saltedJoin == plain join (row multiset)") {
    val purchases = events.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "value")
    val users = events.groupBy("user_id").agg(cnt.as("n_events"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val plain = canon(purchases.join(users, Seq("user_id")))
    val salted = canon(SkewOps.saltedJoin(purchases, users, Seq("user_id"),
      col("event_id"), salt = 8))
    assert(salted === plain)
  }
}
