package graft

/** Guards the driver contract: the three query maps must not collide (a
  * silent Map-merge override would drop a gate query), every oracle key
  * must have a query, and rows-only queries are a known, documented set. */
class SparkEntrySpec extends SparkSpec {

  test("query maps merge without key collisions") {
    val maps = Seq(
      graft.queries.RelQueries.queries,
      graft.queries.CdcQueries.queries,
      graft.queries.DataQueries.queries)
    val total = maps.map(_.size).sum
    assert(SparkEntry.queries.size === total,
      "duplicate query keys across RelQueries/CdcQueries/DataQueries")
  }

  test("every oracle key has a query; every battery query is oracle-checked") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // round 6: q35/q39/q50/q81 flipped to the oracle via the portable
    // IVF/PQ family; round 10: q55 flipped to a BOUNDED oracle check
    // (in-band boolean vs the exact count); round 11: the last two
    // rows-only entries (xxhash64 LSH/SimHash fast paths q33/q34) were
    // FOLDED into their oracle-checked md5 twins q42/q82 — identical
    // band/vote pipelines, portable base hash — so the battery's
    // unverified surface is now zero by construction.
    assert(noOracle === Set.empty[String],
      s"rows-only queries appeared: $noOracle — every battery entry needs an oracle")
  }

  test("entry (driver smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
