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

  test("every oracle key has a query; rows-only set is exactly the hash-free ops") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // round 6: q35/q39/q50/q81 flipped to the oracle via the portable
    // IVF/PQ family; round 10: q55 flipped to a BOUNDED oracle check
    // (in-band boolean vs the exact count) — the remaining two are the
    // engine-local xxhash64 LSH/SimHash fast paths, each with a portable
    // oracle-checked twin (q42/q82)
    assert(noOracle === Set("q33_minhash_lsh_candidates", "q34_simhash_signatures"),
      s"rows-only queries changed: $noOracle — update this spec deliberately")
  }

  test("entry (driver smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
