package graft.queries

import graft.SparkSpec

/** Every stored-state fixture's maintained table must read cleanly
  * through the orphan-compaction guard ([[graft.operators.BucketedOps
  * .readMaintained]] — the entry all gate reads route through): the
  * standard lifecycles (append, fold, compact, purge, migrate) leave no
  * orphan promote markers behind, and the guard's root listing works on
  * every table shape the battery maintains. A fixture that started
  * leaving an unfinished swap — or a new marker family the guard doesn't
  * understand — fails HERE, not as a refused gate read in the driver's
  * correctness run. */
class MaintainedReadGuardSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every stored-state table reads through the orphan guard after its full lifecycle") {
    val s = spark
    val tables = Seq.newBuilder[String]
    val (c104, i104) = DataQueries.ensureAnnIndex(s, dir)
    tables += c104 += i104
    val (h105, b105, _) = DataQueries.ensureCurationManifests(s, dir)
    tables += h105 += b105
    val (a115, i115) = DataQueries.ensureClusterState(s, dir)
    tables += a115 += i115
    val (a119, i119) = DataQueries.ensureDay2ClusterState(s, dir)
    tables += a119 += i119
    val (df116, _) = DataQueries.ensureDfManifest(s, dir)
    tables += df116
    val (a129, i129) = DataQueries.ensureStreamFoldedClusterState(s, dir)
    tables += a129 += i129
    val (a133, i133) = DataQueries.ensureCompactedClusterState(s, dir)
    tables += a133 += i133
    val (h134, b134) = DataQueries.ensureTombstonedManifests(s, dir)
    tables += h134 += b134
    tables += DataQueries.ensureSpanManifest(s, dir)
    val (a136, i136) = DataQueries.ensureCadencedClusterState(s, dir)
    tables += a136 += i136
    val (a137, i137) = DataQueries.ensureDocPurgedClusterState(s, dir)
    tables += a137 += i137
    val (df138, _) = DataQueries.ensurePurgedDfManifest(s, dir)
    tables += df138
    tables += DataQueries.ensureMigratedDfManifest(s, dir)
    val (_, i140) = DataQueries.ensurePurgedAnnIndex(s, dir)
    tables += i140
    val all = tables.result().distinct
    assert(all.size >= 20, s"sweep lost tables: $all")
    all.foreach { t =>
      val n = graft.operators.BucketedOps.readMaintained(s, t).count()
      assert(n > 0, s"$t read empty through the guard")
    }
  }
}
