package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.priorBest]]'s SF-scoped artifact parsing against the
  * REAL committed artifacts (the forked test JVM's cwd is the repo
  * root). The parser reads three formats — driver-tail-escaped metric
  * lines (BENCH_r*.json), the compact sidecar (BENCH_PARSED.json), and
  * pretty-printed multi-SF probe sections (BENCH_sf1.json) — and a
  * regression in any of them silently blinds the bench's stall-rerun
  * defense (how q81's floor went missing in round 7) or, worse,
  * cross-pollinates SFs and trips spurious reruns on every query. */
class BenchPriorsSpec extends AnyFunSuite {

  test("sf0.1 priors: all three artifact formats contribute, values plausible") {
    val p = Bench.priorBest("/root/testdata/sf0.1")
    assert(p.nonEmpty)
    // from the round-artifact tails / sidecar (battery queries)
    assert(p.contains("q01_pricing_summary"))
    // from BENCH_sf1.json's addendum_r8 "sf0.1" section (round-8-only
    // queries whose best values live ONLY there pre-round-9)
    assert(p.contains("q93_doc_chunks"))
    assert(p.contains("q89_stream_temporal_join"))
    // sf0.1 priors must NOT be polluted by sf1 numbers: q89's sf1 battery
    // time is 26.1 s; its sf0.1 records are all ≤ ~10 s
    assert(p("q89_stream_temporal_join") < 15.0,
      s"q89 prior ${p("q89_stream_temporal_join")} looks like an sf1 value")
    // minima are positive seconds, not ratios or error sentinels
    assert(p.values.forall(v => v > 0 && v < 600))
  }

  test("floors are not stale-HIGH: no floor exceeds the artifact-of-record time") {
    // round-9 verdict #1: a floor ABOVE the current settled time is a
    // blind spot in the 1.5x rerun defense exactly where the code just got
    // faster (q98's 3.25s floor predated the native-expression rewrite
    // that made it 0.6s — a 3x regression would not have tripped). The
    // "min over sources" provenance rule implies floors refresh DOWNWARD
    // whenever a committed settled run beats them; this pins it: for every
    // floored query, floor <= the committed artifact-of-record
    // (BENCH_PARSED.json) time at the same SF, with 10% measurement slack.
    val body = scala.io.Source.fromFile("BENCH_FLOORS.json").mkString
    val sfName = """"sf":\s*"([^"]+)"""".r.findFirstMatchIn(body).map(_.group(1))
    assert(sfName.contains("sf0.1"), "floors must declare their SF")
    val floorRe = """"(q[0-9][A-Za-z0-9_]*)":\s*([0-9.]+)""".r
    val floors = floorRe.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    // Evidence per query = MAX(committed HEAD artifact, working-tree
    // artifact). Two one-sided cases, both deliberate (round-13 verdict
    // what's-wrong #1): the DRIVER's post-close bench overwrites the
    // working tree with readings that have NOT been min-rule adjudicated
    // yet — a sub-second beat there must not turn the handed-over tree
    // red (the refresh belongs to the next session's open, against the
    // committed artifact of record); conversely a re-provenanced-UP floor
    // commits together with its new artifact, and comparing only against
    // the stale HEAD copy would fail exactly that legitimate commit. A
    // genuinely stale floor exceeds BOTH copies and still fails.
    def artifactOf(body: String): Map[String, Double] = {
      assert("""\"sf\":\"[^"]*sf0\.1\"""".r.findFirstIn(body).nonEmpty,
        "BENCH_PARSED.json is not an sf0.1 artifact")
      floorRe.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .filter(_._2 > 0).toMap
    }
    val working = artifactOf(scala.io.Source.fromFile("BENCH_PARSED.json").mkString)
    // only the git SUBPROCESS may fall back to working-tree evidence (no
    // git binary / not a checkout); artifactOf's own sf assertion on the
    // committed content must fail LOUDLY — a committed BENCH_PARSED.json
    // that is not an sf0.1 artifact is a broken record, not a missing one
    // (and a blanket Throwable would also swallow OOM/interrupt)
    val committed =
      (try Some(scala.sys.process.Process(
        Seq("git", "show", "HEAD:BENCH_PARSED.json")).!!)
      catch { case scala.util.control.NonFatal(_) => None })
        .fold(working)(artifactOf)
    val evidence = (working.keySet ++ committed.keySet).map { q =>
      q -> math.max(working.getOrElse(q, 0.0), committed.getOrElse(q, 0.0))
    }.toMap
    val stale = floors.collect {
      case (q, f) if evidence.get(q).exists(a => a > 0 && f > a * 1.10) =>
        s"$q floor $f > evidence ${evidence(q)}"
    }
    assert(stale.isEmpty, s"stale-HIGH floors (refresh them downward): $stale")
  }

  test("sf1 priors: scoped to the sf1 sections only") {
    val p = Bench.priorBest("/root/testdata/sf1")
    // BENCH_sf1.json's "sf1" section is the only sf1 source
    assert(p.contains("q01_pricing_summary"))
    // q14's sf1 battery value is 12.04→… but its sf0.1 value is 0.79;
    // an unscoped min would leak the 0.79 in
    assert(p("q14_scalar_subquery") > 1.0,
      s"q14 sf1 prior ${p("q14_scalar_subquery")} leaked from sf0.1")
  }
}
