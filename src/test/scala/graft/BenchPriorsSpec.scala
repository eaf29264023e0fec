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
