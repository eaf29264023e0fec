package graft

import org.scalatest.funsuite.AnyFunSuite

/** The artifact of record must not trail the battery head (round-10
  * verdict "What's missing #1": q109–q118 landed after the closing bench
  * commit, so the only full-battery timing evidence was a contention-
  * smeared driver run and the rerun defense was unarmed exactly on the
  * newest queries). Mirror of [[ScaleProbeCoverageSpec]], for
  * BENCH_PARSED.json + BENCH_FLOORS.json:
  *
  *   1. every `SparkEntry.queries` entry appears in BENCH_PARSED.json
  *      (the committed settled artifact of record), and
  *   2. every query the artifact records at >= 1s settled has a floor in
  *      BENCH_FLOORS.json, so the 1.5x isolated-floor rerun trigger is
  *      armed for it (sub-1s queries never trip the trigger — Bench also
  *      requires t > 1s — so a floor there is optional).
  *
  * When this fails: run `graft.Bench` settled (start load < 0.5), commit
  * the refreshed BENCH_PARSED.json, and add floors for any new >= 1s
  * queries from that run's times (or a BenchSubset isolated minimum). */
class ArtifactCoverageSpec extends AnyFunSuite {

  private def parsedTimes: Map[String, Double] = {
    val f = new java.io.File("BENCH_PARSED.json")
    assert(f.isFile, "BENCH_PARSED.json missing — the bench artifact of record must be committed")
    val body = scala.io.Source.fromFile(f).mkString
    // first "queries" map only (errors/reruns maps follow): match the
    // BALANCED object after the key, not the first '}' — a pretty-printed
    // or reordered artifact must not silently truncate the parsed set
    val start = body.indexOf("\"queries\":")
    assert(start >= 0, "BENCH_PARSED.json has no \"queries\" map")
    val open = body.indexOf('{', start)
    assert(open >= 0, "BENCH_PARSED.json \"queries\" key has no object value")
    var depth = 0; var i = open; var end = -1
    while (end < 0 && i < body.length) {
      body.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    assert(end > open, "BENCH_PARSED.json \"queries\" object never closes")
    """"(q[0-9]+[A-Za-z0-9_]*)"\s*:\s*(-?[0-9.]+)""".r
      .findAllMatchIn(body.substring(open, end + 1))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  test("every battery query is covered by the committed artifact of record") {
    val missing = SparkEntry.queries.keySet.diff(parsedTimes.keySet).toSeq.sorted
    assert(missing.isEmpty,
      s"battery queries with NO entry in BENCH_PARSED.json: ${missing.mkString(", ")} — " +
        "run graft.Bench settled and commit the refreshed artifact")
  }

  test("every >=1s artifact-of-record query has a rerun-defense floor") {
    val floorsBody = scala.io.Source.fromFile("BENCH_FLOORS.json").mkString
    val floors = """"(q[0-9]+[A-Za-z0-9_]*)"\s*:\s*([0-9.]+)""".r
      .findAllMatchIn(floorsBody).map(_.group(1)).toSet
    val unarmed = parsedTimes.collect {
      case (q, t) if t >= 1.0 && SparkEntry.queries.contains(q) && !floors.contains(q) => q
    }.toSeq.sorted
    assert(unarmed.isEmpty,
      s"queries at >=1s in the artifact of record but with no floor: ${unarmed.mkString(", ")} — " +
        "add BENCH_FLOORS entries (settled battery time or BenchSubset isolated minimum)")
  }
}
