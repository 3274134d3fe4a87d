package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contamination defenses only work if the committed-reference parse
  * works — a silent empty map would quietly disable the rerun policy. */
class BenchSpec extends AnyFunSuite {

  test("loadCommitted parses sf and per-query times from the artifact format") {
    val json = """{"metric":"total","value":12.5,"unit":"sec",""" +
      """"queries":{"q1_pricing_summary":1.19,"t1_celsius":0.4,"dd_jaccard":4.04},""" +
      """"failed":[],"gc_ms":{"q1_pricing_summary":22},"sf":"/root/testdata/sf0.1"}"""
    val f = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.write(f, json.getBytes("UTF-8"))
    val (sf, times) = Bench.loadCommitted(f.toString)
    assert(sf == "/root/testdata/sf0.1")
    assert(times == Map("q1_pricing_summary" -> 1.19, "t1_celsius" -> 0.4,
      "dd_jaccard" -> 4.04))
    // the "value":12.5 outside the queries object must NOT leak in
    assert(!times.contains("value"))
    java.nio.file.Files.delete(f)
  }

  test("loadCommitted on the real committed artifact: full suite, same sf as the driver runs") {
    val (sf, times) = Bench.loadCommitted()
    assert(sf.endsWith("sf0.1"), s"committed reference is the driver's sf: $sf")
    assert(times.size >= 80, s"full-suite reference present: ${times.size}")
    assert(times.values.forall(_ > 0), "no failed entries in the committed reference")
  }

  test("loadCommitted missing file -> empty reference, rerun policy falls back to min-of-2") {
    val (sf, times) = Bench.loadCommitted("/nonexistent/bench.json")
    assert(sf == "" && times.isEmpty)
  }

  test("aggregate ratchet refuses a >15% drifted run, accepts plan noise (VERDICT r6 #3)") {
    // round 6's measured drift: 227.7s vs 184.0s on common queries = 1.24×
    // — clean per-query (no rerun trips), but it must NOT become the
    // committed reference
    assert(!Bench.ratchetAllows(Seq((227.7, 184.0))),
      "the r6 drifted run would have overwritten the reference")
    // 10% is inside run-to-run plan noise — a normal overwrite
    assert(Bench.ratchetAllows(Seq((110.0, 100.0))))
    // just inside/outside the 15% bound
    assert(Bench.ratchetAllows(Seq((114.9, 100.0))))
    assert(!Bench.ratchetAllows(Seq((115.1, 100.0))))
    // no committed reference -> first run always records
    assert(Bench.ratchetAllows(Nil))
  }

  test("sub-second noise floor: a 0.3s query 3x-ing on jitter is not suspect (VERDICT r6 #4)") {
    // tx_mix_report's round-6 false alarm: 0.3s reference, ~1s noisy run.
    // Threshold = 2 × max(0.3, 1.0) = 2.0s — 0.9s is NOT suspect...
    assert(Bench.rerunThreshold(0.3, 1.0) == 2.0)
    // ...while a heavy query keeps its proportional threshold
    assert(Bench.rerunThreshold(10.0, 1.0) == 20.0)
  }

  test("calibration drift normalizes rerun thresholds, clamped to [1, 2]") {
    assert(Bench.driftFactor(1.3, 1.0) == 1.3)
    // a FASTER host must still satisfy the recorded thresholds
    assert(Bench.driftFactor(0.7, 1.0) == 1.0)
    // missing either reading -> no normalization
    assert(Bench.driftFactor(0.0, 1.0) == 1.0)
    assert(Bench.driftFactor(1.0, 0.0) == 1.0)
    // a >2x-slow host is untrustworthy — cap the allowance
    assert(Bench.driftFactor(5.0, 1.0) == 2.0)
    // a 1.3x-slow host scales a 10s reference to a 26s threshold
    assert(Bench.rerunThreshold(10.0, Bench.driftFactor(1.3, 1.0)) == 26.0)
  }

  test("loadCalibration parses calibration_sec; absent (pre-r7 artifact) -> 0") {
    val json = """{"metric":"total","value":1.0,"queries":{"q":1.0},""" +
      """"calibration_sec":0.8123,"drift_factor":1.0,"sf":"/root/testdata/sf0.1"}"""
    val f = java.nio.file.Files.createTempFile("bench_cal", ".json")
    java.nio.file.Files.write(f, json.getBytes("UTF-8"))
    assert(Bench.loadCalibration(f.toString) == 0.8123)
    java.nio.file.Files.delete(f)
    assert(Bench.loadCalibration("/nonexistent/bench.json") == 0.0)
    // the committed pre-r7 artifact (no field) degrades to 0 -> drift 1.0
    assert(Bench.driftFactor(0.9, Bench.loadCalibration("/nonexistent/x.json")) == 1.0)
  }

  test("calibration loop returns a plausible positive wall-time") {
    val s = Bench.calibrate()
    assert(s > 0.01 && s < 30.0, s"calibration reading implausible: ${s}s")
  }
}
