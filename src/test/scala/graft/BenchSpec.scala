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
}
