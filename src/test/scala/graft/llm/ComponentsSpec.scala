package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The factored component machinery (DedupQueries.componentsOf) on planted
  * topologies — including the deep-path shape that exposed the
  * localCheckpoint originStats blow-up (each round's plan references the
  * label frame 4×, so carried sizeInBytes estimates grow 4^k in DIGIT
  * COUNT; ~14 rounds in, the optimizer wedges in BigInteger.multiply).
  * The path graph below needs ~13 pointer-jump rounds: pre-fix this spec
  * wedges past its time limit, post-fix it runs in seconds. */
class ComponentsSpec extends SparkSpec {

  test("deep path converges in O(log diameter) rounds with O(1) plan stats") {
    import spark.implicits._
    val n = 4096
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("d1", "d2").repartition(4)
    val out = DedupQueries.componentsOf(edges, "spec_path")
    // every node collapses to the path's min label
    val labels = out.select("lbl").distinct().as[Long].collect()
    assert(labels.toSeq == Seq(0L), s"path split into ${labels.length} components")
    assert(out.count() === n)
    // regression guard on the stats tower: the returned frame must carry a
    // BOUNDED size estimate (defaultSizeInBytes-class), not the 4^rounds-
    // digit product that the originStats chain accumulated pre-fix
    val bits = out.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(bits < 1024, s"label-frame sizeInBytes has $bits bits — stats chain is growing again")
  }

  test("disjoint cliques stay separate; labels are component minima") {
    import spark.implicits._
    // clique A {1,2,3}, clique B {10,11,12}, isolated-by-absence node 20
    // (componentsOf only labels nodes that appear in an edge)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("d1", "d2")
    val got = DedupQueries.componentsOf(edges, "spec_cliques")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }
}
