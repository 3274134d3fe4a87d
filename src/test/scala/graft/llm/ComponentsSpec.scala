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

  /** Run `body` with the hybrid gate forced to the DISTRIBUTED loop (the
    * local-edge limit at 0), restoring the default afterwards. */
  private def forcingLoop[T](body: => T): T = {
    spark.conf.set("spark.graft.components.localEdgeLimit", "0")
    try body finally spark.conf.unset("spark.graft.components.localEdgeLimit")
  }

  test("deep path converges in O(log diameter) rounds with O(1) plan stats") {
    import spark.implicits._
    val n = 4096
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("d1", "d2").repartition(4)
    // the loop is this test's subject — force the hybrid gate past the
    // local union-find (which would otherwise absorb a 4095-edge graph)
    val out = forcingLoop { DedupQueries.componentsOf(edges, "spec_path") }
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

  test("random graphs agree with a reference union-find (seeded)") {
    import spark.implicits._
    for (seed <- Seq(11, 42, 97)) {
      val rng = new scala.util.Random(seed)
      val n = 60
      // sparse enough to leave several components, dense enough to chain
      val edges = Seq.fill(45)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: textbook union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val want = (0 until n).groupBy(find).values
        .map(g => g.map(_.toLong).toSet -> g.min.toLong)
        .flatMap { case (m, r) => m.map(_ -> r) }.toMap
      val got = DedupQueries.componentsOf(edges.toDF("d1", "d2"), s"spec_rand$seed")
        .as[(Long, Long)].collect().toMap
      // componentsOf labels only nodes that appear in an edge
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched, s"seed $seed: nodes")
      got.foreach { case (node, lbl) =>
        assert(lbl == want(node.toInt), s"seed $seed: node $node -> $lbl != ${want(node.toInt)}")
      }
    }
  }

  test("hybrid gate: single-task union-find and the distributed loop agree") {
    import spark.implicits._
    // dense-ish random graph with chains, self-dups and both edge
    // directions — the shapes the banded producers emit
    val rng = new scala.util.Random(7)
    val n = 300
    val edges = (Seq.fill(260)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b } ++ Seq((5L, 6L), (6L, 5L), (5L, 6L)))
      .toDF("d1", "d2").repartition(4)
      .persist()
    val local = DedupQueries.componentsOf(edges, "spec_hybrid_local")
      .as[(Long, Long)].collect().toMap
    val loop = forcingLoop {
      DedupQueries.componentsOf(edges, "spec_hybrid_loop")
    }.as[(Long, Long)].collect().toMap
    edges.unpersist(blocking = false)
    assert(local == loop, "hybrid paths disagree")
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

  test("sim_triangles: wedge-close counts each triangle once; pendant and isolated pin 0") {
    import spark.implicits._
    // triangle {1,2,3} + pendant edge (3,4) + isolated node 5
    val mut = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val vecs = Seq(1L, 2L, 3L, 4L, 5L).toDF("vec_id")
    val out = SimilarityQueries.trianglesOf(mut, vecs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 1.0)), s"n1: ${out(1L)}")
    assert(out(2L) == ((2L, 1L, 1.0)), s"n2: ${out(2L)}")
    assert(out(3L) == ((3L, 1L, 2.0 / 6.0)), s"n3 coef 1/3: ${out(3L)}")
    assert(out(4L) == ((1L, 0L, 0.0)), s"pendant: ${out(4L)}")
    assert(out(5L) == ((0L, 0L, 0.0)), s"isolated: ${out(5L)}")
  }
}
