package graft.llm

import graft.SparkSpec

/** Recall gate for the multi-probe kNN graph (VERDICT r5 #3): the recall
  * curve label-cells → learned-cells → learned-cells-with-multi-probe must
  * actually CLIMB, and the multi-probe point must clear 0.5 recall@3 on
  * the sf0.1 corpus (the measured gap the single-probe learned-cell graph
  * left: 0.325). All three audits share the identical sampled exact-top-3
  * harness and (dist, neighbor_id) total order, so the numbers compare
  * directly.
  */
class MultiprobeRecallSpec extends SparkSpec {

  override val timeLimit = org.scalatest.time.Span(300, org.scalatest.time.Seconds)

  test("multi-probe kNN graph recall@3 >= 0.5 at sf0.1 and beats single-probe") {
    val dir = sf("sf0.1")
    def meanRecall(name: String): Double = {
      val rows = graft.SparkEntry.queries(name)(spark, dir)
        .select("query_id", "n_hit").collect()
      assert(rows.nonEmpty, s"$name returned no audit rows")
      rows.map(_.getLong(1)).sum.toDouble / (3.0 * rows.length)
    }
    val single = meanRecall("sim_knn_recall_kmeans")
    val multi = meanRecall("sim_knn_recall_multiprobe")
    info(f"recall@3: learned cells nprobe=1 $single%.3f -> nprobe=3 $multi%.3f")
    assert(multi >= 0.5, f"multi-probe recall floor: $multi%.3f < 0.5")
    assert(multi > single, f"multi-probe must beat single-probe: $multi%.3f <= $single%.3f")
  }

  test("SCALED multi-probe graph (k ∝ N three-level cells, nc=12/np=26) holds the 0.7 recall floor at sf0.1") {
    val dir = sf("sf0.1")
    val rows = graft.SparkEntry.queries("sim_knn_recall_multiprobe_scaled")(spark, dir)
      .select("query_id", "n_hit").collect()
    assert(rows.nonEmpty, "scaled audit returned no rows")
    val recall = rows.map(_.getLong(1)).sum.toDouble / (3.0 * rows.length)
    info(f"recall@3: scaled three-level cells, nc=12/np=26: $recall%.3f")
    // the production composition must not trade the multiprobe recall win
    // away for the three-level assignment's speed. Floor raised 0.5 → 0.7
    // in round 9 (VERDICT r8 #4) after the probe-selection widening
    // (mpCoarse 4→12, nprobe 10→26) measured recall@3 = 0.800 on this
    // harness — see the RecallProbe grid in the mpCoarse scaladoc.
    assert(recall >= 0.7, f"scaled multi-probe recall floor: $recall%.3f < 0.7")
  }
}
