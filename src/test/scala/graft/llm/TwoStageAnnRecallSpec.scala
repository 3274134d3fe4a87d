package graft.llm

import graft.SparkSpec

/** Recall gate for the ANN-backed two-stage retrieval: sim_twostage_ann
  * (stage 1 = multi-probe IVF, nprobe=3 of 10 cells) must recover a pinned
  * fraction of the exact sim_twostage top-k. The synthetic embeddings are
  * near-uniform, so the cell-membership CEILING at nprobe=3 is ~0.50
  * (measured; on clusterable real embeddings it is far higher) — the floor
  * pins the harness and the routing correctness for THIS data, and is what
  * a deployment re-runs after retuning nprobe. */
class TwoStageAnnRecallSpec extends SparkSpec {

  override val timeLimit = org.scalatest.time.Span(300, org.scalatest.time.Seconds)

  test("sim_twostage_ann recall@k vs the exact two-stage stays above the floor") {
    val dir = sf("sf0.01")
    def topk(name: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(name)(spark, dir)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topk("sim_twostage")
    val ann = topk("sim_twostage_ann")
    assert(ann.keySet == exact.keySet, "every query answered by both paths")
    val recalls = exact.map { case (q, ex) =>
      ann(q).intersect(ex).size.toDouble / ex.size
    }.toSeq
    val mean = recalls.sum / recalls.size
    info(f"mean recall@k = $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.30, f"nprobe=3 IVF mean recall floor: $mean%.3f")
    assert(recalls.count(_ == 0.0) <= recalls.size / 4,
      "at most a quarter of queries may miss entirely (all cells mis-routed)")
  }
}
