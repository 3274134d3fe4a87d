package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {

  /** n docs that all share one minhash signature (per `tag`) — the
    * stopword-bucket shape: every band bucket holds all n docs. */
  private def mhDF(n: Int, tag: Long): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => tag * 1000 + i).toDF("doc_id")
      .select(col("doc_id") +:
        (0 until 16).map(j => lit(tag * 100 + j).as(s"m$j")): _*)
  }

  test("LSH band buckets above the cap are dropped; small buckets still pair") {
    // 100 identical signatures => 4 band buckets of 100 docs, all over
    // maxBucket: the self-join must see NONE of them (uncapped it would
    // emit 100*99/2 = 4950 pairs — quadratic in the bucket)
    assert(DedupQueries.maxBucket < 100)
    assert(DedupQueries.lshPairs(mhDF(100, tag = 1)).count() == 0)
    // 5 identical signatures => bucket under the cap: all 10 pairs emitted
    assert(DedupQueries.lshPairs(mhDF(5, tag = 2)).count() == 10)
    // mixed: the mega-bucket must not suppress the small one's pairs
    val mixed = mhDF(100, tag = 3).union(mhDF(5, tag = 4))
    assert(DedupQueries.lshPairs(mixed).count() == 10)
  }

  test("dedup chain carries no broadcast hints on data-dependent tables") {
    // regression pin for the round-2 scale defect: per-doc `sizes`, the
    // cluster table, and pre-filter LSH `pairs` were force-broadcast —
    // correct at sf0.1, an executor/driver OOM on a dup-heavy 100 TB
    // corpus. The build sides must be AQE's runtime choice, i.e. the
    // analyzed plans contain NO ResolvedHint at all.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    import spark.implicits._
    def assertNoHints(name: String, df: DataFrame): Unit = {
      val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
      assert(hints.isEmpty, s"$name must leave build sides to AQE, found: $hints")
    }
    for (q <- Seq("dd_jaccard", "dd_minhash_lsh"))
      assertNoHints(q, graft.SparkEntry.queries(q)(spark, sf("sf0.001")))
    // the prep's cluster join (the third formerly-hinted site) — checked
    // with a stub comp table so the plan-only test doesn't execute the
    // eager clustering loop that building the real comp would run
    val stubComp = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    assertNoHints("llm_corpus_prep",
      PipelineQueries.prepDF(spark, sf("sf0.001"), stubComp))
  }
}
