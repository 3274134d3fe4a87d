package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Adversarial-input coverage: the synthetic corpus is well-behaved, so
  * these edges never hit the oracle gate — empty text, single chars,
  * NULL text, non-ASCII, and a repeated-char mega-doc go through the
  * factored operator bodies and the custom Expressions directly. The
  * contract under test: nothing throws, NULL text behaves like an absent
  * doc (null-propagating projections, explode of null = zero rows), and
  * degenerate docs produce empty-not-wrong outputs. */
class HostileInputSpec extends SparkSpec {

  private def hostileDocs = {
    import spark.implicits._
    Seq[(Long, String)](
      (0L, ""),                                   // empty (and a query doc: 0 % 41 == 0)
      (1L, "a"),                                  // shorter than every gram length
      (2L, "ünïcödé 🦜 words wörds"), // non-ASCII + surrogate pair
      (3L, "z" * 2000),                           // mega run of one char
      (4L, "normal words here normal words"),
      (5L, null)                                  // NULL text
    ).toDF("doc_id", "text")
  }

  test("custom Expressions: null propagates, degenerate inputs yield empty arrays") {
    graft.functions.GraftFunctions.register(spark)
    val out = hostileDocs.select(col("doc_id"),
        expr("rolling_hash(text, 8)").as("rh"),
        expr("md5_grams(text, 8)").as("mg"),
        expr("winnow(rolling_hash(text, 8), 16)").as("wn"),
        expr("hash_hist(rolling_hash(text, 3))").as("hh"),
        expr("minhash_sigs(rolling_hash(text, 5))").as("mh"),
        expr("simhash_sig(rolling_hash(text, 5))").as("sh"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(5L).isNullAt(1) && out(5L).isNullAt(2) && out(5L).isNullAt(3),
      "NULL text propagates through the Expression chain")
    assert(out(0L).getSeq[Long](1).isEmpty && out(1L).getSeq[Long](1).isEmpty,
      "texts shorter than the gram length hash to empty arrays")
    assert(out(0L).getSeq[Long](3).isEmpty, "winnow of an empty gram array is empty")
    // the mega-doc's grams are all identical: one histogram bucket, and a
    // well-defined signature
    assert(out(3L).getMap[Long, Long](4).size == 1)
    assert(out(3L).getSeq[Long](5).length == 16)
  }

  test("minhash/LSH chain: degenerate docs drop out, identical mega-docs still pair") {
    import spark.implicits._
    val docs = hostileDocs.union(Seq((6L, "z" * 2000)).toDF("doc_id", "text"))
    val mh = DedupQueries.minhashSigs(docs)
    val ids = mh.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(0L) && !ids.contains(1L) && !ids.contains(5L),
      s"empty/too-short/null docs produce no signature row: $ids")
    val pairs = DedupQueries.lshPairs(mh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 6L)), s"identical mega-docs must band-collide: $pairs")
  }

  test("bm25 and BPE bodies survive a hostile corpus incl. an empty query doc") {
    // doc 0 (the only query doc) is EMPTY: zero query terms, so bm25
    // must return zero rows rather than throw
    assert(TextQueries.bm25DF(hostileDocs).collect().isEmpty)
    val (merges, state) = TextQueries.bpeTrain(hostileDocs)
    assert(merges.collect().length == 3, "training still learns merges from the sane docs")
    val s = state.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s(0L) == "" && s(3L) == "z" * 2000, "degenerate docs pass through unmerged")
    assert(s(5L) == null || s(5L) == "", "null text stays inert in the merge chain")
  }
}
