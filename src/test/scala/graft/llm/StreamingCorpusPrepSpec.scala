package graft.llm

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingCorpusPrepSpec extends SparkSpec {

  test("streaming corpus prep: quality-gates, dedups, and chunks an ingest stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // good doc: 40 distinct 5-char tokens (passes every rule), ~1200 chars
    // after repetition → 3 chunks at step 400
    val vocab = (0 until 100).map(i => f"tok${i}%02da")
    val good = (vocab ++ vocab).mkString(" ") // 200 tokens, uniq_r = 0.5
    val short = "too short to pass" // n_tokens < 10 → dropped
    val mem = MemoryStream[DocEvent]
    val q = StreamingCorpusPrep.prepStream(mem.toDS())
      .writeStream.format("memory").queryName("scp_out").outputMode("append").start()
    mem.addData(
      DocEvent(1L, 1000L, good),
      DocEvent(2L, 1100L, short), // quality-dropped
      DocEvent(3L, 1200L, good)) // exact dup of doc 1 within watermark
    q.processAllAvailable()
    val rows = spark.table("scp_out")
      .select("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    val expectedChunks = (good.length - 1) / TextQueries.chunkStep + 1
    assert(rows.map(_._1) == Set(1L), s"only the first good doc survives: $rows")
    assert(rows == (0 until expectedChunks).map(i => (1L, i.toLong)).toSet,
      s"doc 1 must emit $expectedChunks chunks: $rows")
  }

  test("streaming decontamination quarantines docs sharing eval 4-grams, in-row") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    // batch-side bloom over the eval suite's token-4-gram hashes (the
    // tx_decontam_bloom build, tiny fpp so the clean doc can't collide)
    val evalDocs = Seq("the secret eval answer is forty two").toDF("text")
    val eg = evalDocs
      .select(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("toks"))
      .select(explode(expr("sequence(1, size(toks) - 3)")).as("i"), col("toks"))
      .select(expr(LlmHash.sparkH("array_join(slice(toks, i, 4), ' ')")).as("gh"))
      .distinct()
    val bloom = eg.stat.bloomFilter("gh", 1000L, 0.0001)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }

    val mem = MemoryStream[DocEvent]
    val q = StreamingCorpusPrep.decontamStream(mem.toDS(), bytes)
      .writeStream.format("memory").queryName("dc_out").outputMode("append").start()
    mem.addData(
      DocEvent(1L, 1000L, "totally unrelated clean text about nothing special"),
      DocEvent(2L, 1100L, "a doc leaking the secret eval answer is forty two verbatim"),
      DocEvent(3L, 1200L, "tiny")) // fewer tokens than a 4-gram
    q.processAllAvailable()
    val rows = spark.table("dc_out")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    q.stop()
    assert(!rows(1L)._2 && rows(1L)._1 == 0, s"clean doc passes: $rows")
    assert(rows(2L)._2 && rows(2L)._1 >= 1, s"leaking doc quarantined: $rows")
    assert(!rows(3L)._2, s"sub-gram doc is definitively clean: $rows")
  }
}
