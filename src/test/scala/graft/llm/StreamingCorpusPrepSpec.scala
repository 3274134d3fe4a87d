package graft.llm

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}
