package graft.llm

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {

  test("streaming exact dedup drops in-watermark duplicates, frees state after") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    val q = StreamingDedup.dedupExactStream(mem.toDS(), "10 seconds")
      .select("doc_id")
      .writeStream.format("memory").queryName("sd_out").outputMode("append").start()

    mem.addData(DocEvent(1L, 1000L, "hello"), DocEvent(2L, 1500L, "world"))
    q.processAllAvailable()
    mem.addData(DocEvent(3L, 2000L, "hello")) // duplicate within watermark: dropped
    q.processAllAvailable()
    // jump event time far ahead: watermark passes hello's eviction point
    mem.addData(DocEvent(4L, 200000L, "advance"))
    q.processAllAvailable()
    mem.addData(DocEvent(5L, 201000L, "advance2")) // extra batch applies the watermark
    q.processAllAvailable()
    mem.addData(DocEvent(6L, 202000L, "hello")) // state evicted: re-emitted as new
    q.processAllAvailable()
    val ids = spark.table("sd_out").as[Long].collect().toSet
    q.stop()
    assert(ids == Set(1L, 2L, 4L, 5L, 6L),
      s"doc 3 must dedup against doc 1; doc 6 arrives after eviction: $ids")
  }

  test("streaming near-dup dedup suppresses same-signature docs via row-local simhash") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "sleepy cats watch from a warm windowsill in the late afternoon sun"
    // find a one-char edit that provably keeps the simhash (a single edit
    // flips only ~5 gram instances; most leave every bit-weight's sign
    // alone, but which do is data-dependent — verify in batch, then
    // stream). 60 signature bits make any single candidate less likely to
    // keep all signs than 32 did, so search edits of several words; the
    // whole candidate batch is scored in ONE query.
    val targets = Seq("windowsill", "afternoon", "seventeen", "sleepy", "quick")
    val candidates = for {
      w <- targets; c <- 'a' to 'z'
      v = base.replace(w, w.dropRight(1) + c) if v != base
    } yield v
    val sigs = (base +: candidates).toDF("text")
      .selectExpr("text", "simhash_sig(rolling_hash(text, 5)) AS s")
      .as[(String, Long)].collect().toMap
    val baseSig = sigs(base)
    val variant = candidates.find(v => sigs(v) == baseSig)
      .getOrElse(fail("no same-signature one-char variant found"))
    val mem = MemoryStream[DocEvent]
    val q = StreamingDedup.dedupNearStream(mem.toDS(), "10 seconds")
      .select("doc_id")
      .writeStream.format("memory").queryName("snd_out").outputMode("append").start()
    mem.addData(
      DocEvent(1L, 1000L, base),
      DocEvent(2L, 1500L, variant),
      DocEvent(3L, 1600L, "completely different content about spark and flink engines"))
    q.processAllAvailable()
    val ids = spark.table("snd_out").as[Long].collect().toSet
    q.stop()
    assert(ids == Set(1L, 3L), s"near-identical doc 2 must be suppressed: $ids")
  }
}
