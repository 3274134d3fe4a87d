package graft.llm

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming VAD segmenter must equal the batch `mm_audio_segments`
  * rollup (audioSegmentsOf) on the same windows even when arrival order is
  * shuffled across micro-batches and a window is replayed — the
  * watermark-exact contract — and a recording closes only after the
  * watermark clears its last window plus the close gap. */
class StreamingSegmentsSpec extends SparkSpec {

  /** Event-time base: keep planted events strictly ahead of the exec's
    * watermark floor (the SessionStreamSpec stance). */
  private val B = 24 * 60 * 60 * 1000L

  test("activitySegmentsStream: shuffled multi-batch arrival + a replayed window equals the batch rollup") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val active = 20000L // >= SilenceEnergy
    val silent = 100L
    // doc 1: [T,T,F,T,F,T] -> 3 segments, longest 2
    // doc 2: w 0,1,3,4 all active, w=2 missing -> the gap splits: 2 segments
    // doc 3: all silent -> 3 windows, 0 segments (the zero-active edge IN-STREAM)
    val wins = Seq(
      (1L, 0L, active), (1L, 1L, active), (1L, 2L, silent),
      (1L, 3L, active), (1L, 4L, silent), (1L, 5L, active),
      (2L, 0L, active), (2L, 1L, active), (2L, 3L, active), (2L, 4L, active),
      (3L, 0L, silent), (3L, 1L, silent), (3L, 2L, silent))
      .map { case (d, w, e) => AudioWinEvent(d, w, e, B + w * 1000L) }

    val want = MultimodalQueries.audioSegmentsOf(
        wins.map(e => (e.doc_id, e.w, e.energy)).toDF("doc_id", "w", "energy"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))))
      .toMap

    // adversarial arrival: reverse window order split across batches, plus
    // a replayed duplicate of doc 1's w=3 in the second batch
    val shuffled = wins.sortBy(e => -e.w)
    val (b1, b2) = shuffled.splitAt(6)
    val mem = MemoryStream[AudioWinEvent]
    val q = StreamingSegments.activitySegmentsStream(mem.toDS(), delay = "10 seconds")
      .writeStream.format("memory").queryName("vad_out").outputMode("append").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData((b2 :+ AudioWinEvent(1L, 3L, active, B + 3000L)): _*)
    q.processAllAvailable()
    // sentinel far ahead flushes every buffer and closes every recording
    mem.addData(AudioWinEvent(999L, 0L, active, B + 100000000L))
    q.processAllAvailable()
    val got = spark.table("vad_out").filter(col("doc_id") =!= 999L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))))
      .toMap
    q.stop()

    assert(got.keySet == want.keySet,
      s"recording set mismatch: got ${got.keySet}, want ${want.keySet}")
    for ((k, v) <- want) assert(got(k) == v, s"recording $k: got ${got(k)}, want $v")
    assert(got(3L)._3 == 0L, s"all-silent recording reports zero segments: $got")
    assert(got(2L)._3 == 2L, s"a missing window index splits the run: $got")
  }

  test("activitySegmentsStream: a recording does not close while its windows can still arrive") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[AudioWinEvent]
    val q = StreamingSegments.activitySegmentsStream(mem.toDS(), delay = "10 seconds")
      .writeStream.format("memory").queryName("vad_open").outputMode("append").start()
    // two windows; watermark after this batch = B+1000 - 10s < close point
    mem.addData(AudioWinEvent(5L, 0L, 20000L, B), AudioWinEvent(5L, 1L, 20000L, B + 1000L))
    q.processAllAvailable()
    assert(spark.table("vad_open").count() == 0, "recording must still be open")
    // a third window arrives late-but-in-envelope, then the flush sentinel
    mem.addData(AudioWinEvent(5L, 2L, 100L, B + 2000L))
    q.processAllAvailable()
    mem.addData(AudioWinEvent(999L, 0L, 20000L, B + 100000000L))
    q.processAllAvailable()
    val got = spark.table("vad_open").filter(col("doc_id") === 5L).collect()
    q.stop()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 3 && r.getLong(2) == 2 && r.getLong(3) == 1 &&
      r.getLong(4) == 2, s"late-but-in-envelope window folded into its run: $r")
  }
}
