package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming sessionizer must equal the batch `ev_sessions` rollup on
  * the same events even when arrival order is shuffled across micro-batches
  * — the watermark-exact contract — and session numbering must stay 1..n
  * per user (the batch running-sum numbering). */
class SessionStreamSpec extends SparkSpec {

  private val M = 60L * 1000 // one minute in ms

  /** Event-time base: the initial watermark is 0 and the exec's late-row
    * filter excludes rows AT the watermark, so an event planted at t=0
    * would be dropped before the operator ever saw it. Real streams don't
    * carry epoch-zero timestamps; keep every planted event strictly ahead
    * of the floor. */
  private val B = 24 * 60 * M

  test("sessionStream: shuffled multi-batch arrival equals the batch rollup") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // u1: three sessions — a 3-event burst, an exact-gap-boundary extension
    //     (30 min after the previous event still extends), then a single
    //     event 31 min later (new session);
    // u2: one singleton;
    // u3: two sessions interleaved in arrival with u1's
    val events = Seq(
      UserEvent(1L, B + 0 * M, "view"), UserEvent(1L, B + 5 * M, "click"), UserEvent(1L, B + 10 * M, "view"),
      UserEvent(1L, B + 40 * M, "view"),                    // 30 min after 10*M: extends
      UserEvent(1L, B + 71 * M, "view"),                    // 31 min after 40*M: new session
      UserEvent(2L, B + 7 * M, "signup"),
      UserEvent(3L, B + 2 * M, "view"), UserEvent(3L, B + 3 * M, "view"),
      UserEvent(3L, B + 100 * M, "purchase"))

    val want = graft.batch.FunnelQueries.sessionsDF(
        events.zipWithIndex.map { case (e, i) => (e.user_id, i.toLong, e.timestamp * 1000L) }
          .toDF("user_id", "event_id", "us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

    // adversarial arrival: reverse event-time order split across batches —
    // the 3-hour watermark delay covers the corpus's disorder, so folding
    // must land every event in its true session
    val shuffled = events.sortBy(-_.timestamp)
    val (b1, b2) = shuffled.splitAt(4)
    val mem = MemoryStream[UserEvent]
    val q = SessionStream.sessionStream(mem.toDS(), delay = "3 hours")
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    // sentinel far ahead flushes every buffer and closes every open session
    mem.addData(UserEvent(999L, B + 100000 * M, "view"))
    q.processAllAvailable()
    val got = spark.table("sess_out").filter(col("user_id") =!= 999L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    q.stop()

    assert(got.keySet == want.keySet,
      s"session set mismatch: got ${got.keySet}, want ${want.keySet}")
    for ((k, v) <- want) assert(got(k) == v, s"session $k: got ${got(k)}, want $v")
    // numbering is 1..n per user
    for ((u, ss) <- got.keySet.groupBy(_._1))
      assert(ss.map(_._2) == (1L to ss.size).toSet, s"user $u ids: $ss")
  }
}
