package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming attributor must equal the batch `ev_attribution` on the
  * same events even when arrival order is shuffled across micro-batches —
  * including a click that arrives AFTER its purchase (in a later batch)
  * but earlier in event time. */
class AttributionStreamSpec extends SparkSpec {

  private val H = 3600L * 1000 // one hour in ms
  private val D = 24 * H
  // event-time base: keep every planted event strictly ahead of the
  // initial watermark floor (0), where the exec's late-row filter bites
  private val B = 30 * D

  test("attributionStream: shuffled multi-batch arrival equals the batch attributor") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the FunnelSpec attribution corpus (ms timestamps): click-beats-view,
    // view fallback, 7-day lookback binds, unattributed, same-instant
    // click, re-attribution, future touch ignored
    val events = Seq(
      UserEvent(1L, B + 1 * H, "view"), UserEvent(1L, B + 2 * H, "click"),
      UserEvent(1L, B + 3 * H, "purchase"),
      UserEvent(2L, B + 1 * H, "view"), UserEvent(2L, B + 2 * H, "purchase"),
      UserEvent(3L, B + 1 * H, "click"), UserEvent(3L, B + 7 * D + 1 * H, "view"),
      UserEvent(3L, B + 8 * D + 1 * H, "purchase"),
      UserEvent(4L, B + 1 * H, "signup"), UserEvent(4L, B + 2 * H, "purchase"),
      UserEvent(5L, B + 1 * H, "click"), UserEvent(5L, B + 1 * H, "purchase"),
      UserEvent(5L, B + 2 * H, "purchase"),
      UserEvent(6L, B + 1 * H, "purchase"), UserEvent(6L, B + 2 * H, "click"))

    val want = graft.batch.FunnelQueries.attributionDF(
        events.zipWithIndex.map { case (e, i) =>
          (e.user_id, i.toLong, e.event_type, e.timestamp * 1000L)
        }.toDF("user_id", "event_id", "event_type", "us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getString(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5))))
      .toMap

    // adversarial arrival: reverse event-time order across batches, so
    // every purchase arrives BEFORE its touches — the watermark fold must
    // still attribute by event time
    val shuffled = events.sortBy(-_.timestamp)
    val (b1, b2) = shuffled.splitAt(7)
    val mem = MemoryStream[UserEvent]
    val q = AttributionStream.attributionStream(mem.toDS(), delay = "240 hours")
      .writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    mem.addData(UserEvent(999L, B + 100000 * D, "signup"))
    q.processAllAvailable()
    val got = spark.table("attr_out").filter(col("user_id") =!= 999L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap
    q.stop()

    assert(got.keySet == want.keySet,
      s"purchase set mismatch: got ${got.keySet}, want ${want.keySet}")
    for ((k, v) <- want) assert(got(k) == v, s"purchase $k: got ${got(k)}, want $v")
  }
}
