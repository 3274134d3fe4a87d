package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming funnel must equal the batch `ev_funnel` on the same events
  * even when arrival order is shuffled across micro-batches — the
  * watermark-exact contract. */
class FunnelStreamSpec extends SparkSpec {

  private val H = 3600L * 1000 // one hour in ms

  test("funnelStream: shuffled multi-batch arrival equals the batch funnel") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the FunnelSpec corpus (ms timestamps): u1 full funnel, u2 pre-view
    // purchase never counts, u3 click outside the 24h step window, u4 two
    // chains — earliest wins, u5 never views
    val events = Seq(
      UserEvent(1L, 1 * H, "view"), UserEvent(1L, 2 * H, "click"), UserEvent(1L, 3 * H, "purchase"),
      UserEvent(2L, 1 * H, "purchase"), UserEvent(2L, 2 * H, "view"), UserEvent(2L, 3 * H, "click"),
      UserEvent(3L, 1 * H, "view"), UserEvent(3L, 27 * H, "click"),
      UserEvent(4L, 1 * H, "view"), UserEvent(4L, 2 * H, "click"), UserEvent(4L, 20 * H, "purchase"),
      UserEvent(4L, 28 * H, "view"), UserEvent(4L, 30 * H, "click"),
      UserEvent(5L, 1 * H, "error"), UserEvent(5L, 2 * H, "signup"))

    val want = graft.batch.FunnelQueries.funnelDF(
        events.toDF().select(col("user_id"), col("event_type"),
          (col("timestamp") * 1000L).as("us")))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))).toMap

    // adversarial arrival: reverse event-time order, split across batches.
    // The corpus spans 30 h of event time, so the watermark delay must
    // cover that disorder (48 h) — reordering INSIDE the watermark envelope
    // must fold back to batch semantics exactly; beyond it, rows drop like
    // any watermarked operator's (the documented envelope).
    val shuffled = events.sortBy(-_.timestamp)
    val (b1, b2) = shuffled.splitAt(7)
    val mem = MemoryStream[UserEvent]
    val q = FunnelStream.funnelStream(mem.toDS(), delay = "48 hours")
      .writeStream.format("memory").queryName("fn_out").outputMode("append").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    // sentinel far in the future flushes every buffered event
    mem.addData(UserEvent(999L, 10000 * H, "error"))
    q.processAllAvailable()
    val hits = spark.table("fn_out").filter(col("user_id") =!= 999L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    q.stop()

    val byUser = hits.groupBy(_._1)
    // each stage commits at most once per user
    byUser.foreach { case (u, hs) =>
      assert(hs.map(_._2).distinct.length == hs.length, s"duplicate stage for $u: $hs")
    }
    for (u <- Seq(1L, 2L, 3L, 4L, 5L)) {
      val hs = byUser.getOrElse(u, Array.empty).map(h => h._2 -> h._3).toMap
      val (vtW, ctW, ptW, depthW) = want(u)
      assert(hs.size == depthW, s"user $u depth: got ${hs.size}, want $depthW ($hs)")
      assert(hs.get(1) == vtW, s"user $u view ts")
      assert(hs.get(2) == ctW, s"user $u click ts")
      assert(hs.get(3) == ptW, s"user $u purchase ts")
    }
  }
}
