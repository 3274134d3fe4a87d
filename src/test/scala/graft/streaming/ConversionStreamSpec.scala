package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming labeler must equal the batch `ev_conversion` under
  * shuffled multi-batch arrival — in particular, a purchase arriving in a
  * LATER batch but EARLIER in event time than an already-seen candidate
  * must win (the finality-wait contract). */
class ConversionStreamSpec extends SparkSpec {

  private val H = 3600L * 1000
  private val D = 24 * H
  private val B = 30 * D

  test("conversionStream: shuffled multi-batch arrival equals the batch labeler") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val events = Seq(
      // u1: view -> two purchases, earliest labels
      UserEvent(1L, B + 1 * H, "view"), UserEvent(1L, B + 3 * H, "purchase"),
      UserEvent(1L, B + 5 * H, "purchase"),
      // u2: purchase 8 days out — outside the lookahead
      UserEvent(2L, B + 1 * H, "click"), UserEvent(2L, B + 8 * D + 1 * H, "purchase"),
      // u3: past purchase never labels forward
      UserEvent(3L, B + 1 * H, "purchase"), UserEvent(3L, B + 2 * H, "view"),
      // u4: same-instant purchase converts with lag 0
      UserEvent(4L, B + 1 * H, "click"), UserEvent(4L, B + 1 * H, "purchase"),
      // u5: candidate swap across batches — under reverse arrival the 5h
      // purchase is seen FIRST, then the 3h one arrives and must win
      UserEvent(5L, B + 1 * H, "view"), UserEvent(5L, B + 3 * H, "purchase"),
      UserEvent(5L, B + 5 * H, "purchase"))

    val want = graft.batch.FunnelQueries.conversionDF(
        events.zipWithIndex.map { case (e, i) =>
          (e.user_id, i.toLong, e.event_type, e.timestamp * 1000L)
        }.toDF("user_id", "event_id", "event_type", "us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)) ->
        ((r.getString(2), r.getInt(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6))))
      .toMap

    val shuffled = events.sortBy(-_.timestamp)
    val (b1, b2) = shuffled.splitAt(6)
    val mem = MemoryStream[UserEvent]
    val q = ConversionStream.conversionStream(mem.toDS(), delay = "240 hours")
      .writeStream.format("memory").queryName("conv_out").outputMode("append").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    mem.addData(UserEvent(999L, B + 100000 * D, "view"))
    q.processAllAvailable()
    val got = spark.table("conv_out").filter(col("user_id") =!= 999L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getInt(3), r.getLong(4), r.getLong(5))))
      .toMap
    q.stop()

    assert(got.keySet == want.keySet,
      s"exposure set mismatch: got ${got.keySet}, want ${want.keySet}")
    for ((k, v) <- want) assert(got(k) == v, s"exposure $k: got ${got(k)}, want $v")
    // the cross-batch case specifically: u5 labeled by the LATER-arriving
    // earlier purchase
    assert(got((5L, (B + 1 * H) * 1000L))._3 == (B + 3 * H) * 1000L,
      "u5 must re-resolve to the earlier purchase that arrived later")
  }
}
