package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming spike detector, served the batch-trained baseline, must
  * equal the batch `ev_anomaly` on the same events under shuffled
  * multi-batch arrival — including the exact z-boundary case. */
class AnomalyStreamSpec extends SparkSpec {

  private val DAY = 24L * 3600 * 1000 // ms
  private val B = 30 * DAY

  test("anomalyStream: pinned baseline reproduces the batch z-test exactly") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def days(u: Long, counts: Seq[Int]): Seq[UserEvent] =
      counts.zipWithIndex.flatMap { case (c, i) =>
        // spread a day's events across distinct ms so batching can split them
        (0 until c).map(k => UserEvent(u, B + i * DAY + k * 60000L, "view"))
      }
    val events =
      days(1L, Seq.fill(11)(1) :+ 5) ++ // clears z=3 strictly -> flagged
      days(2L, Seq.fill(9)(1) :+ 50) ++ // z^2 = n-1 = 9 exactly -> NOT flagged
      days(3L, Seq.fill(5)(4)) ++       // uniform -> nothing above mean
      days(4L, Seq(1, 100))             // n < 3 -> excluded

    val frame = events.map(e => (e.user_id, e.timestamp / DAY * DAY * 1000L))
      .toDF("user_id", "day_us")
    val stats = graft.batch.FunnelQueries.userDayStats(frame)
    val want = graft.batch.FunnelQueries.anomalyDF(frame)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val shuffled = events.sortBy(-_.timestamp)
    val (b1, b2) = shuffled.splitAt(events.size / 2)
    val mem = MemoryStream[UserEvent]
    val q = AnomalyStream.anomalyStream(mem.toDS(), stats, delay = "15 days")
      .writeStream.format("memory").queryName("anom_out").outputMode("append").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    // sentinel user (no baseline) flushes every window; inner join drops it
    mem.addData(UserEvent(999L, B + 10000 * DAY, "view"))
    q.processAllAvailable()
    val got = spark.table("anom_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()

    assert(want == Set((1L, (B + 11 * DAY) * 1000L, 5L)), s"batch oracle sanity: $want")
    assert(got == want, s"stream: $got, batch: $want")
  }
}
