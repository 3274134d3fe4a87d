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

  test("histogramStream: a closed window's histogram equals the batch bucketing of the same rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val HOUR = 3600L * 1000
    // two hours of valued events, shuffled across two micro-batches;
    // values straddle power-of-two cent boundaries (1.27/1.28, 0.01)
    val events = Seq(
      ValueEvent(1L, 0L, "purchase", 1.27),         // 127 cents -> bucket 7
      ValueEvent(2L, 1000L, "purchase", 1.28),      // 128 cents -> bucket 8
      ValueEvent(3L, 2000L, "purchase", 0.01),      // 1 cent    -> bucket 1
      ValueEvent(4L, 3000L, "view", 250.0),         // 25000     -> bucket 15
      ValueEvent(5L, HOUR + 1000L, "purchase", 63.99), // 6399   -> bucket 13 (window 2)
      ValueEvent(6L, HOUR + 2000L, "purchase", 64.0))  // 6400   -> bucket 13
    val shuffled = events.sortBy(-_.timestamp)
    val (b1, b2) = shuffled.splitAt(3)
    val mem = MemoryStream[ValueEvent]
    // delay covers the full reverse-order spread so no row is watermark-late
    val q = AnomalyStream.histogramStream(mem.toDS(), windowLen = "1 hour", delay = "2 hours")
      .writeStream.format("memory").queryName("hist_out").outputMode("append").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    // advance the watermark far past both windows so they close and emit
    mem.addData(ValueEvent(99L, 10 * HOUR, "view", 1.0))
    q.processAllAvailable()
    val got = spark.table("hist_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    q.stop()
    // batch twin: the identical projection + rollup on the same rows
    val want = events.toDF("event_id", "timestamp", "event_type", "value")
      .withColumn("window_start", expr(s"(timestamp div $HOUR) * $HOUR"))
      .withColumn("cents", expr("greatest(cast(floor(value * 100) as bigint), 1)"))
      .withColumn("bucket", expr("cast(length(bin(cents)) as bigint)"))
      .groupBy("window_start", "event_type", "bucket")
      .agg(count(lit(1)).as("n"), min("cents").as("min_cents"), max("cents").as("max_cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(want.exists(w => w._2 == "purchase" && w._3 == 7L) &&
      want.exists(w => w._2 == "purchase" && w._3 == 8L),
      s"boundary cents 127/128 land in adjacent buckets: $want")
    assert(got == want, s"stream: $got\nbatch: $want")
  }

  test("dailyCountsStream + trendOf equals the batch ev_trend fit on the same events") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val DAY = 24L * 3600 * 1000
    // a planted linear ramp (day d has 2 + d 'view' events over 5 days)
    // plus a flat type, shuffled across two micro-batches
    val events = (for { d <- 0 until 5; i <- 0 until (2 + d) } yield
      UserEvent(100L * d + i, d * DAY + i * 1000L, "view")) ++
      (0 until 4).map(d => UserEvent(900L + d, d * DAY + 500L, "click"))
    val shuffled = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(events.toList)
    val (b1, b2) = shuffled.splitAt(events.size / 2)
    val mem = MemoryStream[UserEvent]
    val q = AnomalyStream.dailyCountsStream(mem.toDS(), delay = "6 days")
      .writeStream.format("memory").queryName("trend_out").outputMode("append").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    mem.addData(UserEvent(999L, 30 * DAY, "view")) // close every planted day
    q.processAllAvailable()
    q.stop()
    val got = AnomalyStream.trendOf(spark.table("trend_out"))
      .collect().map(r => r.getString(0) -> r).toMap
    val want = graft.batch.FunnelQueries.trendDF(
      events.toDF("user_id", "timestamp", "event_type")
        .select(col("event_type"), expr(s"timestamp div $DAY").as("day_idx")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == want.keySet)
    for (k <- want.keySet) {
      assert(got(k).getDouble(got(k).fieldIndex("slope_per_day")) ==
        want(k).getDouble(want(k).fieldIndex("slope_per_day")), s"slope for $k")
      assert(got(k).getLong(got(k).fieldIndex("total_cnt")) ==
        want(k).getLong(want(k).fieldIndex("total_cnt")), s"total for $k")
    }
    // the planted ramp's slope is exactly 1 event/day
    assert(got("view").getDouble(got("view").fieldIndex("slope_per_day")) == 1.0)

    // the seasonal forecast consumes the SAME emitted frame: dow means
    // (and the 7-day horizon) equal the batch ev_forecast exactly
    val gotF = AnomalyStream.forecastOf(spark.table("trend_out"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val wantF = graft.batch.FunnelQueries.forecastDF(
      events.toDF("user_id", "timestamp", "event_type")
        .select(col("event_type"), expr(s"timestamp div $DAY").as("day_idx")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(gotF == wantF, s"stream forecast $gotF != batch $wantF")

    // the CUSUM changepoint consumes the SAME emitted frame and must
    // equal the batch ev_changepoint argmax row-for-row
    val gotC = AnomalyStream.changepointOf(spark.table("trend_out"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    val wantC = graft.batch.FunnelQueries.changepointDF(
      events.toDF("user_id", "timestamp", "event_type")
        .select(col("event_type"), expr(s"timestamp div $DAY").as("day_idx")))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(gotC == wantC, s"stream changepoint $gotC != batch $wantC")
  }

  test("cusumAlarmStream: exact scaled recursion, alarm + reset cadence, batch-split-stable") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // baseline: the quiet regime (mu = 20/10 = 2), slack 1, threshold 10.
    // Planted series: 10 quiet days at 2/day (inc = 10·2−20−10 = −10,
    // clamped at 0), then 10 shifted days at 10/day (inc = +70): S·m runs
    // 70, 140 ≥ m·h = 100 → alarm + reset, so alarms land every 2nd
    // shifted day: 11, 13, 15, 17, 19.
    val baseline = Seq(("shift", 20L, 10L)).toDF("event_type", "tot", "m")
    val series = (0 until 10).map(d => DayCount("shift", d.toLong, 2L)) ++
      (10 until 20).map(d => DayCount("shift", d.toLong, 10L))
    var lastSkips: Seq[(Long, Long)] = Nil // (day_idx, n_skipped_days) of the last run
    def run(batches: Seq[Seq[DayCount]]): Seq[(Long, Long, Boolean)] = {
      val mem = MemoryStream[DayCount]
      val name = s"cusum_out_${batches.size}"
      val q = AnomalyStream.cusumAlarmStream(mem.toDS(), baseline, slack = 1L, h = 10L)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val rows = spark.table(name).as[CusumAlarm].collect().sortBy(_.day_idx)
      lastSkips = rows.map(a => (a.day_idx, a.n_skipped_days)).toSeq
      rows.map(a => (a.day_idx, a.cusum_scaled, a.alarm)).toSeq
    }
    // driver-side reference: the same recursion as a scanLeft
    val want = series.scanLeft((0L, -1L, 0L, false)) { case ((s, _, _, _), dc) =>
      val s1 = math.max(0L, s + (10L * dc.c - 20L - 10L * 1L))
      val alarm = s1 >= 10L * 10L
      (if (alarm) 0L else s1, dc.day_idx, s1, alarm)
    }.drop(1).map(t => (t._2, t._3, t._4))
    val oneShot = run(Seq(series))
    assert(oneShot == want, s"recursion: $oneShot != $want")
    // the same series split mid-shift across three micro-batches must
    // produce the identical trail (state carries S across batches)
    val split = run(Seq(series.take(7), series.slice(7, 14), series.drop(14)))
    assert(split == oneShot, s"batch-split drift: $split != $oneShot")
    val alarms = oneShot.filter(_._3).map(_._1)
    assert(alarms == Seq(11L, 13L, 15L, 17L, 19L), s"alarm cadence: $alarms")
    // quiet regime stays clamped at zero — no negative drift accumulates
    assert(oneShot.take(10).forall(_._2 == 0L), s"quiet trail: ${oneShot.take(10)}")
    // REPLAY idempotency: an at-least-once handoff sink re-delivering
    // already-folded closed days (here: batch 2 re-sends all of batch 1
    // before its own new days) must not double-fold the statistic — the
    // lastDay guard skips them and the trail is bit-identical
    val replay = run(Seq(series.take(12), series.take(12) ++ series.drop(12)))
    assert(replay == oneShot, s"replayed days double-folded: $replay != $oneShot")
    // …and the drop is OBSERVABLE, not silent (ADVICE r6): the 12 re-sent
    // days each bump the key's cumulative skip counter, so every reading
    // after the replay carries n_skipped_days = 12 — a monitor on a
    // no-replay source reads the same counter as "a real late/corrected
    // day never folded" and escalates to the batch recompute
    assert(lastSkips.filter(_._1 >= 12L).forall(_._2 == 12L),
      s"post-replay readings must carry the 12 skips: $lastSkips")
    assert(lastSkips.filter(_._1 < 12L).forall(_._2 == 0L),
      s"pre-replay readings carry zero skips: $lastSkips")
  }
}
