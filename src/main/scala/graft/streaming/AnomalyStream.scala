package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Online activity-spike detection — `ev_anomaly`'s ingest twin and the
  * behavioral member of the batch-train / stream-serve family
  * (lmScoreStream's quality cutoffs, lineScrubStream's boilerplate set,
  * decontamStream's bloom): per-user daily baselines (day cardinality,
  * count sum, count square sum — the z-test's exact-integer sufficient
  * statistics) are trained batch-side by `FunnelQueries.userDayStats` and
  * PINNED as the static join side; incoming events count into 1-day
  * event-time windows and a (user, day) row is emitted the moment the
  * watermark closes a spiking day.
  *
  * The z > 3 test is the SAME integer predicate the batch query runs
  * (`FunnelQueries.spikePred` — (n·c − s1)² > 9(n·s2 − s1²)); a stream
  * can't re-estimate its own baseline without re-flagging the past, so
  * pinning the batch statistics is the deployable semantics (the lmScore
  * cutoff-pinning argument). Users absent from the baseline pass through
  * unflagged (no history → no test).
  *
  * Plan shape: stream-static inner join on the user-sized stats table
  * BEFORE the windowed aggregation (a stream-static join downstream of a
  * stateful op is unsupported), baseline columns ride the window group as
  * `min` (constant per user), and the filter is stateless — total state is
  * the open day windows, bounded by the watermark. */
object AnomalyStream {

  /** @param stats batch-trained (user_id, n, s1, s2) from
    *              `FunnelQueries.userDayStats`. */
  def anomalyStream(events: Dataset[UserEvent], stats: DataFrame,
      delay: String = "10 seconds"): DataFrame = {
    events.toDF()
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withWatermark("ts", delay)
      .join(stats, "user_id") // static side: user-sized baseline
      .groupBy(col("user_id"), window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("c"),
        min("n").as("n"), min("s1").as("s1"), min("s2").as("s2"))
      .filter(graft.batch.FunnelQueries.spikePred)
      .select(col("user_id"), unix_micros(col("w.start")).as("day_us"),
        col("c").as("n_events"))
  }

  /** Online value histogram — `ev_histogram`'s ingest twin (the
    * observability pair's streaming half): per event-time window, the same
    * EXACT-INTEGER log2 bucketing (cents = floor(value·100), bucket =
    * length(bin(cents))) aggregated per (window, type, bucket) and emitted
    * when the watermark closes the window. The bucket projection is
    * stateless and byte-identical to the batch query's, so a closed
    * window's histogram equals the batch bucketing of the same rows
    * (spec-pinned). State = open windows × (types·64) buckets — bounded
    * by the watermark, independent of event volume. */
  def histogramStream(events: Dataset[ValueEvent], windowLen: String = "1 hour",
      delay: String = "10 seconds"): DataFrame = {
    events.toDF()
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withWatermark("ts", delay)
      .withColumn("cents", expr("greatest(cast(floor(value * 100) as bigint), 1)"))
      .withColumn("bucket", expr("cast(length(bin(cents)) as bigint)"))
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))
      .select(unix_millis(col("w.start")).as("window_start"),
        col("event_type"), col("bucket"), col("n"), col("min_cents"), col("max_cents"))
  }

  /** Online daily-volume rollup — `ev_trend`'s ingest half: per
    * (event_type, 1-day event-time window) counts emitted in APPEND mode
    * the moment the watermark closes the day — nothing can change a
    * closed day's count, so the emitted frame IS the batch day-grain
    * rollup of the same rows. The trend fit itself stays a
    * types-cardinality computation the consumer runs over the emitted
    * table ([[trendOf]] — literally the batch `trendDF`): the stream owns
    * the one corpus-sized stage (the rollup), the fit costs nothing.
    * State = open day windows per type, volume-independent. */
  def dailyCountsStream(events: Dataset[UserEvent], delay: String = "10 seconds")
      : DataFrame = {
    events.toDF()
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"),
        expr(s"unix_micros(w.start) div ${24L * 3600 * 1000 * 1000}").as("day_idx"),
        col("c"))
  }

  /** The trend fit over [[dailyCountsStream]] emissions: exactly the batch
    * `ev_trend` moments on the closed-day counts. */
  def trendOf(emissions: DataFrame): DataFrame =
    graft.batch.FunnelQueries.trendOfDayCounts(
      emissions.select(col("event_type"), col("day_idx"), col("c")))

  /** The seasonal baseline over [[dailyCountsStream]] emissions: exactly
    * the batch `ev_forecast` dow means on the closed-day counts — the
    * online capacity dashboard refreshes its next-week forecast from the
    * same emitted frame the trend fit consumes. */
  def forecastOf(emissions: DataFrame): DataFrame =
    graft.batch.FunnelQueries.forecastOfDayCounts(
      emissions.select(col("event_type"), col("day_idx"), col("c")))

  /** The CUSUM changepoint over [[dailyCountsStream]] emissions: exactly
    * the batch `ev_changepoint` exact-integer argmax on the closed-day
    * counts — the "did the deploy shift this metric's level, and on which
    * day?" monitor, refreshed from the same emitted frame the trend and
    * forecast consumers read. */
  def changepointOf(emissions: DataFrame): DataFrame =
    graft.batch.FunnelQueries.changepointOfDayCounts(
      emissions.select(col("event_type"), col("day_idx"), col("c")))

  /** Batch-side training half of [[cusumAlarmStream]]: per-type (total,
    * day-cardinality) over a reference period's day-count rollup — the
    * exact-integer sufficient statistics of the mean the CUSUM drifts
    * against (pinned, the anomalyStream argument: a stream re-estimating
    * its own baseline re-flags the past). */
  def dayBaseline(dayCounts: DataFrame): DataFrame =
    dayCounts.groupBy("event_type")
      .agg(sum("c").as("tot"), count(lit(1)).as("m"))

  /** Online one-sided CUSUM level-shift alarm — `ev_changepoint`'s LIVE
    * twin: where the batch detector answers "when DID the level shift?"
    * offline, this fires DURING the shift, keyed per event type over the
    * closed-day count stream (the [[dailyCountsStream]] emission contract,
    * re-streamed from its handoff sink in production).
    *
    * The recursion S_d = max(0, S_{d-1} + (c_d − μ − slack)), alarm when
    * S_d ≥ h, runs EXACTLY in per-type scaled integers: with the pinned
    * baseline (tot, m) — μ = tot/m — everything is multiplied through by
    * m, so the tracked value is S·m (`cusum_scaled`) and the test is
    * S·m ≥ h·m. No float ever enters; both the alarm day and the trail
    * are bit-determined. After an alarm the statistic RESETS to 0 (the
    * standard CUSUM restart), so a sustained shift re-alarms every
    * ⌈h/(δ−slack)⌉ days instead of saturating.
    *
    * State per key is two longs — bounded by |event types|, independent
    * of stream length. Rows process in day order within a micro-batch,
    * and the fold is IDEMPOTENT for replays: a day at or before the
    * newest day already folded (`lastDay`) is skipped, so an
    * at-least-once handoff sink re-delivering a closed day — or a day
    * arriving out of order across micro-batches — cannot double-fold
    * into the statistic and spuriously cross the alarm threshold. A
    * skipped day emits nothing (its reading already went out when it
    * first folded) — but it is NOT silent: the skip is indistinguishable
    * from a genuinely late NEW day or an upstream CORRECTION (whose count
    * would then never enter the statistic), so every emitted reading
    * carries the key's cumulative `n_skipped_days`. A monitor seeing the
    * counter move on a source that should never re-deliver knows a real
    * day was dropped and can trigger the batch `ev_changepoint` recompute,
    * which has no replay ambiguity (ADVICE r6). */
  def cusumAlarmStream(days: Dataset[DayCount], baseline: DataFrame,
      slack: Long, h: Long): Dataset[CusumAlarm] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = days.sparkSession
    import spark.implicits._
    days.toDF()
      .join(baseline, "event_type") // static side: |types|-sized baseline
      .select(col("event_type"), col("day_idx"), col("c"), col("tot"), col("m"))
      .as[(String, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (typ, rows, state) =>
          var st = state.getOption.getOrElse(CusumState(0L, Long.MinValue, 0L))
          val out = Seq.newBuilder[CusumAlarm]
          rows.toSeq.sortBy(_._2).foreach { case (_, day, c, tot, m) =>
            if (day > st.lastDay) { // replayed/out-of-order closed day: already folded
              val s1 = math.max(0L, st.s + (m * c - tot - m * slack))
              val alarm = s1 >= m * h
              out += CusumAlarm(typ, day, s1, alarm, st.nSkipped)
              st = CusumState(if (alarm) 0L else s1, day, st.nSkipped)
            } else {
              // dropped (replay OR a late new/corrected day — can't tell):
              // count it so the drop is observable downstream
              st = st.copy(nSkipped = st.nSkipped + 1)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}

/** One closed day's count on the rollup stream ([[AnomalyStream.dailyCountsStream]]'s
  * emission row). */
case class DayCount(event_type: String, day_idx: Long, c: Long)

/** CUSUM per-key state: the scaled statistic, the newest day folded, and
  * the cumulative count of dropped (at-or-before-lastDay) readings.
  *
  * STATE-ENCODING VERSION NOTE (ADVICE r7): `nSkipped` was added to this
  * case class after the first release of [[AnomalyStream.cusumAlarmStream]];
  * the flatMapGroupsWithState state encoder is positional, so a restart
  * from a checkpoint written by the two-field version fails state
  * deserialization. Deployments upgrading across that boundary must RESET
  * the checkpoint (start a fresh checkpoint dir and re-drive the day
  * rollup from the last closed day — the upstream `dailyCountsStream` is
  * replayable by construction). New fields added here in the future must
  * follow the same rule: document the reset, never reuse an old
  * checkpoint across a state-shape change. */
case class CusumState(s: Long, lastDay: Long, nSkipped: Long)

/** One day's CUSUM reading: the scaled statistic (units of counts/m),
  * whether it crossed the alarm threshold, and the key's cumulative dropped
  * readings so far (replays AND late corrections — nonzero on a
  * no-replay source means a real day never folded). */
case class CusumAlarm(event_type: String, day_idx: Long, cusum_scaled: Long,
    alarm: Boolean, n_skipped_days: Long)

/** A valued event on the metrics ingest stream (epoch-millis timestamp). */
case class ValueEvent(event_id: Long, timestamp: Long, event_type: String, value: Double)
