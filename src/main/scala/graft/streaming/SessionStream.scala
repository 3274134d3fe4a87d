package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A completed session: same shape as the batch `ev_sessions` rollup
  * (`FunnelQueries.sessionsDF`) so the twin-equality spec compares rows
  * directly. `session_id` numbers a user's sessions 1..n in event time. */
case class SessionRecord(user_id: Long, session_id: Long, n_events: Long,
    start_us: Long, end_us: Long, duration_us: Long)

/** Per-user sessionizer state: events still ahead of the watermark
  * (`bufUs`), the open session being accumulated from watermark-final
  * events (`openStart/openEnd/openCount`; count 0 = none open), and the
  * next session number. The counter is what makes streaming numbering
  * equal the batch 1..n-per-user numbering, so an idle user keeps a
  * 4-long state row rather than being evicted — the documented price of
  * globally consistent session ids (an eviction TTL would restart a
  * returning user at 1). */
case class SessionizerState(bufUs: Seq[Long], openStart: Long, openEnd: Long,
    openCount: Long, nextSid: Long)

/** Online gap-based sessionization — `ev_sessions`' streaming twin,
  * completing the event-analytics trio (funnel L82/L84, retention L82,
  * sessions L83/this): each user's stream is cut at >`gapUs` quiet
  * periods and a full [[SessionRecord]] is appended the moment a session
  * CLOSES (watermark ≥ last event + gap — no later event can extend it,
  * since rows behind the watermark are dropped by the exec).
  *
  * Watermark-EXACT (the `asofEnrichExact` buffered-fold machinery): events
  * buffer in state until the watermark passes their event time, then fold
  * into the open session in EVENT-TIME order — within-envelope disorder
  * can never mis-segment (an event arriving "late" but inside the
  * watermark lands in its true session). The ascending fold needs no
  * resort against the open session: buffered/new rows are all ahead of
  * the previous watermark while the open session's end is at or behind it.
  *
  * Segmentation is identical to the batch twin: an event exactly
  * `gapUs` after the previous one EXTENDS the session (the batch boundary
  * is strictly-greater); closure therefore requires `watermark ≥ end +
  * gap`, at which point any future event is strictly beyond the gap.
  * State per user = the in-flight watermark window + 4 longs; an
  * event-time timer closes sessions with no further traffic on the key.
  */
object SessionStream {

  /** Session gap (µs) — matches the batch twin (30 min). */
  val gapUs: Long = 30L * 60 * 1000 * 1000

  def sessionStream(events: Dataset[UserEvent], delay: String = "10 seconds")
      : Dataset[SessionRecord] = {
    import events.sparkSession.implicits._
    events.toDF()
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withWatermark("ts", delay)
      .as[UserEvent](Encoders.product[UserEvent])
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionizerState, SessionRecord](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[SessionizerState]) =>
          val w = state.getCurrentWatermarkMs() * 1000L // µs
          val st = state.getOption.getOrElse(SessionizerState(Nil, 0L, 0L, 0L, 1L))
          val buf = st.bufUs ++ rows.map(_.timestamp * 1000L)
          val (ripe, pending) = buf.partition(_ <= w)
          var (start, end, count, sid) = (st.openStart, st.openEnd, st.openCount, st.nextSid)
          val out = Seq.newBuilder[SessionRecord]
          def close(): Unit = if (count > 0) {
            out += SessionRecord(uid, sid, count, start, end, end - start)
            sid += 1; count = 0
          }
          ripe.sorted.foreach { us =>
            if (count > 0 && us - end <= gapUs) { end = us; count += 1 }
            else { close(); start = us; end = us; count = 1 }
          }
          // the open session is final once the watermark clears its gap:
          // every future row has ts > w >= end + gap — strictly beyond
          if (count > 0 && w >= end + gapUs) close()
          state.update(SessionizerState(pending, start, end, count, sid))
          // wake when the watermark reaches the nearer of: the oldest
          // pending event (fold it) or the open session's close point
          val wakes = pending.map(_ + 1) ++ (if (count > 0) Seq(end + gapUs) else Nil)
          if (wakes.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(wakes.min / 1000L + 1, state.getCurrentWatermarkMs() + 1))
          out.result().iterator
      }
  }
}
