package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A resolved purchase attribution: `attributed` is "click", "view", or
  * "none"; `touch_us`/`lag_us` are -1 sentinels when unattributed (the
  * batch twin emits NULL — the spec maps between the two; an Option in a
  * state/output case class would box every row). */
case class AttributionHit(user_id: Long, purchase_us: Long, attributed: String,
    touch_us: Long, lag_us: Long)

/** Per-user attribution state: buffered events ahead of the watermark
  * (parallel ts/type seqs) plus the latest watermark-final click and view
  * times (-1 = none yet). */
case class AttribState(bufUs: Seq[Long], bufTy: Seq[String],
    lastClick: Long, lastView: Long)

/** Online last-touch attribution — `ev_attribution`'s streaming twin (the
  * marketing as-of join served at ingest): each purchase resolves to the
  * user's latest click within the lookback, else latest view, else none,
  * the moment the watermark finalizes it.
  *
  * Watermark-EXACT (the `asofEnrichExact`/`funnelStream` buffered-fold
  * machinery): events buffer in keyed state until the watermark passes
  * their event time, then fold in EVENT-TIME order with touches before
  * purchases at equal ts — the batch operator's `<=` tie semantics — so a
  * click arriving in a later micro-batch than its purchase (but inside the
  * watermark) still attributes. State per user is the in-flight window
  * plus two longs; the buffer always drains, and an event-time timer
  * flushes without further key traffic.
  */
object AttributionStream {

  /** Attribution lookback (µs) — matches the batch twin (7 days). */
  val attrUs: Long = 7L * 24 * 3600 * 1000 * 1000

  private val none = -1L

  def attributionStream(events: Dataset[UserEvent], delay: String = "10 seconds")
      : Dataset[AttributionHit] = {
    import events.sparkSession.implicits._
    events.toDF()
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withWatermark("ts", delay)
      .as[UserEvent](Encoders.product[UserEvent])
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttribState, AttributionHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[AttribState]) =>
          val w = state.getCurrentWatermarkMs() * 1000L // µs
          val st = state.getOption.getOrElse(AttribState(Nil, Nil, none, none))
          val add = rows.map(e => (e.timestamp * 1000L, e.event_type)).toSeq
          val buf = (st.bufUs zip st.bufTy) ++ add
          val (ripe, pending) = buf.partition(_._1 <= w)
          var (lc, lv) = (st.lastClick, st.lastView)
          val out = Seq.newBuilder[AttributionHit]
          // touches before purchases at equal ts — the batch `<=` tie order
          ripe.sortBy { case (ts, ty) => (ts, if (ty == "purchase") 1 else 0) }
            .foreach {
              case (ts, "click") => lc = ts
              case (ts, "view") => lv = ts
              case (ts, "purchase") =>
                out += (if (lc != none && ts - lc <= attrUs)
                  AttributionHit(uid, ts, "click", lc, ts - lc)
                else if (lv != none && ts - lv <= attrUs)
                  AttributionHit(uid, ts, "view", lv, ts - lv)
                else AttributionHit(uid, ts, "none", none, none))
              case _ => // non-funnel event types carry no attribution weight
            }
          state.update(AttribState(pending.map(_._1), pending.map(_._2), lc, lv))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(pending.map(_._1).min / 1000L + 1, state.getCurrentWatermarkMs() + 1))
          out.result().iterator
      }
  }
}
