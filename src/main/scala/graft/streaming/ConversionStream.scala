package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A finalized conversion label: `converted` 1/0; `purchase_us`/`lag_us`
  * are -1 sentinels when unconverted (the batch twin emits NULL — the
  * spec maps between the two). */
case class ConversionHit(user_id: Long, exposure_us: Long, exposure: String,
    converted: Int, purchase_us: Long, lag_us: Long)

/** Per-user labeling state: exposures awaiting a final label (parallel
  * ts/type), and the purchase times still able to label one (pruned — see
  * the fold). */
case class ConvState(expUs: Seq[Long], expTy: Seq[String], purch: Seq[Long])

/** Online conversion labeling — `ev_conversion`'s streaming twin: each
  * view/click exposure is labeled with the user's EARLIEST purchase
  * at-or-after it within the lookahead, the moment that label is FINAL.
  *
  * Finality is the interesting part of the forward join: knowing a
  * candidate purchase isn't enough — an EARLIER-in-event-time purchase
  * can still arrive in a later micro-batch. The label commits when
  *   - the watermark passes the candidate purchase's event time (nothing
  *     can arrive below it), → converted, or
  *   - the watermark passes exposure + lookahead with no candidate inside
  *     the window (any future arrival is beyond it), → not converted.
  * Purchases are visible to the fold as soon as they ARRIVE (even ahead
  * of the watermark) — only finality waits; a same-instant purchase
  * labels its exposure (the batch `<=` mirror).
  *
  * State per user: the in-flight exposures plus the purchase times that
  * can still label one — purchases behind both the watermark and the
  * oldest pending exposure are pruned every invocation (a future exposure
  * has us > watermark, so a purchase at-or-behind the watermark can never
  * label it forward). An event-time timer wakes the key at the nearest
  * finality point; no further traffic needed. */
object ConversionStream {

  /** Lookahead (µs) — matches the batch twin (7 days). */
  val lookUs: Long = 7L * 24 * 3600 * 1000 * 1000

  private val none = -1L

  def conversionStream(events: Dataset[UserEvent], delay: String = "10 seconds")
      : Dataset[ConversionHit] = {
    import events.sparkSession.implicits._
    events.toDF()
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withWatermark("ts", delay)
      .as[UserEvent](Encoders.product[UserEvent])
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ConvState, ConversionHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[ConvState]) =>
          val w = state.getCurrentWatermarkMs() * 1000L // µs
          val st = state.getOption.getOrElse(ConvState(Nil, Nil, Nil))
          var purch = st.purch
          val newExp = Seq.newBuilder[(Long, String)]
          rows.foreach { e =>
            val us = e.timestamp * 1000L
            e.event_type match {
              case "purchase" => purch = purch :+ us
              case "view" | "click" => newExp += ((us, e.event_type))
              case _ => // non-label event types
            }
          }
          val exps = (st.expUs zip st.expTy) ++ newExp.result()
          val sortedP = purch.sorted
          val out = Seq.newBuilder[ConversionHit]
          val still = Seq.newBuilder[(Long, String)]
          exps.foreach { case (us, ty) =>
            val cand = sortedP.find(_ >= us) // earliest at-or-after
            cand match {
              case Some(p) if p <= us + lookUs && w >= p =>
                // nothing can arrive below p anymore: the label is final
                out += ConversionHit(uid, us, ty, 1, p, p - us)
              case _ if w >= us + lookUs =>
                // window fully behind the watermark with no in-window
                // candidate: future arrivals are beyond it
                out += ConversionHit(uid, us, ty, 0, none, none)
              case _ => still += ((us, ty))
            }
          }
          val pending = still.result()
          // prune: a purchase behind BOTH the watermark and every pending
          // exposure can never label anything again
          val floor = pending.map(_._1).minOption.getOrElse(w + 1)
          val kept = sortedP.filter(p => p >= floor || p > w)
          if (pending.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(ConvState(pending.map(_._1), pending.map(_._2), kept))
            if (pending.nonEmpty) {
              // wake at the nearest finality point
              val wake = pending.map { case (us, _) =>
                sortedP.find(_ >= us).filter(_ <= us + lookUs)
                  .getOrElse(us + lookUs)
              }.min + 1
              state.setTimeoutTimestamp(
                math.max(wake / 1000L + 1, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.result().iterator
      }
  }
}
