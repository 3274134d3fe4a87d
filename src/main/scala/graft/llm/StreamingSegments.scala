package graft.llm

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One decoded energy window arriving in-stream: the upstream decode
  * (Multimodal.decodeAudioWindows or a real ingest's codec stage) emits
  * these — energies, never payloads, cross the shuffle (the signature
  * stance of the streaming dedup guards). `timestamp` is epoch-millis
  * event time, monotone in `w` within a recording (a window's event time
  * is its position in the recording's ingest). */
case class AudioWinEvent(doc_id: Long, w: Long, energy: Long, timestamp: Long)

/** A closed recording's activity summary — the same shape as the batch
  * `mm_audio_segments` row (MultimodalQueries.audioSegmentsOf), so the
  * twin-equality spec compares rows directly. */
case class AudioSegSummary(doc_id: Long, n_windows: Long, n_active: Long,
    n_segments: Long, longest_segment: Long, active_frac: Double)

/** Per-recording VAD state: windows still ahead of the watermark (`buf`
  * as (w, active, tsMs) triples), the incremental fold (last folded
  * window index, open-run length, closed-segment count, longest run,
  * window/active counters), and the last event time seen (the close
  * timer's anchor). */
case class VadState(buf: Seq[(Long, Boolean, Long)], lastW: Long,
    runLen: Long, nSeg: Long, longest: Long, nWin: Long, nActive: Long,
    lastTsMs: Long)

/** Streaming voice-activity segmentation — `mm_audio_segments`' streaming
  * twin: cut an unbounded stream of per-window energies into utterance
  * summaries the moment each recording CLOSES (watermark ≥ its last
  * window + `closeGapMs` — no further window can arrive, since rows
  * behind the watermark are dropped by the exec).
  *
  * Watermark-EXACT (the SessionStream buffered-fold machinery): windows
  * buffer in state until the watermark passes their event time, then fold
  * in WINDOW-INDEX order — within-envelope disorder can never mis-segment
  * (a window arriving "late" but inside the watermark lands in its true
  * run), and replayed duplicates of a buffered window dedupe by index.
  * Active = energy ≥ [[Multimodal.SilenceEnergy]], identical to the batch
  * gate; a run closes on a silent window, a MISSING window index (a
  * dropped decode must split, not silently bridge, an utterance), or
  * recording close. State per recording = the in-flight watermark window
  * + 7 longs; the event-time timer finalizes recordings with no further
  * traffic and REMOVES their state — unlike session ids, a summary needs
  * no cross-recording counter, so closed recordings cost nothing.
  */
object StreamingSegments {

  def activitySegmentsStream(wins: Dataset[AudioWinEvent],
      delay: String = "10 seconds", closeGapMs: Long = 1000L)
      : Dataset[AudioSegSummary] = {
    import wins.sparkSession.implicits._
    wins.toDF()
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withWatermark("ts", delay)
      .as[AudioWinEvent](Encoders.product[AudioWinEvent])
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[VadState, AudioSegSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (doc, rows, state: GroupState[VadState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(
            VadState(Nil, -1L, 0L, 0L, 0L, 0L, 0L, 0L))
          val buf = (st.buf ++ rows.map(r =>
              (r.w, r.energy >= Multimodal.SilenceEnergy, r.timestamp)))
            .distinctBy(_._1)
          val (ripe, pending) = buf.partition(_._3 <= wm)
          var (lastW, runLen, nSeg, longest, nWin, nActive) =
            (st.lastW, st.runLen, st.nSeg, st.longest, st.nWin, st.nActive)
          def closeRun(): Unit = if (runLen > 0) {
            nSeg += 1; longest = math.max(longest, runLen); runLen = 0
          }
          ripe.sortBy(_._1).foreach { case (w, active, _) =>
            if (w > lastW) { // behind-fold duplicates drop
              if (w > lastW + 1) closeRun() // a gap splits the run
              if (active) { runLen += 1; nActive += 1 } else closeRun()
              nWin += 1; lastW = w
            }
          }
          val lastTsMs = (st.lastTsMs +: buf.map(_._3)).max
          // a timer also fires to fold newly-ripe pending windows — that
          // firing must NOT close the recording unless the watermark has
          // cleared the close point too
          if (state.hasTimedOut && pending.isEmpty && wm >= lastTsMs + closeGapMs) {
            closeRun()
            state.remove()
            if (nWin == 0) Iterator.empty
            else Iterator.single(AudioSegSummary(doc, nWin, nActive, nSeg,
              longest, nActive * 1.0 / nWin))
          } else {
            state.update(VadState(pending, lastW, runLen, nSeg, longest,
              nWin, nActive, lastTsMs))
            // wake when the watermark reaches the nearer of: the oldest
            // pending window (fold it) or the recording's close point
            val wake = (pending.map(_._3 + 1) :+ (lastTsMs + closeGapMs)).min
            state.setTimeoutTimestamp(
              math.max(wake, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
