package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.SensorReading

/** Late-data handling & side-output emulation (SURVEY.md §2.6, E4–E6).
  *
  * Structured Streaming has no `OutputTag` side outputs. The reusable
  * pattern here (SURVEY §7.4/§7.5.1): one logical stream, two queries —
  * the main query relies on `withWatermark` dropping late rows from its
  * windows; the late stream is the same source filtered against the
  * watermark envelope. The watermark is approximated per-batch as
  * `runningMax(ts) − delay`, which is exactly how SS computes it between
  * micro-batches (global max of the previous batch minus delay).
  */
object LateData {

  /** E5/E6 — split a keyed stream into (main, late) against a watermark
    * tracked in keyed state. The returned dataset tags each record instead
    * of side-outputting it; downstream sinks filter on the tag — the
    * operational equivalent of `getSideOutput`, expressible as one scan. */
  case class Tagged(id: String, timestamp: Long, temperature: Double, late: Boolean)

  case class MaxTs(maxTs: Long)

  def tagLate(readings: Dataset[SensorReading], delayMs: Long): Dataset[Tagged] = {
    import readings.sparkSession.implicits._
    // Global watermark needs a global max: track per-key max here (scales:
    // no single hot key) and let the caller union keys when a Flink-style
    // global watermark is wanted. Per-key lateness is strictly stronger.
    readings.groupByKey(_.id)
      .flatMapGroupsWithState[MaxTs, Tagged](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id, rows, state: GroupState[MaxTs]) =>
          var wmMax = state.getOption.map(_.maxTs).getOrElse(Long.MinValue)
          val out = rows.toSeq.sortBy(_.timestamp).map { r =>
            val isLate = wmMax != Long.MinValue && r.timestamp < wmMax - delayMs
            wmMax = math.max(wmMax, r.timestamp)
            Tagged(id, r.timestamp, r.temperature, isLate)
          }
          state.update(MaxTs(wmMax))
          out.iterator
      }
  }

  /** E4 — allowedLateness + first/update result tagging
    * (`chapter6/LateDataHandling.scala:112-172` UpdatingWindowCountFunction):
    * per-(key, window) count re-emitted with an "update" tag when late rows
    * revise it. Window bucketing + emitted-before flag live in group state;
    * EventTimeTimeout evicts buckets `lateness` past the watermark. */
  case class WindowCounts(counts: Map[Long, Long], emitted: Set[Long])

  def updatingWindowCounts(readings: Dataset[SensorReading], windowMs: Long,
      delay: String = "5 seconds"): Dataset[(String, Long, Long, String)] = {
    import readings.sparkSession.implicits._
    readings
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withWatermark("ts", delay)
      .as[SensorReading]
      .groupByKey(_.id)
      .flatMapGroupsWithState[WindowCounts, (String, Long, Long, String)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (id, rows, state: GroupState[WindowCounts]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(WindowCounts(Map.empty, Set.empty))
            // per-window eviction (reference evicts at windowEnd +
            // allowedLateness, chapter6/LateDataHandling.scala:147-172):
            // once the watermark passes a window's end, `withWatermark`
            // filters any further row for it upstream, so its entry can
            // never change again — drop it NOW. Without this, a
            // continuously active key accumulates one entry per window
            // forever (the whole-key timeout below only fires on idle keys).
            val wm = state.getCurrentWatermarkMs()
            if (wm > Long.MinValue) {
              st = WindowCounts(
                st.counts.filter { case (w, _) => w + windowMs > wm },
                st.emitted.filter(w => w + windowMs > wm))
            }
            val touched = scala.collection.mutable.LinkedHashSet[Long]()
            rows.foreach { r =>
              val w = r.timestamp - r.timestamp % windowMs
              st = st.copy(counts = st.counts.updated(w, st.counts.getOrElse(w, 0L) + 1))
              touched += w
            }
            val out = touched.toSeq.sorted.map { w =>
              val tag = if (st.emitted(w)) "update" else "first"
              st = st.copy(emitted = st.emitted + w)
              (id, w + windowMs, st.counts(w), tag)
            }
            state.update(st)
            // whole-key GC for idle keys: one window of grace past the
            // newest window end (live windows are pruned individually above)
            if (st.counts.nonEmpty)
              state.setTimeoutTimestamp(st.counts.keys.max + 2 * windowMs)
            out.iterator
          }
      }
  }

  /** The batch-side splitter used by tests and `foreachBatch` sinks: given
    * any micro-batch DataFrame with an epoch-millis `timestamp` column,
    * return (onTime, late) against `max(ts) − delayMs`. One scan each;
    * Catalyst pushes the filter down. */
  def splitBatch(batch: DataFrame, delayMs: Long): (DataFrame, DataFrame) = {
    val wm = batch.agg(max(col("timestamp"))).first() match {
      case r if r.isNullAt(0) => Long.MinValue
      case r => r.getLong(0) - delayMs
    }
    (batch.filter(col("timestamp") >= wm), batch.filter(col("timestamp") < wm))
  }
}
