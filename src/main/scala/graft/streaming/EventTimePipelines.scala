package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.SensorReading

/** Event-time windowed pipelines (SURVEY.md §2.5/§2.6) on Structured
  * Streaming: `withWatermark` replaces the reference's
  * `BoundedOutOfOrdernessTimestampExtractor` (E1,
  * `util/SensorTimeAssigner.scala:25-30`), `window()`/`session_window`
  * replace Flink window assigners.
  *
  * Every pipeline takes a `Dataset[SensorReading]` (epoch-millis Long
  * timestamps, like the reference) and derives the TimestampType `ts` column
  * itself — one ingestion convention (SURVEY §1.3).
  *
  * Scale notes: windowed aggregation executes as partial aggregation before
  * the shuffle (the hand-built reduce+ProcessWindowFunction combo of W5,
  * `chapter6/WindowFunctions.scala:61-72`, is automatic here); the non-keyed
  * global window (W6) parallelizes the same way instead of Flink's forced
  * parallelism-1.
  *
  * E3 — punctuated watermarks (`chapter6/WatermarkGeneration.scala:67-86`,
  * watermark advanced only by `sensor_1` marker records): Structured
  * Streaming has NO per-record watermark hook — the watermark is recomputed
  * once per micro-batch as global-max(ts) − delay. `withWatermark` is the
  * documented approximation: whenever marker records are at least as
  * frequent as the micro-batch cadence, the batch-boundary watermark
  * envelope coincides with the punctuated one and every downstream windowed
  * result is identical (spec: "E3 punctuated watermark approximation").
  * A stream whose markers stall behind other traffic diverges: SS keeps
  * advancing the watermark on non-marker records, Flink would hold it.
  */
object EventTimePipelines {

  /** Attach the TimestampType event-time column + watermark (E1/E2). */
  def withEventTime(readings: Dataset[SensorReading],
      delay: String = "5 seconds"): DataFrame =
    readings
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withWatermark("ts", delay)

  /** W1 — per-sensor tumbling avg stamped with window end
    * (`chapter1/AverageSensorReadings.scala:53-84` TemperatureAverager). */
  def windowedAvg(readings: Dataset[SensorReading], size: String = "1 second",
      delay: String = "5 seconds"): DataFrame =
    withEventTime(readings, delay)
      .groupBy(window(col("ts"), size), col("id"))
      .agg(avg("temperature").as("avgTemp"))
      .select(col("id"), unix_millis(col("window.end")).as("timestamp"), col("avgTemp"))

  /** W2 — incremental per-window min (`chapter6/WindowFunctions.scala:37-47`). */
  def windowedMin(readings: Dataset[SensorReading], size: String = "15 seconds",
      delay: String = "5 seconds"): DataFrame =
    withEventTime(readings, delay)
      .groupBy(window(col("ts"), size), col("id"))
      .agg(min("temperature").as("minTemp"))
      .select(col("id"), col("minTemp"), unix_millis(col("window.end")).as("windowEnd"))

  /** W4/W5 — min+max+window-end in one pass (HighAndLowTempProcessFunction,
    * `chapter6/WindowFunctions.scala:114-143`) → MinMaxTemp rows. */
  def minMaxTemp(readings: Dataset[SensorReading], size: String = "5 seconds",
      delay: String = "5 seconds"): DataFrame =
    withEventTime(readings, delay)
      .groupBy(window(col("ts"), size), col("id"))
      .agg(min("temperature").as("min"), max("temperature").as("max"))
      .select(col("id"), col("min"), col("max"),
        unix_millis(col("window.end")).as("endTs"))

  /** W6 — global (non-keyed) windowed avg with ISO-formatted window start
    * (`chapter8/TransactionalSinkExample.scala:78-89`). */
  def globalWindowedAvg(readings: Dataset[SensorReading], size: String = "1 second",
      delay: String = "5 seconds"): DataFrame =
    withEventTime(readings, delay)
      .groupBy(window(col("ts"), size))
      .agg(avg("temperature").as("avgTemp"))
      .select(date_format(col("window.start"), "yyyy-MM-dd'T'HH:mm:ss").as("isoTs"),
        col("avgTemp"))

  /** W7/W8 — per-sensor count in 30s windows assigned by `ts - ts % 30000`
    * (`chapter6/CustomWindow.scala:56-84,152-168`).
    *
    * The assigner's math is exactly Spark's epoch-aligned `window()`, so the
    * streaming form groups on `window(ts, sizeMs)`: grouping on a derived
    * plain Long (`ts - ts % size`) computes the same buckets but hides the
    * event-time column from the engine — the watermark then can never evict
    * aggregation state (unbounded growth) and append output is rejected.
    * An assigner Spark can't express as `window()`/`session_window` should
    * emit a TimestampType bucket column and group on that, keeping state
    * eviction; the batch twin (`w8_custom_assigner`) keeps the raw
    * computed-key form where no state is at stake. */
  def customWindowCounts(readings: Dataset[SensorReading], sizeMs: Long = 30000L,
      delay: String = "5 seconds"): DataFrame =
    withEventTime(readings, delay)
      .groupBy(col("id"), window(col("ts"), s"$sizeMs milliseconds"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("id"), unix_millis(col("window.end")).as("windowEnd"), col("cnt"))

  /** W9 — early firing (`chapter6/CustomWindow.scala:87-148`
    * OneSecondIntervalTrigger: FIRE per second of watermark progress,
    * FIRE_AND_PURGE at window end). Structured Streaming's update output
    * mode IS the early-firing loop at micro-batch granularity: every batch
    * re-emits the refined count for windows it touched, and the watermark
    * finalizes + purges window state — same refinement stream, trigger
    * cadence = micro-batch cadence instead of 1s of watermark progress. */
  def earlyFiringCounts(readings: Dataset[SensorReading], sizeMs: Long = 30000L,
      delay: String = "5 seconds"): DataFrame =
    customWindowCounts(readings, sizeMs, delay)

  /** Sliding windows — same Flink API family (`timeWindow(size, slide)`),
    * SURVEY §2.5 preamble. */
  def slidingAvg(readings: Dataset[SensorReading], size: String, slide: String,
      delay: String = "5 seconds"): DataFrame =
    withEventTime(readings, delay)
      .groupBy(window(col("ts"), size, slide), col("id"))
      .agg(avg("temperature").as("avgTemp"))
      .select(col("id"), unix_millis(col("window.end")).as("windowEnd"), col("avgTemp"))

  /** Session windows — `EventTimeSessionWindows` analog via
    * `session_window` (SURVEY §2.5 preamble). */
  def sessionCounts(readings: Dataset[SensorReading], gap: String = "10 seconds",
      delay: String = "5 seconds"): DataFrame =
    withEventTime(readings, delay)
      .groupBy(session_window(col("ts"), gap), col("id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("id"), unix_millis(col("session_window.start")).as("sessionStart"),
        unix_millis(col("session_window.end")).as("sessionEnd"), col("cnt"))
}
