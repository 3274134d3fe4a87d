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
    * (`chapter6/CustomWindow.scala:56-84,152-168`): a custom assigner is just
    * a computed, codegen'd group key. */
  def customWindowCounts(readings: Dataset[SensorReading], sizeMs: Long = 30000L,
      delay: String = "5 seconds"): DataFrame =
    withEventTime(readings, delay)
      .withColumn("windowStartMs", (col("timestamp") - pmod(col("timestamp"), lit(sizeMs))))
      .groupBy(col("id"), col("windowStartMs"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("id"), (col("windowStartMs") + sizeMs).as("windowEnd"), col("cnt"))

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
