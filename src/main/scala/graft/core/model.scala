package graft.core

/** Record types mirroring the reference data model (SURVEY.md §1.2).
  *
  * `SensorReading` ← reference `util/SensorReading.scala:19`;
  * `Alert` ← `chapter5/util/Alert.scala:19`;
  * `ThresholdUpdate` ← `chapter7/BroadcastStateFunction.scala:63`;
  * `MinMaxTemp` ← `chapter6/WindowFunctions.scala:107`.
  * Timestamps are epoch-millis Longs like the reference; streaming code
  * derives a TimestampType `ts` column (`to_timestamp(timestamp/1000)`) at
  * ingestion because `withWatermark` requires it.
  */
case class SensorReading(id: String, timestamp: Long, temperature: Double)

case class Alert(message: String, timestamp: Long)

case class SmokeLevelReading(level: String, timestamp: Long)

case class ThresholdUpdate(id: String, threshold: Double)

case class MinMaxTemp(id: String, min: Double, max: Double, endTs: Long)

/** Gating switch for the CoProcessFunction gate
  * (`chapter6/CoProcessFunctionTimers.scala:23-27`). */
case class Switch(id: String, durationMs: Long)

object SmokeLevel {
  val High = "High"
  val Low  = "Low"
}
