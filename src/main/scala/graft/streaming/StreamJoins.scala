package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.SensorReading

/** Stream-stream joins — surface the reference does NOT have (its
  * multi-stream programs are connects/broadcasts, SURVEY §2.8), provided
  * because Structured Streaming supports them natively and a user
  * replacing the reference's `connect` topologies frequently wants the
  * relational form instead.
  *
  * Structured Streaming requires an EQUALITY predicate (the state store
  * partitions on it) plus the event-time range bound; with watermarks on
  * both sides each store holds only the interval's worth of rows —
  * bounded state at any scale, hash-partitioned on the key. A non-keyed
  * control stream (like the reference's smoke broadcast) is NOT this
  * shape — that stays the broadcast pattern of
  * [[MultiStream.smokeAlertsStream]].
  */
object StreamJoins {

  /** Keyed interval join: pair each left reading with the same sensor's
    * right-side readings at most `withinMs` earlier
    * (`right.ts ∈ [left.ts − withinMs, left.ts]`) — the "correlate a spike
    * with its recent history" topology. Output: (id, lts, ltemp, rts,
    * rtemp). */
  def correlatedReadings(left: Dataset[SensorReading],
      right: Dataset[SensorReading], withinMs: Long = 10000L,
      joinType: String = "inner"): DataFrame = {
    val l = left.toDF()
      .withColumn("lts", timestamp_millis(col("timestamp")))
      .withWatermark("lts", "5 seconds")
      .select(col("id"), col("lts"), col("temperature").as("ltemp"))
    val r = right.toDF()
      .withColumn("rts", timestamp_millis(col("timestamp")))
      .withWatermark("rts", "5 seconds")
      .select(col("id").as("rid"), col("rts"), col("temperature").as("rtemp"))
    l.join(r,
      col("id") === col("rid") &&
        expr(s"rts >= lts - make_dt_interval(0, 0, 0, ${withinMs / 1000.0}) AND rts <= lts"),
      joinType)
      .drop("rid")
  }
}
