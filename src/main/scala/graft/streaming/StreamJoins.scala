package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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
    * rtemp).
    *
    * `joinType = "left_outer"` gives the missing-reference enrichment form:
    * a probe with no in-interval match emits ONCE, null-padded, when both
    * watermarks pass its range end (state eviction) — spec-pinned, since
    * the deferred emission surprises users expecting batch outer-join
    * timing. */
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

  /** A probe reading enriched with the latest same-key reference reading
    * at-or-before it (None until the first reference arrives). */
  case class AsOfEnriched(id: String, ts: Long, temp: Double,
      refTs: Option[Long], refTemp: Option[Double])

  /** Streaming as-of join — the temporal-table-join topology (latest quote
    * per trade, latest snapshot per event) and the streaming twin of the
    * batch `j_asof` operator. Structured Streaming's stream-stream join
    * has no "latest matching row" form (every range match is emitted), so
    * this is the (c)-path custom operator: union-ADT + ONE
    * flatMapGroupsWithState whose per-key state is the single latest
    * reference (constant bytes per key — smaller than any buffering join).
    *
    * Within a micro-batch rows process in event-time order with references
    * before probes at equal ts, so a probe sees exactly the references
    * at-or-before it (the batch `<=` semantics). ACROSS batches the
    * envelope is the streaming reality shared with Flink's
    * processing-time temporal join: a reference arriving in a later batch
    * cannot retro-enrich an earlier batch's probes. Probes are never
    * buffered awaiting late references; they enrich against the newest
    * state seen so far.
    *
    * `ttlMs > 0` bounds TOTAL state under key churn (constant bytes/key
    * still leaves unbounded KEYS at 100 TB): an event-time timer (the P4
    * pattern) evicts a key whose newest row is `ttlMs` behind the
    * watermark; a later probe on the evicted key enriches as None until a
    * fresh reference arrives — the documented staleness floor. */
  def asofEnrich(probes: Dataset[SensorReading], refs: Dataset[SensorReading],
      ttlMs: Long = 0L, watermarkDelay: String = "5 seconds"): Dataset[AsOfEnriched] = {
    val spark = probes.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val routed0 = probes.map(r => StatefulOps.Routed(r.id, 0, r.timestamp, r.temperature, 0L, 0.0))
      .union(refs.map(r => StatefulOps.Routed(r.id, 1, r.timestamp, r.temperature, 0L, 0.0)))
    val routed =
      if (ttlMs <= 0L) routed0
      else routed0.toDF() // EventTimeTimeout needs a watermark on the union
        .withColumn("ets", timestamp_millis(col("ts")))
        .withWatermark("ets", watermarkDelay)
        .as[StatefulOps.Routed]
    val timeout =
      if (ttlMs <= 0L) GroupStateTimeout.NoTimeout else GroupStateTimeout.EventTimeTimeout
    routed.groupByKey(_.key)
      .flatMapGroupsWithState[LastRef, AsOfEnriched](OutputMode.Append, timeout) {
        (id, rows, state: GroupState[LastRef]) =>
          if (ttlMs > 0L && state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(LastRef(None, None))
            val out = Seq.newBuilder[AsOfEnriched]
            var maxTs = 0L
            // event-time order, refs (kind 1) before probes at equal ts —
            // the batch operator's tie semantics
            rows.toSeq.sortBy(r => (r.ts, -r.kind)).foreach { r =>
              if (r.kind == 1) st = LastRef(Some(r.ts), Some(r.temp))
              else out += AsOfEnriched(id, r.ts, r.temp, st.ts, st.temp)
              maxTs = math.max(maxTs, r.ts)
            }
            state.update(st)
            if (ttlMs > 0L) state.setTimeoutTimestamp(maxTs + ttlMs)
            out.result().iterator
          }
      }
  }

  case class LastRef(ts: Option[Long], temp: Option[Double])
}
