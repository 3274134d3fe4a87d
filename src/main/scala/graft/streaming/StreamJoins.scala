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
    * fresh reference arrives — the documented staleness floor.
    *
    * TTL mode changes late-row handling: the watermark + EventTimeTimeout
    * it requires make Spark's FlatMapGroupsWithStateExec DROP input rows
    * behind the watermark (spec-pinned), whereas `ttlMs = 0` has no
    * watermark and processes arbitrarily late rows. The timer is still
    * clamped to watermark+1 defensively — `setTimeoutTimestamp` on a past
    * instant would kill the query if that exec-side filtering ever
    * changes. */
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
            // flatMapGroupsWithState does NOT drop watermark-late rows, so a
            // batch whose rows all trail the watermark by more than ttlMs
            // would compute maxTs + ttlMs <= watermark — an illegal (past)
            // timer that kills the query. Clamp to watermark + 1: the key
            // then times out on the next watermark advance, which is the
            // earliest legal reading of "already expired".
            if (ttlMs > 0L) state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
  }

  case class LastRef(ts: Option[Long], temp: Option[Double])

  /** Per-key state of [[asofEnrichExact]]: probes buffered until the
    * watermark passes their ts, references still needed (one "base" ref
    * at-or-below the watermark + all refs above it), and the newest event
    * time seen (drives the TTL timer). */
  case class ExactAsOfState(pendingTs: Seq[Long], pendingTemp: Seq[Double],
      refTs: Seq[Long], refTemp: Seq[Double], maxSeen: Long)

  /** Watermark-EXACT streaming as-of join: equals the batch `j_asof`
    * semantics (`JoinQueries.scala` — latest same-key reference with
    * `ref.ts <= probe.ts`) for every row inside the watermark envelope,
    * unlike [[asofEnrich]] whose probes enrich against only the references
    * that happened to arrive first (the processing-time envelope).
    *
    * Mechanics: probes buffer in state until the watermark passes their
    * event time; by then every reference at-or-before them has either
    * arrived or is watermark-late (dropped at the exec — the envelope
    * boundary), so the enrichment decision is final and batch-identical.
    * References prune to ONE base ref at-or-below the watermark (later
    * probes can only prefer newer refs) plus the refs above it — state is
    * O(in-flight window), not O(stream). An event-time timer re-fires the
    * key when the watermark passes its oldest pending probe, so emission
    * needs no further traffic on the key.
    *
    * The price vs [[asofEnrich]] is latency: output trails the stream by
    * `watermarkDelay`. Same trade Flink makes between its processing-time
    * and event-time temporal joins.
    *
    * `ttlMs > 0` composes: an idle key (nothing pending) whose newest row
    * is `ttlMs` behind the watermark is evicted, the P4 pattern. A pending
    * probe always wins over eviction — its finalize timer is nearer.
    *
    * Ref ties at equal ts resolve by max temp (deterministic; the batch
    * operator uses (ts, event_id) — SensorReading has no unique id). */
  def asofEnrichExact(probes: Dataset[SensorReading], refs: Dataset[SensorReading],
      watermarkDelay: String = "5 seconds", ttlMs: Long = 0L): Dataset[AsOfEnriched] = {
    val spark = probes.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val routed = probes.map(r => StatefulOps.Routed(r.id, 0, r.timestamp, r.temperature, 0L, 0.0))
      .union(refs.map(r => StatefulOps.Routed(r.id, 1, r.timestamp, r.temperature, 0L, 0.0)))
      .toDF()
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", watermarkDelay)
      .as[StatefulOps.Routed]
    routed.groupByKey(_.key)
      .flatMapGroupsWithState[ExactAsOfState, AsOfEnriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (id, rows, state: GroupState[ExactAsOfState]) =>
          val w = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(ExactAsOfState(Nil, Nil, Nil, Nil, Long.MinValue))
          var maxSeen = st.maxSeen
          val newProbes = Seq.newBuilder[(Long, Double)]
          val newRefs = Seq.newBuilder[(Long, Double)]
          rows.foreach { r =>
            if (r.kind == 1) newRefs += ((r.ts, r.temp)) else newProbes += ((r.ts, r.temp))
            maxSeen = math.max(maxSeen, r.ts)
          }
          val pending = (st.pendingTs.zip(st.pendingTemp) ++ newProbes.result())
          val refsAll = (st.refTs.zip(st.refTemp) ++ newRefs.result())
          // finalize: the watermark guarantees no more refs at-or-before
          // these probes can arrive — the decision is batch-exact
          val (ready, stillPending) = pending.partition(_._1 <= w)
          val out = ready.sortBy(identity).map { case (pts, ptemp) =>
            val best = refsAll.filter(_._1 <= pts)
            if (best.isEmpty) AsOfEnriched(id, pts, ptemp, None, None)
            else {
              val (rts, rtemp) = best.max
              AsOfEnriched(id, pts, ptemp, Some(rts), Some(rtemp))
            }
          }
          // prune refs: of those at-or-below the watermark only the latest
          // can ever win again; keep it plus everything above the watermark
          val (past, future) = refsAll.partition(_._1 <= w)
          val kept = (if (past.nonEmpty) Seq(past.max) else Nil) ++ future
          if (stillPending.nonEmpty) {
            state.update(ExactAsOfState(stillPending.map(_._1), stillPending.map(_._2),
              kept.map(_._1), kept.map(_._2), maxSeen))
            // fire when the watermark passes the oldest pending probe
            state.setTimeoutTimestamp(math.max(stillPending.map(_._1).min + 1, w + 1))
          } else if (ttlMs > 0L && maxSeen + ttlMs <= w) {
            state.remove() // TTL: idle key fully behind the watermark
          } else {
            state.update(ExactAsOfState(Nil, Nil, kept.map(_._1), kept.map(_._2), maxSeen))
            if (ttlMs > 0L) state.setTimeoutTimestamp(math.max(maxSeen + ttlMs, w + 1))
          }
          out.iterator
      }
  }
}
