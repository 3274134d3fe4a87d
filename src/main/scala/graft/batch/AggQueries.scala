package graft.batch

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import Q.{dec4, sqlDec4}

/** Batch twins of the reference's keyed rolling aggregations (SURVEY.md §2.4)
  * and windowed aggregations (§2.5).
  *
  * Tumbling event-time windows map to `window($"ts", size)` which Spark
  * executes as a partial→final HashAggregate pair (map-side combine before the
  * shuffle) — the hand-built incremental pre-aggregation of the reference's
  * W5 (`chapter6/WindowFunctions.scala:61-72`) falls out automatically, and at
  * 100 TB the shuffle carries one row per (window, key), not per input row.
  * The oracle twin uses DuckDB's epoch-aligned `time_bucket`, which matches
  * Spark's epoch-aligned `window` for UTC sessions.
  */
object AggQueries {

  val all: Seq[Q] = Seq(

    // A1 — keyBy(id).reduce: running max-by-temperature record, final state
    // (chapter5/KeyedTransformations.scala:44-52). max_by keeps the whole
    // record like the Flink reduce; ties broken by event_id via the struct.
    Q("a1_max_by",
      s"""SELECT user_id, value AS max_value, event_id AS max_event_id
         |FROM events
         |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) = 1
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).groupBy("user_id")
        .agg(max("value").as("max_value"),
          max_by(col("event_id"), struct(col("value"), col("event_id"))).as("max_event_id"))
        .orderBy("user_id")
    },

    // A2 — keyBy(0).sum(1): rolling per-key sum; per-record emission twin via
    // a running-sum window (chapter5/RollingSum.scala:31-33)
    Q("a2_rolling_sum",
      s"""SELECT event_id, user_id,
         |  ${sqlDec4("sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_sum
         |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          dec4(sum("value").over(w)).as("running_sum"))
        .orderBy("event_id")
    },

    // A3 — per-key 10s-windowed max (chapter7/QueryableState.scala:42-44),
    // widened to 10 min for the events cadence
    Q("a3_windowed_max",
      s"""SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start, user_id,
         |  max(value) AS max_value
         |FROM events GROUP BY 1, 2 ORDER BY window_start, user_id""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
          .agg(max("value").as("max_value"))
          .select(col("window.start").as("window_start"), col("user_id"), col("max_value"))
          .orderBy("window_start", "user_id")
    },

    // W1 — flagship: avg temperature per sensor per tumbling window
    // (chapter1/AverageSensorReadings.scala:53-57,68-84); result stamped with
    // the window end like TemperatureAverager
    Q("w1_window_avg",
      s"""SELECT time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS window_end,
         |  user_id, ${sqlDec4("avg(value)")} AS avg_value
         |FROM events GROUP BY 1, 2 ORDER BY window_end, user_id""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 minute"), col("user_id"))
          .agg(dec4(avg("value")).as("avg_value"))
          .select(col("window.end").as("window_end"), col("user_id"), col("avg_value"))
          .orderBy("window_end", "user_id")
    },

    // W2 — incremental per-window min (chapter6/WindowFunctions.scala:37-47)
    Q("w2_window_min",
      s"""SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start, user_id,
         |  min(value) AS min_value
         |FROM events GROUP BY 1, 2 ORDER BY window_start, user_id""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "15 minutes"), col("user_id"))
          .agg(min("value").as("min_value"))
          .select(col("window.start").as("window_start"), col("user_id"), col("min_value"))
          .orderBy("window_start", "user_id")
    },

    // W3 — the AggregateFunction (UDAF) surface: explicit-accumulator avg
    // (AvgTempFunction, chapter6/WindowFunctions.scala:87-105) as an
    // `Aggregator` registered via `functions.udaf` — reduce runs map-side,
    // merge combines partial buffers post-shuffle, same distributed-combine
    // contract as the reference's create/add/merge/getResult.
    Q("w3_custom_aggfn",
      s"""SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start, user_id,
         |  ${sqlDec4("avg(value)")} AS avg_value
         |FROM events GROUP BY 1, 2 ORDER BY window_start, user_id""".stripMargin) {
      (s, d) =>
        val avgTemp = udaf(graft.functions.AvgTempAggregator)
        Tables.events(s, d)
          .groupBy(window(col("ts"), "15 minutes"), col("user_id"))
          .agg(dec4(avgTemp(col("value"))).as("avg_value"))
          .select(col("window.start").as("window_start"), col("user_id"), col("avg_value"))
          .orderBy("window_start", "user_id")
    },

    // W4 — min+max+window-end in one pass (HighAndLowTempProcessFunction,
    // chapter6/WindowFunctions.scala:114-128) — no buffering needed in Spark
    Q("w4_minmax",
      s"""SELECT user_id, min(value) AS min_value, max(value) AS max_value,
         |  time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end
         |FROM events GROUP BY user_id, 4 ORDER BY window_end, user_id""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "5 minutes"), col("user_id"))
          .agg(min("value").as("min_value"), max("value").as("max_value"))
          .select(col("user_id"), col("min_value"), col("max_value"),
            col("window.end").as("window_end"))
          .orderBy("window_end", "user_id")
    },

    // W6 — non-keyed global window avg (chapter8/TransactionalSinkExample.scala:78-89).
    // Flink forces parallelism 1 here; Spark's partial aggregation keeps it
    // parallel — strictly better at scale.
    Q("w6_global_window_avg",
      s"""SELECT strftime(time_bucket(INTERVAL '1 minute', ts), '%Y-%m-%d %H:%M:%S') AS iso_ts,
         |  ${sqlDec4("avg(value)")} AS avg_value
         |FROM events GROUP BY 1 ORDER BY iso_ts""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 minute"))
        .agg(dec4(avg("value")).as("avg_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("iso_ts"),
          col("avg_value"))
        .orderBy("iso_ts")
    },

    // W7 — count per (sensor, window) (chapter6/CustomWindow.scala:152-168,
    // chapter6/LateDataHandling.scala:88-98)
    Q("w7_window_count",
      s"""SELECT user_id, time_bucket(INTERVAL '10 minutes', ts) AS window_start,
         |  count(*) AS cnt
         |FROM events GROUP BY 1, 2 ORDER BY user_id, window_start""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("user_id"), window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("user_id"), col("window.start").as("window_start"), col("cnt"))
          .orderBy("user_id", "window_start")
    },

    // W8 — custom 30s assigner `ts - ts % 30000` (chapter6/CustomWindow.scala:56-84):
    // identical math done explicitly on epoch-millis, proving arbitrary
    // assigners are just computed group keys
    Q("w8_custom_assigner",
      s"""SELECT (CAST(floor(epoch_ms(ts) / 30000) AS BIGINT) * 30000) AS window_start_ms,
         |  user_id, count(*) AS cnt
         |FROM events GROUP BY 1, 2 ORDER BY window_start_ms, user_id""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .withColumn("window_start_ms",
            (floor(unix_millis(col("ts")) / 30000).cast("long") * 30000))
          .groupBy("window_start_ms", "user_id")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("window_start_ms", "user_id")
    },

    // Session windows (EventTimeSessionWindows analog, SURVEY §2.5
    // preamble): Spark's session_window works in batch too; the oracle is
    // the classic gaps-and-islands formulation. Session end = last event +
    // gap, matching session_window's semantics. The break is `>=` because a
    // session window's end is EXCLUSIVE: an event arriving exactly `gap`
    // after the previous one falls outside [prev, prev+gap) and starts a
    // new session — `>` would keep it in the old one and diverge on
    // exact-boundary timestamps.
    Q("w_session_counts",
      s"""WITH o AS (
         |  SELECT user_id, ts,
         |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL '30 minutes'
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events
         |),
         |g AS (
         |  SELECT user_id, ts,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS grp
         |  FROM o
         |)
         |SELECT user_id, min(ts) AS session_start,
         |  max(ts) + INTERVAL '30 minutes' AS session_end,
         |  CAST(count(*) AS BIGINT) AS cnt
         |FROM g GROUP BY user_id, grp
         |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("cnt"))
        .orderBy("user_id", "session_start")
    },

    // Sliding window (Flink timeWindow(size, slide) family — not exercised by
    // the reference but same API family, SURVEY §2.5 preamble)
    Q("w_sliding_avg",
      s"""WITH slides AS (
         |  SELECT user_id, value,
         |    time_bucket(INTERVAL '5 minutes', ts) - to_minutes(5 * CAST(g.off AS INTEGER)) AS window_start
         |  FROM events, (SELECT unnest([0,1,2]) AS off) g
         |)
         |SELECT window_start, user_id, ${sqlDec4("avg(value)")} AS avg_value, count(*) AS cnt
         |FROM slides GROUP BY 1, 2 ORDER BY window_start, user_id""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "15 minutes", "5 minutes"), col("user_id"))
          .agg(dec4(avg("value")).as("avg_value"), count(lit(1)).as("cnt"))
          .select(col("window.start").as("window_start"), col("user_id"),
            col("avg_value"), col("cnt"))
          .orderBy("window_start", "user_id")
    },
  )
}
