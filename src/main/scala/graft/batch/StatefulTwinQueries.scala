package graft.batch

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import Q.{dec4, sqlDec4}

/** Batch twins of the reference's stateful keyed operators (SURVEY.md §2.7)
  * and late-data handling (§2.6). The streaming originals live in
  * `graft.streaming.StatefulOps` (flatMapGroupsWithState); these express the
  * same semantics relationally — `lag`/window functions over (key, ts) replace
  * ValueState reads of "the previous record", which is both the idiomatic
  * batch form and the form Catalyst can optimize (single sort-shuffle per
  * key, whole-stage codegen'd comparisons).
  */
object StatefulTwinQueries {

  private val keyW = "PARTITION BY user_id ORDER BY ts, event_id"

  val all: Seq[Q] = Seq(

    // P1 — TemperatureAlertFunction: alert when |temp - lastTemp| > threshold
    // (chapter7/KeyedStateFunction.scala:73-100). ValueState[lastTemp] → lag().
    Q("p1_jump_alert",
      s"""SELECT event_id, user_id, value, ${sqlDec4(s"value - lag(value) OVER ($keyW)")} AS diff
         |FROM events
         |QUALIFY abs(value - lag(value) OVER ($keyW)) > 50.0
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("rawdiff", col("value") - lag("value", 1).over(w))
        .filter(abs(col("rawdiff")) > 50.0)
        .select(col("event_id"), col("user_id"), col("value"), dec4(col("rawdiff")).as("diff"))
        .orderBy("event_id")
    },

    // P3 — TempIncreaseAlertFunction: monotone rise detection
    // (chapter6/ProcessFunctionTimers.scala:42-97). "Rising for 1s" → the
    // previous two readings strictly increase; timer semantics are exercised
    // in the streaming original, this is the relational fixpoint.
    Q("p3_monotone_rise",
      s"""SELECT event_id, user_id, value
         |FROM events
         |QUALIFY value > lag(value, 1) OVER ($keyW)
         |    AND lag(value, 1) OVER ($keyW) > lag(value, 2) OVER ($keyW)
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev1", lag("value", 1).over(w))
        .withColumn("prev2", lag("value", 2).over(w))
        .filter(col("value") > col("prev1") && col("prev1") > col("prev2"))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },

    // P6 — RaiseAlertFlatMap: alert when temp > threshold AND the global
    // control signal is hot (chapter5/MultiStreamTransformations.scala:77-91).
    // The broadcast "latest smoke level" becomes a 1-row global aggregate
    // cross-joined in (broadcast: no shuffle of the fact side).
    Q("p6_broadcast_gate",
      s"""WITH ctl AS (SELECT ${sqlDec4("avg(value)")} AS global_avg FROM events)
         |SELECT event_id, user_id, value
         |FROM events, ctl
         |WHERE value > CAST(ctl.global_avg AS DOUBLE) * 1.8
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val ctl = ev.agg(dec4(avg("value")).as("global_avg"))
      ev.crossJoin(broadcast(ctl))
        .filter(col("value") > col("global_avg").cast("double") * 1.8)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },

    // P7 — UpdatableTemperatureAlertFunction: per-key thresholds from a
    // broadcast config stream (chapter7/BroadcastStateFunction.scala:69-126).
    // Config = last-update-wins per key (max_by over the update sequence),
    // then a broadcast dim join gates the fact stream.
    Q("p7_dynamic_thresholds",
      s"""WITH cfg AS (
         |  SELECT user_id, ${sqlDec4("avg(value) + 2 * stddev_samp(value)")} AS threshold
         |  FROM events GROUP BY user_id)
         |SELECT e.event_id, e.user_id, e.value, cfg.threshold
         |FROM events e JOIN cfg ON e.user_id = cfg.user_id
         |WHERE e.value > CAST(cfg.threshold AS DOUBLE)
         |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      // cfg is per-user (data-dependent, unbounded at scale) — unhinted;
      // AQE picks the build side from the aggregate's measured size
      val ev = Tables.events(s, d)
      val cfg = ev.groupBy("user_id")
        .agg(dec4(avg("value") + lit(2) * stddev_samp("value")).as("threshold"))
      ev.join(cfg, Seq("user_id"))
        .filter(col("value") > col("threshold").cast("double"))
        .select("event_id", "user_id", "value", "threshold")
        .orderBy("event_id")
    },

    // P8/P9 — HighTempCounter: per-key counts of threshold exceedances plus
    // the global (operator-state) total via a grouping-sets rollup
    // (chapter7/CheckpointedFunctionExample.scala:45-85)
    Q("p8_high_count_rollup",
      s"""SELECT coalesce(CAST(user_id AS VARCHAR), 'ALL') AS key,
         |  count(*) AS high_count
         |FROM events WHERE value > 100.0
         |GROUP BY ROLLUP(user_id)
         |ORDER BY key""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("value") > 100.0)
        .rollup("user_id")
        .agg(count(lit(1)).as("high_count"))
        .select(coalesce(col("user_id").cast("string"), lit("ALL")).as("key"),
          col("high_count"))
        .orderBy("key")
    },

    // E4/E6 — late-data routing: records whose event time lags the
    // high-watermark (max ts seen so far in arrival order) by > 10 minutes
    // are "late" (chapter6/LateDataHandling.scala:129-144). Arrival disorder
    // is manufactured deterministically (±48 min from event_id, same trick
    // as t6) so the check is non-vacuous — events.parquet itself is sorted.
    //
    // Scale note: a raw `max(ts) OVER (ORDER BY event_id)` is a
    // single-partition window over the whole fact table — a scale-killer.
    // The running max is instead decomposed into (1) per-bucket maxima
    // (parallel shuffle on `event_id div 8192`), (2) a prefix max over the
    // tiny bucket aggregate (~|events|/8192 rows — intentionally one task,
    // partitioned by a constant), (3) a broadcast join back + per-bucket
    // running max (parallel). Identical result, no full-table serialization.
    Q("e6_late_filter",
      s"""WITH shuffled AS (
         |  SELECT event_id, user_id,
         |    ts + to_microseconds(((event_id % 97) - 48) * 60 * 1000000) AS sts
         |  FROM events)
         |SELECT event_id, user_id, sts
         |FROM shuffled
         |QUALIFY sts < max(sts) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |         - INTERVAL '10 minutes'
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("timestampadd(MINUTE, CAST(event_id % 97 AS INT) - 48, ts)").as("sts"),
          expr("event_id div 8192").as("bucket"))
      val bucketMax = ev.groupBy("bucket").agg(max("sts").as("bmax"))
      // prefix max over buckets: |events|/8192 rows — constant partition key
      // documents the intentional single task (and silences the
      // "No Partition Defined" WindowExec warning that flags real killers)
      val bucketSeq = Window.partitionBy(lit(0)).orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefix = bucketMax
        .withColumn("prev_bmax", max("bmax").over(bucketSeq))
        .select("bucket", "prev_bmax")
      val inBucket = Window.partitionBy("bucket").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.join(broadcast(prefix), Seq("bucket"))
        // greatest() skips nulls: first bucket has no prefix, first row in
        // each bucket has no in-bucket predecessor
        .withColumn("wm", greatest(max("sts").over(inBucket), col("prev_bmax")))
        .filter(col("sts") < col("wm") - expr("INTERVAL 10 minutes"))
        .select("event_id", "user_id", "sts")
        .orderBy("event_id")
    },

    // A1-rolling (per-record emission): the Flink rolling max emits an update
    // per input record — running max over arrival order per key
    Q("a1_rolling_emission",
      s"""SELECT event_id, user_id,
         |  max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_max
         |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          max("value").over(w).as("running_max"))
        .orderBy("event_id")
    },
  )
}
