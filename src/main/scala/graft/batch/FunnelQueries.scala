package graft.batch

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Event-sequence analytics over `events.parquet` — the funnel / cohort
  * operators every product-analytics deployment of a streaming engine ends
  * up running (the batch twins of CEP-style ordered-pattern matching; the
  * reference's stateful pattern detectors P1-P3 are the per-record flavor).
  *
  * Scale stance: every step table is a FILTERED scan (`event_type` predicate
  * pushed to parquet) aggregated to user-sized minima before any join, so
  * the join graph never carries raw events — at 100 TB the step joins are
  * user-cardinality hash joins AQE can broadcast, and the only full-event
  * pass is the initial pushdown scan each step's filter prunes. Timestamps
  * compare as epoch-µs BIGINTs end to end (UTC session) — no float, no
  * interval arithmetic divergence.
  */
object FunnelQueries {

  /** Funnel step window: a later stage counts only within 24 h of the
    * previous stage's first occurrence. */
  private val stepUs = 24L * 3600 * 1000 * 1000

  /** Ordered-funnel CTE chain (u/v/c/p: first view, first within-window
    * click after it, first within-window purchase after that) — shared by
    * ev_funnel and ev_funnel_time. */
  private lazy val funnelCtes: String =
    s"""u AS (SELECT DISTINCT user_id FROM events),
       |v AS (
       |  SELECT user_id, min(epoch_us(ts)) AS vt
       |  FROM events WHERE event_type = 'view' GROUP BY 1
       |),
       |c AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS ct
       |  FROM events e JOIN v ON v.user_id = e.user_id
       |  WHERE e.event_type = 'click'
       |    AND epoch_us(e.ts) > v.vt AND epoch_us(e.ts) <= v.vt + $stepUs
       |  GROUP BY 1
       |),
       |p AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS pt
       |  FROM events e JOIN c ON c.user_id = e.user_id
       |  WHERE e.event_type = 'purchase'
       |    AND epoch_us(e.ts) > c.ct AND epoch_us(e.ts) <= c.ct + $stepUs
       |  GROUP BY 1
       |)""".stripMargin
  private val dayUs = 24L * 3600 * 1000 * 1000

  /** Session gap: a quiet period this long starts a new session. */
  private val gapUs = 30L * 60 * 1000 * 1000

  /** Attribution lookback: a purchase attributes to a touch at most this
    * far before it. */
  private val attrUs = 7L * 24 * 3600 * 1000 * 1000

  /** SCD2 tier boundaries (exact cents): ≥ [[scdT3]] → tier 3,
    * ≥ [[scdT2]] → tier 2, else 1 — the corpus day-spend terciles at both
    * test SFs (measured ~6.0k/14.8k), pinned as constants so the
    * segmentation never pays a quantile pass (the ev_rfm thresholds are
    * data-adaptive; a dimension build wants STABLE boundaries or every
    * threshold move would rewrite history). NOTE: must be defined BEFORE
    * [[all]] — the oracle SQL strings interpolate them eagerly at object
    * init, and a forward reference would silently bake in 0. */
  private[graft] val scdT2 = 6000L
  private[graft] val scdT3 = 15000L

  /** Snapshot grid step in days for `ev_tier_snapshot` (weekly). Same
    * before-[[all]] placement rule as the tier boundaries. */
  private val snapStep = 7L

  /** Shared tier-segmentation CTE chain ending in
    * `r(user_id, seg, tier, valid_from_day, n_active_days)` — the SCD2
    * day-rollup → tier → change-flag → segment-id → segment-rollup steps,
    * consumed by both the ev_scd2 build and the ev_tier_snapshot readout
    * so the two oracles can never de-synchronize. (Eagerly interpolated by
    * [[all]], hence defined before it — the scdT2 placement rule.) */
  private lazy val scd2Ctes: String =
    s"""d AS (
       |  SELECT user_id,
       |    CAST(epoch_us(date_trunc('day', ts)) // $dayUs AS BIGINT) AS day_idx,
       |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |),
       |t AS (
       |  SELECT user_id, day_idx,
       |    CASE WHEN cents >= $scdT3 THEN 3 WHEN cents >= $scdT2 THEN 2 ELSE 1 END AS tier
       |  FROM d
       |),
       |c AS (
       |  SELECT user_id, day_idx, tier,
       |    CASE WHEN lag(tier) OVER w IS NULL OR lag(tier) OVER w <> tier
       |         THEN 1 ELSE 0 END AS chg
       |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY day_idx)
       |),
       |g AS (
       |  SELECT user_id, day_idx, tier,
       |    sum(chg) OVER (PARTITION BY user_id ORDER BY day_idx
       |                   ROWS UNBOUNDED PRECEDING) AS seg
       |  FROM c
       |),
       |r AS (
       |  SELECT user_id, seg, min(tier) AS tier, min(day_idx) AS valid_from_day,
       |    CAST(count(*) AS BIGINT) AS n_active_days
       |  FROM g GROUP BY 1, 2
       |)""".stripMargin

  /** Scalar twin of the scd2DF tier expression — the streaming maintainer
    * (`StreamingScd2`) folds with THIS so both faces share one boundary
    * definition. */
  private[graft] def tierOf(cents: Long): Int =
    if (cents >= scdT3) 3 else if (cents >= scdT2) 2 else 1

  val all: Seq[Q] = Seq(

    // Ordered-funnel conversion: earliest completion of view -> click ->
    // purchase per user, each step within [[stepUs]] of the previous
    // step's first event. Emits per-user stage timestamps + depth reached.
    Q("ev_funnel",
      s"""WITH $funnelCtes
         |SELECT u.user_id, v.vt AS view_us, c.ct AS click_us, p.pt AS purchase_us,
         |  CAST(CASE WHEN p.pt IS NOT NULL THEN 3 WHEN c.ct IS NOT NULL THEN 2
         |            WHEN v.vt IS NOT NULL THEN 1 ELSE 0 END AS INT) AS depth
         |FROM u
         |LEFT JOIN v ON v.user_id = u.user_id
         |LEFT JOIN c ON c.user_id = u.user_id
         |LEFT JOIN p ON p.user_id = u.user_id
         |ORDER BY u.user_id""".stripMargin) { (s, d) =>
      funnelDF(Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us")))
        .orderBy("user_id")
    },

    // Time-to-convert distribution — the latency half of the funnel (the
    // counts say HOW MANY convert; this says HOW FAST): per step, the lag
    // distribution over converting users — n, mean (UNROUNDED exact µs
    // quotient), and discrete-rank p50/p90 (the tx_len_quantiles stance:
    // rank selection on exact integers, never an interpolated float;
    // (lag, user_id) total order makes tie ranks deterministic). Scale
    // shape: rides the funnel's user-grain frame; the lag table is ≤3
    // rows per converting user, the rank window partitions by STEP (3
    // partitions of user-cardinality rows — the same bounded-partition
    // envelope as the per-lang quantiles; approx_percentile is the
    // documented 100 TB swap there and here).
    Q("ev_funnel_time",
      s"""WITH $funnelCtes,
         |lag AS (
         |  SELECT 'view_to_click' AS step, c.user_id, c.ct - v.vt AS lag_us
         |  FROM c JOIN v ON v.user_id = c.user_id
         |  UNION ALL
         |  SELECT 'click_to_purchase' AS step, p.user_id, p.pt - c.ct AS lag_us
         |  FROM p JOIN c ON c.user_id = p.user_id
         |  UNION ALL
         |  SELECT 'view_to_purchase' AS step, p.user_id, p.pt - v.vt AS lag_us
         |  FROM p JOIN v ON v.user_id = p.user_id
         |),
         |n AS (SELECT step, CAST(count(*) AS BIGINT) AS n_users,
         |        CAST(sum(lag_us) AS BIGINT) AS sum_lag FROM lag GROUP BY step),
         |rk AS (
         |  SELECT step, lag_us,
         |    row_number() OVER (PARTITION BY step ORDER BY lag_us, user_id) AS rn
         |  FROM lag
         |),
         |q AS (
         |  SELECT rk.step,
         |    max(CASE WHEN rn = CAST(ceil(0.50 * n_users) AS BIGINT) THEN lag_us END) AS p50,
         |    max(CASE WHEN rn = CAST(ceil(0.90 * n_users) AS BIGINT) THEN lag_us END) AS p90
         |  FROM rk JOIN n USING (step) GROUP BY rk.step
         |)
         |SELECT n.step, n.n_users,
         |  CAST(n.sum_lag AS DOUBLE) / n.n_users AS mean_lag_us,
         |  CAST(q.p50 AS BIGINT) AS p50_us, CAST(q.p90 AS BIGINT) AS p90_us
         |FROM n JOIN q USING (step)
         |ORDER BY n.step""".stripMargin) { (s, d) =>
      val f = funnelDF(Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us")))
      val lag = f.filter(col("click_us").isNotNull)
        .select(lit("view_to_click").as("step"), col("user_id"),
          (col("click_us") - col("view_us")).as("lag_us"))
        .unionByName(f.filter(col("purchase_us").isNotNull)
          .select(lit("click_to_purchase").as("step"), col("user_id"),
            (col("purchase_us") - col("click_us")).as("lag_us")))
        .unionByName(f.filter(col("purchase_us").isNotNull)
          .select(lit("view_to_purchase").as("step"), col("user_id"),
            (col("purchase_us") - col("view_us")).as("lag_us")))
      val n = lag.groupBy("step")
        .agg(count(lit(1)).as("n_users"), sum("lag_us").as("sum_lag"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("step").orderBy(col("lag_us"), col("user_id"))
      val q = lag.withColumn("rn", row_number().over(w))
        .join(n.select("step", "n_users"), "step")
        .groupBy("step")
        .agg(
          max(when(col("rn") === expr("cast(ceil(0.50D * n_users) as bigint)"), col("lag_us"))).as("p50"),
          max(when(col("rn") === expr("cast(ceil(0.90D * n_users) as bigint)"), col("lag_us"))).as("p90"))
      n.join(q, "step")
        .select(col("step"), col("n_users"),
          expr("cast(sum_lag as double) / n_users").as("mean_lag_us"),
          col("p50").cast("long").as("p50_us"), col("p90").cast("long").as("p90_us"))
        .orderBy("step")
    },

    // Cohort retention: users cohorted by first-seen UTC day, retention
    // measured as any activity on cohort day +1 / +7. The (user, day)
    // activity set is one distinct pass; cohorts and retention flags are
    // user-sized joins on exact integer day keys.
    Q("ev_retention",
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id,
         |    CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us
         |  FROM events
         |),
         |coh AS (SELECT user_id, min(day_us) AS cday FROM ud GROUP BY 1)
         |SELECT coh.cday AS cohort_day_us,
         |  CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(sum(CASE WHEN d1.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS d1_retained,
         |  CAST(sum(CASE WHEN d7.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS d7_retained
         |FROM coh
         |LEFT JOIN ud d1 ON d1.user_id = coh.user_id AND d1.day_us = coh.cday + ${dayUs}
         |LEFT JOIN ud d7 ON d7.user_id = coh.user_id AND d7.day_us = coh.cday + ${7L * dayUs}
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          unix_micros(date_trunc("day", col("ts"))).as("day_us"))
        .distinct()
      val coh = ud.groupBy("user_id").agg(min("day_us").as("cday"))
      val d1 = ud.select(col("user_id").as("u1"), col("day_us").as("d1_day"))
      val d7 = ud.select(col("user_id").as("u7"), col("day_us").as("d7_day"))
      coh
        .join(d1, col("user_id") === col("u1") && col("d1_day") === col("cday") + dayUs, "left")
        .join(d7, col("user_id") === col("u7") && col("d7_day") === col("cday") + 7L * dayUs, "left")
        .groupBy(col("cday"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("d1_day").isNotNull, 1L).otherwise(0L)).as("d1_retained"),
          sum(when(col("d7_day").isNotNull, 1L).otherwise(0L)).as("d7_retained"))
        .select(col("cday").as("cohort_day_us"), col("n_users"),
          col("d1_retained"), col("d7_retained"))
        .orderBy("cohort_day_us")
    },
    // Last-touch attribution: each purchase attributed to the latest
    // same-user click at-or-before it within [[attrUs]], else the latest
    // view, else unattributed — the marketing-analytics as-of join, done as
    // ONE user-partitioned window pass (running conditional max per touch
    // type) with purchases filtered AFTER: no join ever carries raw events,
    // and the only shuffle is the per-user sort sessionization already
    // pays. Same-µs touches sort before the purchase (k: touches 0,
    // purchases 1), so a touch at the purchase instant attributes (the
    // as-of `<=`); the (us, k, event_id) key is a total order, making the
    // running-max frame deterministic in both engines.
    Q("ev_attribution",
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS k
         |  FROM events
         |),
         |m AS (
         |  SELECT user_id, event_id, event_type, us,
         |    max(CASE WHEN event_type = 'click' THEN us END) OVER w AS lc,
         |    max(CASE WHEN event_type = 'view' THEN us END) OVER w AS lv
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, k, event_id
         |                      ROWS UNBOUNDED PRECEDING)
         |)
         |SELECT user_id, event_id, us AS purchase_us,
         |  CASE WHEN lc IS NOT NULL AND us - lc <= $attrUs THEN 'click'
         |       WHEN lv IS NOT NULL AND us - lv <= $attrUs THEN 'view'
         |       ELSE 'none' END AS attributed,
         |  CASE WHEN lc IS NOT NULL AND us - lc <= $attrUs THEN lc
         |       WHEN lv IS NOT NULL AND us - lv <= $attrUs THEN lv END AS touch_us,
         |  us - CASE WHEN lc IS NOT NULL AND us - lc <= $attrUs THEN lc
         |            WHEN lv IS NOT NULL AND us - lv <= $attrUs THEN lv END AS lag_us
         |FROM m WHERE event_type = 'purchase'
         |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      attributionDF(Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us")))
        .orderBy("user_id", "event_id")
    },

    // Session path mining: corpus-wide top-20 consecutive event-type
    // transitions WITHIN a session (the Markov/path-analysis step after
    // sessionization — "what do users do next"). Rides the ev_sessions
    // segmentation: lead() over the same (user, sid) sort the sessionizer
    // already materialized, then one map-side-combined (step_a, step_b)
    // count — the result is event-type² sized, so the top-k is driver-
    // trivial and the (n DESC, step_a, step_b) total order makes LIMIT
    // deterministic in both engines.
    Q("ev_paths",
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
         |s AS (
         |  SELECT user_id, event_id, us, event_type,
         |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > $gapUs
         |         THEN 1 ELSE 0 END AS ns
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         |),
         |t AS (
         |  SELECT user_id, event_id, us, event_type,
         |    sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                  ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM s
         |),
         |p AS (
         |  SELECT event_type AS step_a,
         |    lead(event_type) OVER (PARTITION BY user_id, sid ORDER BY us, event_id) AS step_b
         |  FROM t
         |)
         |SELECT step_a, step_b, CAST(count(*) AS BIGINT) AS n
         |FROM p WHERE step_b IS NOT NULL
         |GROUP BY 1, 2 ORDER BY n DESC, step_a, step_b LIMIT 20""".stripMargin) { (s, d) =>
      pathsDF(Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
          col("event_type")))
    },
    // Conversion labeling — the FORWARD as-of twin of ev_attribution: each
    // exposure (view or click) labeled with the user's EARLIEST purchase
    // at-or-after it within the lookahead window, plus time-to-convert —
    // the query that builds supervised conversion-model training labels.
    // Same one-window-pass shape, mirrored: a running conditional MIN over
    // the frame from the current row to the partition end. Purchases sort
    // AFTER exposures at equal µs (k: exposures 0, purchases 1 — the same
    // key as attribution, because the frame now OPENS at the current row),
    // so a same-instant purchase is inside the exposure's frame and
    // converts (the `<=` mirror of attribution's same-instant touch).
    Q("ev_conversion",
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS k
         |  FROM events
         |),
         |m AS (
         |  SELECT user_id, event_id, event_type, us,
         |    min(CASE WHEN event_type = 'purchase' THEN us END) OVER w AS np
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, k, event_id
         |                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |)
         |SELECT user_id, event_id, event_type AS exposure, us AS exposure_us,
         |  CAST(CASE WHEN np IS NOT NULL AND np - us <= $attrUs THEN 1 ELSE 0 END AS INT) AS converted,
         |  CASE WHEN np IS NOT NULL AND np - us <= $attrUs THEN np END AS purchase_us,
         |  CASE WHEN np IS NOT NULL AND np - us <= $attrUs THEN np - us END AS lag_us
         |FROM m WHERE event_type IN ('view', 'click')
         |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      conversionDF(Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us")))
        .orderBy("user_id", "event_id")
    },

    // Activity-spike anomaly detection: flag (user, day) buckets whose
    // event count sits more than 3σ ABOVE that user's own daily mean — the
    // bot/abuse/instrumentation-bug monitor every event pipeline runs. The
    // z-test is evaluated in EXACT INTEGER arithmetic (z > 3 ⟺
    // (n·c − s1)² > 9(n·s2 − s1²) over per-user day-count sums), so no
    // sqrt/float boundary can ever diverge across engines. Scale: two
    // map-side-combined aggregates (events → (user, day) counts → user
    // stats); the stats join is user-sized, AQE broadcasts it; raw events
    // appear only in the first aggregate's scan. Overflow envelope:
    // |n·c| < ~3e9 per user keeps the square < 2^63 — day counts and day
    // cardinality are both bounded by user activity, not corpus size.
    // (Strictness note: one outlier among n−1 identical quiet days has
    // z² = n−1 exactly, so `>` — not `>=` — is what keeps a 10-day user
    // with one spike at the z=3 boundary un-flagged in both engines.)
    Q("ev_anomaly",
      s"""WITH d AS (
         |  SELECT user_id, CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2
         |),
         |s AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c*c) AS BIGINT) AS s2
         |  FROM d GROUP BY 1
         |)
         |SELECT d.user_id, d.day_us, d.c AS n_events
         |FROM d JOIN s USING (user_id)
         |WHERE s.n >= 3 AND s.n*d.c > s.s1
         |  AND (s.n*d.c - s.s1)*(s.n*d.c - s.s1) > 9*(s.n*s.s2 - s.s1*s.s1)
         |ORDER BY user_id, day_us""".stripMargin) { (s, d) =>
      anomalyDF(Tables.events(s, d)
        .select(col("user_id"), unix_micros(date_trunc("day", col("ts"))).as("day_us")))
        .orderBy("user_id", "day_us")
    },

    // Log2 value histogram per event type — the distribution-shape monitor
    // (metric observability / payload sanity) a histogram sketch serves at
    // scale: events bucketed by floor(log2(cent_value)) with per-bucket
    // count and exact min/max. The bucket is computed in EXACT INTEGER
    // logic — cents = floor(value·100) (one identical double chain on
    // both engines), bucket = length(bin(cents)) = floor(log2) + 1 via
    // the binary-string length, never a float log whose last ulp could
    // flip a power-of-two boundary. Scale shape: one pushdown scan into a
    // map-side-combined (type, bucket) aggregate — the output is
    // |types|·64 rows max, and the shuffle carries only the rollup.
    Q("ev_histogram",
      s"""WITH b AS (
         |  SELECT event_type,
         |    CAST(length(bin(greatest(CAST(floor(value * 100) AS BIGINT), 1))) AS BIGINT) AS bucket,
         |    CAST(greatest(CAST(floor(value * 100) AS BIGINT), 1) AS BIGINT) AS cents
         |  FROM events
         |)
         |SELECT event_type, bucket,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(min(cents) AS BIGINT) AS min_cents,
         |  CAST(max(cents) AS BIGINT) AS max_cents
         |FROM b GROUP BY 1, 2
         |ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("greatest(cast(floor(value * 100) as bigint), 1)").as("cents"))
        .select(col("event_type"), expr("cast(length(bin(cents)) as bigint)").as("bucket"),
          col("cents"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"), min("cents").as("min_cents"), max("cents").as("max_cents"))
        .orderBy("event_type", "bucket")
    },

    // Active-user engagement: DAU, trailing-7-day WAU, and stickiness
    // (DAU/WAU — the engagement ratio every growth dashboard leads with)
    // per day. The trailing-window distinct does NOT use a range join
    // (which would plan as a broadcast nested loop): each (day, user) row
    // REPLICATES to the ≤7 future days it serves, then a plain hash
    // count-distinct per day — the standard sliding-window-as-offset
    // decomposition, all hash-partitioned aggregates. Day-grain frames
    // are date-cardinality-sized; the only corpus-sized pass is the
    // initial (day, user) distinct. Stickiness is the unrounded
    // exact-integer quotient (the dd_spans stance).
    Q("ev_active_users",
      s"""WITH du AS (
         |  SELECT DISTINCT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us, user_id
         |  FROM events
         |),
         |days AS (SELECT DISTINCT day_us FROM du),
         |dau AS (SELECT day_us, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1),
         |wdu AS (
         |  SELECT du.day_us + k * $dayUs AS day_us, du.user_id
         |  FROM du, unnest(generate_series(0, 6)) AS t(k)
         |),
         |wau AS (
         |  SELECT w.day_us, CAST(count(DISTINCT w.user_id) AS BIGINT) AS wau
         |  FROM wdu w JOIN days d ON d.day_us = w.day_us
         |  GROUP BY 1
         |)
         |SELECT d.day_us, dau.dau, wau.wau, dau.dau * 1.0 / wau.wau AS stickiness
         |FROM days d JOIN dau ON dau.day_us = d.day_us JOIN wau ON wau.day_us = d.day_us
         |ORDER BY d.day_us""".stripMargin) { (s, d) =>
      val du = Tables.events(s, d)
        .select(unix_micros(date_trunc("day", col("ts"))).as("day_us"), col("user_id"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // days + dau + wdu
      val days = du.select("day_us").distinct()
      val dau = du.groupBy("day_us").agg(count(lit(1)).as("dau"))
      val wau = du
        .select(explode(expr("sequence(0, 6)")).as("k"), col("day_us"), col("user_id"))
        .select((col("day_us") + col("k") * lit(dayUs)).as("day_us"), col("user_id"))
        .join(days, Seq("day_us"), "left_semi") // day-grain, result-sized
        .groupBy("day_us").agg(countDistinct("user_id").as("wau"))
      days.join(dau, "day_us").join(wau, "day_us")
        .select(col("day_us"), col("dau"), col("wau"),
          expr("dau * 1.0D / wau").as("stickiness"))
        .orderBy("day_us")
    },

    // Full cohort-retention matrix — ev_retention generalized from the
    // +1/+7 spot checks to every (cohort day, day offset) cell: the
    // triangle heatmap a retention dashboard renders. Offsets are exact
    // integer division of day-truncated epoch-µs (both engines floor on
    // positives); retention is the unrounded exact-integer quotient.
    // Scale shape: one (user, day) distinct + a user-sized first-seen
    // aggregate; the matrix join is user-grain and rolls up map-side to
    // days² cells — the output is date-cardinality², never user-sized.
    Q("ev_cohort_matrix",
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id,
         |    CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us
         |  FROM events
         |),
         |coh AS (SELECT user_id, min(day_us) AS cday FROM ud GROUP BY 1),
         |siz AS (SELECT cday, CAST(count(*) AS BIGINT) AS n_users FROM coh GROUP BY 1),
         |act AS (
         |  SELECT coh.cday, (ud.day_us - coh.cday) // $dayUs AS offset_days,
         |    CAST(count(*) AS BIGINT) AS n_active
         |  FROM coh JOIN ud ON ud.user_id = coh.user_id
         |  GROUP BY 1, 2
         |)
         |SELECT act.cday AS cohort_day_us, act.offset_days, act.n_active, siz.n_users,
         |  act.n_active * 1.0 / siz.n_users AS retention
         |FROM act JOIN siz ON siz.cday = act.cday
         |ORDER BY cohort_day_us, offset_days""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), unix_micros(date_trunc("day", col("ts"))).as("day_us"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // cohort min + matrix join
      val coh = ud.groupBy("user_id").agg(min("day_us").as("cday"))
      val siz = coh.groupBy("cday").agg(count(lit(1)).as("n_users"))
      coh.join(ud, "user_id")
        .select(col("cday"), expr(s"(day_us - cday) div $dayUs").as("offset_days"))
        .groupBy("cday", "offset_days").agg(count(lit(1)).as("n_active"))
        .join(siz, "cday") // day-grain both sides
        .select(col("cday").as("cohort_day_us"), col("offset_days"), col("n_active"),
          col("n_users"), expr("n_active * 1.0D / n_users").as("retention"))
        .orderBy("cohort_day_us", "offset_days")
    },

    // Activity concentration — "what share of events comes from the top
    // X% of users" (the Lorenz-curve readout behind bot screening and
    // power-user analysis). Computed WITHOUT ranking users: a per-user
    // count rolls up to a count-of-counts histogram (distinct-activity-
    // level-sized — tiny), the prefix sums run over THAT bounded frame,
    // and each percentile's coverage is exact integer arithmetic: events
    // from levels strictly above the marginal level plus (k − users
    // above) · marginal level. Tie-agnostic by construction (any top-k
    // choice within the marginal level has the same sum). The top-k cut
    // k = max(U·pct intdiv 100, 1) floors identically in both engines;
    // coverage is the unrounded exact-integer quotient.
    Q("ev_concentration",
      s"""WITH uc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS u, CAST(sum(c) AS BIGINT) AS e FROM uc),
         |cc AS (SELECT c, CAST(count(*) AS BIGINT) AS nu FROM uc GROUP BY 1),
         |cum AS (
         |  SELECT c, nu,
         |    CAST(coalesce(sum(nu) OVER (ORDER BY c DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ua,
         |    CAST(coalesce(sum(nu * c) OVER (ORDER BY c DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ea
         |  FROM cc
         |),
         |p AS (SELECT unnest([1, 5, 10, 50, 100]) AS pct),
         |k AS (SELECT pct, greatest((tot.u * pct) // 100, 1) AS k, tot.u, tot.e FROM p CROSS JOIN tot),
         |sel AS (
         |  SELECT k.pct, k.k, k.u, k.e, cum.ua, cum.ea, cum.c
         |  FROM k JOIN cum ON cum.ua < k.k AND cum.ua + cum.nu >= k.k
         |)
         |SELECT CAST(pct AS BIGINT) AS pct, k AS k_users, u AS total_users,
         |  ea + (k - ua) * c AS events_covered, e AS total_events,
         |  (ea + (k - ua) * c) * 1.0 / e AS coverage
         |FROM sel ORDER BY pct""".stripMargin) { (s, d) =>
      val uc = Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("c"))
      val tot = uc.agg(count(lit(1)).as("u"), sum("c").as("e"))
      val cc = uc.groupBy("c").agg(count(lit(1)).as("nu"))
      // prefix sums over the activity-level histogram — a bounded frame
      // (distinct per-user counts), the documented constant-partition case
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val cum = cc
        .withColumn("ua", coalesce(sum("nu").over(w), lit(0L)))
        .withColumn("ea", coalesce(sum(col("nu") * col("c")).over(w), lit(0L)))
      val p = s.range(0, 5).select(expr("element_at(array(1, 5, 10, 50, 100), cast(id + 1 as int))").as("pct"))
      val k = p.crossJoin(broadcast(tot)) // 1-row totals
        .select(col("pct"), greatest(expr("(u * pct) div 100"), lit(1L)).as("k"),
          col("u"), col("e"))
      k.join(cum, col("ua") < col("k") && col("ua") + col("nu") >= col("k"))
        .select(col("pct").cast("long").as("pct"), col("k").as("k_users"),
          col("u").as("total_users"),
          (col("ea") + (col("k") - col("ua")) * col("c")).as("events_covered"),
          col("e").as("total_events"),
          expr("(ea + (k - ua) * c) * 1.0D / e").as("coverage"))
        .orderBy("pct")
    },

    // A/B significance readout — the two-proportion z-test every
    // experimentation platform runs, per event type: users split by id
    // parity (the assignment stand-in), "converted" = emitted the type at
    // least 3 times (heavy usage — mere presence is near-universal on
    // this fixture and degenerates the test). The 95% significance GATE
    // is exact integer arithmetic in DECIMAL(38,0)/HUGEINT —
    //   10000·diff²·N > 38415·n_a·n_b·C·(N−C), diff = c_a·n_b − c_b·n_a
    // — no float boundary; the reported z² is one identical double chain
    // from the same exact longs (NULL when C is 0 or N — the test is
    // undefined). Scale shape: one (user, type) count rollup + a 2-row
    // group-size aggregate; everything after is type-cardinality-sized.
    Q("ev_ab_test",
      s"""WITH ug AS (SELECT DISTINCT user_id, user_id % 2 AS grp FROM events),
         |gs AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM ug GROUP BY 1),
         |ut AS (
         |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS ne
         |  FROM events GROUP BY 1, 2
         |),
         |cg AS (
         |  SELECT ut.event_type, ut.user_id % 2 AS grp
         |  FROM ut WHERE ut.ne >= 3
         |),
         |w AS (
         |  SELECT event_type,
         |    CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
         |  FROM cg GROUP BY 1
         |),
         |g AS (
         |  SELECT max(CASE WHEN grp = 0 THEN n END) AS n_a,
         |    max(CASE WHEN grp = 1 THEN n END) AS n_b
         |  FROM gs
         |)
         |SELECT event_type, g.n_a, w.c_a, g.n_b, w.c_b,
         |  w.c_a * 1.0 / g.n_a AS rate_a, w.c_b * 1.0 / g.n_b AS rate_b,
         |  CASE WHEN w.c_a + w.c_b = 0 OR w.c_a + w.c_b = g.n_a + g.n_b THEN NULL
         |    ELSE CAST(w.c_a * g.n_b - w.c_b * g.n_a AS DOUBLE)
         |       * CAST(w.c_a * g.n_b - w.c_b * g.n_a AS DOUBLE) * (g.n_a + g.n_b)
         |       / (CAST(g.n_a AS DOUBLE) * g.n_b * (w.c_a + w.c_b)
         |          * (g.n_a + g.n_b - w.c_a - w.c_b)) END AS z2,
         |  CAST(CASE WHEN w.c_a + w.c_b > 0 AND w.c_a + w.c_b < g.n_a + g.n_b
         |    AND CAST(10000 AS HUGEINT) * (w.c_a * g.n_b - w.c_b * g.n_a)
         |        * (w.c_a * g.n_b - w.c_b * g.n_a) * (g.n_a + g.n_b)
         |      > CAST(38415 AS HUGEINT) * g.n_a * g.n_b * (w.c_a + w.c_b)
         |        * (g.n_a + g.n_b - w.c_a - w.c_b)
         |    THEN 1 ELSE 0 END AS INT) AS significant
         |FROM w CROSS JOIN g ORDER BY event_type""".stripMargin) { (s, d) =>
      val ug = Tables.events(s, d)
        .select(col("user_id"), (col("user_id") % 2).as("grp")).distinct()
      val gs = ug.groupBy("grp").agg(count(lit(1)).as("n"))
      val g = gs.agg(
        max(when(col("grp") === 0, col("n"))).as("n_a"),
        max(when(col("grp") === 1, col("n"))).as("n_b"))
      val w = Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("ne"))
        .filter(col("ne") >= 3)
        .select(col("event_type"), (col("user_id") % 2).as("grp"))
        .groupBy("event_type")
        .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).as("c_a"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("c_b"))
      w.crossJoin(broadcast(g)) // 1-row group sizes
        .select(col("event_type"), col("n_a"), col("c_a"), col("n_b"), col("c_b"),
          expr("c_a * 1.0D / n_a").as("rate_a"),
          expr("c_b * 1.0D / n_b").as("rate_b"),
          expr("""CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL
                 |  ELSE CAST(c_a * n_b - c_b * n_a AS DOUBLE)
                 |     * CAST(c_a * n_b - c_b * n_a AS DOUBLE) * (n_a + n_b)
                 |     / (CAST(n_a AS DOUBLE) * n_b * (c_a + c_b)
                 |        * (n_a + n_b - c_a - c_b)) END""".stripMargin).as("z2"),
          expr("""CAST(CASE WHEN c_a + c_b > 0 AND c_a + c_b < n_a + n_b
                 |  AND CAST(10000 AS DECIMAL(38,0)) * (c_a * n_b - c_b * n_a)
                 |      * (c_a * n_b - c_b * n_a) * (n_a + n_b)
                 |    > CAST(38415 AS DECIMAL(38,0)) * n_a * n_b * (c_a + c_b)
                 |      * (n_a + n_b - c_a - c_b)
                 |  THEN 1 ELSE 0 END AS INT)""".stripMargin).as("significant"))
        .orderBy("event_type")
    },

    // Daily-volume trend per event type: least-squares slope of daily
    // counts over epoch-day index — the capacity-planning / drift-alarm
    // fit every metrics pipeline runs. All four regression moments
    // (n, Σx, Σy, Σxy, Σxx) accumulate as EXACT BIGINTs over the day-grain
    // rollup (epoch-day ~2e4, counts bounded — far inside long range), so
    // partial-agg order can't flip a bit; slope and mean are then single
    // deterministic double divisions on exact integers (the ev_ab_test
    // stance). Scale shape: one pushdown scan → map-side-combined
    // (type, day) rollup → |types|·|days| rows → a types-sized second
    // aggregate. Nothing corpus-sized ever shuffles twice.
    Q("ev_trend",
      s"""WITH d AS (
         |  SELECT event_type,
         |    CAST(epoch_us(date_trunc('day', ts)) // $dayUs AS BIGINT) AS day_idx,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2
         |),
         |m AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(sum(day_idx) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
         |    CAST(sum(day_idx * c) AS BIGINT) AS sxy,
         |    CAST(sum(day_idx * day_idx) AS BIGINT) AS sxx
         |  FROM d GROUP BY 1
         |)
         |SELECT event_type, n_days, sy AS total_cnt,
         |  round(CAST(n_days * sxy - sx * sy AS DOUBLE)
         |    / (n_days * sxx - sx * sx), 4) AS slope_per_day,
         |  round(CAST(sy AS DOUBLE) / n_days, 4) AS avg_per_day
         |FROM m WHERE n_days >= 2 ORDER BY event_type""".stripMargin) { (s, d) =>
      trendDF(Tables.events(s, d)
        .select(col("event_type"),
          expr(s"unix_micros(date_trunc('DAY', ts)) div $dayUs").as("day_idx")))
        .orderBy("event_type")
    },

    // Seasonal baseline forecast — ev_trend's capacity-planning twin: the
    // next 7 days per event type forecast from day-of-week means over the
    // corpus's calendar span (ZERO days count in the denominator — a dow
    // with no events forecasts 0, not "unknown"). dow = epoch-day mod 7,
    // a rotation label, deliberately calendar-locale-free. The per-dow
    // calendar-day count is pure positive-operand integer floor division
    // (identical in both engines); the forecast is the UNROUNDED exact
    // int/int quotient. Scale shape: one map-side-combined (type, dow)
    // count over the day-grain rollup, a 1-row span broadcast, a
    // type-sized 7-row horizon expand — no corpus-sized shuffle beyond
    // the day rollup ev_trend already pays.
    Q("ev_forecast",
      s"""WITH d AS (
         |  SELECT event_type,
         |    CAST(epoch_us(date_trunc('day', ts)) // $dayUs AS BIGINT) AS day_idx
         |  FROM events
         |),
         |span AS (SELECT CAST(min(day_idx) AS BIGINT) AS a, CAST(max(day_idx) AS BIGINT) AS b FROM d),
         |pd AS (SELECT event_type, day_idx % 7 AS dow, CAST(count(*) AS BIGINT) AS c
         |       FROM d GROUP BY 1, 2),
         |hz AS (
         |  SELECT t.event_type, span.b + u.h AS day_idx, (span.b + u.h) % 7 AS dow,
         |    span.a AS a, span.b AS b
         |  FROM (SELECT DISTINCT event_type FROM d) t, span,
         |    unnest(generate_series(1, 7)) AS u(h)
         |)
         |SELECT hz.event_type, hz.day_idx, hz.dow,
         |  CAST(coalesce(pd.c, 0) AS DOUBLE) /
         |    greatest(((hz.b - hz.dow + 7) // 7) - ((hz.a - 1 - hz.dow + 7) // 7), 1) AS forecast
         |FROM hz LEFT JOIN pd ON pd.event_type = hz.event_type AND pd.dow = hz.dow
         |ORDER BY hz.event_type, hz.day_idx""".stripMargin) { (s, d) =>
      forecastDF(Tables.events(s, d)
        .select(col("event_type"),
          expr(s"unix_micros(date_trunc('DAY', ts)) div $dayUs").as("day_idx")))
        .orderBy("event_type", "day_idx")
    },

    // Offline CUSUM changepoint — "WHEN did this metric's level shift?"
    // (deploy regressions, pipeline-source cutovers, bot-wave onsets):
    // per event type, the split day of the daily-count series maximizing
    // |cumsum_d − d·μ| — the classic at-most-one-changepoint CUSUM
    // statistic. Evaluated EXACTLY: with m days and total t, the argmax of
    // |cumsum_d − d·(t/m)| equals the argmax of |m·cumsum_d − d·t| over
    // BIGINTs, so no float boundary can move the flagged day; ties break
    // to the earliest day ((stat DESC, day) total order), and the split
    // must leave both segments non-empty (d < m — a 1-day series emits
    // nothing). Only the reported pre/post segment means divide, each one
    // deterministic double quotient of exact integers. Scale shape: one
    // pushdown scan → map-side-combined (type, day) rollup; every window
    // after partitions by event_type over day-grain rows (|types|·|days|),
    // so the detector costs the day rollup ev_trend already pays.
    // Overflow: |m·cum| ≤ days·events-per-type — long-safe past 1e14
    // events/type at 10k days.
    Q("ev_changepoint",
      s"""WITH d AS (
         |  SELECT event_type,
         |    CAST(epoch_us(date_trunc('day', ts)) // $dayUs AS BIGINT) AS day_idx,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2
         |),
         |w AS (
         |  SELECT event_type, day_idx,
         |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day_idx) AS BIGINT) AS cum,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day_idx) AS BIGINT) AS idx,
         |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m,
         |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS tot
         |  FROM d
         |)
         |SELECT event_type, day_idx AS cp_day_idx, m AS n_days,
         |  abs(m * cum - idx * tot) AS stat,
         |  CAST(cum AS DOUBLE) / idx AS pre_avg,
         |  CAST(tot - cum AS DOUBLE) / (m - idx) AS post_avg
         |FROM w WHERE idx < m
         |QUALIFY row_number() OVER (PARTITION BY event_type
         |  ORDER BY abs(m * cum - idx * tot) DESC, day_idx) = 1
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      changepointDF(Tables.events(s, d)
        .select(col("event_type"),
          expr(s"unix_micros(date_trunc('DAY', ts)) div $dayUs").as("day_idx")))
        .orderBy("event_type")
    },

    // Multi-grain ROLLUP — the engine's GROUPING SETS surface (one pass
    // produces day-of-week detail, per-type subtotals, and the grand
    // total — the shape every BI cube feeds from, and on Spark ONE
    // shuffle instead of three separate aggregations union'd): counts and
    // exact cent volume (the ev_histogram integer stance) over
    // ROLLUP(event_type, dow), with GROUPING_ID disambiguating subtotal
    // rows from genuine NULL groups (both engines put the grouping-column
    // bitmask MSB-first). Scale shape: map-side-combined rollup of the
    // detail grain; subtotal grains aggregate FROM it, never rescanning.
    Q("ev_rollup",
      s"""SELECT event_type,
         |  CAST(epoch_us(date_trunc('day', ts)) // $dayUs % 7 AS BIGINT) AS dow,
         |  CAST(GROUPING(event_type, CAST(epoch_us(date_trunc('day', ts)) // $dayUs % 7 AS BIGINT)) AS BIGINT) AS gid,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
         |FROM events
         |GROUP BY ROLLUP(event_type, CAST(epoch_us(date_trunc('day', ts)) // $dayUs % 7 AS BIGINT))
         |ORDER BY gid, event_type, dow""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr(s"unix_micros(date_trunc('DAY', ts)) div $dayUs % 7").as("dow"),
          expr("cast(floor(value * 100) as bigint)").as("c"))
        .rollup("event_type", "dow")
        .agg(expr("cast(grouping_id() as bigint)").as("gid"),
          count(lit(1)).as("n"), sum("c").as("cents"))
        .select("event_type", "dow", "gid", "n", "cents")
        .orderBy("gid", "event_type", "dow")
    },

    // PIVOT — the wide-table reshape surface (dow columns per event type,
    // the layout dashboards and spreadsheet exports want): Spark's
    // `.pivot()` API with a PINNED column domain (0..6 — an unpinned
    // pivot scans once just to discover values; never at 100 TB), counts
    // coalesced to 0 so an empty cell is an integer, not a NULL. The
    // oracle is the equivalent conditional aggregation — which is exactly
    // the plan Spark lowers pivot to, ONE map-side-combined pass. */
    Q("ev_pivot_dow",
      s"""SELECT event_type,
         |  ${(0 to 6).map(w => s"CAST(count(CASE WHEN CAST(epoch_us(date_trunc('day', ts)) // $dayUs % 7 AS BIGINT) = $w THEN 1 END) AS BIGINT) AS d$w").mkString(",\n         |  ")}
         |FROM events GROUP BY event_type
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr(s"unix_micros(date_trunc('DAY', ts)) div $dayUs % 7").as("dow"))
        .groupBy("event_type")
        .pivot("dow", 0L to 6L) // pinned domain — no discovery scan
        .count()
        .select(col("event_type") +: (0 to 6).map(w =>
          coalesce(col(s"$w"), lit(0L)).as(s"d$w")): _*)
        .orderBy("event_type")
    },

    // Step-window sensitivity curve — the dd_threshold_curve pattern
    // applied to the funnel: the SAME ordered view→click→purchase chain
    // evaluated at 1 h / 6 h / 24 h step windows, so the analyst choosing
    // an attribution window reads conversion-vs-window as one table
    // instead of re-running the funnel per candidate. All counts are
    // exact distinct-user integers; each window's chain is the audited
    // funnel shape (filtered pushdown scans aggregated to user-sized
    // minima before any join), and the three chains share the per-step
    // user tables, so the curve costs one extra user-sized join pass per
    // window — never another full event scan.
    Q("ev_funnel_windows", {
      def chain(w: Long, tag: String) =
        s"""c$tag AS (
           |  SELECT e.user_id, min(epoch_us(e.ts)) AS ct
           |  FROM events e JOIN v ON v.user_id = e.user_id
           |  WHERE e.event_type = 'click'
           |    AND epoch_us(e.ts) > v.vt AND epoch_us(e.ts) <= v.vt + $w
           |  GROUP BY 1
           |),
           |p$tag AS (
           |  SELECT e.user_id, min(epoch_us(e.ts)) AS pt
           |  FROM events e JOIN c$tag c ON c.user_id = e.user_id
           |  WHERE e.event_type = 'purchase'
           |    AND epoch_us(e.ts) > c.ct AND epoch_us(e.ts) <= c.ct + $w
           |  GROUP BY 1
           |),
           |r$tag AS (
           |  SELECT CAST($w AS BIGINT) AS window_us,
           |    (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           |    (SELECT CAST(count(*) AS BIGINT) FROM c$tag) AS n_click,
           |    (SELECT CAST(count(*) AS BIGINT) FROM p$tag) AS n_purchase
           |)""".stripMargin
      val hUs = 3600L * 1000 * 1000
      s"""WITH v AS (
         |  SELECT user_id, min(epoch_us(ts)) AS vt
         |  FROM events WHERE event_type = 'view' GROUP BY 1
         |),
         |${chain(1 * hUs, "1")},
         |${chain(6 * hUs, "6")},
         |${chain(24 * hUs, "24")}
         |SELECT * FROM r1 UNION ALL SELECT * FROM r6 UNION ALL SELECT * FROM r24
         |ORDER BY window_us""".stripMargin
    }) { (s, d) =>
      val hUs = 3600L * 1000 * 1000
      funnelWindowCurveDF(
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us")),
        Seq(1 * hUs, 6 * hUs, 24 * hUs))
        .orderBy("window_us")
    },

    // Audience-overlap matrix — "how much do these behaviors share users?"
    // (feature adoption overlap, funnel step correlation, segment design):
    // for every ordered event-type pair, the EXACT count of users doing
    // both, each side's user count, and the Jaccard overlap as an
    // UNROUNDED quotient of exact integers. Scale shape: one pushdown
    // scan collapses map-side to the DISTINCT (user, type) table (|users|
    // × ≤|types| rows); the pair table comes from a self-join hash-
    // partitioned on user_id whose per-user fan-out is bounded by
    // |types|² (a constant — types are a vocabulary, not data-scaled), so
    // the join never amplifies beyond |users|·|types|²; the output is the
    // |types|² matrix. No window, no corpus-sized shuffle beyond the
    // distinct.
    Q("ev_type_overlap",
      s"""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nu FROM ut GROUP BY 1),
         |pr AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    CAST(count(*) AS BIGINT) AS n_both
         |  FROM ut a JOIN ut b ON b.user_id = a.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2
         |)
         |SELECT pr.type_a, pr.type_b, na.nu AS n_a, nb.nu AS n_b, pr.n_both,
         |  CAST(pr.n_both AS DOUBLE) / (na.nu + nb.nu - pr.n_both) AS jaccard
         |FROM pr
         |JOIN n na ON na.event_type = pr.type_a
         |JOIN n nb ON nb.event_type = pr.type_b
         |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      typeOverlapDF(Tables.events(s, d).select("user_id", "event_type"))
        .orderBy("type_a", "type_b")
    },

    // Semi-structured payload rollup — the schema-on-read surface every
    // event pipeline needs (`props` is a JSON string column): the payload
    // parses ONCE per row with an EXPLICIT schema (`from_json(props,
    // 'k BIGINT')` — Spark's codegen Jackson path; the anti-pattern at
    // 100 TB is N separate get_json_object calls re-parsing the same
    // string N times), malformed/missing payloads surface as an honest
    // `n_bad` count instead of poisoning aggregates (permissive-mode null
    // struct ≡ DuckDB's json_valid + TRY_CAST gate — spec-pinned on
    // planted garbage), and everything downstream is an exact-integer
    // map-side-combined rollup per type. Scale shape: one pushdown scan,
    // parse in the projection, |types|-row output; the distinct-k count
    // is a (type, k) pre-aggregate, k bounded by the payload domain.
    Q("ev_props_rollup",
      s"""WITH p AS (
         |  SELECT event_type,
         |    CASE WHEN props IS NOT NULL AND json_valid(props)
         |         THEN TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) END AS k
         |  FROM events
         |)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
         |  CAST(sum(k) AS BIGINT) AS sum_k,
         |  CAST(min(k) AS BIGINT) AS min_k,
         |  CAST(max(k) AS BIGINT) AS max_k,
         |  CAST(count(DISTINCT k) AS BIGINT) AS n_k
         |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      propsRollupDF(Tables.events(s, d).select("event_type", "props"))
        .orderBy("event_type")
    },
    // RFM user segmentation (recency / frequency / monetary — the
    // marketing-analytics workhorse behind churn targeting and LTV
    // tiers): per user, days since last activity, event count, and exact
    // cent volume (the ev_histogram integer stance), each scored 1..3
    // against corpus-wide tercile THRESHOLD VALUES — not per-user ranks —
    // so equal metrics always land in the same bucket and the score join
    // is a 3-row broadcast. Thresholds are DISCRETE rank selections over
    // the unpivoted (dim, badness) frame (the tx_len_quantiles stance:
    // exact rank selection per dim partition, with approx_percentile's
    // mergeable sketch as the documented 100 TB swap); all comparisons
    // are pure integers.
    Q("ev_rfm",
      s"""WITH u AS (
         |  SELECT user_id,
         |    CAST(max(epoch_us(date_trunc('day', ts)) // $dayUs) AS BIGINT) AS last_day,
         |    CAST(count(*) AS BIGINT) AS freq,
         |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM events GROUP BY 1
         |),
         |mx AS (SELECT max(last_day) AS maxd, CAST(count(*) AS BIGINT) AS n FROM u),
         |b AS (
         |  SELECT u.user_id, (mx.maxd - u.last_day) AS recency_days, u.freq, u.cents, mx.n
         |  FROM u, mx
         |),
         |p AS (
         |  SELECT user_id, 'r' AS dim, recency_days AS bad, n FROM b
         |  UNION ALL SELECT user_id, 'f', -freq, n FROM b
         |  UNION ALL SELECT user_id, 'm', -cents, n FROM b
         |),
         |rk AS (
         |  SELECT dim, bad, n,
         |    row_number() OVER (PARTITION BY dim ORDER BY bad, user_id) AS rn
         |  FROM p
         |),
         |th AS (
         |  SELECT dim,
         |    max(CASE WHEN rn = (n + 2) // 3 THEN bad END) AS t1,
         |    max(CASE WHEN rn = (2 * n + 2) // 3 THEN bad END) AS t2
         |  FROM rk GROUP BY dim
         |),
         |sc AS (
         |  SELECT p.user_id AS uid, p.dim,
         |    CASE WHEN p.bad <= th.t1 THEN 3 WHEN p.bad <= th.t2 THEN 2 ELSE 1 END AS s
         |  FROM p JOIN th ON th.dim = p.dim
         |)
         |SELECT b.user_id, b.recency_days, b.freq AS frequency, b.cents AS monetary_cents,
         |  CAST(r.s AS INT) AS r_score, CAST(f.s AS INT) AS f_score, CAST(m.s AS INT) AS m_score,
         |  CAST(r.s * 100 + f.s * 10 + m.s AS INT) AS rfm_code
         |FROM b
         |JOIN sc r ON r.uid = b.user_id AND r.dim = 'r'
         |JOIN sc f ON f.uid = b.user_id AND f.dim = 'f'
         |JOIN sc m ON m.uid = b.user_id AND m.dim = 'm'
         |ORDER BY b.user_id""".stripMargin) { (s, d) =>
      rfmDF(Tables.events(s, d)
        .select(col("user_id"),
          expr(s"unix_micros(date_trunc('DAY', ts)) div $dayUs").as("day_idx"),
          expr("cast(floor(value * 100) as bigint)").as("cents")))
        .orderBy("user_id")
    },
    // Cohort LTV curve — the REVENUE twin of ev_cohort_matrix: cumulative
    // cents per signup cohort by day offset, averaged over the cohort's
    // FIXED size (users who later go quiet keep weighing the denominator —
    // that is what makes it an LTV curve and not a per-active-user
    // average). The running total is a prefix sum over the (cohort, offset)
    // rollup — a days²-sized frame partitioned by cohort day, so the
    // window pass never sees user- or event-grain rows; offsets with zero
    // activity carry no row (the curve is read at its jump points), which
    // keeps the frame sparse and the prefix sum exact. Cents are the
    // ev_histogram integer stance; avg_ltv_cents is the unrounded
    // exact-integer quotient.
    Q("ev_ltv",
      s"""WITH ud AS (
         |  SELECT user_id,
         |    CAST(epoch_us(date_trunc('day', ts)) // $dayUs AS BIGINT) AS day_idx,
         |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM events GROUP BY 1, 2
         |),
         |coh AS (SELECT user_id, min(day_idx) AS cday FROM ud GROUP BY 1),
         |siz AS (SELECT cday, CAST(count(*) AS BIGINT) AS n_users FROM coh GROUP BY 1),
         |o AS (
         |  SELECT coh.cday, ud.day_idx - coh.cday AS offset_days,
         |    CAST(sum(ud.cents) AS BIGINT) AS cents
         |  FROM coh JOIN ud ON ud.user_id = coh.user_id
         |  GROUP BY 1, 2
         |),
         |c AS (
         |  SELECT cday, offset_days,
         |    sum(cents) OVER (PARTITION BY cday ORDER BY offset_days
         |                     ROWS UNBOUNDED PRECEDING) AS cum_cents
         |  FROM o
         |)
         |SELECT c.cday AS cohort_day, c.offset_days, siz.n_users,
         |  CAST(c.cum_cents AS BIGINT) AS cum_cents,
         |  c.cum_cents * 1.0 / siz.n_users AS avg_ltv_cents
         |FROM c JOIN siz ON siz.cday = c.cday
         |ORDER BY cohort_day, offset_days""".stripMargin) { (s, d) =>
      ltvDF(Tables.events(s, d)
        .select(col("user_id"),
          expr(s"unix_micros(date_trunc('DAY', ts)) div $dayUs").as("day_idx"),
          expr("cast(floor(value * 100) as bigint)").as("cents")))
        .orderBy("cohort_day", "offset_days")
    },
    // SCD type-2 dimension build — the warehouse operator the K3 upsert
    // sink deliberately does NOT provide: where the Derby sink OVERWRITES
    // a key's row (SCD-1), this builds the full validity-interval HISTORY
    // of each user's daily-spend tier (reference ch. 8's idempotent-upsert
    // sink is the streaming SCD-1 face; dimension history is its batch
    // complement). Tier boundaries are fixed exact-cent thresholds
    // ([[scdT2]]/[[scdT3]] — corpus terciles at both test SFs), so the
    // segmentation is pure integer comparison; change points come from
    // lag(), segment ids from a running sum of change flags (the
    // ev_sessions gap-segmentation pattern on the tier axis), and each
    // segment closes at the NEXT segment's open day via lead() — half-open
    // [from, to) intervals, NULL to = current row, the exact contract a
    // point-in-time `BETWEEN` lookup join needs. Scale shape: the only
    // corpus-sized pass is the map-side-combined (user, day) cent rollup;
    // every window runs over user-partitioned DAY-GRAIN rows (per-user day
    // counts, never corpus-sized), and the output is segment-sized.
    Q("ev_scd2",
      s"""WITH $scd2Ctes
         |SELECT user_id, CAST(tier AS INT) AS tier, valid_from_day,
         |  lead(valid_from_day) OVER u AS valid_to_day, n_active_days,
         |  CAST(CASE WHEN lead(valid_from_day) OVER u IS NULL THEN 1 ELSE 0 END AS INT)
         |    AS is_current
         |FROM r WINDOW u AS (PARTITION BY user_id ORDER BY valid_from_day)
         |ORDER BY user_id, valid_from_day""".stripMargin) { (s, d) =>
      scd2DF(Tables.events(s, d)
        .select(col("user_id"),
          expr(s"unix_micros(date_trunc('DAY', ts)) div $dayUs").as("day_idx"),
          expr("cast(floor(value * 100) as bigint)").as("cents")))
        .orderBy("user_id", "valid_from_day")
    },
    // Point-in-time dimension readout — the query the SCD2 dimension
    // EXISTS for: user-base tier composition at every [[snapStep]]-day
    // snapshot day, each user resolved to the validity interval COVERING
    // the snapshot (mid-interval days and the NULL-open current segment
    // included — nothing here re-reads spend). No range join: a segment
    // knows arithmetically which snapshot indexes it covers
    // (ceil/floor integer division against the 1-row corpus day bounds),
    // so coverage is a row-local explode bounded by the calendar, then a
    // map-side-combined (snapshot, tier) count — segments × grid never
    // materializes. Intervals partition each user's timeline, so the
    // per-snapshot counts sum to exactly the users active by then.
    Q("ev_tier_snapshot",
      s"""WITH $scd2Ctes,
         |sg AS (
         |  SELECT user_id, tier, valid_from_day,
         |    lead(valid_from_day) OVER (PARTITION BY user_id ORDER BY valid_from_day)
         |      AS valid_to_day
         |  FROM r
         |),
         |mn AS (SELECT min(day_idx) AS mnd, max(day_idx) AS mxd FROM d),
         |ks AS (
         |  SELECT mn.mnd + $snapStep * k AS snap_day
         |  FROM mn, unnest(generate_series(0, (mn.mxd - mn.mnd) // $snapStep)) AS t(k)
         |),
         |cov AS (
         |  SELECT ks.snap_day, sg.tier
         |  FROM sg JOIN ks ON sg.valid_from_day <= ks.snap_day
         |    AND (sg.valid_to_day IS NULL OR ks.snap_day < sg.valid_to_day)
         |)
         |SELECT snap_day, CAST(tier AS INT) AS tier,
         |  CAST(count(*) AS BIGINT) AS n_users
         |FROM cov GROUP BY 1, 2 ORDER BY snap_day, tier""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          expr(s"unix_micros(date_trunc('DAY', ts)) div $dayUs").as("day_idx"),
          expr("cast(floor(value * 100) as bigint)").as("cents"))
      tierSnapshotDF(ev).orderBy("snap_day", "tier")
    },
  ) :+ sessionQ

  /** Body of `ev_tier_snapshot`: [[scd2DF]] segments resolved onto the
    * [[snapStep]]-day snapshot grid by row-local index arithmetic —
    * k ranges over ceil((from−mn)/step) .. floor((to−1−mn)/step), the
    * NULL-open current segment capped at the grid's last index. */
  private[graft] def tierSnapshotDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // one corpus-sized pass: the (user, day) rollup feeds BOTH the
    // segmentation and the grid bounds (a bare ev.agg here would scan the
    // events input a second time)
    val days = ev.groupBy("user_id", "day_idx").agg(sum("cents").as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seg = scd2DF(days)
    val mn = days.agg(min("day_idx").as("mnd"), max("day_idx").as("mxd"))
    seg.crossJoin(broadcast(mn)) // 1-row corpus day bounds
      .select(col("tier"), col("mnd"),
        expr(s"(valid_from_day - mnd + ${snapStep - 1}) div $snapStep").as("k_lo"),
        coalesce(expr(s"(valid_to_day - 1 - mnd) div $snapStep"),
          expr(s"(mxd - mnd) div $snapStep")).as("k_hi"))
      .filter(col("k_hi") >= col("k_lo")) // short segment between grid points
      .select(col("tier"), col("mnd"), explode(expr("sequence(k_lo, k_hi)")).as("k"))
      .select((col("mnd") + col("k") * lit(snapStep)).as("snap_day"),
        col("tier").cast("int").as("tier"))
      .groupBy("snap_day", "tier").agg(count(lit(1)).as("n_users"))
  }

  /** Body of `ev_ltv` over any (user_id, day_idx, cents) frame — factored
    * so the planted-cohort spec drives the real curve. One row per
    * (cohort_day, offset_days) with activity; cum_cents is the running
    * cohort total at that offset, avg_ltv_cents divides by the FIXED
    * cohort size. */
  private[graft] def ltvDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ud = ev.groupBy("user_id", "day_idx").agg(sum("cents").as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // coh + offset join
    val coh = ud.groupBy("user_id").agg(min("day_idx").as("cday"))
    val siz = coh.groupBy("cday").agg(count(lit(1)).as("n_users"))
    val cum = Window.partitionBy("cday").orderBy("offset_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    coh.join(ud, "user_id")
      .select(col("cday"), (col("day_idx") - col("cday")).as("offset_days"), col("cents"))
      .groupBy("cday", "offset_days").agg(sum("cents").as("cents"))
      .withColumn("cum_cents", sum("cents").over(cum))
      .join(siz, "cday") // day-grain both sides
      .select(col("cday").as("cohort_day"), col("offset_days"), col("n_users"),
        col("cum_cents"), expr("cum_cents * 1.0D / n_users").as("avg_ltv_cents"))
  }

  /** Body of `ev_scd2` over any (user_id, day_idx, cents) frame — factored
    * so the planted-history spec drives the real segmentation. Emits one
    * row per (user, tier) validity segment: half-open [valid_from_day,
    * valid_to_day) with NULL close on the current segment. */
  private[graft] def scd2DF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = Window.partitionBy("user_id").orderBy("day_idx")
    val run = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = ev.groupBy("user_id", "day_idx").agg(sum("cents").as("cents"))
      .select(col("user_id"), col("day_idx"),
        when(col("cents") >= scdT3, 3).when(col("cents") >= scdT2, 2).otherwise(1)
          .as("tier"))
      .withColumn("chg",
        when(lag("tier", 1).over(byDay).isNull ||
          lag("tier", 1).over(byDay) =!= col("tier"), 1).otherwise(0))
      .withColumn("seg", sum("chg").over(run))
      .groupBy("user_id", "seg")
      .agg(min("tier").as("tier"), min("day_idx").as("valid_from_day"),
        count(lit(1)).as("n_active_days"))
    val byFrom = Window.partitionBy("user_id").orderBy("valid_from_day")
    seg
      .select(col("user_id"), col("tier").cast("int").as("tier"),
        col("valid_from_day"),
        lead("valid_from_day", 1).over(byFrom).as("valid_to_day"),
        col("n_active_days"),
        when(lead("valid_from_day", 1).over(byFrom).isNull, 1).otherwise(0)
          .cast("int").as("is_current"))
  }

  /** Body of `ev_rfm` over any (user_id, day_idx, cents) frame — factored
    * so the planted-tercile spec drives the real threshold selection. */
  private[graft] def rfmDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // user-grain stats feed the 1-row corpus max, the unpivot (3x), and
    // the final assembly — persisted so the events scan runs once, not
    // once per consumer branch (caller clearCache()s per the Verify/Bench
    // contract)
    val u = ev.groupBy("user_id")
      .agg(max("day_idx").as("last_day"), count(lit(1)).as("freq"),
        sum("cents").as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mx = u.agg(max("last_day").as("maxd"), count(lit(1)).as("n"))
    val b = u.crossJoin(broadcast(mx)) // 1-row corpus stats
      .select(col("user_id"), (col("maxd") - col("last_day")).as("recency_days"),
        col("freq"), col("cents"), col("n"))
    // Tercile thresholds WITHOUT a per-dim global row_number sort: the
    // former unpivot ranked 3N wide rows in THREE window partitions (one
    // per dim) — a single-straggler-task sort whose wall time rode ambient
    // load, making ev_rfm the suite's chronically "contaminated" bench
    // entry (ratchet refused r7-r9; VERDICT r9 #5). The rank-k value is
    // tie-insensitive (rows with equal `bad` occupy adjacent ranks, so
    // whichever sits AT rank k, `bad` is the same) — so t1/t2 reduce to
    // k-th-smallest = min value whose cumulative count reaches k, computed
    // on the GROUPED (dim, value, count) frame: a map-side-combinable
    // groupBy plus a cumsum window over distinct values only (≤ users,
    // typically ≪ — recency is day-grain, freq small ints).
    val p = b.select(lit("r").as("dim"), col("recency_days").as("bad"))
      .unionByName(b.select(lit("f").as("dim"), (-col("freq")).as("bad")))
      .unionByName(b.select(lit("m").as("dim"), (-col("cents")).as("bad")))
    val wcum = Window.partitionBy("dim").orderBy("bad")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val th = p.groupBy("dim", "bad").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wcum))
      .crossJoin(broadcast(mx.select("n")))
      .groupBy("dim")
      .agg(min(when(col("cum") >= expr("(n + 2) div 3"), col("bad"))).as("t1"),
        min(when(col("cum") >= expr("(2 * n + 2) div 3"), col("bad"))).as("t2"))
    // one-row pivot of the 3 thresholds -> scoring is a single broadcast
    // map pass over b (the former shape re-scanned the unpivot and joined
    // back at user grain three times)
    val thRow = th.groupBy()
      .pivot("dim", Seq("r", "f", "m"))
      .agg(first("t1").as("t1"), first("t2").as("t2"))
    def score(bad: org.apache.spark.sql.Column, t1: String, t2: String) =
      when(bad <= col(t1), 3).when(bad <= col(t2), 2).otherwise(1)
    b.crossJoin(broadcast(thRow))
      .select(col("user_id"), col("recency_days"),
        col("freq").as("frequency"), col("cents").as("monetary_cents"),
        score(col("recency_days"), "r_t1", "r_t2").cast("int").as("r_score"),
        score(-col("freq"), "f_t1", "f_t2").cast("int").as("f_score"),
        score(-col("cents"), "m_t1", "m_t2").cast("int").as("m_score"))
      .withColumn("rfm_code",
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).cast("int"))
  }

  /** `ev_sessions` is appended to [[all]] below via [[sessionQ]] — kept as a
    * separate val only for readability of the two query families. */
  private[batch] lazy val sessionQ: Q =
    // Gap-based sessionization with per-session metrics — the batch twin of
    // the streaming session window (w_session_counts), emitting the full
    // per-session record (bounds, duration, event count) instead of counts:
    // the sessionize-then-aggregate shape every engagement pipeline runs.
    // One user-partitioned sort serves both the lag boundary flags and the
    // running session-id sum; ties break on event_id in BOTH engines, so
    // the segmentation is total-order deterministic. Scale: the window
    // partitions by user (bounded rows per partition at any corpus size —
    // user activity, not corpus size); the rollup is a (user, session)
    // map-side-combined aggregate.
    Q("ev_sessions",
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         |s AS (
         |  SELECT user_id, event_id, us,
         |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > $gapUs
         |         THEN 1 ELSE 0 END AS ns
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         |),
         |t AS (
         |  SELECT user_id, us,
         |    sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                  ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM s
         |)
         |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  min(us) AS start_us, max(us) AS end_us,
         |  max(us) - min(us) AS duration_us
         |FROM t GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
      sessionsDF(Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us")))
        .orderBy("user_id", "session_id")
    }

  /** Body of `ev_trend` over any (event_type, day_idx) frame — factored so
    * the planted-series spec drives the real moment accumulation. */
  private[graft] def trendDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    trendOfDayCounts(ev.groupBy("event_type", "day_idx").agg(count(lit(1)).as("c")))

  /** The fit alone, over a pre-counted (event_type, day_idx, c) frame —
    * the entry the streaming rollup's consumer uses (AnomalyStream). */
  private[graft] def trendOfDayCounts(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    d
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum("day_idx").as("sx"), sum("c").as("sy"),
        sum(expr("day_idx * c")).as("sxy"),
        sum(expr("day_idx * day_idx")).as("sxx"))
      .filter(col("n_days") >= 2)
      .select(col("event_type"), col("n_days"), col("sy").as("total_cnt"),
        expr("round(cast(n_days * sxy - sx * sy as double) / (n_days * sxx - sx * sx), 4)")
          .as("slope_per_day"),
        expr("round(cast(sy as double) / n_days, 4)").as("avg_per_day"))

  /** `ev_forecast` body over a (event_type, day_idx) frame — UNORDERED,
    * the query sorts. See the Q comment for the dow-mean contract. */
  private[graft] def forecastDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    forecastOfDayCounts(
      ev.groupBy("event_type", "day_idx").agg(count(lit(1)).as("c")))

  /** `ev_changepoint` body over a (event_type, day_idx) frame — UNORDERED,
    * the query sorts. See the Q comment for the exact-integer argmax
    * contract. */
  private[graft] def changepointDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    changepointOfDayCounts(
      ev.groupBy("event_type", "day_idx").agg(count(lit(1)).as("c")))

  /** The detector alone, over a pre-counted (event_type, day_idx, c)
    * frame — mirroring [[trendOfDayCounts]] so a streaming day-count
    * rollup can serve it. All windows partition by event_type over
    * day-grain rows. */
  private[graft] def changepointOfDayCounts(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = Window.partitionBy("event_type").orderBy("day_idx")
    val whole = Window.partitionBy("event_type")
    d
      .withColumn("cum", sum("c").over(byDay))
      .withColumn("idx", row_number().over(byDay).cast("long"))
      .withColumn("m", count(lit(1)).over(whole))
      .withColumn("tot", sum("c").over(whole))
      .filter(col("idx") < col("m")) // both segments non-empty
      .withColumn("stat", abs(col("m") * col("cum") - col("idx") * col("tot")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("stat").desc, col("day_idx"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day_idx").as("cp_day_idx"),
        col("m").as("n_days"), col("stat"),
        // UNROUNDED exact quotients: int/int ratios land ON 4-dp rounding
        // ties (the tx_quality_score lesson); the raw double division of
        // exact longs is bit-identical across engines
        expr("cast(cum as double) / idx").as("pre_avg"),
        expr("cast(tot - cum as double) / (m - idx)").as("post_avg"))
  }

  /** `ev_funnel_windows` body over a (user_id, event_type, us) frame —
    * UNORDERED, the query sorts. One row per window: the ordered-funnel
    * chain re-evaluated with that step window, counts from 1-row
    * aggregates (the allowed constant-bounded cross joins). */
  private[graft] def funnelWindowCurveDF(ev: org.apache.spark.sql.DataFrame,
      windows: Seq[Long]): org.apache.spark.sql.DataFrame = {
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("vt"))
    windows.map { w =>
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("us") > col("vt") && col("us") <= col("vt") + w)
        .groupBy("user_id").agg(min("us").as("ct"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("us") > col("ct") && col("us") <= col("ct") + w)
        .groupBy("user_id").agg(min("us").as("pt"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
        .select(lit(w).as("window_us"), col("n_view"), col("n_click"), col("n_purchase"))
    }.reduce(_.unionAll(_))
  }

  /** `ev_type_overlap` body over a (user_id, event_type) frame —
    * UNORDERED, the query sorts. Distinct collapses map-side; the pair
    * self-join hash-partitions on user_id with |types|²-bounded fan-out. */
  private[graft] def typeOverlapDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ut = ev.select("user_id", "event_type").distinct()
    val n = ut.groupBy("event_type").agg(count(lit(1)).as("nu"))
    val pr = ut.join(
        ut.select(col("user_id"), col("event_type").as("type_b")), "user_id")
      .filter(col("event_type") < col("type_b"))
      .groupBy(col("event_type").as("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pr
      .join(n.select(col("event_type").as("type_a"), col("nu").as("n_a")), "type_a")
      .join(n.select(col("event_type").as("type_b"), col("nu").as("n_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
        expr("cast(n_both as double) / (n_a + n_b - n_both)").as("jaccard"))
  }

  /** `ev_props_rollup` body over an (event_type, props) frame —
    * UNORDERED, the query sorts. One explicit-schema from_json parse per
    * row; a payload that is NULL, malformed, or missing the key lands in
    * `n_bad` and nowhere else. */
  private[graft] def propsRollupDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    ev
      .select(col("event_type"), expr("from_json(props, 'k BIGINT').k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_bad"),
        sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"),
        countDistinct("k").as("n_k"))

  /** The forecast alone, over a pre-counted (event_type, day_idx, c)
    * frame — the entry the streaming day-count rollup's consumer uses
    * (AnomalyStream.forecastOf), mirroring [[trendOfDayCounts]]. */
  private[graft] def forecastOfDayCounts(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ev = d
    val span = ev.agg(min("day_idx").as("a"), max("day_idx").as("b"))
    // pivot the dow counts into one 7-slot array per type: no dow join at
    // all (a self-join of the input's lineage would need reference dedup
    // that in-memory frames don't always get), one map-side-combined
    // aggregate, then the horizon expands from the SAME aggregated frame
    val perType = ev.groupBy("event_type").agg(
      array((0 to 6).map(w =>
        coalesce(sum(when(expr(s"day_idx % 7 = $w"), col("c"))), lit(0L))): _*).as("cw"))
    perType
      .crossJoin(broadcast(span)) // 1-row span
      .withColumn("h", explode(expr("sequence(1, 7)")))
      .select(col("event_type"), (col("b") + col("h")).as("day_idx"),
        expr("(b + h) % 7").as("dow"), col("a"), col("b"), col("cw"))
      .select(col("event_type"), col("day_idx"), col("dow"),
        expr("cast(element_at(cw, cast(dow as int) + 1) as double) / " +
          "greatest(((b - dow + 7) div 7) - ((a - 1 - dow + 7) div 7), 1)")
          .as("forecast"))
  }

  /** Gap-segmentation core shared by `ev_sessions` and `ev_paths`: appends
    * `sid` (1..n per user in (us, event_id) order) to any frame carrying
    * (user_id, event_id, us); extra columns pass through. */
  private[batch] def sessionized(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    ev
      .withColumn("prev", lag("us", 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1).otherwise(0))
      .withColumn("sid", sum("ns").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev", "ns")
  }

  /** Body of `ev_sessions` over any (user_id, event_id, us) frame. */
  private[graft] def sessionsDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    sessionized(ev)
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"), min("us").as("start_us"),
        max("us").as("end_us"), (max("us") - min("us")).as("duration_us"))
      .select(col("user_id"), col("sid").cast("long").as("session_id"),
        col("n_events"), col("start_us"), col("end_us"), col("duration_us"))

  /** Body of `ev_attribution` over any (user_id, event_id, event_type, us)
    * frame — factored so the planted-case spec drives the REAL window
    * chain. */
  private[graft] def attributionDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("k"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val clickOk = col("lc").isNotNull && col("us") - col("lc") <= attrUs
    val viewOk = col("lv").isNotNull && col("us") - col("lv") <= attrUs
    ev
      .withColumn("k", when(col("event_type") === "purchase", 1).otherwise(0))
      .withColumn("lc", max(when(col("event_type") === "click", col("us"))).over(w))
      .withColumn("lv", max(when(col("event_type") === "view", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us").as("purchase_us"),
        when(clickOk, "click").when(viewOk, "view").otherwise("none").as("attributed"),
        when(clickOk, col("lc")).when(viewOk, col("lv")).as("touch_us"),
        (col("us") - when(clickOk, col("lc")).when(viewOk, col("lv"))).as("lag_us"))
  }

  /** Body of `ev_conversion` over any (user_id, event_id, event_type, us)
    * frame — the forward mirror of [[attributionDF]]. */
  private[graft] def conversionDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("k"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val conv = col("np").isNotNull && col("np") - col("us") <= attrUs
    ev
      .withColumn("k", when(col("event_type") === "purchase", 1).otherwise(0))
      .withColumn("np", min(when(col("event_type") === "purchase", col("us"))).over(w))
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id"), col("event_type").as("exposure"),
        col("us").as("exposure_us"),
        when(conv, 1).otherwise(0).cast("int").as("converted"),
        when(conv, col("np")).as("purchase_us"),
        when(conv, col("np") - col("us")).as("lag_us"))
  }

  /** Per-user daily-count baseline over any (user_id, day_us) frame (one
    * row per EVENT): day cardinality `n`, count sum `s1`, count square sum
    * `s2` — the exact-integer sufficient statistics of the z-test. Shared
    * with the streaming server, which pins these as its static baseline. */
  private[graft] def userDayStats(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    ev.groupBy("user_id", "day_us").agg(count(lit(1)).as("c"))
      .groupBy("user_id").agg(count(lit(1)).as("n"),
        sum("c").as("s1"), sum(col("c") * col("c")).as("s2"))

  /** The spike predicate over columns (c, n, s1, s2): z > 3 in exact
    * integer arithmetic — (n·c − s1)² > 9(n·s2 − s1²), above-mean only.
    * Shared verbatim by the batch query and the streaming server. */
  private[graft] def spikePred: org.apache.spark.sql.Column = {
    val dev = col("n") * col("c") - col("s1")
    col("n") >= 3 && dev > 0 &&
      dev * dev > lit(9L) * (col("n") * col("s2") - col("s1") * col("s1"))
  }

  /** Body of `ev_anomaly` over any (user_id, day_us) frame — one row per
    * EVENT (days repeat); factored so the planted-spike spec drives the
    * REAL integer z-test. */
  private[graft] def anomalyDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    ev.groupBy("user_id", "day_us").agg(count(lit(1)).as("c"))
      .join(userDayStats(ev), "user_id")
      .filter(spikePred)
      .select(col("user_id"), col("day_us"), col("c").as("n_events"))

  /** Body of `ev_paths` over any (user_id, event_id, us, event_type)
    * frame. */
  private[graft] def pathsDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "sid").orderBy(col("us"), col("event_id"))
    sessionized(ev)
      .withColumn("nxt", lead("event_type", 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("step_a"), col("nxt").as("step_b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step_a"), col("step_b"))
      .limit(20)
  }

  /** Body of `ev_funnel` over any (user_id, event_type, us) frame — factored
    * so the planted-sequence spec drives the REAL step-join chain. */
  private[graft] def funnelDF(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("vt"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("us") > col("vt") && col("us") <= col("vt") + stepUs)
      .groupBy("user_id").agg(min("us").as("ct"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("us") > col("ct") && col("us") <= col("ct") + stepUs)
      .groupBy("user_id").agg(min("us").as("pt"))
    ev.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("vt").as("view_us"), col("ct").as("click_us"),
        col("pt").as("purchase_us"),
        expr("CAST(CASE WHEN pt IS NOT NULL THEN 3 WHEN ct IS NOT NULL THEN 2 " +
          "WHEN vt IS NOT NULL THEN 1 ELSE 0 END AS INT)").as("depth"))
  }
}
