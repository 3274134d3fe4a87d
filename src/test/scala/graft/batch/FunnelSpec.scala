package graft.batch

import graft.SparkSpec

/** Planted-sequence semantics for the ordered funnel: order matters, the
  * step window binds, and the EARLIEST completion is the one reported. */
class FunnelSpec extends SparkSpec {

  private val H = 3600L * 1000 * 1000 // one hour in µs

  test("ev_funnel: order, step window, and earliest-completion semantics") {
    import spark.implicits._
    val ev = Seq(
      // user 1: clean view(1h) -> click(2h) -> purchase(3h) => depth 3
      (1L, "view", 1 * H), (1L, "click", 2 * H), (1L, "purchase", 3 * H),
      // user 2: purchase BEFORE view/click never counts => depth 2
      (2L, "purchase", 1 * H), (2L, "view", 2 * H), (2L, "click", 3 * H),
      // user 3: click arrives 25h after the first view -> outside the 24h
      // step window => stuck at depth 1
      (3L, "view", 1 * H), (3L, "click", 27 * H),
      // user 4: two funnel completions; the earliest click after the FIRST
      // view anchors the chain (click@2h, not click@30h)
      (4L, "view", 1 * H), (4L, "click", 2 * H), (4L, "purchase", 20 * H),
      (4L, "view", 28 * H), (4L, "click", 30 * H),
      // user 5: never views => depth 0
      (5L, "error", 1 * H), (5L, "signup", 2 * H)
    ).toDF("user_id", "event_type", "us")
    val out = FunnelQueries.funnelDF(ev).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))).toMap
    assert(out(1L) == ((Some(1 * H), Some(2 * H), Some(3 * H), 3)), s"u1: ${out(1L)}")
    assert(out(2L)._4 == 2 && out(2L)._3.isEmpty, s"pre-view purchase ignored: ${out(2L)}")
    assert(out(3L) == ((Some(1 * H), None, None, 1)), s"step window binds: ${out(3L)}")
    assert(out(4L) == ((Some(1 * H), Some(2 * H), Some(20 * H), 3)),
      s"earliest chain wins: ${out(4L)}")
    assert(out(5L) == ((None, None, None, 0)), s"no view => depth 0: ${out(5L)}")
  }

  test("ev_sessions: 30-min gaps split sessions; bounds and counts are exact") {
    import spark.implicits._
    val M = 60L * 1000 * 1000 // one minute in µs
    val ev = Seq(
      // user 1: events at 0, 10, 25 min (one session), then 70, 75 (second:
      // 45-min gap), then a lone event at 200 (third)
      (1L, 100L, 0 * M), (1L, 101L, 10 * M), (1L, 102L, 25 * M),
      (1L, 103L, 70 * M), (1L, 104L, 75 * M), (1L, 105L, 200 * M),
      // user 2: exactly-30-min spacing does NOT split (gap must exceed)
      (2L, 200L, 0 * M), (2L, 201L, 30 * M)
    ).toDF("user_id", "event_id", "us")
    val out = FunnelQueries.sessionsDF(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.keySet == Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)), s"sessions: ${out.keySet}")
    assert(out((1L, 1L)) == ((3L, 0 * M, 25 * M, 25 * M)), s"s1: ${out((1L, 1L))}")
    assert(out((1L, 2L)) == ((2L, 70 * M, 75 * M, 5 * M)), s"s2: ${out((1L, 2L))}")
    assert(out((1L, 3L)) == ((1L, 200 * M, 200 * M, 0L)), s"singleton: ${out((1L, 3L))}")
    assert(out((2L, 1L)) == ((2L, 0L, 30 * M, 30 * M)), s"boundary gap keeps one session: ${out((2L, 1L))}")
  }

  test("ev_attribution: click beats view, lookback binds, same-instant touch counts") {
    import spark.implicits._
    val D = 24L * H
    val ev = Seq(
      // user 1: view@1h, click@2h, purchase@3h => click-attributed, lag 1h
      (1L, 10L, "view", 1 * H), (1L, 11L, "click", 2 * H), (1L, 12L, "purchase", 3 * H),
      // user 2: view only => view-attributed
      (2L, 20L, "view", 1 * H), (2L, 21L, "purchase", 2 * H),
      // user 3: click 8 days before the purchase is OUTSIDE the 7-day
      // lookback, the view 1 day before is inside => view wins
      (3L, 30L, "click", 1 * H), (3L, 31L, "view", 7 * D + 1 * H),
      (3L, 32L, "purchase", 8 * D + 1 * H),
      // user 4: no touches => none
      (4L, 40L, "signup", 1 * H), (4L, 41L, "purchase", 2 * H),
      // user 5: click at the SAME µs as the purchase attributes (<=), and a
      // second purchase later re-attributes to the same click
      (5L, 50L, "click", 1 * H), (5L, 51L, "purchase", 1 * H),
      (5L, 52L, "purchase", 2 * H),
      // user 6: touch AFTER the purchase never attributes backwards
      (6L, 60L, "purchase", 1 * H), (6L, 61L, "click", 2 * H)
    ).toDF("user_id", "event_id", "event_type", "us")
    val out = FunnelQueries.attributionDF(ev).collect()
      .map(r => r.getLong(1) -> ((r.getString(3), Option(r.get(4)), Option(r.get(5))))).toMap
    assert(out(12L) == (("click", Some(2 * H), Some(1 * H))), s"u1: ${out(12L)}")
    assert(out(21L) == (("view", Some(1 * H), Some(1 * H))), s"u2 view fallback: ${out(21L)}")
    assert(out(32L) == (("view", Some(7 * D + 1 * H), Some(1 * D))),
      s"u3 lookback binds: ${out(32L)}")
    assert(out(41L) == (("none", None, None)), s"u4 unattributed: ${out(41L)}")
    assert(out(51L) == (("click", Some(1 * H), Some(0L))), s"u5 same-instant: ${out(51L)}")
    assert(out(52L) == (("click", Some(1 * H), Some(1 * H))), s"u5 re-attribution: ${out(52L)}")
    assert(out(60L) == (("none", None, None)), s"u6 future touch ignored: ${out(60L)}")
  }

  test("ev_conversion: earliest future purchase labels, lookahead binds, same-instant converts") {
    import spark.implicits._
    val D = 24L * H
    val ev = Seq(
      // u1: view@1h -> purchases @3h and @5h => earliest (3h) labels, lag 2h
      (1L, 10L, "view", 1 * H), (1L, 11L, "purchase", 3 * H), (1L, 12L, "purchase", 5 * H),
      // u2: purchase 8 days after the click is outside the 7-day lookahead
      (2L, 20L, "click", 1 * H), (2L, 21L, "purchase", 8 * D + 1 * H),
      // u3: purchase BEFORE the view never labels backwards
      (3L, 30L, "purchase", 1 * H), (3L, 31L, "view", 2 * H),
      // u4: purchase at the SAME µs as the click converts (lag 0)
      (4L, 40L, "click", 1 * H), (4L, 41L, "purchase", 1 * H)
    ).toDF("user_id", "event_id", "event_type", "us")
    val out = FunnelQueries.conversionDF(ev).collect()
      .map(r => r.getLong(1) -> ((r.getInt(4), Option(r.get(5)), Option(r.get(6))))).toMap
    assert(out(10L) == ((1, Some(3 * H), Some(2 * H))), s"u1 earliest wins: ${out(10L)}")
    assert(out(20L) == ((0, None, None)), s"u2 lookahead binds: ${out(20L)}")
    assert(out(31L) == ((0, None, None)), s"u3 past purchase ignored: ${out(31L)}")
    assert(out(40L) == ((1, Some(1 * H), Some(0L))), s"u4 same-instant converts: ${out(40L)}")
  }

  test("ev_anomaly: integer z-test flags spikes above the user's own baseline") {
    import spark.implicits._
    val DAY = 24L * H
    def days(u: Long, counts: Seq[Int]): Seq[(Long, Long)] =
      counts.zipWithIndex.flatMap { case (c, i) => Seq.fill(c)((u, i * DAY)) }
    val ev = (
      // user 1: eleven quiet days (1 event) + one 5-event day => z = sqrt(
      // n·(c-mean)²/Σ…) clears 3 strictly => flagged
      days(1L, Seq.fill(11)(1) :+ 5) ++
      // user 2: nine quiet days + one spike => z² = n−1 = 9 EXACTLY on the
      // boundary; strict > keeps it unflagged (any c: single-outlier identity)
      days(2L, Seq.fill(9)(1) :+ 50) ++
      // user 3: uniform days => zero variance, nothing above the mean
      days(3L, Seq.fill(5)(4)) ++
      // user 4: only two active days => n < 3 excluded
      days(4L, Seq(1, 100))
    ).toDF("user_id", "day_us")
    val out = FunnelQueries.anomalyDF(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 11 * DAY, 5L)), s"anomalies: ${out.toSeq}")
  }

  test("ev_paths: transitions stay inside session boundaries") {
    import spark.implicits._
    val M = 60L * 1000 * 1000
    val ev = Seq(
      // session 1: view -> click -> view (transitions view->click, click->view)
      (1L, 1L, 0 * M, "view"), (1L, 2L, 5 * M, "click"), (1L, 3L, 10 * M, "view"),
      // 40-min gap — view(10)->view(50) must NOT count as a transition
      (1L, 4L, 50 * M, "view"), (1L, 5L, 55 * M, "purchase"),
      // user 2 contributes one more view->click
      (2L, 6L, 0 * M, "view"), (2L, 7L, 1 * M, "click")
    ).toDF("user_id", "event_id", "us", "event_type")
    val out = FunnelQueries.pathsDF(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("view", "click") -> 2L, ("click", "view") -> 1L,
      ("view", "purchase") -> 1L), s"paths: $out")
  }

  test("ev_rollup + ev_pivot_dow: grouping-id grains and zero-filled pivot cells exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val dir = java.nio.file.Files.createTempDirectory("rollup_sf")
    dir.toFile.deleteOnExit()
    val DAYMS = 24L * 3600 * 1000
    // one 'view' on epoch-day 0 (dow 0) and one on day 1 (dow 1)
    Seq((1L, 0L * DAYMS + 1000, 10L, "view", 1.0, "{}"),
      (2L, 1L * DAYMS + 1000, 11L, "view", 2.0, "{}"))
      .toDF("event_id", "tsl", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_millis(col("tsl"))).drop("tsl")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val roll = graft.SparkEntry.queries("ev_rollup")(spark, dir.toString).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2)) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(roll((Some("view"), Some(0L), 0L)) == ((1L, 100L)), s"detail d0: $roll")
    assert(roll((Some("view"), Some(1L), 0L)) == ((1L, 200L)), s"detail d1: $roll")
    assert(roll((Some("view"), None, 1L)) == ((2L, 300L)), s"type subtotal: $roll")
    assert(roll((None, None, 3L)) == ((2L, 300L)), s"grand total: $roll")
    assert(roll.size == 4, s"exactly the three grains: $roll")
    val piv = graft.SparkEntry.queries("ev_pivot_dow")(spark, dir.toString).collect()
    assert(piv.length == 1 && piv.head.getString(0) == "view")
    val cells = (1 to 7).map(piv.head.getLong)
    assert(cells == Seq(1L, 1L, 0L, 0L, 0L, 0L, 0L), s"zero-filled cells: $cells")
  }

  test("ev_funnel_windows: each planted lag crosses exactly its windows") {
    import spark.implicits._
    // A clicks 30min after view (inside all three windows), B at 3h
    // (6h/24h only), C at 12h (24h only); only A purchases (30min after
    // the click -> all windows where the click exists, i.e. all three)
    val Mn = 60L * 1000 * 1000 // one minute in µs
    val ev = Seq(
      (1L, "view", 0L), (1L, "click", 30 * Mn), (1L, "purchase", 60 * Mn),
      (2L, "view", 0L), (2L, "click", 3 * 60 * Mn),
      (3L, "view", 0L), (3L, "click", 12 * 60 * Mn)
    ).toDF("user_id", "event_type", "us")
    val out = FunnelQueries.funnelWindowCurveDF(ev,
      Seq(3600L * 1000000, 6 * 3600L * 1000000, 24 * 3600L * 1000000))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(3600L * 1000000) == ((3L, 1L, 1L)), s"1h: ${out}")
    assert(out(6 * 3600L * 1000000) == ((3L, 2L, 1L)), s"6h: ${out}")
    assert(out(24 * 3600L * 1000000) == ((3L, 3L, 1L)), s"24h: ${out}")
  }

  test("ev_type_overlap: planted overlap counts and Jaccard exact; repeats collapse") {
    import spark.implicits._
    // users 1-3 view; 1-2 click (overlap 2); user 4 only errors (no pair
    // rows); repeated events per user must NOT inflate counts
    val ev = Seq(
      (1L, "view"), (1L, "view"), (1L, "click"),
      (2L, "view"), (2L, "click"), (2L, "click"),
      (3L, "view"),
      (4L, "error")
    ).toDF("user_id", "event_type")
    val out = FunnelQueries.typeOverlapDF(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out.keySet == Set(("click", "view")), s"only co-occurring pairs: ${out.keySet}")
    // n_click=2, n_view=3, both=2 -> jaccard 2/3
    assert(out(("click", "view")) == ((2L, 3L, 2L, 2.0 / 3.0)), s"${out(("click", "view"))}")
  }

  test("ev_props_rollup: explicit-schema parse; every malformed shape lands in n_bad only") {
    import spark.implicits._
    val ev = Seq(
      ("a", """{"k": 5}"""), ("a", """{"k": 7}"""), ("a", """{"k": 5}"""),
      ("a", null),              // NULL payload
      ("a", "not json"),        // malformed
      ("a", """{"j": 1}"""),    // missing key
      ("a", """{"k": "x"}"""),  // wrong type
      ("b", """{"k": 0}""")
    ).toDF("event_type", "props")
    val out = FunnelQueries.propsRollupDF(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 7L && a.getLong(2) == 4L, s"n/n_bad: $a")
    assert(a.getLong(3) == 17L && a.getLong(4) == 5L && a.getLong(5) == 7L,
      s"aggregates skip bad payloads: $a")
    assert(a.getLong(6) == 2L, s"distinct k: $a")
    val b = out("b")
    assert(b.getLong(1) == 1L && b.getLong(2) == 0L && b.getLong(3) == 0L, s"clean type: $b")
  }

  test("ev_changepoint: planted level shift is found at its last low day; ties break earliest") {
    import spark.implicits._
    val counts = (
      // type "shift": 10 days at 2/day then 10 days at 10/day — the CUSUM
      // argmax must land on day 9 (the last day of the low level)
      (0 until 10).map(d => ("shift", d.toLong, 2L)) ++
      (10 until 20).map(d => ("shift", d.toLong, 10L)) ++
      // type "flat": constant series — every prefix stat is 0, so the
      // (stat DESC, day) total order must pick the EARLIEST day
      (0 until 6).map(d => ("flat", d.toLong, 5L)) ++
      // type "one": a single day cannot split into two non-empty
      // segments — no row may be emitted
      Seq(("one", 0L, 7L))
    ).toDF("event_type", "day_idx", "c")
    val out = FunnelQueries.changepointOfDayCounts(counts).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!out.contains("one"), s"1-day series must not emit: ${out.keySet}")
    val sh = out("shift")
    assert(sh.getLong(sh.fieldIndex("cp_day_idx")) == 9L, s"shift day: $sh")
    // m=20, tot=120; at idx 10: |20*20 - 10*120| = 800, strictly above
    // both neighbors (720) — the planted max
    assert(sh.getLong(sh.fieldIndex("stat")) == 800L, s"shift stat: $sh")
    assert(sh.getDouble(sh.fieldIndex("pre_avg")) == 2.0, s"pre: $sh")
    assert(sh.getDouble(sh.fieldIndex("post_avg")) == 10.0, s"post: $sh")
    val fl = out("flat")
    assert(fl.getLong(fl.fieldIndex("cp_day_idx")) == 0L, s"tie -> earliest: $fl")
    assert(fl.getLong(fl.fieldIndex("stat")) == 0L, s"flat stat: $fl")
    assert(fl.getDouble(fl.fieldIndex("pre_avg")) == 5.0 &&
      fl.getDouble(fl.fieldIndex("post_avg")) == 5.0, s"flat means: $fl")
  }

  test("ev_scd2: tier changes open segments, half-open close-out, gaps don't split") {
    import spark.implicits._
    val ev = Seq(
      // user 1: t1 (days 0-1) -> t2 (days 2-3) -> t1 (day 5): three
      // segments; segment 2 closes at day 5 (the NEXT open), not at its
      // own last active day 3 — half-open [from, to) contract
      (1L, 0L, 100L), (1L, 1L, 200L), (1L, 2L, 7000L), (1L, 3L, 6500L),
      (1L, 5L, 50L),
      // user 2: single tier-3 day => one current segment
      (2L, 10L, 20000L),
      // user 3: two same-day rows SUM to exactly the 6000-cent boundary
      // (inclusive => tier 2), then a 5999 day (tier 1)
      (3L, 0L, 3000L), (3L, 0L, 3000L), (3L, 1L, 5999L),
      // user 4: same tier across a 9-day activity gap stays ONE segment
      (4L, 0L, 10L), (4L, 9L, 20L)
    ).toDF("user_id", "day_idx", "cents")
    val out = FunnelQueries.scd2DF(ev).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> ((r.getInt(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4), r.getInt(5)))).toMap
    // (user, valid_from) -> (tier, valid_to, n_active_days, is_current)
    assert(out.size == 7, s"segments: ${out.keySet}")
    assert(out((1L, 0L)) == ((1, Some(2L), 2L, 0)), s"u1 s1: ${out((1L, 0L))}")
    assert(out((1L, 2L)) == ((2, Some(5L), 2L, 0)), s"u1 s2 closes at next OPEN: ${out((1L, 2L))}")
    assert(out((1L, 5L)) == ((1, None, 1L, 1)), s"u1 current: ${out((1L, 5L))}")
    assert(out((2L, 10L)) == ((3, None, 1L, 1)), s"u2 singleton: ${out((2L, 10L))}")
    assert(out((3L, 0L)) == ((2, Some(1L), 1L, 0)), s"u3 boundary day sums to tier 2: ${out((3L, 0L))}")
    assert(out((3L, 1L)) == ((1, None, 1L, 1)), s"u3 5999 is tier 1: ${out((3L, 1L))}")
    assert(out((4L, 0L)) == ((1, None, 2L, 1)), s"u4 gap does not split: ${out((4L, 0L))}")
  }

  test("ev_ltv: cohort anchors at first day, prefix sum accumulates, quiet users keep weighing") {
    import spark.implicits._
    val ev = Seq(
      // cohort day 10: user 1 spends 100 on d10 and 50 on d12; user 2
      // spends 200 on d10 and NOTHING after (stays in the denominator)
      (1L, 10L, 100L), (1L, 12L, 50L), (2L, 10L, 200L),
      // split-day rows sum before the curve: user 1's d12 also has +10
      (1L, 12L, 10L),
      // cohort day 11: singleton user 3, one purchase
      (3L, 11L, 70L)
    ).toDF("user_id", "day_idx", "cents")
    val out = FunnelQueries.ltvDF(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // (cohort_day, offset) -> (n_users, cum_cents, avg_ltv_cents)
    assert(out.keySet == Set((10L, 0L), (10L, 2L), (11L, 0L)), s"rows: ${out.keySet}")
    assert(out((10L, 0L)) == ((2L, 300L, 150.0)), s"day-0 cum: ${out((10L, 0L))}")
    // offset 2 adds user 1's 60; user 2 is quiet but still divides
    assert(out((10L, 2L)) == ((2L, 360L, 180.0)), s"quiet user weighs: ${out((10L, 2L))}")
    assert(out((11L, 0L)) == ((1L, 70L, 70.0)), s"singleton cohort: ${out((11L, 0L))}")
  }

  test("ev_tier_snapshot: mid-interval and NULL-open coverage, pre-signup absence") {
    import spark.implicits._
    // weekly grid anchored at min day 0, max day 10 -> snapshots at 0 and 7
    val ev = Seq(
      // user 1: t1 from day 0, t2 from day 10 — snapshot 7 falls MID the
      // [0,10) interval; the current [10,inf) segment covers no grid point
      (1L, 0L, 100L), (1L, 10L, 7000L),
      // user 2: signs up day 7 at t3 — absent at snapshot 0, covered at 7
      // by its NULL-open current segment
      (2L, 7L, 20000L)
    ).toDF("user_id", "day_idx", "cents")
    val out = FunnelQueries.tierSnapshotDF(ev).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set((0L, 1, 1L), (7L, 1, 1L), (7L, 3, 1L)),
      s"snapshot composition: $out")
  }

  test("ev_concentration: marginal-level ties are coverage-invariant, percentile cuts exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, lit}
    val dir = java.nio.file.Files.createTempDirectory("conc_ev")
    dir.toFile.deleteOnExit()
    // 40 users: 2x10 events, a TEN-user tie at 4 events (the k=4 cut for
    // pct=10 lands INSIDE it — any choice of 2 of the 10 tied users covers
    // the same 28 events, which is exactly what the no-ranking histogram
    // formula must produce), 28x1 event. total e = 88.
    val counts = Seq.fill(2)(10) ++ Seq.fill(10)(4) ++ Seq.fill(28)(1)
    val rows = counts.zipWithIndex.flatMap { case (c, u) =>
      (0 until c).map(i => (u.toLong * 1000 + i, u.toLong, 1000000L + i))
    }
    rows.toDF("event_id", "user_id", "tsl")
      .withColumn("ts", expr("timestamp_millis(tsl)")).drop("tsl")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("ev_concentration")(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getDouble(5)))).toMap
    // (pct -> (k_users, events_covered, coverage))
    assert(out(1L) == ((1L, 10L, 10.0 / 88)), s"pct1: ${out(1L)}")
    assert(out(5L) == ((2L, 20L, 20.0 / 88)), s"pct5: ${out(5L)}")
    assert(out(10L) == ((4L, 28L, 28.0 / 88)), s"pct10 cuts INSIDE the tie: ${out(10L)}")
    assert(out(50L) == ((20L, 68L, 68.0 / 88)), s"pct50: ${out(50L)}")
    assert(out(100L) == ((40L, 88L, 1.0)), s"pct100 covers everything: ${out(100L)}")
  }

  test("ev_cohort_matrix: cohort anchors at first-seen day, same-day repeats count once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, lit}
    val dir = java.nio.file.Files.createTempDirectory("cohort_ev")
    dir.toFile.deleteOnExit()
    val D = 24L * 3600 * 1000 // one day in ms
    // user 1: days 0 (x2 events — must count once), 1, 7; user 2: day 0
    // only; user 3: first seen day 1, again day 7 (offset 6 in ITS cohort)
    val rows = Seq(
      (10L, 1L, 0 * D), (11L, 1L, 0 * D + 5), (12L, 1L, 1 * D), (13L, 1L, 7 * D),
      (20L, 2L, 0 * D),
      (30L, 3L, 1 * D), (31L, 3L, 7 * D)
    )
    rows.toDF("event_id", "user_id", "tsl")
      .withColumn("ts", expr("timestamp_millis(tsl)")).drop("tsl")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("ev_cohort_matrix")(spark, dir.toString)
      .collect().map(r => (r.getLong(0) / (D * 1000), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // (cohort_day, offset) -> (n_active, n_users, retention)
    assert(out.keySet == Set((0L, 0L), (0L, 1L), (0L, 7L), (1L, 0L), (1L, 6L)),
      s"triangular cells only: ${out.keySet}")
    assert(out((0L, 0L)) == ((2L, 2L, 1.0)), s"day-0 full cohort once: ${out((0L, 0L))}")
    assert(out((0L, 1L)) == ((1L, 2L, 0.5)), s"offset 1 half retained: ${out((0L, 1L))}")
    assert(out((0L, 7L)) == ((1L, 2L, 0.5)), s"offset 7: ${out((0L, 7L))}")
    assert(out((1L, 0L)) == ((1L, 1L, 1.0)) && out((1L, 6L)) == ((1L, 1L, 1.0)),
      s"user 3's cohort anchors at ITS first day: ${out((1L, 0L))} ${out((1L, 6L))}")
  }

  test("ev_funnel_time: discrete rank percentiles (ceil convention) and exact means") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, lit}
    val dir = java.nio.file.Files.createTempDirectory("ftime_ev")
    dir.toFile.deleteOnExit()
    val Mms = 60L * 1000 // one minute in ms
    // 5 complete funnels: view->click lags 10..50 min (p50 = rank ceil(2.5)
    // = 3rd = 30 min; p90 = rank 5 = 50 min), click->purchase 60 min flat
    val rows = (1 to 5).flatMap { u =>
      val click = u * 10 * Mms
      Seq((u * 100L, u.toLong, "view", 0L), (u * 100L + 1, u.toLong, "click", click),
        (u * 100L + 2, u.toLong, "purchase", click + 60 * Mms))
    }
    rows.toDF("event_id", "user_id", "event_type", "tsl")
      .withColumn("ts", expr("timestamp_millis(tsl)")).drop("tsl")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("ev_funnel_time")(spark, dir.toString)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    val Mus = Mms * 1000 // µs
    assert(out("view_to_click") == ((5L, 30.0 * Mus, 30 * Mus, 50 * Mus)),
      s"v2c p50 = 3rd of 5 ranks, p90 = 5th: ${out("view_to_click")}")
    assert(out("click_to_purchase") == ((5L, 60.0 * Mus, 60 * Mus, 60 * Mus)),
      s"flat lags collapse all stats: ${out("click_to_purchase")}")
    assert(out("view_to_purchase") == ((5L, 90.0 * Mus, 90 * Mus, 110 * Mus)),
      s"v2p: ${out("view_to_purchase")}")
  }
}
