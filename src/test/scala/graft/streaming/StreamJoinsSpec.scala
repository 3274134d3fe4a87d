package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.core.SensorReading

class StreamJoinsSpec extends SparkSpec {

  test("keyed interval join pairs readings with same-sensor history in the window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val left = MemoryStream[SensorReading]
    val right = MemoryStream[SensorReading]
    val out = StreamJoins.correlatedReadings(left.toDS(), right.toDS(),
      withinMs = 10000L)
    val q = out.select("id", "ltemp", "rtemp")
      .writeStream.format("memory").queryName("sj_out").outputMode("append").start()

    right.addData(
      SensorReading("sensor_1", 1000L, 10.0),  // within [−10s, 0] of the probe
      SensorReading("sensor_1", 50000L, 11.0), // outside the interval
      SensorReading("sensor_2", 2000L, 12.0))  // different key
    left.addData(SensorReading("sensor_1", 5000L, 42.0))
    q.processAllAvailable()
    val rows = spark.table("sj_out").as[(String, Double, Double)].collect().toSet
    q.stop()
    assert(rows == Set(("sensor_1", 42.0, 10.0)),
      s"only same-key, in-interval rows may join: $rows")
  }

  test("LEFT OUTER interval join null-pads unmatched probes after watermark expiry") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val left = MemoryStream[SensorReading]
    val right = MemoryStream[SensorReading]
    val out = StreamJoins.correlatedReadings(left.toDS(), right.toDS(),
      withinMs = 10000L, joinType = "left_outer")
    val q = out.select("id", "ltemp", "rtemp")
      .writeStream.format("memory").queryName("sj_outer").outputMode("append").start()

    right.addData(SensorReading("sensor_1", 1000L, 10.0))
    left.addData(
      SensorReading("sensor_1", 5000L, 42.0),  // matches ref@1000
      SensorReading("sensor_2", 5000L, 77.0))  // no same-key ref: outer row
    q.processAllAvailable()
    // the unmatched row emits only once BOTH watermarks pass its range end
    // (state eviction) — advance event time on both streams, then run the
    // eviction batch
    left.addData(SensorReading("sensor_9", 100000L, 0.0))
    right.addData(SensorReading("sensor_9", 100000L, 0.0))
    q.processAllAvailable()
    left.addData(SensorReading("sensor_9", 200000L, 0.0))
    right.addData(SensorReading("sensor_9", 200000L, 0.0))
    q.processAllAvailable()
    val rows = spark.table("sj_outer")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    q.stop()
    assert(rows.contains(("sensor_1", 42.0, Some(10.0))), s"inner row present: $rows")
    assert(rows.contains(("sensor_2", 77.0, None)),
      s"unmatched probe null-pads after expiry: $rows")
  }

  test("streaming as-of join enriches each probe with the latest earlier reference") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val probes = MemoryStream[SensorReading]
    val refs = MemoryStream[SensorReading]
    val out = StreamJoins.asofEnrich(probes.toDS(), refs.toDS())
    val q = out.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()

    // batch 1: refs at 1000/3000, probes straddling them
    refs.addData(
      SensorReading("sensor_1", 1000L, 10.0),
      SensorReading("sensor_1", 3000L, 30.0),
      SensorReading("sensor_2", 500L, 99.0))
    probes.addData(
      SensorReading("sensor_1", 500L, 1.0),   // before any ref -> None
      SensorReading("sensor_1", 2000L, 2.0),  // after ref@1000 -> 10.0
      SensorReading("sensor_1", 3000L, 3.0),  // tie: ref at SAME ts wins (<=)
      SensorReading("sensor_1", 5000L, 4.0))  // after ref@3000 -> 30.0
    q.processAllAvailable()
    // batch 2: state carries the latest ref across batches
    probes.addData(SensorReading("sensor_1", 9000L, 5.0))
    q.processAllAvailable()
    val rows = spark.table("asof_out").as[StreamJoins.AsOfEnriched]
      .collect().map(e => (e.ts, e.refTemp)).toSet
    q.stop()
    assert(rows == Set(
      (500L, None), (2000L, Some(10.0)), (3000L, Some(30.0)),
      (5000L, Some(30.0)), (9000L, Some(30.0))), s"got: $rows")
  }

  test("as-of join TTL evicts idle keys: a post-eviction probe enriches as None") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val probes = MemoryStream[SensorReading]
    val refs = MemoryStream[SensorReading]
    val out = StreamJoins.asofEnrich(probes.toDS(), refs.toDS(), ttlMs = 5000L)
    val q = out.writeStream.format("memory").queryName("asof_ttl")
      .outputMode("append").start()

    refs.addData(SensorReading("sensor_1", 1000L, 10.0))
    probes.addData(SensorReading("sensor_1", 2000L, 1.0)) // enriches: Some(10.0)
    q.processAllAvailable()
    // advance the watermark far past 2000 + ttl on an unrelated key...
    refs.addData(SensorReading("sensor_9", 1000000L, 0.0))
    probes.addData(SensorReading("sensor_9", 1000000L, 0.0))
    q.processAllAvailable()
    // ...and run one more batch so the due timer actually fires
    refs.addData(SensorReading("sensor_9", 2000000L, 0.0))
    probes.addData(SensorReading("sensor_9", 2000000L, 0.0))
    q.processAllAvailable()
    // sensor_1's state is gone: the new probe finds no reference
    probes.addData(SensorReading("sensor_1", 3000000L, 2.0))
    q.processAllAvailable()
    val rows = spark.table("asof_ttl").as[StreamJoins.AsOfEnriched]
      .collect().filter(_.id == "sensor_1").map(e => (e.ts, e.refTemp)).toSet
    q.stop()
    assert(rows == Set((2000L, Some(10.0)), (3000000L, None)),
      s"pre-eviction probe enriched, post-eviction probe None: $rows")
  }

  test("as-of join TTL: a batch of only watermark-late rows drops them, query survives") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val probes = MemoryStream[SensorReading]
    val refs = MemoryStream[SensorReading]
    val out = StreamJoins.asofEnrich(probes.toDS(), refs.toDS(), ttlMs = 5000L)
    val q = out.writeStream.format("memory").queryName("asof_late")
      .outputMode("append").start()

    // drive the watermark far forward on an unrelated key
    refs.addData(SensorReading("sensor_9", 1000000L, 0.0))
    probes.addData(SensorReading("sensor_9", 1000000L, 0.0))
    q.processAllAvailable()
    // a batch whose only rows for sensor_1 are WAY behind the watermark
    // (maxTs + ttlMs = 6000 << watermark ~995000). With EventTimeTimeout
    // the exec filters watermark-late input, so the key's lambda never
    // runs on them — no output, no state, and crucially no attempt to set
    // a timer in the past. The timer clamp in asofEnrich guards the same
    // invariant if that filtering ever changes across Spark versions.
    refs.addData(SensorReading("sensor_1", 500L, 10.0))
    probes.addData(SensorReading("sensor_1", 1000L, 1.0))
    q.processAllAvailable()
    assert(q.isActive, s"query must survive the late-only batch: ${q.exception}")
    val rows = spark.table("asof_late").as[StreamJoins.AsOfEnriched]
      .collect().filter(_.id == "sensor_1").map(e => (e.ts, e.refTemp)).toSet
    // a fresh in-watermark probe still works after the late batch
    refs.addData(SensorReading("sensor_1", 1000000L, 20.0))
    probes.addData(SensorReading("sensor_1", 1000001L, 2.0))
    q.processAllAvailable()
    val after = spark.table("asof_late").as[StreamJoins.AsOfEnriched]
      .collect().filter(_.id == "sensor_1").map(e => (e.ts, e.refTemp)).toSet
    q.stop()
    assert(rows == Set(), s"watermark-late rows are dropped under TTL mode: $rows")
    assert(after == Set((1000001L, Some(20.0))),
      s"in-watermark traffic unaffected after the late batch: $after")
  }

  test("watermark-exact as-of equals the batch twin under shuffled multi-batch arrival") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val probes = MemoryStream[SensorReading]
    val refs = MemoryStream[SensorReading]
    val out = StreamJoins.asofEnrichExact(probes.toDS(), refs.toDS(),
      watermarkDelay = "5 seconds")
    val q = out.writeStream.format("memory").queryName("asof_exact")
      .outputMode("append").start()

    // arrival order deliberately violates event-time order ACROSS batches:
    // the refs that win for the batch-1 probes only arrive in batch 2
    // (inside the watermark envelope) — the processing-time asofEnrich
    // would enrich s1@5000 with the stale ref@1000; the exact variant must
    // retro-enrich with ref@4000 like the batch operator.
    refs.addData(SensorReading("sensor_1", 1000L, 10.0))
    probes.addData(
      SensorReading("sensor_1", 5000L, 1.0),
      SensorReading("sensor_1", 8000L, 2.0),
      SensorReading("sensor_2", 5000L, 3.0))
    q.processAllAvailable() // watermark after: 8000 - 5000 = 3000
    refs.addData(
      SensorReading("sensor_1", 4000L, 40.0),  // late-arriving winner, ts > wm
      SensorReading("sensor_2", 4500L, 45.0))
    probes.addData(SensorReading("sensor_1", 12000L, 4.0))
    q.processAllAvailable() // watermark: 7000 — finalizes the ts<=7000 probes
    probes.addData(SensorReading("sensor_9", 100000L, 0.0))
    q.processAllAvailable() // watermark: 95000 — timers flush ts <= 95000
    probes.addData(SensorReading("sensor_8", 200000L, 0.0))
    q.processAllAvailable() // watermark: 195000 — flushes sensor_9 too

    // sensor_8 is the flush sentinel: still in-flight (wm never passes it)
    val got = spark.table("asof_exact").as[StreamJoins.AsOfEnriched]
      .collect().filter(_.id != "sensor_8").map(e => (e.id, e.ts, e.refTs, e.refTemp)).toSet
    q.stop()
    // the batch twin computed directly: latest same-key ref with ts <= probe ts
    val allRefs = Seq(("sensor_1", 1000L, 10.0), ("sensor_1", 4000L, 40.0),
      ("sensor_2", 4500L, 45.0))
    val allProbes = Seq(("sensor_1", 5000L), ("sensor_1", 8000L),
      ("sensor_2", 5000L), ("sensor_1", 12000L), ("sensor_9", 100000L))
    val expected = allProbes.map { case (id, pts) =>
      val best = allRefs.filter(r => r._1 == id && r._2 <= pts).map(r => (r._2, r._3))
      if (best.isEmpty) (id, pts, None, None)
      else (id, pts, Some(best.max._1), Some(best.max._2))
    }.toSet
    assert(got == expected, s"exact batch semantics:\n got $got\n expected $expected")
  }

  test("watermark-exact as-of: TTL composes — eviction never beats a pending probe") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val probes = MemoryStream[SensorReading]
    val refs = MemoryStream[SensorReading]
    val out = StreamJoins.asofEnrichExact(probes.toDS(), refs.toDS(),
      watermarkDelay = "5 seconds", ttlMs = 5000L)
    val q = out.writeStream.format("memory").queryName("asof_exact_ttl")
      .outputMode("append").start()

    refs.addData(SensorReading("sensor_1", 1000L, 10.0))
    probes.addData(SensorReading("sensor_1", 2000L, 1.0))
    q.processAllAvailable()
    // the watermark jump finalizes the pending probe FIRST (its timer is
    // nearer), then the idle key ages out via the TTL timer
    probes.addData(SensorReading("sensor_9", 1000000L, 0.0))
    q.processAllAvailable()
    probes.addData(SensorReading("sensor_8", 1010000L, 0.0))
    q.processAllAvailable()
    // post-eviction probe on sensor_1: state is gone -> None
    probes.addData(SensorReading("sensor_1", 1008000L, 2.0))
    q.processAllAvailable()
    probes.addData(SensorReading("sensor_8", 1020000L, 0.0))
    q.processAllAvailable()
    val got = spark.table("asof_exact_ttl").as[StreamJoins.AsOfEnriched]
      .collect().filter(_.id == "sensor_1").map(e => (e.ts, e.refTemp)).toSet
    q.stop()
    assert(got == Set((2000L, Some(10.0)), (1008000L, None)),
      s"pending probe enriched before eviction, post-eviction probe None: $got")
  }
}
