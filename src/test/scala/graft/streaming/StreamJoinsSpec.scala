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
}
