package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.core.SensorReading

class EventTimePipelinesSpec extends SparkSpec {

  private def readings(mem: MemoryStream[SensorReading]) = mem.toDS()

  test("W1 windowedAvg emits per-sensor window averages once watermark closes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = EventTimePipelines.windowedAvg(readings(mem), "1 second", "0 seconds")
      .writeStream.format("memory").queryName("w1_out").outputMode("append").start()
    mem.addData(
      SensorReading("sensor_1", 100L, 10.0),
      SensorReading("sensor_1", 900L, 20.0), // same 1s window → avg 15
      SensorReading("sensor_2", 500L, 30.0))
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 5000L, 1.0)) // advance watermark past 1s
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 9000L, 1.0)) // close the 5s window too
    q.processAllAvailable()
    val rows = spark.table("w1_out").as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(rows.contains(("sensor_1", 1000L, 15.0)))
    assert(rows.contains(("sensor_2", 1000L, 30.0)))
  }

  test("W4 minMaxTemp computes min+max per window without buffering") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = EventTimePipelines.minMaxTemp(readings(mem), "5 seconds", "0 seconds")
      .writeStream.format("memory").queryName("w4_out").outputMode("append").start()
    mem.addData(
      SensorReading("sensor_1", 1000L, 10.0),
      SensorReading("sensor_1", 2000L, 30.0),
      SensorReading("sensor_1", 3000L, 20.0))
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 20000L, 1.0))
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 40000L, 1.0))
    q.processAllAvailable()
    val rows = spark.table("w4_out").as[(String, Double, Double, Long)].collect().toSet
    q.stop()
    assert(rows.contains(("sensor_1", 10.0, 30.0, 5000L)))
  }

  test("W8 customWindowCounts assigns ts - ts % 30000 windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = EventTimePipelines.customWindowCounts(readings(mem))
      .writeStream.format("memory").queryName("w8_out").outputMode("update").start()
    mem.addData(
      SensorReading("sensor_1", 1000L, 1.0),
      SensorReading("sensor_1", 29999L, 1.0), // same [0, 30000) window
      SensorReading("sensor_1", 30001L, 1.0)) // next window
    q.processAllAvailable()
    val rows = spark.table("w8_out").as[(String, Long, Long)].collect().toSet
    q.stop()
    assert(rows.contains(("sensor_1", 30000L, 2L)))
    assert(rows.contains(("sensor_1", 60000L, 1L)))
  }

  test("W9 earlyFiringCounts emits early refinements then the final count (update mode)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = EventTimePipelines.earlyFiringCounts(readings(mem), sizeMs = 30000L)
      .writeStream.format("memory").queryName("w9_out").outputMode("update").start()
    // batch 1: two readings in window [0, 30000) → early firing: cnt=2
    mem.addData(SensorReading("sensor_1", 1000L, 1.0),
      SensorReading("sensor_1", 2000L, 1.0))
    q.processAllAvailable()
    // batch 2: one more in the same window → refined firing: cnt=3
    mem.addData(SensorReading("sensor_1", 3000L, 1.0))
    q.processAllAvailable()
    val rows = spark.table("w9_out").as[(String, Long, Long)].collect().toSeq
    q.stop()
    // update mode appended one row per firing: the early emission AND the
    // refinement (Flink's FIRE ... FIRE sequence at micro-batch cadence)
    assert(rows.contains(("sensor_1", 30000L, 2L)), s"early firing missing: $rows")
    assert(rows.contains(("sensor_1", 30000L, 3L)), s"refined firing missing: $rows")
  }

  test("E3 punctuated watermark approximation: frequent markers → identical windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // The reference's PunctuatedAssigner advances the watermark only on
    // sensor_1 "marker" records. When markers are at least as frequent as
    // the micro-batch cadence, withWatermark's batch-boundary envelope
    // coincides with the punctuated one: every window closes at the same
    // marker-driven points and downstream results are identical to the
    // batch (oracle) aggregation of the same data.
    val mem = MemoryStream[SensorReading]
    val q = EventTimePipelines.windowedAvg(readings(mem), "1 second", "0 seconds")
      .writeStream.format("memory").queryName("e3_out").outputMode("append").start()
    // each batch carries a sensor_1 marker whose ts drives the watermark
    mem.addData(SensorReading("sensor_2", 100L, 10.0),
      SensorReading("sensor_1", 900L, 0.0)) // marker: wm → 900
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_2", 1100L, 20.0),
      SensorReading("sensor_1", 1900L, 0.0)) // marker: wm → 1900, closes [0,1000)
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 9000L, 0.0)) // marker: closes the rest
    q.processAllAvailable()
    val rows = spark.table("e3_out").as[(String, Long, Double)].collect().toSet
    q.stop()
    // identical to the punctuated-semantics oracle: batch groupBy of all rows
    assert(rows == Set(
      ("sensor_2", 1000L, 10.0), ("sensor_1", 1000L, 0.0),
      ("sensor_2", 2000L, 20.0), ("sensor_1", 2000L, 0.0)))
  }

  test("sliding windows assign each reading to size/slide overlapping windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = EventTimePipelines.slidingAvg(readings(mem), "10 seconds", "5 seconds", "0 seconds")
      .writeStream.format("memory").queryName("slide_out").outputMode("append").start()
    mem.addData(SensorReading("sensor_1", 7000L, 10.0)) // windows [0,10s) and [5,15s)
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 60000L, 1.0)) // close both
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 120000L, 1.0))
    q.processAllAvailable()
    val rows = spark.table("slide_out").as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(rows.contains(("sensor_1", 10000L, 10.0)), s"missing [0,10s): $rows")
    assert(rows.contains(("sensor_1", 15000L, 10.0)), s"missing [5,15s): $rows")
  }

  test("session windows group readings separated by < gap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = EventTimePipelines.sessionCounts(readings(mem), "10 seconds", "0 seconds")
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    mem.addData(
      SensorReading("sensor_1", 1000L, 1.0),
      SensorReading("sensor_1", 5000L, 1.0),  // same session (gap 4s)
      SensorReading("sensor_1", 30000L, 1.0)) // new session (gap 25s)
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 100000L, 1.0)) // close sessions
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 200000L, 1.0))
    q.processAllAvailable()
    val rows = spark.table("sess_out").as[(String, Long, Long, Long)].collect().toSet
    q.stop()
    assert(rows.contains(("sensor_1", 1000L, 15000L, 2L)))
    assert(rows.contains(("sensor_1", 30000L, 40000L, 1L)))
  }
}
