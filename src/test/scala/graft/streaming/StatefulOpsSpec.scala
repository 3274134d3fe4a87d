package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.SparkSpec
import graft.core.{SensorReading, Switch, ThresholdUpdate}

class StatefulOpsSpec extends SparkSpec {
  import TestStreams._

  test("P1 temperatureAlerts fires on jumps > threshold, across batches") {
    implicit val s = spark
    import spark.implicits._
    val (mem, q, name) = runOp("p1", st =>
      StatefulOps.temperatureAlerts(st.toDS(), threshold = 1.7))
    mem.addData(SensorReading("sensor_1", 1000L, 50.0),
      SensorReading("sensor_1", 2000L, 50.5), // diff 0.5: no alert
      SensorReading("sensor_1", 3000L, 53.0), // diff 2.5: alert
      SensorReading("sensor_2", 1000L, 80.0)) // first reading: no alert
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_2", 2000L, 70.0)) // diff 10 across batches
    q.processAllAvailable()
    val rows = spark.table(name).as[(String, Double, Double)].collect().toSet
    q.stop()
    assert(rows == Set(("sensor_1", 53.0, 2.5), ("sensor_2", 70.0, 10.0)))
  }

  test("P4 selfCleaningAlerts alerts like P1 and drops state after TTL") {
    implicit val s = spark
    import spark.implicits._
    val (mem, q, name) = runOp("p4", st =>
      StatefulOps.selfCleaningAlerts(st.toDS(), threshold = 1.7, ttlMs = 1000L,
        watermarkDelay = "0 seconds"))
    mem.addData(SensorReading("sensor_1", 1000L, 50.0),
      SensorReading("sensor_1", 1100L, 53.0))
    q.processAllAvailable()
    // event time jumps far past TTL: sensor_1's cleanup timer fires once the
    // watermark passes (needs one more batch for the wm to take effect),
    // state removed → the next sensor_1 reading is a "first" (no alert)
    mem.addData(SensorReading("sensor_2", 100000L, 10.0))
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_2", 100001L, 10.0))
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 101000L, 99.0))
    q.processAllAvailable()
    val rows = spark.table(name).as[(String, Double, Double)].collect().toSet
    q.stop()
    assert(rows == Set(("sensor_1", 53.0, 3.0)))
  }

  test("P5 gatedReadings forwards only while the switch holds the gate open") {
    implicit val s = spark
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val readings = MemoryStream[SensorReading]
    val switches = MemoryStream[Switch]
    val out = StatefulOps.gatedReadings(readings.toDS(), switches.toDS())
    val q = out.writeStream.format("memory").queryName("p5_out")
      .outputMode("append").start()
    readings.addData(SensorReading("sensor_1", 1000L, 20.0)) // gate closed
    q.processAllAvailable()
    switches.addData(Switch("sensor_1", 60000L), // open for 60s
      Switch("sensor_3", 1L)) // open for 1ms — expired by the next batch
    q.processAllAvailable()
    Thread.sleep(50) // let sensor_3's 1ms gate lapse in wall-clock time
    readings.addData(SensorReading("sensor_1", 2000L, 21.0), // forwarded
      SensorReading("sensor_2", 2000L, 22.0), // no switch: dropped
      SensorReading("sensor_3", 2000L, 23.0)) // gate expired: dropped
    q.processAllAvailable()
    val rows = spark.table("p5_out").as[SensorReading].collect().toSet
    q.stop()
    assert(rows == Set(SensorReading("sensor_1", 2000L, 21.0)))
  }

  test("P3 temperatureIncreaseWarnings alerts under continuous rising input") {
    implicit val s = spark
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val out = StatefulOps.temperatureIncreaseWarnings(mem.toDS(), riseMs = 300L)
    val q = out.writeStream.format("memory").queryName("p3_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    // CAUTION: a ProcessingTimeTimeout operator makes the engine construct
    // a batch every trigger (shouldRunAnotherBatch is unconditionally true),
    // so `noNewData` is never signaled and processAllAvailable() BLOCKS
    // FOREVER — the round-1 suite wedge. Tests of such queries must poll
    // the sink instead.
    def awaitAlerts(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("p3_out").count() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
    }
    // rising pair arms the deadline; a strictly falling sensor never arms
    mem.addData(SensorReading("sensor_1", 1000L, 50.0),
      SensorReading("sensor_1", 2000L, 51.0),
      SensorReading("sensor_2", 1000L, 80.0),
      SensorReading("sensor_2", 2000L, 70.0),
      SensorReading("sensor_2", 3000L, 69.0))
    Thread.sleep(500) // let sensor_1's 300ms deadline lapse
    // STILL rising: a chatty key never reaches the hasTimedOut branch, so
    // the data branch must honor the expired deadline (the ADVICE defect)
    mem.addData(SensorReading("sensor_1", 3000L, 52.0))
    awaitAlerts(1)
    val alerts = spark.table("p3_out").as[(String, Long)].collect()
    q.stop()
    assert(alerts.nonEmpty, "expected a monotone-rise alert")
    assert(alerts.forall(_._1.contains("sensor_1")),
      s"only the rising sensor may alert, got ${alerts.mkString(", ")}")
  }

  test("P7 updatableAlerts applies per-key streamed thresholds incl. removal") {
    implicit val s = spark
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val readings = MemoryStream[SensorReading]
    val thresholds = MemoryStream[ThresholdUpdate]
    val out = StatefulOps.updatableAlerts(readings.toDS(), thresholds.toDS())
    val q = out.writeStream.format("memory").queryName("p7_out")
      .outputMode("append").start()
    thresholds.addData(ThresholdUpdate("sensor_1", 2.0))
    q.processAllAvailable()
    readings.addData(SensorReading("sensor_1", 1000L, 50.0),
      SensorReading("sensor_2", 1000L, 50.0))
    q.processAllAvailable()
    readings.addData(SensorReading("sensor_1", 2000L, 55.0), // diff 5 > 2: alert
      SensorReading("sensor_2", 2000L, 99.0)) // no threshold: silent
    q.processAllAvailable()
    thresholds.addData(ThresholdUpdate("sensor_1", 0.0)) // remove config
    q.processAllAvailable()
    readings.addData(SensorReading("sensor_1", 3000L, 5.0)) // would alert, removed
    q.processAllAvailable()
    val rows = spark.table("p7_out").as[(String, Double, Double)].collect().toSet
    q.stop()
    assert(rows == Set(("sensor_1", 55.0, 5.0)))
  }

  test("P8 highTempCounts emits cumulative per-key counts") {
    implicit val s = spark
    import spark.implicits._
    val (mem, q, name) = runOp("p8", st =>
      StatefulOps.highTempCounts(st.toDS(), threshold = 100.0))
    mem.addData(SensorReading("sensor_1", 1000L, 101.0),
      SensorReading("sensor_1", 2000L, 102.0),
      SensorReading("sensor_2", 1000L, 99.0))
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 3000L, 103.0))
    q.processAllAvailable()
    val rows = spark.table(name).as[(String, Long)].collect().toSet
    q.stop()
    assert(rows == Set(("sensor_1", 2L), ("sensor_1", 3L)))
  }
}

/** Helpers to wire MemoryStream → operator → memory sink. */
object TestStreams {
  def runOp[O](name: String,
      f: MemoryStream[SensorReading] => org.apache.spark.sql.Dataset[O])(
      implicit spark: org.apache.spark.sql.SparkSession)
      : (MemoryStream[SensorReading], StreamingQuery, String) = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val sink = s"${name}_out"
    val q = f(mem).writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    (mem, q, sink)
  }
}
