package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.core.{Alert, SensorReading, SmokeLevel, SmokeLevelReading}

/** P6 — RaiseAlertFlatMap (`chapter5/MultiStreamTransformations.scala:77-91`)
  * streaming wiring: the latest broadcast smoke level gates per-batch
  * temperature alerts across micro-batches. */
class MultiStreamSpec extends SparkSpec {

  test("P6 smokeAlertsStream gates alerts on the latest smoke level across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val readings = MemoryStream[SensorReading]
    val smoke = MemoryStream[SmokeLevelReading]
    val got = new ConcurrentLinkedQueue[Alert]()
    val q = MultiStream.smokeAlertsStream(readings.toDS(), smoke.toDS(), 100.0) {
      (alerts, _) => alerts.collect().foreach(got.add)
    }.start()

    // smoke Low: hot reading must NOT alert
    smoke.addData(SmokeLevelReading(SmokeLevel.Low, 1000L))
    q.processAllAvailable()
    readings.addData(SensorReading("sensor_1", 2000L, 150.0))
    q.processAllAvailable()
    assert(got.isEmpty, "no alert while smoke is Low")

    // smoke High arrives; the level persists across later batches
    smoke.addData(SmokeLevelReading(SmokeLevel.High, 3000L))
    q.processAllAvailable()
    readings.addData(SensorReading("sensor_1", 4000L, 150.0), // alert
      SensorReading("sensor_2", 4000L, 50.0)) // below threshold: no alert
    q.processAllAvailable()
    readings.addData(SensorReading("sensor_3", 5000L, 200.0)) // still High: alert
    q.processAllAvailable()
    q.stop()

    val msgs = got.toArray(Array.empty[Alert]).map(_.message).toSet
    assert(msgs == Set("Risk of fire! sensor_1", "Risk of fire! sensor_3"))
  }

  test("P6 smokeAlertsBatch cross-joins the broadcast latest level") {
    import spark.implicits._
    val readings = Seq(
      SensorReading("sensor_1", 1000L, 150.0),
      SensorReading("sensor_2", 1000L, 50.0)).toDS()
    val smoke = Seq(
      SmokeLevelReading(SmokeLevel.Low, 500L),
      SmokeLevelReading(SmokeLevel.High, 900L)).toDS() // latest wins
    val alerts = MultiStream.smokeAlertsBatch(readings, smoke, 100.0).collect()
    assert(alerts.map(_.message).toSet == Set("Risk of fire! sensor_1"))
  }
}
