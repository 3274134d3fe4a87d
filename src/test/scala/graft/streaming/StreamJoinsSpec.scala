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
}
