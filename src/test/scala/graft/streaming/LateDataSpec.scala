package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.core.SensorReading

class LateDataSpec extends SparkSpec {

  test("E5/E6 tagLate routes records behind the watermark to the late tag") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = LateData.tagLate(mem.toDS(), delayMs = 5000L)
      .writeStream.format("memory").queryName("late_out").outputMode("append").start()
    mem.addData(
      SensorReading("sensor_1", 10000L, 1.0),
      SensorReading("sensor_1", 20000L, 2.0))
    q.processAllAvailable()
    mem.addData(
      SensorReading("sensor_1", 19000L, 3.0), // 19000 >= 20000-5000: on time
      SensorReading("sensor_1", 1000L, 4.0))  // 1000 < 15000: late
    q.processAllAvailable()
    val rows = spark.table("late_out").as[LateData.Tagged].collect()
    q.stop()
    val late = rows.filter(_.late).map(_.timestamp).toSet
    assert(late == Set(1000L))
    assert(rows.length == 4)
  }

  test("E4 updatingWindowCounts tags first emission vs late update") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = LateData.updatingWindowCounts(mem.toDS(), windowMs = 10000L,
        delay = "5 seconds")
      .writeStream.format("memory").queryName("e4_out").outputMode("append").start()
    mem.addData(
      SensorReading("sensor_1", 1000L, 1.0),
      SensorReading("sensor_1", 2000L, 1.0))
    q.processAllAvailable()
    mem.addData(SensorReading("sensor_1", 3000L, 1.0)) // same window again
    q.processAllAvailable()
    val rows = spark.table("e4_out").as[(String, Long, Long, String)].collect().toSet
    q.stop()
    assert(rows.contains(("sensor_1", 10000L, 2L, "first")))
    assert(rows.contains(("sensor_1", 10000L, 3L, "update")))
  }

  test("splitBatch splits on max(ts) - delay") {
    import spark.implicits._
    val batch = Seq(
      SensorReading("a", 1000L, 1.0),
      SensorReading("a", 50000L, 2.0),
      SensorReading("a", 49000L, 3.0)).toDF()
    val (onTime, late) = LateData.splitBatch(batch, delayMs = 5000L)
    assert(onTime.count() == 2)
    assert(late.as[SensorReading].collect().map(_.timestamp).toSet == Set(1000L))
  }
}
