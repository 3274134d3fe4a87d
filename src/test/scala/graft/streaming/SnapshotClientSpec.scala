package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** K6 cross-process queryable state: the producer streams a complete-mode
  * aggregate into a parquet snapshot dir; the client reads it with the bare
  * parquet-hadoop reader (no SparkSession) — the two sides share only the
  * directory, exactly like the reference's network QueryableStateClient
  * shares only the job's address.
  */
class SnapshotClientSpec extends SparkSpec {

  test("K6 — external client polls a live streaming aggregate without a session") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("snap").resolve("state").toString
    val cp = Files.createTempDirectory("snap_cp").toString
    val in = MemoryStream[(String, Double)]
    val agg = in.toDF().toDF("sensor", "temp")
      .groupBy("sensor").max("temp")
      .withColumnRenamed("max(temp)", "max_temp")
    val q = Sinks.queryableSnapshot(agg, dir, cp).start()
    try {
      in.addData(("a", 10.0), ("b", 20.0))
      q.processAllAvailable()
      val snap1 = SnapshotClient.poll(dir)(_.size == 2)
      assert(snap1.map(r => r("sensor") -> r("max_temp").toDouble).toMap ==
        Map("a" -> 10.0, "b" -> 20.0))
      // state refines while the query runs; the client sees the new value
      in.addData(("a", 99.0), ("c", 5.0))
      q.processAllAvailable()
      val snap2 = SnapshotClient.poll(dir)(_.size == 3)
      assert(snap2.map(r => r("sensor") -> r("max_temp").toDouble).toMap ==
        Map("a" -> 99.0, "b" -> 20.0, "c" -> 5.0))
      // typed read: parquet DOUBLE arrives as a Double, no string parsing
      val typed = SnapshotClient.readTyped(dir)
      assert(typed.size == 3)
      assert(typed.forall(r => r("max_temp").isInstanceOf[Double] &&
        r("sensor").isInstanceOf[String]), s"typed values: $typed")
      assert(typed.map(r => r("sensor") -> r("max_temp")).toMap ==
        Map("a" -> 99.0, "b" -> 20.0, "c" -> 5.0))
    } finally q.stop()
  }
}
