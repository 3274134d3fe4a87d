package graft.streaming

import java.nio.file.Files
import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("K3 upsertBatch keeps latest row per key and is replay-idempotent") {
    val dir = Files.createTempDirectory("upsert").toString + "/target"
    val b1 = Seq(("sensor_1", 10.0), ("sensor_2", 20.0)).toDF("sensor", "temp")
    Sinks.upsertBatch(b1, Seq("sensor"), dir)
    val b2 = Seq(("sensor_1", 11.0), ("sensor_3", 30.0)).toDF("sensor", "temp")
    Sinks.upsertBatch(b2, Seq("sensor"), dir)
    Sinks.upsertBatch(b2, Seq("sensor"), dir) // replay: must not duplicate
    val rows = spark.read.parquet(dir).as[(String, Double)].collect().toMap
    assert(rows == Map("sensor_1" -> 11.0, "sensor_2" -> 20.0, "sensor_3" -> 30.0))
  }

  test("K4 walWriteBatch commits once per batchId (replay is a no-op)") {
    val dir = Files.createTempDirectory("wal").toString + "/target"
    val b = Seq(("a", 1.0)).toDF("k", "v")
    Sinks.walWriteBatch(b, 7L, dir)
    Sinks.walWriteBatch(b, 7L, dir) // same batchId: skipped
    Sinks.walWriteBatch(b, 8L, dir) // new batchId: appended
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("K6 queryable memory sink serves SQL while the query runs") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, Double)]
    val agg = mem.toDS().toDF("id", "temp").groupBy("id")
      .agg(org.apache.spark.sql.functions.max("temp").as("maxTemp"))
    val q = Sinks.queryable(agg, "max_temps").start()
    mem.addData(("sensor_1", 10.0), ("sensor_1", 30.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM max_temps").as[(String, Double)].collect().toSet
    q.stop()
    assert(rows == Set(("sensor_1", 30.0)))
  }

  test("K6 dashboard polling loop observes successive refinements (QueryableState client)") {
    // reference chapter7/QueryableState.scala:56-115 TemperatureDashboard:
    // an external client polls the queryable state every interval; here the
    // "client" is any session thread issuing SQL between micro-batches
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, Double)]
    val agg = mem.toDS().toDF("id", "temp").groupBy("id")
      .agg(org.apache.spark.sql.functions.max("temp").as("maxTemp"))
    val q = Sinks.queryable(agg, "dash_temps").start()
    def poll(): Map[String, Double] =
      spark.sql("SELECT * FROM dash_temps").as[(String, Double)].collect().toMap
    mem.addData(("sensor_1", 10.0))
    q.processAllAvailable()
    assert(poll() == Map("sensor_1" -> 10.0))
    mem.addData(("sensor_1", 25.0), ("sensor_2", 5.0))
    q.processAllAvailable()
    assert(poll() == Map("sensor_1" -> 25.0, "sensor_2" -> 5.0))
    q.stop()
  }

  test("K1 console sink starts and drains a batch (print() analog)") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, Double)]
    val q = Sinks.console(mem.toDS()).start()
    mem.addData(("sensor_1", 1.0))
    q.processAllAvailable() // output goes to stdout; green = sink accepts rows
    q.stop()
  }

  test("K2 socket sink writes each row as a line to a TCP socket") {
    import java.net.ServerSocket
    import java.util.concurrent.ConcurrentLinkedQueue
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val received = new ConcurrentLinkedQueue[String]()
    val server = new ServerSocket(0) // ephemeral port
    @volatile var closing = false
    val acceptor = new Thread(() => {
      // one connection per (epoch, partition): accept until the test closes
      try while (!closing) {
        val s = server.accept()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(s.getInputStream))
        var line = in.readLine()
        while (line != null) { received.add(line); line = in.readLine() }
        s.close()
      } catch { case _: java.net.SocketException => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    val mem = MemoryStream[(String, Double)]
    val q = Sinks.socket(mem.toDS().toDF("id", "temp"), "localhost",
      server.getLocalPort).start()
    mem.addData(("sensor_1", 10.0), ("sensor_2", 20.0))
    q.processAllAvailable()
    q.stop()
    // writer flushes on close; give the acceptor a moment to drain
    val deadline = System.currentTimeMillis() + 10000
    while (received.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    closing = true
    server.close()
    assert(received.toArray(Array.empty[String]).toSet ==
      Set("sensor_1,10.0", "sensor_2,20.0"))
  }
}
