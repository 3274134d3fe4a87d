package graft.streaming

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Real-JDBC fidelity against embedded Derby (the exact DBMS the reference
  * uses): the dimension-join enrichment reads through `spark.read.jdbc` and
  * the upsert sink writes through per-partition JDBC connections — no
  * parquet stand-ins on either side.
  */
class JdbcSpec extends SparkSpec {

  private def derbyUrl(name: String): String = {
    val dir = Files.createTempDirectory("derby").resolve(name)
    s"jdbc:derby:$dir;create=true"
  }

  test("J1/J2 — spark.read.jdbc dimension join enriches facts via broadcast") {
    val url = derbyUrl("dim")
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE thresholds (sensor_id VARCHAR(16) PRIMARY KEY, threshold DOUBLE)")
    val ins = conn.prepareStatement("INSERT INTO thresholds VALUES (?, ?)")
    for ((s, t) <- Seq(("sensor_1", 40.0), ("sensor_2", 45.0), ("sensor_3", 50.0))) {
      ins.setString(1, s); ins.setDouble(2, t); ins.executeUpdate()
    }
    conn.close()
    import spark.implicits._
    val facts = Seq(("sensor_1", 42.0), ("sensor_2", 41.0), ("sensor_3", 55.0),
      ("sensor_1", 39.0)).toDF("id", "temp")
    // Derby folds unquoted identifiers to upper case
    val enriched = Jdbc.enrich(facts, url, "thresholds",
      col("id") === col("SENSOR_ID"))
      .filter(col("temp") > col("THRESHOLD"))
      .select("id", "temp")
    assert(enriched.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "dim must broadcast — the fact side never shuffles")
    assert(enriched.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
      Set(("sensor_1", 42.0), ("sensor_3", 55.0)))
  }

  private def readAll(url: String): Map[String, Double] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT sensor_id, temp FROM latest")
      val b = Map.newBuilder[String, Double]
      while (rs.next()) b += rs.getString(1) -> rs.getDouble(2)
      b.result()
    } finally conn.close()
  }

  test("K3 — JDBC upsert sink: new values overwrite, replay is a no-op") {
    val url = derbyUrl("sink")
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE latest (sensor_id VARCHAR(16) PRIMARY KEY, temp DOUBLE)")
    conn.close()
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val cp = Files.createTempDirectory("jdbc_cp").toString
    val q = Jdbc.idempotentJdbcUpsert(in.toDF().toDF("sensor_id", "temp"),
      url, "latest", Seq("sensor_id"), Seq("temp"), cp).start()
    try {
      in.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      assert(readAll(url) == Map("a" -> 1.0, "b" -> 2.0))
      in.addData(("a", 3.0), ("c", 4.0))
      q.processAllAvailable()
      assert(readAll(url) == Map("a" -> 3.0, "b" -> 2.0, "c" -> 4.0))
    } finally q.stop()
    // replay the merge step with identical values — PK overwrite, no-op
    Jdbc.upsertBatchJdbc(Seq(("a", 3.0), ("c", 4.0)).toDF("sensor_id", "temp"),
      url, "latest", Seq("sensor_id"), Seq("temp"))
    assert(readAll(url) == Map("a" -> 3.0, "b" -> 2.0, "c" -> 4.0))
  }
}
