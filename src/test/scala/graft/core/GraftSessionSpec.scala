package graft.core

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

import scala.jdk.CollectionConverters._

/** The session factory's scale configuration must be executed code, not a
  * comment: every entry point (Bench / Verify / Explain / TestSession) builds
  * its session here, so the RocksDB state store the factory configures is
  * what every streaming spec in this suite actually runs on. This spec pins
  * that down explicitly.
  */
class GraftSessionSpec extends SparkSpec {

  test("factory configures the RocksDB state store and the provider actually loads") {
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))

    // drive one stateful query end-to-end: dropDuplicates keeps per-key
    // state, so a green run means the RocksDB provider loaded its native
    // library and served get/put — not just that the conf string is set
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Int]
    in.addData(1, 2, 2, 3, 3, 3)
    val q = in.toDF().dropDuplicates("value")
      .writeStream.format("memory").queryName("rocksdb_dd").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM rocksdb_dd").count() == 3)
      val stateMetrics = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet().asScala)
      assert(stateMetrics.exists(_.toLowerCase.contains("rocksdb")),
        s"state operator metrics should be RocksDB's, got: $stateMetrics")
    } finally q.stop()
  }
}
