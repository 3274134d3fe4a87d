package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The sessionizer's per-user counter lives in checkpointed state: a
  * session closed BEFORE a restart must make the next session after the
  * restart number 2, not 1 — global numbering is the contract that makes
  * the stream equal the batch rollup. */
class SessionStreamRestartSpec extends SparkSpec {

  private val M = 60L * 1000
  private val B = 24 * 60 * M

  private def tmpDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  test("sessionStream: session numbering survives a query restart from checkpoint") {
    val spark0 = spark
    import spark0.implicits._
    val in = tmpDir("sess_in"); val out = tmpDir("sess_sink").resolve("data")
    val ckpt = tmpDir("sess_ckpt")

    def writeFile(name: String, events: Seq[UserEvent]): Unit =
      events.toDF().coalesce(1).write.parquet(in.resolve(name).toString)

    def run(): Unit = {
      val src = spark.readStream
        .schema(StructType(Seq(StructField("user_id", LongType),
          StructField("timestamp", LongType), StructField("event_type", StringType))))
        .option("maxFilesPerTrigger", 1)
        .parquet(in.toString + "/*/")
        .as[UserEvent]
      val q = SessionStream.sessionStream(src, delay = "10 minutes")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[SessionRecord], _: Long) =>
          df.write.mode("append").parquet(out.toString): Unit
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // RUN 1: user 1's first session (0-10 min) plus a watermark-driver user
    // at +200/+201 min — the second file's batch runs AFTER the watermark
    // passed 10 min + gap + delay, so session 1 closes and EMITS before the
    // restart, committing nextSid = 2 into the checkpoint
    writeFile("f1", Seq(UserEvent(1L, B + 0 * M, "view"),
      UserEvent(1L, B + 5 * M, "click"), UserEvent(1L, B + 10 * M, "view"),
      UserEvent(2L, B + 7 * M, "signup"), UserEvent(777L, B + 200 * M, "view")))
    writeFile("f2", Seq(UserEvent(777L, B + 201 * M, "view")))
    run()
    val afterRun1 = spark.read.parquet(out.toString)
      .filter(col("user_id") === 1L).count()
    assert(afterRun1 == 1L, s"session 1 must close before the restart (got $afterRun1 rows)")

    // RUN 2 (restart): user 1 returns at +240 min — a NEW session that must
    // be numbered 2 from the RECOVERED counter; the sentinel closes it
    writeFile("f3", Seq(UserEvent(1L, B + 240 * M, "view")))
    writeFile("f4", Seq(UserEvent(888L, B + 100000 * M, "view")))
    run()

    val got = spark.read.parquet(out.toString)
      .filter(col("user_id").isin(1L, 2L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val us = (m: Long) => (B + m * M) * 1000L
    assert(got.keySet == Set((1L, 1L), (1L, 2L), (2L, 1L)), s"sessions: ${got.keySet}")
    assert(got((1L, 1L)) == ((3L, us(0), us(10))), s"s1: ${got((1L, 1L))}")
    assert(got((1L, 2L)) == ((1L, us(240), us(240))),
      s"post-restart session must number 2: ${got((1L, 2L))}")
    assert(got((2L, 1L)) == ((1L, us(7), us(7))), s"u2 singleton: ${got((2L, 1L))}")
  }
}
