package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Chapter-8 consistency proofs (SURVEY §5 recovery tests): kill a
  * streaming query mid-stream with [[FailingMapper]], restart it on the
  * SAME checkpoint directory, and assert exactly-once output — for the
  * built-in file sink (K5) and the foreachBatch keyed upsert (K3).
  *
  * Source: a directory of parquet files streamed one per micro-batch
  * (`maxFilesPerTrigger 1`) — offset-logged and replayable, the SS analog
  * of the reference's ResettableSensorSource.
  */
class RecoverySpec extends SparkSpec {

  private def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  /** 5 input files x 10 rows: value = fileIdx*10 + i, key = value % 5.
    * Explicit mtimes fix the file-stream batch order (the source orders by
    * modification time). */
  private def writeInput(dir: Path): Unit = {
    val spark0 = spark
    import spark0.implicits._
    (0 until 5).foreach { f =>
      val staging = dir.resolve(s"staging_$f")
      (0 until 10).map(i => (f * 10 + i).toLong).toDF("value")
        .withColumn("key", org.apache.spark.sql.functions.expr("value % 5"))
        .coalesce(1).write.parquet(staging.toString)
      val part = staging.toFile.listFiles().map(_.toPath)
        .find(_.toString.endsWith(".parquet")).get
      val dest = dir.resolve(s"f$f.parquet")
      Files.move(part, dest)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1700000000000L + f * 60000L))
    }
  }

  private def streamInput(dir: Path) = {
    import org.apache.spark.sql.types._
    spark.readStream
      .schema(StructType(Seq(
        StructField("value", LongType), StructField("key", LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/f*.parquet")
  }

  test("K5+T7 file sink is exactly-once across an injected failure and restart") {
    val spark0 = spark
    import spark0.implicits._
    val in = tmpDir("rec_in"); val out = tmpDir("rec_out").resolve("data")
    val ckpt = tmpDir("rec_ckpt")
    writeInput(in)
    FailingMapper.reset()

    def start() = {
      val mapped = FailingMapper(streamInput(in).as[(Long, Long)])(_._1 == 25L)
      Sinks.exactlyOnceFiles(mapped.toDF("value", "key"), out.toString, ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // first run dies inside the batch containing value 25
    val q1 = start()
    intercept[Exception] { q1.awaitTermination() }
    assert(FailingMapper.tripped.get, "failure should have been injected")

    // restart on the same checkpoint: the failed batch replays, commits once
    val q2 = start()
    q2.awaitTermination()

    val result = spark.read.parquet(out.toString).select("value").as[Long].collect()
    assert(result.length == 50, s"expected 50 rows exactly once, got ${result.length}")
    assert(result.toSet == (0L until 50L).toSet)
  }

  test("K3+T7 keyed upsert converges to latest-per-key across failure and restart") {
    val spark0 = spark
    import spark0.implicits._
    val in = tmpDir("ups_in"); val target = tmpDir("ups_out").resolve("table")
    val ckpt = tmpDir("ups_ckpt")
    writeInput(in)
    FailingMapper.reset()

    def start() = {
      val mapped = FailingMapper(streamInput(in).as[(Long, Long)])(_._1 == 35L)
      Sinks.idempotentUpsert(mapped.toDF("value", "key"), Seq("key"), target.toString,
          ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
    }

    val q1 = start()
    intercept[Exception] { q1.awaitTermination() }
    val q2 = start()
    q2.awaitTermination()

    // files stream in mtime order, so the last file (values 40..49) holds
    // each key's final value: key k appears at values 40+k and 45+k, and
    // the later row in the batch wins -> key k maps to 45 + k
    val rows = spark.read.parquet(target.toString)
      .select("key", "value").as[(Long, Long)].collect().toSet
    assert(rows == (0L until 5L).map(k => k -> (45L + k)).toSet)
  }

  test("K3 upsert keeps only the latest row when one batch carries duplicate keys") {
    val spark0 = spark
    import spark0.implicits._
    val target = tmpDir("dup_out").resolve("table")
    // one batch, key 1 appears twice: later row (value 7) must win
    val batch = Seq((1L, 5L), (2L, 6L), (1L, 7L)).toDF("key", "value")
    Sinks.upsertBatch(batch, Seq("key"), target.toString)
    val rows = spark.read.parquet(target.toString)
      .select("key", "value").as[(Long, Long)].collect().toSet
    assert(rows == Set(1L -> 7L, 2L -> 6L))
  }

  test("K3 upsert recovers committed keys when a crash left only the .bak dir") {
    val spark0 = spark
    import spark0.implicits._
    val base = tmpDir("bak_out"); val target = base.resolve("table")
    Sinks.upsertBatch(Seq((1L, 10L)).toDF("key", "value"), Seq("key"), target.toString)
    // simulate a crash between the two swap renames: target moved to .bak,
    // replacement never arrived
    Files.move(target, Paths.get(target.toString + ".bak"))
    Sinks.upsertBatch(Seq((2L, 20L)).toDF("key", "value"), Seq("key"), target.toString)
    val rows = spark.read.parquet(target.toString)
      .select("key", "value").as[(Long, Long)].collect().toSet
    assert(rows == Set(1L -> 10L, 2L -> 20L), "pre-crash keys must survive")
  }

  test("K5 file sink readers only see committed files (_spark_metadata)") {
    val out = tmpDir("meta_out").resolve("data")
    val ckpt = tmpDir("meta_ckpt"); val in = tmpDir("meta_in")
    writeInput(in)
    FailingMapper.reset()
    val q = Sinks.exactlyOnceFiles(streamInput(in), out.toString, ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(Files.exists(out.resolve("_spark_metadata")),
      "file sink must write its commit log")
    // drop an orphan (uncommitted) parquet file into the directory: a
    // metadata-aware read must ignore it
    val spark0 = spark
    import spark0.implicits._
    Seq(999L).toDF("value").coalesce(1).write
      .parquet(out.getParent.resolve("orphan").toString)
    val orphan = out.getParent.resolve("orphan").toFile.listFiles()
      .map(_.toPath).find(_.toString.endsWith(".parquet")).get
    Files.copy(orphan, out.resolve("part-99999-orphan.parquet"))
    val vals = spark.read.parquet(out.toString).select("value").as[Long].collect()
    assert(!vals.contains(999L), "reader must skip files outside the commit log")
    assert(vals.length == 50)
  }
}
