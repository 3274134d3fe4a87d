package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The publish stage against the real sf0.001 corpus: partition layout,
  * file-size cap, read-back parity with the survivor set, and
  * overwrite-idempotence. */
class PublishSpec extends SparkSpec {

  test("publish: lang partitions, bounded files, read-back parity, idempotent overwrite") {
    import spark.implicits._
    val d = sf("sf0.001")
    val out = java.nio.file.Files.createTempDirectory("publish_out").toString
    val comp = DedupQueries.clustersDF(spark, d)
    val want = PipelineQueries.survivorsDF(spark, d, comp)
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_chars").as("ch"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val cap = 20L // force multi-file langs at sf0.001 sizes
    val audit = Publish.publishCurated(spark, d, out, maxRecordsPerFile = cap)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // audit covers exactly the survivor langs with exact doc/char counts
    assert(audit.keySet == want.keySet, s"langs: ${audit.keySet} vs ${want.keySet}")
    audit.foreach { case (lang, (n, ch, files)) =>
      assert((n, ch) == want(lang), s"$lang read-back ($n, $ch) != survivors ${want(lang)}")
      // file-size discipline: enough files for the cap, and no empties
      assert(files >= (n + cap - 1) / cap, s"$lang: $n rows in $files files under cap $cap")
    }
    // physical layout is Hive-partitioned by lang
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("lang=")).toSet
    assert(dirs == want.keySet.map("lang=" + _), s"partition dirs: $dirs")
    // every file respects the record cap (read-back with per-file counts)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name()).count().select("count").as[Long].collect()
    assert(perFile.forall(_ <= cap), s"file over cap: ${perFile.max}")

    // overwrite-idempotence: a second publish lands the identical dataset
    val audit2 = Publish.publishCurated(spark, d, out, maxRecordsPerFile = cap)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(audit2.map { case (l, (n, ch, _)) => l -> ((n, ch)) } ==
      audit.map { case (l, (n, ch, _)) => l -> ((n, ch)) })
  }

  test("streaming publish is exactly-once and partitioned across an injected failure") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val in = Files.createTempDirectory("pub_in")
    val out = Files.createTempDirectory("pub_out").resolve("data")
    val ckpt = Files.createTempDirectory("pub_ckpt")
    Seq(in, out.getParent, ckpt).foreach(_.toFile.deleteOnExit())
    // 5 input files x 10 docs, one file per micro-batch (mtime-ordered)
    (0 until 5).foreach { f =>
      val staging = in.resolve(s"staging_$f")
      (0 until 10).map(i => (f * 10 + i).toLong).toDF("value")
        .withColumn("key", expr("value % 5"))
        .coalesce(1).write.parquet(staging.toString)
      val part = staging.toFile.listFiles().map(_.toPath)
        .find(_.toString.endsWith(".parquet")).get
      val dest = in.resolve(s"f$f.parquet")
      Files.move(part, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + f * 60000L))
    }
    graft.streaming.FailingMapper.reset()
    def start() = {
      import org.apache.spark.sql.types._
      val src = spark.readStream
        .schema(StructType(Seq(
          StructField("value", LongType), StructField("key", LongType))))
        .option("maxFilesPerTrigger", 1)
        .parquet(in.toString + "/f*.parquet")
      val mapped = graft.streaming.FailingMapper(src.as[(Long, Long)])(_._1 == 25L)
        .toDF("doc_id", "key")
        .select(col("doc_id"), concat(lit("l"), col("key") % 2).as("lang"))
      Publish.publishStream(mapped, out.toString, ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
    }
    val q1 = start()
    intercept[Exception] { q1.awaitTermination() }
    assert(graft.streaming.FailingMapper.tripped.get, "failure should have been injected")
    val q2 = start() // same checkpoint: failed batch replays, commits once
    q2.awaitTermination()

    assert(Files.exists(out.resolve("_spark_metadata")), "commit log present")
    val dirs = out.toFile.listFiles().map(_.getName).filter(_.startsWith("lang=")).toSet
    assert(dirs == Set("lang=l0", "lang=l1"), s"partition dirs: $dirs")
    val got = spark.read.parquet(out.toString)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(got.length == 50, s"exactly-once: got ${got.length} rows")
    assert(got.map(_._1).toSet == (0L until 50L).toSet)
    assert(got.forall { case (id, lang) => lang == s"l${id % 5 % 2}" })

    // compaction handoff: plant an uncommitted orphan in a partition dir,
    // compact to a new location — the commit-log-aware read drops the
    // orphan, rows survive exactly, and each lang collapses to one file
    val orphanSrc = Files.createTempDirectory("pub_orphan").resolve("w")
    Seq((999L, "l0")).toDF("doc_id", "lang").drop("lang")
      .coalesce(1).write.parquet(orphanSrc.toString)
    val orphan = orphanSrc.toFile.listFiles().map(_.toPath)
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(orphan, out.resolve("lang=l0").resolve("part-99999-orphan.parquet"))
    val cOut = Files.createTempDirectory("pub_compact").resolve("data")
    val cAudit = Publish.compact(spark, out.toString, cOut.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    // keys {0,2,4} -> l0 (30 docs), {1,3} -> l1 (20); the planted orphan
    // (doc 999 in lang=l0) must NOT survive the commit-log-aware read
    assert(cAudit == Seq(("l0", 30L, 1L), ("l1", 20L, 1L)),
      s"compacted audit (orphan dropped, one file per lang): $cAudit")
    val cid = spark.read.parquet(cOut.toString).select("doc_id").as[Long].collect()
    assert(cid.toSet == (0L until 50L).toSet && !cid.contains(999L))
  }
}
