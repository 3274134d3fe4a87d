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
}
