package graft.batch

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkSpec

/** Partition-layout evidence: at 100 TB a corpus is laid out partitioned by
  * a coarse key (language, crawl date) so per-slice jobs read only their
  * slice. The local testdata ships unpartitioned single files, so this spec
  * stages a lang-partitioned copy once and pins that a lang-filtered query
  * (a) carries the filter as a PARTITION filter, not a data filter, and
  * (b) physically reads only that partition's files. */
class PartitionPruningSpec extends SparkSpec {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectFirst { case s: FileSourceScanExec => s }.get
  }

  test("lang-partitioned layout: slice queries prune to one partition's files") {
    val dir = java.nio.file.Files.createTempDirectory("part_docs")
    dir.toFile.deleteOnExit()
    graft.core.Tables.documents(spark, sf("sf0.01"))
      .write.mode("overwrite").partitionBy("lang").parquet(dir.toString)

    val part = spark.read.parquet(dir.toString)
    val langs = part.select("lang").distinct().count()
    assert(langs >= 3, "testdata has several languages")

    val sliced = part.filter(col("lang") === "de").select("doc_id", "n_chars")
    sliced.collect() // materialize so AQE finalizes the plan
    val scan = scanOf(sliced)
    // the lang predicate is a partition filter — it never runs per row
    assert(scan.partitionFilters.exists(_.references.map(_.name).toSeq.contains("lang")),
      s"lang must prune partitions, got partitionFilters=${scan.partitionFilters}")
    assert(!scan.dataFilters.exists(_.references.map(_.name).toSeq.contains("lang")),
      s"lang must NOT appear as a per-row data filter: ${scan.dataFilters}")
    // and the scan touches only the one partition's files
    val selected = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    val allParts = scan.relation.location.listFiles(Nil, Nil)
    assert(selected.map(_.files.size).sum < allParts.map(_.files.size).sum,
      "pruned scan reads strictly fewer files than the full table")
    assert(selected.flatMap(_.files).forall(_.getPath.toString.contains("lang=de")),
      "every selected file lives under the lang=de partition")
    // column pruning rides along: only the projected columns are read
    assert(scan.requiredSchema.fieldNames.toSet == Set("doc_id", "n_chars"),
      s"ReadSchema pruned to the projection: ${scan.requiredSchema.fieldNames.toSeq}")
    // and the pruned read returns exactly the unpartitioned filter's rows
    assert(sliced.count() ==
      graft.core.Tables.documents(spark, sf("sf0.01")).filter("lang = 'de'").count())
  }
}
