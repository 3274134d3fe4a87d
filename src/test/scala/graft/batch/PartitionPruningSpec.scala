package graft.batch

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import graft.SparkSpec
import graft.core.Tables

/** Partition pruning (builder brief: "partition pruning + predicate
  * pushdown on file scans — matters for the 100 TB north star"): a corpus
  * written partitioned by a filter column must be read with the partition
  * filter applied at PLANNING time, scanning only matching directories. */
class PartitionPruningSpec extends SparkSpec {

  test("lang-partitioned corpus scan prunes to the filtered partition") {
    val dir = Files.createTempDirectory("part_docs").toString + "/docs"
    Tables.documents(spark, sf("sf0.001"))
      .write.partitionBy("lang").parquet(dir)

    val q = spark.read.parquet(dir).filter(org.apache.spark.sql.functions.col("lang") === "en")
    val scan = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters in scan, got: ${scan.metadata}")
    // the pruned scan must select strictly fewer files than exist overall
    val allFiles = scan.relation.location.inputFiles.length
    val selected = scan.selectedPartitions.totalNumberOfFiles
    assert(selected < allFiles && selected > 0,
      s"pruning selected $selected of $allFiles files")
    assert(q.count() ==
      Tables.documents(spark, sf("sf0.001")).filter("lang = 'en'").count())
  }
}
