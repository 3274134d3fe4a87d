package graft.llm

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.SparkSpec
import graft.core.Tables

/** Source-format breadth: the engine's operators are declarative plans over
  * a schema, so any Spark source feeds them — pinned by running the same
  * operator over parquet, JSON-lines, and CSV ingests of the same data and
  * requiring identical results. (The reference's only inputs are generators
  * and JDBC; file-format breadth is part of the Spark-first win.) */
class SourcesSpec extends SparkSpec {

  private def qualityRows(docs: DataFrame): Set[(Long, Int)] =
    TextQueries.withQualityKeep(docs.select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet

  test("JSON-lines and CSV ingests produce identical operator results to parquet") {
    val docs = Tables.documents(spark, sf("sf0.001")).select("doc_id", "text", "lang")
    val base = Files.createTempDirectory("graft_sources").toString

    docs.write.mode("overwrite").json(s"$base/json")
    // corpus text is words+spaces (no quoting hazards); header carries names
    docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")

    val fromJson = spark.read.schema(docs.schema).json(s"$base/json")
    val fromCsv = spark.read.schema(docs.schema)
      .option("header", "true").csv(s"$base/csv")

    val expected = qualityRows(docs)
    assert(qualityRows(fromJson) == expected, "JSON ingest diverged")
    assert(qualityRows(fromCsv) == expected, "CSV ingest diverged")
  }

  test("ORC ingest produces identical operator results to parquet") {
    // the columnar alternative a lakehouse migration actually brings:
    // same pruned-scan/pushdown properties as parquet, zero operator code
    val docs = Tables.documents(spark, sf("sf0.001")).select("doc_id", "text", "lang")
    val base = Files.createTempDirectory("graft_sources_orc").toString
    docs.write.mode("overwrite").orc(s"$base/orc")
    val fromOrc = spark.read.schema(docs.schema).orc(s"$base/orc")
    assert(qualityRows(fromOrc) == qualityRows(docs), "ORC ingest diverged")
  }
}
