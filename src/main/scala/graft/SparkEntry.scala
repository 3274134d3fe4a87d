package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.batch._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each registered query is a batch twin of a reference capability
  * (SURVEY.md §2 inventory) or a north-star LLM-pipeline operator; the
  * streaming originals live under `graft.streaming` with ScalaTest specs.
  */
object SparkEntry {

  /** All correctness-gated queries, grouped by module. */
  def allQueries: Seq[Q] =
    TransformQueries.all ++ AggQueries.all ++ JoinQueries.all ++
      FunnelQueries.all ++ StatefulTwinQueries.all ++
      graft.llm.DedupQueries.all ++ graft.llm.SimilarityQueries.all ++
      graft.llm.TextQueries.all ++ graft.llm.MultimodalQueries.all ++
      graft.llm.PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("w1_window_avg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
