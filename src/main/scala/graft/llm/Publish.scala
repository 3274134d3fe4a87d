package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The pipeline's PUBLISH stage — the step every curation job ends with
  * and none of the analytic queries cover: write the curated corpus out
  * as a lang-partitioned, file-size-disciplined parquet dataset a trainer
  * (or the next pipeline) consumes by partition.
  *
  * Scale stance:
  *  - `repartition(lang)` puts each Hive partition's rows on the tasks
  *    that write it — without this, every task holds a writer per lang it
  *    happens to see (the small-files explosion: tasks × partitions
  *    files);
  *  - `sortWithinPartitions(lang, doc_id)` makes file contents
  *    deterministic and doc_id-clustered (parquet min/max row-group stats
  *    prune doc_id range reads downstream);
  *  - `maxRecordsPerFile` caps file size so a skewed language (en is
  *    routinely half a crawl) still splits into bounded files;
  *  - the audit summary is read back FROM THE PUBLISHED FILES, not from
  *    the input — the row a publish job logs is evidence about what
  *    landed on disk.
  *
  * At 100 TB the same plan holds: one shuffle keyed by the partition
  * column (AQE coalesces small langs), writers stream row groups, and no
  * driver-side collection ever sees the corpus.
  */
object Publish {

  /** Publish the prep survivors (quality ∧ exact-keeper ∧ near-dup-keeper,
    * `PipelineQueries.survivorsDF`) under `outDir/lang=...`. Returns the
    * read-back audit: per lang, rows / docs-with-text-bytes / file count.
    */
  def publishCurated(s: SparkSession, d: String, outDir: String,
      maxRecordsPerFile: Long = 1000000L): DataFrame = {
    val curated = PipelineQueries.survivorsDF(s, d, DedupQueries.clustersDF(s, d))
    publish(curated, outDir, maxRecordsPerFile)
  }

  /** Streaming publish — the same lang-partitioned dataset fed by an
    * ingest stream: the built-in file sink's commit log (`_spark_metadata`)
    * makes the partitioned write exactly-once across failure/restart
    * (metadata-aware readers skip uncommitted files), so the live and the
    * batch publish produce interchangeable datasets. Partition discipline
    * note: each micro-batch writes at most (its tasks × langs-it-carries)
    * files; a long-running publish stream compacts downstream with the
    * BATCH [[publish]] over the accumulated dataset (the standard
    * lambda-free compaction handoff). */
  def publishStream(docs: DataFrame, outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.format("parquet")
      .partitionBy("lang")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)

  /** The compaction handoff that retires a streaming publish's many small
    * per-batch files: read the source dataset (through its `_spark_metadata`
    * commit log when one exists — uncommitted orphans never survive
    * compaction) and re-publish it size-disciplined at a NEW location.
    * Never mutates the live dataset in place; the consumer flips to
    * `destDir` when the audit row confirms parity. */
  def compact(s: SparkSession, srcDir: String, destDir: String,
      maxRecordsPerFile: Long = 1000000L): DataFrame =
    publish(s.read.parquet(srcDir), destDir, maxRecordsPerFile)

  /** Write `docs` (must carry a `lang` column) partitioned by lang;
    * return the per-lang audit read back from the published dataset. */
  def publish(docs: DataFrame, outDir: String,
      maxRecordsPerFile: Long = 1000000L): DataFrame = {
    docs
      .repartition(col("lang"))
      .sortWithinPartitions("lang", "doc_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy("lang")
      .parquet(outDir)
    val spark = docs.sparkSession
    val back = spark.read.parquet(outDir)
    // payload schemas without a byte count (e.g. a minimal ingest stream)
    // still get the row/file audit
    (if (back.columns.contains("n_chars")) back
     else back.withColumn("n_chars", lit(0L)))
      .select(col("lang"), col("n_chars"), input_file_name().as("f"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars"),
        countDistinct(col("f")).as("n_files"))
      .orderBy("lang")
  }
}
