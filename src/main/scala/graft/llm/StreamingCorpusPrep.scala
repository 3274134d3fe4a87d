package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The corpus-prep pipeline (llm_corpus_prep, L20) as a STREAMING job —
  * the ingest-side flavor of the batch composition: quality gate → exact
  * dedup → chunking, over a document event stream.
  *
  * Every stage is streaming-native by construction:
  *   - the quality gate is a pure projection (TextQueries.withQualityKeep),
  *     so it rides the stream unchanged;
  *   - exact dedup is `dropDuplicatesWithinWatermark` on the content hash —
  *     state bounded by the event-time watermark (windowed uniqueness; the
  *     global-forever pass stays the batch job's responsibility);
  *   - chunking is a stateless explode.
  *
  * NEAR-dup cluster keeper selection is deliberately absent: it needs the
  * candidate self-join + connected components, a multi-pass batch shape.
  * The ingest guard for that is `StreamingDedup.dedupNearStream` (row-local
  * simhash signature equality); the full clustering runs downstream on the
  * staged table (PipelineQueries.llm_cluster_stage).
  */
object StreamingCorpusPrep {

  /** (doc_id, ts, chunk_idx, chunk_hash) for surviving documents. */
  def prepStream(docs: Dataset[DocEvent], delay: String = "10 seconds"): DataFrame =
    TextQueries.withQualityKeep(docs.toDF())
      .filter(col("keep") === 1).drop("keep")
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("content_hash")
      .withColumn("pos",
        explode(expr(s"sequence(1, greatest(length(text), 1), ${TextQueries.chunkStep})")))
      .select(col("doc_id"), col("ts"),
        expr(s"cast((pos - 1) div ${TextQueries.chunkStep} as bigint)").as("chunk_idx"),
        expr(s"md5(substring(text, pos, ${TextQueries.chunkLen}))").as("chunk_hash"))
}
