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

  /** Streaming decontamination gate — tx_decontam_bloom's ingest twin: the
    * benchmark gram set rides along as a serialized bloom filter (built
    * batch-side, bounded by the eval suite), and every incoming doc is
    * flagged IN ITS OWN ROW: token 4-grams fold to the house 60-bit hash
    * and probe the bloom inside one projection — zero state, zero shuffle,
    * no watermark needed. Contract: `n_hits = 0` is DEFINITIVE clean (blooms
    * have no false negatives); `n_hits > 0` means "quarantine for the exact
    * batch-side verify" (false-positive rate = the build's fpp). The gram
    * loop runs as an interpreted higher-order function — acceptable on a
    * per-doc gate (~hundreds of probes/doc); the batch twin keeps the
    * codegen explode form for the full-corpus pass. */
  def decontamStream(docs: Dataset[DocEvent], bloomBytes: Array[Byte],
      gram: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // function name derives from the bloom's content: two concurrent
    // streams gating on different eval suites in one session must not
    // fight over a shared registry slot
    val probeFn = "graft_stream_bloom_probe_" +
      (java.util.Arrays.hashCode(bloomBytes) & Int.MaxValue)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      probeFn,
      exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bloomBytes, org.apache.spark.sql.types.BinaryType),
        exprs.head),
      "built-in")
    docs.toDF()
      .withColumn("toks", expr(s"regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .withColumn("n_hits", expr(
        s"""size(filter(
           |  transform(
           |    CASE WHEN size(toks) >= $gram THEN sequence(1, size(toks) - ${gram - 1}) ELSE array() END,
           |    i -> ${LlmHash.sparkH(s"array_join(slice(toks, i, $gram), ' ')")}),
           |  gh -> $probeFn(gh)))""".stripMargin))
      .select(col("doc_id"), col("timestamp"), col("n_hits").cast("long").as("n_hits"),
        (col("n_hits") > 0).as("quarantine"))
  }
}
