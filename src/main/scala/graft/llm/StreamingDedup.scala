package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A document event on the ingest stream. */
case class DocEvent(doc_id: Long, timestamp: Long, text: String)

/** Streaming exact dedup for a document ingest pipeline: the streaming twin
  * of `dd_exact` (graft.llm.DedupQueries).
  *
  * `dropDuplicatesWithinWatermark` keys state on the content hash and lets
  * the event-time watermark bound it: a duplicate arriving within the delay
  * is dropped; once the watermark passes a hash's eviction point its state
  * is freed and a much-later recurrence is treated as new. That trade-off
  * (bounded state, windowed uniqueness) is exactly what a 100 TB/day ingest
  * needs — global-forever uniqueness would grow state without bound and is
  * the batch job's (`dd_exact`) responsibility instead.
  */
object StreamingDedup {

  def dedupExactStream(docs: Dataset[DocEvent], delay: String = "10 seconds"): DataFrame =
    docs.toDF()
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming NEAR-dup suppression — possible only because the simhash
    * signature is a row-local projection (`simhash_sig`, see
    * `graft/functions/SigExpressions.scala`): the aggregate-based signature
    * formulation would need a per-doc groupBy, which a streaming plan
    * can't interpose before dedup. Here each document folds to its 32-bit
    * simhash in the projection and `dropDuplicatesWithinWatermark` keys
    * state on the signature: near-identical texts (which by simhash's
    * design collide exactly) are suppressed within the watermark. Hamming
    * tolerance beyond exact signature equality stays the batch job's
    * responsibility (`dd_simhash` verifies with bit_count(xor)); this is
    * the standard ingest-side guard in front of it. */
  def dedupNearStream(docs: Dataset[DocEvent], delay: String = "10 seconds",
      shingleLen: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.toDF()
      .filter(length(col("text")) >= shingleLen)
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withColumn("simhash", expr(s"simhash_sig(rolling_hash(text, $shingleLen))"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("simhash")
  }
}
