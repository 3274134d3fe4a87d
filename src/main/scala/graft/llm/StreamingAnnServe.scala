package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** An incoming similarity query on the serving stream. */
case class QueryVec(query_id: Long, timestamp: Long, embedding: Array[Float])

/** Real-time vector-search serving — the ONLINE consumer of the staged
  * IVF-PQ index (the shape a retrieval endpoint runs: queries arrive as a
  * stream, the index is a versioned on-disk artifact).
  *
  * Each micro-batch of queries is served by the BATCH `pqServeQueries`
  * plan against the fingerprinted staged index, via `foreachBatch` — the
  * standard Structured Streaming pattern when per-batch logic needs
  * operators a continuous plan can't host (the per-query rank window).
  * This is deliberately NOT a stateful stream: serving holds no state at
  * all — the index is the state, adopted once per process by the
  * StagedTable memo and validated by fingerprint, so an index rebuild is
  * a corpus-version event, never a serving-job restart.
  *
  * Scale shape per batch: query routing against the k-row centroid
  * table, a |Q|·M·k LUT, and ONE probed cell's 8-byte codes — the
  * corpus appears only as codes, never as vectors.
  */
object StreamingAnnServe {

  /** Start serving `queries` against the staged index for `corpusDir`;
    * each micro-batch's results — (query_id, neighbor_id, adist), top-k
    * per query — are handed to `sink`. */
  def serve(queries: Dataset[QueryVec], corpusDir: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      checkpoint: Option[String] = None)
      (sink: DataFrame => Unit): StreamingQuery = {
    val s = queries.sparkSession
    graft.functions.GraftFunctions.register(s)
    val w0 = queries.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val idx = s.table(SimilarityQueries.stagePqIndex(s, corpusDir))
        val q = batch.select(col("query_id"),
          expr(s"vector_quantize(embedding, ${SimilarityQueries.pqScale})").as("xq"))
        sink(SimilarityQueries.pqServeQueries(s, corpusDir,
          idx.filter(col("kind") === "cb").select("s", "cid", "carr"),
          idx.filter(col("kind") === "code").select("vec_id", "s", "code"),
          idx.filter(col("kind") === "ccent").select("label", "carr"),
          q, selfExclude = false))
      }
    val w1 = trigger.fold(w0)(w0.trigger)
    checkpoint.fold(w1)(c => w1.option("checkpointLocation", c)).start()
  }
}
