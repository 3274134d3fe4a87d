package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** An incoming similarity query on the serving stream. */
case class QueryVec(query_id: Long, timestamp: Long, embedding: Array[Float])

/** One incoming corpus vector on the index-maintenance stream. */
case class VecEvent(vec_id: Long, timestamp: Long, embedding: Array[Float])

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

  /** [[serve]] with FRESHNESS: each query batch is answered from the
    * staged PQ index UNION the delta directory [[annIndexStream]] is
    * appending to — a vector ingested seconds ago is searchable without
    * waiting for the next index build. The delta read goes through the
    * sink directory's `_spark_metadata` commit log (a batch read over a
    * file-sink path honors it automatically), so an uncommitted in-flight
    * file is never served; fresh members of the probed cell score by
    * exact quantized L2 in the same units as the base's ADC sums (see
    * `pqServeQueries`' delta note). `Publish.compact`-then-rebuild retires
    * the delta; an absent/empty delta dir serves base-only. */
  def serveWithDelta(queries: Dataset[QueryVec], corpusDir: String,
      deltaDir: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      checkpoint: Option[String] = None)
      (sink: DataFrame => Unit): StreamingQuery = {
    val s = queries.sparkSession
    graft.functions.GraftFunctions.register(s)
    // The empty-delta steady state must not pay a Spark job per micro-batch
    // just to learn the delta is still empty: probe with a driver-side FS
    // listing (a metadata op, no job), and MEMOIZE once non-empty — a delta
    // only grows until compaction retires it, and compaction is a serve
    // restart (new corpus version), so the flag never needs to flip back.
    // A listed-but-uncommitted in-flight file makes the probe true early;
    // the actual read still goes through the `_spark_metadata` commit log,
    // so at worst one batch unions an empty frame (never a wrong result).
    var deltaSeen = false
    val w0 = queries.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val idx = s.table(SimilarityQueries.stagePqIndex(s, corpusDir))
        val q = batch.select(col("query_id"),
          expr(s"vector_quantize(embedding, ${SimilarityQueries.pqScale})").as("xq"))
        if (!deltaSeen) deltaSeen = dirHasDataFiles(s, deltaDir)
        val delta =
          if (!deltaSeen) None // absent/empty delta dir: serve base-only
          else scala.util.Try { // _spark_metadata-aware sink read
            s.read.parquet(deltaDir).select(col("vec_id"), col("cell"),
              expr(s"vector_quantize(embedding, ${SimilarityQueries.pqScale})").as("xq"))
          }.toOption // a race with the first commit degrades to base-only
        sink(SimilarityQueries.pqServeQueries(s, corpusDir,
          idx.filter(col("kind") === "cb").select("s", "cid", "carr"),
          idx.filter(col("kind") === "code").select("vec_id", "s", "code"),
          idx.filter(col("kind") === "ccent").select("label", "carr"),
          q, selfExclude = false, delta = delta))
      }
    val w1 = trigger.fold(w0)(w0.trigger)
    checkpoint.fold(w1)(c => w1.option("checkpointLocation", c)).start()
  }

  /** Driver-side emptiness probe for a file-sink delta directory: true iff
    * the directory exists and holds at least one non-hidden, non-metadata
    * data file. Pure Hadoop-FS metadata — no Spark job, cluster-correct on
    * any FileSystem (the point: a high-frequency serve trigger must not
    * schedule work per batch in the empty-delta steady state). */
  private[llm] def dirHasDataFiles(s: org.apache.spark.sql.SparkSession,
      dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) false
    else {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".") && f.getLen > 0 &&
            !f.getPath.toString.contains("/_spark_metadata/")) found = true
      }
      found
    }
  }

  /** Streaming ANN index MAINTENANCE — [[serve]]'s ingest-side complement:
    * new corpus vectors route to their IVF cell against the SAME staged
    * centroid table the serve path reads, then append CELL-PARTITIONED to
    * a delta-index directory through the file sink's commit log —
    * exactly-once to any `_spark_metadata`-aware reader (the Publish
    * machinery; `Publish.compact` folds the delta into the next index
    * build, and serving reads base ∪ delta until then).
    *
    * The routing is a STATELESS row-local projection — no
    * aggregation, no watermark, no state store: the k-row centroid table
    * folds to a ONE-ROW struct array (a no-grouping aggregate — the
    * provably-constant broadcast build), and each vector's argmax-cosine
    * cell is a [[routeToCells]] greatest() chain of k codegen `vector_dot`
    * terms, identical rule and (cos DESC, label ASC) tie order to the
    * sim_ivf query router (spec-pinned against the batch twin). The
    * centroid table is PINNED — the batch-train/stream-serve stance: a
    * re-train is a corpus-version event (new fingerprint) that restarts
    * maintenance, never an in-stream drift. */
  def annIndexStream(vecs: Dataset[VecEvent], corpusDir: String, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val s = vecs.sparkSession
    graft.functions.GraftFunctions.register(s)
    val cents = s.table(SimilarityQueries.stageIvfCentroids(s, corpusDir))
      .select(col("label"), col("c"))
    routeToCells(vecs.toDF(), cents)
      .writeStream.format("parquet")
      .partitionBy("cell")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
  }

  /** The routing projection shared by [[annIndexStream]] and its batch
    * parity twin: (vec_id, timestamp, embedding, cell) with `cell` the
    * nearest centroid by cosine, (cos DESC, label ASC) tie order — the
    * sim_ivf routing rule as a row-local expression. k comes from one
    * count of the k-row centroid table (a bounded metadata-scale action,
    * not a data collect); the k `vector_dot` terms are all codegen. For a
    * k ∝ N (scaled) index the flat greatest() chain stops fitting — the
    * two-level coarse routing (SimilarityQueries.assignTwoLevel's shape)
    * is the documented swap, exactly as on the batch side. */
  private[llm] def routeToCells(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val k = cents.count().toInt
    require(k >= 1, "empty centroid table")
    // zero-norm guard (ANSI mode turns x/0 into a runtime error, and an
    // all-zero vector is a legitimate hostile input to an ingest stream):
    // a zero vector/centroid scores cos = 0 against everything, so the
    // tie order alone routes it — deterministically to the lowest label
    val safeNorm = "case when vector_dot(%s, %s) = 0D then 1.0D else sqrt(vector_dot(%s, %s)) end"
    val centsRow = cents
      .select(struct(col("label").cast("int").as("label"), col("c"),
        expr(safeNorm.format("c", "c", "c", "c")).as("cn")).as("cell"))
      .agg(expr("array_sort(collect_list(cell))").as("cells"))
    val terms = (1 to k).map { i =>
      s"struct(vector_dot(v, element_at(cells, $i).c) / (vn * element_at(cells, $i).cn) AS cos, " +
        s"-element_at(cells, $i).label AS nl)"
    }
    val best = if (k == 1) terms.head else s"greatest(${terms.mkString(", ")})"
    vecs
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("vn",
        expr("case when vector_dot(v, v) = 0D then 1.0D else sqrt(vector_dot(v, v)) end"))
      .crossJoin(broadcast(centsRow)) // 1-row struct-array: constant by construction
      .withColumn("cell", expr(s"-(($best).nl)").cast("int"))
      .select(col("vec_id"), col("timestamp"), col("embedding"), col("cell"))
  }
}
