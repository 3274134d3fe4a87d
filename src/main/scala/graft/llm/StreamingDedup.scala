package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A document event on the ingest stream. */
case class DocEvent(doc_id: Long, timestamp: Long, text: String)

/** An upsert/tombstone event on the corpus-versioning stream: `text = None`
  * is a deletion tombstone for the doc_id. */
case class DocUpsert(doc_id: Long, timestamp: Long, text: Option[String])

/** One classified corpus change emitted by [[StreamingDedup.diffStream]]. */
case class DiffEvent(doc_id: Long, timestamp: Long, change_class: String)

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

  /** Per-key state of [[diffStream]]: the last content hash (None after a
    * tombstone) and the newest event time seen (drives the TTL timer). */
  case class DiffState(hash: Option[String], maxSeen: Long)

  /** Streaming corpus-versioning diff — the online twin of the batch
    * `dd_corpus_diff` snapshot audit: classify each upsert against the
    * key's last-seen content hash as `added` (never seen / seen only as a
    * tombstone), `changed` (hash differs), `unchanged` (hash equal), or
    * `removed` (tombstone for a live doc). A tombstone for an unknown
    * doc_id emits nothing — the batch twin has no row for it either.
    *
    * Replaying snapshot A then snapshot B (tombstones for B's deletions)
    * and keeping each key's LAST emission reproduces the batch query's
    * classification exactly — spec-pinned (`StreamingDedupSpec`).
    *
    * State is one 32-char hash per live doc_id: constant bytes per key, so
    * total state tracks the live-corpus key count, not the stream length.
    * `ttlMs > 0` bounds even that under key churn: an event-time timer
    * (the P4 pattern, watermark-clamped) evicts keys idle for ttlMs, after
    * which a re-crawled doc classifies as `added` again — the same
    * windowed-knowledge trade `dedupExactStream` makes. Rows within a
    * micro-batch process in (ts, tombstone-last) order so an upsert and
    * its same-ts deletion resolve deterministically. */
  def diffStream(ups: Dataset[DocUpsert], ttlMs: Long = 0L,
      watermarkDelay: String = "10 seconds"): Dataset[DiffEvent] = {
    val spark = ups.sparkSession
    import spark.implicits._
    val routed =
      if (ttlMs <= 0L) ups
      else ups.toDF() // EventTimeTimeout needs a watermark
        .withColumn("ets", timestamp_millis(col("timestamp")))
        .withWatermark("ets", watermarkDelay)
        .as[DocUpsert]
    val timeout =
      if (ttlMs <= 0L) GroupStateTimeout.NoTimeout else GroupStateTimeout.EventTimeTimeout
    routed.groupByKey(_.doc_id)
      .flatMapGroupsWithState[DiffState, DiffEvent](OutputMode.Append, timeout) {
        (id, rows, state: GroupState[DiffState]) =>
          if (ttlMs > 0L && state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(DiffState(None, Long.MinValue))
            val out = Seq.newBuilder[DiffEvent]
            rows.toSeq.sortBy(r => (r.timestamp, r.text.isEmpty)).foreach { r =>
              (r.text, st.hash) match {
                case (Some(t), prev) =>
                  val h = md5Hex(t)
                  val cls =
                    if (prev.isEmpty) "added"
                    else if (prev.contains(h)) "unchanged"
                    else "changed"
                  out += DiffEvent(id, r.timestamp, cls)
                  st = DiffState(Some(h), math.max(st.maxSeen, r.timestamp))
                case (None, Some(_)) =>
                  out += DiffEvent(id, r.timestamp, "removed")
                  st = DiffState(None, math.max(st.maxSeen, r.timestamp))
                case (None, None) => // tombstone for an unknown doc: no-op
                  st = st.copy(maxSeen = math.max(st.maxSeen, r.timestamp))
              }
            }
            state.update(st)
            // watermark-clamped timer: see asofEnrich — an all-late batch
            // must not arm a timer at-or-below the current watermark
            if (ttlMs > 0L) state.setTimeoutTimestamp(
              math.max(st.maxSeen + ttlMs, state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
  }

  /** Hex MD5 matching Spark's `md5()` / DuckDB's `md5()` (lowercase hex of
    * the UTF-8 bytes) — keeps the stream's hash comparable with the batch
    * twin's. */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}
