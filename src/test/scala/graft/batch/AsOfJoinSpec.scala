package graft.batch

import org.apache.spark.sql.functions.{expr, lit}
import graft.SparkSpec

/** Planted semantics for the bucket-decomposed batch as-of join (j_asof):
  * the same-bucket argmax and the cross-bucket prefix carry must agree on
  * one contract — latest (ts, event_id) reference at-or-before the probe —
  * across every path: carry-only, same-bucket-beats-carry, inclusive
  * same-instant ties resolved by event_id, refs after the probe excluded,
  * and probes with no earlier reference null-enriched. Buckets are 2 min;
  * timestamps below are chosen to land specific bucket relationships. */
class AsOfJoinSpec extends SparkSpec {

  test("j_asof: carry, same-bucket override, inclusive ties, and null enrichment") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("asof_ev")
    dir.toFile.deleteOnExit()
    val S = 1000L // ms per second
    // probes have even ids, refs odd (the query's split rule)
    val rows = Seq(
      // user 1 — ref@0s (bucket 0) then newer refs in bucket 2: probe@300s
      // shares bucket 2 and must take the LATEST at-or-before (id 5 @299s)
      (1L, 1L, 0 * S, 10.0), (2L, 1L, 300 * S, 0.0),
      // ref@290s beats the bucket-0 carry for probe@295s; ref@299s is
      // after that probe and must not apply to it
      (3L, 1L, 290 * S, 30.0), (4L, 1L, 295 * S, 0.0), (5L, 1L, 299 * S, 50.0),
      // user 1 — probe@400s (bucket 3, NO refs there): the carry must
      // surface bucket 2's LATEST ref (id 5 @299s), not the earlier id 3
      (6L, 1L, 400 * S, 0.0),
      // user 2 — two refs at the SAME instant as the probe: <= is
      // inclusive and the (ts, event_id) argmax picks the higher id 9
      (7L, 2L, 100 * S, 70.0), (8L, 2L, 100 * S, 0.0), (9L, 2L, 100 * S, 90.0),
      // user 3 — probe with no reference at all
      (10L, 3L, 50 * S, 0.0),
      // user 4 — pure carry across an EMPTY bucket gap: ref@0s (bucket 0),
      // probe@500s (bucket 4), nothing in between
      (11L, 4L, 0 * S, 110.0), (12L, 4L, 500 * S, 0.0)
    )
    rows.toDF("event_id", "user_id", "tsl", "value")
      .withColumn("ts", expr("timestamp_millis(tsl)")).drop("tsl")
      .withColumn("event_type", lit("view")).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("j_asof")(spark, dir.toString)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4))))).toMap
    assert(out(2L) == ((Some(5L), Some(50.0))),
      s"latest at-or-before wins in the shared bucket: ${out(2L)}")
    assert(out(4L) == ((Some(3L), Some(30.0))),
      s"same-bucket earlier ref beats carry; later ref excluded: ${out(4L)}")
    assert(out(6L) == ((Some(5L), Some(50.0))),
      s"carry surfaces the bucket's LATEST ref: ${out(6L)}")
    assert(out(8L) == ((Some(9L), Some(90.0))),
      s"same-instant tie is inclusive and id-resolved: ${out(8L)}")
    assert(out(10L) == ((None, None)), s"no earlier ref => null: ${out(10L)}")
    assert(out(12L) == ((Some(11L), Some(110.0))),
      s"pure carry across empty buckets: ${out(12L)}")
  }

  test("j_interval: inclusive 2-min bounds, no bucket-replication duplicates, user isolation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("intv_ev")
    dir.toFile.deleteOnExit()
    val S = 1000L
    val rows = Seq(
      // user 1: e1@0s is EXACTLY 2 min before e2@120s (boundary is IN);
      // e3 shares e2's instant (both directions pair at equal ts);
      // e4@240.001s is 1 ms beyond the window from e2/e3 (OUT) but e6@300s
      // reaches back to e4
      (1L, 1L, 0 * S), (2L, 1L, 120 * S), (3L, 1L, 120 * S),
      (4L, 1L, 240 * S + 1), (6L, 1L, 300 * S),
      // user 2: inside everyone's window by time, but users never cross
      (5L, 2L, 60 * S)
    )
    rows.toDF("event_id", "user_id", "tsl")
      .withColumn("ts", expr("timestamp_millis(tsl)")).drop("tsl")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val pairs = graft.SparkEntry.queries("j_interval")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.distinct.length,
      s"bucket replication must not duplicate a pair: ${pairs.toSeq}")
    assert(pairs.toSet == Set((2L, 1L), (2L, 3L), (3L, 1L), (3L, 2L), (6L, 4L)),
      s"inclusive bounds + isolation: ${pairs.toSet}")
  }
}
