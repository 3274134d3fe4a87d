package graft.batch

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the exact-boundary semantics the w_session_counts oracle mirrors:
  * Spark MERGES an event arriving exactly `gap` after the previous one into
  * the same session (the merge test is `eventStart <= sessionEnd`, boundary
  * inclusive, even though the reported window end itself is exclusive for
  * containment). The oracle's gaps-and-islands break condition is therefore
  * strictly `> gap` — verified here empirically so a Spark behavior change
  * would fail this spec rather than silently diverge from the oracle.
  */
class SessionWindowSpec extends SparkSpec {

  test("session_window: an exact-gap event MERGES into the running session") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2026-01-01 00:30:00") // exactly gap after t0
    val t2 = Timestamp.valueOf("2026-01-01 01:00:01") // gap + 1s after t1
    val sessions = Seq((1, t0), (1, t1), (1, t2)).toDF("user_id", "ts")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("start"), col("cnt"))
      .orderBy("start")
      .collect()
    assert(sessions.length == 2, s"got ${sessions.toSeq}")
    // t0 and t1 share a session (exact gap merges); t2 is strictly past it
    assert(sessions(0).getLong(1) == 2 && sessions(1).getLong(1) == 1)
  }
}
