package graft.batch

import org.apache.spark.sql.functions._
import graft.core.Tables
import Q.{dec4, sqlDec4}

/** Batch twins of the reference's stateless row transforms (SURVEY.md §2.3).
  *
  * The `events` table stands in for the sensor stream (user_id ↔ sensor id,
  * value ↔ temperature, ts ↔ event time) per FIXTURES.md. Every transform is
  * a pure Catalyst projection/filter/generator — no UDFs — so it stays inside
  * whole-stage codegen and pushes down to the parquet scan.
  */
object TransformQueries {

  val all: Seq[Q] = Seq(

    // T1 — map F→C conversion (reference chapter1/AverageSensorReadings.scala:50-51)
    Q("t1_celsius",
      s"""SELECT event_id, user_id, ${sqlDec4("(value - 32) * 5.0 / 9.0")} AS value_c
         |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          dec4((col("value") - 32) * 5.0 / 9.0).as("value_c"))
        .orderBy("event_id")
    },

    // T2 — map projection to a single column (chapter5/BasicTransformations.scala:54-55)
    Q("t2_project",
      "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber") {
      (s, d) =>
        Tables.lineitem(s, d).select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber")
    },

    // T3 — map to tuple (id, temperature) (chapter6/WindowFunctions.scala:38)
    Q("t3_tuple",
      "SELECT event_id, user_id, value FROM events ORDER BY event_id") { (s, d) =>
      Tables.events(s, d).select("event_id", "user_id", "value").orderBy("event_id")
    },

    // T4 — filter temperature >= 25 (chapter5/BasicTransformations.scala:46-47)
    Q("t4_filter",
      "SELECT event_id, user_id, value FROM events WHERE value >= 25.0 ORDER BY event_id") {
      (s, d) =>
        Tables.events(s, d).filter(col("value") >= 25.0)
          .select("event_id", "user_id", "value").orderBy("event_id")
    },

    // T5 — flatMap: split composite id into records (chapter5/BasicTransformations.scala:62-63)
    Q("t5_flatmap",
      s"""SELECT o_orderkey, unnest(string_split(o_orderpriority, '-')) AS token
         |FROM orders ORDER BY o_orderkey, token""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          explode(split(col("o_orderpriority"), "-")).as("token"))
        .orderBy("o_orderkey", "token")
    },

    // T6 — deterministic timestamp shuffle manufacturing out-of-order data
    // (chapter6/LateDataHandling.scala:175-183; rand → event_id-derived offset
    // so the oracle can reproduce it)
    Q("t6_ts_shuffle",
      s"""SELECT event_id, ts + to_microseconds((event_id % 7000) * 1000) AS shuffled_ts
         |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          expr("timestampadd(MILLISECOND, CAST(event_id % 7000 AS INT), ts)")
            .as("shuffled_ts"))
        .orderBy("event_id")
    },

    // T8 — scalar expression zoo: abs-diff, concat, ISO-8601 formatting
    // (chapter7/KeyedStateFunction.scala:91, chapter6/SideOutputs.scala:62,
    //  chapter8/TransactionalSinkExample.scala:83-86)
    Q("t8_scalar_exprs",
      s"""SELECT event_id,
         |  ${sqlDec4("abs(value - 50.0)")} AS absdiff,
         |  concat('alert: ', event_type) AS msg,
         |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso_ts
         |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          dec4(abs(col("value") - 50.0)).as("absdiff"),
          concat(lit("alert: "), col("event_type")).as("msg"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("iso_ts"))
        .orderBy("event_id")
    },
  )
}
