package graft.batch

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Skew handling (SURVEY §4 / the 100 TB brief's "salting for skew"):
  * two mechanisms, both proven here.
  *
  * 1. SALTED two-phase aggregation — the manual pattern for a hot key:
  *    aggregate on (key, salt) first (splits the hot key's rows across
  *    `nSalts` reducers), then re-aggregate on key. Must be value-identical
  *    to the direct aggregation for algebraic aggregates.
  *
  * 2. AQE skew-join splitting — the automatic path this engine prefers
  *    (every session enables spark.sql.adaptive.*): verified by config
  *    presence; the mechanism itself is Spark's, exercised by every
  *    shuffle join in the suite.
  */
class SkewSpec extends SparkSpec {

  test("salted two-phase aggregation equals direct aggregation on a hot key") {
    import spark.implicits._
    val nSalts = 8
    // 90% of rows share one key — the shape that wedges a single reducer
    val rows = (1L to 20000L).map { i =>
      (if (i % 10 == 0) s"key_${i % 7}" else "hot_key", i)
    }
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
    val salted = df
      .withColumn("salt", pmod(hash(col("v")), lit(nSalts)))
      .groupBy("k", "salt")
      .agg(sum("v").as("ptotal"), count(lit(1)).as("pcnt")) // phase 1: hot key split 8 ways
      .groupBy("k")
      .agg(sum("ptotal").as("total"), sum("pcnt").as("cnt")) // phase 2: |keys|×salts rows only
    assert(salted.except(direct).isEmpty && direct.except(salted).isEmpty)
    // the phase-1 output really is split: the hot key occupies every salt
    val hotParts = df.withColumn("salt", pmod(hash(col("v")), lit(nSalts)))
      .filter(col("k") === "hot_key").select("salt").distinct().count()
    assert(hotParts == nSalts)
  }

  test("AQE (incl. skew-join splitting) is on in every session the factory builds") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    // skewJoin.enabled defaults true under AQE; assert nobody turned it off
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }
}
