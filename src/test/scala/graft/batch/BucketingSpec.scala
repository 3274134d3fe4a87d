package graft.batch

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.SparkSpec

/** Co-located joins via bucketing (builder brief: "repartition()/bucketing
  * for co-located joins"): two tables bucketed by the join key into the
  * same bucket count join WITHOUT any shuffle exchange — at 100 TB this is
  * the difference between re-shuffling both fact tables per join and
  * reading pre-placed buckets. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans no shuffle exchange") {
    import spark.implicits._
    // disable auto-broadcast so the join would otherwise need a shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1L to 1000L).map(k => (k, s"left_$k")).toDF("k", "lv")
        .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_left")
      (1L to 1000L).map(k => (k, k * 2)).toDF("k", "rv")
        .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_right")

      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"co-bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
