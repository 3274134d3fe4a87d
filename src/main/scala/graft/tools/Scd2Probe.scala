package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage timer for ev_scd2's decade behavior (VERDICT r8 #7 —
  * the one event-family query reading >10×/decade without a named cause).
  * Times each prefix of the chain separately so the super-linear term has
  * a name: the corpus-sized (user, day) rollup, the per-user windows
  * (lag/chg/run-sum), the segment collapse, and the full query.
  *
  * Usage: runMain graft.tools.Scd2Probe <sfDir>
  */
object Scd2Probe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.GraftSession.builder(cpus, "scd2probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = graft.core.GraftSession.autoTuneShuffle(spark, d, cpus)
    System.err.println(s"[scd2] $d shuffle partitions = $parts")
    val dayUs = 86400000000L
    def ev = graft.core.Tables.events(spark, d)
      .select(col("user_id"),
        expr(s"unix_micros(date_trunc('DAY', ts)) div $dayUs").as("day_idx"),
        expr("cast(floor(value * 100) as bigint)").as("cents"))
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"""{"stage":"$tag","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      spark.catalog.clearCache()
    }
    import org.apache.spark.sql.expressions.Window
    val byDay = Window.partitionBy("user_id").orderBy("day_idx")
    val run = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // stage 1: the corpus-sized rollup (the only full-events pass)
    time("rollup")(ev.groupBy("user_id", "day_idx").agg(sum("cents").as("cents")))
    // stage 2: + tier map + lag/chg + running-sum seg (two window passes
    // over the user-partitioned day-grain frame)
    val seg0 = ev.groupBy("user_id", "day_idx").agg(sum("cents").as("cents"))
      .select(col("user_id"), col("day_idx"),
        when(col("cents") >= 1L, 1).otherwise(0).as("tier")) // placeholder tier: same shape
      .withColumn("chg",
        when(lag("tier", 1).over(byDay).isNull ||
          lag("tier", 1).over(byDay) =!= col("tier"), 1).otherwise(0))
      .withColumn("seg", sum("chg").over(run))
    time("rollup+windows")(seg0)
    // stage 3: + the segment collapse groupBy
    time("rollup+windows+collapse")(
      seg0.groupBy("user_id", "seg")
        .agg(min("tier").as("tier"), min("day_idx").as("valid_from_day"),
          count(lit(1)).as("n_active_days")))
    // stage 4: the real query end-to-end
    time("ev_scd2_full")(
      graft.batch.FunnelQueries.scd2DF(ev))
    spark.stop()
  }
}
