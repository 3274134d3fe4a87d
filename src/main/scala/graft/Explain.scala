package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder(8, "graft-explain").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(9000))
    }
    spark.stop()
  }
}
