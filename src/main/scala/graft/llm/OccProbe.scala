package graft.llm

import org.apache.spark.sql.functions._

/** Occupancy diagnostic for the scaled (k ∝ N) cell fit — the tool that
  * caught the round-8 three-level coverage collapse: prints cells-used,
  * max/median occupancy, and Σocc² (the pair joins' work term — the
  * number that predicts whether the production graph's per-cell work is
  * linear or a skew blowup) for the staged scaled assignment of a corpus
  * dir. Usage: runMain graft.llm.OccProbe <sfDir>. */
object OccProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.core.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "occ").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(s)
    val table = SimilarityQueries.stageKmeansScaledAssign(s, args(0))
    val occ = s.table(table).groupBy("cid").agg(count(lit(1)).as("n"))
    occ.agg(count(lit(1)).as("cells_used"), max("n").as("max_occ"),
      expr("percentile(n, 0.99)").as("p99"), expr("percentile(n, 0.5)").as("p50"),
      sum(col("n") * col("n")).as("sum_occ_sq")).show(false)
    occ.orderBy(desc("n")).show(10, false)
    s.stop()
  }
}
