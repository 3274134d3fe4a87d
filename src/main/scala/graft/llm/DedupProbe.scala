package graft.llm

import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of the shared near-dup chain (the
  * Scd2Probe pattern): times each phase of the dd_jaccard pipeline to a
  * noop sink so optimization work targets the measured hot stage, not a
  * guess. Usage: `runMain graft.llm.DedupProbe [sfDir]`. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(cpus, "dedup-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.autoTuneShuffle(spark, d, cpus)
    graft.functions.GraftFunctions.register(spark)

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.core.Tables.documents(spark, d)
    time("docs scan")(noop(docs))
    val stats = docs.agg(count(lit(1)), sum(length(col("text")))).head
    println(s"[probe] docs=${stats.getLong(0)} chars=${stats.getLong(1)}")

    // warm lap absorbs codegen/JIT so per-phase numbers are comparable
    for (lap <- Seq("cold", "warm")) {
      spark.catalog.clearCache()
      time(s"$lap rolling_hash only") {
        noop(docs.filter(length(col("text")) >= 5)
          .select(expr("size(rolling_hash(text, 5))")))
      }
      time(s"$lap minhashSigs") {
        noop(DedupQueries.minhashSigs(docs))
      }
      val mh = DedupQueries.minhashSigs(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"$lap mh materialize")(noop(mh))
      time(s"$lap lshPairs from cached mh") {
        noop(DedupQueries.lshPairs(mh))
      }
      // fine-grained verify-stage decomposition: cand pairs, candidate ids,
      // gram-set arrays, the attach joins — each from the previous phase's
      // cache, so a phase's number is ITS cost alone
      val cand = time(s"$lap cand (est>=0.5) mat") {
        val c = DedupQueries.estPairs(mh, 0.5).select("d1", "d2")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] cand pairs=${c.count()}")
        c
      }
      val candIds = time(s"$lap candIds distinct mat") {
        val ci = cand.select(col("d1").as("doc_id"))
          .union(cand.select(col("d2").as("doc_id"))).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] cand ids=${ci.count()}")
        ci
      }
      val sets = time(s"$lap gram-set arrays mat") {
        val st = docs.join(candIds, Seq("doc_id"), "left_semi")
          .filter(length(col("text")) >= 5)
          .select(col("doc_id"),
            expr(s"array_sort(array_distinct(transform(rolling_hash(text, 5), h0 -> (h0 * h0 + 987654321) % ${graft.functions.RollingHash.P})))").as("hset"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] set rows=${st.count()}")
        st
      }
      time(s"$lap verify joins only") {
        noop(cand
          .join(sets.select(col("doc_id").as("d1"), col("hset").as("ha")), "d1")
          .join(sets.select(col("doc_id").as("d2"), col("hset").as("hb")), "d2")
          .select(col("d1"), col("d2"),
            expr("sorted_intersect_count(ha, hb)").as("ic"),
            expr("size(ha)").as("na"), expr("size(hb)").as("nb")))
      }
      spark.sparkContext.setJobDescription(s"$lap full dd_jaccard")
      time(s"$lap full dd_jaccard") {
        noop(graft.SparkEntry.queries("dd_jaccard")(spark, d))
      }
      spark.catalog.clearCache()
      time(s"$lap full dd_clusters") {
        noop(graft.SparkEntry.queries("dd_clusters")(spark, d))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
