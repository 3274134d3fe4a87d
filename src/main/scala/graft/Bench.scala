package graft

/** Benchmark main — one JSON line on stdout per the driver contract.
  *
  * Methodology:
  *  - a warmup pass (flagship query) absorbs JVM/codegen/classloading cost
  *    so per-query numbers are attributable to the plan, not to whoever
  *    runs first;
  *  - each query is timed to a `noop`-format write, which executes the FULL
  *    physical plan (incl. final sort and projections that `count()` lets
  *    Catalyst prune away) without sink I/O;
  *  - failures are NOT swallowed: a failing query records `-1` seconds,
  *    lands in `"failed"`, and the process exits nonzero so the driver
  *    can't mistake a broken round for a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional positional args: run only the named queries (local iteration
    // aid — the driver passes none and gets the full suite)
    val only: Set[String] = args.toSet
    val spark = graft.core.GraftSession.builder(cpus.toInt, "graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // queries that persist intermediates (dedup pipelines) must not leak
      // cached RDDs into later measurements
      spark.catalog.clearCache()
      sec
    }

    // warmup: one relational, one windowed, one LLM-pipeline query — covers
    // the codegen'd join/agg paths AND the md5/array expression paths, so
    // per-query numbers are attributable to plans, not JIT order
    try { runOnce("w1_window_avg"); runOnce("q5_revenue_by_region"); runOnce("dd_jaccard") }
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }

    val failed = Seq.newBuilder[String]
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    val results = names.map { name =>
      val sec =
        try runOnce(name)
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed += name
            -1.0
        }
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val bad = failed.result()
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = bad.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(json)
    // The stdout line can exceed the driver's tail capture (r3 lost the
    // head of the per-query map); persist the identical JSON to the repo so
    // per-query numbers survive regardless of how stdout is captured. Only
    // full-suite runs overwrite it — a filtered local run must not clobber
    // the round artifact.
    if (only.isEmpty) {
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
        (json + "\n").getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"[bench] BENCH_LOCAL.json write failed: $e") }
    }
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
