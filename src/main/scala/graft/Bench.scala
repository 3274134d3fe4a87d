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
  *
  * Contamination defenses (the round-4 driver artifact reported 493s for a
  * suite that measures 103s in a clean JVM — ambient machine load turned
  * one noisy run into the round's official number):
  *  - any query measuring > [[RerunFactor]]× its time in the committed
  *    `BENCH_LOCAL.json` is re-run (up to 2×) and the MINIMUM is reported —
  *    min-of-k is the standard noise-floor estimator for wall-clock
  *    benchmarks (noise is strictly additive);
  *  - a query with no committed reference (first appearance) always gets a
  *    second run, min-of-2;
  *  - the artifact carries its own contamination evidence: per-query JVM
  *    GC-ms, per-query rerun counts, `"contaminated"` (names still over the
  *    rerun threshold after retries — nonempty means DISTRUST this run),
  *    and the 1-minute system load average sampled at start and end
  *    (healthy: ≲ the worker-thread count; the r4 bad run would have shown
  *    a load far above it).
  */
object Bench {
  /** Rerun threshold vs the committed per-query reference. Run-to-run plan
    * noise is <1.5× (observed across rounds); the machine's PULSING
    * background load inflates the heavy cluster-chain queries ~2–2.5×
    * (measured round 5: the same build swung 7.9s ↔ 18.8s on
    * llm_corpus_prep across back-to-back runs), so 3× let contaminated
    * readings through — 2× catches the burst pattern while still never
    * firing on plan noise. */
  val RerunFactor = 2.0

  /** Sub-second noise floor for the rerun/contamination policy: a ~0.3s
    * query can 3× on pure scheduler jitter (round 6: tx_mix_report burned 3
    * reruns + a contaminated flag on noise), so per-query thresholds
    * compare against max(reference, [[NoiseFloorSec]]) — a query must
    * exceed BOTH RerunFactor× its reference AND RerunFactor×1s before it
    * counts as suspect. Heavy queries (the ones contamination actually
    * distorts) are unaffected. */
  val NoiseFloorSec = 1.0

  /** Aggregate ratchet: a run whose common-query total exceeds the
    * committed reference by more than this does NOT overwrite the
    * reference. 15%: above run-to-run plan noise (<15% observed across
    * rounds), far below the ~25% ambient-drift steps that poisoned the r4
    * reference chain — uniform host slowdowns trip no per-query rerun, so
    * the aggregate guard is the only thing keeping a drifted-but-clean run
    * from silently loosening every later threshold (VERDICT r6 #3). */
  val RatchetFactor = 1.15

  /** The driver's default scale-factor dir — also the warmup corpus (warmup
    * is about CODE, not data, so it stays pinned here even when the run
    * targets a decade slice; ADVICE r8: a SECOND hardcoded literal for the
    * same path let the warmup silently miss on a host with testdata
    * elsewhere). */
  val DefaultSfDir = "/root/testdata/sf0.1"

  /** Pinned CPU-calibration microbenchmark: a fixed integer-hash loop whose
    * wall-time depends only on host throughput (no allocation, no I/O, no
    * Spark). Emitted into every artifact as `calibration_sec` so a reader
    * (or a later run) can normalize wall-times across host-speed drift —
    * the round-6 1.24× "regression" was exactly this kind of ambient drift
    * and cost a forensic pass to attribute. ~0.5–1s on current hosts. */
  def calibrate(): Double = {
    var h = 0x9e3779b97f4a7c15L
    var i = 0L
    val n = 400000000L
    val t0 = System.nanoTime()
    while (i < n) {
      h ^= i; h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    // fold h into a side effect the JIT can't elide
    if (h == 42L) System.err.println("[bench] calibration sentinel")
    sec
  }

  /** Per-query suspicion threshold: RerunFactor × max(reference ×
    * driftFactor, [[NoiseFloorSec]]). `driftFactor` ≥ 1 scales the
    * committed reference up when the calibration loop shows the HOST is
    * slower than when the reference was recorded (clamped ≤2 — past that
    * the run is untrustworthy anyway), so a uniformly slow host doesn't
    * burn reruns on every heavy query. */
  def rerunThreshold(refSec: Double, driftFactor: Double): Double =
    RerunFactor * math.max(refSec * driftFactor, NoiseFloorSec)

  /** Host-drift factor from calibration readings: how much slower this
    * host runs the pinned loop than the host that recorded the reference.
    * 1.0 when either reading is missing; never below 1 (a FASTER host
    * must still satisfy the recorded thresholds); clamped at 2. */
  def driftFactor(calNow: Double, calRef: Double): Double =
    if (calNow > 0 && calRef > 0) math.min(2.0, math.max(1.0, calNow / calRef))
    else 1.0

  /** The aggregate ratchet decision: may this run's per-query times become
    * the committed reference? `common` pairs (thisRun, committed) seconds
    * for queries present in both. Refuses when the common total exceeds
    * the committed total by >[[RatchetFactor]] — ambient drift, not code,
    * moves totals that way without tripping any per-query rerun. */
  def ratchetAllows(common: Seq[(Double, Double)]): Boolean =
    common.isEmpty ||
      common.map(_._1).sum <= common.map(_._2).sum * RatchetFactor

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", DefaultSfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional positional args: run only the named queries (local iteration
    // aid — the driver passes none and gets the full suite)
    val only: Set[String] = args.toSet
    // GRAFT_BENCH_MERGE=q1,q2 — re-record ONLY the named queries into the
    // committed reference (min-of-3), keep every other entry byte-identical;
    // see [[mergeDecision]] for the refusal contract (VERDICT r8 #8)
    val mergeSet: Set[String] = sys.env.get("GRAFT_BENCH_MERGE")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    val unknownMerge = mergeSet.filterNot(SparkEntry.queries.contains)
    if (unknownMerge.nonEmpty) {
      System.err.println(s"[bench] GRAFT_BENCH_MERGE names unknown queries: " +
        unknownMerge.toSeq.sorted.mkString(","))
      sys.exit(1)
    }
    val spark = graft.core.GraftSession.builder(cpus.toInt, "graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // shuffle partitions sized to the INPUT, not the host (VERDICT r7 #3):
    // at the driver SFs this is the old per-core default; on a multi-GB
    // decade slice it reproduces the cluster-shape partition count without
    // the manual SPARK_GRAFT_SHUFFLE_PARTITIONS lever
    val shuffleParts = graft.core.GraftSession.autoTuneShuffle(spark, sfDir, cpus.toInt)
    if (shuffleParts != cpus.toInt)
      System.err.println(s"[bench] shuffle partitions auto-tuned to $shuffleParts for $sfDir")

    import scala.jdk.CollectionConverters._
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    def gcTotalMs(): Long = gcBeans.map(_.getCollectionTime).sum
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage

    // the committed per-query reference this run is judged against — only
    // meaningful at the SAME scale factor (an sf0.01 iteration run judged
    // against committed sf0.1 times would never trip; the converse would
    // mark everything contaminated)
    val prev: Map[String, Double] = {
      val (refSf, times) = loadCommitted()
      if (refSf == sfDir) times else Map.empty
    }

    /** One timed execution → (seconds, gcMsDuringRun). */
    def runOnce(name: String, dir: String = sfDir): (Double, Long) = {
      val gc0 = gcTotalMs()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // queries that persist intermediates (dedup pipelines) must not leak
      // cached RDDs into later measurements
      spark.catalog.clearCache()
      (sec, gcTotalMs() - gc0)
    }

    // warmup: one relational, one windowed, one LLM-pipeline query — covers
    // the codegen'd join/agg paths AND the md5/array expression paths, so
    // per-query numbers are attributable to plans, not JIT order. Warmup is
    // about CODE (JIT/codegen/classloading), not data, so it runs on the
    // driver's fixed sf0.1 regardless of the target slice — a decade-slice
    // run must not pay a multi-minute dd_jaccard warm lap at 5M docs
    // (identical behavior for the driver's own sf0.1 runs). Falls back to
    // the run's own sfDir when the default corpus is absent on this host —
    // a silent warmup miss costs per-query JIT attribution (ADVICE r8).
    val warmDir =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(DefaultSfDir)))
        DefaultSfDir
      else sfDir
    try { runOnce("w1_window_avg", warmDir); runOnce("q5_revenue_by_region", warmDir)
          runOnce("dd_jaccard", warmDir) }
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    // the component-loop plan shapes (label-propagation joins + pointer
    // jump) pay ~5s of one-time whole-stage-codegen compilation on their
    // FIRST execution in a JVM (measured: dd_clusters 12.3s cold vs 6.3s
    // on every later run in the same JVM) — warm them on the tiny sf0.001
    // corpus so the measured dd_clusters/dd_split/llm_cluster_stage numbers
    // are the plan's cost, not the JIT's
    try {
      SparkEntry.queries("dd_clusters")(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    } catch { case e: Throwable => System.err.println(s"[bench] loop warmup failed: $e") }

    // host-speed calibration (min-of-2 — the loop itself is noise-prone to
    // one scheduler preemption): normalizes per-query rerun thresholds
    // against the committed run's host speed and rides into the artifact
    val calNow = math.min(calibrate(), calibrate())
    val calRef = loadCalibration()
    val drift = driftFactor(calNow, calRef)
    if (drift > 1.05)
      System.err.println(f"[bench] host ${drift}%.2fx slower than the committed " +
        f"reference's calibration ($calNow%.3fs vs $calRef%.3fs) — rerun " +
        "thresholds normalized; reference will not be overwritten on drift")

    val failed = Seq.newBuilder[String]
    val contaminated = Seq.newBuilder[String]
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => if (mergeSet.nonEmpty) mergeSet(n) else only.isEmpty || only(n))
    val results = names.map { name =>
      var sec = -1.0
      var gc = 0L
      var runs = 0
      def attempt(): Unit =
        try {
          val (s, g) = runOnce(name)
          runs += 1
          if (sec < 0 || s < sec) { sec = s; gc = g }
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            runs += 1
        }
      attempt()
      // merge mode re-records reference entries: always min-of-3 (the
      // r8 re-record contract) before the usual suspicion logic runs
      while (mergeSet.nonEmpty && sec >= 0 && runs < 3) attempt()
      if (sec < 0) failed += name
      else {
        val ref = prev.get(name).filter(_ > 0)
        // threshold vs max(drift-normalized reference, 1s noise floor):
        // sub-second queries 3×-ing on scheduler jitter must not burn
        // reruns or flag contamination (round-6 tx_mix_report false alarm)
        def suspect = ref.map(r => sec > rerunThreshold(r, drift))
          .getOrElse(runs < 2) // no reference → always min-of-2
        // up to 3 retries: the round-5 burst pattern can span two
        // consecutive attempts of a heavy query
        while (suspect && runs < 4 && sec >= 0) attempt()
        if (ref.exists(r => sec > rerunThreshold(r, drift))) {
          contaminated += name
          System.err.println(f"[bench] $name still $sec%.2fs after ${runs - 1} rerun(s) " +
            f"vs committed ${ref.get}%.2fs — treat this artifact as contaminated")
        }
      }
      (name, sec, gc, runs - 1)
    }
    val bad = failed.result()
    val dirty = contaminated.result()
    val total = results.collect { case (_, v, _, _) if v >= 0 => v }.sum
    val loadEnd = osBean.getSystemLoadAverage

    // AGGREGATE ratchet guard, decided BEFORE any output so the decision
    // rides the artifact as a first-class field (VERDICT r7 #8 — the r7
    // refusal left the round with "parsed": null and the verdict only in a
    // log tail): ambient load that slows every query ~1.5× trips NO
    // per-query rerun, so a noisy run would silently become the reference
    // and raise the bar the NEXT noisy run is judged against (observed:
    // 112s → 124s → 174s across three same-code runs as machine load
    // rose). A run whose common-query total exceeds the committed total by
    // >RatchetFactor does not overwrite — above run-to-run plan noise, far
    // below regressions worth recording; a LEGITIMATE whole-suite slowdown
    // (e.g. regenerated testdata) re-records by deleting the stale file or
    // setting GRAFT_BENCH_FORCE=1.
    // GRAFT_BENCH_FORCE is the human-in-the-loop lever for a LEGITIMATE
    // whole-suite or per-query change (new algorithm, regenerated
    // testdata): it overrides BOTH automated refusal gates — without it a
    // legitimately-slower query could never enter the reference (every
    // later run re-flags it "contaminated" forever, the r8 deadlock).
    // Never set it on ambient suspicion; the gates exist for that.
    val force = sys.env.contains("GRAFT_BENCH_FORCE")
    val ratchetOk = {
      val (refSf2, refT) = loadCommitted()
      val common = results.collect {
        case (n, v, _, _) if v >= 0 && refT.get(n).exists(_ > 0) => (v, refT(n))
      }
      force || refSf2 != sfDir || ratchetAllows(common)
    }
    val filtered = only.nonEmpty || mergeSet.nonEmpty
    // sf guard on the FULL-RECORD path (VERDICT r10 #1: an sf0.001 local
    // iteration run overwrote the committed sf0.1 reference — the ratchet
    // auto-passed because cross-sf totals aren't comparable, which is
    // exactly why the overwrite must be refused, not waved through; the
    // merge path already refuses via merge_sf_mismatch). GRAFT_BENCH_FORCE
    // stays the conscious lever for genuinely re-basing at a new sf.
    val sfMismatch = {
      val refSf = loadCommitted()._1
      refSf.nonEmpty && refSf != sfDir
    }
    val refused = filtered || (!force && (dirty.nonEmpty || sfMismatch)) || !ratchetOk
    val reason =
      if (mergeSet.nonEmpty) "merge_run"
      else if (only.nonEmpty) "filtered_run"
      else if (!force && sfMismatch) "sf_mismatch_vs_committed_reference"
      else if (!force && dirty.nonEmpty) "contaminated_queries"
      else if (!ratchetOk) s"aggregate_total_gt_${RatchetFactor}x_committed_reference"
      else ""
    if (!force && sfMismatch)
      System.err.println(s"[bench] run sf '$sfDir' differs from the committed " +
        "reference's — BENCH_LOCAL.json NOT updated (GRAFT_BENCH_FORCE=1 re-bases)")
    if (only.isEmpty && dirty.isEmpty && !ratchetOk)
      System.err.println(s"[bench] aggregate total >${RatchetFactor}x the committed reference — " +
        "ambient load suspected; BENCH_LOCAL.json NOT updated (GRAFT_BENCH_FORCE=1 overrides)")

    def jmap[T](f: ((String, Double, Long, Int)) => T): String =
      results.map(r => "\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val qs = jmap(_._2)
    val gcs = jmap(_._3)
    val reruns = results.filter(_._4 > 0)
      .map(r => "\"" + r._1 + "\":" + r._4).mkString("{", ",", "}")
    def jarr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":${jarr(bad)},"contaminated":${jarr(dirty)},"gc_ms":$gcs,""" +
      s""""reruns":$reruns,"load_avg_start":$loadStart,"load_avg_end":$loadEnd,""" +
      s""""calibration_sec":$calNow,"drift_factor":$drift,""" +
      s""""ratchet_refused":$refused,"ratchet_reason":"$reason",""" +
      s""""cpus":${Runtime.getRuntime.availableProcessors},"sf":"$sfDir"}"""
    println(json)
    val top = results.filter(_._2 >= 0).sortBy(-_._2).take(10)
      .map(r => "\"" + r._1 + "\":" + f"${r._2}%.2f").mkString("{", ",", "}")
    val verdict = verdictJson(total, results.size, jarr(bad), jarr(dirty),
      results.count(_._4 > 0), top, loadStart, loadEnd, calNow, drift, sfDir,
      refused, reason)
    // Every full-suite run — contaminated or refused INCLUDED — records its
    // verdict to the repo as a committed artifact, so wall-time and the
    // ratchet decision are never read from a log tail. This file is the
    // round's RECORD; BENCH_LOCAL.json stays the clean-runs-only rerun
    // REFERENCE (the ratchet protects it, not this). Filtered/merge runs
    // must not overwrite the full-suite round record.
    if (only.isEmpty && mergeSet.isEmpty) {
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_VERDICT.json"),
        (verdict + "\n").getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"[bench] BENCH_VERDICT.json write failed: $e") }
    }
    if (!refused) {
      // The stdout line can exceed the driver's tail capture (r3 lost the
      // head of the per-query map); persist the identical JSON so
      // per-query numbers survive regardless of how stdout is captured.
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
        (json + "\n").getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"[bench] BENCH_LOCAL.json write failed: $e") }
    }
    // merge mode: splice ONLY the named re-records into the committed
    // reference (every other entry byte-identical), or refuse with a
    // machine-readable reason
    if (mergeSet.nonEmpty) {
      val pairs = results.map(r => (r._1, r._2))
      mergeDecision(mergeSet, pairs, loadCommitted()._1, prev, sfDir, drift) match {
        case Left(why) =>
          System.err.println(s"[bench] GRAFT_BENCH_MERGE refused: $why " +
            "(BENCH_LOCAL.json unchanged; GRAFT_BENCH_FORCE remains the " +
            "break-glass lever for a change past the threshold)")
          spark.stop()
          sys.exit(1)
        case Right(merged) =>
          // calibration of the merged reference = the FASTEST host that
          // contributed entries, so future drift normalization never
          // under-scales a threshold recorded on a quicker machine
          val mcal =
            if (calRef > 0) math.min(calNow, calRef) else calNow
          val mq = merged.toSeq.sortBy(_._1)
            .map { case (n, v) => "\"" + n + "\":" + v }.mkString("{", ",", "}")
          val mjson = s"""{"metric":"total","value":${merged.values.sum},""" +
            s""""unit":"sec","queries":$mq,"failed":[],"contaminated":[],""" +
            s""""merged":${jarr(mergeSet.toSeq.sorted)},""" +
            s""""load_avg_start":$loadStart,"load_avg_end":$loadEnd,""" +
            s""""calibration_sec":$mcal,"drift_factor":$drift,""" +
            s""""ratchet_refused":false,"ratchet_reason":"merge",""" +
            s""""cpus":${Runtime.getRuntime.availableProcessors},"sf":"$sfDir"}"""
          try {
            java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
              (mjson + "\n").getBytes("UTF-8"))
            System.err.println(s"[bench] merged ${mergeSet.size} re-recorded " +
              s"entr${if (mergeSet.size == 1) "y" else "ies"} into BENCH_LOCAL.json")
          } catch { case e: Throwable =>
            System.err.println(s"[bench] merge write failed: $e") }
      }
    }
    // The driver's round artifact keeps only the LAST ~2,000 chars of
    // stdout, so the trailer must be the FINAL app line (all stderr
    // messages above were printed before it): total + verdict fields +
    // slowest queries, self-sufficient no matter how long the full line
    // grows.
    println(verdict)
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }

  /** GRAFT_BENCH_MERGE decision (VERDICT r8 #8): may this run's re-records
    * of `named` queries be spliced into the committed reference? The r8
    * re-record had to be done by hand under GRAFT_BENCH_FORCE — which
    * overrode EVERY gate and let ambient drift ride into five unrelated
    * tripwires. Merge mode re-records ONLY the named queries (each
    * min-of-3), keeps every other committed entry untouched, and refuses —
    * Left(reason) — when:
    *  - the run's sf differs from the committed reference's (times are not
    *    comparable across scale factors),
    *  - there is no committed reference to merge into (a first recording is
    *    a full run's job),
    *  - a named query failed,
    *  - a named query's new time exceeds its committed entry by more than
    *    the drift-clamped rerun threshold ([[rerunThreshold]]) — a
    *    legitimately-slower algorithm inside that band merges cleanly;
    *    past it, the change is large enough that GRAFT_BENCH_FORCE must be
    *    reached for consciously (and it stays the break-glass lever ONLY).
    * Right(merged) is the full per-query reference with the named entries
    * replaced by this run's times (named queries absent from the old
    * reference simply append). */
  def mergeDecision(named: Set[String], results: Seq[(String, Double)],
      refSf: String, refT: Map[String, Double], sfDir: String,
      drift: Double): Either[String, Map[String, Double]] = {
    val times = results.toMap
    val failedNames = named.filter(n => !times.get(n).exists(_ >= 0)).toSeq.sorted
    if (refSf.nonEmpty && refSf != sfDir) Left(s"merge_sf_mismatch:$refSf")
    else if (refT.isEmpty) Left("merge_no_committed_reference")
    else if (failedNames.nonEmpty)
      Left(s"merge_named_query_failed:${failedNames.mkString(",")}")
    else {
      val overs = named.toSeq.sorted.filter { n =>
        refT.get(n).exists(r => r > 0 && times(n) > rerunThreshold(r, drift))
      }
      if (overs.nonEmpty) Left(s"merge_exceeds_threshold:${overs.mkString(",")}")
      else Right(refT ++ named.map(n => n -> times(n)))
    }
  }

  /** The verdict trailer JSON — the round's first-class wall-time record
    * (VERDICT r7 #8). `ratchet_refused` true means this run did NOT become
    * the committed rerun reference; `ratchet_reason` says why
    * (filtered_run / contaminated_queries / aggregate drift). `failedArr`,
    * `dirtyArr` and `slowest` arrive pre-rendered as JSON fragments. */
  def verdictJson(total: Double, nQueries: Int, failedArr: String,
      dirtyArr: String, rerunsN: Int, slowest: String, loadStart: Double,
      loadEnd: Double, calNow: Double, drift: Double, sfDir: String,
      refused: Boolean, reason: String): String =
    s"""{"trailer":"verdict","value":$total,"unit":"sec",""" +
      s""""n_queries":$nQueries,"failed":$failedArr,""" +
      s""""contaminated":$dirtyArr,"reruns_n":$rerunsN,""" +
      s""""slowest":$slowest,"load_avg_start":$loadStart,"load_avg_end":$loadEnd,""" +
      s""""calibration_sec":$calNow,"drift_factor":$drift,""" +
      s""""ratchet_refused":$refused,"ratchet_reason":"$reason",""" +
      s""""sf":"$sfDir"}"""

  /** (sfDir, per-query seconds) from the committed `BENCH_LOCAL.json`
    * (("", empty) if absent/unreadable). The file is machine-written
    * single-line JSON; the queries object is extracted structurally, then
    * pairs by regex — no JSON library needed for a map of number-valued
    * string keys. */
  def loadCommitted(path: String = "BENCH_LOCAL.json"): (String, Map[String, Double]) =
    try {
      val text = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
      val sf = raw""""sf":"([^"]+)"""".r.findFirstMatchIn(text).map(_.group(1)).getOrElse("")
      val start = text.indexOf("\"queries\":{")
      if (start < 0) (sf, Map.empty)
      else {
        val body = text.substring(start + "\"queries\":{".length,
          text.indexOf('}', start))
        (sf, raw""""([A-Za-z0-9_]+)":(-?[0-9.eE+-]+)""".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap)
      }
    } catch { case _: Throwable => ("", Map.empty) }

  /** The committed artifact's `calibration_sec` (0 if absent — pre-round-7
    * artifacts carry none, and [[driftFactor]] degrades to 1). */
  def loadCalibration(path: String = "BENCH_LOCAL.json"): Double =
    try {
      val text = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
      raw""""calibration_sec":(-?[0-9.eE+-]+)""".r.findFirstMatchIn(text)
        .map(_.group(1).toDouble).getOrElse(0.0)
    } catch { case _: Throwable => 0.0 }
}
