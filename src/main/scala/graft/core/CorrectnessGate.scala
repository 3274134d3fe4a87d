package graft.core

/** Round-correctness artifact gate (VERDICT r9 #1): `CORRECTNESS_r09.json`
  * shipped EMPTY (`{}`) and the round lost its hard correctness signal.
  * The defense is a builder-produced `CORRECTNESS_LOCAL.json` written by
  * `scripts/selfcheck.py` every round, plus this validator wired into the
  * test suite — a zeroed, truncated, or red artifact turns the suite red
  * instead of silently shipping.
  *
  * Format (one line, written by selfcheck.py):
  * {{{
  * {"n_fail":0,"n_pass":192,"queries":{"a1_max_by":{"rows_match":true,
  *   "schema_match":true,"values_match":true}, ...},"sf":".../sf0.01"}
  * }}}
  * Oracle-less queries carry `{"rows_gt_zero":true}` instead of the triple.
  *
  * Parsing is structural-regex like [[graft.Bench.loadCommitted]] — per-query
  * objects are flat boolean maps, so `"name":{...}` extraction needs no JSON
  * library and cannot mis-nest.
  */
object CorrectnessGate {

  /** Validate artifact content against the full expected query set.
    * Left(reason) when the artifact is empty, missing queries, carrying
    * unknown queries, or any per-query boolean is false. */
  def check(json: String, expected: Set[String]): Either[String, Unit] = {
    if (json.trim.isEmpty || json.trim == "{}")
      return Left("artifact is empty — the r9 failure mode; regenerate via " +
        "graft.Verify + scripts/selfcheck.py")
    val qIdx = json.indexOf("\"queries\"")
    if (qIdx < 0) return Left("no queries object in artifact")
    val entry = """"([A-Za-z0-9_]+)":\{([^{}]*)\}""".r
    val entries = entry.findAllMatchIn(json.substring(qIdx))
      .map(m => m.group(1) -> m.group(2)).toMap
    if (entries.isEmpty) return Left("queries object is empty")
    val missing = (expected -- entries.keySet).toSeq.sorted
    if (missing.nonEmpty)
      return Left(s"${missing.size} registered queries missing from artifact: " +
        missing.take(5).mkString(", "))
    val extra = (entries.keySet -- expected).toSeq.sorted
    if (extra.nonEmpty)
      return Left(s"artifact names unregistered queries (stale file?): " +
        extra.take(5).mkString(", "))
    val red = entries.collect {
      case (k, body) if body.trim.isEmpty || body.contains("false") => k
    }.toSeq.sorted
    if (red.nonEmpty)
      return Left(s"${red.size} red rows: " + red.take(5).mkString(", "))
    Right(())
  }

  /** [[check]] on a file path; a missing/unreadable file is a failure (the
    * artifact must exist in the tree every round). */
  def checkFile(path: String, expected: Set[String]): Either[String, Unit] =
    try check(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"), expected)
    catch { case e: Exception => Left(s"cannot read $path: $e") }
}
