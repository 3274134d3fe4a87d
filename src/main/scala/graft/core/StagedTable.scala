package graft.core

import org.apache.spark.sql.SparkSession

/** Fingerprinted cross-session staging for derived tables — the shared
  * machinery behind the staged cluster table (PipelineQueries) and the
  * staged IVF centroid index (SimilarityQueries).
  *
  * Contract: a stage directory under the warehouse carries a
  * `_graft_fingerprint` sidecar recording everything the table is a
  * function of (algorithm constants + input content hash). A fresh process
  * whose fingerprint matches ADOPTS the existing files as an external
  * table and skips the build entirely; any mismatch (changed constants,
  * changed input) drops and recomputes, then heals the sidecar. Within
  * one process a TrieMap memo makes repeat consumers free.
  *
  * The table is always EXTERNAL (explicit location): the stage belongs to
  * the warehouse directory, not to any one session's catalog — a later
  * DROP TABLE (catalog cleanup, process death) must not delete the shared
  * files. At 100 TB the fingerprint validation is one projection-pruned
  * scan of the input — orders cheaper than the multi-pass build it lets a
  * new session skip.
  */
object StagedTable {

  private val staged = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Test hook: number of actual builds this JVM ran — the cross-session
    * reuse specs assert a valid stage does NOT bump it. */
  @volatile var stagingsComputed: Int = 0

  /** Test hook: forget the per-JVM memo, simulating a fresh process (the
    * disk state — files, sidecar, catalog entries — is left as-is). */
  def resetCache(): Unit = staged.clear()

  /** Ensure `table` exists with content matching fingerprint `fp`; returns
    * the table name.
    *
    * @param adopt (table, locationUri) ⇒ register the EXISTING files as an
    *              external table (restate bucket spec etc.); called only
    *              when the sidecar matches and the catalog lacks the table
    * @param build (table, locationUri) ⇒ compute and write the stage as an
    *              external table at the location; called on mismatch/absence
    */
  def getOrStage(s: SparkSession, table: String, fp: => String)(
      adopt: (String, java.net.URI) => Unit)(
      build: (String, java.net.URI) => Unit): String =
    staged.getOrElseUpdate(table, {
      // fp is by-name: the validation scan runs once per process per
      // table, not once per consumer
      val fpVal = fp
      val loc = java.nio.file.Paths.get(
        java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")).getPath, table)
      val fpFile = loc.resolve("_graft_fingerprint")
      val reusable = java.nio.file.Files.exists(fpFile) &&
        new String(java.nio.file.Files.readAllBytes(fpFile), "UTF-8") == fpVal
      if (reusable) {
        if (!s.catalog.tableExists(table)) adopt(table, loc.toUri)
        table
      } else {
        // stale or absent: drop both catalog entry and location, recompute
        s.sql(s"DROP TABLE IF EXISTS $table")
        if (java.nio.file.Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
        build(table, loc.toUri)
        stagingsComputed += 1
        java.nio.file.Files.write(fpFile, fpVal.getBytes("UTF-8"))
        table
      }
    })
}
