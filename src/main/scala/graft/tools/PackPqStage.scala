package graft.tools

import org.apache.spark.sql.functions._

/** One-off layout migration for persisted IVF-PQ index stages: v2/v5
  * (vec_id, s, code) per-subspace triples → v3/v6 PACKED per-vector codes
  * (one bigint, code_s << s·4). Everything else in the kind-tagged
  * artifact (codebooks, members, centroids, parent maps) is byte-carried.
  *
  * This is the 100 TB ops story for an index-layout upgrade: the
  * fingerprint bump (pq-v3 / pqs-v6) makes a fresh builder REBUILD the
  * stage — correct but it re-pays the whole fit (48+ min at 20M vectors,
  * hours at cluster scale) to recompute information the old artifact
  * already holds. A layout migration is a pure reshape: one pass over the
  * code rows, zero distance computations, zero refit. The sidecar is
  * rewritten to the new version string ONLY after the reshaped files are
  * in place, so a crash mid-migration leaves a stale-fingerprint stage the
  * next builder safely rebuilds (never a half-migrated one it adopts).
  *
  * Usage: runMain graft.tools.PackPqStage <warehouseDir> <stageDir> ...
  */
object PackPqStage {
  def main(args: Array[String]): Unit = {
    val warehouse = args.head
    val spark = graft.core.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-pack-pq")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val dir = java.nio.file.Paths.get(warehouse, name)
      val fpFile = dir.resolve("_graft_fingerprint")
      require(java.nio.file.Files.exists(fpFile), s"$dir: no fingerprint sidecar")
      val fp = new String(java.nio.file.Files.readAllBytes(fpFile), "UTF-8")
      val newFp = fp.replace("pq-v2;", "pq-v3;").replace("pqs-v5;", "pqs-v6;")
      if (newFp == fp) {
        println(s"[pack] $name: fingerprint not v2/v5 (${fp.take(12)}…) — skipping")
      } else {
        val df = spark.read.parquet(dir.toString)
        val packed = df.filter(col("kind") === "code")
          .groupBy("vec_id")
          .agg(sum(expr("code << (s * 4)")).as("code"))
          .select(lit("code").as("kind"), lit(null).cast("int").as("s"),
            lit(null).cast("bigint").as("cid"),
            lit(null).cast("array<bigint>").as("carr"),
            col("vec_id"), col("code"))
        // pqs tables have no label column; pq (fixed-k) tables do — carry
        // whatever sibling columns exist beyond the shared six
        val extraCols = df.columns.filterNot(Set(
          "kind", "s", "cid", "carr", "vec_id", "code")).toSeq
        val packedAll = extraCols.foldLeft(packed)((p, c) =>
          p.withColumn(c, lit(null).cast(df.schema(c).dataType)))
          .select(df.columns.map(col): _*)
        val out = df.filter(col("kind") =!= "code").unionByName(packedAll)
        val tmp = dir.resolveSibling(name + "__packing")
        out.write.mode("overwrite").parquet(tmp.toString)
        // swap files, then heal the sidecar last (crash-safe ordering)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(dir).iterator().asScala.toSeq
          .filter(_.getFileName.toString != "_graft_fingerprint")
          .foreach(java.nio.file.Files.delete(_))
        java.nio.file.Files.list(tmp).iterator().asScala.toSeq
          .filter(p => !p.getFileName.toString.startsWith("."))
          .foreach(p => java.nio.file.Files.move(p, dir.resolve(p.getFileName)))
        java.nio.file.Files.list(tmp).iterator().asScala.toSeq
          .foreach(java.nio.file.Files.delete(_))
        java.nio.file.Files.delete(tmp)
        java.nio.file.Files.write(fpFile, newFp.getBytes("UTF-8"))
        println(s"[pack] $name: migrated to ${newFp.takeWhile(_ != ';')}")
      }
    }
    spark.stop()
  }
}
