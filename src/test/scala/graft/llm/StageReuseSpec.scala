package graft.llm

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Cross-session reuse of the staged cluster table: a fresh process whose
  * stage fingerprint (algorithm constants + corpus content hash) matches
  * the `_graft_fingerprint` sidecar adopts the existing bucketed files
  * WITHOUT re-running the clustering pass; any corpus change invalidates.
  * Simulated fresh process = stage cache cleared + catalog entry dropped
  * (the table is external, so the files survive the drop — exactly the
  * state a new driver starts from). */
class StageReuseSpec extends SparkSpec {

  override val timeLimit = org.scalatest.time.Span(300, org.scalatest.time.Seconds)

  test("fingerprint match skips recompute across sessions; corpus change invalidates") {
    val dir = Files.createTempDirectory("stage_corpus")
    dir.toFile.deleteOnExit()
    val corpus = dir.toString
    Tables.documents(spark, sf("sf0.001"))
      .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    val table = "graft_clusters_" + math.abs(corpus.hashCode).toString
    def stageRows() = graft.SparkEntry.queries("llm_cluster_stage")(spark, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // session 1: first consumer stages (one real clustering computation)
    val base = PipelineQueries.stagingsComputed
    val rows1 = stageRows()
    assert(PipelineQueries.stagingsComputed == base + 1, "first call computes the stage")
    assert(rows1.nonEmpty, "sf0.001 corpus has near-dup clusters")

    // "new process": JVM cache gone, catalog entry gone, files + sidecar on disk
    PipelineQueries.resetStageCache()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val rows2 = stageRows()
    assert(PipelineQueries.stagingsComputed == base + 1,
      "matching fingerprint reuses the staged files without recompute")
    assert(rows2 == rows1, "adopted external table returns the identical stage")

    // the adopted table keeps its bucket spec (doc_id joins skip the exchange)
    val bucketSpec = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .filter(col("col_name").isin("Num Buckets", "Bucket Columns")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(bucketSpec.get("Num Buckets").contains("16") &&
      bucketSpec.get("Bucket Columns").exists(_.contains("doc_id")),
      s"bucket metadata restored on adoption: $bucketSpec")

    // corpus change: one doc's text edited -> fingerprint mismatch -> recompute
    val docs = spark.read.parquet(s"$corpus/documents.parquet").collect()
    val schema = spark.read.parquet(s"$corpus/documents.parquet").schema
    val textIdx = schema.fieldIndex("text")
    val edited = docs.zipWithIndex.map { case (r, i) =>
      if (i == 0) org.apache.spark.sql.Row.fromSeq(
        r.toSeq.updated(textIdx, r.getString(textIdx) + " EDITED"))
      else r
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(edited: _*)),
      schema).write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    PipelineQueries.resetStageCache()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    stageRows()
    assert(PipelineQueries.stagingsComputed == base + 2,
      "changed corpus invalidates the stage and recomputes")

    // constants-change path: a stage written under different algorithm
    // constants carries a different fingerprint — simulated by corrupting
    // the sidecar (same observable state as a constants edit: files
    // present, fingerprint mismatched) -> recompute, and the sidecar heals
    val loc = java.nio.file.Paths.get(java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    val fpFile = loc.resolve("_graft_fingerprint")
    val goodFp = new String(Files.readAllBytes(fpFile), "UTF-8")
    Files.write(fpFile, "v0;stale-constants".getBytes("UTF-8"))
    PipelineQueries.resetStageCache()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    stageRows()
    assert(PipelineQueries.stagingsComputed == base + 3,
      "fingerprint mismatch (changed constants) recomputes")
    assert(new String(Files.readAllBytes(fpFile), "UTF-8") == goodFp,
      "recompute rewrites the current fingerprint")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("IVF centroid index: fingerprint match adopts across sessions; vector change invalidates") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("stage_ivf")
    dir.toFile.deleteOnExit()
    val corpus = dir.toString
    Tables.embeddings(spark, sf("sf0.001"))
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val table = "graft_ivf_cent_" + math.abs(corpus.hashCode).toString
    def cents() = spark.table(SimilarityQueries.stageIvfCentroids(spark, corpus))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap

    val base = PipelineQueries.stagingsComputed
    val c1 = cents()
    assert(PipelineQueries.stagingsComputed == base + 1, "first call builds the index")
    assert(c1.nonEmpty && c1.values.forall(_.nonEmpty))

    // "new process": memo gone, catalog entry gone, files + sidecar on disk
    PipelineQueries.resetStageCache()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val c2 = cents()
    assert(PipelineQueries.stagingsComputed == base + 1,
      "matching fingerprint adopts the index without a corpus pass")
    assert(c2 == c1, "adopted index is identical")

    // vector change: one embedding perturbed -> fingerprint mismatch -> rebuild
    val emb = spark.read.parquet(s"$corpus/embeddings.parquet")
    emb.withColumn("embedding",
        org.apache.spark.sql.functions.when(col("vec_id") === 0,
          org.apache.spark.sql.functions.expr("transform(embedding, x -> x + 1.0F)"))
          .otherwise(col("embedding")))
      .write.mode("overwrite").parquet(s"${dir}2.parquet")
    // rewrite in place (overwrite of the read source needs a staging copy)
    spark.read.parquet(s"${dir}2.parquet").write.mode("overwrite")
      .parquet(s"$corpus/embeddings.parquet")
    PipelineQueries.resetStageCache()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    cents()
    assert(PipelineQueries.stagingsComputed == base + 2,
      "changed vectors invalidate the staged index and rebuild")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("IVF-PQ index: one kind-tagged artifact adopts across sessions without an index pass") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("stage_pq")
    dir.toFile.deleteOnExit()
    val corpus = dir.toString
    Tables.embeddings(spark, sf("sf0.001"))
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val table = "graft_pq_index_" + math.abs(corpus.hashCode).toString
    def index() = spark.table(SimilarityQueries.stagePqIndex(spark, corpus))
      .collect()

    val base = PipelineQueries.stagingsComputed
    val i1 = index()
    assert(PipelineQueries.stagingsComputed == base + 1, "first call builds the index")
    val kinds = i1.map(_.getString(0)).toSet
    assert(kinds == Set("cb", "code", "ccent"),
      s"the artifact carries codebooks, codes, and coarse centroids: $kinds")
    val nVecs = Tables.embeddings(spark, corpus).count()
    // r10 packed layout: ONE bigint code row per vector (4-bit sub-codes
    // shifted into disjoint ranges), not a row per (vector, subspace)
    assert(i1.count(_.getString(0) == "code") == nVecs,
      "one PACKED code row per vector")
    assert(i1.filter(_.getString(0) == "code")
      .forall(r => { val c = r.getLong(5); c >= 0L && c < (1L << 32) }),
      "a packed code is 8 sub-codes x 4 bits — 32 bits")

    // "new process": memo gone, catalog entry gone, files + sidecar on disk
    PipelineQueries.resetStageCache()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val i2 = index()
    assert(PipelineQueries.stagingsComputed == base + 1,
      "matching fingerprint adopts the index without an index pass")
    assert(i2.map(_.toString).sorted.sameElements(i1.map(_.toString).sorted))

    // a perturbed vector invalidates and rebuilds
    spark.read.parquet(s"$corpus/embeddings.parquet")
      .withColumn("embedding",
        org.apache.spark.sql.functions.when(col("vec_id") === 0,
          org.apache.spark.sql.functions.expr("transform(embedding, x -> x + 1.0F)"))
          .otherwise(col("embedding")))
      .write.mode("overwrite").parquet(s"${dir}2.parquet")
    spark.read.parquet(s"${dir}2.parquet").write.mode("overwrite")
      .parquet(s"$corpus/embeddings.parquet")
    PipelineQueries.resetStageCache()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    index()
    assert(PipelineQueries.stagingsComputed == base + 2,
      "changed vectors invalidate the staged PQ index and rebuild")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("kmeans assignment table: fingerprint match adopts across sessions without a Lloyd pass") {
    val dir = Files.createTempDirectory("stage_kmasg")
    dir.toFile.deleteOnExit()
    val corpus = dir.toString
    Tables.embeddings(spark, sf("sf0.001"))
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val table = "graft_km_asg_" + math.abs(corpus.hashCode).toString
    def asg() = spark.table(SimilarityQueries.stageKmeansAssign(spark, corpus))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val base = PipelineQueries.stagingsComputed
    val a1 = asg()
    assert(PipelineQueries.stagingsComputed == base + 1, "first call runs the Lloyd chain")
    assert(a1.nonEmpty, "assignments staged")

    // "new process": memo gone, catalog entry gone, files + sidecar on disk
    PipelineQueries.resetStageCache()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val a2 = asg()
    assert(PipelineQueries.stagingsComputed == base + 1,
      "matching fingerprint adopts the assignment table without a Lloyd pass")
    assert(a2 == a1, "adopted assignments are identical")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("SCALED (three-level) assignment table: adopts on match, re-fits when the corpus grows") {
    val dir = Files.createTempDirectory("stage_km2l")
    dir.toFile.deleteOnExit()
    val corpus = dir.toString
    Tables.embeddings(spark, sf("sf0.001"))
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val table = "graft_km2l_asg_" + math.abs(corpus.hashCode).toString
    def asg() = spark.table(SimilarityQueries.stageKmeansScaledAssign(spark, corpus))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val base = PipelineQueries.stagingsComputed
    val a1 = asg()
    assert(PipelineQueries.stagingsComputed == base + 1, "first call runs the three-level chain")
    assert(a1.size == 500 && a1.values.toSet.size > 8,
      s"k follows N (500/32 -> 15 cells seeded): ${a1.values.toSet.size}")

    PipelineQueries.resetStageCache()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val a2 = asg()
    assert(PipelineQueries.stagingsComputed == base + 1,
      "matching fingerprint adopts without a three-level pass")
    assert(a2 == a1, "adopted assignments are identical")

    // the re-fit law is part of the fingerprint: GROW the corpus — a fresh
    // process (memo cleared; within-process consumers are memo-free by
    // contract) must re-fingerprint and recompute the stale fit (wrong k,
    // wrong content xor), never serve it
    PipelineQueries.resetStageCache()
    Tables.embeddings(spark, sf("sf0.001"))
      .unionByName(Tables.embeddings(spark, sf("sf0.001"))
        .select((col("vec_id") + 500L).as("vec_id"), col("embedding"), col("label")))
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val a3 = asg()
    assert(PipelineQueries.stagingsComputed == base + 2,
      "grown corpus re-fingerprints and recomputes")
    assert(a3.size == 1000, s"re-fit covers the grown corpus: ${a3.size}")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("cross-artifact adoption: a valid scaled PQ index supplies the fit assignment with ZERO new fits (SCALING r10)") {
    val dir = Files.createTempDirectory("stage_xadopt")
    dir.toFile.deleteOnExit()
    val corpus = dir.toString
    Tables.embeddings(spark, sf("sf0.001"))
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val kmTable = "graft_km2l_asg_" + math.abs(corpus.hashCode).toString
    val pqTable = "graft_pqs_index_" + math.abs(corpus.hashCode).toString

    // build the PQ-scaled serve index first (one fit inside its builder)
    spark.table(SimilarityQueries.stagePqIndexScaled(spark, corpus))
    val members = spark.table(pqTable).filter(col("kind") === "member")
      .collect().map(r => r.getLong(4) -> r.getLong(2)).toMap
    assert(members.size == 500, "pq index carries the full membership")

    // fresh-process simulation, km2l stage absent: its builder must ADOPT
    // the pq index's member rows, not run a second three-level fit
    PipelineQueries.resetStageCache()
    spark.sql(s"DROP TABLE IF EXISTS $kmTable")
    val loc = java.nio.file.Paths.get(java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath, kmTable)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    val fitsBefore = SimilarityQueries.scaledFitsComputed
    val asg = spark.table(SimilarityQueries.stageKmeansScaledAssign(spark, corpus))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(SimilarityQueries.scaledFitsComputed == fitsBefore,
      "a valid PQ stage means the km2l build runs zero fits")
    assert(asg == members, "adopted assignment is byte-identical to the index membership")
    spark.sql(s"DROP TABLE IF EXISTS $kmTable")
    spark.sql(s"DROP TABLE IF EXISTS $pqTable")
  }
}
