package graft.tools

import org.apache.spark.sql.functions._

/** Scaling-curve data generator: writes an N× replica of an existing SF
  * dir's `documents` + `embeddings` + `events` tables (the inputs of the
  * heavy bench family and the ev_* event-analytics family) so SCALING.md
  * can cover further decades without touching the read-only driver
  * testdata.
  *
  * Replication must not manufacture a pathological 100%-near-dup corpus:
  * replica r > 0 suffixes every WORD with the replica digit, which shifts
  * essentially every character shingle (the dedup families' 5-gram unit),
  * so replicas are ordinary distinct documents to MinHash/SimHash/Jaccard
  * — corpus-level dup statistics stay comparable to the source SF instead
  * of collapsing into 10-cliques. Embeddings get a small deterministic
  * per-replica component shift (same reasoning in vector space); every
  * 50th vec_id remains a query (shift is a multiple of 50), so the query
  * batch scales with the corpus like a real SF increase.
  *
  * Usage: runMain graft.tools.GenScale [srcDir] [outDir] [reps<=10]
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sfx10")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    require(reps >= 1 && reps <= 10, "replica digit must stay a single char")
    val idShift = 10000000L // multiple of 50 (query sel) and of nothing else load-bearing
    val spark = graft.core.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-genscale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docReps = (0 until reps).map { r =>
      if (r == 0) docs
      else docs.select(
        (col("doc_id") + lit(r * idShift)).as("doc_id"),
        // suffix each word with the replica digit -> new shingle universe
        expr(s"array_join(transform(split(text, ' '), w -> concat(w, '$r')), ' ')").as("text"),
        col("lang"), col("source"), lit(0L).as("n_chars"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    docReps.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embReps = (0 until reps).map { r =>
      if (r == 0) emb
      else emb.select(
        (col("vec_id") + lit(r * idShift)).as("vec_id"),
        expr(s"transform(embedding, v -> cast(v + ${r * 0.0011} as float))").as("embedding"),
        col("label"))
    }
    embReps.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events: replicas shift user_id (and event_id for uniqueness) but keep
    // timestamps — growth adds USERS, the realistic scale direction for the
    // ev_* family (per-user history length is activity-bounded, not
    // corpus-bounded; a ts-shifted replica would instead grow every user's
    // history 10× and misrepresent the user-partitioned window cost).
    val ev = graft.core.Tables.load(spark, src, "events")
    val evReps = (0 until reps).map { r =>
      if (r == 0) ev
      else ev.withColumn("user_id", col("user_id") + lit(r * idShift))
        .withColumn("event_id", col("event_id") + lit(r * idShift))
    }
    evReps.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val nd = spark.read.parquet(s"$out/documents.parquet").count()
    val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
    val nv = spark.read.parquet(s"$out/events.parquet").count()
    println(s"[genscale] wrote $out: $nd documents, $ne embeddings, $nv events ($reps x $src)")
    spark.stop()
  }
}
