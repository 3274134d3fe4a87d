package graft.llm

import org.apache.spark.sql.functions._

/** Stage decomposition of the multimodal decode chains: generation cost vs
  * codec decode vs pixel access, per modality — so per-task work
  * (guide §1.2 step 2) is optimized where the time actually goes.
  * Usage: `runMain graft.llm.MmProbe [sfDir]`. */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(cpus, "mm-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.autoTuneShuffle(spark, d, cpus)
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.core.Tables.documents(spark, d)
    import LlmHash._
    val spec = docs
      .select(col("doc_id"), md5(col("text")).as("checksum"))
      .withColumn("h", expr(sparkH("checksum")))
      .select(col("doc_id"), expr("cast(8 + h % 8 as int)").as("w"),
        expr("cast(8 + h % 6 as int)").as("ht"),
        expr("cast(2 + h % 5 as int)").as("nf"), expr("h % 65536").as("seed"))
      .as[(Long, Int, Int, Int, Long)]

    for (lap <- Seq("cold", "warm")) {
      time(s"$lap spec only")(noop(spec.toDF()))
      // generation alone: build the GIF bytes, emit only their length
      time(s"$lap makeGif only") {
        noop(spec.map { case (id, w, ht, nf, seed) =>
          (id, Multimodal.makeGif(w, ht, nf, seed).length) }.toDF())
      }
      // generation + full frame decode + ahash
      time(s"$lap makeGif+decode+ahash") {
        noop(Multimodal.gifFrameHashesN(spec.map { case (id, w, ht, nf, seed) =>
          MediaAsset(id, Multimodal.makeGif(w, ht, nf, seed)) }).toDF())
      }
      // BMP leg
      val bspec = docs
        .select(col("doc_id"), md5(col("text")).as("checksum"))
        .withColumn("h", expr(sparkH("checksum")))
        .select(col("doc_id"), expr("cast(8 + h % 8 as int)").as("w"),
          expr("cast(8 + h % 6 as int)").as("ht"), expr("h % 65536").as("seed"))
        .as[(Long, Int, Int, Long)]
      time(s"$lap makeBmp only") {
        noop(bspec.map { case (id, w, ht, seed) =>
          (id, Multimodal.makeBmp(w, ht, seed).length) }.toDF())
      }
      time(s"$lap makeBmp+decode+ahash") {
        noop(Multimodal.imageHashes(bspec.map { case (id, w, ht, seed) =>
          MediaAsset(id, Multimodal.makeBmp(w, ht, seed)) }).toDF())
      }
      // WAV leg
      val aspec = docs
        .select(col("doc_id"), md5(col("text")).as("checksum"))
        .withColumn("h", expr(sparkH("checksum")))
        .select(col("doc_id"), expr("cast(256 + h % 256 as int)").as("n"),
          expr("h % 65536").as("seed"))
        .as[(Long, Int, Long)]
      time(s"$lap makeWav only") {
        noop(aspec.map { case (id, n, seed) =>
          (id, Multimodal.makeWav(Multimodal.genSamples(n, seed), 8000).length) }.toDF())
      }
      time(s"$lap makeWav+decode+fp") {
        noop(Multimodal.decodeAudioFp(aspec.map { case (id, n, seed) =>
          MediaAsset(id, Multimodal.makeWav(Multimodal.genSamples(n, seed), 8000)) }).toDF())
      }
    }
    spark.stop()
  }
}
