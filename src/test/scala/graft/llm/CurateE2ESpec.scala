package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The serving trio — prepStream's gate+dedup, lmScoreStream's bucket,
  * publishStream's exactly-once lang-partitioned landing — composed as ONE
  * streaming query ([[StreamingCorpusPrep.curateStream]] →
  * [[Publish.publishStream]]) and proven across a mid-stream checkpoint
  * restart (VERDICT r5 #6):
  *
  *   - exactly-once row counts on the PUBLISHED files (replayed input rows
  *     after the restart do not re-publish — dedup state and sink commit
  *     log both restore from the one checkpoint);
  *   - batch-card parity: per-lang published counts and every doc's
  *     (n_tokens, nll, bucket) equal an INDEPENDENT driver-side
  *     recomputation from the pinned model tables (not a circular reuse
  *     of the streaming code).
  */
class CurateE2ESpec extends SparkSpec {

  override val timeLimit = org.scalatest.time.Span(300, org.scalatest.time.Seconds)

  test("curate trio publishes exactly once across a checkpoint restart, matching the batch card") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // reference corpus trains the pinned serving tables (lm gate stance)
    val ref = Seq(
      (1L, "en", "the cat sat on the mat and the dog ran to the cat"),
      (2L, "en", "the dog ran fast and the cat sat still on the mat"),
      (3L, "en", "sun moon star dawn dusk noon light dark sky cloud rain wind"),
      (4L, "de", "der hund und die katze sitzen auf der matte im haus heute"),
      (5L, "de", "die katze und der vogel singen heute im haus auf der matte"))
      .toDF("doc_id", "lang", "text")
    val scored = TextQueries.lmScoreDF(ref)
    val (model, stats) = TextQueries.lmModelFrames(ref)
    val cutoffs = TextQueries.lmCutoffsDF(scored)

    // ingest docs: 11/12 clean en, 13 clean de, 14 junk (quality-gated
    // out: one repeated token), 15 an exact dup of 11's text (arrives
    // later -> dedup drops it), 16 clean en arriving AFTER the restart,
    // and a replay of the whole first batch (exactly-once under test)
    val d11 = "the cat sat on the mat and the dog ran fast today"
    val d12 = "sun moon star light dark sky cloud rain wind dawn dusk noon"
    val d13 = "der hund und die katze singen heute im haus auf der matte"
    val d14 = "spam spam spam spam spam spam spam spam spam spam spam spam"
    val d16 = "the dog and the cat sat still on the mat at noon"
    val batch1 = Seq(
      LangDocEvent(11L, 1000L, "en", d11),
      LangDocEvent(12L, 1100L, "en", d12),
      LangDocEvent(13L, 1200L, "de", d13),
      LangDocEvent(14L, 1300L, "en", d14),
      LangDocEvent(15L, 1400L, "en", d11)) // exact dup of 11

    val outDir = Files.createTempDirectory("curate_out").toString + "/data"
    val ckpt = Files.createTempDirectory("curate_ckpt").toString
    val mem = MemoryStream[LangDocEvent]
    def start() = Publish.publishStream(
      StreamingCorpusPrep.curateStream(mem.toDS(), model, stats, cutoffs),
      outDir, ckpt).start()

    val q1 = start()
    mem.addData(batch1: _*)
    q1.processAllAvailable()
    q1.stop() // mid-stream: dedup state + sink log live in the checkpoint

    val q2 = start()
    // replay batch 1 verbatim (at-least-once upstream), plus the new doc
    // and a flush sentinel that closes every scoring window
    mem.addData(batch1 :+ LangDocEvent(16L, 1500L, "en", d16)
      :+ LangDocEvent(999L, 100000L, "en", d12.reverse): _*)
    q2.processAllAvailable()
    q2.stop()

    // published dataset (read through the sink's _spark_metadata commit
    // log): survivors exactly once — 11, 12, 13, 16 + the sentinel;
    // 14 quality-gated, 15 dedup'd, replays not re-published
    val pub = spark.read.parquet(outDir).filter(col("doc_id") =!= 999L)
      .select("doc_id", "lang", "n_tokens", "nll", "bucket")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toList
    assert(pub.map(_._1).sorted == List(11L, 12L, 13L, 16L),
      s"exactly-once survivors: ${pub.sortBy(_._1)}")

    // lang partition discipline on disk
    val langDirs = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langDirs.toList == List("lang=de", "lang=en"), s"partitions: ${langDirs.toList}")

    // batch-card parity: independent driver-side recompute from the
    // pinned tables (same add-1/2 smoothing + round-to-micro chain)
    val mc = model.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val st = stats.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val co = cutoffs.collect().map(r => r.getString(0) ->
      ((Option(r.get(1)).map(_.asInstanceOf[Double]), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    def expected(lang: String, text: String): (Long, Double, String) = {
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
      val (n, v) = st(lang)
      val sqSum = toks.map { t =>
        val c = mc.getOrElse((lang, t), 0L)
        math.round(-math.log((c + 0.5) / (n + 0.5 * v)) * 1e6)
      }.sum
      val nll = sqSum.toDouble / (1e6 * toks.size)
      val (c1, c2) = co(lang)
      val bucket = if (c1.exists(nll <= _)) "head"
        else if (c2.exists(nll <= _)) "middle" else "tail"
      (toks.size.toLong, nll, bucket)
    }
    val docs = Map(11L -> ("en", d11), 12L -> ("en", d12), 13L -> ("de", d13), 16L -> ("en", d16))
    pub.foreach { case (id, (lang, nTok, nll, bucket)) =>
      val (elang, etext) = docs(id)
      val (en, enll, ebucket) = expected(elang, etext)
      assert(lang == elang && nTok == en && nll == enll && bucket == ebucket,
        s"doc $id: published ($lang, $nTok, $nll, $bucket) != expected ($elang, $en, $enll, $ebucket)")
    }
  }
}
