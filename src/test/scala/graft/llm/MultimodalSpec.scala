package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("decodeStub emits deterministic frame rows with the decode schema") {
    import spark.implicits._
    val assets = Seq(
      MediaAsset(1L, "fake-image-bytes-aaaa".getBytes("UTF-8")),
      MediaAsset(2L, "fake-video-bytes-bbbb".getBytes("UTF-8"))).toDS()
    val frames1 = Multimodal.decodeStub(assets, frameStep = 2).collect().toSet
    val frames2 = Multimodal.decodeStub(assets, frameStep = 2).collect().toSet
    assert(frames1 == frames2, "stub decode must be deterministic")
    assert(frames1.nonEmpty)
    // every asset produced at least frame 0 with plausible metadata
    Seq(1L, 2L).foreach { id =>
      val fs = frames1.filter(_.doc_id == id)
      assert(fs.exists(_.frame_idx == 0), s"asset $id missing frame 0")
      assert(fs.forall(f => f.width >= 320 && f.height >= 240))
      // sampled every 2nd frame: indices are even
      assert(fs.forall(_.frame_idx % 2 == 0))
    }
    // distinct payloads should (here) decode to distinct checksums
    val crcs = frames1.groupBy(_.doc_id).map { case (_, fs) => fs.map(_.pixels_crc).min }
    assert(crcs.toSet.size == 2)
  }

  test("makeBmp -> ImageIO round trip recovers every pixel channel exactly") {
    // per-pixel check (stronger than the query's sum): the JDK codec must
    // read back exactly the channels the generator wrote, including the
    // bottom-up row order and 4-byte row padding (w=3 -> rowSize 12, w=4
    // -> no padding; both covered)
    for ((w, h, seed) <- Seq((3, 2, 0L), (4, 3, 77L), (15, 13, 65535L))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.makeBmp(w, h, seed)))
      assert(img != null, s"JDK ImageIO must decode the generated BMP ($w x $h)")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 255) == (seed + 31 * x + 7 * y) % 256, s"R at ($x,$y) seed=$seed")
        assert(((rgb >> 8) & 255) == (seed + 13 * x + 3 * y) % 256, s"G at ($x,$y) seed=$seed")
        assert((rgb & 255) == (seed + 5 * x + 11 * y) % 256, s"B at ($x,$y) seed=$seed")
      }
    }
  }

  test("decodeImages computes the pixel sum over a distributed dataset") {
    import spark.implicits._
    val assets = Seq(MediaAsset(1L, Multimodal.makeBmp(3, 2, 10L)),
      MediaAsset(2L, Multimodal.makeBmp(4, 3, 0L))).toDS()
    val got = Multimodal.decodeImages(assets).collect()
      .map(d => d.doc_id -> (d.width, d.height, d.pixel_sum)).toMap
    def expectedSum(w: Int, h: Int, seed: Long) =
      (for (y <- 0 until h; x <- 0 until w) yield
        (seed + 31 * x + 7 * y) % 256 + (seed + 13 * x + 3 * y) % 256 +
          (seed + 5 * x + 11 * y) % 256).sum
    assert(got(1L) == ((3L, 2L, expectedSum(3, 2, 10L))))
    assert(got(2L) == ((4L, 3L, expectedSum(4, 3, 0L))))
  }

  test("perceptual hash: a locally-edited copy stays within small Hamming; different images do not") {
    import spark.implicits._
    val base = Multimodal.makeBmp(16, 16, 42L)
    // local edit: blank one pixel's three channels in the pixel-data area
    // (offset 54) — a watermark-sized change, not a re-render
    val edited = base.clone()
    edited(54) = 0; edited(55) = 0; edited(56) = 0
    val other = Multimodal.makeBmp(16, 16, 17341L)
    val hashes = Multimodal.imageHashes(Seq(
        MediaAsset(1L, base), MediaAsset(2L, edited), MediaAsset(3L, other)).toDS())
      .collect().map(h => h.doc_id -> ((h.hash_hi, h.hash_lo))).toMap
    def hamming(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(hamming(hashes(1L), hashes(2L)) <= 4,
      s"one-pixel edit must stay within the near-dup radius: ${hashes(1L)} vs ${hashes(2L)}")
    assert(hamming(hashes(1L), hashes(3L)) > 4,
      s"a different image must not collide: ${hashes(1L)} vs ${hashes(3L)}")
    // halves stay inside 32 bits (the SQL-sign-safety contract)
    assert(hashes.values.forall(h =>
      h._1 >= 0 && h._1 < (1L << 32) && h._2 >= 0 && h._2 < (1L << 32)))
  }

  test("WAV round trip: silence, loud square wave, and a partial last window") {
    import spark.implicits._
    import Multimodal.{AudioWin, SilenceEnergy}
    // doc 1: pure silence (all samples at the 128 midpoint), 2.5 windows
    // worth -> every window silent incl. the partial one, peak 0.
    // doc 2: a +/-100 square wave, exactly 2 windows -> nothing silent,
    // peak 100, energy = n * 100^2 exactly.
    val silent = Array.fill(AudioWin * 2 + AudioWin / 2)(128)
    val loud = Array.tabulate(AudioWin * 2)(i => if (i % 2 == 0) 228 else 28)
    val assets = Seq(
      MediaAsset(1L, Multimodal.makeWav(silent, 8000)),
      MediaAsset(2L, Multimodal.makeWav(loud, 16000))).toDS()
    val out = Multimodal.decodeAudio(assets).collect().map(a => a.doc_id -> a).toMap
    val s1 = out(1L)
    assert(s1.n_samples == silent.length && s1.sample_rate == 8000L)
    assert(s1.n_windows == 3L && s1.n_silent == 3L, "partial last window still counts")
    assert(s1.total_energy == 0L && s1.peak == 0L)
    val s2 = out(2L)
    assert(s2.n_samples == loud.length && s2.sample_rate == 16000L)
    assert(s2.n_windows == 2L && s2.n_silent == 0L)
    assert(s2.total_energy == loud.length.toLong * 100 * 100 && s2.peak == 100L)
    // the silence threshold is the documented constant
    assert(SilenceEnergy == AudioWin.toLong * 16 * 16)
  }

  test("audio fingerprint: a locally-edited signal stays within small Hamming; different signals do not") {
    import spark.implicits._
    val base = Multimodal.genSamples(400, 12345L)
    val edited = base.clone(); edited(100) = (edited(100) + 40) % 256 // one sample nudged
    val other = Multimodal.genSamples(400, 99999L)
    val assets = Seq(
      MediaAsset(1L, Multimodal.makeWav(base, 8000)),
      MediaAsset(2L, Multimodal.makeWav(edited, 8000)),
      MediaAsset(3L, Multimodal.makeWav(other, 8000))).toDS()
    val fps = Multimodal.decodeAudioFp(assets).collect().map(f => f.doc_id -> f).toMap
    def hamming(a: Multimodal.AudioFp, b: Multimodal.AudioFp): Int =
      java.lang.Long.bitCount(a.fp_hi ^ b.fp_hi) + java.lang.Long.bitCount(a.fp_lo ^ b.fp_lo)
    val near = hamming(fps(1L), fps(2L))
    val far = hamming(fps(1L), fps(3L))
    assert(near <= 4, s"one edited sample touches at most 2 windows -> <=4 delta bits, got $near")
    assert(far > 10, s"an unrelated signal diverges broadly, got $far")
    // halves stay inside their SQL-sign-safe ranges
    assert(fps.values.forall(f =>
      f.fp_hi >= 0 && f.fp_hi < (1L << 31) && f.fp_lo >= 0 && f.fp_lo < (1L << 32)))
  }

  test("GIF sequence round trip: every decoded frame matches the generation formula; corrupt container fails loud (VERDICT r7 #4)") {
    import spark.implicits._
    val (w, h, nf, seed) = (9, 7, 4, 123L)
    val gif = Multimodal.makeGif(w, h, nf, seed)
    assert(new String(gif.take(3), "US-ASCII") == "GIF", "real container magic")
    val frames = Multimodal.decodeGifFrames(Seq(MediaAsset(1L, gif)).toDS())
      .collect().sortBy(_.frame_idx)
    assert(frames.length == nf, s"all $nf frames decode: ${frames.length}")
    assert(frames.forall(f => f.width == w && f.height == h))
    val want = (0 until nf).map { f =>
      (for (x <- 0 until w; y <- 0 until h)
        yield 3L * ((seed + 31L * x + 7L * y + 97L * f) % 256)).sum
    }
    frames.zip(want).foreach { case (fr, s) =>
      assert(fr.pixel_sum == s, s"frame ${fr.frame_idx}: ${fr.pixel_sum} vs $s") }
    // a corrupt container (mangled magic) must kill the task, not pass
    val bad = gif.clone(); bad(0) = 'X'.toByte; bad(1) = 'Y'.toByte
    val e = intercept[Exception] {
      Multimodal.decodeGifFrames(Seq(MediaAsset(2L, bad)).toDS()).collect()
    }
    assert(e.getMessage.contains("no decoder recognizes") ||
      (e.getCause != null && e.getCause.getMessage.contains("no decoder recognizes")) ||
      e.getMessage.contains("doc 2"), s"loud failure names the doc: ${e.getMessage}")
  }

  test("GIF frame hashes: identical sequences match per frame; a re-seeded sequence does not (video near-dup signature)") {
    import spark.implicits._
    val a = Multimodal.makeGif(12, 9, 3, 777L)
    val b = Multimodal.makeGif(12, 9, 3, 777L)   // identical generation
    val c = Multimodal.makeGif(12, 9, 3, 54321L) // different content
    val hs = Multimodal.gifFrameHashes(
        Seq(MediaAsset(1L, a), MediaAsset(2L, b), MediaAsset(3L, c)).toDS())
      .collect().groupBy(_.doc_id)
    assert(hs(1L).length == 3 && hs(2L).length == 3 && hs(3L).length == 3)
    def m(id: Long) = hs(id).map(h => h.frame_idx -> ((h.hash_hi, h.hash_lo))).toMap
    assert(m(1L) == m(2L), "identical videos must hash identically per frame")
    // different seed -> at least one frame differs (aHash discriminates)
    assert(m(1L) != m(3L), "distinct videos must not share every frame hash")
    // frame hashes vary WITHIN a sequence too (the 97f term moves content)
    assert(hs(1L).map(h => (h.hash_hi, h.hash_lo)).distinct.length > 1,
      "frames of one sequence are not all identical")
  }

  test("decoder failure on a corrupt WAV container is loud, not silent") {
    import spark.implicits._
    val bad = Multimodal.makeWav(Array.fill(100)(128), 8000)
    bad(0) = 'X'.toByte // break the RIFF magic
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudio(Seq(MediaAsset(9L, bad)).toDS()).collect()
    }
    assert(ex.getMessage != null)
  }

  test("mm_phash_dedup: identical assets cluster under the min-id canonical; distinct stay singleton") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("phashdedup_sf")
    dir.toFile.deleteOnExit()
    // docs 1 and 2 share TEXT -> identical checksum -> identical generated
    // BMP -> Hamming 0 -> one visual family with doc 1 canonical; doc 3's
    // different text makes a different image -> singleton, self-canonical
    Seq((1L, "same picture text"), (2L, "same picture text"), (3L, "a different image"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("mm_phash_dedup")(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out(1L) == ((1L, 1)), s"canonical of the pair: $out")
    assert(out(2L) == ((1L, 0)), s"duplicate folds under min id: $out")
    assert(out(3L) == ((3L, 1)), s"distinct image stays singleton: $out")

    // the audio twin sees the same identity structure: same text ->
    // same generated WAV -> Hamming-0 fingerprints -> one cluster
    val audio = graft.SparkEntry.queries("mm_audio_dedup")(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(audio(1L) == ((1L, 1)) && audio(2L) == ((1L, 0)),
      s"identical recordings fold under the min id: $audio")
    assert(audio(3L)._2 == 1, s"distinct recording self-canonical: $audio")
  }

  /** md5 hex of a UTF-8 string — the test-side twin of Spark's `md5()`. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The fixture-spec hash h = first 15 hex chars of md5(md5(text)). */
  private def specH(text: String): Long =
    java.lang.Long.parseLong(md5hex(md5hex(text)).take(15), 16)

  test("scene GIF: frame-hash deltas separate within-scene from boundary; mm_scene_cuts recovers the generated structure exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // unit level: a planted spec — every within-scene delta sits at or
    // under the enumerated max (12), every boundary at or above the
    // enumerated min (17), so threshold 14 classifies all of them
    val (w, ht, nf, sl, seed) = (10, 9, 12, 4, 12345L)
    val assets = Seq(MediaAsset(7L, Multimodal.makeSceneGif(w, ht, nf, sl, seed))).toDS()
    val hs = Multimodal.gifFrameHashes(assets).collect().sortBy(_.frame_idx)
    assert(hs.length == nf, s"decoder must report all $nf frames")
    hs.sliding(2).foreach { case Array(a, b) =>
      val d = java.lang.Long.bitCount(a.hash_hi ^ b.hash_hi) +
        java.lang.Long.bitCount(a.hash_lo ^ b.hash_lo)
      if (b.frame_idx % sl == 0) assert(d >= 17, s"boundary at ${b.frame_idx} read $d")
      else assert(d <= 12, s"within-scene at ${b.frame_idx} read $d")
    }
    // query level: the detected structure equals the generation ground
    // truth for every doc (guaranteed corpus-wide by the enumeration)
    val dir = java.nio.file.Files.createTempDirectory("scenecuts_sf")
    dir.toFile.deleteOnExit()
    val texts = Map(1L -> "scene text one", 2L -> "another video", 3L -> "third clip")
    texts.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("mm_scene_cuts")(spark, dir.toString).collect()
    assert(out.length == texts.size)
    out.foreach { r =>
      val h = specH(texts(r.getLong(0)))
      val nfE = 8 + (h % 9).toInt
      val slE = 3 + ((h % 7) % 3).toInt
      val scenesE = (nfE + slE - 1) / slE
      assert(r.getLong(1) == nfE, s"n_frames for doc ${r.getLong(0)}: $r")
      assert(r.getLong(3) == scenesE, s"n_scenes for doc ${r.getLong(0)}: $r")
      assert(r.getLong(4) == slE, s"longest_scene for doc ${r.getLong(0)}: $r")
    }
  }

  test("speech WAV: decoded activity segmentation equals the generation ground truth; zero-active recordings report zero segments") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("audioseg_sf")
    dir.toFile.deleteOnExit()
    val texts = Map(1L -> "utterance alpha", 2L -> "utterance beta", 3L -> "utterance gamma")
    texts.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("mm_audio_segments")(spark, dir.toString).collect()
    assert(out.length == texts.size)
    out.foreach { r =>
      // independent in-test windowing + run-length over the generator
      val h = specH(texts(r.getLong(0)))
      val n = 1024 + (h % 16).toInt * 64
      val samples = Multimodal.genSpeechSamples(n, h % 65536)
      val nw = n / Multimodal.AudioWin
      val acts = (0 until nw).map { wi =>
        (0 until Multimodal.AudioWin).map { j =>
          val a = samples(wi * Multimodal.AudioWin + j) - 128L; a * a
        }.sum >= Multimodal.SilenceEnergy
      }
      val nseg = acts.zipWithIndex.count { case (a, i) => a && (i == 0 || !acts(i - 1)) }
      var longest = 0; var run = 0
      acts.foreach { a => run = if (a) run + 1 else 0; longest = math.max(longest, run) }
      assert(r.getLong(1) == nw, s"n_windows for doc ${r.getLong(0)}: $r")
      assert(r.getLong(2) == acts.count(identity), s"n_active for doc ${r.getLong(0)}: $r")
      assert(r.getLong(3) == nseg, s"n_segments for doc ${r.getLong(0)}: $r")
      assert(r.getLong(4) == longest, s"longest_segment for doc ${r.getLong(0)}: $r")
      assert(nseg >= 1, s"fixture should have at least one voiced run: $r")
    }
    // the zero-active edge through the factored core: all windows silent
    val silent = (0 until 8).map(wi => (9L, wi.toLong, 100L)).toDF("doc_id", "w", "energy")
    val z = MultimodalQueries.audioSegmentsOf(silent).collect().head
    assert(z.getLong(1) == 8 && z.getLong(2) == 0 && z.getLong(3) == 0 && z.getLong(4) == 0,
      s"all-silent recording must report zero segments: $z")
  }
}
