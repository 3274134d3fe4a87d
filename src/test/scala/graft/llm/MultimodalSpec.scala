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
}
