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
}
