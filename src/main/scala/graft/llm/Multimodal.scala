package graft.llm

import org.apache.spark.sql.Dataset

/** An opaque media payload (image/audio/video bytes) with its id. */
case class MediaAsset(doc_id: Long, payload: Array[Byte])

/** One decoded, sampled frame. `pixels_crc` stands in for extracted
  * features (a real decoder would emit a feature vector / tensor column). */
case class DecodedFrame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
    pixels_crc: Long)

/** Typed decode stage for multimodal columns.
  *
  * The Spark-side plumbing is the deliverable: binary payloads travel as
  * `Array[Byte]` columns, the decode runs per PARTITION (so a real codec
  * can amortize native-library init across the whole batch, the same
  * batching contract as an Arrow-based vectorized UDF), and the output is
  * a typed frame Dataset partitioned like its input (no shuffle).
  *
  * The codec itself is a STUB — this environment has no image/audio
  * libraries — producing metadata and a checksum deterministically from
  * the payload bytes. Swapping in a real decoder changes only the body of
  * `decodeOne`; schema, batching, and partitioning stay as tested.
  */
object Multimodal {

  def decodeStub(assets: Dataset[MediaAsset], frameStep: Int = 4): Dataset[DecodedFrame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // real build: init the native codec ONCE here, then stream the batch
      batch.flatMap(decodeOne(_, frameStep))
    }
  }

  /** STUB: deterministic fake decode (payload hash → metadata + frame
    * checksums). A real implementation would parse the container format. */
  private def decodeOne(a: MediaAsset, frameStep: Int): Iterator[DecodedFrame] = {
    val h = java.util.Arrays.hashCode(a.payload).toLong & 0xffffffffL
    val width = 320 + (h % 8).toInt * 160
    val height = 240 + (h % 6).toInt * 120
    val nFrames = 1 + (h % 24).toInt
    Iterator.range(0, nFrames, frameStep)
      .map(i => DecodedFrame(a.doc_id, i, width, height, h * 31 + i))
  }
}
