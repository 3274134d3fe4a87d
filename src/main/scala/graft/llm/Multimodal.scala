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
    * checksums). A real implementation would parse the container format.
    *
    * The hash chain is the SAME md5 fold the mm_frames SQL twin uses
    * (`md5(payload)` → `md5(hex)` → first 15 hex chars as BIGINT), so the
    * typed decode path is oracle-reproducible bit for bit — the
    * mm_decode_agg query hash-gates this exact function against DuckDB. */
  private def decodeOne(a: MediaAsset, frameStep: Int): Iterator[DecodedFrame] = {
    val checksum = md5Hex(a.payload)
    val h = java.lang.Long.parseLong(
      md5Hex(checksum.getBytes("UTF-8")).substring(0, 15), 16)
    val width = (320 + (h % 8) * 160).toInt
    val height = (240 + (h % 6) * 120).toInt
    val nFrames = (1 + h % 24).toInt
    val crcBase = h % LlmHash.P // keep crc*31 clear of Long overflow
    Iterator.range(0, nFrames, frameStep)
      .map(i => DecodedFrame(a.doc_id, i, width, height, crcBase * 31 + i))
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
}
