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
  * The IMAGE leg is REAL: [[Multimodal.decodeImages]] parses BMP payloads
  * with the JDK's own javax.imageio codec (oracle-gated round trip —
  * mm_imageio_decode). Video/audio decode remains a STUB — no JDK codec
  * exists and this environment has no media libraries — producing metadata
  * and a checksum deterministically from the payload bytes. Swapping in a
  * real av codec changes only the body of `decodeOne`; schema, batching,
  * and partitioning stay as tested.
  */
object Multimodal {

  // ImageIO's createImage{Input,Output}Stream defaults to DISK-backed
  // cache wrappers (FileCacheImage*Stream) around plain byte streams — a
  // temp FILE created and deleted per asset encode/decode. Every payload
  // here is an in-memory byte array of a few KB; force the memory-cache
  // wrappers process-wide (per-task init would race harmlessly but this is
  // a JVM-static switch). Guide §1.2 step 2: per-task work — measured as
  // part of the GIF chain's per-pass cost at sf0.1.
  javax.imageio.ImageIO.setUseCache(false)

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

  // ------------------------------------------------------ real image path
  //
  // The container has no media libraries, but the JDK itself ships a BMP
  // codec in javax.imageio — so the IMAGE leg of the decode stage can be
  // real: generate deterministic 24-bit BMPs (a format simple enough to
  // write by hand), then decode them with ImageIO and emit TRUE
  // width/height plus a pixel checksum. The mm_imageio_decode query
  // hash-gates the round trip: the oracle recomputes the expected
  // dimensions and pixel sum from the generation parameters, so a decoder
  // that misparsed the container (or a generator that miswrote it) fails
  // the gate. The JDK likewise ships a WAV codec (javax.sound.sampled, the
  // same java.desktop module) — so the AUDIO leg is real too: hand-write a
  // canonical 8-bit-PCM mono RIFF/WAVE container, decode it with
  // AudioSystem, and window the decoded samples into integer energies
  // (mm_audio_energy hash-gates the round trip). Only VIDEO stays stubbed
  // (decodeStub) — no JDK codec exists.

  /** One decoded still image: true ImageIO dimensions + sum over all
    * pixels of (r + g + b). */
  case class DecodedImage(doc_id: Long, width: Long, height: Long, pixel_sum: Long)

  /** Deterministic 24-bit uncompressed BMP: pixel (x, y) has channels
    *   r = (seed + 31x + 7y) mod 256
    *   g = (seed + 13x + 3y) mod 256
    *   b = (seed +  5x + 11y) mod 256
    * Rows bottom-up with 4-byte alignment per the BMP spec. */
  def makeBmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && seed >= 0)
    val rowSize = (w * 3 + 3) / 4 * 4
    val fileSize = 54 + rowSize * h
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    buf.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER, positive h = bottom-up
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0).putInt(rowSize * h) // BI_RGB, data size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    var y = h - 1
    while (y >= 0) { // bottom-up storage; (x, y) stays top-left logical
      var x = 0
      while (x < w) {
        buf.put(((seed + 5 * x + 11 * y) % 256).toByte) // B
        buf.put(((seed + 13 * x + 3 * y) % 256).toByte) // G
        buf.put(((seed + 31 * x + 7 * y) % 256).toByte) // R
        x += 1
      }
      var p = w * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** REAL decode: parse each payload with the JDK ImageIO codec. Same
    * mapPartitions batch contract as [[decodeStub]] (a heavier codec would
    * init once per partition here). */
  def decodeImages(assets: Dataset[MediaAsset]): Dataset[DecodedImage] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
        require(img != null, s"ImageIO could not decode payload for doc ${a.doc_id}")
        DecodedImage(a.doc_id, img.getWidth.toLong, img.getHeight.toLong, rgbSum(img))
      }
    }
  }

  /** A 64-bit perceptual average-hash split into two 32-bit halves (bit 63
    * of a packed BIGINT would collide with the sign in SQL engines). */
  case class ImageHash(doc_id: Long, hash_hi: Long, hash_lo: Long)

  /** Integer-exact 8×8 average-hash (aHash) of a decoded image: pixel
    * (x, y) lands in cell (x·8 intdiv w, y·8 intdiv h); a cell's bit is set
    * iff its mean gray (r+g+b) is at least the image's global mean,
    * compared as the integer cross-product s_cell·N_tot ≥ S_tot·n_cell —
    * no division, so an SQL twin over the generation formula reproduces
    * every bit (the mm_phash oracle). Cell c < 32 → hash_hi bit c, else
    * hash_lo bit c−32. */
  def ahash(img: java.awt.image.BufferedImage): (Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val s = new Array[Long](64); val n = new Array[Long](64)
    // Per-pixel getRGB pays a ColorModel->sRGB conversion on EVERY call;
    // the two codec-produced layouts (indexed GIF frames, 3-byte BMP rows)
    // have exact row-batched equivalents (guide §1.2 step 2, per-task
    // work): palette images sum a 256-entry r+g+b LUT over raw indices,
    // 3-sample component images sum the samples directly (r+g+b is
    // order-independent). Any other layout takes the general getRGB path
    // unchanged. Measured 2-3x on the decode+hash stage; bit-identical by
    // construction (the LUT is the same per-index r/g/b getRGB reads).
    val raster = img.getRaster
    img.getColorModel match {
      case icm: java.awt.image.IndexColorModel =>
        val lut = Array.tabulate(icm.getMapSize)(i =>
          icm.getRed(i) + icm.getGreen(i) + icm.getBlue(i))
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          raster.getSamples(0, y, w, 1, 0, row)
          val by8 = (y * 8 / h) * 8
          var x = 0
          while (x < w) {
            val c = by8 + x * 8 / w
            s(c) += lut(row(x)); n(c) += 1
            x += 1
          }
          y += 1
        }
      case _ if img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR =>
        val row = new Array[Int](3 * w)
        var y = 0
        while (y < h) {
          raster.getPixels(0, y, w, 1, row)
          val by8 = (y * 8 / h) * 8
          var x = 0
          while (x < w) {
            val c = by8 + x * 8 / w
            s(c) += row(3 * x) + row(3 * x + 1) + row(3 * x + 2); n(c) += 1
            x += 1
          }
          y += 1
        }
      case _ =>
        var y = 0
        while (y < h) {
          val by8 = (y * 8 / h) * 8
          var x = 0
          while (x < w) {
            val c = by8 + x * 8 / w
            val rgb = img.getRGB(x, y)
            s(c) += ((rgb >> 16) & 255) + ((rgb >> 8) & 255) + (rgb & 255)
            n(c) += 1
            x += 1
          }
          y += 1
        }
    }
    val st = s.sum; val nt = n.sum
    var hi = 0L; var lo = 0L
    var c = 0
    while (c < 64) {
      if (n(c) > 0 && s(c) * nt >= st * n(c)) {
        if (c < 32) hi |= 1L << c else lo |= 1L << (c - 32)
      }
      c += 1
    }
    (hi, lo)
  }

  /** Row-batched r+g+b total over a decoded image — the same two fast
    * layouts as [[ahash]] (palette LUT / 3-sample component), getRGB
    * fallback otherwise. Sum identity: r+g+b per pixel is order- and
    * layout-independent. */
  private def rgbSum(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    var sum = 0L
    img.getColorModel match {
      case icm: java.awt.image.IndexColorModel =>
        val lut = Array.tabulate(icm.getMapSize)(i =>
          icm.getRed(i) + icm.getGreen(i) + icm.getBlue(i))
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          raster.getSamples(0, y, w, 1, 0, row)
          var x = 0
          while (x < w) { sum += lut(row(x)); x += 1 }
          y += 1
        }
      case _ if img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR =>
        val row = new Array[Int](3 * w)
        var y = 0
        while (y < h) {
          raster.getPixels(0, y, w, 1, row)
          var x = 0
          while (x < 3 * w) { sum += row(x); x += 1 }
          y += 1
        }
      case _ =>
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 255) + ((rgb >> 8) & 255) + (rgb & 255)
            x += 1
          }
          y += 1
        }
    }
    sum
  }

  /** Perceptual hashes via the REAL ImageIO decode — the image-near-dup
    * signature builder (the multimodal analog of `simhash_sig`). Same
    * mapPartitions batch contract as [[decodeImages]]. */
  def imageHashes(assets: Dataset[MediaAsset]): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
        require(img != null, s"ImageIO could not decode payload for doc ${a.doc_id}")
        val (hi, lo) = ahash(img)
        ImageHash(a.doc_id, hi, lo)
      }
    }
  }

  // ------------------------------------------------- real multi-frame path
  //
  // The JDK's javax.imageio GIF codec reads AND writes multi-frame GIF
  // natively — so the MULTI-FRAME leg of the decode stage can be real on
  // the same JDK-only stance as BMP and WAV (VERDICT r7 #4): generate
  // deterministic animated GIFs from content-hash parameters, decode REAL
  // frames with an ImageReader sequence, and oracle-gate width / height /
  // frame count / per-frame pixel sums against the generation formula.
  // Frames are 256-gray INDEXED images (GIF's palette model holds at most
  // 256 colors; an explicit gray IndexColorModel makes the round trip
  // LOSSLESS — the writer stores palette indices verbatim, so a decoder
  // mis-parse of the container, the palette, or the frame sequence breaks
  // the hash gate). mm_frames' fake-decode chain remains the documented
  // fallback for codecs the JDK lacks (video containers).

  /** One decoded GIF frame: true decoder-reported index/dimensions and the
    * sum over pixels of (r + g + b) — 3× the gray value. */
  case class DecodedGifFrame(doc_id: Long, frame_idx: Long, width: Long,
      height: Long, pixel_sum: Long)

  /** Deterministic multi-frame GIF: frame f's pixel (x, y) has gray value
    *   v = (seed + 31x + 7y + 97f) mod 256   (r = g = b = v)
    * written as 8-bit indexed frames over an explicit 256-gray palette. */
  def makeGif(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(seed >= 0)
    writeGif(w, h, nFrames)((x, y, f) =>
      ((seed + 31L * x + 7L * y + 97L * f) % 256).toInt)
  }

  /** Scene-structured multi-frame GIF: frames group into scenes of
    * `sceneLen` frames (scene s = f / sceneLen) and pixel (x, y) of frame
    * f has gray value
    *   v = (seed + 31x + 7y + 211·(f/sceneLen) + 5·(f mod sceneLen)) mod 256
    * — WITHIN a scene consecutive frames differ by a +5 near-uniform
    * shift (only pixels wrapping 256 move: small aHash churn, "camera
    * motion"), while a scene BOUNDARY jumps every pixel by 211−5·(sceneLen
    * −1) mod 256 ("hard cut"). The resulting frame-hash Hamming deltas
    * separate PROVABLY for every reachable parameter: enumerating the full
    * space (the delta depends only on ((seed + 211·scene) mod 256, w, h,
    * frame offset) — 256·8·6 base cases) gives max within-scene delta = 12
    * and min boundary delta = 17, so [[SceneCutHamming]] = 14 recovers the
    * generated scene structure exactly on every fixture asset. */
  def makeSceneGif(w: Int, h: Int, nFrames: Int, sceneLen: Int, seed: Long): Array[Byte] = {
    require(sceneLen > 0 && seed >= 0)
    writeGif(w, h, nFrames)((x, y, f) =>
      ((seed + 31L * x + 7L * y + 211L * (f / sceneLen) + 5L * (f % sceneLen)) % 256).toInt)
  }

  /** Frame-hash Hamming threshold between "same scene" (≤ 12 over the
    * whole fixture space, by enumeration) and "cut" (≥ 17). */
  val SceneCutHamming = 14

  /** The 256-gray palette and the GIF writer SPI, resolved once: the
    * per-asset `getImageWritersByFormatName` registry scan and palette
    * rebuild were pure constant work repeated millions of times at scale
    * (guide §1.2 step 2; the r10 probe put generation at ~half the GIF
    * chain's per-pass cost). Both are immutable/stateless — the SPI hands
    * out a fresh writer instance per call. */
  private lazy val grayCm: java.awt.image.IndexColorModel = {
    val gray = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
  }
  private lazy val gifWriterSpi: javax.imageio.spi.ImageWriterSpi = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val spi = w.getOriginatingProvider
    w.dispose()
    spi
  }

  /** Shared lossless indexed-gray GIF writer behind [[makeGif]] and
    * [[makeSceneGif]]: pixel (x, y, f) gray value from `px`. One frame
    * buffer is reused across the sequence (writeToSequence encodes
    * synchronously, so mutating it afterwards is safe) and pixels land in
    * the raster's raw byte buffer — the per-pixel setSample sample-model
    * dispatch was the generation pass's hot frame. */
  private def writeGif(w: Int, h: Int, nFrames: Int)(px: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = gifWriterSpi.createWriterInstance()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayCm)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var f = 0
    while (f < nFrames) {
      var y = 0
      while (y < h) {
        val rowOff = y * w
        var x = 0
        while (x < w) {
          data(rowOff + x) = px(x, y, f).toByte
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** REAL multi-frame decode: parse each payload with the JDK ImageIO GIF
    * reader, emit one typed row per frame (true reported dimensions +
    * integer pixel sum). Fails LOUD on a payload no installed reader
    * recognizes or a container with zero frames — an ingest pipeline must
    * never silently pass corrupt media. Same mapPartitions batch contract
    * as [[decodeImages]]. */
  def decodeGifFrames(assets: Dataset[MediaAsset]): Dataset[DecodedGifFrame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.flatMap { a =>
        // try/finally: the LOUD-failure path (unrecognized payload, zero
        // frames, truncated container) must still release the ImageIO
        // native resources — Spark retries the task and a per-corrupt-asset
        // leak compounds across retries (ADVICE r8)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext, s"no decoder recognizes payload for doc ${a.doc_id}")
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            require(n > 0, s"container holds no frames for doc ${a.doc_id}")
            // eager IndexedSeq: every frame decodes BEFORE the finally
            // closes the stream the iterator would otherwise read from
            val frames = (0 until n).map { i =>
              val img = reader.read(i)
              DecodedGifFrame(a.doc_id, i.toLong, img.getWidth.toLong,
                img.getHeight.toLong, rgbSum(img))
            }
            frames.iterator
          } finally reader.dispose()
        } finally iis.close()
      }
    }
  }

  /** One decoded GIF frame's perceptual hash (the [[ahash]] construction
    * over the frame's pixels) — the video-near-dup signature unit. */
  case class GifFrameHash(doc_id: Long, frame_idx: Long, hash_hi: Long,
      hash_lo: Long)

  /** [[GifFrameHash]] plus the decoder-reported frame COUNT of its
    * container — carried on every frame row so consumers that need nf
    * (the half-alignable-frames video rule) read it off the decode output
    * instead of re-deriving it with a second corpus scan + join. */
  case class GifFrameHashN(doc_id: Long, nf: Long, frame_idx: Long,
      hash_hi: Long, hash_lo: Long)

  /** REAL multi-frame decode → per-frame aHash: the image perceptual-hash
    * chain applied to every frame of the sequence — the building block of
    * video near-dup (frame signatures + temporal structure). Same
    * mapPartitions batch contract and loud-failure stance as
    * [[decodeGifFrames]]. */
  def gifFrameHashes(assets: Dataset[MediaAsset]): Dataset[GifFrameHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.flatMap { a =>
        // same try/finally stance as [[decodeGifFrames]] (ADVICE r8)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext, s"no decoder recognizes payload for doc ${a.doc_id}")
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            require(n > 0, s"container holds no frames for doc ${a.doc_id}")
            val out = (0 until n).map { i =>
              val (hi, lo) = ahash(reader.read(i))
              GifFrameHash(a.doc_id, i.toLong, hi, lo)
            }
            out.iterator
          } finally reader.dispose()
        } finally iis.close()
      }
    }
  }

  /** [[gifFrameHashes]] emitting the decoder-reported frame count on every
    * row ([[GifFrameHashN]]) — one decode pass produces both the per-frame
    * signatures AND nf, so the batch video-near-dup chain needs no second
    * documents scan to attach the alignable-frame denominator. Same
    * mapPartitions batch contract and loud-failure stance. */
  def gifFrameHashesN(assets: Dataset[MediaAsset]): Dataset[GifFrameHashN] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.flatMap { a =>
        // same try/finally stance as [[decodeGifFrames]] (ADVICE r8)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext, s"no decoder recognizes payload for doc ${a.doc_id}")
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            require(n > 0, s"container holds no frames for doc ${a.doc_id}")
            val out = (0 until n).map { i =>
              val (hi, lo) = ahash(reader.read(i))
              GifFrameHashN(a.doc_id, n.toLong, i.toLong, hi, lo)
            }
            out.iterator
          } finally reader.dispose()
        } finally iis.close()
      }
    }
  }

  // ------------------------------------------------------ real audio path

  /** Energy-window length in samples and the silence threshold (a window
    * is "silent" when its Σ(s−128)² sits below avg-amplitude-16, i.e.
    * 64·16²). Mirrored literally in the mm_audio_energy oracle. */
  val AudioWin = 64
  val SilenceEnergy: Long = AudioWin.toLong * 16 * 16

  /** One decoded recording: decoder-REPORTED sample count and rate, plus
    * exact-integer windowed energy stats. */
  case class DecodedAudio(doc_id: Long, n_samples: Long, sample_rate: Long,
      n_windows: Long, total_energy: Long, n_silent: Long, peak: Long)

  /** The deterministic test signal: sample i = (seed + 17i + (i² mod 97))
    * mod 256 — pure integer ops, mirrored in the oracle SQL. */
  def genSamples(n: Int, seed: Long): Array[Int] =
    Array.tabulate(n)(i => ((seed + 17L * i + (i.toLong * i % 97)) % 256).toInt)

  /** Speech-shaped burst length in samples (2 energy windows): sample i
    * belongs to burst i / [[SpeechBurst]]; a burst is VOICED when
    * (seed + 37·burst) mod 4 ≠ 0 (≈ 75 % duty cycle). */
  val SpeechBurst: Int = 2 * AudioWin

  /** Deterministic speech-shaped signal: voiced bursts carry the loud
    * [[genSamples]] formula (window energy ≥ 269 253 over a 2 000-seed
    * sweep), pauses sit at 128 ± 2 (window energy ≤ 130) — so the
    * [[SilenceEnergy]] gate (16 384) classifies every full window
    * unambiguously. Callers pass n as a multiple of [[AudioWin]] so no
    * partial window straddles the decision. Mirrored in the
    * mm_audio_segments oracle SQL. */
  def genSpeechSamples(n: Int, seed: Long): Array[Int] =
    Array.tabulate(n) { i =>
      val burst = i / SpeechBurst
      if ((seed + 37L * burst) % 4 != 0)
        ((seed + 17L * i + (i.toLong * i % 97)) % 256).toInt
      else
        (128 + ((seed + 3L * i) % 5) - 2).toInt
    }

  /** One decoded energy window: exact-integer Σ(s−128)² over an
    * [[AudioWin]]-sample window of the real-decoded signal. */
  case class AudioWindow(doc_id: Long, w: Long, energy: Long)

  /** REAL decode → per-window energy rows: the same WAV parse as
    * [[decodeAudio]] but emitting one typed row per energy window, the
    * input grain of envelope segmentation (voice-activity detection).
    * Same mapPartitions batch contract as [[decodeImages]]. */
  def decodeAudioWindows(assets: Dataset[MediaAsset]): Dataset[AudioWindow] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.flatMap { a =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
          s"unexpected WAV format for doc ${a.doc_id}: $fmt")
        val bytes = in.readAllBytes()
        in.close()
        val nW = (bytes.length + AudioWin - 1) / AudioWin
        val e = new Array[Long](math.max(nW, 1))
        var i = 0
        while (i < bytes.length) {
          val amp = (bytes(i) & 0xFF) - 128L
          e(i / AudioWin) += amp * amp
          i += 1
        }
        (0 until nW).iterator.map(w => AudioWindow(a.doc_id, w.toLong, e(w)))
      }
    }
  }

  /** Canonical 8-bit unsigned PCM mono RIFF/WAVE container around the
    * given samples — simple enough to write by hand, rich enough that a
    * decoder must parse chunk sizes, the fmt block, and the data offset
    * correctly to reproduce the samples. */
  def makeWav(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0)
    val buf = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    tag("RIFF"); buf.putInt(36 + samples.length); tag("WAVE")
    tag("fmt "); buf.putInt(16)
    buf.putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate) // byte rate = rate (8-bit mono)
      .putShort(1).putShort(8) // block align, bits/sample
    tag("data"); buf.putInt(samples.length)
    samples.foreach(s => buf.put((s & 0xFF).toByte))
    buf.array()
  }

  /** Audio-fingerprint window length: 8 samples per energy window gives
    * 32–64 windows for the fixture's 256–511-sample recordings — enough
    * envelope structure for a 63-bit delta fingerprint. */
  val AudioFpWin = 8

  /** One audio fingerprint: energy-DELTA bits (bit w = e_w > e_{w+1}, the
    * Haitsma–Kalker construction at one band), packed into two
    * SQL-sign-safe halves (hi = bits 32..62, lo = bits 0..31). */
  case class AudioFp(doc_id: Long, n_windows: Long, fp_hi: Long, fp_lo: Long)

  /** REAL decode → energy-envelope fingerprint: the audio counterpart of
    * the image aHash. Same WAV parse as [[decodeAudio]], then 8-sample
    * window energies and one bit per consecutive-window comparison — all
    * exact integers, so the oracle can recompute every bit from the
    * generation formula. */
  def decodeAudioFp(assets: Dataset[MediaAsset]): Dataset[AudioFp] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
          s"unexpected WAV format for doc ${a.doc_id}: $fmt")
        val bytes = in.readAllBytes()
        in.close()
        val nW = (bytes.length + AudioFpWin - 1) / AudioFpWin
        val e = new Array[Long](math.max(nW, 1))
        var i = 0
        while (i < bytes.length) {
          val amp = (bytes(i) & 0xFF) - 128L
          e(i / AudioFpWin) += amp * amp
          i += 1
        }
        var hi = 0L
        var lo = 0L
        var w = 0
        while (w + 1 < nW && w < 63) {
          if (e(w) > e(w + 1)) {
            if (w >= 32) hi |= 1L << (w - 32) else lo |= 1L << w
          }
          w += 1
        }
        AudioFp(a.doc_id, nW.toLong, hi, lo)
      }
    }
  }

  /** REAL audio decode: parse each payload with the JDK's WAV codec
    * (javax.sound.sampled), verify the format, and fold the decoded
    * 8-bit samples into [[AudioWin]]-sample energy windows — all exact
    * integer arithmetic (amplitude a = s − 128; window energy Σa²; peak
    * = max |a|). Same mapPartitions batch contract as [[decodeImages]]. */
  def decodeAudio(assets: Dataset[MediaAsset]): Dataset[DecodedAudio] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
          s"unexpected WAV format for doc ${a.doc_id}: $fmt")
        val bytes = in.readAllBytes()
        in.close()
        var i = 0
        var winE = 0L
        var totalE = 0L
        var silent = 0L
        var windows = 0L
        var peak = 0L
        while (i < bytes.length) {
          val amp = (bytes(i) & 0xFF) - 128L
          winE += amp * amp
          if (math.abs(amp) > peak) peak = math.abs(amp)
          i += 1
          if (i % AudioWin == 0 || i == bytes.length) {
            totalE += winE
            if (winE < SilenceEnergy) silent += 1
            windows += 1
            winE = 0L
          }
        }
        DecodedAudio(a.doc_id, bytes.length.toLong, fmt.getSampleRate.toLong,
          windows, totalE, silent, peak)
      }
    }
  }
}
