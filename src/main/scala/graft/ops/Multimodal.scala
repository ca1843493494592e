package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column support: image/audio/video payloads ride through the
 * pipeline as opaque `binary` columns with typed metadata, and decode /
 * feature-extraction / frame-sampling run as partition-local batch
 * operators.
 *
 * Image, audio AND video decode are REAL: images go through the JDK's
 * `javax.imageio` registry (PNG/JPEG/BMP/GIF ship with every JVM) reading
 * dimensions and color model from container headers WITHOUT decoding pixel
 * data; audio is a manual RIFF/WAVE chunk walk (PCM WAV is the one audio
 * container the JDK can both produce and parse natively); and video is a
 * manual RIFF/AVI walk over Motion-JPEG clips (each frame a complete JPEG
 * the JDK's own codec decodes) — header metadata, container-seeked frame
 * sampling, and pixel-level per-frame features all genuinely computed.
 * Embeddings: [[embedMedia]] is a REAL training-free embedding — the
 * decoded per-modality features (pixel histogram / PCM stats / frame
 * features) pushed through a seeded Johnson-Lindenstrauss random
 * projection and L2-normalized. A LEARNED model still cannot ship in a
 * JDK-only sandbox; the swap point is documented on [[embedMedia]] and
 * the byte-fold [[extractFeatures]] stays as the content-hash-style
 * fallback that needs no decode.
 *
 * Scale notes:
 *  - blobs never pass through a shuffle unless the caller asks for one;
 *    all operators here are narrow (mapPartitions/flatMap);
 *  - `spark.sql.files.maxPartitionBytes` governs scan parallelism for blob
 *    tables; re-balance skewed blob sizes with repartitionByRange on the
 *    id, not on the binary column;
 *  - batch shape: operators process a whole partition per task through an
 *    iterator (per-partition codec setup, not per-row — the registry scan
 *    / model session opens once where `partitionContext()` is called).
 */
object Multimodal {

  /** A media row: payload + envelope metadata. */
  case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      source: String)

  case class ImageMeta(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      format: String)

  case class AudioMeta(
      media_id: Long,
      sample_rate: Int,
      n_samples: Long,
      channels: Int)

  case class MediaFeature(
      media_id: Long,
      kind: String,
      feature: Array[Float]) // per-modality features or JL embedding

  case class VideoFrame(
      media_id: Long,
      frame_index: Int,
      frame_bytes: Array[Byte])

  case class VideoMeta(
      media_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      fps: Double)

  case class FrameLuma(
      media_id: Long,
      frame_idx: Int,
      luma: Double,   // BT.601 mean luma of the frame
      is_cut: Boolean) // |luma - prev luma| > threshold (frame 0: false)

  /** A parsed MJPEG-AVI clip: header dims/rate + the raw JPEG frame
    * payloads in stream order. */
  private[ops] case class AviClip(width: Int, height: Int, fps: Double,
      frames: Vector[Array[Byte]])

  /** Deterministic payloads for tests/fixtures — ALL real containers
    * (ImageIO-encoded PNG/JPEG/BMP; hand-written PCM WAV; hand-written
    * MJPEG AVI with ImageIO-encoded JPEG frames) so every decode path
    * exercises an actual codec. */
  def syntheticPayload(id: Long, kind: String, size: Int = 4096): Array[Byte] =
    kind match {
      case "image" => syntheticImage(id)
      case "audio" => syntheticWav(id)
      case "video" => syntheticAvi(id)
      case _ => pseudoBytes(id, kind, size)
    }

  private def pseudoBytes(id: Long, kind: String, size: Int): Array[Byte] = {
    val out = new Array[Byte](size)
    var h = id * 0x9e3779b97f4a7c15L + kind.hashCode
    var i = 0
    while (i < size) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = (h >>> 33).toByte
      i += 1
    }
    out
  }

  /** Deterministic tiny image, encoded as a real PNG/JPEG/BMP container:
    * width/height/format derive from the id, pixels are a fixed gradient. */
  def syntheticImage(id: Long): Array[Byte] = {
    val fmt = Seq("png", "jpg", "bmp")(((id / 3) % 3).toInt)
    val w = 16 + (id % 5).toInt * 8
    val h = 16 + (id % 3).toInt * 8
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 31 + y * 17 + id.toInt * 7) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Deterministic PCM16 WAV: hand-written RIFF header + a fixed-seed
    * triangle-ish wave, so rate/channels/sample-count are id-derivable. */
  def syntheticWav(id: Long): Array[Byte] = {
    val rate = Seq(16000, 22050, 44100)(((id / 3) % 3).toInt)
    val channels = 1 + ((id / 3) % 2).toInt
    val nSamples = 160 + ((id / 3) % 5).toInt * 40
    val dataLen = nSamples * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples * channels) {
      bb.putShort((((i * 97 + id * 13) % 8192) - 4096).toShort)
      i += 1
    }
    bb.array()
  }

  /** Deterministic tiny Motion-JPEG AVI: id-derived dims/rate/length, each
    * frame an ImageIO-encoded JPEG of a per-frame-shifted gradient (so
    * inter-frame motion is nonzero). Real RIFF/AVI layout: hdrl (avih +
    * vids strl) then a movi list of 00dc chunks. */
  def syntheticAvi(id: Long): Array[Byte] = {
    val w = 16 + (id % 4).toInt * 4
    val h = 12 + (id % 3).toInt * 4
    val fps = Seq(10, 12, 25)((id % 3).toInt)
    val nFrames = 4 + (id % 3).toInt * 2
    val frames = (0 until nFrames).map { fi =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (x * 29 + y * 13 + fi * 41 + id.toInt * 7) & 0xffffff)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    encodeAviMjpeg(w, h, fps, frames)
  }

  /** Serialize JPEG frames into a minimal standards-shaped MJPEG AVI. */
  def encodeAviMjpeg(w: Int, h: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val maxFrame = frames.foldLeft(0)((m, f) => math.max(m, f.length))
    def padded(n: Int): Int = n + (n & 1)
    val moviData = 4 + frames.map(f => 8 + padded(f.length)).sum
    val hdrlData = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffData = 4 + (8 + hdrlData) + (8 + moviData)
    val bb = java.nio.ByteBuffer.allocate(8 + riffData)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = { bb.put(s.getBytes("US-ASCII")); () }
    fcc("RIFF"); bb.putInt(riffData); fcc("AVI ")
    fcc("LIST"); bb.putInt(hdrlData); fcc("hdrl")
    fcc("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
      .putInt(frames.size).putInt(0).putInt(1).putInt(maxFrame)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    fcc("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); fcc("strl")
    fcc("strh"); bb.putInt(56)
    fcc("vids"); fcc("MJPG")
    bb.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps) // dwScale / dwRate: fps = rate/scale
      .putInt(0).putInt(frames.size).putInt(maxFrame).putInt(0).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    fcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    fcc("MJPG")
    bb.putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    fcc("LIST"); bb.putInt(moviData); fcc("movi")
    frames.foreach { f =>
      fcc("00dc"); bb.putInt(f.length); bb.put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
    }
    bb.array()
  }

  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      MediaRecord(i, kind, syntheticPayload(i, kind), s"src${i % 4}")
    }
  }

  /** For operators whose codec/model context opens once per partition (the
    * point of the mapPartitions batch shape); image decode does its
    * equivalent inline (registry cache off, readers disposed per row). */
  private def partitionContext(): Unit = ()

  /**
   * Decode image container headers for all image rows through the JDK's
   * `javax.imageio` registry (PNG/JPEG/BMP/GIF in every JVM; additional
   * formats plug in via the ImageIO SPI with no code change here). Batch
   * shape: iterator-to-iterator, one registry configuration per partition.
   * Header-only: dimensions and color model come from the container header
   * WITHOUT decoding pixel data — at 100 TB the scan cost is the blob read,
   * not a full decode. Undecodable payloads are dropped, not failed: one
   * corrupt blob must not kill a billion-row decode job.
   */
  def decodeImageMeta(media: Dataset[MediaRecord]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      it.flatMap { r =>
        val stream = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.content))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(stream)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(stream, true, true)
              val channels =
                try reader.getImageTypes(0).next().getColorModel.getNumComponents
                catch { case _: Exception => 3 }
              Some(ImageMeta(r.media_id, reader.getWidth(0), reader.getHeight(0),
                channels, reader.getFormatName.toLowerCase))
            } catch { case scala.util.control.NonFatal(_) => None } // ImageIO throws RuntimeExceptions on corrupt blobs (CMMException, IAE), not just IOException
            finally reader.dispose()
          }
        } finally stream.close()
      }
    }
  }

  /** Parse the RIFF/WAVE header — a manual little-endian chunk walk, so
    * non-canonical chunk orders (LIST/fact before data) still parse.
    * Undecodable payloads are dropped, same policy as decodeImageMeta. */
  def decodeAudioMeta(media: Dataset[MediaRecord]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      partitionContext()
      it.flatMap { r =>
        parseWavHeader(r.content).map { case (rate, channels, samples) =>
          AudioMeta(r.media_id, rate, samples, channels)
        }
      }
    }
  }

  /** RIFF/WAVE header fields: (sample_rate, channels, n_samples per
    * channel), or None if the bytes are not a parseable PCM WAV. */
  private[ops] def parseWavHeader(b: Array[Byte]): Option[(Int, Int, Long)] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var rate = -1
    var channels = -1
    var bits = -1
    var dataLen = -1L
    while (pos + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val id = tag(pos)
      val sz = u32(pos + 4)
      // a corrupt u32 size (negative after .toInt, or past the buffer)
      // would stall or reverse the walk — one bad blob must not hang the
      // task, so bail to None instead
      if (sz > b.length) return None
      if (id == "fmt " && pos + 24 <= b.length) {
        channels = u16(pos + 10)
        rate = u32(pos + 12).toInt
        bits = u16(pos + 22)
      } else if (id == "data") dataLen = sz
      pos += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
    }
    if (rate <= 0 || channels <= 0 || bits < 8 || dataLen < 0) None
    else Some((rate, channels, dataLen / (channels.toLong * (bits / 8))))
  }

  /**
   * Fixed-dimension CONTENT-HASH features: a deterministic byte-fold over
   * the raw blob, needing no decode — the cheap fallback when payloads
   * are undecodable or a pipeline only needs a locality-insensitive
   * content signature. For a decode-aware embedding use [[embedMedia]];
   * a learned model batches rows through an ONNX/JNI session opened per
   * partition at the same seam.
   */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      partitionContext()
      it.map { r =>
        val f = new Array[Float](dim)
        var i = 0
        while (i < r.content.length) {
          f(i % dim) += ((r.content(i) & 0xff) - 128) / 128.0f
          i += 1
        }
        MediaFeature(r.media_id, r.kind, f)
      }
    }
  }

  /**
   * Sample every `stride`-th frame from video payloads by REAL container
   * seeking: the RIFF/AVI walk locates each Motion-JPEG frame chunk and
   * emits its complete JPEG bytes (decodable downstream by ImageIO). The
   * one-to-many explode stays narrow — blobs never shuffle. Unparseable
   * payloads are dropped, matching the image/audio decoders.
   */
  def sampleFrames(media: Dataset[MediaRecord],
      stride: Int = 4): Dataset[VideoFrame] = {
    // driver-side, like every other operator guard: stride=0 would throw
    // per-task on executors ("step cannot be 0") and a negative stride
    // would silently emit zero frames for every clip
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      partitionContext()
      it.flatMap { r =>
        parseAviFrames(r.content).toSeq.flatMap { clip =>
          clip.frames.indices.by(stride).map { fi =>
            VideoFrame(r.media_id, fi, clip.frames(fi))
          }
        }
      }
    }
  }

  /** Decode MJPEG-AVI container headers: dimensions, frame count, frame
    * rate. Header + chunk-walk only — no pixel decode. Same drop-on-
    * undecodable policy as the other decoders. */
  def decodeVideoMeta(media: Dataset[MediaRecord]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      partitionContext()
      it.flatMap { r =>
        parseAviFrames(r.content).map(c =>
          VideoMeta(r.media_id, c.width, c.height, c.frames.size, c.fps))
      }
    }
  }

  /**
   * REAL video features from container-seeked, ImageIO-decoded sampled
   * frames: `[n_frames, mean sampled-frame luma (BT.601), mean |luma
   * delta| between consecutive sampled frames (a motion proxy),
   * duration_seconds]`. Batch shape: whole-partition iterator, one codec
   * configuration per partition, fixed-dim output — blobs never shuffle.
   */
  /** BT.601 luma of one packed-RGB pixel — the single definition shared
    * by every image path here ([[imageDHash]], scene-cut mean luma). */
  private def lumaOf(rgb: Int): Double =
    0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
      0.114 * (rgb & 0xff)

  /** Decode one JPEG frame and return its BT.601 mean luma; None when
    * ImageIO can't decode it (the shared drop-on-undecodable policy). */
  private def frameMeanLuma(frame: Array[Byte]): Option[Double] = {
    val img = try javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frame))
    catch { case scala.util.control.NonFatal(_) => null } // corrupt-blob RuntimeExceptions included
    if (img == null) None
    else {
      var sum = 0.0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          sum += lumaOf(img.getRGB(x, y))
          x += 1
        }
        y += 1
      }
      Some(sum / (img.getWidth.toLong * img.getHeight))
    }
  }

  def videoFeatures(media: Dataset[MediaRecord],
      stride: Int = 2): Dataset[MediaFeature] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        parseAviFrames(r.content).flatMap { clip =>
          val lumas = clip.frames.indices.by(stride)
            .flatMap(fi => frameMeanLuma(clip.frames(fi)))
          if (lumas.isEmpty) None
          else {
            val meanLuma = lumas.sum / lumas.size
            val motion =
              if (lumas.size < 2) 0.0
              else lumas.iterator.sliding(2).withPartial(false)
                .map(p => math.abs(p(1) - p(0))).sum / (lumas.size - 1)
            Some(MediaFeature(r.media_id, "video", Array(
              clip.frames.size.toFloat, meanLuma.toFloat, motion.toFloat,
              (clip.frames.size / clip.fps).toFloat)))
          }
        }
      }
    }
  }

  /**
   * Scene-cut detection over EVERY frame of each clip: per-frame BT.601
   * mean luma, with frame i flagged as a cut when
   * `|luma(i) - luma(i-1)| > threshold` (the classic hard-cut detector —
   * luma-delta thresholding; frame 0 is never a cut). Emits one row per
   * frame so downstream shot segmentation / keyframe sampling can window
   * over `(media_id, frame_idx)` without re-decoding.
   *
   * Scale shape: a clip's frames live inside its ONE record, so the
   * whole detector — decode, luma, delta — runs in-task per record with
   * zero shuffle; blobs never leave their input partition and only
   * (id, idx, luma, flag) rows come out. Same drop-on-undecodable
   * policy as the other decoders (a frame ImageIO rejects is skipped;
   * deltas chain across the gap on decoded frames only).
   */
  def videoSceneCuts(media: Dataset[MediaRecord],
      threshold: Double = 10.0): Dataset[FrameLuma] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        parseAviFrames(r.content).toSeq.flatMap { clip =>
          val decoded = clip.frames.indices.flatMap { fi =>
            frameMeanLuma(clip.frames(fi)).map(fi -> _)
          }
          decoded.zipWithIndex.map { case ((fi, luma), di) =>
            val cut = di > 0 && math.abs(luma - decoded(di - 1)._2) > threshold
            FrameLuma(r.media_id, fi, luma, cut)
          }
        }
      }
    }
  }

  /** Walk a RIFF/AVI container: `avih` gives dims, a `vids` `strh` gives
    * the exact frame rate (dwRate/dwScale), and the `movi` list's
    * `..dc`/`..db` chunks are the Motion-JPEG frames. Corrupt sizes
    * (negative after truncation, past the buffer, or non-advancing) bail
    * out — one bad blob must not stall a billion-row decode job. */
  private[ops] def parseAviFrames(b: Array[Byte]): Option[AviClip] = {
    def u32(i: Int): Long = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var width = -1
    var height = -1
    var usec = -1L
    var scale = 0L
    var rate = 0L
    val frames = Vector.newBuilder[Array[Byte]]
    // explicit range stack instead of recursion: nesting depth is
    // attacker-controlled in a corrupt container
    var stack = List((12, math.min(b.length.toLong, 8L + u32(4)).toInt))
    while (stack.nonEmpty) {
      val (pos, end) = stack.head
      if (pos + 8 > end) stack = stack.tail
      else {
        val sz = u32(pos + 4)
        if (sz < 0 || pos + 8 + sz > b.length) return None
        val next = pos + 8 + sz.toInt + (sz.toInt & 1)
        stack = (next, end) :: stack.tail
        val id = tag(pos)
        if (id == "LIST" && sz >= 4) {
          val lt = tag(pos + 8)
          if (lt == "hdrl" || lt == "strl" || lt == "movi")
            stack = (pos + 12, pos + 8 + sz.toInt) :: stack
        } else if (id == "avih" && sz >= 40) {
          usec = u32(pos + 8)
          width = u32(pos + 8 + 32).toInt
          height = u32(pos + 8 + 36).toInt
        } else if (id == "strh" && sz >= 56 && tag(pos + 8) == "vids") {
          scale = u32(pos + 8 + 20)
          rate = u32(pos + 8 + 24)
        } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db"))
            && sz > 0) {
          frames += java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + sz.toInt)
        }
      }
    }
    val fps = if (scale > 0 && rate > 0) rate.toDouble / scale
      else if (usec > 0) 1e6 / usec else -1.0
    if (width <= 0 || height <= 0 || fps <= 0) None
    else Some(AviClip(width, height, fps, frames.result()))
  }

  /** One row of [[imageDHash]]. */
  final case class ImageHash(media_id: Long, dhash: Long, bits_set: Int)

  /**
   * 64-bit difference hash (dHash) — the standard perceptual image-dedup
   * fingerprint: sample a 9x8 grid of BT.601 luma values by
   * nearest-neighbor at integer cell centers (`((2c+1)·W)/18`,
   * `((2r+1)·H)/16` — exact integer index arithmetic any engine can
   * replay), then bit `r·8+c` = luma(r,c) > luma(r,c+1). Row-adjacent
   * comparisons make the hash invariant to global brightness shifts;
   * Hamming distance approximates visual difference, so near-dup
   * grouping reuses the SimHash machinery ([[Dedup.hamming]] /
   * pigeonhole banding) on the returned long.
   *
   * Scale shape: pure per-row decode+map inside the blob's partition —
   * zero shuffle, blobs never move (same contract as the other decoders).
   * Undecodable payloads are dropped, matching [[decodeImageMeta]].
   */
  def imageDHash(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
          catch { case scala.util.control.NonFatal(_) => null } // corrupt-blob RuntimeExceptions included
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val grid = Array.tabulate(8, 9) { (row, c) =>
            lumaOf(img.getRGB(((2 * c + 1) * w) / 18, ((2 * row + 1) * h) / 16))
          }
          var bits = 0L
          var row = 0
          while (row < 8) {
            var c = 0
            while (c < 8) {
              if (grid(row)(c) > grid(row)(c + 1)) bits |= 1L << (row * 8 + c)
              c += 1
            }
            row += 1
          }
          Some(ImageHash(r.media_id, bits, java.lang.Long.bitCount(bits)))
        }
      }
    }
  }

  /**
   * REAL image features: a normalized 8-bin-per-channel RGB histogram
   * (24 dims) from a full ImageIO pixel decode. The batch shape is what a
   * model embedding would use (decode once per row inside a partition
   * iterator, emit a fixed-dim vector on the small projection); the
   * feature itself is classical but genuinely computed from pixels.
   * Undecodable payloads are dropped, matching [[decodeImageMeta]].
   */
  def imageFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
          catch { case scala.util.control.NonFatal(_) => null } // corrupt-blob RuntimeExceptions included
        if (img == null) None
        else {
          val hist = new Array[Float](24)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              hist(((rgb >> 16) & 0xff) >> 5) += 1f
              hist(8 + (((rgb >> 8) & 0xff) >> 5)) += 1f
              hist(16 + ((rgb & 0xff) >> 5)) += 1f
              x += 1
            }
            y += 1
          }
          val n = (img.getWidth * img.getHeight).toFloat
          var i = 0
          while (i < 24) { hist(i) /= n; i += 1 }
          Some(MediaFeature(r.media_id, "image", hist))
        }
      }
    }
  }

  /**
   * REAL audio features from decoded PCM16 samples:
   * `[rms, zero-crossing rate, mean amplitude, duration_seconds]`.
   * Same drop-on-undecodable policy as the other decoders.
   */
  def audioFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      partitionContext()
      it.flatMap { r =>
        parseWavSamples(r.content).map { case (rate, channels, samples) =>
          var sumSq = 0.0
          var sumAbs = 0.0
          var zc = 0
          var i = 0
          while (i < samples.length) {
            val s = samples(i).toDouble
            sumSq += s * s
            sumAbs += math.abs(s)
            // zero crossings are PER CHANNEL: samples interleave across
            // channels, so the previous sample of THIS channel sits
            // `channels` positions back — comparing adjacent interleaved
            // samples would count sign flips BETWEEN channels (a stereo
            // signal with constant +L/-R and zero true crossings would
            // read as maximal ZCR)
            if (i >= channels && ((samples(i - channels) < 0) != (s < 0))) zc += 1
            i += 1
          }
          val n = math.max(samples.length, 1)
          MediaFeature(r.media_id, "audio", Array(
            math.sqrt(sumSq / n).toFloat,
            zc.toFloat / n,
            (sumAbs / n).toFloat,
            samples.length.toFloat / channels / rate))
        }
      }
    }
  }

  /** Decode a PCM16 WAV's samples (interleaved across channels):
    * (sample_rate, channels, samples) or None if unparseable. */
  private[ops] def parseWavSamples(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var rate = -1
    var channels = -1
    var bits = -1
    var dataAt = -1
    var dataLen = -1
    while (pos + 8 <= b.length && (rate < 0 || dataAt < 0)) {
      val id = tag(pos)
      val sz = u32(pos + 4).toInt
      // corrupt sizes (negative after truncation, or past the buffer)
      // must not stall or reverse the walk — bail on the blob instead
      if (sz < 0 || sz > b.length) return None
      if (id == "fmt " && pos + 24 <= b.length) {
        channels = u16(pos + 10)
        rate = u32(pos + 12).toInt
        bits = u16(pos + 22)
      } else if (id == "data") { dataAt = pos + 8; dataLen = sz }
      pos += 8 + sz + (sz & 1)
    }
    if (rate <= 0 || channels <= 0 || bits != 16 || dataAt < 0 ||
        dataAt + dataLen > b.length) return None
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((b(dataAt + 2 * i) & 0xff) | (b(dataAt + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Some((rate, channels, out))
  }

  /** The seven checked-in container fixtures (real PNG/JPEG/BMP images,
    * PCM WAVs, and MJPEG AVIs under `/media` on the classpath, regenerated
    * by GenMediaFixtures) as a Dataset — the deterministic input of the
    * m_* oracle queries: every decode output over them is a constant a
    * VALUES oracle can assert. */
  /**
   * Perceptual near-duplicate image pairs: dHash each image, then the
   * guaranteed-recall pigeonhole band join over the 64-bit hashes
   * ([[graft.ops.Dedup.fingerprintNearDups]]) — image dedup at corpus
   * scale without ever comparing pixels across rows. Blobs never shuffle
   * (the hash is computed in the blob's partition); the join moves 8-byte
   * keys + ids only.
   */
  def imageNearDups(media: Dataset[MediaRecord], maxDist: Int = 4)
      : org.apache.spark.sql.DataFrame =
    graft.ops.Dedup.fingerprintNearDups(
      imageDHash(media).toDF(), "media_id", "dhash", maxDist)

  /**
   * Deterministic synthetic near-dup image set: two groups of gradient
   * images whose variants bump a single dHash SAMPLE PIXEL (the 9x8 grid
   * samples odd coordinates at 18x16, so one bumped pixel flips exactly
   * one comparison bit), plus two structurally distinct patterns. Pure
   * pixel formulas — any independent implementation regenerates the same
   * pixels, so the oracle can re-derive every hash and pair from scratch.
   */
  def neardupImageBytes: Seq[(Long, Array[Byte])] = {
    val W = 18; val H = 16
    def png(v: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(W, H,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until H; x <- 0 until W) {
        val g = math.max(0, math.min(255, v(x, y)))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def asc(x: Int, y: Int): Int = x * 14
    def desc(x: Int, y: Int): Int = 250 - x * 14
    def bump(base: (Int, Int) => Int, pts: Set[(Int, Int)], d: Int)(
        x: Int, y: Int): Int = if (pts((x, y))) base(x, y) + d else base(x, y)
    Seq(
      100L -> png(asc),
      101L -> png(bump(asc, Set((7, 5)), 90)),            // grid (r=2,c=3)
      102L -> png(bump(asc, Set((7, 5), (11, 13)), 90)),  // + grid (r=6,c=5)
      103L -> png(desc),
      104L -> png(bump(desc, Set((5, 3)), -90)),          // grid (r=1,c=2)
      105L -> png((x, _) => if ((x / 3) % 2 == 0) 230 else 10),
      106L -> png((x, y) => if (((x + y) / 3) % 2 == 0) 10 else 230))
  }

  /** [[neardupImageBytes]] as a [[MediaRecord]] dataset. */
  def neardupMedia(spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    neardupImageBytes.map { case (id, bytes) =>
      MediaRecord(id, "image", bytes, "synthetic")
    }.toDS()
  }

  def fixtureMedia(spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/media/$name")
      require(in != null, s"missing classpath resource /media/$name")
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    }
    Seq(
      MediaRecord(0, "image", res("img-4x6.png"), "fixture"),
      MediaRecord(1, "image", res("img-8x5.jpg"), "fixture"),
      MediaRecord(2, "image", res("img-7x3.bmp"), "fixture"),
      MediaRecord(3, "audio", res("tone-16000-mono.wav"), "fixture"),
      MediaRecord(4, "audio", res("tone-22050-stereo.wav"), "fixture"),
      MediaRecord(5, "video", res("clip-16x12-12fps.avi"), "fixture"),
      MediaRecord(6, "video", res("clip-20x12-25fps.avi"), "fixture")).toDS()
  }

  /** Deterministic projection coefficient for (modality salt, input dim
    * `i`, output dim `d`): one LCG step over a mixed seed, mapped to
    * [-1, 1). Closed-form so an independent oracle can re-derive the
    * matrix without sharing code. */
  private[ops] def jlCoef(salt: Int, i: Int, d: Int): Double = {
    val seed = salt.toLong * 1000003L + i.toLong * 8191L + d.toLong
    val bits = (seed * 6364136223846793005L + 1442695040888963407L) >>> 11
    bits.toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  private[ops] def modalitySalt(kind: String): Int = kind match {
    case "image" => 1
    case "audio" => 2
    case "video" => 3
    case _ => 0
  }

  /**
   * Fixed-dimension media embedding over the DECODED per-modality
   * features — a real, training-free embedding, not a stub: classical
   * features (24-bin pixel histogram / PCM rms-zcr-amplitude-duration /
   * frame luma-motion) are projected to `dim` by a seeded
   * Johnson-Lindenstrauss random projection (distance-preserving in
   * expectation; the classical random-features trick) and L2-normalized,
   * so cosine over the output is meaningful across rows of one modality.
   * Every step is deterministic double math, exactly replayable by an
   * independent oracle ([[graft.tools.GenMediaOracle]] re-derives the
   * constants from scratch).
   *
   * A LEARNED encoder slots in by replacing the projection fold with an
   * ONNX/JNI session opened per partition at the `partitionContext()`
   * seam — the batching, schema and partitioning shape stay exactly as
   * here. Scale shape: narrow end to end (decode + project per
   * partition); blobs never shuffle.
   */
  def embedMedia(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    imageFeatures(media)
      .union(audioFeatures(media))
      .union(videoFeatures(media))
      .map { mf =>
        val f = mf.feature
        val salt = modalitySalt(mf.kind)
        val acc = new Array[Double](dim)
        var d = 0
        while (d < dim) {
          var s = 0.0
          var i = 0
          while (i < f.length) { s += f(i).toDouble * jlCoef(salt, i, d); i += 1 }
          acc(d) = s
          d += 1
        }
        var norm = 0.0
        var j = 0
        while (j < dim) { norm += acc(j) * acc(j); j += 1 }
        norm = math.sqrt(norm)
        val out = new Array[Float](dim)
        if (norm > 0) {
          j = 0
          while (j < dim) { out(j) = (acc(j) / norm).toFloat; j += 1 }
        }
        MediaFeature(mf.media_id, mf.kind, out)
      }
  }

  /** Join features back to envelope metadata — the only shuffle in the
    * module, on the small (id, feature) projection, never on blobs. */
  def featureTable(media: Dataset[MediaRecord], dim: Int = 16): DataFrame = {
    val env = media.toDF.select(col("media_id"), col("kind"), col("source"),
      length(col("content")).as("content_bytes"))
    extractFeatures(media, dim).toDF
      .select(col("media_id"), col("feature"))
      .join(env, Seq("media_id"))
  }
}
