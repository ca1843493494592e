package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column support: image/audio/video payloads ride through the
 * pipeline as opaque `binary` columns with typed metadata, and decode /
 * feature-extraction / frame-sampling run as partition-local batch
 * operators.
 *
 * The Spark-side plumbing — schemas, encoders, `mapPartitions` batch shape,
 * partition sizing — is real and tested. The actual codec calls are STUBS
 * (this environment ships no image/audio libraries): every `decode*` below
 * derives its output deterministically from the payload bytes where a real
 * implementation would call the codec. Each stub is marked `STUB:`.
 *
 * Scale notes:
 *  - blobs never pass through a shuffle unless the caller asks for one;
 *    all operators here are narrow (mapPartitions/flatMap);
 *  - `spark.sql.files.maxPartitionBytes` governs scan parallelism for blob
 *    tables; re-balance skewed blob sizes with repartitionByRange on the
 *    id, not on the binary column;
 *  - batch shape: operators process a whole partition per task through an
 *    iterator (no per-row JNI/codec setup in a real implementation — the
 *    codec context would be opened once per partition, exactly where
 *    `partitionContext()` is called below).
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
      feature: Array[Float]) // fixed-dim embedding, model-stubbed

  case class VideoFrame(
      media_id: Long,
      frame_index: Int,
      frame_bytes: Array[Byte])

  /** Deterministic synthetic payload for tests/fixtures: a fake container
    * header (magic, dims) followed by pseudo-random bytes. */
  def syntheticPayload(id: Long, kind: String, size: Int = 4096): Array[Byte] = {
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

  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      MediaRecord(i, kind, syntheticPayload(i, kind), s"src${i % 4}")
    }
  }

  /** STUB: a real implementation opens the codec/model context once per
    * partition here (the whole point of the mapPartitions batch shape). */
  private def partitionContext(): Unit = ()

  private def b(bytes: Array[Byte], i: Int): Int = bytes(i % bytes.length) & 0xff

  /**
   * Decode image headers for all image rows. Batch shape: one decoder
   * context per partition, iterator-to-iterator (no materialization).
   * STUB: dimensions are derived from payload bytes; a real build calls
   * e.g. an ImageIO/turbojpeg binding on `r.content`.
   */
  def decodeImageMeta(media: Dataset[MediaRecord]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      partitionContext()
      it.map { r =>
        val w = 64 + (b(r.content, 0) % 32) * 16
        val h = 64 + (b(r.content, 1) % 32) * 16
        ImageMeta(r.media_id, w, h, 3, if (b(r.content, 2) % 2 == 0) "jpeg" else "png")
      }
    }
  }

  /** STUB: audio header decode, same batch shape as decodeImageMeta. */
  def decodeAudioMeta(media: Dataset[MediaRecord]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      partitionContext()
      it.map { r =>
        val rate = Seq(16000, 22050, 44100)(b(r.content, 0) % 3)
        AudioMeta(r.media_id, rate, r.content.length.toLong * 4, 1 + b(r.content, 1) % 2)
      }
    }
  }

  /**
   * Fixed-dimension feature extraction (the embed step of a training
   * pipeline). STUB: features are a deterministic byte-fold; a real build
   * batches rows through an ONNX/JNI model session opened per partition.
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
   * Sample every `stride`-th frame from video payloads. Demonstrates the
   * one-to-many (explode) shape without shuffling blobs. STUB: frames are
   * fixed-size slices of the payload; a real build seeks the container.
   */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 4,
      frameSize: Int = 256): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      partitionContext()
      val nFrames = r.content.length / frameSize
      (0 until nFrames by stride).map { fi =>
        VideoFrame(r.media_id, fi,
          java.util.Arrays.copyOfRange(r.content, fi * frameSize, (fi + 1) * frameSize))
      }
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
