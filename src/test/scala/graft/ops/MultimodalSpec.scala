package graft.ops

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import Multimodal._

  private lazy val media = syntheticMedia(spark, 90).cache()

  test("synthetic media covers all kinds with binary payloads") {
    import spark.implicits._
    val kinds = media.groupByKey(_.kind).count().collect().toMap
    assert(kinds === Map("image" -> 30L, "audio" -> 30L, "video" -> 30L))
    assert(media.head().content.length === 4096)
  }

  test("image metadata decode: one row per image, plausible header fields") {
    val metas = decodeImageMeta(media).collect()
    assert(metas.length === 30)
    assert(metas.forall(m => m.width >= 64 && m.height >= 64 && m.channels === 3))
    assert(metas.map(_.format).toSet.subsetOf(Set("jpeg", "png")))
  }

  test("audio metadata decode") {
    val metas = decodeAudioMeta(media).collect()
    assert(metas.length === 30)
    assert(metas.forall(m => Set(16000, 22050, 44100).contains(m.sample_rate)))
  }

  test("feature extraction: fixed dim, deterministic across runs") {
    val f1 = extractFeatures(media, dim = 16).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = extractFeatures(media, dim = 16).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1.size === 90)
    assert(f1.values.forall(_.size === 16))
    assert(f1 === f2)
  }

  test("frame sampling explodes video payloads without touching other kinds") {
    val frames = sampleFrames(media, stride = 4, frameSize = 256).collect()
    // 4096/256 = 16 frames, stride 4 -> 4 per video, 30 videos
    assert(frames.length === 120)
    assert(frames.forall(_.frame_bytes.length === 256))
    assert(frames.map(_.frame_index).toSet === Set(0, 4, 8, 12))
  }

  test("featureTable joins envelope metadata on the small projection") {
    val ft = featureTable(media)
    assert(ft.count() === 90)
    assert(ft.columns.toSet ===
      Set("media_id", "feature", "kind", "source", "content_bytes"))
    // blobs themselves are not in the joined output
    assert(!ft.columns.contains("content"))
  }
}
