package graft.ops

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import Multimodal._

  private lazy val media = syntheticMedia(spark, 90).cache()

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/media/$name")
    assert(in != null, s"missing test resource /media/$name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  test("synthetic media covers all kinds with binary payloads") {
    import spark.implicits._
    val kinds = media.groupByKey(_.kind).count().collect().toMap
    assert(kinds === Map("image" -> 30L, "audio" -> 30L, "video" -> 30L))
    // all three kinds are REAL containers now (sizes codec-dependent);
    // video payloads start with the RIFF/AVI magic
    val v = media.filter(_.kind == "video").head().content
    assert(new String(v, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(v, 8, 4, "US-ASCII") === "AVI ")
  }

  test("image decode reads real container headers (dims, channels, format)") {
    val metas = decodeImageMeta(media).collect()
    assert(metas.length === 30) // no image payload failed to decode
    val byId = metas.map(m => m.media_id -> m).toMap
    byId.foreach { case (id, m) =>
      assert(m.width === 16 + (id % 5).toInt * 8, s"width of image $id")
      assert(m.height === 16 + (id % 3).toInt * 8, s"height of image $id")
      assert(m.channels === 3)
    }
    // all three JDK-native encoders round-trip through the header reader
    assert(metas.map(_.format).toSet === Set("png", "jpeg", "bmp"))
  }

  test("audio decode parses real RIFF/WAVE headers") {
    val metas = decodeAudioMeta(media).collect()
    assert(metas.length === 30)
    metas.foreach { m =>
      val id = m.media_id
      assert(m.sample_rate === Seq(16000, 22050, 44100)(((id / 3) % 3).toInt))
      assert(m.channels === 1 + ((id / 3) % 2).toInt)
      assert(m.n_samples === 160L + ((id / 3) % 5).toInt * 40)
    }
  }

  test("checked-in container fixtures decode to their known shapes") {
    import spark.implicits._
    val ds = Seq(
      MediaRecord(0, "image", resource("img-4x6.png"), "fx"),
      MediaRecord(1, "image", resource("img-8x5.jpg"), "fx"),
      MediaRecord(2, "image", resource("img-7x3.bmp"), "fx"),
      MediaRecord(3, "audio", resource("tone-16000-mono.wav"), "fx"),
      MediaRecord(4, "audio", resource("tone-22050-stereo.wav"), "fx")).toDS()
    val img = decodeImageMeta(ds).collect()
      .map(m => m.media_id -> ((m.width, m.height, m.format))).toMap
    assert(img(0) === ((4, 6, "png")))
    assert(img(1) === ((8, 5, "jpeg")))
    assert(img(2) === ((7, 3, "bmp")))
    val aud = decodeAudioMeta(ds).collect()
      .map(m => m.media_id -> ((m.sample_rate, m.channels, m.n_samples))).toMap
    assert(aud(3) === ((16000, 1, 160L)))
    assert(aud(4) === ((22050, 2, 240L)))
  }

  test("undecodable payloads are dropped, not failed") {
    import spark.implicits._
    val junk = Seq(
      MediaRecord(0, "image", Array[Byte](1, 2, 3, 4), "junk"),
      MediaRecord(1, "audio", Array[Byte](1, 2, 3, 4), "junk"),
      MediaRecord(2, "image", resource("img-4x6.png"), "fx")).toDS()
    assert(decodeImageMeta(junk).collect().map(_.media_id).toSeq === Seq(2L))
    assert(decodeAudioMeta(junk).count() === 0)
  }

  test("corrupt RIFF chunk sizes are rejected, not walked forever") {
    // a chunk size of 0xFFFFFFF8 is -8 after .toInt: an unguarded walk
    // advances pos by ZERO and spins the task forever. One corrupt blob
    // must not hang a billion-row decode job — both walks must bail.
    val b = new Array[Byte](64)
    "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
    "WAVE".getBytes("US-ASCII").copyToArray(b, 8)
    "junk".getBytes("US-ASCII").copyToArray(b, 12)
    b(16) = 0xf8.toByte; b(17) = 0xff.toByte
    b(18) = 0xff.toByte; b(19) = 0xff.toByte // chunk size = 0xFFFFFFF8
    assert(parseWavHeader(b) === None)
    assert(parseWavSamples(b) === None)
    // oversized-but-positive size (past the buffer) also bails
    val big = b.clone()
    big(16) = 0xff.toByte; big(17) = 0x7f.toByte; big(18) = 0; big(19) = 0
    assert(parseWavHeader(big) === None)
    assert(parseWavSamples(big) === None)
  }

  test("image features are a real pixel histogram") {
    import spark.implicits._
    // 2x2 image: two pure-red, one pure-green, one pure-blue pixel
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0xff0000)
    img.setRGB(0, 1, 0x00ff00); img.setRGB(1, 1, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ds = Seq(MediaRecord(1, "image", bos.toByteArray, "fx")).toDS()
    val f = imageFeatures(ds).collect().head.feature
    assert(f.length === 24)
    // red channel: 2 pixels in top bin (255>>5=7), 2 in bottom (0>>5=0)
    assert(f(7) === 0.5f && f(0) === 0.5f)
    // green: 1 pixel at 255, 3 at 0; blue: 1 at 255, 3 at 0
    assert(f(8 + 7) === 0.25f && f(8) === 0.75f)
    assert(f(16 + 7) === 0.25f && f(16) === 0.75f)
    assert(math.abs(f.sum - 3.0f) < 1e-5) // each channel sums to 1
  }

  test("audio features are computed from real PCM samples") {
    import spark.implicits._
    def wav(samples: Array[Short], rate: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate)
        .putInt(rate * 2).putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val constant = wav(Array.fill[Short](1600)(1000), 16000)   // 0.1 s
    val alternating = wav(Array.tabulate[Short](1600)(i =>
      if (i % 2 == 0) 1000 else -1000), 16000)
    val ds = Seq(
      MediaRecord(1, "audio", constant, "fx"),
      MediaRecord(2, "audio", alternating, "fx")).toDS()
    val f = audioFeatures(ds).collect().map(m => m.media_id -> m.feature).toMap
    // constant signal: rms = |amplitude|, zero crossings = 0, 0.1 s long
    assert(math.abs(f(1)(0) - 1000f) < 0.01f)
    assert(f(1)(1) === 0f)
    assert(math.abs(f(1)(3) - 0.1f) < 1e-6)
    // alternating sign flips every sample: zcr -> ~1
    assert(f(2)(1) > 0.99f)
    assert(math.abs(f(2)(0) - 1000f) < 0.01f)
  }

  test("stereo zero-crossing rate is per channel, not across interleaving") {
    import spark.implicits._
    // stereo PCM16: constant L=+1000, R=-1000 — NEITHER channel ever
    // crosses zero; counting adjacent interleaved samples would read ~1.0
    def stereoWav(samples: Array[Short], rate: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(2).putInt(rate)
        .putInt(rate * 4).putShort(4).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val interleaved = Array.tabulate[Short](1600)(i =>
      if (i % 2 == 0) 1000 else -1000)
    val ds = Seq(MediaRecord(7, "audio",
      stereoWav(interleaved, 16000), "fx")).toDS()
    val f = audioFeatures(ds).collect().head.feature
    assert(f(1) === 0f, s"stereo constant channels must have zcr 0, got ${f(1)}")
    // and a genuinely-alternating stereo signal (both channels flip each
    // frame) still reads ~1 crossing per comparison
    val bothFlip = Array.tabulate[Short](1600)(i =>
      if ((i / 2) % 2 == 0) 1000 else -1000)
    val ds2 = Seq(MediaRecord(8, "audio",
      stereoWav(bothFlip, 16000), "fx")).toDS()
    val f2 = audioFeatures(ds2).collect().head.feature
    assert(f2(1) > 0.99f)
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

  test("embedMedia: unit-norm JL embedding over decoded features, all modalities") {
    val fixtures = Multimodal.fixtureMedia(spark)
    val e = Multimodal.embedMedia(fixtures).collect()
      .map(f => f.media_id -> f).toMap
    assert(e.size === 7) // 3 images + 2 audios + 2 videos all embed
    e.values.foreach { f =>
      assert(f.feature.length === 16)
      val norm = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"${f.media_id} norm=$norm")
    }
    // the projection is modality-salted: identical feature vectors under
    // different salts must embed differently (no cross-modality collisions)
    assert(Multimodal.jlCoef(1, 0, 0) !== Multimodal.jlCoef(2, 0, 0))
    // deterministic across runs
    val e2 = Multimodal.embedMedia(fixtures).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(e.view.mapValues(_.feature.toSeq).toMap === e2)
    // embeddings separate content within a modality: the two tones (and
    // the three images) map to distinct vectors — near-parallel inputs
    // stay near-parallel under JL (distance preservation), so assert
    // distinctness, not a cosine gap
    assert(e(3L).feature.toSeq !== e(4L).feature.toSeq)
    assert(Set(e(0L), e(1L), e(2L)).map(_.feature.toSeq).size === 3)
  }

  test("frame sampling seeks real MJPEG frames out of the AVI container") {
    val frames = sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    // only video rows explode, at the requested stride
    assert(frames.forall(_.frame_index % 2 == 0))
    val byId = frames.groupBy(_.media_id)
    byId.foreach { case (id, fs) =>
      val nFrames = 4 + (id % 3).toInt * 2
      assert(fs.map(_.frame_index).toSet === (0 until nFrames by 2).toSet)
      // every sampled frame is a complete, decodable JPEG of clip dims
      fs.foreach { f =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f.frame_bytes))
        assert(img != null, s"frame ${f.frame_index} of video $id")
        assert(img.getWidth === 16 + (id % 4).toInt * 4)
        assert(img.getHeight === 12 + (id % 3).toInt * 4)
      }
    }
  }

  test("video decode parses real RIFF/AVI headers and counts frames") {
    val metas = decodeVideoMeta(media).collect()
    assert(metas.length === 30) // no video payload failed to parse
    metas.foreach { m =>
      val id = m.media_id
      assert(m.width === 16 + (id % 4).toInt * 4)
      assert(m.height === 12 + (id % 3).toInt * 4)
      assert(m.n_frames === 4 + (id % 3).toInt * 2)
      assert(m.fps === Seq(10, 12, 25)((id % 3).toInt).toDouble)
    }
  }

  test("video features come from decoded frame pixels") {
    val f = videoFeatures(media, stride = 2).collect()
      .map(m => m.media_id -> m.feature).toMap
    assert(f.size === 30)
    f.foreach { case (id, feat) =>
      assert(feat.length === 4)
      assert(feat(0) === (4 + (id % 3).toInt * 2).toFloat) // n_frames
      assert(feat(1) > 0f && feat(1) < 255f) // mean luma is a real pixel stat
      // consecutive synthetic frames differ -> nonzero motion proxy
      assert(feat(2) > 0f)
      val fps = Seq(10, 12, 25)((id % 3).toInt)
      assert(math.abs(feat(3) - feat(0) / fps) < 1e-5)
    }
  }

  test("corrupt AVI chunk sizes are rejected, not walked forever") {
    val good = syntheticAvi(2)
    assert(parseAviFrames(good).nonEmpty)
    // clobber the first movi-frame chunk size with an overflowing u32
    val idx = {
      var i = 12
      var at = -1
      while (at < 0 && i < good.length - 4) {
        if (good(i) == '0' && good(i + 1) == '0' && good(i + 2) == 'd' &&
          good(i + 3) == 'c') at = i
        i += 1
      }
      at
    }
    assert(idx > 0)
    val bad = good.clone()
    bad(idx + 4) = 0xf8.toByte; bad(idx + 5) = 0xff.toByte
    bad(idx + 6) = 0xff.toByte; bad(idx + 7) = 0xff.toByte
    assert(parseAviFrames(bad).isEmpty) // bails, no infinite loop
    // truncated container: same policy
    assert(parseAviFrames(good.take(40)).isEmpty)
    assert(parseAviFrames(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("featureTable joins envelope metadata on the small projection") {
    val ft = featureTable(media)
    assert(ft.count() === 90)
    assert(ft.columns.toSet ===
      Set("media_id", "feature", "kind", "source", "content_bytes"))
    // blobs themselves are not in the joined output
    assert(!ft.columns.contains("content"))
  }

  test("videoSceneCuts flags luma jumps between consecutive frames, never frame 0") {
    import spark.implicits._
    // solid-gray JPEG frames with a deliberate brightness jump at frame 2
    def solid(level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(level, level, level))
      g.fillRect(0, 0, 16, 12); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = encodeAviMjpeg(16, 12, 10,
      Seq(solid(40), solid(42), solid(200), solid(198)))
    val ds = spark.createDataset(Seq(
      MediaRecord(99L, "video", avi, "spec")))
    val out = Multimodal.videoSceneCuts(ds, threshold = 20.0)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq === Seq(0, 1, 2, 3))
    // JPEG round-trips solid levels approximately; the 40->200 jump is
    // the only delta beyond the threshold
    assert(out.map(_.is_cut).toSeq === Seq(false, false, true, false))
    assert(out(0).luma < 60 && out(2).luma > 150)
    // non-video records are ignored entirely
    val mixed = spark.createDataset(Seq(
      MediaRecord(1L, "image", syntheticImage(1L), "spec"),
      MediaRecord(99L, "video", avi, "spec")))
    assert(Multimodal.videoSceneCuts(mixed).collect().forall(_.media_id == 99L))
  }

  test("imageDHash: gradient bits, brightness-shift invariance, byte-identical equality") {
    import spark.implicits._
    def png(shade: Int => Int): Array[Byte] = {
      // 18x16 so every 9x8 cell center hits a distinct column
      val img = new java.awt.image.BufferedImage(
        18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 18) {
        val v = math.min(255, math.max(0, shade(x)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // strictly increasing left-to-right luma: every adjacent comparison is
    // "left < right" -> no bits set
    val inc = png(x => x * 14)
    // strictly decreasing: all 64 comparison bits set
    val dec = png(x => 255 - x * 14)
    val ds = Seq(
      MediaRecord(1L, "image", inc, "spec"),
      MediaRecord(2L, "image", dec, "spec"),
      MediaRecord(3L, "image", png(x => x * 14 + 30), "spec"), // brightness-shifted inc
      MediaRecord(4L, "image", inc, "spec")                    // byte-identical to 1
    ).toDS()
    val got = Multimodal.imageDHash(ds).collect()
      .map(h => h.media_id -> ((h.dhash, h.bits_set))).toMap
    assert(got(1L) === ((0L, 0)))
    assert(got(2L)._2 === 64)
    assert(got(3L) === got(1L)) // global brightness shift cannot flip comparisons
    assert(got(4L) === got(1L))
  }

  test("imageNearDups: planted variants pair within their group, groups never cross") {
    val pairs = Multimodal.imageNearDups(Multimodal.neardupMedia(spark), maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set((100L, 101L, 1), (100L, 102L, 2), (101L, 102L, 1),
      (103L, 104L, 1)))
    // banding recall guarantee: every pair found by brute force is found by
    // the band join (here: brute force over the 7 hashes)
    val hs = Multimodal.imageDHash(Multimodal.neardupMedia(spark)).collect()
      .map(h => h.media_id -> h.dhash)
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (ia, ib, d)).toSet
    assert(pairs === brute)
  }
}
