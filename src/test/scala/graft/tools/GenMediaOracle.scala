package graft.tools

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Prints the expected-constant rows for the m_* oracle queries over the
  * checked-in media fixtures — computed here INDEPENDENTLY of the
  * production operators (plain ImageIO reads and a from-scratch PCM16
  * walk), so the VALUES oracles in SparkEntry are not a copy of the code
  * under test. Run manually after regenerating fixtures:
  * `sbt "Test/runMain graft.tools.GenMediaOracle"`. */
object GenMediaOracle {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/media/$name")
    require(in != null, s"missing /media/$name")
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** Spark round() parity: HALF_UP at 4 decimals on the double value. */
  private def r4(v: Double): String =
    new JBigDecimal(v).setScale(4, RoundingMode.HALF_UP).stripTrailingZeros.toPlainString

  def main(args: Array[String]): Unit = {
    // (media_id, kind, independently-derived feature vector) accumulated
    // by each modality section below, consumed by the m_media_embed block
    val embedInputs = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Array[Float])]
    val images = Seq(
      0L -> "img-4x6.png", 1L -> "img-8x5.jpg", 2L -> "img-7x3.bmp")
    val audios = Seq(
      3L -> "tone-16000-mono.wav", 4L -> "tone-22050-stereo.wav")

    println("-- m_image_meta (media_id, width, height, channels, format)")
    images.foreach { case (id, name) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(resource(name)))
      val fmt = {
        val it = javax.imageio.ImageIO.getImageReaders(
          javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(resource(name))))
        it.next().getFormatName.toLowerCase
      }
      println(s"($id, ${img.getWidth}, ${img.getHeight}, " +
        s"${img.getColorModel.getNumComponents}, '$fmt'),")
    }

    println("-- m_image_features (media_id, dim, value) — 24-bin rgb histogram")
    images.foreach { case (id, name) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(resource(name)))
      val hist = new Array[Long](24)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        hist(((rgb >> 16) & 0xff) >> 5) += 1
        hist(8 + (((rgb >> 8) & 0xff) >> 5)) += 1
        hist(16 + ((rgb & 0xff) >> 5)) += 1
      }
      val n = (img.getWidth * img.getHeight).toFloat
      hist.zipWithIndex.foreach { case (c, d) =>
        // production emits Float then casts to double for rounding —
        // replicate the exact representable value being rounded
        println(s"($id, $d, ${r4((c / n).toDouble)}),")
      }
      embedInputs += ((id, "image", hist.map(c => c / n)))
    }

    println("-- m_image_dhash (media_id, dhash, bits_set) — 9x8 luma dHash")
    images.foreach { case (id, name) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(resource(name)))
      def lumaAt(c: Int, row: Int): Double = {
        val x = Math.floorDiv((2 * c + 1) * img.getWidth, 18)
        val y = Math.floorDiv((2 * row + 1) * img.getHeight, 16)
        val rgb = img.getRGB(x, y)
        0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
      }
      val setBits = for {
        row <- 0 until 8
        c <- 0 until 8
        if lumaAt(c, row) > lumaAt(c + 1, row)
      } yield row * 8 + c
      val hash = setBits.foldLeft(0L)((acc, b) => acc | (1L << b))
      println(s"($id, ${hash}, ${setBits.size}),")
    }

    println("-- m_audio_meta (media_id, sample_rate, channels, n_samples)")
    println("-- m_audio_features (media_id, dim, value) — rms/zcr/meanAbs/duration")
    audios.foreach { case (id, name) =>
      val b = resource(name)
      def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      def u32(i: Int): Int = u16(i) | (u16(i + 2) << 16)
      require(new String(b, 0, 4, "US-ASCII") == "RIFF")
      val channels = u16(22)
      val rate = u32(24)
      var pos = 12
      var dataAt = -1
      var dataLen = -1
      while (dataAt < 0) {
        val tag = new String(b, pos, 4, "US-ASCII")
        val sz = u32(pos + 4)
        if (tag == "data") { dataAt = pos + 8; dataLen = sz }
        else pos += 8 + sz + (sz & 1)
      }
      val n = dataLen / 2
      val samples = Array.tabulate(n)(i =>
        ((b(dataAt + 2 * i) & 0xff) | (b(dataAt + 2 * i + 1) << 8)).toShort)
      println(s"-- meta: ($id, $rate, $channels, ${n / channels}),")
      var sumSq = 0.0; var sumAbs = 0.0; var zc = 0
      samples.zipWithIndex.foreach { case (s, i) =>
        sumSq += s.toDouble * s; sumAbs += math.abs(s.toDouble)
        // per-channel crossings: previous sample of the SAME channel is
        // `channels` positions back in the interleaved stream
        if (i >= channels && ((samples(i - channels) < 0) != (s < 0))) zc += 1
      }
      val feats = Seq(
        math.sqrt(sumSq / n).toFloat,
        zc.toFloat / n,
        (sumAbs / n).toFloat,
        n.toFloat / channels / rate)
      feats.zipWithIndex.foreach { case (f, d) =>
        println(s"($id, $d, ${r4(f.toDouble)}),")
      }
      embedInputs += ((id, "audio", feats.toArray))
    }

    // Independent AVI re-derivation: a from-scratch sequential RIFF scan
    // (not the production range-stack walk) + plain ImageIO frame decodes.
    println("-- m_video_meta (media_id, width, height, n_frames, fps)")
    println("-- m_video_features (media_id, dim, value) — " +
      "nFrames/meanLuma/motion/duration (stride 2)")
    val videos = Seq(
      5L -> "clip-16x12-12fps.avi", 6L -> "clip-20x12-25fps.avi")
    videos.foreach { case (id, name) =>
      val b = resource(name)
      def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      def u32(i: Int): Int = u16(i) | (u16(i + 2) << 16)
      def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
      require(tag(0) == "RIFF" && tag(8) == "AVI ")
      // flat scan: LIST headers are 12 bytes (descend), chunks skip whole
      var pos = 12
      var w = -1; var h = -1; var scale = -1; var rate = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      while (pos + 8 <= b.length) {
        val id4 = tag(pos)
        val sz = u32(pos + 4)
        if (id4 == "LIST") pos += 12
        else {
          if (id4 == "avih") { w = u32(pos + 8 + 32); h = u32(pos + 8 + 36) }
          if (id4 == "strh" && tag(pos + 8) == "vids") {
            scale = u32(pos + 8 + 20); rate = u32(pos + 8 + 24)
          }
          if (id4 == "00dc")
            frames += java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + sz)
          pos += 8 + sz + (sz & 1)
        }
      }
      val fps = rate.toDouble / scale
      println(s"-- meta: ($id, $w, $h, ${frames.size}, ${r4(fps)}),")
      val lumas = frames.indices.by(2).map { fi =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(frames(fi)))
        var sum = 0.0
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        }
        sum / (img.getWidth.toLong * img.getHeight)
      }
      val motion =
        if (lumas.size < 2) 0.0
        else lumas.sliding(2).map(p => math.abs(p(1) - p(0))).sum / (lumas.size - 1)
      val feats = Seq(frames.size.toFloat, (lumas.sum / lumas.size).toFloat,
        motion.toFloat, (frames.size / fps).toFloat)
      feats.zipWithIndex.foreach { case (f, d) =>
        println(s"($id, $d, ${r4(f.toDouble)}),")
      }
      embedInputs += ((id, "video", feats.toArray))

      // m_video_scene_cuts: EVERY frame's luma + the hard-cut flag
      // (|delta| > 0.5 — sized to the fixtures so both flags occur),
      // re-derived from the same flat scan
      println(s"-- m_video_scene_cuts $id (media_id, frame_idx, luma, is_cut)")
      val all = frames.indices.map { fi =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(frames(fi)))
        var sum = 0.0
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        }
        sum / (img.getWidth.toLong * img.getHeight)
      }
      all.zipWithIndex.foreach { case (l, fi) =>
        val cut = fi > 0 && math.abs(l - all(fi - 1)) > 0.5
        println(s"($id, $fi, ${r4(l)}, $cut),  -- delta=" +
          (if (fi > 0) r4(math.abs(l - all(fi - 1))) else "-"))
      }
    }

    // m_media_embed: JL projection + L2 normalization over the feature
    // vectors independently re-derived above. The projection matrix is
    // SPEC, restated here from its closed form (one LCG step per
    // coefficient), not shared code.
    println("-- m_media_embed (media_id, kind, dim, value) — JL dim 16")
    def jlCoef(salt: Int, i: Int, d: Int): Double = {
      val seed = salt.toLong * 1000003L + i.toLong * 8191L + d.toLong
      val bits = (seed * 6364136223846793005L + 1442695040888963407L) >>> 11
      bits.toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    val salts = Map("image" -> 1, "audio" -> 2, "video" -> 3)
    embedInputs.sortBy(_._1).foreach { case (id, kind, f) =>
      val dim = 16
      val acc = Array.tabulate(dim) { d =>
        var s = 0.0; var i = 0
        while (i < f.length) { s += f(i).toDouble * jlCoef(salts(kind), i, d); i += 1 }
        s
      }
      val norm = math.sqrt(acc.map(x => x * x).sum)
      acc.zipWithIndex.foreach { case (x, d) =>
        println(s"($id, '$kind', $d, ${r4((x / norm).toFloat.toDouble)}),")
      }
    }

    println("-- m_phash_neardup (id_a, id_b, hamming_dist) @ maxDist=4")
    // independent re-derivation: decode the synthetic set's PNG bytes (the
    // INPUT is shared, as with the resource files), recompute each dHash
    // with this file's own luma/grid arithmetic, brute-force all pairs
    val hashes = graft.ops.Multimodal.neardupImageBytes.map { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      def lumaAt(c: Int, row: Int): Double = {
        val x = Math.floorDiv((2 * c + 1) * img.getWidth, 18)
        val y = Math.floorDiv((2 * row + 1) * img.getHeight, 16)
        val rgb = img.getRGB(x, y)
        0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
      }
      val hash = (for {
        row <- 0 until 8
        c <- 0 until 8
        if lumaAt(c, row) > lumaAt(c + 1, row)
      } yield row * 8 + c).foldLeft(0L)((acc, b) => acc | (1L << b))
      id -> hash
    }
    for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } println(s"($ia, $ib, $d),")
  }
}
