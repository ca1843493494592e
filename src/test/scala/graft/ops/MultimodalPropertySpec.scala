package graft.ops

import graft.SparkTestBase

/** Randomized (seeded, reproducible) roundtrip tests for the JDK-native
  * codec paths: whatever parameters a container is encoded with must come
  * back out of the header decoder. Driver-side — no Spark job — so the
  * parameter space can range widely. */
class MultimodalPropertySpec extends SparkTestBase {

  private val rnd = new scala.util.Random(0x5eed)

  test("WAV roundtrip: encoded rate/channels/samples parse back exactly") {
    val rates = Seq(8000, 11025, 16000, 22050, 44100, 48000)
    (1 to 200).foreach { _ =>
      val rate = rates(rnd.nextInt(rates.size))
      val channels = 1 + rnd.nextInt(8)
      val nSamples = 1 + rnd.nextInt(5000)
      val dataLen = nSamples * channels * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      assert(Multimodal.parseWavHeader(bb.array()) ===
        Some((rate, channels, nSamples.toLong)),
        s"rate=$rate channels=$channels nSamples=$nSamples")
    }
  }

  test("WAV parse survives extra chunks before data (non-canonical order)") {
    val rate = 16000
    val nSamples = 100
    val dataLen = nSamples * 2
    // RIFF [fmt ] [LIST 6 bytes] [data]
    val bb = java.nio.ByteBuffer.allocate(44 + 14 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 14 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate)
      .putInt(rate * 2).putShort(2).putShort(16)
    bb.put("LIST".getBytes("US-ASCII")).putInt(6)
      .put("INFOab".getBytes("US-ASCII")) // 6-byte payload, word-aligned
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    assert(Multimodal.parseWavHeader(bb.array()) ===
      Some((rate, 1, nSamples.toLong)))
  }

  test("image roundtrip: encoded dimensions parse back for every JDK format") {
    (1 to 60).foreach { _ =>
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(60)
      val fmt = Seq("png", "jpg", "bmp")(rnd.nextInt(3))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      val stream = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      val reader = javax.imageio.ImageIO.getImageReaders(stream).next()
      try {
        reader.setInput(stream, true, true)
        assert(reader.getWidth(0) === w, s"$fmt width")
        assert(reader.getHeight(0) === h, s"$fmt height")
      } finally { reader.dispose(); stream.close() }
    }
  }

  test("garbage never parses as WAV (and never throws)") {
    (1 to 500).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(bytes)
      Multimodal.parseWavHeader(bytes) // must not throw; None expected
    }
    // truncated-but-valid-prefix cases: real header cut at every length
    val full = Multimodal.syntheticWav(0)
    (0 until 44).foreach { n =>
      assert(Multimodal.parseWavHeader(java.util.Arrays.copyOf(full, n)) === None)
    }
    // adversarial chunk sizes inside a valid RIFF/WAVE envelope: random
    // u32s (including the 0xFFFFFFF8 class that turns negative after
    // .toInt and would stall an unguarded walk) must terminate promptly
    (1 to 200).foreach { _ =>
      val b = new Array[Byte](64)
      "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
      "WAVE".getBytes("US-ASCII").copyToArray(b, 8)
      rnd.nextBytes(java.util.Arrays.copyOfRange(b, 12, 64)) // garbage tail
      val tail = new Array[Byte](52); rnd.nextBytes(tail)
      tail.copyToArray(b, 12)
      val t0 = System.nanoTime()
      Multimodal.parseWavHeader(b)
      Multimodal.parseWavSamples(b)
      assert(System.nanoTime() - t0 < 1e9, "corrupt chunk walk did not terminate promptly")
    }
  }
}
