package graft.tools

import java.io.{ByteArrayOutputStream, File, FileOutputStream}

/** Regenerates the tiny checked-in media fixtures under
  * `src/main/resources/media/` that MultimodalSpec and the m_* oracle
  * queries decode (real PNG/JPEG/BMP containers via ImageIO, PCM WAVs via
  * a hand-written RIFF header). Run manually after changing shapes:
  * `sbt "Test/runMain graft.tools.GenMediaFixtures"`. */
object GenMediaFixtures {

  private def image(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 40 + y * 70 + 0x123456) & 0xffffff)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def wav(rate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (i <- 0 until nSamples * channels)
      bb.putShort((((i * 97) % 8192) - 4096).toShort)
    bb.array()
  }

  /** Deterministic JPEG frame: the fixture gradient shifted per frame so
    * consecutive frames differ (nonzero motion proxy). */
  private def jpegFrame(w: Int, h: Int, fi: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 40 + y * 70 + fi * 33 + 0x123456) & 0xffffff)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def avi(w: Int, h: Int, fps: Int, nFrames: Int): Array[Byte] =
    graft.ops.Multimodal.encodeAviMjpeg(
      w, h, fps, (0 until nFrames).map(jpegFrame(w, h, _)))

  def main(args: Array[String]): Unit = {
    val dir = new File("src/main/resources/media")
    dir.mkdirs()
    val files = Map(
      "img-4x6.png" -> image(4, 6, "png"),
      "img-8x5.jpg" -> image(8, 5, "jpg"),
      "img-7x3.bmp" -> image(7, 3, "bmp"),
      "tone-16000-mono.wav" -> wav(16000, 1, 160),
      "tone-22050-stereo.wav" -> wav(22050, 2, 240),
      "clip-16x12-12fps.avi" -> avi(16, 12, 12, 6),
      "clip-20x12-25fps.avi" -> avi(20, 12, 25, 5))
    files.foreach { case (name, bytes) =>
      val out = new FileOutputStream(new File(dir, name))
      try out.write(bytes) finally out.close()
      println(s"wrote ${dir}/$name (${bytes.length} bytes)")
    }
  }
}
