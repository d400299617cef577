package graft.queries0

import org.scalatest.funsuite.AnyFunSuite

/** Container-header parsing goldens: the parser must read genuine PNG /
  * JPEG / WAV structures (public file formats), tolerate corrupt bytes,
  * and invert the deterministic blob writer. No Spark needed. */
class MultimodalSpec extends AnyFunSuite {

  test("PNG IHDR: width/height parsed big-endian from a real signature+chunk") {
    val m = Multimodal.parseHeader(Multimodal.fakeMedia(0L, "xyz")) // id%3==0 -> png
    assert(m.format === "png")
    assert(m.width === 160 && m.height === 120)
  }

  test("JPEG SOF0: dimensions parsed from the marker walk") {
    val m = Multimodal.parseHeader(Multimodal.fakeMedia(1L, "xyz")) // id%3==1 -> jpeg
    assert(m.format === "jpeg")
    assert(m.width === 240 && m.height === 180)
  }

  test("WAV RIFF: sample rate + channels parsed little-endian from fmt") {
    val even = Multimodal.parseHeader(Multimodal.fakeMedia(2L, "xyz"))
    assert(even.format === "wav" && even.sampleRate === 16000 && even.channels === 1)
    val odd = Multimodal.parseHeader(Multimodal.fakeMedia(5L, "xyz"))
    assert(odd.sampleRate === 44100)
  }

  test("hand-built golden headers parse (independent of the writer)") {
    // 1x2 PNG IHDR written by hand
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0, 1, /*w=1*/ 0, 0, 0, 2, /*h=2*/ 8, 6, 0, 0, 0,
      0, 0, 0, 0)
    val m = Multimodal.parseHeader(png)
    assert(m.format === "png" && m.width === 1 && m.height === 2)
    // JPEG with a skippable APP0 before SOF0 (marker walk must hop over it)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe0.toByte, 0, 4, 0, 0, // APP0, len 4
      0xff.toByte, 0xc0.toByte, 0, 8, 8, 0, 3, /*h=3*/ 0, 7, /*w=7*/ 1)
    val j = Multimodal.parseHeader(jpeg)
    assert(j.format === "jpeg" && j.width === 7 && j.height === 3)
  }

  test("corrupt or unknown bytes degrade to 'unknown', never throw") {
    assert(Multimodal.parseHeader(Array.emptyByteArray).format === "unknown")
    assert(Multimodal.parseHeader("not media at all".getBytes).format === "unknown")
    val truncatedJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)
    assert(Multimodal.parseHeader(truncatedJpeg).format === "unknown")
  }

  test("synthesized PNGs are conformant: the JDK's own ImageIO decodes identical pixels") {
    for (id <- Seq(0L, 2L, 4L, 6L, 8L, 10L, 123456L)) {
      val bytes = Multimodal.pngGray(id)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected the PNG for id=$id")
      val (w, h, n, sum) = Multimodal.decodePngGray(bytes)
      assert(img.getWidth === w && img.getHeight === h)
      var ioSum = 0L
      for (y <- 0 until h; x <- 0 until w)
        ioSum += (img.getRaster.getSample(x, y, 0) & 0xff)
      assert(ioSum === sum, s"our inflate+unfilter disagrees with ImageIO for id=$id")
      assert(n === w.toLong * h)
      // and both match the generating formula
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w) expect += (id * 7 + y * 5 + x * 3) % 256
      assert(sum === expect)
    }
  }

  test("PNG unfiltering inverts Sub and Up scanline filters (not just None)") {
    // hand-build a 3x2 grayscale PNG: row0 Sub-filtered, row1 Up-filtered
    val pixels = Array(Array(10, 30, 60), Array(15, 40, 80))
    val scan = new java.io.ByteArrayOutputStream()
    scan.write(1) // Sub: raw = v - left
    scan.write(10); scan.write(20); scan.write(30)
    scan.write(2) // Up: raw = v - above
    scan.write(5); scan.write(10); scan.write(20)
    val defl = new java.util.zip.Deflater()
    defl.setInput(scan.toByteArray); defl.finish()
    val z = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](256)
    while (!defl.finished()) z.write(tmp, 0, defl.deflate(tmp))
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(3).putInt(2)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    def chunk(t: String, d: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32(); crc.update(t.getBytes); crc.update(d)
      java.nio.ByteBuffer.allocate(12 + d.length)
        .putInt(d.length).put(t.getBytes).put(d).putInt(crc.getValue.toInt).array()
    }
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", z.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
    val (w, h, n, sum) = Multimodal.decodePngGray(png)
    assert((w, h, n) === (3, 2, 6L))
    assert(sum === pixels.flatten.sum.toLong)
    // cross-check with ImageIO again
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val ioSum = (for (y <- 0 until 2; x <- 0 until 3)
      yield img.getRaster.getSample(x, y, 0)).sum
    assert(ioSum.toLong === sum)
  }

  test("WAV PCM decode inverts the writer sample-for-sample") {
    for (id <- Seq(1L, 3L, 7L, 97L, 1001L)) {
      val bytes = Multimodal.wavPcm(id)
      assert(Multimodal.parseHeader(bytes).format === "wav")
      val (n, sumSq) = Multimodal.decodeWavPcm16(bytes)
      val expectN = 64 + (id % 97)
      assert(n === expectN)
      var expect = 0L
      var i = 0
      while (i < expectN) {
        val s = ((id * 31 + i * 7) % 4096) - 2048
        expect += s * s
        i += 1
      }
      assert(sumSq === expect, s"sample decode mismatch for id=$id")
    }
  }

  test("JPEG round-trip through the JDK codec: real entropy decode, bounded error") {
    for (id <- Seq(0L, 1L, 5L, 42L, 997L)) {
      val bytes = Multimodal.jpegGray(id)
      // our own header walk agrees with the encoder's SOF dims
      val meta = Multimodal.parseHeader(bytes)
      assert(meta.format === "jpeg")
      val (w, h, n, meanErr) = Multimodal.decodeJpegGray(bytes, id)
      assert(meta.width === w && meta.height === h)
      assert(w === (8 + (id % 4) * 4).toInt && h === (6 + (id % 3) * 2).toInt)
      assert(n === w.toLong * h)
      // the smooth ramp reconstructs tightly; garbage or a header-only
      // "decode" sits near 60 mean abs error on this source
      assert(meanErr < 8.0, s"id=$id meanErr=$meanErr")
    }
    // determinism within a JVM (the batch shape the query relies on)
    assert(java.util.Arrays.equals(Multimodal.jpegGray(7L), Multimodal.jpegGray(7L)))
  }
}
