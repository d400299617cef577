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
}
