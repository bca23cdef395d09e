package graft

import graft.operators.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the real byte-level codec: exact header layouts
  * per the BMP and RIFF/WAVE specifications, round-trip fidelity, and
  * total (never-throwing) decode of garbage. */
class MediaCodecSpec extends AnyFunSuite {

  test("BMP: exact file layout for a 2x2 24-bpp image") {
    val b = MediaCodec.encodeBmp(2, 2, seed = 42L)
    // rows pad to 4 bytes: 2px × 3B = 6 → 8; data 16; file 54 + 16 = 70
    assert(b.length == 70)
    assert(b(0) == 'B'.toByte && b(1) == 'M'.toByte)
    def i32(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
    assert(i32(2) == 70) // file size field
    assert(i32(10) == 54) // pixel offset
    assert(i32(14) == 40) // info header size
    assert(i32(18) == 2 && i32(22) == 2) // width, height
    assert((b(28) & 0xFF) == 24) // bpp
    val d = MediaCodec.decode(b)
    assert(d == MediaCodec.Decoded("bmp", 2, 2, 0, 0, 0))
  }

  test("WAV: exact file layout for 5 mono 16-bit samples at 8 kHz") {
    val b = MediaCodec.encodeWav(5, 8000, seed = 7L)
    assert(b.length == 44 + 10)
    assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(b.slice(36, 40), "US-ASCII") == "data")
    val d = MediaCodec.decode(b)
    assert(d == MediaCodec.Decoded("wav", 0, 0, 1, 8000, 5))
  }

  test("decode is total: garbage, truncation, and empty input never throw") {
    assert(MediaCodec.decode(Array.empty[Byte]).format == "unknown")
    assert(MediaCodec.decode("hello world".getBytes).format == "unknown")
    assert(MediaCodec.decode(Array[Byte]('B', 'M', 1, 2)).format == "unknown")
    // a RIFF prefix that is not WAVE
    assert(MediaCodec.decode(("RIFF1234AVI LIST" + "x" * 40).getBytes).format == "unknown")
  }

  test("resize: nearest-neighbor downscale keeps ceil-dims and exact source pixels") {
    val src = MediaCodec.encodeBmp(5, 3, seed = 11L)
    val out = MediaCodec.resizeBmp(src, 2)
    val d = MediaCodec.decode(out)
    assert((d.width, d.height) == (3, 2)) // ceil(5/2), ceil(3/2)
    // pixel (x, y) of the output must be byte-identical to input (2x, 2y)
    val srcRow = (5 * 3 + 3) / 4 * 4
    val outRow = (3 * 3 + 3) / 4 * 4
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3) {
      val s = src(54 + (y * 2) * srcRow + (x * 2) * 3 + c)
      val o = out(54 + y * outRow + x * 3 + c)
      assert(s == o, s"pixel ($x,$y) channel $c")
    }
    // factor 1 is identity on dims
    val id = MediaCodec.decode(MediaCodec.resizeBmp(src, 1))
    assert((id.width, id.height) == (5, 3))
  }

  test("round trip: encoder dimensions always survive the real parse") {
    for (w <- Seq(1, 3, 17, 33); h <- Seq(1, 2, 25)) {
      val d = MediaCodec.decode(MediaCodec.encodeBmp(w, h, w * 1000L + h))
      assert((d.width, d.height) == (w, h))
    }
    for (n <- Seq(0, 1, 99, 4096); r <- Seq(8000, 16000, 44100)) {
      val d = MediaCodec.decode(MediaCodec.encodeWav(n, r, n * 7L))
      assert((d.nSamples, d.sampleRate) == (n, r))
    }
  }
}
