package graft.operators

import java.io.ByteArrayOutputStream

/** A real byte-level media codec for two headerful formats — 24-bpp BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER) and PCM WAV (RIFF/WAVE fmt+data) —
  * implemented with pure JVM byte arithmetic, no image/audio libraries.
  *
  * This replaces the deterministic-fake decode for these formats: the
  * encoder emits spec-correct files and the decoder genuinely parses the
  * header fields back out of the bytes (magic sniffing, little-endian
  * field extraction, sample-count derivation from chunk sizes). Formats the
  * JVM can't parse without native libs (jpeg/webp/mp3) remain behind the
  * [[FakeCodec]] stub seam.
  */
object MediaCodec {

  private def le4(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def le2(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }
  private def ascii(out: ByteArrayOutputStream, s: String): Unit =
    s.foreach(c => out.write(c.toInt))

  /** Spec-correct minimal 24-bpp BMP: 14-byte file header, 40-byte info
    * header, pixel rows padded to 4-byte multiples, deterministic pixel
    * bytes from an LCG over `seed`. */
  def encodeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowBytes = (width * 3 + 3) / 4 * 4
    val dataSize = rowBytes * height
    val out = new ByteArrayOutputStream(54 + dataSize)
    ascii(out, "BM")
    le4(out, 54 + dataSize) // file size
    le4(out, 0) // reserved
    le4(out, 54) // pixel data offset
    le4(out, 40) // BITMAPINFOHEADER size
    le4(out, width)
    le4(out, height)
    le2(out, 1) // planes
    le2(out, 24) // bits per pixel
    le4(out, 0) // compression: BI_RGB
    le4(out, dataSize)
    le4(out, 2835); le4(out, 2835) // 72 DPI
    le4(out, 0); le4(out, 0) // palette
    var s = seed
    var i = 0
    while (i < dataSize) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out.write(((s >>> 56) & 0xFF).toInt)
      i += 1
    }
    out.toByteArray
  }

  /** Spec-correct PCM WAV: RIFF header, 16-byte fmt chunk (mono, 16-bit),
    * data chunk with deterministic samples from an LCG over `seed`. */
  def encodeWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    require(nSamples >= 0 && sampleRate > 0)
    val dataSize = nSamples * 2
    val out = new ByteArrayOutputStream(44 + dataSize)
    ascii(out, "RIFF")
    le4(out, 36 + dataSize)
    ascii(out, "WAVE")
    ascii(out, "fmt ")
    le4(out, 16) // fmt chunk size
    le2(out, 1) // PCM
    le2(out, 1) // mono
    le4(out, sampleRate)
    le4(out, sampleRate * 2) // byte rate
    le2(out, 2) // block align
    le2(out, 16) // bits per sample
    ascii(out, "data")
    le4(out, dataSize)
    var s = seed
    var i = 0
    while (i < nSamples) {
      s = s * 6364136223846793005L + 1442695040888963407L
      le2(out, ((s >>> 48) & 0xFFFF).toInt)
      i += 1
    }
    out.toByteArray
  }

  /** Nearest-neighbor downscale of a 24-bpp BMP by an integer factor:
    * out(x, y) = in(x·f, y·f), output dims ceil(w/f) × ceil(h/f). Real
    * pixel resampling over the decoded rows (respecting 4-byte row
    * padding), re-encoded as a spec-correct BMP. */
  def resizeBmp(b: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1)
    def i32(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
    require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte, "not a BMP")
    val w = i32(18)
    val h = i32(22)
    val rowBytes = (w * 3 + 3) / 4 * 4
    val nw = (w + factor - 1) / factor
    val nh = (h + factor - 1) / factor
    val nRowBytes = (nw * 3 + 3) / 4 * 4
    val out = new ByteArrayOutputStream(54 + nRowBytes * nh)
    ascii(out, "BM")
    le4(out, 54 + nRowBytes * nh); le4(out, 0); le4(out, 54)
    le4(out, 40); le4(out, nw); le4(out, nh)
    le2(out, 1); le2(out, 24); le4(out, 0); le4(out, nRowBytes * nh)
    le4(out, 2835); le4(out, 2835); le4(out, 0); le4(out, 0)
    var y = 0
    while (y < nh) {
      var written = 0
      var x = 0
      while (x < nw) {
        val src = 54 + (y * factor) * rowBytes + (x * factor) * 3
        out.write(b(src) & 0xFF); out.write(b(src + 1) & 0xFF); out.write(b(src + 2) & 0xFF)
        written += 3
        x += 1
      }
      while (written < nRowBytes) { out.write(0); written += 1 }
      y += 1
    }
    out.toByteArray
  }

  /** Parsed header metadata; irrelevant fields are 0. */
  case class Decoded(format: String, width: Int, height: Int,
      channels: Int, sampleRate: Int, nSamples: Int)

  /** Sniff the magic and parse the real header fields. Unknown or
    * truncated payloads decode as format "unknown" (never throws — a
    * corpus-scale decode must be total). */
  def decode(b: Array[Byte]): Decoded = {
    def u16(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def i32(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
    def tag(i: Int, s: String): Boolean =
      b.length >= i + s.length && s.indices.forall(j => (b(i + j) & 0xFF) == s.charAt(j).toInt)
    if (b.length >= 54 && tag(0, "BM"))
      Decoded("bmp", i32(18), i32(22), 0, 0, 0)
    else if (b.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE") && tag(12, "fmt ")) {
      val channels = u16(22)
      val rate = i32(24)
      val bits = u16(34)
      val dataSize = if (tag(36, "data")) i32(40) else 0
      val bytesPerFrame = math.max(1, channels * bits / 8)
      Decoded("wav", 0, 0, channels, rate, dataSize / bytesPerFrame)
    } else Decoded("unknown", 0, 0, 0, 0, 0)
  }
}
