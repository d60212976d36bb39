package graft.multimodal

/** Real pure-JVM media codecs behind the pluggable decode boundary —
  * the round-8 closure of the "media decode is a surrogate" gap
  * (reference decode sites: raw_to_samples.py:173-196 cv2 frame
  * decode, preprocess_dataset.py:59-70 re-encode). The container has
  * no cv2/moviepy, but BMP (BITMAPINFOHEADER, 24-bit BI_RGB) and WAV
  * (RIFF PCM16 mono) are fully specified byte layouts parseable with
  * nothing but the JVM — so the mm_decode_* catalog ops run a REAL
  * encode -> real bytes -> REAL decode round trip, and the DuckDB
  * oracle replays the pixel/sample arithmetic from the deterministic
  * pattern: a decoder bug (stride padding, bottom-up rows, BGR order,
  * chunk offsets, endianness) shows up as a hash mismatch, not a
  * comment. The deterministic surrogates remain the documented
  * fallback for formats the JVM cannot parse (MP4/JPEG).
  *
  * Both decoders implement Serializable single-method traits and are
  * instantiated ONCE PER PARTITION inside mapPartitions (the M1
  * model-init contract, Multimodal.FrameDetector).
  */
object Codecs {

  /** Decoded raster: row-major top-down, 3 bytes per pixel (R,G,B). */
  final case class DecodedImage(width: Int, height: Int, rgb: Array[Byte])

  /** Decoded audio: PCM samples, channel-interleaved. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
      samples: Array[Short])

  trait ImageDecoder extends Serializable {
    def decode(bytes: Array[Byte]): DecodedImage
  }

  trait AudioDecoder extends Serializable {
    def decode(bytes: Array[Byte]): DecodedAudio
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def s32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def w16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def w32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** BMP row stride: pixel rows pad to 4-byte boundaries. */
  def bmpStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Encode a top-down RGB raster as a standard bottom-up 24-bit
    * BI_RGB BMP (BITMAPFILEHEADER + BITMAPINFOHEADER = 54 bytes). */
  def bmpEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"raster length ${rgb.length} != $width x $height x 3")
    val stride = bmpStride(width)
    val size = 54 + stride * height
    val out = new Array[Byte](size)
    out(0) = 'B'; out(1) = 'M'
    w32(out, 2, size); w32(out, 10, 54)
    w32(out, 14, 40) // BITMAPINFOHEADER
    w32(out, 18, width); w32(out, 22, height) // positive = bottom-up
    w16(out, 26, 1); w16(out, 28, 24) // planes, bpp
    w32(out, 30, 0) // BI_RGB
    w32(out, 34, stride * height)
    var y = 0
    while (y < height) {
      val dst = 54 + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val src = (y * width + x) * 3
        out(dst + x * 3) = rgb(src + 2)     // B
        out(dst + x * 3 + 1) = rgb(src + 1) // G
        out(dst + x * 3 + 2) = rgb(src)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** The real decoder: parses the actual header fields (data offset,
    * signed height for top-down files, stride padding, BGR order). */
  final class BmpDecoder extends ImageDecoder {
    def decode(b: Array[Byte]): DecodedImage = {
      require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP")
      val dataOff = s32(b, 10)
      require(s32(b, 14) >= 40, "unsupported DIB header")
      val width = s32(b, 18)
      val hRaw = s32(b, 22)
      val topDown = hRaw < 0
      val height = math.abs(hRaw)
      require(u16(b, 26) == 1 && u16(b, 28) == 24,
        "only 24-bit single-plane supported")
      require(s32(b, 30) == 0, "only BI_RGB (uncompressed) supported")
      // Range-check header fields before allocating: the decode
      // boundary parses external bytes, so a crafted header must fail
      // fast with a clear message, not overflow width*height*3 into a
      // NegativeArraySizeException or index past the buffer.
      require(width > 0 && height > 0 && hRaw != 0 &&
        width.toLong * height * 3 <= Int.MaxValue,
        s"corrupt BMP dimensions ${width}x$hRaw")
      val stride = bmpStride(width)
      require(dataOff >= 54 &&
        dataOff.toLong + stride.toLong * height <= b.length,
        s"corrupt BMP data offset $dataOff for ${b.length} bytes")
      val rgb = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = dataOff + (if (topDown) y else height - 1 - y) * stride
        var x = 0
        while (x < width) {
          val dst = (y * width + x) * 3
          rgb(dst) = b(srcRow + x * 3 + 2)     // R
          rgb(dst + 1) = b(srcRow + x * 3 + 1) // G
          rgb(dst + 2) = b(srcRow + x * 3)     // B
          x += 1
        }
        y += 1
      }
      DecodedImage(width, height, rgb)
    }
  }

  /** Encode PCM16 mono samples as a canonical 44-byte-header RIFF/WAVE. */
  def wavEncode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    w32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    w32(out, 16, 16) // PCM fmt chunk size
    w16(out, 20, 1) // PCM
    w16(out, 22, 1) // mono
    w32(out, 24, sampleRate)
    w32(out, 28, sampleRate * 2) // byte rate
    w16(out, 32, 2) // block align
    w16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    w32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      w16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** The real decoder: walks the RIFF chunk list (fmt may be followed
    * by LIST/fact chunks before data in the wild), validates PCM16. */
  final class WavDecoder extends AudioDecoder {
    def decode(b: Array[Byte]): DecodedAudio = {
      require(b.length >= 44 && b(0) == 'R' && b(1) == 'I' &&
        b(2) == 'F' && b(3) == 'F' && b(8) == 'W' && b(9) == 'A' &&
        b(10) == 'V' && b(11) == 'E', "not a RIFF/WAVE")
      var off = 12
      var rate = 0
      var channels = 0
      var samples: Array[Short] = null
      while (off + 8 <= b.length) {
        val id = new String(b, off, 4, "US-ASCII")
        val len = s32(b, off + 4)
        // A negative len (crafted bytes) would leave `off` unchanged
        // and loop forever; an oversized one would index past the
        // buffer mid-parse. Fail fast on either.
        require(len >= 0 && off + 8 + len.toLong <= b.length,
          s"corrupt RIFF chunk '$id' len $len at offset $off")
        if (id == "fmt ") {
          require(len >= 16, s"fmt chunk too short ($len)")
          require(u16(b, off + 8) == 1, "only PCM supported")
          channels = u16(b, off + 10)
          rate = s32(b, off + 12)
          require(u16(b, off + 22) == 16, "only 16-bit supported")
        } else if (id == "data") {
          val n = len / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = u16(b, off + 8 + i * 2).toShort
            i += 1
          }
        }
        off += 8 + len + (len & 1) // chunks pad to even length
      }
      require(rate > 0 && samples != null, "missing fmt or data chunk")
      DecodedAudio(rate, channels, samples)
    }
  }
}
