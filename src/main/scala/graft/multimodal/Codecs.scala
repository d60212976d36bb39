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

  private[multimodal] def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private[multimodal] def s32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private[multimodal] def w16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private[multimodal] def w32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** BMP/DIB row stride: pixel rows pad to 4-byte boundaries. */
  def bmpStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Pack a top-down RGB raster as a bottom-up BGR stride-padded DIB
    * pixel array at `dstOff` — the shared byte layout of a BMP body
    * and an AVI '00db' frame chunk. */
  private def writeDib(width: Int, height: Int, rgb: Array[Byte],
      out: Array[Byte], dstOff: Int): Unit = {
    val stride = bmpStride(width)
    var y = 0
    while (y < height) {
      val dst = dstOff + (height - 1 - y) * stride // bottom-up
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
  }

  /** Unpack a DIB pixel array at `srcOff` into a top-down RGB raster;
    * validates the raster fits inside the buffer before reading. */
  private def readDib(b: Array[Byte], srcOff: Int, width: Int,
      height: Int, topDown: Boolean): Array[Byte] = {
    val stride = bmpStride(width)
    require(width > 0 && height > 0 &&
      width.toLong * height * 3 <= Int.MaxValue,
      s"corrupt DIB dimensions ${width}x$height")
    require(srcOff >= 0 &&
      srcOff.toLong + stride.toLong * height <= b.length,
      s"corrupt DIB raster offset $srcOff for ${b.length} bytes")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = srcOff + (if (topDown) y else height - 1 - y) * stride
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
    rgb
  }

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
    writeDib(width, height, rgb, out, 54)
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
      // readDib range-checks dimensions and the raster extent before
      // allocating — a crafted header fails fast with a clear message
      // instead of overflowing width*height*3 or indexing past the
      // buffer; additionally pin the data offset past the headers.
      require(dataOff >= 54, s"corrupt BMP data offset $dataOff")
      DecodedImage(width, height,
        readDib(b, dataOff, width, height, topDown))
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

  // ---------------------------------------------------------------
  // ITU-T G.711 companding — the COMPRESSED AUDIO rung (2:1
  // logarithmic PCM, the telephony format real ingest corpora carry
  // inside WAVE containers as format tags 7/µ-law and 6/A-law).
  // Implemented from the public G.711 segment tables; psychoacoustic
  // codecs (AAC/MP3) remain the documented out-of-scope boundary —
  // G.711 is a pure per-sample quantizer, fully replayable.
  // ---------------------------------------------------------------

  private val MuBias = 0x84
  private val MuClip = 32635

  /** µ-law compress one PCM16 sample to its 8-bit codeword (G.711
    * table 2a: sign + 3-bit segment + 4-bit mantissa, complemented on
    * the wire). */
  def mulawEncode(pcm: Short): Byte = {
    var x = pcm.toInt
    val sign = if (x < 0) { x = -x; 0x80 } else 0
    if (x > MuClip) x = MuClip
    x += MuBias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    (~(sign | (exp << 4) | ((x >> (exp + 3)) & 0x0f))).toByte
  }

  /** µ-law expand one codeword to PCM16 — exact integer closed form
    * (((mant*8 + 132) << exp) - 132, signed), replayed verbatim by
    * the oracle SQL. */
  def mulawDecode(u: Byte): Short = {
    val c = ~u & 0xff
    val mag = ((((c & 0x0f) << 3) + MuBias) << ((c >> 4) & 7)) - MuBias
    (if ((c & 0x80) != 0) -mag else mag).toShort
  }

  /** A-law compress one PCM16 sample (G.711 table 1a: 13-bit
    * magnitude, sign + segment + mantissa, even bits inverted). */
  def alawEncode(pcm: Short): Byte = {
    var x = pcm.toInt >> 3 // 16-bit to the 13-bit A-law grid
    val mask = if (x >= 0) 0xd5 else { x = -x - 1; 0x55 }
    if (x > 0xfff) x = 0xfff
    var seg = 0
    while (seg < 8 && x > ((0x1f << seg) | ((1 << seg) - 1))) seg += 1
    val aval =
      if (seg >= 8) 0x7f
      else (seg << 4) | ((x >> (if (seg < 2) 1 else seg)) & 0x0f)
    (aval ^ mask).toByte
  }

  /** A-law expand one codeword to PCM16 — exact integer closed form,
    * replayed verbatim by the oracle SQL. Never yields 0 (the A-law
    * grid is offset by half a step), so expand/compress is a bijection
    * on all 256 codewords. */
  def alawDecode(a: Byte): Short = {
    val c = (a ^ 0x55) & 0xff
    val m = (c & 0x0f) << 4
    val t = ((c >> 4) & 7) match {
      case 0 => m + 8
      case 1 => m + 0x108
      case seg => (m + 0x108) << (seg - 1)
    }
    (if ((c & 0x80) != 0) t else -t).toShort
  }

  /** Encode G.711 codewords as a genuine RIFF/WAVE: format tag 7
    * (µ-law) or 6 (A-law), 8 bits/sample, mono. The layout mirrors
    * [[wavEncode]]'s canonical 44-byte header with the companded
    * byte stream as data — the files telephony pipelines carry. */
  def wavEncodeG711(sampleRate: Int, codes: Array[Byte],
      mulaw: Boolean): Array[Byte] = {
    // RIFF chunks pad to even length: one zero pad byte after an
    // odd-length data chunk (1 byte/sample makes odd counts common
    // here, unlike PCM16). The 'data' size field stays codes.length;
    // the RIFF size counts the pad (it is part of the chunk stream).
    val pad = codes.length & 1
    val out = new Array[Byte](44 + codes.length + pad)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    w32(out, 4, 36 + codes.length + pad)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    w32(out, 16, 16)
    w16(out, 20, if (mulaw) 7 else 6)
    w16(out, 22, 1) // mono
    w32(out, 24, sampleRate)
    w32(out, 28, sampleRate) // byte rate: 1 byte/sample
    w16(out, 32, 1) // block align
    w16(out, 34, 8) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    w32(out, 40, codes.length)
    System.arraycopy(codes, 0, out, 44, codes.length)
    out
  }

  /** The real decoder: walks the RIFF chunk list (fmt may be followed
    * by LIST/fact chunks before data in the wild), validates PCM16 or
    * G.711 (format tags 6/7, 8-bit) and expands companded streams to
    * PCM16 through the exact G.711 integer tables. */
  final class WavDecoder extends AudioDecoder {
    def decode(b: Array[Byte]): DecodedAudio = {
      require(b.length >= 44 && b(0) == 'R' && b(1) == 'I' &&
        b(2) == 'F' && b(3) == 'F' && b(8) == 'W' && b(9) == 'A' &&
        b(10) == 'V' && b(11) == 'E', "not a RIFF/WAVE")
      var off = 12
      var rate = 0
      var channels = 0
      var fmtTag = -1
      var dataOff = -1
      var dataLen = -1
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
          fmtTag = u16(b, off + 8)
          require(fmtTag == 1 || fmtTag == 6 || fmtTag == 7,
            s"unsupported WAVE format tag $fmtTag " +
              "(PCM / A-law / mu-law only)")
          channels = u16(b, off + 10)
          rate = s32(b, off + 12)
          val bits = u16(b, off + 22)
          if (fmtTag == 1) require(bits == 16, "PCM must be 16-bit")
          else require(bits == 8, "G.711 must be 8-bit")
        } else if (id == "data") {
          dataOff = off + 8
          dataLen = len
        }
        off += 8 + len + (len & 1) // chunks pad to even length
      }
      require(rate > 0 && dataOff >= 0 && fmtTag >= 0,
        "missing fmt or data chunk")
      val samples: Array[Short] = fmtTag match {
        case 1 =>
          val n = dataLen / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = u16(b, dataOff + i * 2).toShort; i += 1 }
          s
        case 7 =>
          val s = new Array[Short](dataLen)
          var i = 0
          while (i < dataLen) { s(i) = mulawDecode(b(dataOff + i)); i += 1 }
          s
        case _ =>
          val s = new Array[Short](dataLen)
          var i = 0
          while (i < dataLen) { s(i) = alawDecode(b(dataOff + i)); i += 1 }
          s
      }
      DecodedAudio(rate, channels, samples)
    }
  }

  /** Decoded video: per-frame top-down RGB rasters + stream timing. */
  final case class DecodedVideo(width: Int, height: Int, fps: Int,
      frames: Array[Array[Byte]])

  trait VideoDecoder extends Serializable {
    def decode(bytes: Array[Byte]): DecodedVideo
  }

  private[multimodal] def wTag(b: Array[Byte], off: Int, tag: String): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = tag.charAt(i).toByte; i += 1 }
  }

  /** Closed-form byte size of [[aviEncode]]'s output: 12-byte RIFF
    * header + 200-byte hdrl LIST (avih 64 + strl 124) + movi LIST
    * (12 + nFrames x (8 + stride x height)). The oracle replays this. */
  def aviSize(width: Int, height: Int, nFrames: Int): Int =
    224 + nFrames * (8 + bmpStride(width) * height)

  /** Encode top-down RGB rasters as an uncompressed RIFF/AVI (the
    * video container the reference's cv2.VideoCapture loop reads,
    * raw_to_samples.py:173-196): 'RIFF…AVI ' + LIST hdrl (avih main
    * header + LIST strl with a 'vids'/'DIB ' strh and a
    * BITMAPINFOHEADER strf) + LIST movi holding one '00db' chunk per
    * frame, each a bottom-up BGR stride-padded DIB — the same pixel
    * array layout as the BMP body, per the public AVI/DIB byte specs. */
  def aviEncode(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps > 0 && frames.nonEmpty, "need fps > 0 and >= 1 frame")
    frames.foreach(f => require(f.length == width * height * 3,
      s"frame length ${f.length} != $width x $height x 3"))
    val stride = bmpStride(width)
    val frameBytes = stride * height
    val nf = frames.length
    val size = aviSize(width, height, nf)
    val out = new Array[Byte](size)
    wTag(out, 0, "RIFF"); w32(out, 4, size - 8); wTag(out, 8, "AVI ")
    // LIST hdrl: content = 'hdrl' + avih(64) + strl LIST(124) = 192
    wTag(out, 12, "LIST"); w32(out, 16, 192); wTag(out, 20, "hdrl")
    // avih (MainAVIHeader, 56 bytes)
    wTag(out, 24, "avih"); w32(out, 28, 56)
    val avih = 32
    w32(out, avih, 1000000 / fps)          // dwMicroSecPerFrame
    w32(out, avih + 4, fps * frameBytes)   // dwMaxBytesPerSec
    w32(out, avih + 16, nf)                // dwTotalFrames
    w32(out, avih + 24, 1)                 // dwStreams
    w32(out, avih + 28, frameBytes + 8)    // dwSuggestedBufferSize
    w32(out, avih + 32, width); w32(out, avih + 36, height)
    // LIST strl: content = 'strl' + strh(64) + strf(48) = 116
    wTag(out, 88, "LIST"); w32(out, 92, 116); wTag(out, 96, "strl")
    wTag(out, 100, "strh"); w32(out, 104, 56)
    val strh = 108
    wTag(out, strh, "vids"); wTag(out, strh + 4, "DIB ")
    w32(out, strh + 20, 1)                 // dwScale
    w32(out, strh + 24, fps)               // dwRate (fps = rate/scale)
    w32(out, strh + 32, nf)                // dwLength
    w32(out, strh + 36, frameBytes + 8)    // dwSuggestedBufferSize
    w16(out, strh + 52, width); w16(out, strh + 54, height) // rcFrame
    wTag(out, 164, "strf"); w32(out, 168, 40)
    val strf = 172
    w32(out, strf, 40)                     // biSize
    w32(out, strf + 4, width); w32(out, strf + 8, height) // bottom-up
    w16(out, strf + 12, 1); w16(out, strf + 14, 24) // planes, bpp
    w32(out, strf + 16, 0)                 // BI_RGB
    w32(out, strf + 20, frameBytes)        // biSizeImage
    // LIST movi
    wTag(out, 212, "LIST"); w32(out, 216, 4 + nf * (8 + frameBytes))
    wTag(out, 220, "movi")
    var off = 224
    frames.foreach { f =>
      wTag(out, off, "00db"); w32(out, off + 4, frameBytes)
      writeDib(width, height, f, out, off + 8)
      off += 8 + frameBytes // stride is 4-aligned, so never odd
    }
    out
  }

  /** One multimodal container: video frames AND the audio track
    * parsed out of the same RIFF/AVI byte stream. */
  final case class DecodedAv(video: DecodedVideo, audio: DecodedAudio)

  trait AvDecoder extends Serializable {
    def decode(bytes: Array[Byte]): DecodedAv
  }

  /** Closed-form byte size of [[aviEncodeAv]]'s output: 12-byte RIFF
    * header + 300-byte hdrl (avih 64 + vids strl 124 + auds strl
    * 100) + movi LIST (12 + per frame one 00db (8 + stride x height)
    * and one 01wb (8 + 2 x samplesPerFrame)). */
  def aviAvSize(width: Int, height: Int, nFrames: Int,
      samplesPerFrame: Int): Int =
    324 + nFrames * (16 + bmpStride(width) * height + 2 * samplesPerFrame)

  /** Encode an interleaved two-stream AVI — the layout real muxers
    * emit (vids + auds stream headers in hdrl; movi alternates one
    * '00db' DIB frame with one '01wb' PCM16 chunk of that frame's
    * audio span). samples.length must equal nFrames x
    * samplesPerFrame; the audio rate is fps x samplesPerFrame so the
    * two streams cover the same wall-clock. */
  def aviEncodeAv(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]], samplesPerFrame: Int,
      samples: Array[Short]): Array[Byte] = {
    require(fps > 0 && frames.nonEmpty && samplesPerFrame > 0,
      "need fps > 0, >= 1 frame, samplesPerFrame > 0")
    val nf = frames.length
    require(samples.length == nf * samplesPerFrame,
      s"audio length ${samples.length} != $nf x $samplesPerFrame")
    frames.foreach(f => require(f.length == width * height * 3,
      s"frame length ${f.length} != $width x $height x 3"))
    val stride = bmpStride(width)
    val frameBytes = stride * height
    val audioBytesPerFrame = 2 * samplesPerFrame
    val sampleRate = fps * samplesPerFrame
    val size = aviAvSize(width, height, nf, samplesPerFrame)
    val out = new Array[Byte](size)
    wTag(out, 0, "RIFF"); w32(out, 4, size - 8); wTag(out, 8, "AVI ")
    // LIST hdrl: 'hdrl' + avih(64) + vids strl(124) + auds strl(100)
    wTag(out, 12, "LIST"); w32(out, 16, 292); wTag(out, 20, "hdrl")
    wTag(out, 24, "avih"); w32(out, 28, 56)
    val avih = 32
    w32(out, avih, 1000000 / fps)
    w32(out, avih + 4, fps * (frameBytes + audioBytesPerFrame))
    w32(out, avih + 16, nf)
    w32(out, avih + 24, 2) // dwStreams: video + audio
    w32(out, avih + 28, frameBytes + 8)
    w32(out, avih + 32, width); w32(out, avih + 36, height)
    // vids strl (identical to aviEncode's)
    wTag(out, 88, "LIST"); w32(out, 92, 116); wTag(out, 96, "strl")
    wTag(out, 100, "strh"); w32(out, 104, 56)
    val strh = 108
    wTag(out, strh, "vids"); wTag(out, strh + 4, "DIB ")
    w32(out, strh + 20, 1); w32(out, strh + 24, fps)
    w32(out, strh + 32, nf); w32(out, strh + 36, frameBytes + 8)
    w16(out, strh + 52, width); w16(out, strh + 54, height)
    wTag(out, 164, "strf"); w32(out, 168, 40)
    val strf = 172
    w32(out, strf, 40)
    w32(out, strf + 4, width); w32(out, strf + 8, height)
    w16(out, strf + 12, 1); w16(out, strf + 14, 24)
    w32(out, strf + 16, 0); w32(out, strf + 20, frameBytes)
    // auds strl: strh(64) + WAVEFORMATEX strf(24)
    wTag(out, 212, "LIST"); w32(out, 216, 92); wTag(out, 220, "strl")
    wTag(out, 224, "strh"); w32(out, 228, 56)
    val ash = 232
    wTag(out, ash, "auds") // fccHandler 0 for PCM
    w32(out, ash + 20, 1)               // dwScale
    w32(out, ash + 24, sampleRate)      // dwRate (samples/sec)
    w32(out, ash + 32, samples.length)  // dwLength in samples
    w32(out, ash + 36, audioBytesPerFrame + 8)
    w32(out, ash + 44, 2)               // dwSampleSize
    wTag(out, 288, "strf"); w32(out, 292, 16)
    val asf = 296
    w16(out, asf, 1)                    // wFormatTag PCM
    w16(out, asf + 2, 1)                // nChannels mono
    w32(out, asf + 4, sampleRate)
    w32(out, asf + 8, sampleRate * 2)   // nAvgBytesPerSec
    w16(out, asf + 12, 2)               // nBlockAlign
    w16(out, asf + 14, 16)              // wBitsPerSample
    // LIST movi: interleave 00db / 01wb per frame
    wTag(out, 312, "LIST")
    w32(out, 316, 4 + nf * (16 + frameBytes + audioBytesPerFrame))
    wTag(out, 320, "movi")
    var off = 324
    var f = 0
    while (f < nf) {
      wTag(out, off, "00db"); w32(out, off + 4, frameBytes)
      writeDib(width, height, frames(f), out, off + 8)
      off += 8 + frameBytes
      wTag(out, off, "01wb"); w32(out, off + 4, audioBytesPerFrame)
      var i = 0
      while (i < samplesPerFrame) {
        w16(out, off + 8 + i * 2, samples(f * samplesPerFrame + i) & 0xffff)
        i += 1
      }
      off += 8 + audioBytesPerFrame
      f += 1
    }
    out
  }

  /** Closed-form byte size of [[aviEncodeAvG711]]'s output: as
    * [[aviAvSize]] but the audio chunks carry ONE companded byte per
    * sample (plus the RIFF pad byte when samplesPerFrame is odd). */
  def aviAvG711Size(width: Int, height: Int, nFrames: Int,
      samplesPerFrame: Int): Int =
    324 + nFrames * (16 + bmpStride(width) * height +
      samplesPerFrame + (samplesPerFrame & 1))

  /** The COMPANDED-audio twin of [[aviEncodeAv]]: identical
    * interleaved two-stream layout, but the auds stream is G.711
    * (WAVEFORMATEX wFormatTag 7 µ-law / 6 A-law, 8 bits/sample,
    * block align 1) and each '01wb' chunk carries that frame's span
    * of codewords — the telephony-audio AVIs surveillance and
    * call-recording pipelines mux. Odd-length audio chunks get the
    * RIFF pad byte. */
  def aviEncodeAvG711(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]], samplesPerFrame: Int,
      codes: Array[Byte], mulaw: Boolean): Array[Byte] = {
    require(fps > 0 && frames.nonEmpty && samplesPerFrame > 0,
      "need fps > 0, >= 1 frame, samplesPerFrame > 0")
    val nf = frames.length
    require(codes.length == nf * samplesPerFrame,
      s"audio length ${codes.length} != $nf x $samplesPerFrame")
    frames.foreach(f => require(f.length == width * height * 3,
      s"frame length ${f.length} != $width x $height x 3"))
    val stride = bmpStride(width)
    val frameBytes = stride * height
    val audioChunk = samplesPerFrame
    val audioPad = samplesPerFrame & 1
    val sampleRate = fps * samplesPerFrame
    val size = aviAvG711Size(width, height, nf, samplesPerFrame)
    val out = new Array[Byte](size)
    wTag(out, 0, "RIFF"); w32(out, 4, size - 8); wTag(out, 8, "AVI ")
    wTag(out, 12, "LIST"); w32(out, 16, 292); wTag(out, 20, "hdrl")
    wTag(out, 24, "avih"); w32(out, 28, 56)
    val avih = 32
    w32(out, avih, 1000000 / fps)
    w32(out, avih + 4, fps * (frameBytes + audioChunk))
    w32(out, avih + 16, nf)
    w32(out, avih + 24, 2) // dwStreams: video + audio
    w32(out, avih + 28, frameBytes + 8)
    w32(out, avih + 32, width); w32(out, avih + 36, height)
    wTag(out, 88, "LIST"); w32(out, 92, 116); wTag(out, 96, "strl")
    wTag(out, 100, "strh"); w32(out, 104, 56)
    val strh = 108
    wTag(out, strh, "vids"); wTag(out, strh + 4, "DIB ")
    w32(out, strh + 20, 1); w32(out, strh + 24, fps)
    w32(out, strh + 32, nf); w32(out, strh + 36, frameBytes + 8)
    w16(out, strh + 52, width); w16(out, strh + 54, height)
    wTag(out, 164, "strf"); w32(out, 168, 40)
    val strf = 172
    w32(out, strf, 40)
    w32(out, strf + 4, width); w32(out, strf + 8, height)
    w16(out, strf + 12, 1); w16(out, strf + 14, 24)
    w32(out, strf + 16, 0); w32(out, strf + 20, frameBytes)
    wTag(out, 212, "LIST"); w32(out, 216, 92); wTag(out, 220, "strl")
    wTag(out, 224, "strh"); w32(out, 228, 56)
    val ash = 232
    wTag(out, ash, "auds")
    w32(out, ash + 20, 1)               // dwScale
    w32(out, ash + 24, sampleRate)      // dwRate (samples/sec)
    w32(out, ash + 32, codes.length)    // dwLength in samples
    w32(out, ash + 36, audioChunk + 8)
    w32(out, ash + 44, 1)               // dwSampleSize: 1 byte
    wTag(out, 288, "strf"); w32(out, 292, 16)
    val asf = 296
    w16(out, asf, if (mulaw) 7 else 6)  // wFormatTag G.711
    w16(out, asf + 2, 1)                // nChannels mono
    w32(out, asf + 4, sampleRate)
    w32(out, asf + 8, sampleRate)       // nAvgBytesPerSec: 1 byte/sample
    w16(out, asf + 12, 1)               // nBlockAlign
    w16(out, asf + 14, 8)               // wBitsPerSample
    wTag(out, 312, "LIST")
    w32(out, 316, 4 + nf * (16 + frameBytes + audioChunk + audioPad))
    wTag(out, 320, "movi")
    var off = 324
    var f = 0
    while (f < nf) {
      wTag(out, off, "00db"); w32(out, off + 4, frameBytes)
      writeDib(width, height, frames(f), out, off + 8)
      off += 8 + frameBytes
      wTag(out, off, "01wb"); w32(out, off + 4, audioChunk)
      System.arraycopy(codes, f * samplesPerFrame, out, off + 8,
        samplesPerFrame)
      off += 8 + audioChunk + audioPad
      f += 1
    }
    out
  }

  /** The real two-stream decoder: same chunk walk as [[AviDecoder]],
    * but the hdrl parse tracks WHICH stream each strl describes
    * (strh fccType routes the following strf), and the movi walk
    * routes '00db'/'00dc' to the raster path and '01wb' to the audio
    * path (PCM16, or G.711 µ/A-law expanded through the exact
    * integer tables) — one parse of one byte stream yields both
    * typed outputs. */
  final class AviAvDecoder extends AvDecoder {
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    private def checkedLen(b: Array[Byte], off: Int, end: Int): Int = {
      val len = s32(b, off + 4)
      require(len >= 0 && off + 8 + len.toLong <= end,
        s"corrupt RIFF chunk '${tag(b, off)}' len $len at offset $off")
      len
    }

    def decode(b: Array[Byte]): DecodedAv = {
      require(b.length >= 12 && tag(b, 0) == "RIFF" &&
        tag(b, 8) == "AVI ", "not a RIFF/AVI")
      var width = 0; var height = 0; var topDown = false
      var vScale = 0; var vRate = 0
      var aRate = 0; var aChannels = 0; var aFmt = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val audio = scala.collection.mutable.ArrayBuffer.empty[Short]

      def parseStrl(from: Int, end: Int): Unit = {
        var off = from
        var cur = "" // fccType of the strh seen last in THIS strl
        while (off + 8 <= end) {
          val len = checkedLen(b, off, end)
          tag(b, off) match {
            case "strh" =>
              require(len >= 56, s"strh too short ($len)")
              cur = tag(b, off + 8)
              if (cur == "vids") {
                require(tag(b, off + 12) == "DIB " ||
                  s32(b, off + 12) == 0, "only uncompressed DIB video")
                vScale = s32(b, off + 28); vRate = s32(b, off + 32)
              }
            case "strf" if cur == "vids" =>
              require(len >= 40, s"strf too short ($len)")
              width = s32(b, off + 12)
              val hRaw = s32(b, off + 16)
              topDown = hRaw < 0
              height = math.abs(hRaw)
              require(u16(b, off + 20) == 1 && u16(b, off + 22) == 24,
                "only 24-bit single-plane supported")
              require(s32(b, off + 24) == 0, "only BI_RGB supported")
            case "strf" if cur == "auds" =>
              require(len >= 16, s"audio strf too short ($len)")
              aFmt = u16(b, off + 8)
              require(aFmt == 1 || aFmt == 6 || aFmt == 7,
                s"only PCM or G.711 audio (got format tag $aFmt)")
              aChannels = u16(b, off + 10)
              aRate = s32(b, off + 12)
              val bits = u16(b, off + 22)
              require(if (aFmt == 1) bits == 16 else bits == 8,
                s"bad bits/sample $bits for format tag $aFmt")
            case _ => ()
          }
          off += 8 + len + (len & 1)
        }
      }

      def parseHdrl(from: Int, end: Int): Unit = {
        var off = from
        while (off + 8 <= end) {
          val len = checkedLen(b, off, end)
          if (tag(b, off) == "LIST" && len >= 4 &&
            tag(b, off + 8) == "strl") parseStrl(off + 12, off + 8 + len)
          off += 8 + len + (len & 1)
        }
      }

      def parseMovi(from: Int, end: Int): Unit = {
        var off = from
        while (off + 8 <= end) {
          val len = checkedLen(b, off, end)
          tag(b, off) match {
            case "00db" | "00dc" =>
              require(width > 0 && height > 0,
                "movi frame before stream headers")
              require(len >= bmpStride(width) * height,
                s"frame chunk len $len short of the raster")
              frames += readDib(b, off + 8, width, height, topDown)
            case "01wb" =>
              require(aFmt != 0, "movi audio before the auds strf")
              if (aFmt == 1) {
                var i = 0
                while (i < len / 2) {
                  audio += u16(b, off + 8 + i * 2).toShort
                  i += 1
                }
              } else {
                // companded: expand each codeword byte (G.711)
                var i = 0
                while (i < len) {
                  val c = b(off + 8 + i)
                  audio += (if (aFmt == 7) mulawDecode(c) else alawDecode(c))
                  i += 1
                }
              }
            case _ => ()
          }
          off += 8 + len + (len & 1)
        }
      }

      var off = 12
      while (off + 8 <= b.length) {
        val len = checkedLen(b, off, b.length)
        if (tag(b, off) == "LIST" && len >= 4) {
          tag(b, off + 8) match {
            case "hdrl" => parseHdrl(off + 12, off + 8 + len)
            case "movi" => parseMovi(off + 12, off + 8 + len)
            case _ => ()
          }
        }
        off += 8 + len + (len & 1)
      }
      require(width > 0 && height > 0, "missing vids strf header")
      require(vScale > 0 && vRate > 0, "missing or zero strh timing")
      require(frames.nonEmpty, "no movi frames")
      require(aRate > 0 && audio.nonEmpty, "missing audio stream")
      DecodedAv(
        DecodedVideo(width, height, vRate / vScale, frames.toArray),
        DecodedAudio(aRate, aChannels, audio.toArray))
    }
  }

  // ---------------------------------------------------------------
  // ISO BMFF (MP4) — the reference's ACTUAL container format
  // (raw_to_samples.py opens .mp4 files; preprocess_dataset.py:59-70
  // re-encodes .mov -> .mp4). The codec payload (H.264 et al.) is not
  // JVM-parseable and stays the documented surrogate boundary, but
  // everything the reference READS BEFORE decoding — fps, frame
  // count, duration, track dims (cv2's CAP_PROP_FPS /
  // CAP_PROP_FRAME_COUNT probe, raw_to_samples.py:302-307) — lives in
  // the moov box tree, which is a fully specified big-endian byte
  // layout (ISO/IEC 14496-12). So the container PROBE runs on real
  // bytes: a genuine box walk over ftyp/moov/mvhd/trak/tkhd/mdhd/
  // hdlr/stts/mdat, with every box size validated before descent.
  // ---------------------------------------------------------------

  /** Big-endian reads/writes — ISO BMFF is big-endian, unlike RIFF. */
  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def wbe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >> 24) & 0xff).toByte
    b(off + 1) = ((v >> 16) & 0xff).toByte
    b(off + 2) = ((v >> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }

  private def wbe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >> 8) & 0xff).toByte
    b(off + 1) = (v & 0xff).toByte
  }

  /** Container-level metadata of one MP4: everything a pipeline's
    * probe step (ffprobe / cv2 property reads) extracts WITHOUT
    * touching the codec payload, plus the mdat extent and a payload
    * byte sum proving the walk reached the actual sample data. */
  final case class Mp4Meta(brand: String, timescale: Int, duration: Long,
      nTracks: Int, handler: String, width: Int, height: Int,
      nSamples: Long, sampleDelta: Int, mdatBytes: Long, payloadSum: Long)

  trait ContainerProbe extends Serializable {
    def probe(bytes: Array[Byte]): Mp4Meta
  }

  /** Closed-form byte size of [[mp4Encode]]'s output: ftyp 32 + moov
    * 329 (mvhd 108 + trak 213: tkhd 92 + mdia 113 of mdhd 32 + hdlr
    * 33 + minf 40 of stbl 32 of stts 24) + mdat (8 + payload). */
  def mp4Size(payloadLen: Int): Int = 369 + payloadLen

  /** Encode a minimal-but-genuine single-video-track MP4 box tree
    * (ISO/IEC 14496-12 layouts, version-0 full boxes): ftyp('isom') +
    * moov(mvhd + trak(tkhd + mdia(mdhd + hdlr'vide' +
    * minf(stbl(stts))))) + mdat holding the (opaque) coded payload.
    * stts carries ONE run of `nSamples` samples at `sampleDelta`
    * ticks each — exactly where a real muxer puts frame count and
    * timing, and exactly what a probe reads back (fps = timescale /
    * sampleDelta for constant-rate streams). `moovLast` emits the
    * streaming-muxer box order (mdat before moov) so probes must walk
    * boxes, not assume offsets. */
  def mp4Encode(timescale: Int, nSamples: Int, sampleDelta: Int,
      width: Int, height: Int, payload: Array[Byte],
      moovLast: Boolean = false): Array[Byte] = {
    require(timescale > 0 && nSamples > 0 && sampleDelta > 0 &&
      width > 0 && height > 0, "bad mp4 parameters")
    val duration = nSamples * sampleDelta
    val out = new Array[Byte](mp4Size(payload.length))
    var o = 0
    def box(size: Int, tp: String): Int = {
      wbe32(out, o, size); wTag(out, o + 4, tp); o += 8; o - 8
    }
    // ftyp: major 'isom', minor 0x200, compatible isom/iso2/mp41
    box(32, "ftyp")
    wTag(out, o, "isom"); wbe32(out, o + 4, 0x200)
    wTag(out, o + 8, "isom"); wTag(out, o + 12, "iso2")
    wTag(out, o + 16, "mp41"); wTag(out, o + 20, "mp42"); o += 24
    def writeMdat(): Unit = {
      box(8 + payload.length, "mdat")
      System.arraycopy(payload, 0, out, o, payload.length)
      o += payload.length
    }
    if (moovLast) writeMdat()
    box(329, "moov")
    // mvhd v0: timescale, duration, rate 1.0, volume 1.0, identity
    // matrix, next_track_ID 2
    box(108, "mvhd")
    wbe32(out, o + 12, timescale); wbe32(out, o + 16, duration)
    wbe32(out, o + 20, 0x10000); wbe16(out, o + 24, 0x100)
    wbe32(out, o + 36, 0x10000); wbe32(out, o + 52, 0x10000)
    wbe32(out, o + 68, 0x40000000)
    wbe32(out, o + 96, 2)
    o += 100
    box(213, "trak")
    // tkhd v0, flags 3 (enabled+in-movie): track 1, dims 16.16 fixed
    box(92, "tkhd")
    out(o + 3) = 3
    wbe32(out, o + 12, 1) // track_ID
    wbe32(out, o + 20, duration)
    wbe32(out, o + 40, 0x10000); wbe32(out, o + 56, 0x10000)
    wbe32(out, o + 72, 0x40000000)
    wbe32(out, o + 76, width << 16); wbe32(out, o + 80, height << 16)
    o += 84
    box(113, "mdia")
    // mdhd v0: media timescale + duration, language 'und'
    box(32, "mdhd")
    wbe32(out, o + 12, timescale); wbe32(out, o + 16, duration)
    wbe16(out, o + 20, 0x55c4)
    o += 24
    box(33, "hdlr")
    wTag(out, o + 8, "vide") // handler_type; name = one NUL byte
    o += 25
    box(40, "minf")
    box(32, "stbl")
    // stts: one (sample_count, sample_delta) run
    box(24, "stts")
    wbe32(out, o + 4, 1)
    wbe32(out, o + 8, nSamples); wbe32(out, o + 12, sampleDelta)
    o += 16
    if (!moovLast) writeMdat()
    require(o == out.length, s"encoder wrote $o of ${out.length}")
    out
  }

  /** One indexed sample: its ordinal, ABSOLUTE byte offset in the
    * container, and size — what stsz/stsc/stco resolve to. */
  final case class Mp4Sample(k: Int, off: Long, size: Int)

  trait ContainerIndexer extends Serializable {
    def index(bytes: Array[Byte]): Array[Mp4Sample]
  }

  /** Closed-form byte size of [[mp4EncodeIndexed]]'s output: the
    * [[mp4Size]] tree grown by stsz (20 + 4n) + stsc 28 + stco 20
    * inside stbl. */
  def mp4SizeIndexed(nSamples: Int, payloadLen: Int): Int =
    437 + 4 * nSamples + payloadLen

  /** [[mp4Encode]] with the full sample INDEX a real reader seeks
    * through: stsz carries the per-sample byte sizes, stsc maps all
    * samples into one chunk, stco holds that chunk's ABSOLUTE file
    * offset (so the index depends on box order — the encoder computes
    * it, the indexer must honor it). payload = the samples'
    * concatenated bytes. */
  def mp4EncodeIndexed(timescale: Int, sampleDelta: Int,
      width: Int, height: Int, sampleSizes: Array[Int],
      payload: Array[Byte], moovLast: Boolean = false): Array[Byte] = {
    val n = sampleSizes.length
    require(timescale > 0 && sampleDelta > 0 && n > 0 &&
      width > 0 && height > 0, "bad mp4 parameters")
    require(sampleSizes.forall(_ >= 0) &&
      sampleSizes.map(_.toLong).sum == payload.length,
      "sample sizes must be non-negative and sum to the payload length")
    val duration = n * sampleDelta
    val out = new Array[Byte](mp4SizeIndexed(n, payload.length))
    val mdatOff = if (moovLast) 32 else 32 + 397 + 4 * n
    var o = 0
    def box(size: Int, tp: String): Int = {
      wbe32(out, o, size); wTag(out, o + 4, tp); o += 8; o - 8
    }
    box(32, "ftyp")
    wTag(out, o, "isom"); wbe32(out, o + 4, 0x200)
    wTag(out, o + 8, "isom"); wTag(out, o + 12, "iso2")
    wTag(out, o + 16, "mp41"); wTag(out, o + 20, "mp42"); o += 24
    def writeMdat(): Unit = {
      require(o == mdatOff, s"mdat at $o, expected $mdatOff")
      box(8 + payload.length, "mdat")
      System.arraycopy(payload, 0, out, o, payload.length)
      o += payload.length
    }
    if (moovLast) writeMdat()
    box(397 + 4 * n, "moov")
    box(108, "mvhd")
    wbe32(out, o + 12, timescale); wbe32(out, o + 16, duration)
    wbe32(out, o + 20, 0x10000); wbe16(out, o + 24, 0x100)
    wbe32(out, o + 36, 0x10000); wbe32(out, o + 52, 0x10000)
    wbe32(out, o + 68, 0x40000000)
    wbe32(out, o + 96, 2)
    o += 100
    box(281 + 4 * n, "trak")
    box(92, "tkhd")
    out(o + 3) = 3
    wbe32(out, o + 12, 1)
    wbe32(out, o + 20, duration)
    wbe32(out, o + 40, 0x10000); wbe32(out, o + 56, 0x10000)
    wbe32(out, o + 72, 0x40000000)
    wbe32(out, o + 76, width << 16); wbe32(out, o + 80, height << 16)
    o += 84
    box(181 + 4 * n, "mdia")
    box(32, "mdhd")
    wbe32(out, o + 12, timescale); wbe32(out, o + 16, duration)
    wbe16(out, o + 20, 0x55c4)
    o += 24
    box(33, "hdlr")
    wTag(out, o + 8, "vide")
    o += 25
    box(108 + 4 * n, "minf")
    box(100 + 4 * n, "stbl")
    box(24, "stts")
    wbe32(out, o + 4, 1)
    wbe32(out, o + 8, n); wbe32(out, o + 12, sampleDelta)
    o += 16
    box(20 + 4 * n, "stsz")
    wbe32(out, o + 4, 0) // sample_size 0 => per-sample table follows
    wbe32(out, o + 8, n)
    var i = 0
    while (i < n) { wbe32(out, o + 12 + i * 4, sampleSizes(i)); i += 1 }
    o += 12 + 4 * n
    box(28, "stsc")
    wbe32(out, o + 4, 1)
    wbe32(out, o + 8, 1)     // first_chunk
    wbe32(out, o + 12, n)    // samples_per_chunk: all in one chunk
    wbe32(out, o + 16, 1)    // sample_description_index
    o += 20
    box(20, "stco")
    wbe32(out, o + 4, 1)
    wbe32(out, o + 8, mdatOff + 8) // absolute offset of sample 0
    o += 12
    if (!moovLast) writeMdat()
    require(o == out.length, s"encoder wrote $o of ${out.length}")
    out
  }

  /** Parse one stsz box into per-sample sizes — fixed form or table
    * form, with Long-safe bounds (a corrupted count must not
    * overflow the Int size guard) and a fits-the-container check
    * before the fixed-form allocation. Shared by every MP4 reader. */
  private def parseStsz(b: Array[Byte], off: Int, size: Int): Array[Int] = {
    require(size >= 20, s"stsz too short ($size)")
    val fixed = be32(b, off + 12)
    val n = be32(b, off + 16)
    require(n >= 1, s"stsz sample count $n")
    if (fixed == 0) {
      require(size.toLong >= 20L + n.toLong * 4,
        s"stsz table for $n samples overruns box size $size")
      Array.tabulate(n)(i => be32(b, off + 20 + i * 4))
    } else {
      require(fixed.toLong * n <= b.length,
        s"$n samples of $fixed bytes exceed the container")
      Array.fill(n)(fixed)
    }
  }

  /** Parse one single-run stsc box into samples-per-chunk. */
  private def parseStsc(b: Array[Byte], off: Int, size: Int): Int = {
    require(size >= 28 && be32(b, off + 12) == 1,
      "only the single-run stsc layout is supported")
    be32(b, off + 20)
  }

  /** Parse one stco box into absolute chunk offsets (one or many). */
  private def parseStco(b: Array[Byte], off: Int, size: Int): Array[Long] = {
    require(size >= 16, s"stco too short ($size)")
    val c = be32(b, off + 12)
    require(c >= 1 && size.toLong >= 16L + c.toLong * 4,
      s"stco table for $c chunks overruns box size $size")
    Array.tabulate(c)(i =>
      be32(b, off + 16 + i * 4).toLong & 0xffffffffL)
  }

  /** Parse the 'raw ' VisualSampleEntry of a single-entry stsd into
    * (width, height), validating depth 24 and the raster bound. The
    * caller has already read and dispatched on the entry's fourcc. */
  private def parseRawVideoEntry(b: Array[Byte], off: Int,
      size: Int): (Int, Int) = {
    require(size >= 102, s"video stsd too short ($size)")
    val e = off + 16
    require(be16(b, e + 82) == 24,
      s"only depth-24 packed RGB supported (${be16(b, e + 82)})")
    val w = be16(b, e + 32)
    val h = be16(b, e + 34)
    require(w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue,
      s"corrupt stsd dimensions ${w}x$h")
    (w, h)
  }

  /** Cumulate (stsz sizes, stsc samples-per-chunk, stco chunk
    * offsets) into one (ordinal, absolute offset, size) row per
    * sample — sample k lives in chunk k / spc at that chunk's stco
    * anchor plus the within-chunk size prefix, each extent verified
    * to lie inside the buffer. The constant-interleave contract this
    * engine emits (every chunk exactly spc samples) is CHECKED:
    * chunks x spc must equal the stsz count. */
  private[multimodal] def resolveSamples(sizes: Array[Int], spc: Int,
      chunkOffs: Array[Long], totalLen: Int): Array[Mp4Sample] = {
    require(sizes != null, "missing stsz")
    require(spc >= 1, s"stsc samples/chunk $spc")
    require(chunkOffs != null && chunkOffs.nonEmpty, "missing stco")
    require(chunkOffs.length.toLong * spc == sizes.length,
      s"stsc ${chunkOffs.length} chunks x $spc samples/chunk != " +
        s"stsz count ${sizes.length}")
    val out = new Array[Mp4Sample](sizes.length)
    var k = 0
    var cur = 0L
    while (k < sizes.length) {
      if (k % spc == 0) cur = chunkOffs(k / spc)
      require(sizes(k) >= 0 && cur >= 0 && cur + sizes(k) <= totalLen,
        s"sample $k (${sizes(k)} bytes at $cur) outside the container")
      out(k) = Mp4Sample(k, cur, sizes(k))
      cur += sizes(k)
      k += 1
    }
    out
  }

  /** The real indexer: the [[Mp4Probe]] box walk extended to the
    * sample tables — stsz's per-sample sizes (fixed or table form),
    * stsc's samples-per-chunk, stco's absolute chunk offsets (ONE OR
    * MANY — the multi-chunk layout interleaved real muxers emit) —
    * cumulated into one (ordinal, absolute offset, size) row per
    * sample, each verified to lie inside the buffer. This is the
    * seek path of every real MP4 reader: resolve the index, then
    * read sample bytes straight out of mdat without touching a
    * decoder. */
  final class Mp4Indexer extends ContainerIndexer {
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    def index(b: Array[Byte]): Array[Mp4Sample] = {
      require(b.length >= 16, "too short for an MP4")
      var sizes: Array[Int] = null
      var chunkOffs: Array[Long] = null
      var samplesPerChunk = -1

      def walk(from: Int, end: Int): Unit = {
        var off = from
        while (off + 8 <= end) {
          val size = be32(b, off)
          require(size >= 8 && off.toLong + size <= end,
            s"corrupt box size $size at offset $off")
          tag(b, off + 4) match {
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              walk(off + 8, off + size)
            case "stsz" => sizes = parseStsz(b, off, size)
            case "stsc" => samplesPerChunk = parseStsc(b, off, size)
            case "stco" => chunkOffs = parseStco(b, off, size)
            case _ => ()
          }
          off += size
        }
      }

      walk(0, b.length)
      resolveSamples(sizes, samplesPerChunk, chunkOffs, b.length)
    }
  }

  /** The real probe: walks the top-level box list (big-endian sizes,
    * each validated against its parent before descent — size==0
    * (to-end) and size==1 (64-bit largesize) are rejected as
    * unsupported rather than misparsed), descends
    * moov/trak/mdia/minf/stbl, and reads brand (ftyp), movie
    * timescale + duration (mvhd v0), track count and dims (tkhd v0,
    * 16.16 fixed), handler type (hdlr), the stts sample count/delta,
    * and the mdat extent + payload byte sum. Box ORDER is free (a
    * streaming muxer puts moov after mdat) — the walk never assumes
    * offsets. */
  final class Mp4Probe extends ContainerProbe {
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    def probe(b: Array[Byte]): Mp4Meta = {
      require(b.length >= 16, "too short for an MP4")
      var brand = ""; var timescale = 0; var duration = 0L
      var nTracks = 0; var handler = ""
      var width = 0; var height = 0
      var nSamples = 0L; var sampleDelta = 0
      var mdatBytes = -1L; var payloadSum = 0L

      def version(off: Int): Int = b(off + 8) & 0xff

      def checked(off: Int, end: Int): (Int, String) = {
        val size = be32(b, off)
        require(size >= 8 && off.toLong + size <= end,
          s"corrupt box '${if (size >= 8) tag(b, off + 4) else "?"}' " +
            s"size $size at offset $off")
        (size, tag(b, off + 4))
      }

      // One trak subtree parses into ITS OWN fields (the AviDecoder
      // stream-scoping lesson: a second track's tkhd carries 0x0 dims
      // and its stts different timing — blindly merging traks would
      // corrupt the video fields). The 'vide' track's fields win; a
      // second video track is rejected rather than silently shadowed.
      def parseTrak(from: Int, end: Int): Unit = {
        var tHandler = ""; var tW = 0; var tH = 0
        var tN = 0L; var tDelta = 0
        def walkT(f: Int, e: Int): Unit = {
          var off = f
          while (off + 8 <= e) {
            val (size, tp) = checked(off, e)
            tp match {
              case "mdia" | "minf" | "stbl" => walkT(off + 8, off + size)
              case "tkhd" =>
                require(version(off) == 0 && size >= 92,
                  "only version-0 tkhd supported")
                tW = be32(b, off + 84) >>> 16
                tH = be32(b, off + 88) >>> 16
              case "hdlr" =>
                require(size >= 24, s"hdlr too short ($size)")
                tHandler = tag(b, off + 16)
              case "stts" =>
                require(size >= 16, s"stts too short ($size)")
                val n = be32(b, off + 12)
                require(n >= 1 && size.toLong >= 16L + n.toLong * 8,
                  s"stts entry count $n overruns box size $size")
                var i = 0
                while (i < n) {
                  tN += be32(b, off + 16 + i * 8).toLong & 0xffffffffL
                  if (i == 0) tDelta = be32(b, off + 20 + i * 8)
                  i += 1
                }
              case _ => ()
            }
            off += size
          }
        }
        walkT(from, end)
        nTracks += 1
        if (handler.isEmpty || tHandler == "vide") {
          require(!(handler == "vide" && tHandler == "vide"),
            "two video tracks: ambiguous probe target")
          handler = tHandler
          width = tW; height = tH
          nSamples = tN; sampleDelta = tDelta
        }
      }

      def walk(from: Int, end: Int): Unit = {
        var off = from
        while (off + 8 <= end) {
          val (size, tp) = checked(off, end)
          tp match {
            case "moov" => walk(off + 8, off + size)
            case "trak" => parseTrak(off + 8, off + size)
            case "ftyp" =>
              require(size >= 16, s"ftyp too short ($size)")
              brand = tag(b, off + 8)
            case "mvhd" =>
              require(version(off) == 0 && size >= 108,
                "only version-0 mvhd supported")
              timescale = be32(b, off + 20)
              duration = be32(b, off + 24).toLong & 0xffffffffL
            case "mdat" =>
              mdatBytes = (size - 8).toLong
              var i = off + 8
              while (i < off + size) {
                payloadSum += b(i) & 0xff
                i += 1
              }
            case _ => ()
          }
          off += size
        }
      }

      walk(0, b.length)
      require(brand.nonEmpty, "missing ftyp")
      require(timescale > 0, "missing or zero mvhd timescale")
      require(nTracks > 0 && handler.nonEmpty, "missing trak/hdlr")
      require(nSamples > 0 && sampleDelta > 0, "missing stts timing")
      require(mdatBytes >= 0, "missing mdat")
      Mp4Meta(brand, timescale, duration, nTracks, handler,
        width, height, nSamples, sampleDelta, mdatBytes, payloadSum)
    }
  }

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Closed-form byte size of [[mp4EncodeVideo]]'s output: ftyp 32 +
    * moov 499 (mvhd 108 + trak 383: tkhd 92 + mdia 283 of mdhd 32 +
    * hdlr 33 + minf 210 of stbl 202 holding stsd 102 + stts 24 +
    * stsz 20 + stsc 28 + stco 20) + mdat (8 + nFrames x w x h x 3). */
  def mp4SizeVideo(payloadLen: Int): Int = 539 + payloadLen

  /** Encode top-down RGB rasters as a DECODABLE MP4: the
    * [[mp4EncodeIndexed]] tree grown by an `stsd` sample-description
    * box whose single VisualSampleEntry is the QuickTime/ISO
    * UNCOMPRESSED video format (fourcc 'raw ', depth 24 — packed RGB
    * rows, no padding; the layout QuickTime registered for raw video
    * in MP4-family containers). With the sample DESCRIPTION carried
    * in-band, a reader needs no out-of-band knowledge: stsd says how
    * to interpret sample bytes, stts how to time them, stsz/stsc/
    * stco where to find them. stsz uses its FIXED-size form (all
    * rasters are w*h*3 — the form real muxers emit for constant-size
    * samples). `moovLast` again emits the streaming-muxer box order. */
  def mp4EncodeVideo(timescale: Int, sampleDelta: Int, width: Int,
      height: Int, frames: Seq[Array[Byte]],
      moovLast: Boolean = false): Array[Byte] = {
    val nf = frames.length
    require(timescale > 0 && sampleDelta > 0 && nf > 0 &&
      width > 0 && height > 0, "bad mp4 parameters")
    require(width.toLong * height * 3 * nf + 539 <= Int.MaxValue,
      s"payload of $nf ${width}x$height frames overflows one buffer")
    val fsize = width * height * 3
    frames.foreach(f => require(f.length == fsize,
      s"frame length ${f.length} != $width x $height x 3"))
    val duration = nf * sampleDelta
    val out = new Array[Byte](mp4SizeVideo(nf * fsize))
    val mdatOff = if (moovLast) 32 else 531
    var o = 0
    def box(size: Int, tp: String): Unit = {
      wbe32(out, o, size); wTag(out, o + 4, tp); o += 8
    }
    box(32, "ftyp")
    wTag(out, o, "isom"); wbe32(out, o + 4, 0x200)
    wTag(out, o + 8, "isom"); wTag(out, o + 12, "iso2")
    wTag(out, o + 16, "mp41"); wTag(out, o + 20, "mp42"); o += 24
    def writeMdat(): Unit = {
      require(o == mdatOff, s"mdat at $o, expected $mdatOff")
      box(8 + nf * fsize, "mdat")
      frames.foreach { f =>
        System.arraycopy(f, 0, out, o, fsize); o += fsize
      }
    }
    if (moovLast) writeMdat()
    box(499, "moov")
    box(108, "mvhd")
    wbe32(out, o + 12, timescale); wbe32(out, o + 16, duration)
    wbe32(out, o + 20, 0x10000); wbe16(out, o + 24, 0x100)
    wbe32(out, o + 36, 0x10000); wbe32(out, o + 52, 0x10000)
    wbe32(out, o + 68, 0x40000000)
    wbe32(out, o + 96, 2)
    o += 100
    box(383, "trak")
    box(92, "tkhd")
    out(o + 3) = 3
    wbe32(out, o + 12, 1)
    wbe32(out, o + 20, duration)
    wbe32(out, o + 40, 0x10000); wbe32(out, o + 56, 0x10000)
    wbe32(out, o + 72, 0x40000000)
    wbe32(out, o + 76, width << 16); wbe32(out, o + 80, height << 16)
    o += 84
    box(283, "mdia")
    box(32, "mdhd")
    wbe32(out, o + 12, timescale); wbe32(out, o + 16, duration)
    wbe16(out, o + 20, 0x55c4)
    o += 24
    box(33, "hdlr")
    wTag(out, o + 8, "vide")
    o += 25
    box(210, "minf")
    box(202, "stbl")
    // stsd: one VisualSampleEntry (86 bytes), fourcc 'raw ', depth 24
    box(102, "stsd")
    wbe32(out, o + 4, 1) // entry_count (version/flags at o+0 are 0)
    val e = o + 8
    wbe32(out, e, 86); wTag(out, e + 4, "raw ")
    wbe16(out, e + 14, 1)                 // data_reference_index
    wbe16(out, e + 32, width); wbe16(out, e + 34, height)
    wbe32(out, e + 36, 0x480000)          // 72 dpi, 16.16 fixed
    wbe32(out, e + 40, 0x480000)
    wbe16(out, e + 48, 1)                 // frame_count per sample
    wbe16(out, e + 82, 24)                // depth: packed RGB24
    wbe16(out, e + 84, 0xffff)            // pre_defined = -1
    o += 94
    box(24, "stts")
    wbe32(out, o + 4, 1)
    wbe32(out, o + 8, nf); wbe32(out, o + 12, sampleDelta)
    o += 16
    box(20, "stsz")
    wbe32(out, o + 4, fsize) // fixed sample size: no per-sample table
    wbe32(out, o + 8, nf)
    o += 12
    box(28, "stsc")
    wbe32(out, o + 4, 1)
    wbe32(out, o + 8, 1); wbe32(out, o + 12, nf); wbe32(out, o + 16, 1)
    o += 20
    box(20, "stco")
    wbe32(out, o + 4, 1)
    wbe32(out, o + 8, mdatOff + 8)
    o += 12
    if (!moovLast) writeMdat()
    require(o == out.length, s"encoder wrote $o of ${out.length}")
    out
  }

  /** The real MP4 VIDEO decoder — frame rasters parsed out of the
    * reference's actual container format (raw_to_samples.py opens
    * .mp4; ISO/IEC 14496-12). Composes the two machines the probe
    * and indexer already prove on real bytes: a box walk for the
    * in-band metadata (stsd's VisualSampleEntry gives the sample
    * FORMAT — required to be the uncompressed 'raw ' RGB24 entry —
    * and dims; mdhd gives the media timescale; stts the sample
    * delta, so fps = timescale / delta) plus the [[Mp4Indexer]]
    * stsz/stsc/stco seek path for each sample's absolute extent;
    * each sample is then read straight out of mdat as a top-down
    * packed-RGB raster. With this, the surrogate boundary covers
    * only COMPRESSED codec payloads (H.264 etc. — no media libs);
    * the container, index, timing, and uncompressed-frame rungs of
    * the reference's cv2.VideoCapture loop all run on parsed bytes. */
  final class Mp4VideoDecoder extends VideoDecoder {
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    def decode(b: Array[Byte]): DecodedVideo = {
      require(b.length >= 16, "too short for an MP4")
      var width = 0; var height = 0; var format = ""
      var timescale = 0; var sampleDelta = 0
      var sizes: Array[Int] = null; var spc = -1
      var chunkOffs: Array[Long] = null

      def walk(from: Int, end: Int): Unit = {
        var off = from
        while (off + 8 <= end) {
          val size = be32(b, off)
          require(size >= 8 && off.toLong + size <= end,
            s"corrupt box size $size at offset $off")
          tag(b, off + 4) match {
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              walk(off + 8, off + size)
            case "mdhd" =>
              require(size >= 32 && (b(off + 8) & 0xff) == 0,
                "only version-0 mdhd supported")
              timescale = be32(b, off + 20)
            case "stsd" =>
              require(size >= 24 && be32(b, off + 12) == 1,
                "only a single-entry stsd is supported")
              format = tag(b, off + 20)
              require(format == "raw ",
                s"unsupported sample format '$format' — only the " +
                  "uncompressed 'raw ' RGB entry decodes without a codec")
              val (w, h) = parseRawVideoEntry(b, off, size)
              width = w; height = h
            case "stts" =>
              require(size >= 24 && be32(b, off + 12) == 1,
                "only the single-run stts layout is supported")
              sampleDelta = be32(b, off + 20)
            case "stsz" => sizes = parseStsz(b, off, size)
            case "stsc" => spc = parseStsc(b, off, size)
            case "stco" => chunkOffs = parseStco(b, off, size)
            case _ => ()
          }
          off += size
        }
      }

      walk(0, b.length)
      require(format == "raw ", "missing stsd 'raw ' sample entry")
      require(timescale > 0 && sampleDelta > 0,
        "missing mdhd/stts timing")
      val fsize = width * height * 3
      // one walk collected metadata AND the sample tables; resolve
      // the seek index directly (no second pass over the box tree)
      val frames = resolveSamples(sizes, spc, chunkOffs, b.length)
        .map { sm =>
          require(sm.size == fsize,
            s"sample ${sm.k} is ${sm.size} bytes, raster needs $fsize")
          val f = new Array[Byte](fsize)
          System.arraycopy(b, sm.off.toInt, f, 0, fsize)
          f
        }
      DecodedVideo(width, height, timescale / sampleDelta, frames)
    }
  }

  /** Closed-form byte size of [[mp4EncodeAv]]'s output: ftyp 32 +
    * moov (824 + 8 x nFrames: mvhd 108 + video trak 379+4nf + audio
    * trak 329+4nf — each trak's stco carries nf chunk offsets) +
    * mdat (8 + nFrames x (w x h x 3 + 2 x samplesPerFrame)). */
  def mp4SizeAv(width: Int, height: Int, nFrames: Int,
      samplesPerFrame: Int): Int =
    864 + 8 * nFrames +
      nFrames * (width * height * 3 + 2 * samplesPerFrame)

  /** Encode an interleaved TWO-TRACK MP4 — the layout real muxers
    * emit for AV files: one 'vide' trak (stsd 'raw ' RGB24) and one
    * 'soun' trak (stsd 'sowt', QuickTime's signed little-endian
    * PCM16 AudioSampleEntry), whose mdat alternates one video raster
    * with that frame's audio block. Each trak owns its full sample
    * machinery: the video stco carries nf chunk offsets (one raster
    * per chunk, stsc run 1-sample-per-chunk), the audio stco nf
    * offsets (stsc run samplesPerFrame-per-chunk, stsz fixed 2) —
    * the MULTI-CHUNK index single-track files never exercise. Audio
    * media timescale = video fps x samplesPerFrame so both tracks
    * cover the same wall-clock. */
  def mp4EncodeAv(timescale: Int, sampleDelta: Int, width: Int,
      height: Int, frames: Seq[Array[Byte]], samplesPerFrame: Int,
      samples: Array[Short], moovLast: Boolean = false): Array[Byte] = {
    val nf = frames.length
    require(timescale > 0 && sampleDelta > 0 && nf > 0 &&
      width > 0 && height > 0 && samplesPerFrame > 0 &&
      timescale % sampleDelta == 0, "bad mp4 parameters")
    require(samples.length == nf * samplesPerFrame,
      s"audio length ${samples.length} != $nf x $samplesPerFrame")
    require((width.toLong * height * 3 + 2L * samplesPerFrame) * nf
      + 864L + 8L * nf <= Int.MaxValue,
      s"payload of $nf ${width}x$height AV frames overflows one buffer")
    val fsize = width * height * 3
    frames.foreach(f => require(f.length == fsize,
      s"frame length ${f.length} != $width x $height x 3"))
    val duration = nf * sampleDelta
    val audioRate = (timescale / sampleDelta) * samplesPerFrame
    val abytes = 2 * samplesPerFrame
    val out = new Array[Byte](mp4SizeAv(width, height, nf,
      samplesPerFrame))
    val mdatOff = if (moovLast) 32 else 856 + 8 * nf
    var o = 0
    def box(size: Int, tp: String): Unit = {
      wbe32(out, o, size); wTag(out, o + 4, tp); o += 8
    }
    def chunkOff(f: Int): Int = mdatOff + 8 + f * (fsize + abytes)
    box(32, "ftyp")
    wTag(out, o, "isom"); wbe32(out, o + 4, 0x200)
    wTag(out, o + 8, "isom"); wTag(out, o + 12, "iso2")
    wTag(out, o + 16, "mp41"); wTag(out, o + 20, "mp42"); o += 24
    def writeMdat(): Unit = {
      require(o == mdatOff, s"mdat at $o, expected $mdatOff")
      box(8 + nf * (fsize + abytes), "mdat")
      var f = 0
      while (f < nf) {
        System.arraycopy(frames(f), 0, out, o, fsize); o += fsize
        var i = 0
        while (i < samplesPerFrame) {
          // 'sowt' = little-endian PCM16 (the QuickTime fourcc)
          w16(out, o, samples(f * samplesPerFrame + i) & 0xffff)
          o += 2; i += 1
        }
        f += 1
      }
    }
    if (moovLast) writeMdat()
    box(824 + 8 * nf, "moov")
    box(108, "mvhd")
    wbe32(out, o + 12, timescale); wbe32(out, o + 16, duration)
    wbe32(out, o + 20, 0x10000); wbe16(out, o + 24, 0x100)
    wbe32(out, o + 36, 0x10000); wbe32(out, o + 52, 0x10000)
    wbe32(out, o + 68, 0x40000000)
    wbe32(out, o + 96, 3) // next_track_ID: two tracks used
    o += 100
    // ---- video trak ----
    box(379 + 4 * nf, "trak")
    box(92, "tkhd")
    out(o + 3) = 3
    wbe32(out, o + 12, 1)
    wbe32(out, o + 20, duration)
    wbe32(out, o + 40, 0x10000); wbe32(out, o + 56, 0x10000)
    wbe32(out, o + 72, 0x40000000)
    wbe32(out, o + 76, width << 16); wbe32(out, o + 80, height << 16)
    o += 84
    box(279 + 4 * nf, "mdia")
    box(32, "mdhd")
    wbe32(out, o + 12, timescale); wbe32(out, o + 16, duration)
    wbe16(out, o + 20, 0x55c4)
    o += 24
    box(33, "hdlr")
    wTag(out, o + 8, "vide")
    o += 25
    box(206 + 4 * nf, "minf")
    box(198 + 4 * nf, "stbl")
    box(102, "stsd")
    wbe32(out, o + 4, 1)
    val ve = o + 8
    wbe32(out, ve, 86); wTag(out, ve + 4, "raw ")
    wbe16(out, ve + 14, 1)
    wbe16(out, ve + 32, width); wbe16(out, ve + 34, height)
    wbe32(out, ve + 36, 0x480000); wbe32(out, ve + 40, 0x480000)
    wbe16(out, ve + 48, 1)
    wbe16(out, ve + 82, 24)
    wbe16(out, ve + 84, 0xffff)
    o += 94
    box(24, "stts")
    wbe32(out, o + 4, 1)
    wbe32(out, o + 8, nf); wbe32(out, o + 12, sampleDelta)
    o += 16
    box(20, "stsz")
    wbe32(out, o + 4, fsize); wbe32(out, o + 8, nf)
    o += 12
    box(28, "stsc")
    wbe32(out, o + 4, 1)
    wbe32(out, o + 8, 1); wbe32(out, o + 12, 1); wbe32(out, o + 16, 1)
    o += 20
    box(16 + 4 * nf, "stco")
    wbe32(out, o + 4, nf)
    var f = 0
    while (f < nf) { wbe32(out, o + 8 + f * 4, chunkOff(f)); f += 1 }
    o += 8 + 4 * nf
    // ---- audio trak ----
    box(329 + 4 * nf, "trak")
    box(92, "tkhd")
    out(o + 3) = 3
    wbe32(out, o + 12, 2) // track_ID 2; dims stay 0x0 for audio
    wbe32(out, o + 20, duration)
    wbe32(out, o + 40, 0x10000); wbe32(out, o + 56, 0x10000)
    wbe32(out, o + 72, 0x40000000)
    o += 84
    box(229 + 4 * nf, "mdia")
    box(32, "mdhd")
    wbe32(out, o + 12, audioRate) // media timescale = sample rate
    wbe32(out, o + 16, nf * samplesPerFrame)
    wbe16(out, o + 20, 0x55c4)
    o += 24
    box(33, "hdlr")
    wTag(out, o + 8, "soun")
    o += 25
    box(156 + 4 * nf, "minf")
    box(148 + 4 * nf, "stbl")
    // stsd: one AudioSampleEntry (36 bytes), fourcc 'sowt' (PCM16 LE)
    box(52, "stsd")
    wbe32(out, o + 4, 1)
    val ae = o + 8
    wbe32(out, ae, 36); wTag(out, ae + 4, "sowt")
    wbe16(out, ae + 14, 1)            // data_reference_index
    wbe16(out, ae + 24, 1)            // channelcount: mono
    wbe16(out, ae + 26, 16)           // samplesize bits
    wbe32(out, ae + 32, audioRate << 16) // 16.16 fixed
    o += 44
    box(24, "stts")
    wbe32(out, o + 4, 1)
    wbe32(out, o + 8, nf * samplesPerFrame); wbe32(out, o + 12, 1)
    o += 16
    box(20, "stsz")
    wbe32(out, o + 4, 2); wbe32(out, o + 8, nf * samplesPerFrame)
    o += 12
    box(28, "stsc")
    wbe32(out, o + 4, 1)
    wbe32(out, o + 8, 1); wbe32(out, o + 12, samplesPerFrame)
    wbe32(out, o + 16, 1)
    o += 20
    box(16 + 4 * nf, "stco")
    wbe32(out, o + 4, nf)
    f = 0
    while (f < nf) {
      wbe32(out, o + 8 + f * 4, chunkOff(f) + fsize); f += 1
    }
    o += 8 + 4 * nf
    if (!moovLast) writeMdat()
    require(o == out.length, s"encoder wrote $o of ${out.length}")
    out
  }

  /** The real TWO-TRACK MP4 decoder: per-trak scoped box walk (the
    * [[Mp4Probe]] lesson — each trak's stsd/stts/stsz/stsc/stco
    * parse into ITS OWN fields, routed by hdlr), then each track's
    * samples resolve through the shared multi-chunk index cumulation
    * ([[resolveSamples]]) and read straight out of the interleaved
    * mdat: video rasters from the 'raw ' track, little-endian PCM16
    * from the 'sowt' track — one parse of one byte stream yields
    * both typed modalities, through the genuinely multi-chunk stco
    * layout interleaving forces. */
  final class Mp4AvDecoder extends AvDecoder {
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    def decode(b: Array[Byte]): DecodedAv = {
      require(b.length >= 16, "too short for an MP4")
      // video track fields
      var vW = 0; var vH = 0; var vTs = 0; var vDelta = 0
      var vSizes: Array[Int] = null; var vSpc = -1
      var vOffs: Array[Long] = null
      // audio track fields
      var aRate = 0; var aChannels = 0
      var aSizes: Array[Int] = null; var aSpc = -1
      var aOffs: Array[Long] = null
      var sawVide = false; var sawSoun = false

      def parseTrak(from: Int, end: Int): Unit = {
        var handler = ""; var format = ""
        var w = 0; var h = 0; var ts = 0; var delta = 0
        var channels = 0
        var sizes: Array[Int] = null; var spc = -1
        var offs: Array[Long] = null
        def walkT(f0: Int, e0: Int): Unit = {
          var off = f0
          while (off + 8 <= e0) {
            val size = be32(b, off)
            require(size >= 8 && off.toLong + size <= e0,
              s"corrupt box size $size at offset $off")
            tag(b, off + 4) match {
              case "mdia" | "minf" | "stbl" => walkT(off + 8, off + size)
              case "mdhd" =>
                require(size >= 32 && (b(off + 8) & 0xff) == 0,
                  "only version-0 mdhd supported")
                ts = be32(b, off + 20)
              case "hdlr" =>
                require(size >= 24, s"hdlr too short ($size)")
                handler = tag(b, off + 16)
              case "stsd" =>
                require(size >= 24 && be32(b, off + 12) == 1,
                  "only a single-entry stsd is supported")
                val e = off + 16
                format = tag(b, e + 4)
                if (format == "raw ") {
                  val (vw, vh) = parseRawVideoEntry(b, off, size)
                  w = vw; h = vh
                } else if (format == "sowt") {
                  require(size >= 52, s"audio stsd too short ($size)")
                  channels = be16(b, e + 24)
                  require(be16(b, e + 26) == 16,
                    "only 16-bit PCM supported")
                } else throw new IllegalArgumentException(
                  s"unsupported sample format '$format' — only " +
                    "'raw ' video and 'sowt' PCM decode without a codec")
              case "stts" =>
                require(size >= 24 && be32(b, off + 12) == 1,
                  "only the single-run stts layout is supported")
                delta = be32(b, off + 20)
              case "stsz" => sizes = parseStsz(b, off, size)
              case "stsc" => spc = parseStsc(b, off, size)
              case "stco" => offs = parseStco(b, off, size)
              case _ => ()
            }
            off += size
          }
        }
        walkT(from, end)
        if (handler == "vide") {
          require(!sawVide, "two video tracks: ambiguous")
          sawVide = true
          require(format == "raw ", "video trak missing 'raw ' stsd")
          vW = w; vH = h; vTs = ts; vDelta = delta
          vSizes = sizes; vSpc = spc; vOffs = offs
        } else if (handler == "soun") {
          require(!sawSoun, "two audio tracks: ambiguous")
          sawSoun = true
          require(format == "sowt", "audio trak missing 'sowt' stsd")
          aRate = ts // media timescale IS the PCM sample rate
          aChannels = channels
          aSizes = sizes; aSpc = spc; aOffs = offs
        }
      }

      def walk(from: Int, end: Int): Unit = {
        var off = from
        while (off + 8 <= end) {
          val size = be32(b, off)
          require(size >= 8 && off.toLong + size <= end,
            s"corrupt box size $size at offset $off")
          tag(b, off + 4) match {
            case "moov" => walk(off + 8, off + size)
            case "trak" => parseTrak(off + 8, off + size)
            case _ => ()
          }
          off += size
        }
      }

      walk(0, b.length)
      require(sawVide && sawSoun, "need one video and one audio trak")
      require(vTs > 0 && vDelta > 0, "missing video mdhd/stts timing")
      require(aRate > 0, "missing audio mdhd timescale")
      val fsize = vW * vH * 3
      val frames = resolveSamples(vSizes, vSpc, vOffs, b.length).map {
        sm =>
          require(sm.size == fsize,
            s"sample ${sm.k} is ${sm.size} bytes, raster needs $fsize")
          val fr = new Array[Byte](fsize)
          System.arraycopy(b, sm.off.toInt, fr, 0, fsize)
          fr
      }
      val pcm = resolveSamples(aSizes, aSpc, aOffs, b.length).map { sm =>
        require(sm.size == 2, s"PCM sample ${sm.k} is ${sm.size} bytes")
        u16(b, sm.off.toInt).toShort // 'sowt': little-endian
      }
      DecodedAv(
        DecodedVideo(vW, vH, vTs / vDelta, frames),
        DecodedAudio(aRate, aChannels, pcm))
    }
  }

  /** The real decoder: walks the top-level RIFF chunk list, descends
    * the hdrl LIST for the stream headers (avih dims, strh
    * rate/scale timing, strf raster format), then the movi LIST
    * collecting '00db'/'00dc' DIB frames — each unpacked through the
    * same stride/BGR/bottom-up raster logic as BMP. Every chunk
    * length is validated against the buffer before reading, so
    * crafted bytes fail fast instead of looping or over-indexing. */
  final class AviDecoder extends VideoDecoder {
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    private def checkedLen(b: Array[Byte], off: Int, end: Int): Int = {
      val len = s32(b, off + 4)
      require(len >= 0 && off + 8 + len.toLong <= end,
        s"corrupt RIFF chunk '${tag(b, off)}' len $len at offset $off")
      len
    }

    def decode(b: Array[Byte]): DecodedVideo = {
      require(b.length >= 12 && tag(b, 0) == "RIFF" &&
        tag(b, 8) == "AVI ", "not a RIFF/AVI")
      var width = 0; var height = 0; var topDown = false
      var scale = 0; var rate = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

      def parseStrl(from: Int, end: Int): Unit = {
        var off = from
        var cur = "" // fccType of the strh seen last in THIS strl —
        // a two-stream file's audio strl also carries a strf
        // (WAVEFORMATEX), which must not be parsed as a bitmap header
        while (off + 8 <= end) {
          val len = checkedLen(b, off, end)
          tag(b, off) match {
            case "strh" =>
              require(len >= 56, s"strh too short ($len)")
              cur = tag(b, off + 8)
              if (cur == "vids") {
                require(tag(b, off + 12) == "DIB " ||
                  s32(b, off + 12) == 0, "only uncompressed DIB video")
                scale = s32(b, off + 28); rate = s32(b, off + 32)
              }
            case "strf" if cur == "vids" =>
              require(len >= 40, s"strf too short ($len)")
              width = s32(b, off + 12)
              val hRaw = s32(b, off + 16)
              topDown = hRaw < 0
              height = math.abs(hRaw)
              require(u16(b, off + 20) == 1 && u16(b, off + 22) == 24,
                "only 24-bit single-plane supported")
              require(s32(b, off + 24) == 0, "only BI_RGB supported")
            case _ => ()
          }
          off += 8 + len + (len & 1)
        }
      }

      def parseHdrl(from: Int, end: Int): Unit = {
        var off = from
        while (off + 8 <= end) {
          val len = checkedLen(b, off, end)
          if (tag(b, off) == "LIST" && len >= 4 &&
            tag(b, off + 8) == "strl") parseStrl(off + 12, off + 8 + len)
          off += 8 + len + (len & 1)
        }
      }

      def parseMovi(from: Int, end: Int): Unit = {
        var off = from
        while (off + 8 <= end) {
          val len = checkedLen(b, off, end)
          val id = tag(b, off)
          if (id == "00db" || id == "00dc") {
            require(width > 0 && height > 0,
              "movi frame before stream headers")
            require(len >= bmpStride(width) * height,
              s"frame chunk len $len short of the raster")
            frames += readDib(b, off + 8, width, height, topDown)
          }
          off += 8 + len + (len & 1)
        }
      }

      var off = 12
      while (off + 8 <= b.length) {
        val len = checkedLen(b, off, b.length)
        if (tag(b, off) == "LIST" && len >= 4) {
          tag(b, off + 8) match {
            case "hdrl" => parseHdrl(off + 12, off + 8 + len)
            case "movi" => parseMovi(off + 12, off + 8 + len)
            case _ => ()
          }
        }
        off += 8 + len + (len & 1)
      }
      require(width > 0 && height > 0, "missing strf header")
      require(scale > 0 && rate > 0, "missing or zero strh timing")
      require(frames.nonEmpty, "no movi frames")
      DecodedVideo(width, height, rate / scale, frames.toArray)
    }
  }

  // ---------------------------------------------------------------
  // PNG (ISO/IEC 15948 / RFC 2083) — the first COMPRESSED format
  // behind the real-codec boundary. Every earlier codec (BMP, WAV,
  // AVI, the MP4 box walk) parses uncompressed byte layouts; PNG adds
  // the two machines a compressed format needs, both fully specified
  // and pure-JVM: DEFLATE (RFC 1950/1951, via the JDK's built-in zlib
  // binding java.util.zip — a public platform API, not a library
  // dependency) and PNG's per-scanline adaptive prediction filters
  // (None/Sub/Up/Average/Paeth). PNG is LOSSLESS, so the encode ->
  // real bytes -> decode round trip still hash-checks exactly against
  // the oracle's pattern arithmetic — unlike JPEG, whose lossy DCT
  // keeps it on the documented surrogate side of the boundary.
  //
  // The encoder deliberately cycles the filter type per row (y % 5)
  // and splits the compressed stream across multiple IDAT chunks, so
  // a decoder that implements only filter 0 or reads only the first
  // IDAT fails the round trip; the decoder verifies every chunk's
  // CRC-32 — PNG's real integrity contract — before trusting a byte.
  // Cross-implementation conformance (our bytes through the JDK's
  // ImageIO PNG reader and ImageIO's bytes through this decoder) is
  // proven in MultimodalSpec, so the codec is spec-compliant, not
  // merely self-consistent.
  // ---------------------------------------------------------------

  private val PngSig: Array[Byte] = Array(0x89.toByte, 0x50, 0x4e,
    0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Paeth predictor (PNG spec §6.6): the neighbor closest to the
    * linear estimate a + b - c, ties broken left, up, up-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Byte length of the filtered (pre-DEFLATE) scanline stream: one
    * filter-type byte + 3 x width per row. The "compressed beats
    * stored" checked column in mm_decode_png bounds the real file
    * against 57 + this (signature 8 + IHDR chunk 25 + one IDAT
    * chunk's 12-byte overhead + IEND chunk 12 + payload — what a
    * stored-IDAT PNG of the same raster would at least cost). */
  def pngRawLen(width: Int, height: Int): Int = {
    // bound each dimension FIRST (2^24 is far beyond any real PNG and
    // keeps the Long product below 2^50), then validate the product in
    // Long before the Int multiply — crafted dims near 2^31 would
    // otherwise wrap the Long expression itself and pass the check
    require(width > 0 && height > 0 &&
      width < (1 << 24) && height < (1 << 24),
      s"corrupt PNG dimensions ${width}x$height")
    val raw = height.toLong * (1L + width.toLong * 3)
    require(raw <= Int.MaxValue,
      s"filtered PNG stream for ${width}x$height exceeds Int range")
    raw.toInt
  }

  /** The Adam7 pass grid (PNG spec §8.2): (x0, y0, dx, dy) per pass.
    * Pass k holds the pixels at (x0 + i*dx, y0 + j*dy). */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Byte length of the filtered stream of an Adam7-INTERLACED PNG:
    * each non-empty pass is its own sub-image (one filter byte per
    * pass scanline); passes with zero width or height contribute
    * NOTHING, not even filter bytes (spec §8.2). Long-validated like
    * [[pngRawLen]]. */
  def pngRawLenAdam7(width: Int, height: Int): Int = {
    // same per-dimension bound as pngRawLen: with both dims < 2^24
    // every per-pass Long product stays below 2^50 — no silent wrap
    require(width > 0 && height > 0 &&
      width < (1 << 24) && height < (1 << 24),
      s"corrupt PNG dimensions ${width}x$height")
    var total = 0L
    var k = 0
    while (k < 7) {
      val (x0, y0, dx, dy) = Adam7(k)
      val pw = if (width > x0) ((width - x0 + dx - 1) / dx).toLong else 0L
      val ph = if (height > y0) ((height - y0 + dy - 1) / dy).toLong else 0L
      if (pw > 0 && ph > 0) total += ph * (1L + pw * 3)
      k += 1
    }
    require(total <= Int.MaxValue,
      s"interlaced filtered PNG stream for ${width}x$height " +
        "exceeds Int range")
    total.toInt
  }

  /** Encode a top-down RGB raster as a genuine 8-bit truecolor PNG:
    * per-row adaptive filtering that CYCLES all five spec filters
    * (row y uses type y % 5), real DEFLATE compression, and the
    * compressed stream split across IDAT chunks of <= 512 bytes (real
    * encoders emit many IDATs; readers must concatenate). Each chunk
    * carries its spec CRC-32 over type + data. */
  def pngEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"raster length ${rgb.length} != $width x $height x 3")
    val rowLen = width * 3
    val filtered = new Array[Byte](pngRawLen(width, height))
    var y = 0
    while (y < height) {
      val ft = y % 5
      val o = y * (1 + rowLen)
      filtered(o) = ft.toByte
      var x = 0
      while (x < rowLen) {
        val cur = rgb(y * rowLen + x) & 0xff
        val left = if (x >= 3) rgb(y * rowLen + x - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * rowLen + x) & 0xff else 0
        val ul =
          if (x >= 3 && y > 0) rgb((y - 1) * rowLen + x - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, ul)
        }
        filtered(o + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    pngWrap(width, height, 0, filtered)
  }

  /** DEFLATE the filtered stream and wrap it in signature + IHDR +
    * <=512-byte IDAT chunks + IEND with spec CRCs — shared by the
    * sequential and Adam7 encoders (only the IHDR interlace byte and
    * the filtered-stream layout differ). */
  private def pngWrap(width: Int, height: Int, interlace: Int,
      filtered: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_SPEED)
    defl.setInput(filtered)
    defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val idat = comp.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    def chunk(tp: String, data: Array[Byte], from: Int, len: Int): Unit = {
      val hdr = new Array[Byte](8)
      wbe32(hdr, 0, len)
      var i = 0
      while (i < 4) { hdr(4 + i) = tp.charAt(i).toByte; i += 1 }
      out.write(hdr, 0, 8)
      out.write(data, from, len)
      val crc = new java.util.zip.CRC32()
      crc.update(hdr, 4, 4)
      crc.update(data, from, len)
      val tail = new Array[Byte](4)
      wbe32(tail, 0, crc.getValue.toInt)
      out.write(tail, 0, 4)
    }
    val ihdr = new Array[Byte](13)
    wbe32(ihdr, 0, width); wbe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    // compression 0 (deflate), filter 0 (adaptive)
    ihdr(12) = interlace.toByte
    chunk("IHDR", ihdr, 0, 13)
    var off = 0
    while (off < idat.length) {
      val n = math.min(512, idat.length - off)
      chunk("IDAT", idat, off, n)
      off += n
    }
    chunk("IEND", Array.emptyByteArray, 0, 0)
    out.toByteArray
  }

  /** [[pngEncode]]'s Adam7 INTERLACED twin: the raster splits into
    * the seven pass sub-images (spec §8.2), each filtered
    * independently with the same cycling five-filter strategy (row j
    * of a pass uses type j % 5, filters referencing neighbors within
    * the pass), the concatenated pass streams DEFLATE as one zlib
    * stream, and the IHDR carries interlace method 1. Decodes through
    * [[PngDecoder]]'s deinterlace path and through foreign readers
    * (ImageIO conformance in MultimodalSpec). */
  def pngEncodeAdam7(width: Int, height: Int,
      rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"raster length ${rgb.length} != $width x $height x 3")
    val filtered = new Array[Byte](pngRawLenAdam7(width, height))
    var o = 0
    var k = 0
    while (k < 7) {
      val (x0, y0, dx, dy) = Adam7(k)
      val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
      val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        val rl = pw * 3
        val sub = new Array[Byte](ph * rl)
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            val src = ((y0 + j * dy) * width + (x0 + i * dx)) * 3
            val dst = (j * pw + i) * 3
            sub(dst) = rgb(src)
            sub(dst + 1) = rgb(src + 1)
            sub(dst + 2) = rgb(src + 2)
            i += 1
          }
          j += 1
        }
        j = 0
        while (j < ph) {
          val ft = j % 5
          filtered(o) = ft.toByte
          var x = 0
          while (x < rl) {
            val cur = sub(j * rl + x) & 0xff
            val left = if (x >= 3) sub(j * rl + x - 3) & 0xff else 0
            val up = if (j > 0) sub((j - 1) * rl + x) & 0xff else 0
            val ul =
              if (x >= 3 && j > 0) sub((j - 1) * rl + x - 3) & 0xff
              else 0
            val pred = ft match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) / 2
              case _ => paeth(left, up, ul)
            }
            filtered(o + 1 + x) = ((cur - pred) & 0xff).toByte
            x += 1
          }
          o += 1 + rl
          j += 1
        }
      }
      k += 1
    }
    pngWrap(width, height, 1, filtered)
  }

  /** The real decoder: verifies the 8-byte signature, walks the chunk
    * list validating LENGTH AND CRC-32 of every chunk (ancillary
    * chunks are skipped but still CRC-checked — corruption anywhere
    * in the file fails fast), concatenates the IDAT stream, inflates
    * it through the JDK's zlib, requires the inflated length to match
    * the IHDR dims exactly, and reverses the per-row adaptive filter
    * (all five spec types) into a top-down RGB raster. Adam7
    * interlaced files decode too: each non-empty pass unfilters as
    * its own sub-image and scatters onto the pass grid (spec §8.2) —
    * foreign progressive PNGs (e.g. ImageIO's) are conformance-
    * tested in MultimodalSpec. */
  final class PngDecoder extends ImageDecoder {
    def decode(b: Array[Byte]): DecodedImage = {
      require(b.length >= 8 + 25 + 12, "too short for a PNG")
      var i = 0
      while (i < 8) {
        require(b(i) == PngSig(i), "not a PNG"); i += 1
      }
      var off = 8
      var width = 0; var height = 0
      var interlaced = false
      var seenIhdr = false; var seenIend = false
      val idat = new java.io.ByteArrayOutputStream()
      while (off + 12 <= b.length && !seenIend) {
        val len = be32(b, off)
        val tp = new String(b, off + 4, 4, "US-ASCII")
        require(len >= 0 && off + 12 + len.toLong <= b.length,
          s"corrupt PNG chunk '$tp' len $len at offset $off")
        val crc = new java.util.zip.CRC32()
        crc.update(b, off + 4, 4 + len)
        require(crc.getValue.toInt == be32(b, off + 8 + len),
          s"bad CRC on PNG chunk '$tp' at offset $off")
        tp match {
          case "IHDR" =>
            require(!seenIhdr && len == 13, "bad IHDR")
            width = be32(b, off + 8); height = be32(b, off + 12)
            // bound BOTH the raster AND the filtered stream
            // (pngRawLen adds one filter byte per row, so crafted
            // dims can pass the raster bound yet overflow the
            // filtered length — validate in Long arithmetic)
            require(width > 0 && height > 0 &&
              width.toLong * height * 3 <= Int.MaxValue &&
              height.toLong * (1L + width.toLong * 3) <= Int.MaxValue,
              s"corrupt PNG dimensions ${width}x$height")
            require((b(off + 16) & 0xff) == 8, "only 8-bit depth")
            require((b(off + 17) & 0xff) == 2, "only truecolor RGB")
            require(b(off + 18) == 0 && b(off + 19) == 0,
              "only deflate / adaptive filtering")
            require((b(off + 20) & 0xff) <= 1,
              s"unknown interlace method ${b(off + 20) & 0xff}")
            interlaced = b(off + 20) == 1
            seenIhdr = true
          case "IDAT" =>
            require(seenIhdr, "IDAT before IHDR")
            idat.write(b, off + 8, len)
          case "IEND" =>
            require(len == 0, "non-empty IEND")
            seenIend = true
          case _ => () // ancillary chunk: skipped, CRC verified above
        }
        off += 12 + len
      }
      require(seenIhdr && seenIend, "missing IHDR or IEND")
      val rowLen = width * 3
      val raw = new Array[Byte](
        if (interlaced) pngRawLenAdam7(width, height)
        else pngRawLen(width, height))
      val infl = new java.util.zip.Inflater()
      infl.setInput(idat.toByteArray)
      var got = 0
      try {
        var n = 1
        while (got < raw.length && n != 0) {
          n = infl.inflate(raw, got, raw.length - got)
          got += n
        }
        require(got == raw.length,
          s"IDAT inflates to $got bytes, expected ${raw.length}")
        // the stream must END at the declared raster: a longer one
        // means the IHDR dims lie
        val probe = new Array[Byte](1)
        require(infl.finished() || infl.inflate(probe, 0, 1) == 0,
          "IDAT longer than the declared raster")
      } catch {
        case _: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(
            s"corrupt DEFLATE stream in IDAT at byte $got")
      } finally infl.end()
      // reverse the per-row adaptive filter over one (sub-)image's
      // scanlines — filters reference RECONSTRUCTED neighbors within
      // the SAME pass (spec §6.5; for interlaced images each pass is
      // filtered as an independent sub-image, §8.2)
      def unfilter(srcOff: Int, w: Int, h: Int): Array[Byte] = {
        val rl = w * 3
        val out = new Array[Byte](h * rl)
        var y = 0
        while (y < h) {
          val ro = srcOff + y * (1 + rl)
          val ft = raw(ro) & 0xff
          require(ft <= 4, s"unknown PNG filter type $ft on row $y")
          var x = 0
          while (x < rl) {
            val cur = raw(ro + 1 + x) & 0xff
            val left = if (x >= 3) out(y * rl + x - 3) & 0xff else 0
            val up = if (y > 0) out((y - 1) * rl + x) & 0xff else 0
            val ul =
              if (x >= 3 && y > 0) out((y - 1) * rl + x - 3) & 0xff
              else 0
            val pred = ft match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) / 2
              case _ => paeth(left, up, ul)
            }
            out(y * rl + x) = ((cur + pred) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        out
      }
      if (!interlaced) DecodedImage(width, height, unfilter(0, width, height))
      else {
        // Adam7: each non-empty pass unfilters as its own sub-image,
        // then scatters onto the final raster at (x0+i*dx, y0+j*dy)
        val rgb = new Array[Byte](height * rowLen)
        var srcOff = 0
        var k = 0
        while (k < 7) {
          val (x0, y0, dx, dy) = Adam7(k)
          val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
          val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
          if (pw > 0 && ph > 0) {
            val sub = unfilter(srcOff, pw, ph)
            srcOff += ph * (1 + pw * 3)
            var j = 0
            while (j < ph) {
              var i = 0
              while (i < pw) {
                val dst = ((y0 + j * dy) * width + (x0 + i * dx)) * 3
                val src = (j * pw + i) * 3
                rgb(dst) = sub(src)
                rgb(dst + 1) = sub(src + 1)
                rgb(dst + 2) = sub(src + 2)
                i += 1
              }
              j += 1
            }
          }
          k += 1
        }
        DecodedImage(width, height, rgb)
      }
    }
  }

  // ---------------------------------------------------------------
  // GIF87a — the SECOND compressed format, with a genuinely
  // different entropy coder: variable-width LZW (clear/EOI codes,
  // 9->12-bit code growth, LSB-first bit packing, 255-byte
  // sub-blocking), implemented here from the public GIF87a spec in
  // BOTH directions — no library involvement at all, unlike PNG
  // whose DEFLATE rides the JDK's zlib. GIF is palette-indexed:
  // the raster is an INDEX plane and color resolves through the
  // global color table, so losslessness means index-exact round
  // trips and the decoded RGB is palette[index] — all replayable
  // arithmetic. Cross-implementation conformance (our bytes through
  // ImageIO's GIF reader, ImageIO's GIF bytes through this decoder)
  // is proven in MultimodalSpec.
  // ---------------------------------------------------------------

  /** Magic-byte format detection — the DISPATCH rung every mixed
    * ingest needs. The reference trusts file extensions
    * (preprocess_dataset.py:10-31 filters on .mp4/.mov); content
    * sniffing is the robust form: the first bytes of every container
    * format are fixed by its spec (BMP 'BM', PNG signature, GIF
    * 'GIF8', RIFF fourcc + form type, ISO-BMFF 'ftyp' at offset 4),
    * so format resolves before any parser is chosen. Unknown bytes
    * tag as "unknown" rather than throwing — dispatch decides what
    * to do with them (quarantine, in the reference's error-channel
    * idiom). */
  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length < 2) "unknown"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' &&
      b(2) == 'F' && b(3) == '8') "gif"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) "jpeg"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' &&
      b(2) == 'F' && b(3) == 'F') {
      if (b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
        "wav"
      else if (b(8) == 'A' && b(9) == 'V' && b(10) == 'I' &&
        b(11) == ' ') "avi"
      else "unknown"
    } else if (b.length >= 12 && b(4) == 'f' && b(5) == 't' &&
      b(6) == 'y' && b(7) == 'p') "mp4"
    else if (b.length >= 4 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))) "tiff"
    else "unknown"
  }

  /** The fixed 256-entry palette both codec directions and the
    // oracle share: palette(i) = ((i*37)%256, (i*113)%256,
    // (i*211)%256) — multipliers coprime to 256 so all three
    // channels permute the byte range. */
  def gifPalette(i: Int): (Int, Int, Int) =
    ((i * 37) % 256, (i * 113) % 256, (i * 211) % 256)

  /** Encode an index raster (one byte per pixel, row-major top-down)
    * as a genuine GIF87a: header + logical screen descriptor +
    * 256-entry global color table ([[gifPalette]]) + image
    * descriptor + REAL variable-width LZW (initial code size 9,
    * clear 256, EOI 257, dictionary growth to 4096 then an emitted
    * clear — the actual GIF algorithm, not a stored shortcut) packed
    * LSB-first into 255-byte sub-blocks. */
  def gifEncode(width: Int, height: Int, indices: Array[Byte]): Array[Byte] =
    gifEncode(width, height, indices, interlaced = false)

  /** [[gifEncode]] with the GIF87a INTERLACE option: rows are stored
    * in the four-pass order (start 0 step 8, 4/8, 2/4, 1/2) and the
    * image descriptor carries the 0x40 flag — the progressive layout
    * legacy web encoders emit, which [[GifLzwDecoder]] already undoes
    * (spec'd against hand-built files since round 10). */
  def gifEncode(width: Int, height: Int, indices: Array[Byte],
      interlaced: Boolean): Array[Byte] = {
    require(width > 0 && height > 0 &&
      indices.length == width * height,
      s"index raster length ${indices.length} != $width x $height")
    val out = new java.io.ByteArrayOutputStream()
    out.write('G'); out.write('I'); out.write('F')
    out.write('8'); out.write('7'); out.write('a')
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(width); le16(height)
    out.write(0xf7) // global table, 8-bit color resolution, 256 entries
    out.write(0); out.write(0) // background index, aspect
    var i = 0
    while (i < 256) {
      val (r, g, b) = gifPalette(i)
      out.write(r); out.write(g); out.write(b)
      i += 1
    }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(width); le16(height)
    // no local table; bit 6 = interlaced row order
    out.write(if (interlaced) 0x40 else 0)
    out.write(8) // LZW minimum code size
    // interlace stores the rows in four-pass order; the LZW below is
    // layout-agnostic, so permute first
    val stored =
      if (!interlaced) indices
      else {
        val p = new Array[Byte](indices.length)
        var k = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
          var y = start
          while (y < height) {
            System.arraycopy(indices, y * width, p, k * width, width)
            k += 1; y += step
          }
        }
        p
      }

    // --- LZW compress (GIF variant) ---
    val Clear = 256
    val Eoi = 257
    val lzw = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeWidth = 9
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeWidth
      while (bitCnt >= 8) {
        lzw.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    // dictionary: (prefix code, next byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = 258
    def key(prefix: Int, b: Int): Integer = Integer.valueOf((prefix << 8) | b)
    put(Clear)
    var cur = stored(0) & 0xff
    i = 1
    while (i < stored.length) {
      val b = stored(i) & 0xff
      val k = key(cur, b)
      val hit = dict.get(k)
      if (hit != null) cur = hit.intValue()
      else {
        put(cur)
        dict.put(k, Integer.valueOf(next))
        next += 1
        // widen AFTER the first code that needs the new width exists
        if (next == (1 << codeWidth) + 1 && codeWidth < 12) codeWidth += 1
        if (next == 4096) { // table full: emit clear, reset
          put(Clear)
          dict = new java.util.HashMap[Integer, Integer]()
          next = 258
          codeWidth = 9
        }
        cur = b
      }
      i += 1
    }
    put(cur)
    put(Eoi)
    if (bitCnt > 0) lzw.write((bitBuf & 0xff).toInt)
    val comp = lzw.toByteArray
    var off = 0
    while (off < comp.length) {
      val n = math.min(255, comp.length - off)
      out.write(n)
      out.write(comp, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decoded palette image: the index plane AND the resolved RGB. */
  final case class DecodedGif(width: Int, height: Int,
      indices: Array[Byte], rgb: Array[Byte])

  trait GifDecoder extends Serializable {
    def decode(bytes: Array[Byte]): DecodedGif
  }

  /** The real decoder: validates the GIF87a/89a header, reads the
    * logical screen descriptor and global color table, walks to the
    * image descriptor (skipping 89a extension blocks sub-block by
    * sub-block), concatenates the LZW sub-blocks, and runs a genuine
    * variable-width LZW decode — string table with clear/EOI
    * handling, the KwKwK self-reference case, 9->12-bit growth —
    * undoes four-pass interlacing when the descriptor flags it, and
    * resolves indices through the PARSED color table (local table
    * overriding the global one when present). Every
    * length is validated before reading; corrupt bytes fail fast. */
  final class GifLzwDecoder extends GifDecoder {
    def decode(b: Array[Byte]): DecodedGif = {
      require(b.length >= 14 && b(0) == 'G' && b(1) == 'I' &&
        b(2) == 'F' && b(3) == '8' && (b(4) == '7' || b(4) == '9') &&
        b(5) == 'a', "not a GIF87a/89a")
      def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      val packed = b(10) & 0xff
      require((packed & 0x80) != 0, "missing global color table")
      val tableSize = 2 << (packed & 7)
      var off = 13
      require(off + tableSize * 3 <= b.length,
        s"color table of $tableSize entries overruns the buffer")
      val palette = new Array[Byte](tableSize * 3)
      System.arraycopy(b, off, palette, 0, tableSize * 3)
      off += tableSize * 3
      // walk to the image descriptor, skipping 89a extensions
      while (off < b.length && (b(off) & 0xff) == 0x21) {
        off += 2 // extension introducer + label
        var len = { require(off < b.length, "truncated extension"); b(off) & 0xff }
        while (len != 0) {
          off += 1 + len
          require(off < b.length, "truncated extension sub-blocks")
          len = b(off) & 0xff
        }
        off += 1
      }
      require(off + 10 <= b.length && (b(off) & 0xff) == 0x2c,
        "missing image descriptor")
      require(le16(off + 1) == 0 && le16(off + 3) == 0,
        "image offset inside the logical screen unsupported")
      val width = le16(off + 5)
      val height = le16(off + 7)
      require(width > 0 && height > 0 &&
        width.toLong * height * 3 <= Int.MaxValue,
        s"corrupt GIF dimensions ${width}x$height")
      val ipacked = b(off + 9) & 0xff
      val interlaced = (ipacked & 0x40) != 0
      off += 10
      var palTable = palette
      var palSize = tableSize
      if ((ipacked & 0x80) != 0) { // local color table overrides
        palSize = 2 << (ipacked & 7)
        require(off + palSize * 3 <= b.length,
          s"local color table of $palSize entries overruns the buffer")
        palTable = new Array[Byte](palSize * 3)
        System.arraycopy(b, off, palTable, 0, palSize * 3)
        off += palSize * 3
      }
      require(off < b.length, "missing LZW code size")
      val minCode = b(off) & 0xff
      require(minCode >= 2 && minCode <= 8, s"bad LZW code size $minCode")
      off += 1
      val data = new java.io.ByteArrayOutputStream()
      var len = { require(off < b.length, "truncated image data"); b(off) & 0xff }
      while (len != 0) {
        require(off + 1 + len <= b.length, "truncated LZW sub-block")
        data.write(b, off + 1, len)
        off += 1 + len
        require(off < b.length, "missing block terminator")
        len = b(off) & 0xff
      }
      val comp = data.toByteArray

      // --- LZW decompress (GIF variant) ---
      val clear = 1 << minCode
      val eoi = clear + 1
      val nPix = width * height
      val indices = new Array[Byte](nPix)
      var outPos = 0
      // string table as (prefix code, last byte); roots are implicit
      val prefix = new Array[Int](4096)
      val last = new Array[Byte](4096)
      val lenOf = new Array[Int](4096)
      var next = eoi + 1
      var codeWidth = minCode + 1
      var prev = -1
      var bitBuf = 0L
      var bitCnt = 0
      var pos = 0
      def emit(code: Int): Byte = { // write string for code, return first byte
        var c = code
        var n = lenOf(c)
        val end = outPos + n
        require(end <= nPix,
          s"LZW output overruns the ${width}x$height raster")
        var w = end - 1
        while (n > 1) {
          indices(w) = last(c)
          c = prefix(c); w -= 1; n -= 1
        }
        indices(w) = c.toByte // root
        outPos = end
        indices(w)
      }
      var c = 0
      while (c < clear) { lenOf(c) = 1; c += 1 }
      var done = false
      while (!done && outPos < nPix) {
        while (bitCnt < codeWidth && pos < comp.length) {
          bitBuf |= (comp(pos) & 0xffL) << bitCnt
          bitCnt += 8; pos += 1
        }
        require(bitCnt >= codeWidth, "truncated LZW stream")
        val code = (bitBuf & ((1L << codeWidth) - 1)).toInt
        bitBuf >>>= codeWidth
        bitCnt -= codeWidth
        if (code == clear) {
          next = eoi + 1; codeWidth = minCode + 1; prev = -1
        } else if (code == eoi) {
          done = true
        } else if (prev == -1) {
          require(code < clear, s"first code $code after clear not a root")
          emit(code)
          prev = code
        } else {
          require(code < next || (code == next && next < 4096),
            s"LZW code $code beyond table size $next")
          val first =
            if (code < next) emit(code)
            else { // KwKwK: string = prev's string + its own first byte
              val f = emit(prev)
              require(outPos < nPix,
                s"LZW output overruns the ${width}x$height raster")
              indices(outPos) = f; outPos += 1
              f
            }
          if (next < 4096) {
            prefix(next) = prev; last(next) = first
            lenOf(next) = lenOf(prev) + 1
            next += 1
            // the decoder's table is one entry BEHIND the encoder's,
            // so it widens at 2^w where the encoder widens at 2^w+1
            // (the classic GIF off-by-one)
            if (next == (1 << codeWidth) && codeWidth < 12)
              codeWidth += 1
          }
          prev = code
        }
      }
      require(outPos == nPix,
        s"LZW stream yields $outPos of $nPix pixels")
      if (!done) {
        // raster full without having seen EOI: the stream must END
        // here — more data codes mean the descriptor lied about dims
        while (bitCnt < codeWidth && pos < comp.length) {
          bitBuf |= (comp(pos) & 0xffL) << bitCnt
          bitCnt += 8; pos += 1
        }
        if (bitCnt >= codeWidth) {
          val code = (bitBuf & ((1L << codeWidth) - 1)).toInt
          require(code == eoi,
            s"LZW data continues past the ${width}x$height raster")
        }
      }
      // interlaced files store rows in the four-pass order (every 8th
      // from 0, every 8th from 4, every 4th from 2, every 2nd from
      // 1); permute stream rows back to display order
      val display =
        if (!interlaced) indices
        else {
          val out = new Array[Byte](nPix)
          var k = 0
          for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
            var y = start
            while (y < height) {
              System.arraycopy(indices, k * width, out, y * width, width)
              k += 1; y += step
            }
          }
          out
        }
      val rgb = new Array[Byte](nPix * 3)
      var p = 0
      while (p < nPix) {
        val idx = display(p) & 0xff
        require(idx < palSize, s"pixel index $idx outside the palette")
        rgb(p * 3) = palTable(idx * 3)
        rgb(p * 3 + 1) = palTable(idx * 3 + 1)
        rgb(p * 3 + 2) = palTable(idx * 3 + 2)
        p += 1
      }
      DecodedGif(width, height, display, rgb)
    }
  }

  // ---------------------------------------------------------------
  // TIFF (baseline TIFF 6.0) — the FOURTH container architecture in
  // the ladder: an offset-linked tag directory (IFD) instead of a
  // chunk walk (RIFF/PNG), a box tree (MP4), or a fixed header
  // (BMP/WAV). Both byte orders decode; little-endian is written.
  // Truecolor RGB 8/8/8 in strips, Compression 1 (none) or 32773
  // (PackBits — TIFF 6.0 §9, a real RLE entropy coder). The JDK's
  // ImageIO TIFF plugin is the cross-implementation reference.
  // ---------------------------------------------------------------

  /** PackBits-compress one row (TIFF 6.0 §9): control n in 0..127 =
    * n+1 literal bytes follow; control -1..-127 = the next byte
    * repeats 1-n times; -128 is a no-op. Greedy: repeat runs of >= 3
    * are encoded as runs, everything else accumulates literals.
    * Compressed rows never cross row boundaries (the spec's rule for
    * TIFF PackBits). */
  def packBits(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    val n = row.length
    while (i < n) {
      // measure the run at i
      var run = 1
      while (i + run < n && run < 128 && row(i + run) == row(i)) run += 1
      if (run >= 3) {
        out.write(1 - run) // -(run-1)
        out.write(row(i))
        i += run
      } else {
        // literal stretch: until the next >=3 run or 128 bytes
        val start = i
        i += run
        var lit = run
        while (i < n && lit < 128) {
          var r2 = 1
          while (i + r2 < n && r2 < 3 && row(i + r2) == row(i)) r2 += 1
          if (r2 >= 3) i = i // stop: a run starts here
          if (r2 >= 3) lit = 128 // break
          else {
            val take = math.min(r2, 128 - lit)
            i += take; lit += take
            if (take < r2) lit = 128
          }
        }
        val len = i - start
        out.write(len - 1)
        out.write(row, start, len)
      }
    }
    out.toByteArray
  }

  /** PackBits-decompress `src` into exactly `expected` bytes —
    * fail-fast on overrun, underrun, or a control byte past the
    * buffer (the external-bytes contract). -128 no-ops are
    * tolerated (the spec permits them). */
  def unpackBits(src: Array[Byte], from: Int, until: Int,
      expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var i = from
    var o = 0
    while (i < until && o < expected) {
      val c = src(i)
      i += 1
      if (c >= 0) {
        val len = c + 1
        require(i + len <= until && o + len <= expected,
          s"PackBits literal overrun at $i")
        System.arraycopy(src, i, out, o, len)
        i += len; o += len
      } else if (c != -128) {
        val len = 1 - c
        require(i < until && o + len <= expected,
          s"PackBits run overrun at $i")
        java.util.Arrays.fill(out, o, o + len, src(i))
        i += 1; o += len
      }
    }
    require(o == expected,
      s"PackBits stream yields $o bytes, expected $expected")
    out
  }

  /** TIFF LZW compress (TIFF 6.0 §13): MSB-first bit packing,
    * variable 9..12-bit codes, Clear=256/EOI=257, and the spec's
    * EARLY CHANGE — the code width bumps one code before the table
    * demands it (the de-facto interop behavior every TIFF
    * reader/writer shares; contrast the GIF pair above, which is
    * LSB-first without early change). One independent stream per
    * strip. */
  def lzwCompress(data: Array[Byte]): Array[Byte] = {
    require(data.nonEmpty, "empty LZW input")
    val Clear = 256; val Eoi = 257
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0; var codeWidth = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << codeWidth) | code
      bitCnt += codeWidth
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = 258
    def key(prefix: Int, b: Int): Integer =
      Integer.valueOf((prefix << 8) | b)
    put(Clear)
    var cur = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val b = data(i) & 0xff
      val k = key(cur, b)
      val hit = dict.get(k)
      if (hit != null) cur = hit.intValue()
      else {
        put(cur)
        dict.put(k, Integer.valueOf(next))
        next += 1
        // EARLY CHANGE: widen when entry (1<<w)-1 is added — one
        // code before the GIF encoder's (1<<w)+1 threshold
        if (next == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        if (next == 4094) { // spec: clear when entry 4094 would follow
          put(Clear)
          dict = new java.util.HashMap[Integer, Integer]()
          next = 258; codeWidth = 9
        }
        cur = b
      }
      i += 1
    }
    put(cur)
    put(Eoi)
    if (bitCnt > 0) // left-align the tail bits in the final byte
      out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** TIFF LZW decompress into exactly `expected` bytes — MSB-first,
    * early change (the decoder's table is one entry behind the
    * encoder's, so it widens at (1<<w)-1 where the encoder widens at
    * 1<<w), fail-fast on overrun/underrun/bad codes. A strip that
    * fills `expected` may end with or without the trailing EOI (both
    * appear in the wild), but further DATA codes fail. */
  def lzwDecompress(src: Array[Byte], from: Int, until: Int,
      expected: Int): Array[Byte] = {
    val Clear = 256; val Eoi = 257
    val outArr = new Array[Byte](expected)
    var outPos = 0
    val prefix = new Array[Int](4096)
    val last = new Array[Byte](4096)
    val lenOf = new Array[Int](4096)
    var c0 = 0
    while (c0 < 256) { lenOf(c0) = 1; c0 += 1 }
    var next = 258; var codeWidth = 9; var prev = -1
    var bitBuf = 0L; var bitCnt = 0; var pos = from
    def emit(code: Int): Byte = {
      var c = code
      var n = lenOf(c)
      val end = outPos + n
      require(end <= expected, "LZW output overruns the strip")
      var w = end - 1
      while (n > 1) {
        outArr(w) = last(c)
        c = prefix(c); w -= 1; n -= 1
      }
      outArr(w) = c.toByte
      outPos = end
      outArr(w)
    }
    var done = false
    while (!done && outPos < expected) {
      while (bitCnt < codeWidth && pos < until) {
        bitBuf = (bitBuf << 8) | (src(pos) & 0xffL)
        bitCnt += 8; pos += 1
      }
      require(bitCnt >= codeWidth, "truncated LZW stream")
      val code =
        ((bitBuf >>> (bitCnt - codeWidth)) & ((1 << codeWidth) - 1)).toInt
      bitCnt -= codeWidth
      if (code == Clear) { next = 258; codeWidth = 9; prev = -1 }
      else if (code == Eoi) done = true
      else if (prev == -1) {
        require(code < 256, s"first code $code after clear not a root")
        emit(code)
        prev = code
      } else {
        require(code < next || (code == next && next < 4096),
          s"LZW code $code beyond table size $next")
        val first =
          if (code < next) emit(code)
          else { // KwKwK
            val f = emit(prev)
            require(outPos < expected, "LZW output overruns the strip")
            outArr(outPos) = f; outPos += 1
            f
          }
        if (next < 4096) {
          prefix(next) = prev; last(next) = first
          lenOf(next) = lenOf(prev) + 1
          next += 1
          if (next == (1 << codeWidth) - 1 && codeWidth < 12)
            codeWidth += 1
        }
        prev = code
      }
    }
    require(outPos == expected,
      s"LZW strip yields $outPos of $expected bytes")
    if (!done) {
      // strip full without EOI: tolerate a clean end, reject more data
      while (bitCnt < codeWidth && pos < until) {
        bitBuf = (bitBuf << 8) | (src(pos) & 0xffL)
        bitCnt += 8; pos += 1
      }
      if (bitCnt >= codeWidth) {
        val code =
          ((bitBuf >>> (bitCnt - codeWidth)) & ((1 << codeWidth) - 1)).toInt
        require(code == Eoi, "LZW data continues past the strip")
      }
    }
    outArr
  }

  /** Rows per strip written by [[tiffEncode]] — small enough that
    * every in-repo raster exercises MULTIPLE strips. */
  val TiffRowsPerStrip = 4

  /** Encode a top-down RGB raster as a baseline little-endian TIFF:
    * 8-byte header -> strip data ([[TiffRowsPerStrip]] rows each,
    * optionally PackBits-compressed per row) -> BitsPerSample +
    * strip-table arrays -> one IFD with the ten baseline-RGB tags in
    * ascending order. */
  def tiffEncode(width: Int, height: Int, rgb: Array[Byte],
      packbits: Boolean): Array[Byte] =
    tiffEncodeComp(width, height, rgb, if (packbits) 32773 else 1)

  /** [[tiffEncode]] with LZW strips (compression 5) — each strip an
    * independent [[lzwCompress]] stream over its rows. With
    * `predictor2`, rows are horizontally differenced per channel
    * before compression and the file carries Predictor(317)=2
    * (TIFF 6.0 §14 — the combination foreign LZW TIFFs commonly
    * ship; smooth content compresses markedly better). */
  def tiffEncodeLzw(width: Int, height: Int, rgb: Array[Byte],
      predictor2: Boolean = false): Array[Byte] =
    tiffEncodeComp(width, height, rgb, 5, predictor2)

  private def tiffEncodeComp(width: Int, height: Int, rgb: Array[Byte],
      compression: Int, predictor2: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"raster length ${rgb.length} != $width x $height x 3")
    require(!predictor2 || compression == 5,
      "predictor 2 is only written with LZW strips")
    val rowLen = width * 3
    val src =
      if (!predictor2) rgb
      else {
        val d = rgb.clone()
        var y = 0
        while (y < height) {
          val base = y * rowLen
          var x = rowLen - 1
          while (x >= 3) {
            d(base + x) = (d(base + x) - rgb(base + x - 3)).toByte
            x -= 1
          }
          y += 1
        }
        d
      }
    val nStrips = (height + TiffRowsPerStrip - 1) / TiffRowsPerStrip
    val strips = (0 until nStrips).map { st =>
      val y0 = st * TiffRowsPerStrip
      val y1 = math.min(y0 + TiffRowsPerStrip, height)
      if (compression == 1)
        java.util.Arrays.copyOfRange(src, y0 * rowLen, y1 * rowLen)
      else if (compression == 5)
        lzwCompress(
          java.util.Arrays.copyOfRange(src, y0 * rowLen, y1 * rowLen))
      else {
        val bos = new java.io.ByteArrayOutputStream()
        var y = y0
        while (y < y1) {
          val row = java.util.Arrays.copyOfRange(rgb, y * rowLen,
            (y + 1) * rowLen)
          bos.write(packBits(row))
          y += 1
        }
        bos.toByteArray
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    // header: II, 42, IFD offset (filled after layout is known)
    val stripOff = new Array[Int](nStrips)
    var off = 8
    for (st <- 0 until nStrips) { stripOff(st) = off; off += strips(st).length }
    val bpsOff = off // 3 SHORTs
    off += 6
    val soOff = off // strip offsets array (if n > 1)
    if (nStrips > 1) off += 4 * nStrips
    val sbcOff = off // strip byte counts array (if n > 1)
    if (nStrips > 1) off += 4 * nStrips
    val ifdOff = off
    out.write('I'); out.write('I'); w16(42); w32(ifdOff)
    strips.foreach(s => out.write(s))
    w16(8); w16(8); w16(8) // BitsPerSample values
    if (nStrips > 1) {
      stripOff.foreach(w32)
      strips.foreach(s => w32(s.length))
    }
    // IFD: 10 entries, ascending tag order
    def entry(tag: Int, tpe: Int, count: Int, value: Int): Unit = {
      w16(tag); w16(tpe); w32(count)
      if (tpe == 3 && count == 1) { w16(value); w16(0) } // SHORT inline
      else w32(value)
    }
    w16(if (predictor2) 11 else 10)
    entry(256, 4, 1, width) // ImageWidth LONG
    entry(257, 4, 1, height) // ImageLength LONG
    entry(258, 3, 3, bpsOff) // BitsPerSample SHORT[3] at offset
    entry(259, 3, 1, compression) // Compression
    entry(262, 3, 1, 2) // Photometric: RGB
    entry(273, 4, nStrips, if (nStrips == 1) stripOff(0) else soOff)
    entry(277, 3, 1, 3) // SamplesPerPixel
    entry(278, 4, 1, TiffRowsPerStrip)
    entry(279, 4, nStrips,
      if (nStrips == 1) strips(0).length else sbcOff)
    entry(284, 3, 1, 1) // PlanarConfiguration: chunky
    if (predictor2) entry(317, 3, 1, 2) // Predictor: horizontal diff
    w32(0) // no next IFD
    out.toByteArray
  }

  /** The real decoder: validates the byte-order magic (both orders),
    * walks the IFD validating every entry offset, requires the
    * baseline-RGB shape (8/8/8, photometric 2, chunky, compression
    * none/PackBits/LZW, predictor none or horizontal differencing),
    * reads each strip through its offset/count
    * pair, and assembles the top-down RGB raster. Unknown tags are
    * skipped (ancillary metadata); anything outside the supported
    * shape fails fast with IllegalArgumentException. */
  final class TiffDecoder extends ImageDecoder {
    def decode(b: Array[Byte]): DecodedImage = {
      require(b.length >= 8, "too short for a TIFF")
      val le =
        if (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) true
        else if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)
          false
        else throw new IllegalArgumentException("not a TIFF")
      def u16(off: Int): Int = {
        require(off >= 0 && off + 2 <= b.length, s"u16 past buffer at $off")
        if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
        else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      }
      def u32(off: Int): Long = {
        require(off >= 0 && off + 4 <= b.length, s"u32 past buffer at $off")
        if (le) (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
          ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
        else ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
          ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
      }
      val ifd = u32(4)
      require(ifd >= 8 && ifd + 2 <= b.length, s"bad IFD offset $ifd")
      val nEntries = u16(ifd.toInt)
      require(ifd + 2 + nEntries * 12L + 4 <= b.length,
        s"IFD of $nEntries entries past buffer")
      // one integral value from an entry (SHORT or LONG, count 1)
      def scalar(off: Int, tpe: Int): Long = tpe match {
        case 3 => u16(off)
        case 4 => u32(off)
        case t =>
          throw new IllegalArgumentException(s"unsupported tag type $t")
      }
      // a vector of count integral values (inline when they fit)
      def vector(entryOff: Int, tpe: Int, count: Int): Array[Long] = {
        val size = (if (tpe == 3) 2 else 4) * count
        val base =
          if (size <= 4) entryOff + 8 else u32(entryOff + 8).toInt
        Array.tabulate(count)(i =>
          scalar(base + i * (if (tpe == 3) 2 else 4), tpe))
      }
      var width = 0L; var height = 0L
      var compression = 1L; var photometric = -1L
      var spp = 1L; var rps = Long.MaxValue; var planar = 1L
      var predictor = 1L
      var bps: Array[Long] = Array(1L)
      var stripOffs: Array[Long] = null
      var stripLens: Array[Long] = null
      var i = 0
      while (i < nEntries) {
        val e = (ifd + 2 + i * 12).toInt
        val tag = u16(e); val tpe = u16(e + 2)
        val count = u32(e + 4)
        require(count >= 0 && count <= Int.MaxValue, s"bad count $count")
        tag match {
          case 256 => width = scalar(e + 8, tpe)
          case 257 => height = scalar(e + 8, tpe)
          case 258 => bps = vector(e, tpe, count.toInt)
          case 259 => compression = scalar(e + 8, tpe)
          case 262 => photometric = scalar(e + 8, tpe)
          case 273 => stripOffs = vector(e, tpe, count.toInt)
          case 277 => spp = scalar(e + 8, tpe)
          case 278 => rps = scalar(e + 8, tpe)
          case 279 => stripLens = vector(e, tpe, count.toInt)
          case 284 => planar = scalar(e + 8, tpe)
          case 317 => predictor = scalar(e + 8, tpe)
          case _ => () // ancillary tag: skipped
        }
        i += 1
      }
      // bound each u32-range dimension BEFORE forming the product:
      // width and height can each be up to 2^32-1 here, so the naive
      // width*height*3 Long product could wrap past 2^63 and pass the
      // check; with both < 2^24 the product is below 2^50
      require(width > 0 && height > 0 &&
        width < (1L << 24) && height < (1L << 24) &&
        width * height * 3 <= Int.MaxValue,
        s"corrupt TIFF dimensions ${width}x$height")
      require(photometric == 2, s"only RGB photometric (got $photometric)")
      require(spp == 3, s"only 3 samples/pixel (got $spp)")
      require(bps.length == 3 && bps.forall(_ == 8),
        s"only 8/8/8 bits (got ${bps.mkString(",")})")
      require(planar == 1, "only chunky planar configuration")
      require(compression == 1 || compression == 32773 ||
        compression == 5,
        s"only none/PackBits/LZW compression (got $compression)")
      require(predictor == 1 || predictor == 2,
        s"only none/horizontal predictor (got $predictor)")
      require(stripOffs != null && stripLens != null &&
        stripOffs.length == stripLens.length, "missing strip tables")
      require(rps > 0, "bad RowsPerStrip")
      val w = width.toInt; val h = height.toInt
      val rowLen = w * 3
      val rpsEff = math.min(rps, height)
      val expStrips = ((height + rpsEff - 1) / rpsEff).toInt
      require(stripOffs.length == expStrips,
        s"${stripOffs.length} strips, expected $expStrips")
      val rgb = new Array[Byte](h * rowLen)
      var st = 0
      var y0 = 0
      while (st < stripOffs.length) {
        val rows = math.min(rps, (h - y0).toLong).toInt
        val expected = rows * rowLen
        val so = stripOffs(st); val sl = stripLens(st)
        require(so >= 0 && sl >= 0 && so + sl <= b.length,
          s"strip $st ($so+$sl) past buffer")
        if (compression == 1) {
          require(sl == expected,
            s"strip $st holds $sl bytes, expected $expected")
          System.arraycopy(b, so.toInt, rgb, y0 * rowLen, expected)
        } else if (compression == 5) {
          val u = lzwDecompress(b, so.toInt, (so + sl).toInt, expected)
          System.arraycopy(u, 0, rgb, y0 * rowLen, expected)
        } else {
          val u = unpackBits(b, so.toInt, (so + sl).toInt, expected)
          System.arraycopy(u, 0, rgb, y0 * rowLen, expected)
        }
        y0 += rows
        st += 1
      }
      require(y0 == h, s"strips cover $y0 rows of $h")
      if (predictor == 2) {
        // horizontal differencing (TIFF 6.0 §14): per row, each
        // sample stores the delta to the previous pixel's sample
        var y = 0
        while (y < h) {
          val base = y * rowLen
          var x = 3
          while (x < rowLen) {
            rgb(base + x) = (rgb(base + x) + rgb(base + x - 3)).toByte
            x += 1
          }
          y += 1
        }
      }
      DecodedImage(w, h, rgb)
    }
  }
}
