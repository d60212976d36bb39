package graft.multimodal

/** Baseline JPEG (ITU-T T.81, sequential DCT, 8-bit, Huffman) — the
  * THIRD compressed format behind the real-codec boundary, and the
  * last feasible rung of the codec ladder: the entropy coder
  * (canonical Huffman per T.81 Annex C/F) and the integer DCT pair
  * are implemented here from the public spec with no library
  * involvement at all (PNG rides the JDK's zlib; GIF's LZW and this
  * are all ours). This is the payload format real video pipelines
  * actually hit — the reference's cv2 frame-decode loop
  * (raw_to_samples.py:173-196) reads JPEG-family codecs in practice,
  * and M-JPEG AVI ([[Jpeg.aviEncodeMjpeg]] / [[Jpeg.MjpegAviDecoder]])
  * puts these scans inside the engine's existing RIFF chunk walk.
  *
  * JPEG is LOSSY, so the oracle convention differs from PNG/GIF: the
  * catalog op's rasters are CONSTANT per 8x8 block with even sample
  * values, for which the whole transform chain is exactly invertible
  * — FDCT of a constant block is DC-only with coefficient
  * 8*(v-128); the Annex K.1 luminance quantizer for DC is 16, so
  * even v quantizes without remainder; and the fixed-point IDCT maps
  * a DC-only block with dc = 8k back to the constant k+128 exactly
  * (proven exhaustively for every k in [-128,127] in
  * MultimodalJpegSpec). Decoded sums are therefore replayable
  * closed-form arithmetic, per the ORACLES.md estimator convention;
  * general (non-constant) content is covered by tolerance round-trip
  * and cross-implementation conformance specs instead of the oracle.
  *
  * Both DCTs are one shared fixed-point kernel: T(u,x) =
  * round(2^15 * C(u)/2 * cos((2x+1)u*pi/16)) (T.81 A.3.3's basis,
  * scaled), applied separably with 64-bit accumulation and a single
  * final rounding descale by 2^30 — no intermediate rounding, so the
  * exactness analysis in the scaladoc above holds bit-for-bit.
  */
object Jpeg {

  // ----------------------------------------------------------------
  // Spec tables (ITU-T T.81 Annex K — example tables, the de-facto
  // interchange standard emitted by libjpeg and ImageIO alike).
  // ----------------------------------------------------------------

  /** Natural index of zigzag position k (T.81 Figure 5). */
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** K.1 luminance quantization table, natural (row-major) order.
    * The DC quantizer 16 is what makes even constant blocks exact. */
  val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** K.2 chrominance quantization table, natural order. */
  val QChr: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // K.3: BITS (codes per length 1..16) + HUFFVAL for the four
  // standard tables.
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)
  private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  // ----------------------------------------------------------------
  // Fixed-point DCT kernel, shared by FDCT and IDCT.
  // ----------------------------------------------------------------

  /** T(u*8+x) = round(2^15 * C(u)/2 * cos((2x+1)u*pi/16)), the T.81
    * A.3.3 basis scaled to 15 fractional bits (worst-case pass-2
    * accumulation stays under 2^53, well inside Long). StrictMath
    * keeps the table construction platform-deterministic. */
  private val Kern: Array[Int] = {
    val t = new Array[Int](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = StrictMath.round(32768.0 * cu / 2.0 *
          StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)).toInt
        x += 1
      }
      u += 1
    }
    t
  }

  /** Inverse DCT of one dequantized block (T.81 natural order: row
    * index = VERTICAL frequency v, column index = horizontal
    * frequency u) into 0..255 samples: out(x,y) =
    * clamp(round(sum_v sum_u T(v,y) T(u,x) S(v*8+u) / 2^30) + 128).
    * Both separable passes accumulate in Long with ONE final
    * rounding, so DC-only blocks with dc = 8k decode to exactly
    * k+128 (|error| <= k*(2^30 - 11585^2*8)/2^30 < 0.006). */
  private[graft] def idctBlock(coef: Array[Int],
      out: Array[Int]): Unit = {
    // pass 1 (columns): m(u, y) = sum_v T(v, y) * S(v*8 + u)
    val m = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0L
        var v = 0
        while (v < 8) { acc += Kern(v * 8 + y).toLong * coef(v * 8 + u); v += 1 }
        m(u * 8 + y) = acc
        y += 1
      }
      u += 1
    }
    // pass 2 (rows): s(x, y) = sum_u T(u, x) * m(u, y)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0L
        var uu = 0
        while (uu < 8) { acc += Kern(uu * 8 + x) * m(uu * 8 + y); uu += 1 }
        val s = (((acc + (1L << 29)) >> 30) + 128).toInt
        out(y * 8 + x) = if (s < 0) 0 else if (s > 255) 255 else s
        y += 1
      }
      x += 1
    }
  }

  /** Forward DCT of one level-shifted block (natural order, values in
    * [-128,127]): S(v*8+u) = round(sum_y T(v,y) sum_x T(u,x)
    * s'(y*8+x) / 2^30) — row index vertical frequency, matching
    * [[idctBlock]] and the interchange convention. Constant blocks
    * yield an exactly DC-only spectrum (|quantization-relevant AC
    * leakage| < 0.1, rounds to 0). */
  private def fdctBlock(px: Array[Int], out: Array[Int]): Unit = {
    // pass 1 (columns): m(v, x) = sum_y T(v, y) * s'(y*8 + x)
    val m = new Array[Long](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L
        var y = 0
        while (y < 8) { acc += Kern(v * 8 + y).toLong * px(y * 8 + x); y += 1 }
        m(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    // pass 2 (rows): S(v*8 + u) = sum_x T(u, x) * m(v, x)
    var vv = 0
    while (vv < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0L
        var x = 0
        while (x < 8) { acc += Kern(u * 8 + x) * m(vv * 8 + x); x += 1 }
        out(vv * 8 + u) = ((acc + (1L << 29)) >> 30).toInt
        u += 1
      }
      vv += 1
    }
  }

  // ----------------------------------------------------------------
  // Canonical Huffman code generation (T.81 Annex C) — shared by the
  // encoder (symbol -> code) and the decoder (MINCODE/MAXCODE/VALPTR).
  // ----------------------------------------------------------------

  /** Encoder-side table: code word + length per symbol value. */
  private final class HuffEnc(bits: Array[Int], vals: Array[Byte]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          codeOf(vals(k) & 0xff) = code
          lenOf(vals(k) & 0xff) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Decoder-side table per T.81 F.2.2.3: walk code lengths with
    * MINCODE/MAXCODE/VALPTR. Rejects over-subscribed BITS. */
  private final class HuffDec(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val huffVal = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        require(bits(l - 1) >= 0 && bits(l - 1) <= 255, "bad DHT BITS")
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        require(code <= (1 << l), s"over-subscribed Huffman BITS at length $l")
        code <<= 1
        l += 1
      }
      require(k == vals.length, "DHT BITS sum != HUFFVAL count")
    }
  }

  // ----------------------------------------------------------------
  // Bit IO over the entropy-coded segment.
  // ----------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0) // byte stuffing (B.1.1.5)
          buf = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final byte with 1-bits (B.1.1.5). */
    def flush(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  /** MSB-first bit reader with 0xFF00 unstuffing. Any marker inside
    * the entropy data, or running off the end, fails fast — the
    * external-bytes contract (IllegalArgumentException only). */
  private final class BitReader(b: Array[Byte], var pos: Int, end: Int) {
    private var buf = 0
    private var n = 0
    def nextBit(): Int = {
      if (n == 0) {
        require(pos < end, "truncated JPEG entropy data")
        var byte = b(pos) & 0xff
        pos += 1
        if (byte == 0xff) {
          require(pos < end, "truncated JPEG entropy data")
          val m = b(pos) & 0xff
          require(m == 0, f"marker 0xff$m%02x inside entropy data")
          pos += 1
        }
        buf = byte; n = 8
      }
      n -= 1
      (buf >> n) & 1
    }
    def receive(t: Int): Int = {
      var v = 0
      var i = 0
      while (i < t) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def align(): Unit = n = 0
  }

  /** EXTEND (T.81 F.2.2.1): map the t received magnitude bits to the
    * signed coefficient value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def bitLength(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  // ----------------------------------------------------------------
  // Encoder.
  // ----------------------------------------------------------------

  /** Byte length of everything OUTSIDE the entropy-coded segment in
    * [[encodeGray]]'s output (SOI 2 + APP0 18 + DQT 69 + SOF0 13 +
    * DHT 33+183 + SOS 10 + EOI 2) — the `compressed` checked column
    * bounds the real file against this + the raw 8-bpp plane. */
  val GrayHeaderLen: Int = 330

  private def wbe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }

  private def marker(out: java.io.ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xff); out.write(m)
  }

  private def writeDqt(out: java.io.ByteArrayOutputStream, id: Int,
      qNat: Array[Int]): Unit = {
    marker(out, 0xdb); wbe16(out, 67); out.write(id) // Pq=0 (8-bit), Tq=id
    var k = 0
    while (k < 64) { out.write(qNat(Zigzag(k))); k += 1 }
  }

  private def writeDht(out: java.io.ByteArrayOutputStream, clazz: Int,
      id: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
    marker(out, 0xc4); wbe16(out, 2 + 17 + vals.length)
    out.write((clazz << 4) | id)
    var l = 0
    while (l < 16) { out.write(bits(l)); l += 1 }
    out.write(vals, 0, vals.length)
  }

  /** FDCT + quantize one block; returns the 64 quantized coefficients
    * in ZIGZAG order. `plane` is the padded component plane. */
  private def quantBlock(plane: Array[Int], pw: Int, x0: Int, y0: Int,
      qNat: Array[Int], zz: Array[Int]): Unit = {
    val px = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        px(y * 8 + x) = plane((y0 + y) * pw + (x0 + x)) - 128
        x += 1
      }
      y += 1
    }
    val s = new Array[Int](64)
    fdctBlock(px, s)
    var k = 0
    while (k < 64) {
      val nat = Zigzag(k)
      val q = qNat(nat)
      val c = s(nat)
      // round half away from zero, deterministic integer arithmetic
      zz(k) = if (c >= 0) (c + q / 2) / q else -((-c + q / 2) / q)
      k += 1
    }
  }

  /** Huffman-encode one zigzag block (F.1.2): DC difference category
    * + magnitude bits, AC run/size symbols with ZRL and EOB. Returns
    * the new DC predictor. */
  private def encodeBlock(bw: BitWriter, zz: Array[Int], pred: Int,
      dc: HuffEnc, ac: HuffEnc): Int = {
    val diff = zz(0) - pred
    val cat = bitLength(math.abs(diff))
    bw.put(dc.codeOf(cat), dc.lenOf(cat))
    if (cat > 0)
      bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = zz(k)
      if (v == 0) run += 1
      else {
        while (run >= 16) { bw.put(ac.codeOf(0xf0), ac.lenOf(0xf0)); run -= 16 }
        val s = bitLength(math.abs(v))
        val sym = (run << 4) | s
        bw.put(ac.codeOf(sym), ac.lenOf(sym))
        bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(ac.codeOf(0x00), ac.lenOf(0x00)) // EOB
    zz(0)
  }

  /** Pad a sample plane to multiples of 8 by edge replication (the
    * standard encoder treatment of partial boundary blocks). */
  private def padPlane(w: Int, h: Int, get: (Int, Int) => Int): (Array[Int], Int, Int) = {
    val pw = (w + 7) / 8 * 8
    val ph = (h + 7) / 8 * 8
    val p = new Array[Int](pw * ph)
    var y = 0
    while (y < ph) {
      val sy = if (y < h) y else h - 1
      var x = 0
      while (x < pw) {
        p(y * pw + x) = get(if (x < w) x else w - 1, sy)
        x += 1
      }
      y += 1
    }
    (p, pw, ph)
  }

  private val DcLumEnc = new HuffEnc(DcLumBits, DcLumVals)
  private val AcLumEnc = new HuffEnc(AcLumBits, AcLumVals)
  private val DcChrEnc = new HuffEnc(DcChrBits, DcChrVals)
  private val AcChrEnc = new HuffEnc(AcChrBits, AcChrVals)

  /** Encode an 8-bit grayscale plane (row-major, w*h bytes) as a
    * baseline JFIF JPEG: SOI, APP0, K.1 luminance DQT, SOF0 (one
    * component, 1x1 sampling), the two K.3 luminance DHTs, a single
    * interleaved SOS, byte-stuffed entropy data, EOI. */
  def encodeGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] =
    encodeGray(width, height, gray, 0)

  /** [[encodeGray]] with a DRI restart interval: every `restart` MCUs
    * the entropy stream byte-aligns, emits the cycling RST0-7 marker,
    * and resets the DC predictor (T.81 B.2.4.4/E.1.4) — the
    * resilience feature real camera JPEGs carry; 0 = none. */
  def encodeGray(width: Int, height: Int, gray: Array[Byte],
      restart: Int): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"plane length ${gray.length} != $width x $height")
    require(restart >= 0 && restart <= 65535, s"bad DRI $restart")
    val (plane, pw, ph) = padPlane(width, height,
      (x, y) => gray(y * width + x) & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8) // SOI
    // APP0 JFIF v1.1, no density, no thumbnail
    marker(out, 0xe0); wbe16(out, 16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    wbe16(out, 1); wbe16(out, 1); out.write(0); out.write(0)
    writeDqt(out, 0, QLum)
    marker(out, 0xc0); wbe16(out, 11) // SOF0, 1 component
    out.write(8); wbe16(out, height); wbe16(out, width); out.write(1)
    out.write(1); out.write(0x11); out.write(0) // id 1, H=V=1, Tq 0
    writeDht(out, 0, 0, DcLumBits, DcLumVals)
    writeDht(out, 1, 0, AcLumBits, AcLumVals)
    if (restart > 0) { marker(out, 0xdd); wbe16(out, 4); wbe16(out, restart) }
    marker(out, 0xda); wbe16(out, 8) // SOS
    out.write(1); out.write(1); out.write(0x00) // comp 1 uses Td=Ta=0
    out.write(0); out.write(63); out.write(0)   // Ss, Se, AhAl
    var bw = new BitWriter(out)
    val zz = new Array[Int](64)
    var pred = 0
    val totalMcus = (ph / 8) * (pw / 8)
    var mcu = 0
    var rstN = 0
    while (mcu < totalMcus) {
      val bx = mcu % (pw / 8)
      val by = mcu / (pw / 8)
      quantBlock(plane, pw, bx * 8, by * 8, QLum, zz)
      pred = encodeBlock(bw, zz, pred, DcLumEnc, AcLumEnc)
      mcu += 1
      if (restart > 0 && mcu % restart == 0 && mcu < totalMcus) {
        bw.flush() // byte-align before the marker
        marker(out, 0xd0 + rstN)
        rstN = (rstN + 1) % 8
        pred = 0
        bw = new BitWriter(out)
      }
    }
    bw.flush()
    marker(out, 0xd9) // EOI
    out.toByteArray
  }

  /** Encode an 8-bit grayscale plane as a PROGRESSIVE JPEG (SOF2,
    * T.81 Annex G.2) with the simplest legal spectral-selection
    * progression: scan 1 carries the complete DC band ([0,0], Ah=Al=0)
    * and scan 2 the complete AC band ([1,63], Ah=Al=0) — no
    * successive approximation, every EOB an EOB0. The quantized
    * coefficients are IDENTICAL to [[encodeGray]]'s (same DQT, same
    * FDCT, same half-away quantizer), so decoding the progressive
    * stream must reproduce the baseline decode bit-for-bit — the
    * cross-mode equivalence theorem MultimodalJpegSpec pins, and the
    * reason the invertible-class oracle carries over unchanged. */
  def encodeGrayProgressive(width: Int, height: Int,
      gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"plane length ${gray.length} != $width x $height")
    val (plane, pw, ph) = padPlane(width, height,
      (x, y) => gray(y * width + x) & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8) // SOI
    marker(out, 0xe0); wbe16(out, 16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    wbe16(out, 1); wbe16(out, 1); out.write(0); out.write(0)
    writeDqt(out, 0, QLum)
    marker(out, 0xc2); wbe16(out, 11) // SOF2, 1 component
    out.write(8); wbe16(out, height); wbe16(out, width); out.write(1)
    out.write(1); out.write(0x11); out.write(0) // id 1, H=V=1, Tq 0
    writeDht(out, 0, 0, DcLumBits, DcLumVals)
    writeDht(out, 1, 0, AcLumBits, AcLumVals)
    // quantize every block once; both scans read the same coefficients
    val nbx = pw / 8; val nby = ph / 8
    val blocks = Array.ofDim[Int](nbx * nby, 64)
    var bi = 0
    while (bi < nbx * nby) {
      quantBlock(plane, pw, (bi % nbx) * 8, (bi / nbx) * 8, QLum,
        blocks(bi))
      bi += 1
    }
    // scan 1: DC band (diff category + magnitude bits, as baseline)
    marker(out, 0xda); wbe16(out, 8)
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(0); out.write(0) // Ss=0, Se=0, AhAl=0
    var bw = new BitWriter(out)
    var pred = 0
    bi = 0
    while (bi < nbx * nby) {
      val diff = blocks(bi)(0) - pred
      pred = blocks(bi)(0)
      val cat = bitLength(math.abs(diff))
      bw.put(DcLumEnc.codeOf(cat), DcLumEnc.lenOf(cat))
      if (cat > 0)
        bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
      bi += 1
    }
    bw.flush()
    // scan 2: AC band [1,63] (run/size + ZRL, EOB0 per early-ending
    // block — a legal EOB run of exactly one)
    marker(out, 0xda); wbe16(out, 8)
    out.write(1); out.write(1); out.write(0x00)
    out.write(1); out.write(63); out.write(0) // Ss=1, Se=63, AhAl=0
    bw = new BitWriter(out)
    bi = 0
    while (bi < nbx * nby) {
      val zz = blocks(bi)
      var run = 0
      var k = 1
      while (k < 64) {
        val v = zz(k)
        if (v == 0) run += 1
        else {
          while (run >= 16) {
            bw.put(AcLumEnc.codeOf(0xf0), AcLumEnc.lenOf(0xf0))
            run -= 16
          }
          val s = bitLength(math.abs(v))
          val sym = (run << 4) | s
          bw.put(AcLumEnc.codeOf(sym), AcLumEnc.lenOf(sym))
          bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(AcLumEnc.codeOf(0x00), AcLumEnc.lenOf(0x00))
      bi += 1
    }
    bw.flush()
    marker(out, 0xd9) // EOI
    out.toByteArray
  }

  /** The 32 symbols an AC SUCCESSIVE-APPROXIMATION refinement scan
    * can emit (G.1.2.3): EOBn for n=0..14, ZRL, and (r,1) for
    * r=0..15 — the stock Annex K AC table lacks the EOBn codes, so
    * SA scans carry their own canonical table (31 codes at 5 bits +
    * one at 6; Kraft 63/64, the all-ones code stays reserved per
    * C.2). */
  private val AcRefBits = Array(0, 0, 0, 0, 31, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcRefVals: Array[Byte] = {
    val b = new Array[Byte](32)
    var i = 0
    while (i < 15) { b(i) = (i << 4).toByte; i += 1 } // EOBn
    b(15) = 0xf0.toByte                               // ZRL
    var r = 0
    while (r < 16) { b(16 + r) = ((r << 4) | 1).toByte; r += 1 }
    b
  }
  private val AcRefEnc = new HuffEnc(AcRefBits, AcRefVals)

  /** Encode an 8-bit grayscale plane as a SIX-SCAN progressive JPEG
    * with spectral selection AND successive approximation (T.81
    * G.1.2): DC first at Al=1, AC first scans for the [1,5] and
    * [6,63] bands at Al=1, then the DC refinement bit and the two AC
    * refinement scans at Ah=1/Al=0 — real EOB runs (dedicated
    * refinement Huffman table carrying the EOBn codes the stock
    * Annex K table lacks), correction bits interleaved exactly as
    * G.1.2.3's advance walk reads them, and +-1 insertions over
    * zero-history positions. The point transform loses nothing by
    * the time the progression completes (DC: arithmetic shift +
    * correction bit; AC: truncate-toward-zero halving + correction
    * bit for |c| >= 2, +-1 insertion for |c| == 1), so the final
    * coefficients equal [[encodeGray]]'s exactly and the decode is
    * byte-identical to baseline — the same cross-mode equivalence
    * theorem [[encodeGrayProgressive]] pins, now through the
    * refinement paths. */
  def encodeGrayProgressiveSA(width: Int, height: Int,
      gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"plane length ${gray.length} != $width x $height")
    val (plane, pw, ph) = padPlane(width, height,
      (x, y) => gray(y * width + x) & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8) // SOI
    marker(out, 0xe0); wbe16(out, 16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    wbe16(out, 1); wbe16(out, 1); out.write(0); out.write(0)
    writeDqt(out, 0, QLum)
    marker(out, 0xc2); wbe16(out, 11) // SOF2, 1 component
    out.write(8); wbe16(out, height); wbe16(out, width); out.write(1)
    out.write(1); out.write(0x11); out.write(0) // id 1, H=V=1, Tq 0
    writeDht(out, 0, 0, DcLumBits, DcLumVals)
    writeDht(out, 1, 0, AcLumBits, AcLumVals)
    writeDht(out, 1, 1, AcRefBits, AcRefVals)
    val nbx = pw / 8; val nby = ph / 8
    val blocks = Array.ofDim[Int](nbx * nby, 64)
    var bi = 0
    while (bi < nbx * nby) {
      quantBlock(plane, pw, (bi % nbx) * 8, (bi / nbx) * 8, QLum,
        blocks(bi))
      bi += 1
    }
    def sos(ta: Int, ss: Int, se: Int, ahAl: Int): BitWriter = {
      marker(out, 0xda); wbe16(out, 8)
      out.write(1); out.write(1); out.write(ta)
      out.write(ss); out.write(se); out.write(ahAl)
      new BitWriter(out)
    }
    // AC point transform truncates toward ZERO (G.1.2.1 — unlike
    // DC's arithmetic shift), preserving sign and |t| = |c| >> Al
    def pt(v: Int): Int = if (v < 0) -((-v) >> 1) else v >> 1

    // scan 1: DC first, Al=1 — diff coding over the SHIFTED values
    var bw = sos(0, 0, 0, 0x01)
    var pred = 0
    bi = 0
    while (bi < nbx * nby) {
      val t = blocks(bi)(0) >> 1 // arithmetic shift (G.1.2.1, DC)
      val diff = t - pred
      pred = t
      val cat = bitLength(math.abs(diff))
      bw.put(DcLumEnc.codeOf(cat), DcLumEnc.lenOf(cat))
      if (cat > 0)
        bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
      bi += 1
    }
    bw.flush()
    // scans 2-3: AC first for each band at Al=1 (stock table,
    // EOB0 per early-ending block)
    for ((ss, se) <- Seq((1, 5), (6, 63))) {
      bw = sos(0, ss, se, 0x01)
      bi = 0
      while (bi < nbx * nby) {
        val zz = blocks(bi)
        var run = 0
        var k = ss
        while (k <= se) {
          val t = pt(zz(k))
          if (t == 0) run += 1
          else {
            while (run >= 16) {
              bw.put(AcLumEnc.codeOf(0xf0), AcLumEnc.lenOf(0xf0))
              run -= 16
            }
            val s = bitLength(math.abs(t))
            val sym = (run << 4) | s
            bw.put(AcLumEnc.codeOf(sym), AcLumEnc.lenOf(sym))
            bw.put(if (t < 0) t + (1 << s) - 1 else t, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(AcLumEnc.codeOf(0x00), AcLumEnc.lenOf(0x00))
        bi += 1
      }
      bw.flush()
    }
    // scan 4: DC refinement — one raw bit per block (two's-complement
    // bit 0; (c >> 1) << 1 | (c & 1) == c for either sign)
    bw = sos(0, 0, 0, 0x10)
    bi = 0
    while (bi < nbx * nby) {
      bw.put(blocks(bi)(0) & 1, 1)
      bi += 1
    }
    bw.flush()
    // scans 5-6: AC refinement per band (Ah=1, Al=0, refinement
    // table) — history nonzero iff |c| >= 2 (sent in the first scan),
    // insertion iff |c| == 1, correction bit = bit 0 of |c|
    for ((ss, se) <- Seq((1, 5), (6, 63))) {
      bw = sos(1, ss, se, 0x10)
      var eobrun = 0
      val pending = new java.io.ByteArrayOutputStream() // one bit/byte
      def flushEob(): Unit = if (eobrun > 0) {
        val r = 31 - Integer.numberOfLeadingZeros(eobrun)
        bw.put(AcRefEnc.codeOf(r << 4), AcRefEnc.lenOf(r << 4))
        if (r > 0) bw.put(eobrun - (1 << r), r)
        val pb = pending.toByteArray
        var i = 0
        while (i < pb.length) { bw.put(pb(i), 1); i += 1 }
        pending.reset(); eobrun = 0
      }
      bi = 0
      while (bi < nbx * nby) {
        val zz = blocks(bi)
        var k = ss
        var blockOpen = true
        while (blockOpen && k <= se) {
          // next insertion position at or after k
          var j = k
          while (j <= se && math.abs(zz(j)) != 1) j += 1
          if (j > se) {
            // EOB region: the tail's correction bits ride the run
            var p = k
            while (p <= se) {
              if (math.abs(zz(p)) >= 2) pending.write(math.abs(zz(p)) & 1)
              p += 1
            }
            eobrun += 1
            if (eobrun == 32767) flushEob()
            blockOpen = false
          } else {
            flushEob()
            // ZRLs while >= 16 zero-history positions precede j; each
            // consumes exactly 16 zeros with crossed corrections
            // interleaved after its symbol (the decoder's advance)
            var segStart = k
            var emitted = false
            while (!emitted) {
              var zc = 0
              var p = segStart
              while (p < j) { if (zz(p) == 0) zc += 1; p += 1 }
              if (zc < 16) {
                bw.put(AcRefEnc.codeOf((zc << 4) | 1),
                  AcRefEnc.lenOf((zc << 4) | 1))
                bw.put(if (zz(j) > 0) 1 else 0, 1) // sign of +-1
                p = segStart
                while (p < j) {
                  if (math.abs(zz(p)) >= 2)
                    bw.put(math.abs(zz(p)) & 1, 1)
                  p += 1
                }
                emitted = true
              } else {
                bw.put(AcRefEnc.codeOf(0xf0), AcRefEnc.lenOf(0xf0))
                var consumed = 0
                p = segStart
                while (consumed < 16) {
                  if (zz(p) == 0) consumed += 1
                  else bw.put(math.abs(zz(p)) & 1, 1)
                  p += 1
                }
                segStart = p
              }
            }
            k = j + 1
          }
        }
        bi += 1
      }
      flushEob()
      bw.flush()
    }
    marker(out, 0xd9) // EOI
    out.toByteArray
  }

  /** Integer BT.601 forward conversion at one pixel, clamped to the
    * [0,255] sample range T.81 assumes (saturated primaries can round
    * to 256: pure blue's Cb and pure red's Cr). The coefficients sum
    * exactly per channel, so gray inputs (R=G=B) map to Y=v,
    * Cb=Cr=128 without rounding loss. sel: 0=Y, 1=Cb, 2=Cr. */
  private def yccAt(rgb: Array[Byte], width: Int, sel: Int,
      x: Int, y: Int): Int = {
    val base = (y * width + x) * 3
    val r = rgb(base) & 0xff
    val g = rgb(base + 1) & 0xff
    val b = rgb(base + 2) & 0xff
    val v = sel match {
      case 0 => (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
      case 1 => 128 + ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16)
      case _ => 128 + ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16)
    }
    if (v < 0) 0 else if (v > 255) 255 else v
  }

  /** Encode a top-down RGB raster as a baseline 4:4:4 YCbCr JPEG
    * (three components, 1x1 sampling each, K.1/K.2 quantizers, all
    * four K.3 Huffman tables, one interleaved scan). The integer
    * BT.601 conversion coefficients sum exactly per channel, so gray
    * inputs (R=G=B) map to Y=v, Cb=Cr=128 without rounding loss. */
  def encodeColor444(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"raster length ${rgb.length} != $width x $height x 3")
    def ch(sel: Int)(x: Int, y: Int): Int = yccAt(rgb, width, sel, x, y)
    val planes = (0 to 2).map(c => padPlane(width, height, ch(c)))
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8)
    marker(out, 0xe0); wbe16(out, 16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    wbe16(out, 1); wbe16(out, 1); out.write(0); out.write(0)
    writeDqt(out, 0, QLum)
    writeDqt(out, 1, QChr)
    marker(out, 0xc0); wbe16(out, 17) // SOF0, 3 components
    out.write(8); wbe16(out, height); wbe16(out, width); out.write(3)
    out.write(1); out.write(0x11); out.write(0) // Y
    out.write(2); out.write(0x11); out.write(1) // Cb
    out.write(3); out.write(0x11); out.write(1) // Cr
    writeDht(out, 0, 0, DcLumBits, DcLumVals)
    writeDht(out, 1, 0, AcLumBits, AcLumVals)
    writeDht(out, 0, 1, DcChrBits, DcChrVals)
    writeDht(out, 1, 1, AcChrBits, AcChrVals)
    marker(out, 0xda); wbe16(out, 12)
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0)
    val bw = new BitWriter(out)
    val zz = new Array[Int](64)
    val preds = new Array[Int](3)
    val (_, pw, ph) = planes(0)
    var by = 0
    while (by < ph / 8) {
      var bx = 0
      while (bx < pw / 8) {
        var c = 0
        while (c < 3) {
          val q = if (c == 0) QLum else QChr
          quantBlock(planes(c)._1, pw, bx * 8, by * 8, q, zz)
          preds(c) = encodeBlock(bw, zz, preds(c),
            if (c == 0) DcLumEnc else DcChrEnc,
            if (c == 0) AcLumEnc else AcChrEnc)
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(out, 0xd9)
    out.toByteArray
  }

  /** Encode a top-down RGB raster as a baseline 4:2:0 YCbCr JPEG —
    * the subsampling real pipelines actually emit: Y at full
    * resolution (sampling factors 2x2), Cb/Cr box-averaged 2x2
    * (1x1), MCU = 16x16 pixels = 4 Y blocks + Cb + Cr in the T.81
    * A.2.3 interleave order. Chroma downsamples as the 2x2 box mean
    * of the edge-replicated full-resolution plane (round half up) —
    * the filter T.81 leaves to the encoder; the decoder's
    * replication upsample is its inverse on constant 2x2 quads.
    * Gray inputs (R=G=B) have Cb=Cr=128 everywhere, so the
    * invertible-class analysis extends unchanged to subsampled
    * color — proven per class in the 4:2:0 round-trip spec. */
  def encodeColor420(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"raster length ${rgb.length} != $width x $height x 3")
    val mw = (width + 15) / 16 * 16
    val mh = (height + 15) / 16 * 16
    // Y at full resolution, edge-replicated to the 16-pixel MCU grid
    val yP = new Array[Int](mw * mh)
    var py = 0
    while (py < mh) {
      val sy = math.min(py, height - 1)
      var px = 0
      while (px < mw) {
        yP(py * mw + px) = yccAt(rgb, width, 0, math.min(px, width - 1), sy)
        px += 1
      }
      py += 1
    }
    // chroma at half resolution: 2x2 box mean over the edge-replicated
    // full-res conversion (partial boundary quads replicate the edge)
    val cw = mw / 2; val chh = mh / 2
    val cbP = new Array[Int](cw * chh)
    val crP = new Array[Int](cw * chh)
    var cy = 0
    while (cy < chh) {
      var cx = 0
      while (cx < cw) {
        var sel = 1
        while (sel <= 2) {
          var sum = 0
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              sum += yccAt(rgb, width, sel,
                math.min(2 * cx + dx, width - 1),
                math.min(2 * cy + dy, height - 1))
              dx += 1
            }
            dy += 1
          }
          val v = (sum + 2) / 4
          if (sel == 1) cbP(cy * cw + cx) = v else crP(cy * cw + cx) = v
          sel += 1
        }
        cx += 1
      }
      cy += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8)
    marker(out, 0xe0); wbe16(out, 16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    wbe16(out, 1); wbe16(out, 1); out.write(0); out.write(0)
    writeDqt(out, 0, QLum)
    writeDqt(out, 1, QChr)
    marker(out, 0xc0); wbe16(out, 17) // SOF0, 3 components
    out.write(8); wbe16(out, height); wbe16(out, width); out.write(3)
    out.write(1); out.write(0x22); out.write(0) // Y, 2x2
    out.write(2); out.write(0x11); out.write(1) // Cb, 1x1
    out.write(3); out.write(0x11); out.write(1) // Cr, 1x1
    writeDht(out, 0, 0, DcLumBits, DcLumVals)
    writeDht(out, 1, 0, AcLumBits, AcLumVals)
    writeDht(out, 0, 1, DcChrBits, DcChrVals)
    writeDht(out, 1, 1, AcChrBits, AcChrVals)
    marker(out, 0xda); wbe16(out, 12)
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0)
    val bw = new BitWriter(out)
    val zz = new Array[Int](64)
    val preds = new Array[Int](3)
    var my = 0
    while (my < mh / 16) {
      var mx = 0
      while (mx < mw / 16) {
        var j = 0
        while (j < 2) {
          var i = 0
          while (i < 2) {
            quantBlock(yP, mw, (mx * 2 + i) * 8, (my * 2 + j) * 8, QLum, zz)
            preds(0) = encodeBlock(bw, zz, preds(0), DcLumEnc, AcLumEnc)
            i += 1
          }
          j += 1
        }
        quantBlock(cbP, cw, mx * 8, my * 8, QChr, zz)
        preds(1) = encodeBlock(bw, zz, preds(1), DcChrEnc, AcChrEnc)
        quantBlock(crP, cw, mx * 8, my * 8, QChr, zz)
        preds(2) = encodeBlock(bw, zz, preds(2), DcChrEnc, AcChrEnc)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(out, 0xd9)
    out.toByteArray
  }

  // ----------------------------------------------------------------
  // Decoder.
  // ----------------------------------------------------------------

  /** Huffman JPEG decoder: baseline sequential (SOF0, T.81 §F.2) and
    * — since round 12 — PROGRESSIVE (SOF2, T.81 Annex G.2: spectral
    * selection + successive approximation, DC/AC first and refinement
    * scans, EOB runs, multi-scan DHT/DQT/DRI re-definition). 8-bit,
    * 1 or 3 components, sampling factors 1..2, DRI/RSTn restart
    * intervals, APPn/COM skipped, every marker length validated.
    * Arithmetic coding (SOF9/SOF10) and hierarchical mode stay
    * fail-fast out of scope. Output is a top-down RGB raster
    * (grayscale replicates; 3-component output converts from YCbCr
    * with the integer BT.601 inverse, chroma upsampled by
    * replication). External-bytes contract: any malformed input fails
    * fast with IllegalArgumentException — never any other throwable.
    * Conformance: ImageIO's progressive writer output (gray and
    * subsampled color) decodes within the foreign-bytes tolerances
    * (MultimodalJpegSpec). */
  final class JpegDecoder extends Codecs.ImageDecoder {

    def decode(b: Array[Byte]): Codecs.DecodedImage = {
      require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
        "not a JPEG (missing SOI)")
      var pos = 2

      def be16(off: Int): Int = {
        require(off + 2 <= b.length, "truncated JPEG marker segment")
        ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      }

      val qTabs = new Array[Array[Int]](4) // zigzag order, as stored
      val dcTabs = new Array[HuffDec](4)
      val acTabs = new Array[HuffDec](4)
      var restartInterval = 0
      var width = 0; var height = 0
      var nComp = 0
      // per component: id, h, v, tq (from SOF0); td, ta (from SOS)
      var cId: Array[Int] = null
      var cH: Array[Int] = null
      var cV: Array[Int] = null
      var cTq: Array[Int] = null
      var cTd: Array[Int] = null
      var cTa: Array[Int] = null
      var sawSof = false
      var progressive = false
      var scanStart = -1
      // SOS parameters of the most recently parsed scan header
      var scanNs = 0
      var scanCi: Array[Int] = null // frame-component index per scan slot
      var scanSs = 0; var scanSe = 63; var scanAh = 0; var scanAl = 0

      // Parse marker segments until the next SOS (returns true) or —
      // when between progressive scans — EOI (returns false). Shared
      // by the initial header walk and the progressive multi-scan
      // driver (DHT/DQT/DRI may legally arrive between scans).
      def parseToScanOrEoi(betweenScans: Boolean): Boolean = {
        scanStart = -1
        var eoiSeen = false
        while (scanStart < 0 && !eoiSeen) {
        require(pos + 2 <= b.length, "truncated JPEG (no SOS)")
        require((b(pos) & 0xff) == 0xff, f"expected marker at $pos")
        // skip fill bytes (B.1.1.2 allows any number of 0xFF)
        while (pos + 1 < b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
        val m = b(pos + 1) & 0xff
        pos += 2
        m match {
          case 0xd9 =>
            if (betweenScans) eoiSeen = true
            else throw new IllegalArgumentException("EOI before SOS")
          case 0x01 => () // TEM, standalone
          case _ if m >= 0xd0 && m <= 0xd7 =>
            throw new IllegalArgumentException("RST outside entropy data")
          case 0xc0 | 0xc2 =>
            require(!sawSof, "multiple SOF markers")
            progressive = m == 0xc2
            val len = be16(pos)
            require(len >= 8 && pos + len <= b.length, "bad SOF0 length")
            require((b(pos + 2) & 0xff) == 8, "only 8-bit precision")
            height = be16(pos + 3); width = be16(pos + 5)
            nComp = b(pos + 7) & 0xff
            require(width > 0 && height > 0, "zero JPEG dimensions")
            require(width.toLong * height * 3 <= Int.MaxValue,
              s"JPEG raster ${width}x$height too large")
            require(nComp == 1 || nComp == 3, "only 1 or 3 components")
            require(len == 8 + 3 * nComp, "SOF0 length != component count")
            cId = new Array[Int](nComp); cH = new Array[Int](nComp)
            cV = new Array[Int](nComp); cTq = new Array[Int](nComp)
            cTd = new Array[Int](nComp); cTa = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              val o = pos + 8 + c * 3
              cId(c) = b(o) & 0xff
              cH(c) = (b(o + 1) & 0xff) >> 4
              cV(c) = b(o + 1) & 0x0f
              cTq(c) = b(o + 2) & 0xff
              require(cH(c) >= 1 && cH(c) <= 2 && cV(c) >= 1 && cV(c) <= 2,
                s"unsupported sampling ${cH(c)}x${cV(c)}")
              require(cTq(c) < 4, "bad quant table id")
              c += 1
            }
            sawSof = true
            pos += len
          case sof if (sof >= 0xc1 && sof <= 0xcf) && sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
            throw new IllegalArgumentException(
              f"unsupported SOF marker 0xff$sof%02x (SOF0/SOF2 only)")
          case 0xdb =>
            val len = be16(pos)
            require(len >= 2 && pos + len <= b.length, "bad DQT length")
            var o = pos + 2
            while (o < pos + len) {
              val pq = (b(o) & 0xff) >> 4
              val tq = b(o) & 0x0f
              require(pq == 0, "only 8-bit quantizers")
              require(tq < 4 && o + 65 <= pos + len, "bad DQT entry")
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(k) = b(o + 1 + k) & 0xff
                require(t(k) > 0, "zero quantizer value")
                k += 1
              }
              qTabs(tq) = t
              o += 65
            }
            require(o == pos + len, "trailing DQT bytes")
            pos += len
          case 0xc4 =>
            val len = be16(pos)
            require(len >= 2 && pos + len <= b.length, "bad DHT length")
            var o = pos + 2
            while (o < pos + len) {
              require(o + 17 <= pos + len, "truncated DHT header")
              val clazz = (b(o) & 0xff) >> 4
              val id = b(o) & 0x0f
              require(clazz <= 1 && id < 4, "bad DHT class/id")
              val bits = new Array[Int](16)
              var total = 0
              var l = 0
              while (l < 16) {
                bits(l) = b(o + 1 + l) & 0xff; total += bits(l); l += 1
              }
              require(total <= 256 && o + 17 + total <= pos + len,
                "truncated DHT values")
              val vals = new Array[Byte](total)
              System.arraycopy(b, o + 17, vals, 0, total)
              val dec = new HuffDec(bits, vals)
              if (clazz == 0) dcTabs(id) = dec else acTabs(id) = dec
              o += 17 + total
            }
            require(o == pos + len, "trailing DHT bytes")
            pos += len
          case 0xdd =>
            val len = be16(pos)
            require(len == 4 && pos + len <= b.length, "bad DRI length")
            restartInterval = be16(pos + 2)
            pos += len
          case 0xda =>
            val len = be16(pos)
            require(sawSof, "SOS before SOF")
            require(len >= 6 && pos + len <= b.length, "bad SOS length")
            val ns = b(pos + 2) & 0xff
            require(len == 6 + 2 * ns, "SOS length != component count")
            require(ns >= 1 && ns <= nComp, "bad scan component count")
            scanNs = ns
            scanCi = new Array[Int](ns)
            var prev = -1
            var c = 0
            while (c < ns) {
              val id = b(pos + 3 + c * 2) & 0xff
              // scan components must be frame components in frame
              // order (a strictly ascending subset — T.81 B.2.3)
              var fi = prev + 1
              while (fi < nComp && cId(fi) != id) fi += 1
              require(fi < nComp, s"scan component $id not in frame order")
              scanCi(c) = fi
              prev = fi
              cTd(fi) = (b(pos + 4 + c * 2) & 0xff) >> 4
              cTa(fi) = b(pos + 4 + c * 2) & 0x0f
              require(cTd(fi) < 4 && cTa(fi) < 4, "bad SOS table id")
              c += 1
            }
            scanSs = b(pos + 3 + 2 * ns) & 0xff
            scanSe = b(pos + 4 + 2 * ns) & 0xff
            scanAh = (b(pos + 5 + 2 * ns) & 0xff) >> 4
            scanAl = b(pos + 5 + 2 * ns) & 0x0f
            if (!progressive) {
              require(ns == nComp && scanCi.zipWithIndex.forall(
                p => p._1 == p._2),
                "scan must cover all frame components")
              require(scanSs == 0 && scanSe == 63 &&
                scanAh == 0 && scanAl == 0,
                "not a sequential full-spectrum scan")
            } else {
              // T.81 G.1: DC band is [0,0]; AC bands are single-
              // component; successive approximation refines one bit
              require(scanSs <= 63 && scanSe <= 63 && scanSs <= scanSe,
                "bad spectral selection")
              if (scanSs == 0)
                require(scanSe == 0,
                  "progressive DC scan must have Se = 0")
              else require(ns == 1,
                "progressive AC scan must be single-component")
              require(scanAl <= 13 && scanAh <= 13 &&
                (scanAh == 0 || scanAh == scanAl + 1),
                "bad successive-approximation bits")
            }
            scanStart = pos + len
            pos += len
          case _ if m >= 0xe0 && m <= 0xfe => // APPn, COM
            val len = be16(pos)
            require(len >= 2 && pos + len <= b.length,
              f"bad segment length for marker 0xff$m%02x")
            pos += len
          case other =>
            throw new IllegalArgumentException(
              f"unsupported JPEG marker 0xff$other%02x")
        }
        }
        scanStart >= 0
      }
      require(parseToScanOrEoi(betweenScans = false), "no scan")

      // resolve tables now — every referenced table must exist
      // (baseline: the single scan references them all; progressive
      // scans re-check per scan, since DHT may arrive between scans)
      var c = 0
      if (!progressive) while (c < nComp) {
        require(qTabs(cTq(c)) != null, s"missing quant table ${cTq(c)}")
        require(dcTabs(cTd(c)) != null, s"missing DC table ${cTd(c)}")
        require(acTabs(cTa(c)) != null, s"missing AC table ${cTa(c)}")
        c += 1
      }

      var hMax = 1; var vMax = 1
      c = 0
      while (c < nComp) {
        if (cH(c) > hMax) hMax = cH(c)
        if (cV(c) > vMax) vMax = cV(c)
        c += 1
      }
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      // component planes at component resolution, MCU-padded
      val planeW = new Array[Int](nComp)
      val planes = new Array[Array[Byte]](nComp)
      c = 0
      while (c < nComp) {
        val pw = mcusX * cH(c) * 8
        val ph = mcusY * cV(c) * 8
        require(pw.toLong * ph <= Int.MaxValue, "component plane too large")
        planeW(c) = pw
        planes(c) = new Array[Byte](pw * ph)
        c += 1
      }

      if (!progressive) {
      val br = new BitReader(b, scanStart, b.length)
      val preds = new Array[Int](nComp)
      val coef = new Array[Int](64)
      val samp = new Array[Int](64)

      def decodeHuff(t: HuffDec): Int = {
        var code = br.nextBit()
        var l = 1
        while (code > t.maxCode(l)) {
          require(l < 16, "invalid Huffman code in entropy data")
          code = (code << 1) | br.nextBit()
          l += 1
        }
        t.huffVal(t.valPtr(l) + code - t.minCode(l)) & 0xff
      }

      def decodeBlockTo(ci: Int, x0: Int, y0: Int): Unit = {
        java.util.Arrays.fill(coef, 0)
        val q = qTabs(cTq(ci))
        val t = decodeHuff(dcTabs(cTd(ci)))
        require(t <= 11, s"bad DC category $t")
        preds(ci) += extend(br.receive(t), t)
        coef(0) = preds(ci) * q(0)
        var k = 1
        var open = true
        while (open && k < 64) {
          val rs = decodeHuff(acTabs(cTa(ci)))
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            // T.81 F.1.2.2: s==0 admits exactly EOB (r=0) and ZRL (r=15);
            // any other run with size 0 is a malformed stream — fail fast
            // rather than silently treating it as EOB.
            require(r == 0 || r == 15, s"undefined AC run/size symbol (r=$r, s=0)")
            if (r == 15) {
              k += 16 // ZRL
              // a ZRL may not advance past the last coefficient — if it
              // does, the stream is malformed; don't silently drop coefs
              require(k <= 63, "ZRL advances past block end")
            } else open = false // EOB
          } else {
            k += r
            require(k < 64, "AC run past block end")
            coef(Zigzag(k)) = extend(br.receive(s), s) * q(k)
            k += 1
          }
        }
        idctBlock(coef, samp)
        val pw = planeW(ci)
        val plane = planes(ci)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            plane((y0 + y) * pw + (x0 + x)) = samp(y * 8 + x).toByte
            x += 1
          }
          y += 1
        }
      }

      val totalMcus = mcusX * mcusY
      var mcu = 0
      var rstN = 0
      while (mcu < totalMcus) {
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < nComp) {
          var j = 0
          while (j < cV(ci)) {
            var i = 0
            while (i < cH(ci)) {
              decodeBlockTo(ci, (mx * cH(ci) + i) * 8, (my * cV(ci) + j) * 8)
              i += 1
            }
            j += 1
          }
          ci += 1
        }
        mcu += 1
        if (restartInterval > 0 && mcu % restartInterval == 0 &&
          mcu < totalMcus) {
          br.align()
          // T.81 B.1.1.2 permits optional 0xFF fill bytes before any
          // marker — skip a run of them before the RSTn check, exactly
          // as the EOI handling below does.
          while (br.pos + 1 < b.length && (b(br.pos) & 0xff) == 0xff &&
            (b(br.pos + 1) & 0xff) == 0xff) br.pos += 1
          require(br.pos + 2 <= b.length &&
            (b(br.pos) & 0xff) == 0xff &&
            (b(br.pos + 1) & 0xff) == 0xd0 + rstN,
            s"missing RST$rstN after MCU $mcu")
          br.pos += 2
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
      }

      // the scan must be followed by EOI (possibly after fill bytes);
      // trailing bytes after EOI are tolerated (RIFF pad bytes etc.)
      br.align()
      var p = br.pos
      while (p + 1 < b.length && (b(p) & 0xff) == 0xff &&
        (b(p + 1) & 0xff) == 0xff) p += 1
      require(p + 2 <= b.length && (b(p) & 0xff) == 0xff &&
        (b(p + 1) & 0xff) == 0xd9, "missing EOI after scan")
      } else {
        // ---- progressive mode (T.81 Annex G.2, Huffman coding) ----
        // Quantized DCT coefficients accumulate across scans, one
        // zigzag-ordered 64-int block per block position over the
        // MCU-padded grid; dequantize + IDCT happen once, after EOI.
        val bW = new Array[Int](nComp)
        val niW = new Array[Int](nComp); val niH = new Array[Int](nComp)
        val coefs = new Array[Array[Int]](nComp)
        c = 0
        while (c < nComp) {
          bW(c) = mcusX * cH(c)
          val bHc = mcusY * cV(c)
          // non-interleaved scans cover the component's OWN block
          // grid (A.2.2: ceil of its sample dims), which can be
          // narrower than the MCU-padded grid
          val xi = (width * cH(c) + hMax - 1) / hMax
          val yi = (height * cV(c) + vMax - 1) / vMax
          niW(c) = (xi + 7) / 8; niH(c) = (yi + 7) / 8
          require(bW(c).toLong * bHc * 64 <= Int.MaxValue,
            "component coefficient store too large")
          coefs(c) = new Array[Int](bW(c) * bHc * 64)
          c += 1
        }
        val dcDone = new Array[Boolean](nComp)
        val preds = new Array[Int](nComp)

        var moreScans = true
        while (moreScans) {
          val br = new BitReader(b, scanStart, b.length)
          java.util.Arrays.fill(preds, 0)
          var eobrun = 0
          var rstN = 0

          def decodeHuff(t: HuffDec): Int = {
            var code = br.nextBit()
            var l = 1
            while (code > t.maxCode(l)) {
              require(l < 16, "invalid Huffman code in entropy data")
              code = (code << 1) | br.nextBit()
              l += 1
            }
            t.huffVal(t.valPtr(l) + code - t.minCode(l)) & 0xff
          }

          // RSTn boundary every restartInterval decode units (MCUs
          // when interleaved, blocks when not) — resets DC preds AND
          // the EOB run (G.1.2.2)
          def expectRst(done: Int, total: Int): Unit =
            if (restartInterval > 0 && done % restartInterval == 0 &&
              done < total) {
              require(eobrun == 0, "EOB run across a restart boundary")
              br.align()
              while (br.pos + 1 < b.length && (b(br.pos) & 0xff) == 0xff &&
                (b(br.pos + 1) & 0xff) == 0xff) br.pos += 1
              require(br.pos + 2 <= b.length &&
                (b(br.pos) & 0xff) == 0xff &&
                (b(br.pos + 1) & 0xff) == 0xd0 + rstN,
                s"missing RST$rstN after unit $done")
              br.pos += 2
              rstN = (rstN + 1) % 8
              java.util.Arrays.fill(preds, 0)
            }

          def decodeDcAt(ci: Int, off: Int): Unit =
            if (scanAh == 0) {
              val t = decodeHuff(dcTabs(cTd(ci)))
              require(t <= 11, s"bad DC category $t")
              preds(ci) += extend(br.receive(t), t)
              coefs(ci)(off) = preds(ci) << scanAl
            } else {
              // DC refinement: one raw correction bit, no table
              coefs(ci)(off) |= br.nextBit() << scanAl
            }

          // first AC scan for a band (G.1.2.2): EOB runs + ZRL + new
          // coefficients at magnitude << Al
          def acFirstAt(ci: Int, off: Int): Unit =
            if (eobrun > 0) eobrun -= 1
            else {
              val zz = coefs(ci)
              var k = scanSs
              var open = true
              while (open && k <= scanSe) {
                val rs = decodeHuff(acTabs(cTa(ci)))
                val r = rs >> 4
                val s = rs & 0x0f
                if (s == 0) {
                  if (r == 15) {
                    k += 16 // ZRL
                    require(k <= scanSe + 1, "ZRL past band end")
                  } else {
                    // EOBn: run of 2^r + receive(r) blocks, this one
                    // included
                    eobrun = (1 << r) - 1 +
                      (if (r > 0) br.receive(r) else 0)
                    open = false
                  }
                } else {
                  k += r
                  require(k <= scanSe, "AC run past band end")
                  zz(off + k) = extend(br.receive(s), s) << scanAl
                  k += 1
                }
              }
            }

          // AC refinement scan (G.1.2.3): correction bits over
          // nonzero-history coefficients, new ±1<<Al insertions over
          // zero-history positions
          def acRefineAt(ci: Int, off: Int): Unit = {
            val zz = coefs(ci)
            val p1 = 1 << scanAl
            val m1 = -1 << scanAl
            def correct(k: Int): Unit = {
              val cur = zz(off + k)
              if (br.nextBit() == 1 && (cur & p1) == 0)
                zz(off + k) = if (cur >= 0) cur + p1 else cur + m1
            }
            var k = scanSs
            if (eobrun == 0) {
              var open = true
              while (open && k <= scanSe) {
                val rs = decodeHuff(acTabs(cTa(ci)))
                var r = rs >> 4
                val s = rs & 0x0f
                var newval = 0
                if (s == 0) {
                  if (r < 15) {
                    // EOBn: this block's remaining history refines
                    // below, then eobrun-1 further whole blocks
                    eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
                    open = false
                  }
                  // r == 15: ZRL — skip 16 zero-history positions
                } else {
                  require(s == 1, s"bad refinement size $s")
                  newval = if (br.nextBit() == 1) p1 else m1
                }
                if (open) {
                  // advance: correction bits on nonzero history, r
                  // zero-history skips, then place newval (if any)
                  var placed = false
                  while (!placed && k <= scanSe) {
                    if (zz(off + k) != 0) { correct(k); k += 1 }
                    else if (r == 0) {
                      if (s != 0) zz(off + k) = newval
                      k += 1
                      placed = true
                    } else { r -= 1; k += 1 }
                  }
                  require(placed || s == 0,
                    "refinement coefficient past band end")
                }
              }
            }
            if (eobrun > 0) {
              // EOB region: only history refinement to the band end
              while (k <= scanSe) {
                if (zz(off + k) != 0) correct(k)
                k += 1
              }
              eobrun -= 1
            }
          }

          if (scanSs == 0) {
            // DC scan — interleaved in MCU order when ns > 1,
            // non-interleaved over the component's own grid when
            // ns == 1 (A.2.2/A.2.3)
            if (scanAh == 0) {
              var i = 0
              while (i < scanNs) {
                val ci = scanCi(i)
                require(dcTabs(cTd(ci)) != null,
                  s"missing DC table ${cTd(ci)}")
                dcDone(ci) = true
                i += 1
              }
            } else {
              var i = 0
              while (i < scanNs) {
                require(dcDone(scanCi(i)),
                  "DC refinement before the first DC scan")
                i += 1
              }
            }
            if (scanNs == 1) {
              val ci = scanCi(0)
              val total = niW(ci) * niH(ci)
              var bi = 0
              while (bi < total) {
                val off =
                  ((bi / niW(ci)) * bW(ci) + bi % niW(ci)) * 64
                decodeDcAt(ci, off)
                bi += 1
                expectRst(bi, total)
              }
            } else {
              val totalMcus = mcusX * mcusY
              var mcu = 0
              while (mcu < totalMcus) {
                val mx = mcu % mcusX
                val my = mcu / mcusX
                var i = 0
                while (i < scanNs) {
                  val ci = scanCi(i)
                  var j = 0
                  while (j < cV(ci)) {
                    var ii = 0
                    while (ii < cH(ci)) {
                      val off = ((my * cV(ci) + j) * bW(ci) +
                        mx * cH(ci) + ii) * 64
                      decodeDcAt(ci, off)
                      ii += 1
                    }
                    j += 1
                  }
                  i += 1
                }
                mcu += 1
                expectRst(mcu, totalMcus)
              }
            }
          } else {
            // AC scan — always single-component, non-interleaved
            val ci = scanCi(0)
            require(dcDone(ci),
              "AC scan before the component's first DC scan")
            require(acTabs(cTa(ci)) != null,
              s"missing AC table ${cTa(ci)}")
            val total = niW(ci) * niH(ci)
            var bi = 0
            while (bi < total) {
              val off = ((bi / niW(ci)) * bW(ci) + bi % niW(ci)) * 64
              if (scanAh == 0) acFirstAt(ci, off) else acRefineAt(ci, off)
              bi += 1
              expectRst(bi, total)
            }
          }
          require(eobrun == 0, "EOB run past the last block of the scan")

          br.align()
          pos = br.pos
          moreScans = parseToScanOrEoi(betweenScans = true)
        }

        c = 0
        while (c < nComp) {
          require(dcDone(c), s"no DC scan for component $c")
          require(qTabs(cTq(c)) != null, s"missing quant table ${cTq(c)}")
          c += 1
        }

        // dequantize + IDCT every block of the padded grid into the
        // component planes (pad blocks hold zeros -> flat 128, cropped
        // by the color resolve)
        val coef = new Array[Int](64)
        val samp = new Array[Int](64)
        c = 0
        while (c < nComp) {
          val q = qTabs(cTq(c))
          val zz = coefs(c)
          val bHc = mcusY * cV(c)
          val pw = planeW(c)
          val plane = planes(c)
          var by = 0
          while (by < bHc) {
            var bx = 0
            while (bx < bW(c)) {
              val off = (by * bW(c) + bx) * 64
              var k = 0
              while (k < 64) {
                coef(Zigzag(k)) = zz(off + k) * q(k)
                k += 1
              }
              idctBlock(coef, samp)
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  plane((by * 8 + y) * pw + bx * 8 + x) =
                    samp(y * 8 + x).toByte
                  x += 1
                }
                y += 1
              }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
      }

      // color resolve
      val rgb = new Array[Byte](width * height * 3)
      if (nComp == 1) {
        val pw = planeW(0)
        val plane = planes(0)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val v = plane(y * pw + x)
            val base = (y * width + x) * 3
            rgb(base) = v; rgb(base + 1) = v; rgb(base + 2) = v
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            def sample(ci: Int): Int = {
              val sx = x * cH(ci) / hMax
              val sy = y * cV(ci) / vMax
              planes(ci)(sy * planeW(ci) + sx) & 0xff
            }
            val yy = sample(0)
            val cb = sample(1) - 128
            val cr = sample(2) - 128
            def clamp(v: Int): Byte =
              (if (v < 0) 0 else if (v > 255) 255 else v).toByte
            val base = (y * width + x) * 3
            rgb(base) = clamp(yy + ((91881 * cr + 32768) >> 16))
            rgb(base + 1) = clamp(yy - ((22554 * cb + 46802 * cr + 32768) >> 16))
            rgb(base + 2) = clamp(yy + ((116130 * cb + 32768) >> 16))
            x += 1
          }
          y += 1
        }
      }
      Codecs.DecodedImage(width, height, rgb)
    }
  }

  // ----------------------------------------------------------------
  // M-JPEG AVI: JPEG scans as the per-frame payload of the engine's
  // existing RIFF/AVI chunk walk — a genuinely COMPRESSED video
  // codec inside a real container, the shape the reference's frame
  // loop (raw_to_samples.py:173-196) actually decodes in practice.
  // ----------------------------------------------------------------

  /** Mux pre-encoded JPEG frames into a RIFF/AVI with an 'MJPG'
    * stream: same header layout as [[Codecs.aviEncode]] but
    * biCompression = 'MJPG' and one '00dc' chunk per JPEG (odd
    * lengths padded per RIFF). Frame byte sizes are entropy-coded
    * and thus data-dependent — there is deliberately no closed-form
    * size companion; containers are measured, not replayed. */
  def aviEncodeMjpeg(width: Int, height: Int, fps: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && jpegFrames.nonEmpty,
      "need positive dims/fps and >= 1 frame")
    val nf = jpegFrames.length
    val padded = jpegFrames.map(f => f.length + (f.length & 1))
    val moviContent = 4 + padded.map(_ + 8).sum
    val size = 224 + moviContent - 4 // RIFF(12) + hdrl(208) + LIST movi hdr(8) + content
    val out = new Array[Byte](size)
    import Codecs.{w16, w32, wTag}
    val maxF = jpegFrames.map(_.length).max
    wTag(out, 0, "RIFF"); w32(out, 4, size - 8); wTag(out, 8, "AVI ")
    wTag(out, 12, "LIST"); w32(out, 16, 192); wTag(out, 20, "hdrl")
    wTag(out, 24, "avih"); w32(out, 28, 56)
    val avih = 32
    w32(out, avih, 1000000 / fps)
    w32(out, avih + 4, fps * maxF)
    w32(out, avih + 16, nf)
    w32(out, avih + 24, 1)
    w32(out, avih + 28, maxF + 8)
    w32(out, avih + 32, width); w32(out, avih + 36, height)
    wTag(out, 88, "LIST"); w32(out, 92, 116); wTag(out, 96, "strl")
    wTag(out, 100, "strh"); w32(out, 104, 56)
    val strh = 108
    wTag(out, strh, "vids"); wTag(out, strh + 4, "MJPG")
    w32(out, strh + 20, 1)
    w32(out, strh + 24, fps)
    w32(out, strh + 32, nf)
    w32(out, strh + 36, maxF + 8)
    w16(out, strh + 52, width); w16(out, strh + 54, height)
    wTag(out, 164, "strf"); w32(out, 168, 40)
    val strf = 172
    w32(out, strf, 40)
    w32(out, strf + 4, width); w32(out, strf + 8, height)
    w16(out, strf + 12, 1); w16(out, strf + 14, 24)
    wTag(out, strf + 16, "MJPG") // biCompression fourcc
    w32(out, strf + 20, Codecs.bmpStride(width) * height)
    wTag(out, 212, "LIST"); w32(out, 216, moviContent)
    wTag(out, 220, "movi")
    var off = 224
    jpegFrames.foreach { f =>
      wTag(out, off, "00dc"); w32(out, off + 4, f.length)
      System.arraycopy(f, 0, out, off + 8, f.length)
      off += 8 + f.length + (f.length & 1)
    }
    out
  }

  /** M-JPEG AVI decoder: the RIFF chunk walk of [[Codecs.AviDecoder]]
    * with 'MJPG' stream headers, each '00dc' chunk a complete
    * baseline JPEG decoded by [[JpegDecoder]]. Frame dimensions must
    * match the stream header — a mux that lies about dims fails
    * fast. */
  final class MjpegAviDecoder extends Codecs.VideoDecoder {
    private val jpeg = new JpegDecoder

    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    private def checkedLen(b: Array[Byte], off: Int, end: Int): Int = {
      val len = Codecs.s32(b, off + 4)
      require(len >= 0 && off + 8 + len.toLong <= end,
        s"corrupt RIFF chunk '${tag(b, off)}' len $len at offset $off")
      len
    }

    def decode(b: Array[Byte]): Codecs.DecodedVideo = {
      require(b.length >= 12 && tag(b, 0) == "RIFF" &&
        tag(b, 8) == "AVI ", "not a RIFF/AVI")
      var width = 0; var height = 0
      var scale = 0; var rate = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

      def parseStrl(from: Int, end: Int): Unit = {
        var off = from
        var cur = ""
        while (off + 8 <= end) {
          val len = checkedLen(b, off, end)
          tag(b, off) match {
            case "strh" =>
              require(len >= 56, s"strh too short ($len)")
              cur = tag(b, off + 8)
              if (cur == "vids") {
                require(tag(b, off + 12) == "MJPG",
                  "not an MJPG video stream")
                scale = Codecs.s32(b, off + 28)
                rate = Codecs.s32(b, off + 32)
              }
            case "strf" if cur == "vids" =>
              require(len >= 40, s"strf too short ($len)")
              width = Codecs.s32(b, off + 12)
              height = Codecs.s32(b, off + 16)
              require(width > 0 && height > 0,
                s"bad MJPG dims ${width}x$height")
              require(tag(b, off + 24) == "MJPG",
                "strf biCompression != MJPG")
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
          if (tag(b, off) == "00dc") {
            require(width > 0 && height > 0,
              "movi frame before stream headers")
            val fb = new Array[Byte](len)
            System.arraycopy(b, off + 8, fb, 0, len)
            val im = jpeg.decode(fb)
            require(im.width == width && im.height == height,
              s"frame ${im.width}x${im.height} != stream ${width}x$height")
            frames += im.rgb
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
      Codecs.DecodedVideo(width, height, rate / scale, frames.toArray)
    }
  }
}
