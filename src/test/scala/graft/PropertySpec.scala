package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Property-based checks over the pure kernels — no SparkSession, so
  * these run in milliseconds and explore the input space ScalaCheck
  * generates rather than the fixed corpus. (scalacheck is driven
  * directly; the scalatestplus bridge isn't on the offline
  * classpath.) */
class PropertySpec extends AnyFunSuite {

  private val P = 1000000007L

  /** Run a ScalaCheck property under ScalaTest. */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(g) { a => f(a); true })
    assert(res.passed, res.status.toString)
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb)) { case (a, b) => f(a, b) }

  test("PolyHash: appending a char is one affine fold step") {
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableChar) { (s: String, c: Char) =>
      val h = plans.PolyHash.hash(UTF8String.fromString(s))
      val h2 = plans.PolyHash.hash(UTF8String.fromString(s + c))
      assert(h2 == (h * 31 + c.toLong) % P)
    }
  }

  test("PolyHash: equal strings hash equal, range stays within [0, P)") {
    forAll(Gen.asciiPrintableStr) { (s: String) =>
      val h = plans.PolyHash.hash(UTF8String.fromString(s))
      assert(h == plans.PolyHash.hash(UTF8String.fromString(s)))
      assert(h >= 0 && h < P)
    }
  }

  test("sessionWalk: sessions partition the events and respect the gap") {
    val gapUs = 30L * 60 * 1000000
    val evGen = Gen.listOf(Gen.zip(
      Gen.choose(0L, 100000L), Gen.choose(0L, 10L * gapUs)))
    forAll(evGen) { (raw: List[(Long, Long)]) =>
      // unique event ids, arbitrary micro timestamps
      val rows = raw.zipWithIndex.map { case ((_, t), i) => (7L, i.toLong, t) }
      val sessions = streaming.Streaming.sessionWalk(7L, rows.iterator).toList
      // counts partition the input
      assert(sessions.map(_._3).sum == rows.length)
      // session indexes are 0..n-1 in order
      assert(sessions.map(_._2) == sessions.indices.map(_.toLong))
      // within a session, consecutive (sorted) events are <= gap apart;
      // across a boundary the gap is exceeded
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val cuts = sessions.map(_._3.toInt).scanLeft(0)(_ + _)
      cuts.sliding(2).filter(_.size == 2).foreach { case Seq(lo, hi) =>
        val seg = sorted.slice(lo, hi)
        seg.sliding(2).filter(_.size == 2).foreach {
          case Seq(a, b) => assert(b - a <= gapUs)
        }
        if (hi < sorted.length) assert(sorted(hi) - sorted(hi - 1) > gapUs)
      }
    }
  }

  test("MinHashAgg buffers: merge == single-pass update over the union") {
    val agg = plans.MinHashAgg(null, 8)
    val hGen = Gen.listOf(Gen.choose(0L, P - 1))
    forAll(hGen) { (hs: List[Long]) =>
      def bufOf(xs: Seq[Long]): Array[Long] = {
        val b = agg.createAggregationBuffer()
        xs.foreach { h =>
          var i = 0
          while (i < 8) {
            val m = (h * (2 * i + 3) + (97 * i + 31)) % P
            if (m < b(i)) b(i) = m
            i += 1
          }
        }
        b
      }
      val (l, r) = hs.splitAt(hs.length / 2)
      assert(agg.merge(bufOf(l), bufOf(r)).toSeq == bufOf(hs).toSeq)
      val direct = bufOf(hs)
      assert(agg.deserialize(agg.serialize(direct)).toSeq == direct.toSeq)
    }
  }

  test("Shingles: n-gram count, order, and distinctness invariants") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    val tokGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "ab"))
    forAll(tokGen) { (toks: List[String]) =>
      val in: ArrayData = new GenericArrayData(
        toks.map(UTF8String.fromString).toArray[Any])
      val out = plans.Shingles.shingle(in, 3)
      val got = (0 until out.numElements()).map(out.getUTF8String(_).toString)
      val expect = toks.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toList.distinct
      assert(got == expect)
    }
  }

  test("SimHash64Agg buffers: merge is commutative and order-insensitive") {
    val agg = plans.SimHash64Agg(null, null)
    val inputGen = Gen.listOf(Gen.zip(
      Gen.choose(0L, P - 1), Gen.choose(1L, 50L)))
    forAll(inputGen) { (items: List[(Long, Long)]) =>
      def bufOf(xs: Seq[(Long, Long)]): Array[Long] = {
        val b = agg.createAggregationBuffer()
        xs.foreach { case (h, c) =>
          var j = 0
          while (j < 64) {
            val bit = ((h * (2 * j + 3) + (97 * j + 31)) % P) & 1L
            b(j) += (if (bit == 1L) c else -c)
            j += 1
          }
        }
        b
      }
      val (l, r) = items.splitAt(items.length / 2)
      val merged = agg.merge(bufOf(l), bufOf(r))
      val direct = bufOf(items)
      assert(merged.toSeq == direct.toSeq)
      // serialization round-trips
      assert(agg.deserialize(agg.serialize(direct)).toSeq == direct.toSeq)
    }
  }

  test("MisraGries: merged sketches never lose a heavy hitter; n is exact") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
    import org.apache.spark.sql.types.StringType
    val tokGen = Gen.frequency(
      (8, Gen.oneOf("h0", "h1", "h2")),            // skewed head
      (2, Gen.choose(0, 500).map(i => s"c$i")))    // long tail
    val streamGen = Gen.zip(
      Gen.listOfN(400, tokGen), Gen.choose(1, 5), Gen.choose(4, 12))
    forAll(streamGen) { case (tokens, parts, k) =>
      val agg = plans.MisraGriesAgg(
        BoundReference(0, StringType, nullable = true), k)
      // split the stream, fold each partition, merge (serialization
      // roundtrip included — the path a real shuffle exercises)
      val bufs = tokens.grouped(math.max(1, tokens.size / parts)).map { part =>
        val b = agg.createAggregationBuffer()
        part.foreach { t =>
          agg.update(b,
            new GenericInternalRow(Array[Any](UTF8String.fromString(t))))
        }
        agg.deserialize(agg.serialize(b))
      }.toList
      val merged = bufs.reduce(agg.merge)
      assert(merged.n == tokens.size)
      assert(merged.counts.size <= k)
      val exact = tokens.groupBy(identity).view.mapValues(_.size)
      exact.collect { case (t, c) if c.toLong * k > tokens.size => t }
        .foreach { hh =>
          assert(merged.counts.contains(hh),
            s"lost heavy hitter $hh at k=$k parts=$parts")
        }
    }
  }

  // --- codec round-trip identity on RANDOM content ---------------
  // The exhaustive specs in MultimodalSpec cover every raster CLASS
  // of the catalog patterns; these properties cover arbitrary
  // content — the worst case for the entropy coders (random bytes
  // defeat LZW/DEFLATE modeling, drive the width schedule and
  // dictionary growth down different paths) and for every layout
  // edge (stride paddings, odd dims, 1-pixel images).

  private val dimsSeed = Gen.zip(
    Gen.choose(1, 40), Gen.choose(1, 30), Gen.choose(0L, Long.MaxValue))

  test("codec property: BMP and PNG round-trip ANY raster exactly") {
    import multimodal.Codecs
    val bd = new Codecs.BmpDecoder()
    val pd = new Codecs.PngDecoder()
    forAll(dimsSeed) { case (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val rgb = new Array[Byte](w * h * 3)
      rnd.nextBytes(rgb)
      val bmp = bd.decode(Codecs.bmpEncode(w, h, rgb))
      assert(bmp.width == w && bmp.height == h &&
        java.util.Arrays.equals(bmp.rgb, rgb))
      val png = pd.decode(Codecs.pngEncode(w, h, rgb))
      assert(png.width == w && png.height == h &&
        java.util.Arrays.equals(png.rgb, rgb))
    }
  }

  test("codec property: TIFF round-trips ANY raster exactly in BOTH " +
    "compressions, and PackBits inverts on adversarial rows " +
    "(alternating bytes, 128+ runs, exactly-128 literal stretches)") {
    import multimodal.Codecs
    val dec = new Codecs.TiffDecoder()
    forAll(dimsSeed) { case (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val rgb = new Array[Byte](w * h * 3)
      rnd.nextBytes(rgb)
      for (pb <- Seq(false, true)) {
        val im = dec.decode(Codecs.tiffEncode(w, h, rgb, pb))
        assert(im.width == w && im.height == h &&
          java.util.Arrays.equals(im.rgb, rgb), s"pb=$pb")
      }
    }
    // PackBits boundary rows through the raw kernel: worst-case
    // alternating literals, runs longer than a 128 control span,
    // run lengths straddling the >=3 encode threshold, and the
    // exactly-128 literal stretch
    def rt(row: Array[Byte]): Unit = {
      val packed = Codecs.packBits(row)
      assert(java.util.Arrays.equals(
        Codecs.unpackBits(packed, 0, packed.length, row.length), row),
        s"row of ${row.length} failed")
    }
    rt(Array.tabulate(257)(i => (i % 2).toByte)) // alternating
    rt(Array.fill(300)(7.toByte)) // 300-run: two control spans
    rt(Array.fill(128)(9.toByte) ++ Array.tabulate(128)(_.toByte))
    rt((0 until 20).flatMap(k =>
      Array.fill(2 + k % 3)((k % 5).toByte)).toArray) // 2/3/4-runs
    rt(Array.tabulate(128)(i => (i * 31 % 251).toByte)) // exactly 128
    rt(Array[Byte](5)) // single byte
    // random rows, any length
    forAll(Gen.zip(Gen.choose(1, 700), Gen.choose(0L, Long.MaxValue))) {
      case (n, seed) =>
        val rnd = new scala.util.Random(seed)
        val row = new Array[Byte](n)
        // mix runs and noise: runs of random length 1..40
        var i = 0
        while (i < n) {
          val len = math.min(1 + rnd.nextInt(40), n - i)
          val v = rnd.nextInt(256).toByte
          if (rnd.nextBoolean()) java.util.Arrays.fill(row, i, i + len, v)
          else (i until i + len).foreach(j => row(j) = rnd.nextInt(256).toByte)
          i += len
        }
        rt(row)
    }
  }

  test("codec property: GIF LZW round-trips ANY index plane exactly " +
    "— incl. large random rasters that drive the table to 4096 and " +
    "through the mid-stream clear/reset") {
    import multimodal.Codecs
    val dec = new Codecs.GifLzwDecoder()
    forAll(Gen.zip(Gen.choose(1, 90), Gen.choose(1, 70),
      Gen.choose(0L, Long.MaxValue))) { case (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val idx = new Array[Byte](w * h)
      rnd.nextBytes(idx)
      val out = dec.decode(Codecs.gifEncode(w, h, idx))
      assert(out.width == w && out.height == h &&
        java.util.Arrays.equals(out.indices, idx))
    }
    // deterministic table-full case: 6300 random pixels adds > 4096
    // dictionary entries, forcing the encoder's clear/reset path
    val rnd = new scala.util.Random(7)
    val big = new Array[Byte](90 * 70)
    rnd.nextBytes(big)
    assert(java.util.Arrays.equals(
      dec.decode(Codecs.gifEncode(90, 70, big)).indices, big))
  }

  test("codec property: JPEG round-trips ANY gray plane within the " +
    "quantizer bound, decodes structurally valid rasters at ANY " +
    "random dims (edge padding), round-trips the invertible class " +
    "exactly at random geometry, and survives ImageIO on the same " +
    "random bytes within the cross-IDCT bound") {
    import multimodal.Jpeg
    val dec = new Jpeg.JpegDecoder()
    forAll(Gen.zip(Gen.choose(1, 40), Gen.choose(1, 30),
      Gen.choose(0L, Long.MaxValue))) { case (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val g = new Array[Byte](w * h)
      rnd.nextBytes(g)
      val jpeg = Jpeg.encodeGray(w, h, g)
      val im = dec.decode(jpeg)
      assert(im.width == w && im.height == h &&
        im.rgb.length == w * h * 3)
      // random noise is the worst case for a quality-50 quantizer:
      // per-pixel error is bounded by half the largest AC quantizer
      // times the basis gain — 128 is a safe structural bound that
      // still catches layout/entropy bugs (those produce ~uniform
      // garbage)
      var i = 0
      while (i < g.length) {
        assert(math.abs((im.rgb(3 * i) & 0xff) - (g(i) & 0xff)) <= 128)
        i += 1
      }
      // ImageIO agrees on the same bytes within the cross-IDCT bound
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      assert(bi != null && bi.getWidth == w && bi.getHeight == h)
      var worst = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          worst = math.max(worst, math.abs(
            (im.rgb((y * w + x) * 3) & 0xff) -
              bi.getRaster.getSample(x, y, 0)))
          x += 1
        }
        y += 1
      }
      assert(worst <= 3, s"cross-IDCT drift $worst on random content")
      // invertible class at random block geometry: exact
      val bw = 1 + rnd.nextInt(4); val bh = 1 + rnd.nextInt(3)
      val cg = new Array[Byte](bw * 8 * bh * 8)
      for (bj <- 0 until bh; bi2 <- 0 until bw) {
        val v = (2 * rnd.nextInt(128)).toByte
        for (yy <- 0 until 8; xx <- 0 until 8)
          cg((bj * 8 + yy) * bw * 8 + bi2 * 8 + xx) = v
      }
      val cim = dec.decode(Jpeg.encodeGray(bw * 8, bh * 8, cg))
      var j = 0
      while (j < cg.length) {
        assert((cim.rgb(3 * j) & 0xff) == (cg(j) & 0xff),
          s"invertible class broke at $j")
        j += 1
      }
    }
  }

  test("codec property: WAV, AVI, MP4 video and two-track MP4 AV " +
    "round-trip ANY content exactly") {
    import multimodal.Codecs
    forAll(Gen.zip(Gen.choose(1, 12), Gen.choose(1, 9),
      Gen.choose(0L, Long.MaxValue))) { case (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val nf = 1 + (seed % 4).toInt.abs
      val frames = (0 until nf).map { _ =>
        val f = new Array[Byte](w * h * 3); rnd.nextBytes(f); f
      }
      val n = 1 + rnd.nextInt(300)
      val pcm = Array.fill(n)(rnd.nextInt(65536).toShort)
      val wav = new Codecs.WavDecoder().decode(Codecs.wavEncode(8000, pcm))
      assert(wav.samples.toSeq == pcm.toSeq)
      val avi = new Codecs.AviDecoder().decode(
        Codecs.aviEncode(w, h, 10, frames))
      assert(avi.frames.length == nf &&
        avi.frames.zip(frames).forall { case (a, b) =>
          java.util.Arrays.equals(a, b) })
      val mp4 = new Codecs.Mp4VideoDecoder().decode(
        Codecs.mp4EncodeVideo(600, 60, w, h, frames,
          moovLast = seed % 2 == 0))
      assert(mp4.frames.length == nf &&
        mp4.frames.zip(frames).forall { case (a, b) =>
          java.util.Arrays.equals(a, b) })
      val spf = 1 + rnd.nextInt(40)
      val samples = Array.fill(nf * spf)(rnd.nextInt(65536).toShort)
      val av = new Codecs.Mp4AvDecoder().decode(
        Codecs.mp4EncodeAv(600, 200, w, h, frames, spf, samples,
          moovLast = seed % 2 == 1))
      assert(av.video.frames.length == nf &&
        av.audio.samples.toSeq == samples.toSeq &&
        av.video.frames.zip(frames).forall { case (a, b) =>
          java.util.Arrays.equals(a, b) })
    }
  }
}
