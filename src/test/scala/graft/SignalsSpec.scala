package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the statistical-signal operators (each also
  * has a DuckDB oracle; these pin the intended meaning directly). */
class SignalsSpec extends SparkSpecBase {
  import spark.implicits._

  test("text_entropy: known closed-form values and corpus bounds") {
    val docs = Seq(
      (1L, "aaaa"),       // one symbol: H = 0
      (2L, "abab"),       // two equiprobable symbols: H = 1 bit
      (3L, "abcd"))       // four equiprobable symbols: H = 2 bits
      .toDF("doc_id", "text")
    val got = functions.Signals.textEntropyOn(docs)
      .select("doc_id", "entropy_bits").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0))
    // corpus-wide: 0 <= H <= log2(alphabet size)
    val e = functions.Signals.textEntropy(spark, sf)
    assert(e.filter(col("entropy_bits") < 0 ||
      col("entropy_bits") > log2(col("n_distinct")) + 1e-9).count() == 0)
  }

  test("text_pmi: integer score is monotone in the true PMI on the corpus") {
    val p = functions.Signals.textPmi(spark, sf).collect()
    assert(p.length == 50)
    // score_ppm = 1e6 * P(w1w2)/(P(w1)P(w2)); every top collocation
    // should beat independence (score > 1e6 means positively associated)
    // and the list must be sorted by score descending
    val scores = p.map(_.getLong(3))
    assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
    // min-support honored
    assert(p.forall(_.getLong(2) >= 5))
  }

  test("feat_scale: per-dimension outputs span exactly [0, 1e6] on the corpus") {
    val sc = functions.Signals.featScale(spark, sf)
      .select(col("vec_id"), split(col("scaled"), ",").cast("array<long>")
        .as("v"))
    val dims = sc.select(posexplode(col("v")))
      .groupBy("pos").agg(min("col").as("mn"), max("col").as("mx"))
    // min-max scaling pins each non-constant dimension's extremes
    assert(dims.filter(col("mn") =!= 0L).count() == 0)
    // integer floor division: max lands in [1e6 - 1, 1e6] ... exactly 1e6
    // for the row that attains the max (ratio = 1 exactly)
    assert(dims.filter(col("mx") =!= 1000000L).count() == 0)
    // row count preserved, width preserved
    assert(sc.count() == Tables.embeddings(spark, sf).count())
    assert(sc.filter(size(col("v")) =!= 64).count() == 0)
  }

  test("feat_project: closed-form signs on a unit vector; linearity " +
    "of the projection on the corpus") {
    import spark.implicits._
    // one-dim embedding [1.0]: q = 2^20, and the sign of column j is
    // the parity of 97j + 31 — odd constant, so signs alternate +,-
    val one = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    val row = functions.Signals.featProjectOn(one).collect()(0)
    val q = 1048576L
    (0 until functions.Signals.ProjDims).foreach { j =>
      val want = if (j % 2 == 0) q else -q
      assert(row.getLong(j + 1) == want, s"dim $j")
    }
    // linearity: project(2x) = 2 * project(x) exactly (integer dot
    // products of exactly-representable quantized coordinates)
    val x = Seq((1L, Seq(0.25f, -0.5f, 0.125f))).toDF("vec_id", "embedding")
    val x2 = Seq((1L, Seq(0.5f, -1.0f, 0.25f))).toDF("vec_id", "embedding")
    val px = functions.Signals.featProjectOn(x).collect()(0)
    val px2 = functions.Signals.featProjectOn(x2).collect()(0)
    (0 until functions.Signals.ProjDims).foreach { j =>
      assert(px2.getLong(j + 1) == 2 * px.getLong(j + 1), s"dim $j")
    }
    // corpus shape: one row per vector, all 8 projection columns
    val p = functions.Signals.featProject(spark, sf)
    assert(p.columns.length == 1 + functions.Signals.ProjDims)
    assert(p.count() == Tables.embeddings(spark, sf).count())
  }

  test("feat_winsorize: hand-computed sixteenth-percentile clamp on " +
    "1..16; corpus clamp counts bounded by the tail mass") {
    import spark.implicits._
    // cents 100..1600: lo = 100*(1/16) + 200*(15/16) = 193.75,
    // hi = 1500*(15/16) + 1600*(1/16) = 1506.25; one value clamps on
    // each side and the winsorized sum is exactly 13600
    val df = (1 to 16).map(i => ("A", i.toDouble)).toDF("g", "v")
    val row = functions.Signals.featWinsorizeOn(df, "v", "g").collect()(0)
    assert(row.getLong(1) == 16L)          // n
    assert(row.getLong(2) == 1L)           // n_lo
    assert(row.getLong(3) == 1L)           // n_hi
    assert(row.getDouble(4) == 193.75)     // lo
    assert(row.getDouble(5) == 1506.25)    // hi
    assert(row.getDouble(6) == 13600.0)    // sum_w
    // corpus: each group clamps ~1/16 of its rows per side — at most
    // floor((n-1)/16) + 1 values sit strictly outside an interpolated
    // sixteenth-quantile, i.e. n/16 + 1
    val w = functions.Signals.featWinsorize(spark, sf)
    assert(w.filter(col("n_lo") * 16 > col("n") + 16).count() == 0)
    assert(w.filter(col("n_hi") * 16 > col("n") + 16).count() == 0)
    assert(w.count() > 0)
  }

  test("feat_pca_scatter: valid scatter (PSD diagonal, Cauchy-Schwarz) and the " +
    "driver-side power iteration finds the max-variance direction") {
    val rows = functions.Signals.featPcaScatter(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (i, j, v) => (i.toInt, j.toInt, v) }
    val d = 64
    assert(rows.length == d * (d + 1) / 2)
    val s = Array.ofDim[Double](d, d)
    rows.foreach { case (i, j, v) => s(i)(j) = v.toDouble; s(j)(i) = v.toDouble }
    // diagonal = centered sum of squares: nonnegative, and every
    // off-diagonal obeys |s_ij| <= sqrt(s_ii s_jj) (Cauchy-Schwarz)
    for (i <- 0 until d) assert(s(i)(i) >= 0.0)
    for (i <- 0 until d; j <- 0 until d)
      assert(s(i)(j) * s(i)(j) <= s(i)(i) * s(j)(j) * (1 + 1e-12))
    // the d x d eigensolve is driver-side by design: power-iterate
    def matvec(u: Array[Double]) =
      Array.tabulate(d)(i => (0 until d).map(j => s(i)(j) * u(j)).sum)
    def rayleigh(u: Array[Double]) = {
      val su = matvec(u)
      (0 until d).map(i => u(i) * su(i)).sum /
        (0 until d).map(i => u(i) * u(i)).sum
    }
    var u = Array.fill(d)(1.0)
    for (_ <- 1 to 100) {
      val y = matvec(u)
      val n = math.sqrt(y.map(x => x * x).sum)
      u = y.map(_ / n)
    }
    val lambda1 = rayleigh(u)
    // the dominant direction beats every coordinate axis (whose
    // Rayleigh quotient is exactly the diagonal entry)
    for (i <- 0 until d) assert(lambda1 >= s(i)(i) - 1e-6,
      s"lambda1 $lambda1 < s($i)($i) ${s(i)(i)}")
  }
  test("target encode: shrinkage pulls rare categories to the prior, m=0 is the raw mean") {
    import spark.implicits._
    // big category at mean 100.00, rare category at mean 500.00;
    // global mean (100*10 + 500) / 11
    val df = ((1 to 10).map(i => ("big", 100.0)) :+ ("rare", 500.0))
      .toDF("k0", "y0")
    val enc = functions.Signals.featTargetEncodeOn(df, "k0", "y0", m = 20L)
      .select("k", "enc_cents").as[(String, Long)].collect().toMap
    val raw = functions.Signals.featTargetEncodeOn(df, "k0", "y0", m = 0L)
      .select("k", "enc_cents").as[(String, Long)].collect().toMap
    assert(raw("big") == 10000L && raw("rare") == 50000L)
    val prior = (10 * 10000L + 50000L) / 11
    // both shrink toward the prior; the rare one lands much closer
    assert(enc("big") > 10000L && enc("big") < prior)
    assert(enc("rare") < 50000L && enc("rare") > prior)
    assert((enc("rare") - prior).abs * 2 < (50000L - prior).abs)
    // catalog form: 25 nations, encodings bracketed by min/max means
    val cat = functions.Signals.featTargetEncode(spark, sf).cache()
    assert(cat.count() == 25)
    val mn = cat.agg(org.apache.spark.sql.functions.min(col("mean_cents")))
      .as[Long].head()
    val mx = cat.agg(org.apache.spark.sql.functions.max(col("mean_cents")))
      .as[Long].head()
    assert(cat.filter(col("enc_cents") < mn - 1 ||
      col("enc_cents") > mx + 1).count() == 0)
    cat.unpersist()
  }
}
