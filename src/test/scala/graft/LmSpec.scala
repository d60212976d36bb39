package graft

import org.apache.spark.sql.functions._

/** lm_ngram_backoff / lm_perplexity_filter: hand-computed backoff
  * fixture covering all four levels, plus corpus-level invariants. */
class LmSpec extends SparkSpecBase {
  import spark.implicits._

  // train: two 4-token docs; test: one doc exercising every level.
  //   train trigrams: (a b c), (b c d) | (a b c), (b c e)
  //   train bigrams:  ab×2 bc×2 cd ce; unigrams: a×2 b×2 c×2 d e; N=8
  private val docs = Seq(
    (1L, "a b c d", "en"),
    (2L, "a b c e", "en"),
    (10L, "a b c x b c d", "en"))
    .toDF("doc_id", "text", "lang")

  test("stupid backoff hits every level with hand-checked scores") {
    val out = functions.Lm.lmNgramBackoffOn(docs, col("doc_id") < 10L)
      .collect()
    assert(out.length == 1)
    val r = out(0)
    // test trigrams: (a,b,c) lvl3 2/2 | (b,c,x) lvl0 | (c,x,b) lvl1
    // α²·c(b)/N | (x,b,c) lvl2 α·c(bc)/c(b) | (b,c,d) lvl3 1/2
    assert(r.getLong(1) == 5L) // n_tri
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L && r.getLong(4) == 1L)
    val exp = math.floor(1e6 * (2.0 / 2)).toLong +
      0L +
      math.floor(1e6 * (0.4 * 0.4 * 2 / 8)).toLong +
      math.floor(1e6 * (0.4 * 2 / 2)).toLong +
      math.floor(1e6 * (1.0 / 2)).toLong
    assert(r.getLong(5) == exp)
  }

  test("Jelinek-Mercer: hand-checked interpolated scores on the same " +
    "fixture; context availability nests ctx3 <= ctx2 <= ctx1; corpus " +
    "coverage diagnostics bounded by n_tri") {
    val out = functions.Lm.lmJelinekMercerOn(docs, col("doc_id") < 10L)
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 5L) // n_tri
    // contexts available per test trigram (train: c(abc)=2, c(bcd)=1,
    // c(bce)=1; bigrams ab2 bc2 cd ce; unigrams a2 b2 c2 d e, N=8):
    //  (a,b,c): tri+bi+uni | (b,c,x): none (x OOV) | (c,x,b): uni only
    //  (x,b,c): bi (bc) + uni | (b,c,d): tri+bi+uni
    assert(r.getLong(2) == 2L, "n_ctx3") // (a,b,c), (b,c,d)
    assert(r.getLong(3) == 3L, "n_ctx2") // + (x,b,c)
    assert(r.getLong(4) == 4L, "n_ctx1") // + (c,x,b)
    // replay the shared formula in the same double order
    def su(t3: Option[(Long, Long)], b2: Option[(Long, Long)],
        u1: Option[Long]): Long =
      math.floor(1000000.0 * (
        0.5 * t3.map { case (a, b) => a.toDouble / b }.getOrElse(0.0) +
        0.3 * b2.map { case (a, b) => a.toDouble / b }.getOrElse(0.0) +
        0.2 * u1.map(_.toDouble / 8).getOrElse(0.0))).toLong
    val exp =
      su(Some((2L, 2L)), Some((2L, 2L)), Some(2L)) + // (a,b,c)
      su(None, None, None) +                          // (b,c,x)
      su(None, None, Some(2L)) +                      // (c,x,b): c(b)=2
      su(None, Some((2L, 2L)), Some(2L)) +            // (x,b,c)
      // (b,c,d): tri c(bcd)=1/c(bc)=2; bi c(cd)=1/c(c)=2; uni c(d)=1
      su(Some((1L, 2L)), Some((1L, 2L)), Some(1L))
    assert(r.getLong(5) == exp, s"got ${r.getLong(5)} want $exp")
    // corpus: coverage counters bounded and nested
    val c = functions.Lm.lmJelinekMercer(spark, sf)
    assert(c.where(col("n_ctx3") > col("n_ctx2") ||
      col("n_ctx2") > col("n_ctx1") || col("n_ctx1") > col("n_tri") ||
      col("score_micro") < 0L ||
      col("score_micro") > col("n_tri") * 1000000L).count() == 0)
    assert(c.count() > 0)
  }

  test("docs under 3 tokens score no trigrams and are absent") {
    val d = Seq((1L, "a b c", "en"), (10L, "x y", "en"))
      .toDF("doc_id", "text", "lang")
    assert(functions.Lm.lmNgramBackoffOn(d, col("doc_id") < 10L).count() == 0)
  }

  test("corpus run: levels partition n_tri, scores bounded by 1e6 per trigram") {
    val out = functions.Lm.lmNgramBackoff(spark, sf)
    val bad = out.where(col("n_hit3") + col("n_hit2") + col("n_hit1") > col("n_tri") ||
      col("score_micro") > col("n_tri") * 1000000L || col("score_micro") < 0L)
    assert(bad.count() == 0)
    assert(out.count() > 0)
  }

  test("perplexity filter cuts each language into at most 3 buckets with head >= tail") {
    val out = functions.Lm.lmPerplexityFilter(spark, sf).collect()
    val byLang = out.groupBy(_.getString(0))
    byLang.foreach { case (_, rows) =>
      assert(rows.length <= 3)
      val m = rows.map(r => r.getString(1) -> r.getLong(4)).toMap
      for (h <- m.get("head"); t <- m.get("tail"))
        assert(h >= t) // head min avg >= tail min avg
    }
  }

  test("kneser-ney: hand-computed interpolated score on a seen trigram") {
    // train: "a b c", "a b d"
    //   c3: (a,b,c)=1 (a,b,d)=1; c2: (a,b)=2 (b,c)=1 (b,d)=1; bt=3
    //   t12(a,b)=2; cc23(b,c)=1; m2(b)=2; t2(b)=2; cb3(c)=1
    // test "a b c": P1 = 1/3
    //   P2 = max(1-.75,0)/2 + (.75*2/2)*(1/3) = .125 + .25 = .375
    //   P3 = max(1-.75,0)/2 + (.75*2/2)*.375  = .125 + .28125 = .40625
    val d = Seq((1L, "a b c", "en"), (2L, "a b d", "en"),
      (10L, "a b c", "en")).toDF("doc_id", "text", "lang")
    val out = functions.Lm.lmKneserNeyOn(d, col("doc_id") < 10L).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 1L) // n_tri
    assert(r.getLong(2) == 1L) // lvl 3
    assert(r.getLong(5) == 406250L)
  }

  test("kneser-ney: unseen context backs off to the continuation chain") {
    // train as above; test "x b c": (x,b,c) has no (x,b) bigram ->
    // score = P2 = .375; lvl = 2 (cc23(b,c) exists)
    val d = Seq((1L, "a b c", "en"), (2L, "a b d", "en"),
      (10L, "x b c", "en")).toDF("doc_id", "text", "lang")
    val r = functions.Lm.lmKneserNeyOn(d, col("doc_id") < 10L).collect()(0)
    assert(r.getLong(3) == 1L) // n_hit2
    assert(r.getLong(5) == 375000L)
    // fully OOV tail word: only the (never-seen) continuation mass -> 0
    val d2 = Seq((1L, "a b c", "en"), (2L, "a b d", "en"),
      (10L, "a b z", "en")).toDF("doc_id", "text", "lang")
    val r2 = functions.Lm.lmKneserNeyOn(d2, col("doc_id") < 10L).collect()(0)
    // P3 = .125/2-part: max(0-.75,0)/2 + (.75*2/2)*P2(z)
    //   P2(z) = max(0-.75,0)/2 + (.75*2/2)*(0/3) = 0 -> score = 0
    assert(r2.getLong(2) == 0L)
    assert(r2.getLong(5) == 0L)
  }

  test("kneser-ney corpus run: probabilities stay in [0, 1e6] per trigram " +
    "and levels partition n_tri") {
    val out = functions.Lm.lmKneserNey(spark, sf)
    val bad = out.where(
      col("n_hit3") + col("n_hit2") + col("n_hit1") > col("n_tri") ||
      col("score_micro") > col("n_tri") * 1000000L || col("score_micro") < 0L)
    assert(bad.count() == 0)
    assert(out.count() > 0)
  }

  test("rho select: rho equals an independent two-model replay and the " +
    "per-lang selected quarter picks the TOP rho band") {
    val docs = Tables.documents(spark, sf)
    val out = functions.Lm.corpusRhoSelectOn(docs)
      .localCheckpoint(true)
    assert(out.count() > 0)
    // independent replay: score candidates under both models directly
    val d = docs.withColumn("bucket",
      functions.Text.polyHash(col("text")) % 100)
    val main = functions.Lm.lmNgramBackoffOn(
      d.where(col("bucket") < 70 || col("bucket") >= 80),
      col("bucket") < 70)
      .select(col("doc_id"), expr("score_micro div n_tri").as("em"))
    val ho = functions.Lm.lmNgramBackoffOn(
      d.where(col("bucket") >= 70), col("bucket") < 80)
      .select(col("doc_id"), expr("score_micro div n_tri").as("eh"))
    val mismatch = out.join(main, "doc_id").join(ho, "doc_id")
      .where(col("avg_main_micro") =!= col("em") ||
        col("avg_ho_micro") =!= col("eh") ||
        col("rho_micro") =!= col("eh") - col("em"))
    assert(mismatch.count() == 0)
    // selection is a per-lang prefix of the (rho desc, doc_id) order:
    // no unselected doc may strictly dominate a selected one
    val sel = out.where(col("selected")).groupBy("lang")
      .agg(min(col("rho_micro")).as("lo"), count(lit(1)).as("ns"))
    val uns = out.where(!col("selected")).groupBy("lang")
      .agg(max(col("rho_micro")).as("hi"), count(lit(1)).as("nu"))
    val cross = sel.join(uns, "lang").where(col("hi") > col("lo"))
    assert(cross.count() == 0)
    // ntile(4): selected band is the leading quarter (±1 per lang)
    val offQuarter = sel.join(uns, "lang")
      .where(abs(col("ns") * 4 - (col("ns") + col("nu"))) >= 4)
    assert(offQuarter.count() == 0)
  }

  test("count prune: hand corpus — cutoff 1 keeps everything, cutoff 2 " +
    "keeps exactly the repeated trigram's types and mass") {
    // doc1 trigrams: (a b c) (b c a) (c a b) (a b c) -> abc:2 bca:1 cab:1
    // doc2 trigrams: (a b c) (b c d) (c d e) (d e f) -> abc:+1 rest 1
    // table: abc=3, bca=cab=bcd=cde=def=1 -> 6 types, mass 8
    val docs = Seq((1L, "en", "a b c a b c"), (2L, "en", "a b c d e f"))
      .toDF("doc_id", "lang", "text")
    val out = functions.Lm.lmCountPruneOn(docs, lit(true))
      .select("cutoff", "n_types", "n_types_kept", "mass_total",
        "mass_kept", "types_kept_ppm", "mass_kept_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 6L, 6L, 8L, 8L, 1000000L, 1000000L),
      (2L, 6L, 1L, 8L, 3L, 166666L, 375000L),
      (4L, 6L, 0L, 8L, 0L, 0L, 0L),
      (8L, 6L, 0L, 8L, 0L, 0L, 0L)))
  }

  test("count prune on the corpus: curves are monotone in the cutoff " +
    "and mass retention dominates type retention (Zipf)") {
    val out = functions.Lm.lmCountPrune(spark, sf)
      .select("cutoff", "n_types_kept", "mass_kept", "types_kept_ppm",
        "mass_kept_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.size == 4)
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3)
    }
    // dropping rare types always keeps proportionally more mass
    out.foreach(r => assert(r._5 >= r._4))
  }
}
