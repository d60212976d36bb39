package graft
// (BPE merge-induction specs live here with the other token-stream ops)

import org.apache.spark.sql.functions._

/** text_chunk / text_lm_score properties: coverage and overlap of the
  * chunking, and model-level sanity of the bigram LM score. */
class ChunkLmSpec extends SparkSpecBase {
  import spark.implicits._

  test("chunking covers every token: stride == window partitions exactly") {
    val docs = Seq((1L, (1 to 150).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = functions.Text.textChunkOn(docs, window = 64, stride = 64)
      .orderBy("chunk_id").collect()
    assert(out.length == 3) // 64 + 64 + 22
    val rebuilt = out.map(_.getString(2)).mkString(" ")
    assert(rebuilt == (1 to 150).map(i => s"t$i").mkString(" "))
    assert(out.map(_.getLong(3)).toSeq == Seq(64L, 64L, 22L))
  }

  test("overlapping chunks share exactly window - stride tokens") {
    val docs = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = functions.Text.textChunkOn(docs, window = 64, stride = 48)
      .orderBy("chunk_id").collect()
    assert(out.length == 2)
    val c0 = out(0).getString(2).split(" ")
    val c1 = out(1).getString(2).split(" ")
    assert(c0.takeRight(16).sameElements(c1.take(16)))
    // every token appears in some chunk
    assert((c0 ++ c1).distinct.length == 100)
  }

  test("short doc yields one short chunk; invalid stride rejected") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = functions.Text.textChunkOn(docs).collect()
    assert(out.length == 1 && out(0).getString(2) == "a b c" &&
      out(0).getLong(3) == 3L)
    intercept[IllegalArgumentException] {
      functions.Text.textChunkOn(docs, window = 8, stride = 9)
    }
  }

  test("lm score: identical docs score identically; repetitive text beats " +
    "unseen-transition text under the corpus model") {
    val docs = Seq(
      (1L, "the dog ran fast the dog ran fast the dog ran fast"),
      (2L, "the dog ran fast the dog ran fast the dog ran fast"),
      (3L, "fast the ran dog dog fast the ran")) // unseen transitions
      .toDF("doc_id", "text")
    val out = functions.Text.textLmScoreOn(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1) == out(2))
    assert(out(1) > out(3)) // high-probability transitions score higher
    assert(out.values.forall(v => v < 0.0 && !v.isNaN && !v.isInfinite))
  }

  test("BPE merges: hand-checked rounds with lexicographic tie-break " +
    "and greedy remerge") {
    // 'low lower lowest': round 1 ties (l,o) and (o,w) at 3 — the
    // (cnt desc, w1, w2) order picks (l,o); round 2 counts over the
    // MERGED arrays pick (lo,w); round 3 (low,e)
    val docs = Seq((0L, "low lower lowest")).toDF("doc_id", "text")
    val got = functions.Text.textBpeMergesOn(docs)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "l", "o", 3L), (2, "lo", "w", 3L),
      (3, "low", "e", 2L)), got.toString)
  }

  test("BPE merges: a round with no pairs left degrades to fewer rows") {
    // after (a,a) then (a,b) every word is a single symbol — round 3
    // has no pair and must emit nothing rather than fail
    val docs = Seq((0L, "aa aa ab")).toDF("doc_id", "text")
    val got = functions.Text.textBpeMergesOn(docs)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "a", 2L), (2, "a", "b", 1L)), got.toString)
  }

  test("BPE encode: hand-checked symbol counts after the merge rounds") {
    // merges on 'low lower lowest' are (l,o), (lo,w), (low,e) — and
    // the encoder applies ALL three, including the last:
    // low -> [low] (1), lower -> [lowe, r] (2),
    // lowest -> [lowe, s, t] (3) => 3 tokens, 6 symbols
    val docs = Seq((0L, "low lower lowest")).toDF("doc_id", "text")
    val got = functions.Text.textBpeEncodeOn(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 6L)), got.toString)
  }

  test("BPE encode bounds: tokens <= symbols <= non-space chars, " +
    "and more merges never grow the encoding") {
    import org.apache.spark.sql.functions.{col, length, regexp_replace}
    val docs = Tables.documents(spark, sf)
    val chars = docs.select(col("doc_id"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("n_ch"))
    val e3 = functions.Text.textBpeEncodeOn(docs)
    val joined = e3.join(chars, "doc_id").collect()
    joined.foreach { r =>
      val (nTok, nSym, nCh) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTok <= nSym && nSym <= nCh, r.toString)
    }
    val e1 = functions.Text.textBpeEncodeOn(docs, merges = 1)
      .withColumnRenamed("n_symbols", "n_symbols_1")
    val cmp = e3.join(e1.select("doc_id", "n_symbols_1"), "doc_id")
      .filter(col("n_symbols") > col("n_symbols_1")).count()
    assert(cmp == 0L, s"$cmp docs grew with more merges")
  }

  test("bm25: saturation, length normalization, and idf ordering on a fixture") {
    // q: one query, one term "x". Docs: d1 has x once in 4 tokens,
    // d2 has x three times in 4 tokens, d3 has x once in 12 tokens.
    val docs = Seq(
      (1L, "x a b c"),
      (2L, "x x x c"),
      (3L, "x a b c d e f g h i j k")).toDF("doc_id", "text")
    val out = functions.Text.textBm25On(docs, Seq(0 -> Seq("x")), k = 10)
      .orderBy("rnk")
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toSeq
    // tf wins over baseline, and the long doc is length-penalized
    // below the short one at equal tf
    assert(out.map(_._1) == Seq(2L, 1L, 3L), out.toString)
    // saturation: tf=3 scores less than 3x the tf=1 score
    val byDoc = out.toMap
    assert(byDoc(2L) < 3 * byDoc(1L))
  }

  test("bm25 on the corpus: matched docs contain a query term, ranks dense") {
    val out = functions.Text.textBm25(spark, sf).cache()
    // every (query, rnk) pair unique and dense from 1
    val perQ = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"),
        min(col("rnk")).as("mn"))
    assert(perQ.filter(col("mx") =!= col("n") || col("mn") =!= 1).count() == 0)
    // scores nonincreasing in rank within a query
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rnk")
    assert(out.withColumn("prev", lag(col("score_micro"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") < col("score_micro"))
      .count() == 0)
    // n_terms never exceeds the query's term count (max 3 in catalog)
    assert(out.filter(col("n_terms") > 3).count() == 0)
    out.unpersist()
  }

  test("lm score on the corpus: one row per >=2-token doc, all finite") {
    val out = functions.Text.textLmScore(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(out.count() == nDocs)
    assert(out.filter(col("avg_logprob").isNull ||
      col("avg_logprob") >= 0.0).count() == 0)
    out.unpersist()
  }
  test("gopher rules: each rule fails alone on its crafted doc, mask encodes it") {
    val docs = Seq(
      // all four rules pass
      (1L, "the cat and the dog ran to a house in town quickly"),
      // too short -> r_count (mask 1); short docs also trip r_stop/r_rep
      (2L, "hello world"),
      // 12 long tokens, stopwords present but mean len > 8 -> r_len | ...
      (3L, "the and " + (1 to 10).map(_ => "verylongtoken").mkString(" ")),
      // no stopwords -> r_stop (mask 4)
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // repetition: c_max = 4 of 12, others pass -> r_rep (mask 8)
      (5L, "xx xx xx xx the and aa bb cc dd ee ff"))
      .toDF("doc_id", "text")
    val got = functions.Text.qualityGopherOn(docs)
      .orderBy("doc_id")
      .select("doc_id", "keep", "reason_mask").as[(Long, Boolean, Int)]
      .collect().toSeq
    assert(got(0) == ((1L, true, 0)), got(0).toString)
    assert(!got(1)._2 && (got(1)._3 & 1) == 1)
    assert(!got(2)._2 && (got(2)._3 & 2) == 2)
    assert(got(3) == ((4L, false, 4)), got(3).toString)
    assert(got(4) == ((5L, false, 8)), got(4).toString)
    // corpus: keep iff mask == 0
    val out = functions.Text.qualityGopher(spark, sf)
    assert(out.filter(col("keep") =!= (col("reason_mask") === 0)).count() == 0)
  }

  test("quality_logreg: 8-step distilled classifier beats majority class by a " +
    "wide margin and is bit-deterministic across runs") {
    import spark.implicits._
    val out = functions.Text.qualityLogreg(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val n = out.length.toDouble
    val acc = out.count(r => r._2 == r._4) / n
    val majority = math.max(out.count(_._2 == 1L), out.count(_._2 == 0L)) / n
    info(f"logreg accuracy $acc%.3f vs majority $majority%.3f over ${n.toInt} docs")
    assert(acc >= 0.95 && acc > majority + 0.2,
      f"distilled classifier failed to learn: acc $acc%.3f majority $majority%.3f")
    // probabilities are valid ppm and the threshold defines pred
    assert(out.forall(r => r._3 >= 0 && r._3 <= 1000000 &&
      (r._4 == 1L) == (r._3 >= 500000)))
    // the whole train+score chain is deterministic: a second run is
    // bit-identical (quantized gradients + integer weights)
    val again = functions.Text.qualityLogreg(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("quality_auc: midrank tie handling replayed by hand; perfect and " +
    "inverted rankings hit the endpoints; one-class gates to NULL") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Long)]): org.apache.spark.sql.Row =
      functions.Text.qualityAucOn(
        rows.toDF("p_ppm", "y")).collect()(0)
    // scores 10,20,20,30 / labels 0,0,1,1: positive midranks 2.5 + 4
    // -> U1 = 3.5 of 4 -> AUC .875, gini .75
    val r = auc(Seq((10L, 0L), (20L, 0L), (20L, 1L), (30L, 1L)))
    assert(r.getAs[Long]("u1_x2") == 7L)
    assert(r.getAs[Long]("auc_ppm") == 875000L)
    assert(r.getAs[Long]("gini_pm") == 750000L)
    // perfect separation -> 1e6; inverted -> 0
    assert(auc(Seq((1L, 0L), (2L, 0L), (3L, 1L)))
      .getAs[Long]("auc_ppm") == 1000000L)
    assert(auc(Seq((3L, 0L), (2L, 0L), (1L, 1L)))
      .getAs[Long]("auc_ppm") == 0L)
    // a single class present -> NULL gate, never a division by zero
    val one = auc(Seq((1L, 1L), (2L, 1L)))
    assert(one.isNullAt(one.fieldIndex("auc_ppm")))
    // corpus: the distilled classifier's ranking quality is near-perfect
    // (documented 0.99 accuracy on a separable teacher rule)
    val c = functions.Text.qualityAuc(spark, sf).collect()(0)
    assert(c.getAs[Long]("auc_ppm") >= 900000L)
  }

  test("quality_rater_kappa: confusion counts reconcile with the scored " +
    "relation and kappa replays the closed form by hand") {
    import spark.implicits._
    val sc = functions.Text.qualityLogreg(spark, sf)
      .select("y", "pred").as[(Long, Long)].collect()
    val n = sc.length.toLong
    val n11 = sc.count { case (y, p) => y == 1 && p == 1 }.toLong
    val n10 = sc.count { case (y, p) => y == 1 && p == 0 }.toLong
    val n01 = sc.count { case (y, p) => y == 0 && p == 1 }.toLong
    val n00 = sc.count { case (y, p) => y == 0 && p == 0 }.toLong
    val r = functions.Text.qualityRaterKappa(spark, sf).collect()(0)
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("n11") == n11 &&
      r.getAs[Long]("n10") == n10 && r.getAs[Long]("n01") == n01 &&
      r.getAs[Long]("n00") == n00)
    val pe = BigInt(n11 + n10) * (n11 + n01) + BigInt(n01 + n00) * (n10 + n00)
    assert(BigInt(r.getAs[Long]("po_ppm")) ==
      BigInt(n11 + n00) * 1000000 / n)
    assert(BigInt(r.getAs[Long]("pe_ppm")) ==
      pe * 1000000 / (BigInt(n) * n))
    if (BigInt(n) * n > pe) {
      val want = (BigInt(n) * (n11 + n00) - pe) * 1000000 /
        (BigInt(n) * n - pe)
      assert(BigInt(r.getAs[Long]("kappa_ppm")) == want)
      // the distilled filter reproduces the labeling rule far beyond
      // chance (documented near-separable teacher)
      assert(r.getAs[Long]("kappa_ppm") > 500000L)
    }
  }

  test("quality_ece: reliability bins replayed by hand; p=1e6 caps into " +
    "bin 9; corpus bins bounded and deterministic") {
    import spark.implicits._
    // calibrated bin (4 rows at p=.25, one positive) + anti-calibrated
    // bin (2 rows at p=.9, zero positives): ece = (4*0 + 2*900000)/6
    val r = functions.Text.qualityEceOn(Seq(
        (250000L, 1L), (250000L, 0L), (250000L, 0L), (250000L, 0L),
        (900000L, 0L), (900000L, 0L)).toDF("p_ppm", "y"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (2L, 4L, 250000L, 250000L, 0L, 300000L, 900000L),
      (9L, 2L, 900000L, 0L, 900000L, 300000L, 900000L)))
    // the p_ppm = 1e6 endpoint folds into bin 9, not a bin 10
    val cap = functions.Text.qualityEceOn(Seq((1000000L, 1L))
        .toDF("p_ppm", "y")).collect()(0)
    assert(cap.getAs[Long]("bin") == 9L &&
      cap.getAs[Long]("gap_ppm") == 0L)
    // corpus: <= 10 bins, every rate a valid ppm, mass adds up, and
    // the memoized scored relation makes a second run bit-identical
    val c = functions.Text.qualityEce(spark, sf).cache()
    val rows = c.collect()
    assert(rows.length <= 10 && rows.forall(x =>
      x.getAs[Long]("bin") >= 0 && x.getAs[Long]("bin") <= 9 &&
      x.getAs[Long]("mean_p_ppm") >= 0 &&
      x.getAs[Long]("mean_p_ppm") <= 1000000 &&
      x.getAs[Long]("frac_pos_ppm") >= 0 &&
      x.getAs[Long]("frac_pos_ppm") <= 1000000 &&
      x.getAs[Long]("ece_ppm") >= 0 &&
      x.getAs[Long]("ece_ppm") <= x.getAs[Long]("mce_ppm")))
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == functions.Text.qualityLogreg(spark, sf).count())
  }

  test("quality_threshold_sweep: operating points replayed by hand; " +
    "one-class gates recall/F1 to NULL; corpus curve is monotone") {
    import spark.implicits._
    val r = functions.Text.qualityThresholdSweepOn(Seq(
        (10L, 0L), (20L, 0L), (20L, 1L), (30L, 1L)).toDF("p_ppm", "y"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // thr 20 F1: 2*666666*1e6 / 1666666 floors to 799999
    assert(r == Seq(
      (10L, 4L, 2L, 2L, 500000L, 1000000L, 666666L),
      (20L, 3L, 2L, 2L, 666666L, 1000000L, 799999L),
      (30L, 1L, 1L, 2L, 1000000L, 500000L, 666666L)))
    // no positives anywhere: precision 0, recall/F1 NULL-gated
    val none = functions.Text.qualityThresholdSweepOn(Seq(
        (10L, 0L), (20L, 0L)).toDF("p_ppm", "y")).collect()
    assert(none.forall(x => x.getAs[Long]("precision_ppm") == 0L &&
      x.isNullAt(x.fieldIndex("recall_ppm")) &&
      x.isNullAt(x.fieldIndex("f1_ppm"))))
    // corpus: kept/tp/recall are non-increasing in the threshold and
    // the lowest threshold keeps everything (recall 1e6)
    val c = functions.Text.qualityThresholdSweep(spark, sf)
      .orderBy("thr_ppm").collect()
    assert(c.nonEmpty)
    val kept = c.map(_.getAs[Long]("kept"))
    val tp = c.map(_.getAs[Long]("tp"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a >= b })
    assert(tp.zip(tp.tail).forall { case (a, b) => a >= b })
    assert(c.head.getAs[Long]("recall_ppm") == 1000000L)
  }

  test("L4m feature hashing: hand buckets/signs; mass bounded by token " +
      "count; fixed space at corpus scale") {
    // polyHash('a') = 97, bucket 97, sign bit (97 div 256)%2 = 0 -> +1
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val got = functions.Text.textHashedFeaturesOn(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 97L, 2L), (1L, 98L, 1L)))
    // corpus: buckets bounded to 2^8, |w| mass never exceeds tokens,
    // and the featurization is partitioning-invariant
    val c = functions.Text.textHashedFeatures(spark, sf).cache()
    assert(c.filter(col("bucket") < 0 || col("bucket") >= 256).count() == 0)
    val mass = c.agg(sum(abs(col("w")))).as[Long].head()
    val toks = functions.Text.textTokens(spark, sf)
      .agg(sum("n_tokens")).as[Long].head()
    assert(mass <= toks && mass > 0)
    val again = functions.Text.textHashedFeaturesOn(
      Tables.documents(spark, sf).repartition(7))
    assert(c.exceptAll(again).count() == 0 && again.exceptAll(c).count() == 0)
    c.unpersist()
  }

  test("BPE fertility: per-language sums reconcile with the per-doc " +
    "encode relation; ratio is the exact floor milli") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val docs = Tables.documents(spark, sf)
    val fert = functions.Text.textBpeFertilityOn(docs).collect()
    val perDoc = functions.Text.textBpeEncodeOn(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(fsum("n_tokens").as("w"), fsum("n_symbols").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(fert.nonEmpty)
    fert.foreach { r =>
      val (w, s) = perDoc(r.getString(0))
      assert(r.getLong(2) === w && r.getLong(3) === s)
      assert(r.getLong(4) === s * 1000 / w)
      assert(r.getLong(4) >= 1000L) // >= 1 symbol per word always
    }
  }

  test("collocations: planted pair ranks first with hand-computed lift; " +
    "hapax pairs never surface") {
    // "new york" x 6 as its own docs, plus filler tokens that also
    // appear 6 times each but never adjacently to the same partner
    // more than once -> only (new, york) and filler pairs with
    // support; filler bigrams are all distinct (support 1 < 5).
    val docs = (1L to 6L).map(i => (i, "new york")) ++
      (7L to 12L).map(i => (i, s"a${i} b${i}"))
    val out = functions.Text.textCollocationsOn(
      docs.toDF("doc_id", "text")).collect()
    // tokens T = 24, bigrams B = 12; c(new)=c(york)=6, c12=6
    // lift_ppm = 1e6 * 6 * 24 * 24 / (12 * 6 * 6) = 8_000_000
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "new" && r.getString(1) == "york")
    assert(r.getLong(2) == 6L && r.getLong(3) == 8000000L)
  }

  test("collocations: independent pair lands at lift ~1e6, dominated by " +
    "an associated pair") {
    // "x y" always together (10 times); "p q" co-occur 5 of the 20
    // times p appears -> lift(p,q) < lift(x,y)
    val docs = (1L to 10L).map(i => (i, "x y")) ++
      (11L to 15L).map(i => (i, "p q")) ++
      (16L to 30L).map(i => (i, s"p z${i}")) ++
      (31L to 45L).map(i => (i, s"w${i} q"))
    val out = functions.Text.textCollocationsOn(docs.toDF("doc_id", "text"))
      .select("w1", "w2", "lift_ppm").as[(String, String, Long)]
      .collect().toSeq
    val m = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(m.contains(("x", "y")) && m.contains(("p", "q")))
    assert(m(("x", "y")) > m(("p", "q")))
  }

  test("quality kappa: chance-level, perfect, inverse and degenerate " +
    "confusion matrices hit 0, 1, -1 and NULL") {
    def doc(id: Long, nChars: Long, nToks: Int) =
      (id, Seq.fill(nToks)("w").mkString(" "), nChars)
    def kap(rows: (Long, String, Long)*) =
      functions.Text.qualityKappaOn(
        rows.toDF("doc_id", "text", "n_chars")).collect()(0)
    // one doc per confusion cell -> agreement exactly at chance
    val r0 = kap(doc(1, 500, 50), doc(2, 300, 2),
      doc(3, 100, 45), doc(4, 50, 1))
    assert((r0.getLong(0), r0.getLong(1)) === ((4L, 2L)))
    assert((r0.getLong(4), r0.getLong(5)) === ((0L, 8L)))
    assert(r0.getDouble(6) === 0.0)
    // perfect agreement -> 1; perfect disagreement -> -1
    assert(kap(doc(1, 500, 50), doc(4, 50, 1)).getDouble(6) === 1.0)
    assert(kap(doc(2, 300, 2), doc(3, 100, 45)).getDouble(6) === -1.0)
    // both annotators constant -> pe = 1 -> NULL gate
    assert(kap(doc(1, 500, 50), doc(5, 600, 60)).isNullAt(6))
  }

  test("quality filter funnel: hand docs — each rule charged only its " +
    "marginal removals; a doc failing two rules is charged to the first") {
    // d1 passes all; d2 fails count (3 tokens) AND stop -> charged to
    // count; d3 passes count/len, fails stop; d4 passes count/len/stop,
    // fails rep (one token repeated > 1/4 of 20)
    val stop6 = "the and for are with that"
    val docs = Seq(
      (1L, s"$stop6 alpha beta gamma delta epsilon zeta " +
        "eta theta iota kappa"),                            // 16 tokens
      (2L, "xx yy zz"),                                     // fails count
      (3L, "alpha beta gamma delta epsilon zeta eta theta " +
        "iota kappa lam mu"),                               // fails stop
      (4L, s"$stop6 rep rep rep rep rep rep rep rep " +
        "rep rep rep rep rep rep"))                         // fails rep
      .toDF("doc_id", "text")
    val out = functions.Text.qualityFilterFunnelOn(docs)
      .select("stage_id", "rule", "n_in", "n_removed", "n_out")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "count", 4L, 1L, 3L),
      (2L, "len", 3L, 0L, 3L),
      (3L, "stop", 3L, 1L, 2L),
      (4L, "rep", 2L, 1L, 1L)))
  }

  test("quality filter funnel on the corpus: conservation across rules " +
    "and the final survivor count equals quality_gopher's keeps") {
    val out = functions.Text.qualityFilterFunnel(spark, sf)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    out.sliding(2).foreach { case Seq(a, b) => assert(a._5 == b._3) }
    out.foreach(r => assert(r._3 - r._4 == r._5))
    val keeps = functions.Text.qualityGopher(spark, sf)
      .where(col("keep")).count()
    assert(out.last._5 == keeps)
  }

  test("js divergence: identical slices score exactly zero; disjoint " +
    "slices are symmetric and the rows sum to the riding total") {
    val a = Seq((1L, "x y z"), (2L, "x y")).toDF("doc_id", "text")
    val same = functions.Text.textJsDivergenceOn(a, a).collect()
    assert(same.nonEmpty)
    assert(same.forall(r => r.getAs[Long]("js_nano") == 0L &&
      r.getAs[Long]("js_total_nano") == 0L))
    val b = Seq((3L, "p q"), (4L, "p")).toDF("doc_id", "text")
    val ab = functions.Text.textJsDivergenceOn(a, b).collect()
    val ba = functions.Text.textJsDivergenceOn(b, a).collect()
    val totAb = ab.head.getAs[Long]("js_total_nano")
    assert(totAb > 0L)
    assert(totAb == ba.head.getAs[Long]("js_total_nano"))
    // the vocabulary fits inside the top-k cut here, so the visible
    // rows must sum to the full-vocab total
    assert(ab.map(_.getAs[Long]("js_nano")).sum == totAb)
  }

  test("uncertainty sampling: hand margins select the boundary docs per " +
    "language; no unselected doc is strictly closer to the boundary") {
    // synthetic scored relation: margins decided directly
    val scored = Seq(
      (1L, 1L, 500000L), (2L, 0L, 500001L), (3L, 1L, 999999L),
      (4L, 0L, 100L), (5L, 1L, 480000L),
      (10L, 1L, 700000L), (11L, 0L, 300001L))
      .toDF("doc_id", "y", "p_ppm")
    val langs = Seq((1L, "en"), (2L, "en"), (3L, "en"), (4L, "en"),
      (5L, "en"), (10L, "de"), (11L, "de")).toDF("doc_id", "lang")
    val out = functions.Text.sampleUncertaintyOn(scored, langs, perLang = 2)
      .select("lang", "rk", "doc_id", "margin_ppm")
      .as[(String, Long, Long, Long)].collect().toSeq
    // en margins: 1->0, 2->1, 3->499999, 4->499900, 5->20000
    // de margins: 10->200000, 11->199999
    assert(out == Seq(
      ("de", 1L, 11L, 199999L), ("de", 2L, 10L, 200000L),
      ("en", 1L, 1L, 0L), ("en", 2L, 2L, 1L)))
  }

  test("uncertainty sampling on the corpus: at most the batch size per " +
    "language and selection is a margin prefix") {
    val out = functions.Text.sampleUncertainty(spark, sf)
      .localCheckpoint(true)
    assert(out.count() > 0)
    val per = out.groupBy("lang").agg(
      count(lit(1)).as("n"), max(col("margin_ppm")).as("worst"))
    assert(per.where(col("n") > 32L).count() == 0)
    // margins are valid: |p - 1/2| <= 1/2 in ppm
    assert(out.where(col("margin_ppm") > 500000L).count() == 0)
  }
}
