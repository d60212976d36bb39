package graft

import org.apache.spark.sql.functions._

/** Corpus-assembly operators (functions.Corpus): hand-computed
  * fixtures + the scale properties each op claims. */
class CorpusSpec extends SparkSpecBase {
  import spark.implicits._

  test("L6 sequence packing fills budgets in order and never mixes langs") {
    val out = functions.Corpus.textPackSequences(spark, sf)
    // within each lang, pack_id is nondecreasing in doc order and each
    // doc starts exactly at (cum - n_tokens)
    val bad = out.filter(
      col("pack_id") * functions.Corpus.PackBudget + col("offset_in_pack")
        =!= col("cum_tokens") - col("n_tokens")).count()
    assert(bad == 0)
    // every pack holds at most budget tokens of starts: offset < budget
    assert(out.filter(col("offset_in_pack") >= functions.Corpus.PackBudget)
      .count() == 0)
    // cum_tokens is a genuine per-lang running sum
    val sums = out.groupBy("lang").agg(
      sum("n_tokens").as("s"), max("cum_tokens").as("m"))
      .filter(col("s") =!= col("m")).count()
    assert(sums == 0)
  }

  test("L6 packing fixture: budget boundaries assign docs to the pack where they start") {
    // tokens 300+300: second doc starts at 300 < 512 -> pack 0;
    // third doc starts at 600 -> pack 1
    val docs = Seq(
      (1L, "a", "x " * 299 + "x"), (2L, "a", "y " * 299 + "y"),
      (3L, "a", "z " * 299 + "z"))
      .toDF("doc_id", "lang", "text")
    val got = functions.Corpus.textPackSequencesOn(docs)
      .orderBy("doc_id")
      .select("pack_id", "offset_in_pack").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L), (0L, 300L), (1L, 600L - 512L)))
  }

  test("L7 stratified sample keeps per-lang rates and is idempotent") {
    val out = functions.Corpus.sampleStratified(spark, sf)
    // deterministic: re-running selects the identical row set
    val again = functions.Corpus.sampleStratified(spark, sf)
    assert(out.exceptAll(again).count() == 0 &&
      again.exceptAll(out).count() == 0)
    // every kept row satisfies its stratum threshold
    val viol = out.filter(col("bucket") >=
      when(col("lang") === "en", 25)
        .when(col("lang") === "zh", 50).otherwise(100)).count()
    assert(viol == 0)
    // en is actually downsampled vs the corpus
    val total = Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    val kept = out.filter(col("lang") === "en").count()
    assert(kept < total)
  }

  test("L7 stratified sample is map-only (no shuffle before the catalog sort)") {
    val p = functions.Corpus.sampleStratifiedOn(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("L8 corpus mix interleaves en 4x thinner and covers all docs once") {
    val out = functions.Corpus.corpusMix(spark, sf)
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.select("doc_id").distinct().count() == out.count())
    // in any position window of 0..4n, each non-en lang contributes ~4x
    // the en docs: check via pos arithmetic — en pos values are all
    // multiples of 4, others are dense 1..n
    val enBad = out.filter(col("lang") === "en" && col("pos") % 4 =!= 0)
      .count()
    assert(enBad == 0)
    val deMax = out.filter(col("lang") === "de").agg(max("pos"))
      .as[Long].head()
    val deCnt = out.filter(col("lang") === "de").count()
    assert(deMax == deCnt) // inverse-weight 1: positions are dense
  }

  test("L9 profile emits one row per column with exact nulls/distincts") {
    val out = functions.Corpus.profileStats(spark, sf)
      .as[(String, Long, Long, String, String)].collect()
    assert(out.map(_._1).toSeq ==
      Seq("doc_id", "lang", "n_chars", "source", "text"))
    val docs = Tables.documents(spark, sf)
    val byName = out.map(r => r._1 -> r).toMap
    assert(byName("doc_id")._2 == 0 &&
      byName("doc_id")._3 == docs.count())
    assert(byName("lang")._3 ==
      docs.select("lang").distinct().count())
    // min/max cast AFTER aggregation: numeric doc_id min is "0", not
    // the lexicographic smallest string
    assert(byName("doc_id")._4 == "0")
  }

  test("L9b quality audit: planted violations counted, null never passes") {
    import java.sql.Timestamp
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (Some(1L), "O", Some(100.0), Some(ts("1995-06-01")), "1-URGENT"),
      (Some(1L), "F", Some(50.0), Some(ts("1992-01-01")), "5-LOW"), // dup key
      (Some(2L), "X", Some(-3.0), Some(ts("1999-02-01")), "9-BAD"), // 4 violations
      (None, "P", None, None, "3-MEDIUM")) // null key, price, date
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority")
    val got = functions.Corpus.qualityAuditOn(orders)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got("orderkey_not_null") == ((1L, false)))
    assert(got("orderkey_unique") == ((2L, false))) // dup pair + the null row
    assert(got("totalprice_positive") == ((2L, false))) // -3 and NULL
    assert(got("status_in_domain") == ((1L, false))) // X
    assert(got("priority_format") == ((1L, false))) // 9-BAD
    assert(got("orderdate_in_range") == ((2L, false))) // 1999 and NULL
    // all-clean frame: every constraint passes
    val clean = functions.Corpus.qualityAuditOn(
      Seq((Some(7L), "O", Some(1.0), Some(ts("1995-01-01")), "2-HIGH"))
        .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
          "o_orderpriority"))
    assert(clean.filter(!col("passed")).count() == 0)
  }

  test("L7b domain cap keeps at most cap docs per source, deterministically") {
    val docs = (0L until 30L).map(i =>
      (i, s"doc text number $i", if (i < 25) "big.com" else "small.org"))
      .toDF("doc_id", "text", "source")
    val out = functions.Corpus.sampleDomainCapOn(docs, cap = 10)
    val bySource = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource == Map("big.com" -> 10L, "small.org" -> 5L))
    // rank is dense 1..k per source and re-runs pick the SAME rows
    val a = out.as[(Long, String, Long)].collect().toSeq
    val b = functions.Corpus.sampleDomainCapOn(docs, cap = 10)
      .as[(Long, String, Long)].collect().toSeq
    assert(a == b)
    assert(a.filter(_._2 == "small.org").map(_._3).sorted == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("decontaminate: eval-set leak flagged, clean doc untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"), // = bench doc
      (1L, "completely different words nothing shared here at all"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val rows = functions.Corpus.decontaminateOn(
        functions.Dedup.shingleHashesOf(corpus),
        functions.Dedup.shingleHashesOf(bench))
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // doc 0 is verbatim in the benchmark: every shingle hits
    assert(rows(0L)._3 == rows(0L)._2 && rows(0L)._5)
    // doc 1 shares nothing: zero hits, not contaminated
    assert(rows(1L)._3 == 0L && !rows(1L)._5)
  }

  test("repetition: hand-computed top token and bigram fractions") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a a a b"), // top tok "a" 3/4; top bigram "a a" 2/3
      (1L, "x"), // single token: no bigrams
      (2L, "t u v w x y z")) // all distinct: top counts 1, both fracs < 0.2
      .toDF("doc_id", "text")
    val out = functions.Text.textRepetitionOn(docs)
      .as[(Long, Int, Long, Double, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 4, 3L, 0.75, 2L, 0.666667, false)))
    assert(out(1L)._3 == 1L && out(1L)._5 == 0L)
    assert(out(2L)._3 == 1L && out(2L)._5 == 1L && out(2L)._7)
  }

  test("L4k inverted index conserves token mass; df matches posting length") {
    import org.apache.spark.sql.functions._
    val ix = functions.Text.textInvertedIndex(spark, sf)
    val totalToks = Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(ix.agg(sum("tf_total")).head().getLong(0) == totalToks)
    assert(ix.filter(size(split(col("postings"), ",")) =!= col("df"))
      .count() == 0)
    // postings are doc-sorted: first entry's doc <= last entry's doc
    assert(ix.filter(
      split(element_at(split(col("postings"), ","), 1), ":")(0).cast("long") >
      split(element_at(split(col("postings"), ","), -1), ":")(0).cast("long"))
      .count() == 0)
  }

  test("L10 bottom-k sample: exactly k rows, repartition-invariant, top-k plan") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val a = functions.Corpus.sampleBottomkOn(docs, 64)
      .select("doc_id").as[Long].collect().toSeq
    val b = functions.Corpus.sampleBottomkOn(docs.repartition(13), 64)
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b && a.size == 64 && a.distinct.size == 64)
    // priorities injective => strictly increasing in the output order
    val pri = functions.Corpus.sampleBottomkOn(docs, 64)
      .select("pri").as[Long].collect().toSeq
    assert(pri == pri.sorted && pri.distinct.size == pri.size)
    val p = functions.Corpus.sampleBottomkOn(docs, 64)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("L10b weighted sample: k rows, repartition-invariant, biased " +
    "toward heavy docs") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val a = functions.Corpus.sampleWeightedOn(docs, 64)
      .select("doc_id").as[Long].collect().toSeq
    val b = functions.Corpus.sampleWeightedOn(docs.repartition(13), 64)
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b && a.size == 64 && a.distinct.size == 64)
    // the weight bias is the point: the weighted sample's mean doc
    // length must exceed the uniform sample's (same k, same corpus)
    val wMean = functions.Corpus.sampleWeightedOn(docs, 64)
      .agg(avg("n_chars")).as[Double].head()
    val uMean = docs.join(
        functions.Corpus.sampleBottomkOn(docs, 64).select("doc_id"), "doc_id")
      .agg(avg("n_chars")).as[Double].head()
    assert(wMean > uMean, s"weighted mean $wMean <= uniform mean $uMean")
  }

  test("L7c coverage cap: hand-checked nucleus boundary, largest source " +
    "always kept, corpus invariants") {
    import org.apache.spark.sql.functions._
    // sources sized 50/30/15/5 of a 100-char language: the rule keeps
    // a source iff mass BEFORE it is under 90 — so 50, 30, 15 stay
    // (0, 50, 80 < 90) and the 5-char tail (before = 95) drops
    val docs = Seq(
      (1L, "x" * 50, "en", "s1", 50),
      (2L, "x" * 30, "en", "s2", 30),
      (3L, "x" * 15, "en", "s3", 15),
      (4L, "x" * 5, "en", "s4", 5),
      (5L, "x" * 7, "de", "s9", 7))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = functions.Corpus.corpusCoverageCapOn(docs)
      .select("lang", "source").as[(String, String)].collect().toSet
    assert(got == Set(("en", "s1"), ("en", "s2"), ("en", "s3"),
      ("de", "s9")), got.toString)
    // corpus invariants: every lang keeps its largest source; kept
    // mass never starts at or past the 90% boundary
    val out = functions.Corpus.corpusCoverageCap(spark, sf).cache()
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(out.select("lang").distinct().count() == langs)
    assert(out.filter((col("cum_chars") - col("src_chars")) * 10 >=
      col("total_chars") * 9).count() == 0)
    out.unpersist()
  }

  test("sample_systematic: exact 1/20 spacing over the hash order, " +
    "size = ceil(n/20)") {
    val s = functions.Corpus.sampleSystematic(spark, sf)
      .select("rk").as[Long].collect().sorted
    val n = Tables.documents(spark, sf).count()
    assert(s.length == (n + 19) / 20)
    assert(s.toSeq == s.indices.map(i => 1L + 20L * i))
  }

  test("text_coverage_curve: coverage is monotone in k and saturates " +
    "at the full vocabulary") {
    val c = functions.Text.textCoverageCurve(spark, sf)
      .select("k", "n_types_used", "coverage_ppm")
      .as[(Int, Int, Long)].collect().sortBy(_._1)
    assert(c.map(_._3).toSeq == c.map(_._3).sorted.toSeq)
    // the synthetic vocabulary is far under 64 types, so the last
    // point covers every token (floor division hits exactly 1e6)
    assert(c.last._3 == 1000000L)
    assert(c.last._2 < 64)
    // n_types_used caps at min(k, vocab)
    c.foreach { case (k, used, _) => assert(used <= k) }
  }

  test("corpus_temperature: T=2 compresses shares toward uniform — " +
    "low-resource languages upsample, the head downsamples") {
    val t = functions.Corpus.corpusTemperature(spark, sf)
      .select("lang", "n_docs", "share_ppm")
      .as[(String, Long, Long)].collect()
    val total = t.map(_._2).sum
    // shares form a (floor-truncated) distribution
    val shareSum = t.map(_._3).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - t.length)
    t.foreach { case (lang, n, share) =>
      val rawPpm = n * 1000000L / total
      if (rawPpm < share) assert(rawPpm < 1000000L / t.length,
        s"$lang upsampled despite being above uniform")
      // sqrt flattening: temperature share sits between the raw
      // share and the uniform share (inclusive, up to floor slack)
      val lo = math.min(rawPpm, 1000000L / t.length) - 1
      val hi = math.max(rawPpm, 1000000L / t.length) + 1
      assert(share >= lo && share <= hi,
        s"$lang share $share outside [$lo, $hi] (raw $rawPpm)")
    }
  }

  test("L8c DSIR: the raw doc that mimics the target distribution outscores " +
    "disjoint docs; target-unseen features push scores down") {
    val target = Seq(
      (100L, "alpha beta alpha beta alpha beta gamma"),
      (101L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha beta gamma"), // target lookalike
      (2L, "delta epsilon delta epsilon delta"), // disjoint, same length
      (3L, "zeta eta theta iota kappa")) // disjoint, all-distinct bigrams
      .toDF("doc_id", "text")
    val got = functions.Corpus.corpusDsirOn(raw, target)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 3 && got.head._1 == 1L, got.toString)
    val byDoc = got.map(r => r._1 -> r._3).toMap
    assert(byDoc(1L) > byDoc(2L) && byDoc(1L) > byDoc(3L),
      s"lookalike must win: $byDoc")
    // every bigram of docs 2/3 is target-unseen -> pure smoothing mass,
    // so their scores must be negative (raw evidence against target)
    assert(byDoc(2L) < 0 && byDoc(3L) < 0, s"$byDoc")
  }

  test("L9c PSI drift: identical slices score exactly zero, disjoint slices " +
    "light up both bins, contributions are never negative") {
    val a = (0L until 20L).map(i => Tuple1(i % 10)).toDF("v")
    val same = functions.Corpus.profileDriftOn(a, a, "v", 50)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // same counts, same totals -> p_a == p_b bit-for-bit -> psi = 0
    assert(same == Seq((0L, 20L, 20L, 0L)))
    val b = (0L until 20L).map(i => Tuple1(100L + i % 10)).toDF("v")
    val disj = functions.Corpus.profileDriftOn(a, b, "v", 50)
      .orderBy("bin").as[(Long, Long, Long, Long)].collect().toSeq
    assert(disj.map(_._1) == Seq(0L, 2L))
    assert(disj.forall(_._4 > 0), disj.toString)
    // PSI contributions are (p_a - p_b) ln(p_a / p_b): both factors
    // share sign, so every bin of the corpus query is >= 0 too
    val corpus = functions.Corpus.profileDrift(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(corpus.nonEmpty && corpus.forall(_._4 >= 0))
  }

  test("L4n novelty: first doc scores 1e6, an exact dup scores 0, partial " +
    "overlap scores the unshared fraction") {
    val docs = Seq(
      (0L, "a b c d e"), // 3 shingles, all first-seen
      (1L, "a b c d e"), // exact dup -> nothing novel
      (2L, "a b c x y z")) // shares only "a b c" -> 3 of 4 novel
      .toDF("doc_id", "text")
    val got = functions.Text.textNoveltyOn(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, 3L, 1000000L),
      (1L, 3L, 0L, 0L),
      (2L, 4L, 3L, 750000L)))
    // corpus invariants: ppm in [0, 1e6]; the minimal doc_id is fully
    // novel by construction
    val c = functions.Text.textNovelty(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(c.forall(r => r._4 >= 0 && r._4 <= 1000000))
    assert(c.minBy(_._1)._4 == 1000000L)
  }

  test("L8d epoch plan: per-language repeats sum EXACTLY to the temperature " +
    "target and differ by at most one within a language") {
    val plan = functions.Corpus.corpusEpochs(spark, sf)
    val perLang = plan.groupBy("lang")
      .agg(sum(col("n_repeats")).as("s"), min(col("n_repeats")).as("mn"),
        max(col("n_repeats")).as("mx"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val targets = functions.Corpus.corpusTemperature(spark, sf)
      .select("lang", "target_docs").as[(String, Long)].collect().toMap
    assert(perLang.keySet == targets.keySet)
    perLang.foreach { case (lang, (_, s, mn, mx)) =>
      assert(s == targets(lang), s"$lang: planned $s != target ${targets(lang)}")
      assert(mx - mn <= 1, s"$lang repeats not balanced: [$mn, $mx]")
    }
  }
  test("L10e shuffle: a permutation into contiguous shard positions, seed-sensitive") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val out = functions.Corpus.corpusShuffleOn(docs).cache()
    // every doc appears exactly once
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // positions are dense 1..n per shard
    val perShard = out.groupBy("shard").agg(
      count(lit(1)).as("n"), min(col("pos")).as("mn"), max(col("pos")).as("mx"))
    assert(perShard.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0)
    // reproducible under the same seed
    val again = functions.Corpus.corpusShuffleOn(docs)
    assert(out.exceptAll(again).count() == 0)
    // a different seed reorders: at least one doc moves shard or pos
    val reseeded = functions.Corpus.corpusShuffleOn(docs, seed = 41504L)
      .select(col("doc_id"), col("shard").as("s2"), col("pos").as("p2"))
    val moved = out.join(reseeded, "doc_id")
      .filter(col("shard") =!= col("s2") || col("pos") =!= col("p2")).count()
    assert(moved > 0)
    out.unpersist()
  }

  test("L4f readability: ARI terms hand-computed on a real sentence " +
      "pair; punctuation-free text clamps to one sentence") {
    val docs = Seq(
      (1L, "The cat sat on the mat. It was fat!"),
      (2L, "aa bb")).toDF("doc_id", "text")
    val got = functions.Text.textReadabilityOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // doc 1: 25 alnum chars, 9 space tokens, 2 terminators:
    //   4710*25 div 9 + 500*9 div 2 - 21430 = 13083 + 2250 - 21430
    // doc 2: no terminator -> n_sent clamps to 1
    assert(got == Seq(
      (1L, 25L, 9L, 2L, -6097L),
      (2L, 4L, 2L, 1L, -11010L)))
  }

  test("L8b unimax water-filling: small languages keep everything, " +
      "big ones cap at the shared level; budget spent exactly") {
    import spark.implicits._
    // langs a=2, b=5, c=50 docs, budget 10: level t = 4 -> 2/4/4
    val docs = ((1 to 2).map(i => (i.toLong, "a")) ++
      (11 to 15).map(i => (i.toLong, "b")) ++
      (21 to 70).map(i => (i.toLong, "c"))).toDF("doc_id", "lang")
    val got = functions.Corpus.corpusUnimaxOn(docs, budget = 10L)
      .as[(String, Long, Boolean, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, false, 2L), ("b", 5L, true, 4L),
      ("c", 50L, true, 4L)))
    // budget beyond the corpus: everyone keeps everything, no caps
    val full = functions.Corpus.corpusUnimaxOn(docs, budget = 100L)
      .as[(String, Long, Boolean, Long)].collect()
    assert(full.forall(r => r._4 == r._2 && !r._3))
    // corpus: the 300-doc budget is spent exactly (corpus is larger),
    // and no language exceeds its own size
    val c = functions.Corpus.corpusUnimax(spark, sf)
      .as[(String, Long, Boolean, Long)].collect()
    assert(c.map(_._4).sum == 300L)
    assert(c.forall(r => r._4 <= r._2))
    assert(c.filter(!_._3).forall(r => r._4 == r._2)) // uncapped = full
  }

  test("L10e neyman allocation: variance attracts the budget; seats " +
      "sum to n; draws truncate at stratum size") {
    import spark.implicits._
    // lang a: zero variance (w=0); lang b: spread -> b takes every
    // seat, then truncates to its 4 members at the draw
    val docs = (
      (1L to 5L).map(i => (i, "a", 100L)) ++
      Seq((11L, "b", 100L), (12L, "b", 200L), (13L, "b", 300L),
        (14L, "b", 400L)))
      .toDF("doc_id", "lang", "n_chars")
    val out = functions.Corpus.sampleNeymanOn(docs).collect()
    assert(out.forall(_.getAs[String]("lang") == "b"))
    assert(out.length == 4) // n_h = 100 truncated by the 4-doc stratum
    assert(out.head.getAs[Long]("n_h") == 100L)
    // corpus: the seat vector sums exactly to the budget, and each
    // stratum yields min(n_h, stratum docs) rows
    val c = functions.Corpus.sampleNeyman(spark, sf).cache()
    val seats = c.select("lang", "n_h", "stratum_size").distinct()
      .as[(String, Long, Long)].collect()
    assert(seats.map(_._2).sum == 100L)
    val perLang = c.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    seats.foreach { case (lang, nh, size) =>
      assert(perLang.getOrElse(lang, 0L) == math.min(nh, size),
        s"$lang drew ${perLang.getOrElse(lang, 0L)} of min($nh, $size)")
    }
    // deterministic replay
    val again = functions.Corpus.sampleNeyman(spark, sf)
    assert(c.exceptAll(again).count() == 0 && again.exceptAll(c).count() == 0)
    c.unpersist()
  }

  test("doremi: the hard domain gains weight over its reference share, " +
    "the easy one loses; weights renormalize; easiest domain has zero excess") {
    import spark.implicits._
    // lang A: maximally predictable bigrams (one repeated token);
    // lang B: every bigram rare (rotating vocabulary) -> higher NLL
    val docs = ((1L to 6L).map(i => (i, "a a a a a a a a", "aa")) ++
      (11L to 16L).map(i => (i,
        s"w${i}x y${i} q${i} z${i} r${i} s${i} t${i} u$i", "bb")))
      .toDF("doc_id", "text", "lang")
    val out = functions.Corpus.corpusDoremiOn(docs)
      .select("lang", "excess_micro", "ref_ppm", "w_ppm", "delta_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("aa")._2 == 0L)            // easiest domain: zero excess
    assert(out("bb")._2 > 0L)
    assert(out("bb")._5 > 0L, s"hard domain not upweighted: $out")
    assert(out("aa")._5 < 0L)
    // weights form a distribution up to per-domain floor rounding
    val sumW = out.values.map(_._4).sum
    assert(math.abs(sumW - 1000000L) <= out.size, s"sum w_ppm = $sumW")

    // corpus: same invariants across the real lang mix
    val c = functions.Corpus.corpusDoremi(spark, sf)
      .select("excess_micro", "w_ppm").as[(Long, Long)].collect()
    assert(c.exists(_._1 == 0L))
    assert(math.abs(c.map(_._2).sum - 1000000L) <= c.length)
  }

  test("undersample: every class trimmed to the minority count by " +
    "the deterministic hash rank") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .map { case (id, l) => (id, "t", l) }
      .toDF("doc_id", "text", "lang")
    val r = functions.Corpus.sampleUndersampleOn(docs).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    // minority (b) has 1 doc; lang a keeps the smallest Knuth-hash id
    // (h(2) < h(1) < h(3)) -> exactly {2, 4}, both at rank 1
    assert(r.toSeq === Seq((2L, "a", 1L), (4L, "b", 1L)))
    // corpus: per-lang counts all equal the global minimum
    val c = functions.Corpus.sampleUndersample(spark, sf)
      .groupBy("lang").count().select("count").as[Long].collect()
    assert(c.toSet.size === 1)
  }

  test("span corruption: adjacent masks collapse to one sentinel, " +
    "input/target reconstruct, corpus rate lands near 15%") {
    // doc 1: h(i) = (31 + 61*i) % 1000 -> masked at i=0,1 (31, 92),
    // clear from i=2 (153, 214, ...): ONE span of length 2
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    val r = functions.Corpus.corpusSpanCorruptionOn(docs).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((6L, 2L, 1L)))
    assert(r.getString(4) === "<extra_id_0> t2 t3 t4 t5")
    assert(r.getString(5) === "<extra_id_0> t0 t1")
    // corpus: rate within [10%, 20%], spans strictly fewer than masks
    // (real multi-token spans exist), reconstruction conserves tokens
    val c = functions.Corpus.corpusSpanCorruption(spark, sf)
      .agg(sum("n_tokens").as("t"), sum("n_masked").as("m"),
        sum("n_spans").as("s"))
      .as[(Long, Long, Long)].head()
    assert(c._2 * 10 >= c._1 && c._2 * 5 <= c._1, c.toString)
    assert(c._3 < c._2)
  }

  test("fim pairs: PSM rearrangement with hash cuts, token-conserving") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val r = functions.Corpus.corpusFimPairsOn(docs).collect()
    // doc 1: h1 = 2654435761 % 5 = 1, h2 = 1103527590 % 5 = 0
    assert((r(0).getLong(2), r(0).getLong(3)) === ((0L, 1L)))
    assert(r(0).getString(5) === "<PRE> <SUF> b c d e <MID> a")
    // doc 2: h1 = 2, h2 = 0 -> middle "a b"
    assert(r(1).getString(5) === "<PRE> <SUF> c d e <MID> a b")
    // corpus: every row conserves tokens (3 sentinels + n)
    val c = functions.Corpus.corpusFimPairs(spark, sf)
      .filter(size(split(col("fim_text"), " ")) =!= col("n_tokens") + 3)
      .count()
    assert(c === 0L)
  }

  test("curriculum: exact CDF ranks, ceil-clamped phases, ties by doc_id") {
    val docs = Seq((1L, "a"), (2L, "a b"), (3L, "c d"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val r = functions.Corpus.corpusCurriculumOn(docs, phases = 2)
      .collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3)))
    assert(r.toSeq === Seq(
      (1L, 1L, 250L, 1), (2L, 2L, 500L, 1),
      (3L, 2L, 750L, 2), (4L, 4L, 1000L, 2)))
    // corpus: phases are monotone in difficulty and partition all docs
    val corpus = functions.Corpus.corpusCurriculum(spark, sf)
    assert(corpus.count() === Tables.documents(spark, sf).count())
    val byPhase = corpus.groupBy("phase")
      .agg(min("difficulty_milli").as("lo"), max("difficulty_milli").as("hi"))
      .orderBy("phase")
      .select("lo", "hi").as[(Long, Long)].collect()
    assert(byPhase.sliding(2).forall {
      case Array(a, b) => a._2 <= b._1
      case _ => true
    })
  }

  test("temperature sweep: tau=1 reproduces natural shares, lower tau " +
    "flattens (entropy monotone down in tau), hand shares at tau=1/2") {
    // langs: a=900 docs, b=100 -> tau=1 shares 900000/100000;
    // tau=1/2: w = 30e6 / 10e6 -> shares 750000/250000
    val docs = ((1L to 900L).map(i => (i, "a")) ++
      (901L to 1000L).map(i => (i, "b"))).toDF("doc_id", "lang")
    val out = functions.Corpus.corpusTemperatureSweepOn(docs)
      .select("tau_milli", "lang", "share_ppm", "h_total_nano")
      .as[(Long, String, Long, Long)].collect().toSeq
    val m = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(m((1000L, "a")) == 900000L && m((1000L, "b")) == 100000L)
    assert(m((500L, "a")) == 750000L && m((500L, "b")) == 250000L)
    // entropy strictly increases as tau drops (shares flatten)
    val h = out.groupBy(_._1).mapValues(_.head._4)
    assert(h(250L) > h(500L) && h(500L) > h(750L) && h(750L) > h(1000L))
  }

  test("temperature sweep on the corpus: four tiers, shares sum to ~1e6 " +
    "per tier, tau=1 matches the natural document shares") {
    val out = functions.Corpus.corpusTemperatureSweep(spark, sf)
      .localCheckpoint(true)
    assert(out.select("tau_milli").distinct().count() == 4)
    val sums = out.groupBy("tau_milli").agg(sum("share_ppm").as("s"))
      .as[(Long, Long)].collect()
    sums.foreach { case (t, sx) =>
      assert(sx >= 999990L && sx <= 1000000L, s"tau $t sums $sx") }
  }

  test("corpus_pipeline_full: funnel monotone per language, totals " +
    "consistent with the stage queries, temperature + shard columns " +
    "replay from the funnel counts, deterministic repeat") {
    val rows = functions.Corpus.corpusPipelineFull(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(rows.nonEmpty)
    val budget = functions.Corpus.PipelineShardBudget
    rows.foreach { case (lang, raw, cl, nr, fin, toks, share, tgt, sh) =>
      assert(raw >= cl && cl >= nr && nr >= fin && fin >= 0, lang)
      assert(sh == (toks + budget - 1) / budget, lang)
      assert(toks == 0 || fin > 0, lang)
      assert(share >= 0 && share <= 1000000 && tgt >= 0, lang)
    }
    // stage-1 totals match the standalone corpus_clean query
    assert(rows.map(_._3).sum ==
      functions.Text.corpusClean(spark, sf).count())
    // raw totals cover the corpus
    assert(rows.map(_._2).sum == Tables.documents(spark, sf).count())
    // temperature + target columns replay imperatively from n_final
    val wq = rows.map(r => math.floor(math.sqrt(r._5.toDouble) * 1e6).toLong)
    val wsum = wq.sum
    val nfTotal = rows.map(_._5).sum
    rows.zip(wq).foreach { case ((lang, _, _, _, _, _, share, tgt, _), w) =>
      assert(share == w * 1000000L / wsum, lang)
      assert(tgt == (w * 1000000L / wsum) * nfTotal / 1000000L, lang)
    }
    // shares sum to ~1e6 (floor rounding loses < 1 ppm per language)
    val ssum = rows.map(_._7).sum
    assert(ssum > 1000000L - rows.size && ssum <= 1000000L)
    val again = functions.Corpus.corpusPipelineFull(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(rows == again)
  }
}
