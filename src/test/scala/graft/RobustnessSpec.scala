package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input behavior of the library forms — an empty or
  * near-empty corpus must flow through every pipeline without
  * crashing (the shapes a library user hits first). */
class RobustnessSpec extends SparkSpecBase {
  import spark.implicits._

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType))))

  test("dedup family: empty corpus -> empty results, no crash") {
    assert(functions.Dedup.dedupExactOn(emptyDocs).count() == 0)
    val hs = functions.Dedup.shingleHashesOf(emptyDocs)
    assert(functions.Dedup.dedupMinhashOn(hs).count() == 0)
    assert(functions.Dedup.dedupNgramOn(hs).count() == 0)
    val tc = functions.Dedup.tokenCountsOf(emptyDocs)
    assert(functions.Dedup.dedupSimhashOn(tc).count() == 0)
    assert(functions.Dedup.dedupSimhash64On(
      functions.Dedup.simhash64SigOf(tc)).count() == 0)
  }

  test("round-3 ops: empty inputs -> empty results, no crash") {
    import org.apache.spark.sql.functions.col
    val emptyHs = functions.Dedup.shingleHashesOf(emptyDocs)
    assert(functions.Corpus.decontaminateOn(emptyHs, emptyHs).count() == 0)
    assert(functions.Text.textRepetitionOn(emptyDocs).count() == 0)
    assert(operators.Windows.denseIdsOn(
      emptyDocs, Seq("text", "doc_id")).count() == 0)
    val emptyEmb = emptyDocs
      .select(col("doc_id").as("vec_id"),
        org.apache.spark.sql.functions.array().cast("array<float>")
          .as("embedding"))
      .limit(0)
    assert(functions.Dedup.dedupEmbeddingOn(emptyEmb).count() == 0)
    assert(functions.Dedup.dedupEmbeddingLshOn(emptyEmb).count() == 0)
  }

  test("denseIdsOn: dense permutation, monotone in the compound key, ragged parts") {
    // scrambled insert order, heavy key duplication (50 distinct k for
    // 1000 rows), a parts count that doesn't divide n — ids must still
    // be exactly base+1..base+n and follow (k, pk) order
    val n = 1000
    val df = (0 until n).map(i => ((i * 7919) % n, s"k${(i * 104729) % 50}"))
      .toDF("pk", "k")
    val out = operators.Windows.denseIdsOn(df, Seq("k", "pk"), parts = 7,
        base = 10L)
      .select("k", "pk", "dense_id")
      .as[(String, Int, Long)].collect()
    assert(out.map(_._3).sorted.toSeq == (11L to (n + 10L)))
    val byId = out.sortBy(_._3).map(r => (r._1, r._2)).toSeq
    assert(byId == byId.sorted)
  }

  test("null text: shingles coalesce to empty array, never NULL") {
    val docs = Seq((1L, null.asInstanceOf[String], "en"),
      (2L, "a b c d", "en")).toDF("doc_id", "text", "lang")
    val got = docs
      .select(col("doc_id"), functions.Dedup.shingles("text").as("sh"))
      .orderBy("doc_id").collect()
    assert(!got(0).isNullAt(1) && got(0).getSeq[String](1).isEmpty)
    assert(got(1).getSeq[String](1) == Seq("a b c", "b c d"))
  }

  test("text family + capstone: empty corpus -> empty results") {
    assert(functions.Text.textQualityOn(emptyDocs).count() == 0)
    assert(functions.Text.textLangidOn(emptyDocs).count() == 0)
    assert(functions.Text.corpusCleanOn(emptyDocs).count() == 0)
  }

  test("single tiny doc survives the whole corpus_clean path deterministically") {
    val one = Seq((1L, "the data of the table is big and the data is fast ok", "en"))
      .toDF("doc_id", "text", "lang")
    val out = functions.Text.corpusCleanOn(one).collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L)
  }

  test("sketch bounds hold at sf0.01 AND sf0.1 (scale evidence for the no_oracle ops)") {
    // the two catalog entries with no DuckDB oracle carry error-bound
    // specs instead; asserting the bounds at two scale factors shows
    // the sketch error does not grow with the data (HLL++ and
    // GK-quantile bounds are relative, not absolute)
    import spark.implicits._
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val rows = operators.Aggregates.aggApproxDistinctRaw(spark, dir)
        .select("approx_users", "exact_users").as[(Long, Long)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (approx, exact) =>
        assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.15).toLong),
          s"$dir approx=$approx exact=$exact")
      }
      // raw builder carries approx AND exact side by side (cents
      // domain); the catalog query folds this bound into its
      // hash-checked in-bound flags
      val q = operators.Aggregates.aggApproxQuantileRaw(spark, dir)
        .select(col("l_returnflag"),
          col("approx_p50").cast("double"), col("approx_p95").cast("double"),
          col("exact_p50"), col("exact_p95"))
        .as[(String, Double, Double, Double, Double)].collect()
      assert(q.nonEmpty)
      q.foreach { case (k, a50, a95, p50, p95) =>
        assert(math.abs(a50 - p50) <= 0.02 * p50, s"$dir $k p50: $a50 vs $p50")
        assert(math.abs(a95 - p95) <= 0.02 * p95, s"$dir $k p95: $a95 vs $p95")
      }
    }
  }

  test("approx MAD model and relative-quality cut stay near exact at " +
    "sf0.01 AND sf0.1") {
    // the grouped-percentile ops' 100 TB mode: percentile_approx
    // (mergeable GK sketch) instead of exact median's per-group value
    // buffering. Bound the approx model against the exact one at two
    // scale factors — like the agg_approx_* bounds, the sketch error
    // is a rank guarantee, so it does not grow with the data.
    import spark.implicits._
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val ev = Tables.events(spark, dir)
      def model(acc: Option[Int]): Map[String, (Double, Double)] = {
        val (me, ma) = operators.Analytics.madModelOn(ev, acc)
        me.join(ma, "event_type").as[(String, Double, Double)]
          .collect().map { case (k, m, d) => k -> (m, d) }.toMap
      }
      val exact = model(None)
      val approx = model(Some(1000))
      assert(exact.nonEmpty && exact.keySet == approx.keySet)
      exact.foreach { case (k, (med, mad)) =>
        val (am, ad) = approx(k)
        assert(math.abs(am - med) <= math.max(0.02 * math.abs(med), 1e-9),
          s"$dir $k med: approx=$am exact=$med")
        assert(math.abs(ad - mad) <= math.max(0.05 * math.abs(mad), 1e-9),
          s"$dir $k mad: approx=$ad exact=$mad")
      }
      // end-to-end: the approx cut keeps the relative-quality doc set
      // within 1% (symmetric difference) of the exact cut's
      val docs = Tables.documents(spark, dir)
      val ex = functions.Text.qualityFilterRelativeOn(docs)
        .select("doc_id").as[Long].collect().toSet
      val ap = functions.Text.qualityFilterRelativeOn(docs, Some(1000))
        .select("doc_id").as[Long].collect().toSet
      val sym = (ex diff ap).size + (ap diff ex).size
      assert(ex.nonEmpty && sym <= math.max(1, ex.size / 100),
        s"$dir symmetric difference $sym of ${ex.size}")
    }
  }

  test("TopK.of with k larger than any group returns every row") {
    val df = Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("k", "v")
    val got = plans.TopK.of(df, Seq("k"), "v", desc = true, k = 100)
      .collect().map(_.toString).toSet
    assert(got == df.collect().map(_.toString).toSet)
  }

  test("sessionWalk on empty and single-event groups") {
    assert(streaming.Streaming.sessionWalk(1L, Iterator.empty).isEmpty)
    val one = streaming.Streaming.sessionWalk(1L,
      Iterator((1L, 42L, 1000L))).toList
    assert(one == List((1L, 0L, 1L, 42L, 42L)))
  }

  test("topkCosineOn with empty query side returns empty") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 0).withColumnRenamed("vec_id", "qid")
    assert(functions.Similarity.topkCosineOn(e, q, 5).count() == 0)
  }

  test("round-4 final ops: empty corpus -> empty results, no crash") {
    val e = emptyDocs
      .withColumn("source", lit("s"))
      .withColumn("n_chars", lit(0L))
    // MG sketch over zero rows: empty candidate array, total 0
    assert(functions.Text.heavyHittersOn(e).count() == 0)
    assert(functions.Text.qualityFilterRelativeOn(e).count() == 0)
    assert(functions.Corpus.sampleBottomkOn(e, 64).count() == 0)
    // k beyond the corpus returns every row, still ordered by priority
    val n = Tables.documents(spark, sf).count()
    assert(functions.Corpus.sampleBottomkOn(
      Tables.documents(spark, sf), 1000000).count() == n)
  }

  test("exact all-pairs gate: oversize corpus refuses with the sibling named; " +
    "cap lever and -1 force-through both work") {
    val emb = Tables.embeddings(spark, sf)
    val key = "spark.graft.exact.maxRows"
    try {
      // cap below the corpus: every exact all-pairs entry point throws
      spark.conf.set(key, "10")
      for (op <- Seq(
          () => functions.Dedup.dedupEmbeddingOn(emb),
          () => functions.Similarity.simKnnJoinOn(emb),
          () => functions.Clusters.dedupSemantic(spark, sf))) {
        val e = intercept[IllegalStateException](op())
        assert(e.getMessage.contains("O(n^2)") &&
          e.getMessage.contains("spark.graft.exact.maxRows") &&
          e.getMessage.contains("Lsh"), e.getMessage)
      }
      // -1 disables the gate (deliberate force-through)
      spark.conf.set(key, "-1")
      assert(functions.Similarity.simKnnJoinOn(emb, k = 1).limit(1).count() == 1)
    } finally spark.conf.unset(key)
    // default cap (1M) admits the test corpus
    assert(functions.Dedup.dedupEmbeddingOn(emb).limit(1).count() == 1)
  }

  test("round-7 close ops: empty inputs -> empty results, no crash; " +
    "parameter guards throw early") {
    // quality family on an empty scored relation
    val emptyScored = Seq.empty[(Long, Long)].toDF("p_ppm", "y")
    assert(functions.Text.qualityEceOn(emptyScored).count() == 0)
    assert(functions.Text.qualityThresholdSweepOn(emptyScored)
      .count() == 0)
    // VAD and langid eval on an empty corpus
    assert(multimodal.Multimodal.mmAudioVadOn(emptyDocs).count() == 0)
    assert(functions.Text.textLangidEvalOn(
      functions.Text.textLangidOn(emptyDocs)).count() == 0)
    // betweenness: empty seed set and empty edges both drain through
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val someEdges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(functions.Clusters.graphBetweennessOn(someEdges,
      Seq.empty[Long].toDF("node")).count() == 0)
    assert(functions.Clusters.graphBetweennessOn(noEdges,
      Seq(1L).toDF("node")).count() == 0)
    // DP quantile: a single-value relation releases that value with
    // zero rank error; parameter guards reject out-of-range inputs
    val one = Seq((1L, 0, 5.0, "A"))
      .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
    val r = functions.Privacy.privacyDpQuantileOn(one).collect()
    assert(r.length == 1 && r(0).getAs[Long]("dp_q_cents") == 500L &&
      r(0).getAs[Long]("err_cents") == 0L)
    intercept[IllegalArgumentException](
      functions.Privacy.privacyDpQuantileOn(one, epsMilli = 0L))
    intercept[IllegalArgumentException](
      functions.Privacy.privacyDpQuantileOn(one, qMilli = 1000L))
    intercept[IllegalArgumentException](
      functions.Clusters.graphBetweennessOn(someEdges,
        Seq(1L).toDF("node"), maxHops = 1))
  }

  test("codec ops are deterministic under task retry: every " +
    "partition's FIRST attempt runs the full decode then dies, the " +
    "retried attempt rebuilds from scratch, and the relation is " +
    "identical — the at-scale task-failure contract (cluster " +
    "maxFailures is 4; a 1000-executor job retries constantly)") {
    import org.apache.spark.TaskContext
    import org.apache.spark.sql.{Dataset, Encoders}
    val ids: Dataset[Long] = spark.range(0, 200)
      .select(col("id").as("doc_id")).as[Long](Encoders.scalaLong)
    def killFirst[T](ds: Dataset[T])(
        implicit e: org.apache.spark.sql.Encoder[T]): Dataset[T] =
      ds.mapPartitions { it =>
        val rows = it.toVector // force the decode work in THIS attempt
        if (TaskContext.get.attemptNumber == 0)
          throw new RuntimeException(
            "injected first-attempt failure (after the work ran)")
        rows.iterator
      }
    val pngBase = multimodal.Multimodal.mmDecodePngOn(ids)
      .as[(Long, Int, Int, Long, Long, Long, Boolean)]
    val png = killFirst(pngBase).collect().toSet
    assert(png == pngBase.collect().toSet && png.size == 200)
    val avBase = multimodal.Multimodal.mmMp4DecodeAvOn(ids)
      .as[(Long, Long, Int, Int, Long, Int, Int, Long, Long, Long)]
    val av = killFirst(avBase).collect().toSet
    assert(av == avBase.collect().toSet && av.size == 200)
    // the round-10 lossy tier retries identically too: the JPEG
    // integer transforms and Huffman coder are pure functions of the
    // bytes, so attempt 2 reproduces attempt 1 bit for bit
    val jBase = multimodal.Multimodal.mmDecodeJpegOn(ids)
      .as[(Long, Int, Int, Long, Boolean)]
    val j = killFirst(jBase).collect().toSet
    assert(j == jBase.collect().toSet && j.size == 200)
    val mBase = multimodal.Multimodal.mmDecodeMjpegOn(ids)
      .as[(Long, Int, Int, Long, Int, Long, Boolean)]
    val m = killFirst(mBase).collect().toSet
    assert(m == mBase.collect().toSet && m.size == 200)
  }
}
