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
}
