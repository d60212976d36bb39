package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical corpus signals and feature engineering — the scoring
  * layer a training-data pipeline runs between cleaning and sampling:
  * per-document information density (entropy), corpus-level
  * collocation mining (PMI), and embedding normalization.
  *
  * Cross-engine determinism follows the repo conventions: integer
  * arithmetic wherever possible (PMI and scaling are exact BIGINT
  * ratios), and where a log is irreducible (entropy) the fold runs in
  * a sorted deterministic order with one round(4) boundary, the same
  * pattern [[Text.textLmScoreOn]] established.
  */
object Signals {

  /** Character-unigram Shannon entropy per document (bits/char) plus
    * alphabet size — the cheap information-density signal quality
    * filters use to drop boilerplate and binary junk (low entropy =
    * repetitive, high = noise). Entirely map-side: per-row lambda
    * expressions over the char array, no shuffle except the output
    * order. Counts fold over the SORTED distinct alphabet so both
    * engines sum c*log2(c) in identical order; H = log2(n) - Σ/n with
    * a single round(4) absorbing last-ulp libm drift. At 100 TB this
    * is embarrassingly parallel and pairs with [[Text.textQualityOn]]
    * in the same single scan. */
  def textEntropyOn(docs: DataFrame): DataFrame = {
    val cs = split(col("text"), "")
    docs
      .select(col("doc_id"), cs.as("cs"),
        array_sort(array_distinct(cs)).as("alpha"))
      .select(col("doc_id"),
        size(col("cs")).as("n_chars"),
        size(col("alpha")).as("n_distinct"),
        aggregate(
          transform(col("alpha"),
            c => size(filter(col("cs"), x => x === c)).cast("double")),
          lit(0.0),
          (acc, c) => acc + c * log2(c)).as("s"))
      .select(col("doc_id"), col("n_chars"), col("n_distinct"),
        round(log2(col("n_chars")) - col("s") / col("n_chars"), 4)
          .as("entropy_bits"))
  }

  def textEntropy(s: SparkSession, dir: String): DataFrame =
    textEntropyOn(Tables.documents(s, dir)).orderBy("doc_id")

  /** Top bigram collocations by pointwise mutual information — the
    * standard corpus-analysis pass for multiword expressions. PMI is
    * reported as the EXACT integer ratio it is monotone in:
    * score_ppm = c12 * N * 10^6 div (c1 * c2) (c1/c2 = prefix/suffix
    * occurrence counts in the bigram stream, N = total bigrams), so
    * both engines compare identical BIGINTs — no log, no float. The
    * bigram relation aggregates once (token-keyed, map-side combined)
    * and is materialized because four plan branches read it (N,
    * prefix, suffix, and the scored join); everything downstream of
    * that aggregate is vocab-sized. min support `minCount` kills the
    * hapax noise floor. Intermediates stay under 2^63 while
    * c12 * N * 10^6 does, i.e. N up to ~10^8 bigrams per corpus shard;
    * above that, re-type the score DECIMAL(38,0). */
  def textPmiOn(docs: DataFrame, minCount: Int = 5, topK: Int = 50): DataFrame = {
    val bc = docs
      .select(Text.toks(col("text")).as("t"))
      .select(explode(Text.bigramStructs(col("t"))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val tot = bc.agg(sum(col("c12")).as("n"))
    val pre = bc.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val suf = bc.groupBy("w2").agg(sum(col("c12")).as("c2"))
    bc.filter(col("c12") >= minCount)
      .join(pre, "w1").join(suf, "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c12"),
        expr("c12 * n * 1000000 DIV (c1 * c2)").as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  def textPmi(s: SparkSession, dir: String): DataFrame =
    textPmiOn(Tables.documents(s, dir))

  /** Per-dimension min-max normalization of the embedding column —
    * the feature-scaling pass before quantization or indexing.
    * Coordinates quantize to BIGINT (floor(x * 2^20), the repo's
    * oracle-portable convention), per-dimension min/max aggregate to
    * ONE dims-sized row that broadcasts back, and the rescale is an
    * exact integer ratio (qv - mn) * 10^6 div (mx - mn) evaluated
    * map-side inside a single `transform` over each vector — the
    * corpus is scanned twice (stats + rescale) but never shuffled by
    * vector. Constant dimensions scale to 0. The vector crosses the
    * oracle boundary comma-joined (repo convention for array
    * outputs). */
  def featScaleOn(emb: DataFrame): DataFrame = {
    val stats = emb
      .select(posexplode(col("embedding")))
      .select(col("pos").as("i"),
        floor(col("col").cast("double") * 1048576).cast("long").as("qv"))
      .groupBy("i").agg(min(col("qv")).as("mn"), max(col("qv")).as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("i"), col("mn")))),
          x => x("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("i"), col("mx")))),
          x => x("mx")).as("mxs"))
    emb.crossJoin(broadcast(stats))
      .select(col("vec_id"), expr(
        "array_join(transform(sequence(0, size(embedding) - 1), i -> CAST(CASE" +
          " WHEN mxs[i] = mns[i] THEN CAST(0 AS BIGINT)" +
          " ELSE (CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)" +
          "   - mns[i]) * 1000000 DIV (mxs[i] - mns[i]) END AS STRING)), ',')")
        .as("scaled"))
      .orderBy("vec_id")
  }

  def featScale(s: SparkSession, dir: String): DataFrame =
    featScaleOn(Tables.embeddings(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_entropy" -> textEntropy,
    "text_pmi" -> textPmi,
    "feat_scale" -> featScale,
  )

  val oracles: Map[String, String] = Map(
    "text_entropy" ->
      """WITH a AS (SELECT doc_id, string_split(text, '') AS cs,
        |    list_sort(list_distinct(string_split(text, ''))) AS alpha
        |  FROM documents),
        |e AS (SELECT doc_id, len(cs) AS n_chars, len(alpha) AS n_distinct,
        |    list_reduce(
        |      list_concat([CAST(0 AS DOUBLE)],
        |        list_transform(alpha,
        |          c -> CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE))),
        |      (acc, c) -> acc + c * log2(c)) AS s
        |  FROM a)
        |SELECT doc_id, n_chars, n_distinct,
        |  ROUND(log2(n_chars) - s / n_chars, 4) AS entropy_bits
        |FROM e ORDER BY doc_id""".stripMargin,
    "text_pmi" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM tk, UNNEST(range(1, len(t))) AS r(i) WHERE len(t) >= 2),
        |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
        |tot AS (SELECT SUM(c12) AS n FROM bc),
        |pre AS (SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY w1),
        |suf AS (SELECT w2, SUM(c12) AS c2 FROM bc GROUP BY w2)
        |SELECT w1, w2, c12,
        |  CAST(c12 * n * 1000000 // (c1 * c2) AS BIGINT) AS score_ppm
        |FROM bc JOIN pre USING (w1) JOIN suf USING (w2) CROSS JOIN tot
        |WHERE c12 >= 5
        |ORDER BY score_ppm DESC, w1, w2 LIMIT 50""".stripMargin,
    "feat_scale" ->
      """WITH qv AS (SELECT vec_id, i.i AS i,
        |    CAST(FLOOR(CAST(embedding[i.i + 1] AS DOUBLE) * 1048576)
        |      AS BIGINT) AS qv
        |  FROM embeddings, range(0, 64) i(i)),
        |st AS (SELECT i, MIN(qv) AS mn, MAX(qv) AS mx FROM qv GROUP BY i),
        |sc AS (SELECT vec_id, qv.i AS i,
        |    CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
        |      ELSE (qv - mn) * 1000000 // (mx - mn) END AS v
        |  FROM qv JOIN st USING (i))
        |SELECT vec_id, string_agg(CAST(v AS VARCHAR), ',' ORDER BY i)
        |  AS scaled
        |FROM sc GROUP BY vec_id ORDER BY vec_id""".stripMargin,
  )
}
