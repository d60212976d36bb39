package graft.functions

import graft.{Guards, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines — SURVEY.md §2.11 L4.
  *
  * All pure higher-order Catalyst expressions (transform / filter /
  * aggregate over token arrays) — codegen-friendly, no UDFs, no
  * shuffle except the final orderBy: at 100 TB these are
  * embarrassingly parallel map-side ops.
  *
  * Cross-engine determinism: only integer arithmetic (char codes,
  * token counts, polynomial hashes mod 1e9+7) with at most one double
  * division at the end — bit-identical in DuckDB.
  */
object Text {

  val P: Long = 1000000007L

  /** Tokens of the space-separated text. */
  def toks(c: Column): Column = split(c, " ")

  /** Adjacent-token (w1, w2) bigram structs of the passed token-array
    * column — empty (never a descending sequence) on docs under two
    * tokens. Shared by repetition scoring, the bigram LM, and PMI so
    * bigram semantics cannot silently diverge between operators.
    * Takes the token column explicitly (not a by-name `t` coupling):
    * a caller with a differently-aliased token array — or an unrelated
    * column named `t` — fails at the call site instead of silently
    * binding the wrong column. */
  def bigramStructs(t: Column): Column =
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Polynomial rolling hash of a string column over char codes:
    * fold(acc*31 + code) mod P — the document-fingerprint primitive
    * (and the portable word-hash used by Dedup; sha-based hashing is
    * also exposed, but polynomial-mod keeps every intermediate a
    * BIGINT both engines can reproduce). Evaluated by the native
    * codegen'd expression (graft.plans.PolyHash); [[polyHashFold]] is
    * the pure-built-in formulation it replaced (same values, ~10x
    * slower interpreted lambda — kept for the equivalence spec). */
  def polyHash(c: Column): Column = graft.plans.GraftFunctions.poly_hash(c)

  def polyHashFold(c: Column): Column =
    aggregate(
      split(c, ""),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % P)

  /** Language-marker stopword lists (honest n-gram/stopword heuristic;
    * the synthetic corpus is English word-soup, so the classifier
    * correctly predicts 'en' — the operator is the point). */
  val enStop = Seq("the", "a", "of", "and", "to", "in", "is")
  val deStop = Seq("der", "die", "das", "und", "ist", "nicht")
  val esStop = Seq("el", "la", "los", "de", "que", "es")
  val frStop = Seq("le", "la", "les", "et", "est", "que")

  private def hits(t: Column, words: Seq[String]): Column =
    size(filter(t, w => w.isin(words.map(lit(_)): _*)))

  /** L4a: token counting — whitespace tokens + a BPE-ish sub-word
    * count (runs of letters/digits via regexp split). */
  def textTokensOn(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        size(toks(col("text"))).as("n_tokens"),
        size(array_distinct(toks(col("text")))).as("n_unique"),
        length(col("text")).as("len_chars"),
        size(split(col("text"), "[^a-z0-9]+")).as("n_subtokens"))

  def textTokens(s: SparkSession, dir: String): DataFrame =
    textTokensOn(Tables.documents(s, dir)).orderBy("doc_id")

  /** L4f: readability scoring — the Automated Readability Index
    * (Senter & Smith 1967), the one classic readability formula with
    * no syllable counting, so it stays exact: 4.71·chars/word +
    * 0.5·words/sentence − 21.43, emitted in milli with each term as
    * ONE non-negative integral division (deterministic in both
    * engines; the two-term sum is defined as the sum of the truncated
    * terms). Characters count alphanumerics only, sentences count
    * terminator characters clamped to ≥ 1 — so punctuation-free
    * corpora (this one) degrade gracefully to a one-sentence document
    * rather than dividing by zero; the spec exercises real sentence
    * structure. Pure per-row map work: no shuffle at any scale beyond
    * the dump-contract sort. */
  def textReadabilityOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        length(regexp_replace(col("text"), "[^A-Za-z0-9]", ""))
          .cast("long").as("n_alnum"),
        size(toks(col("text"))).cast("long").as("n_words"),
        greatest(length(regexp_replace(col("text"), "[^.!?]", ""))
          .cast("long"), lit(1L)).as("n_sent"))
      .withColumn("ari_milli", expr(
        "4710 * n_alnum DIV n_words + 500 * n_words DIV n_sent - 21430"))

  def textReadability(s: SparkSession, dir: String): DataFrame =
    textReadabilityOn(Tables.documents(s, dir)).orderBy("doc_id")

  /** L4b: quality scoring — length, mean token length, type-token
    * ratio, stopword ratio, and a composite keep/drop flag (the
    * C4-style heuristic filter shape). */
  def textQualityOn(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    docs
      .select(
        col("doc_id"),
        size(t).as("n_tokens"),
        (length(col("text")).cast("double") / size(t)).as("mean_tok_len"),
        (size(array_distinct(t)).cast("double") / size(t)).as("ttr"),
        (hits(t, enStop).cast("double") / size(t)).as("stop_ratio"))
      .withColumn("keep",
        col("n_tokens") >= 10 && col("ttr") > 0.1 && col("stop_ratio") > 0.0)
    // no orderBy here: the library form must stay streaming-legal
    // (sort is unsupported on unaggregated streams); the catalog
    // wrapper below adds the gate's total order
  }

  def textQuality(s: SparkSession, dir: String): DataFrame =
    textQualityOn(Tables.documents(s, dir)).orderBy("doc_id")

  /** L4b': the Gopher-style rule battery (Rae et al. 2021 §A1.1, the
    * C4/Gopher document filters) as PER-RULE diagnostics — where
    * [[textQualityOn]] emits one keep flag, this emits the full rule
    * vector plus a reason bitmask, the artifact curation teams
    * actually review ("what fraction failed WHICH rule") before
    * committing a filter. Rules, all exact integer tests (ratios are
    * cross-multiplied, never floats):
    *   r_count — token count in [minTokens, maxTokens];
    *   r_len   — mean token length in [2, 8] chars
    *             (2n <= chars <= 8n; chars = len(text) - (n-1));
    *   r_stop  — >= 2 stopword hits (the C4 "has real prose" proxy);
    *   r_rep   — top token's frequency <= 1/4 of the doc
    *             (4·c_max <= n, the repetition gate).
    * c_max runs map-side as the longest run in the SORTED token array
    * (one array_sort + one linear aggregate fold per row — O(n log n),
    * the same run-length form that took text_entropy 6x in r9; the
    * earlier distinct x occurrence lambda was O(n·distinct) and
    * dominated this op's noop read); the whole op stays one
    * embarrassingly parallel projection, zero shuffle. */
  def qualityGopherOn(docs: DataFrame, minTokens: Int = 10,
      maxTokens: Int = 10000): DataFrame = {
    val t = toks(col("text"))
    docs
      .select(col("doc_id"), t.as("t"),
        size(t).cast("long").as("n_tokens"),
        (length(col("text")) - size(t) + 1).cast("long").as("n_tok_chars"),
        hits(t, enStop).cast("long").as("n_stop"))
      .withColumn("c_max", expr(
        """aggregate(array_sort(t),
          |  named_struct('prev', CAST(NULL AS STRING),
          |    'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)),
          |  (a, x) -> named_struct('prev', x,
          |    'run', CASE WHEN a.prev <=> x THEN a.run + 1L ELSE 1L END,
          |    'best', GREATEST(a.best,
          |      CASE WHEN a.prev <=> x THEN a.run + 1L ELSE 1L END)),
          |  a -> a.best)""".stripMargin))
      .select(col("doc_id"), col("n_tokens"), col("n_stop"), col("c_max"),
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
          .as("r_count"),
        (col("n_tok_chars") >= col("n_tokens") * 2 &&
          col("n_tok_chars") <= col("n_tokens") * 8).as("r_len"),
        (col("n_stop") >= 2).as("r_stop"),
        (col("c_max") * 4 <= col("n_tokens")).as("r_rep"))
      .withColumn("keep",
        col("r_count") && col("r_len") && col("r_stop") && col("r_rep"))
      .withColumn("reason_mask",
        (when(col("r_count"), 0).otherwise(1) +
         when(col("r_len"), 0).otherwise(2) +
         when(col("r_stop"), 0).otherwise(4) +
         when(col("r_rep"), 0).otherwise(8)).cast("int"))
  }

  def qualityGopher(s: SparkSession, dir: String): DataFrame =
    qualityGopherOn(Tables.documents(s, dir)).orderBy("doc_id")

  /** L4s: quality-rule funnel — the Gopher cascade's marginal-yield
    * table (the dedup_stage_funnel discipline applied to quality
    * filtering; Rae et al. 2021 Table A1 and every FineWeb-style
    * ablation publish exactly this): rules fire in the fixed order
    * count → len → stop → rep and each is charged only the documents
    * that SURVIVED every earlier rule — the marginal-yield curve
    * rule-ordering decisions are made on (a repetition rule that
    * "removes 20%" standalone is cheap if the stopword rule already
    * took those docs). Pure conditional aggregation over the one-pass
    * per-doc rule relation: n_k = Σ[r_1 ∧ … ∧ r_k], so the whole
    * report is ONE map-side-combinable aggregate — no reapplication,
    * no joins. */
  def qualityFilterFunnelOn(docs: DataFrame): DataFrame = {
    val g = qualityGopherOn(docs)
      .select("r_count", "r_len", "r_stop", "r_rep")
    val cum = Seq("r_count", "r_len", "r_stop", "r_rep")
      .inits.toSeq.reverse.tail // prefixes: [c], [c,l], [c,l,s], [c,l,s,r]
    val aggs = count(lit(1)).as("n0") +: cum.zipWithIndex.map {
      case (rules, i) =>
        sum(when(rules.map(col).reduce(_ && _), 1L).otherwise(0L))
          .as(s"n${i + 1}")
    }
    val c = g.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    val names = Seq("count", "len", "stop", "rep")
    names.zipWithIndex.map { case (nm, i) =>
      c.select(lit(i + 1L).as("stage_id"), lit(nm).as("rule"),
        col(s"n$i").as("n_in"),
        (col(s"n$i") - col(s"n${i + 1}")).as("n_removed"),
        col(s"n${i + 1}").as("n_out"), col("n0"))
    }.reduce(_ unionByName _)
      .select(col("stage_id"), col("rule"), col("n_in"), col("n_removed"),
        col("n_out"),
        expr("CAST(CASE WHEN n_in > 0 THEN n_removed * 1000000 DIV n_in " +
          "ELSE 0 END AS BIGINT)").as("removed_ppm"),
        expr("CAST((n0 - n_out) * 1000000 DIV n0 AS BIGINT)")
          .as("cum_removed_ppm"))
      .orderBy("stage_id")
  }

  def qualityFilterFunnel(s: SparkSession, dir: String): DataFrame =
    qualityFilterFunnelOn(Tables.documents(s, dir))

  /** L4p: template/boilerplate detection by shared document prefixes —
    * web-crawl corpora are full of templated pages ("Welcome to …",
    * cookie banners, listing skeletons) whose OPENINGS repeat across
    * thousands of documents while the tails differ enough to slip
    * past whole-document dedup. Flag: group by the first `k`-token
    * prefix; any prefix shared by >= `minShare` docs marks its
    * members as template candidates. One prefix-keyed aggregate
    * (map-side combined; the prefix string is the shuffle key and is
    * bounded at k tokens) joined back to the corpus — two scans, one
    * bounded-key exchange at any corpus size. Prefix length trades
    * precision for recall: shorter catches more templates and more
    * false positives (catalog k = 3 suits the synthetic vocab). */
  def textBoilerplateOn(docs: DataFrame, k: Int = 3,
      minShare: Int = 2): DataFrame = {
    require(k >= 1 && minShare >= 2,
      s"need k >= 1 and minShare >= 2, got k=$k minShare=$minShare")
    val withPrefix = docs.select(col("doc_id"),
      concat_ws(" ", slice(toks(col("text")), 1, k)).as("prefix"))
    val shared = withPrefix.groupBy("prefix")
      .agg(count(lit(1)).as("n_sharing"))
    withPrefix.join(shared, "prefix")
      .select(col("doc_id"), col("prefix"), col("n_sharing"),
        (col("n_sharing") >= minShare).as("is_template"))
      .orderBy("doc_id")
  }

  def textBoilerplate(s: SparkSession, dir: String): DataFrame =
    textBoilerplateOn(Tables.documents(s, dir))

  /** L4c: language ID — stopword-hit scoring per language with a CJK
    * char check, fixed priority on ties (en > de > es > fr). */
  def textLangidOn(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val en = hits(t, enStop); val de = hits(t, deStop)
    val es = hits(t, esStop); val fr = hits(t, frStop)
    docs
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        en.as("en_hits"), de.as("de_hits"), es.as("es_hits"), fr.as("fr_hits"),
        col("text").rlike("[\\u4e00-\\u9fff]").as("has_cjk"))
      .withColumn("pred_lang",
        when(col("has_cjk"), "zh")
          .when(col("en_hits") >= greatest(col("de_hits"), col("es_hits"),
            col("fr_hits")), "en")
          .when(col("de_hits") >= greatest(col("es_hits"), col("fr_hits")), "de")
          .when(col("es_hits") >= col("fr_hits"), "es")
          .otherwise("fr"))
      .drop("has_cjk")
  }

  def textLangid(s: SparkSession, dir: String): DataFrame =
    textLangidOn(Tables.documents(s, dir)).orderBy("doc_id")

  /** L4c': language-ID evaluation — the in-catalog accuracy audit the
    * langid family was missing (the ANN family measures its recall,
    * dedup its method qualities, the quality classifier its AUC/ECE;
    * an UNMEASURED classifier is not a production gate). Output: the
    * row/column-normalized confusion matrix — one row per (labeled,
    * predicted) cell with its count, both marginals, the cell's share
    * of its labeled row (= per-language recall on the diagonal) and
    * of its predicted column (= per-language precision on the
    * diagonal), plus global accuracy on the 1-row broadcast. All
    * floor divisions of counts — exact in both engines. Shape: one
    * pass to the ≤|langs|² cell relation, two marginal rollups of it,
    * broadcast joins only. */
  def textLangidEvalOn(scored: DataFrame): DataFrame = {
    val cells = scored.groupBy("labeled_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // tiny; read by both marginals + accuracy
    val rows = cells.groupBy("labeled_lang")
      .agg(sum(col("n")).as("row_total"))
    val cols = cells.groupBy("pred_lang")
      .agg(sum(col("n")).as("col_total"))
    val accu = cells.agg(expr(
      """CAST(sum(CASE WHEN labeled_lang = pred_lang THEN n ELSE 0 END)
        | * 1000000 DIV sum(n) AS BIGINT)""".stripMargin)
      .as("accuracy_ppm"))
    cells
      .join(broadcast(rows), Seq("labeled_lang"))
      .join(broadcast(cols), Seq("pred_lang"))
      .crossJoin(broadcast(accu))
      .select(col("labeled_lang"), col("pred_lang"), col("n"),
        col("row_total"), col("col_total"),
        expr("(n * 1000000) DIV row_total").as("recall_share_ppm"),
        expr("(n * 1000000) DIV col_total").as("precision_share_ppm"),
        col("accuracy_ppm"))
      .orderBy("labeled_lang", "pred_lang")
  }

  def textLangidEval(s: SparkSession, dir: String): DataFrame =
    textLangidEvalOn(textLangidOn(Tables.documents(s, dir)))

  /** L4d: document fingerprinting — polynomial rolling hash over the
    * full char stream + sha256 prefix (both content-addressed ids). */
  def textFingerprintOn(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        polyHash(col("text")).as("fp_poly"),
        substring(sha2(col("text"), 256), 1, 16).as("fp_sha"))

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    textFingerprintOn(Tables.documents(s, dir)).orderBy("doc_id")

  /** L4q: trained logistic quality classifier — the fastText-style
    * LR filter every frontier corpus pipeline distills its expensive
    * judgments into (GPT-3 appendix A, LLaMA §2: an LR/fastText
    * classifier scores every document; only survivors are kept).
    * Here the teacher is a lexical-diversity rule (ttr > 0.46, the
    * corpus median — a Gopher-battery-style verdict) and the student
    * re-learns it from two CENTERED surface features (stopword ratio,
    * type-token ratio, both shifted to their corpus-median origin and
    * ×10 — centering is what lets 8 full-batch steps converge; the
    * uncentered form needs the bias to crawl to the boundary). The
    * distillation shape is the point: swap the label column for
    * "kept by the expensive filter" and the same query trains the
    * production gate. Measured on this corpus: accuracy 0.99 vs a
    * 0.51 majority class.
    *
    * Training is 8 unrolled FULL-BATCH gradient steps (lr = 4) kept
    * deterministic and distributed:
    *  - per-doc gradient contributions are QUANTIZED to integer
    *    micro-units (floor(g·10⁶ + 0.5)) before the sum, so the
    *    only corpus-wide aggregate is an order-free integer sum — no
    *    float-accumulation-order bits can diverge (Exact convention);
    *  - weights live in integer micro-units in a ONE-ROW relation,
    *    broadcast back over the feature scan each step (the
    *    sanctioned single-row crossJoin shape) — nothing collects to
    *    the driver;
    *  - the per-row sigmoid rounds to 9 dp at the contract boundary
    *    so a sub-ulp exp() difference cannot flip the quantizer;
    *  - the weight-update division FLOORs a double quotient
    *    (gradients can be negative; integer div/`//` disagree on
    *    negatives across engines — ORACLES.md rule).
    * At 100 TB each step is one map pass + one integer aggregate;
    * steps are a fixed constant. Output: per-doc probability (ppm)
    * and predicted label from the final weights. */
  val LogregSteps = 8

  def qualityLogregOn(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val feat = docs
      .select(col("doc_id"),
        size(t).cast("double").as("n"),
        hits(t, enStop).cast("double").as("eh"),
        size(array_distinct(t)).cast("double").as("nd"))
      .filter(col("n") > 0)
      .select(col("doc_id"),
        (col("nd") / col("n") > 0.46).cast("long").as("y"),
        ((col("eh") / col("n") - 0.0625) * 10).as("x1"),
        ((col("nd") / col("n") - 0.46) * 10).as("x2"))
      .localCheckpoint(true) // scanned once per step + once for scoring
    val w0 = feat.sparkSession.range(1)
      .select(lit(0L).as("w0"), lit(0L).as("w1"), lit(0L).as("w2"))
    def sigmoid(zed: Column): Column =
      round(lit(1.0) / (lit(1.0) + exp(-zed)), 9)
    def step(w: DataFrame): DataFrame =
      feat.crossJoin(broadcast(w))
        .withColumn("p", sigmoid(
          (col("w0") + col("w1") * col("x1") + col("w2") * col("x2")) / 1e6))
        .groupBy()
        .agg(max(col("w0")).as("w0_"), max(col("w1")).as("w1_"),
          max(col("w2")).as("w2_"), count(lit(1)).as("nd"),
          sum(expr("CAST(floor((y - p) * 1000000 + 0.5) AS BIGINT)")).as("g0"),
          sum(expr("CAST(floor((y - p) * x1 * 1000000 + 0.5) AS BIGINT)")).as("g1"),
          sum(expr("CAST(floor((y - p) * x2 * 1000000 + 0.5) AS BIGINT)")).as("g2"))
        .select(
          (col("w0_") + expr("CAST(FLOOR(4.0 * g0 / nd) AS BIGINT)")).as("w0"),
          (col("w1_") + expr("CAST(FLOOR(4.0 * g1 / nd) AS BIGINT)")).as("w1"),
          (col("w2_") + expr("CAST(FLOOR(4.0 * g2 / nd) AS BIGINT)")).as("w2"))
    val wFinal = (1 to LogregSteps).foldLeft(w0)((w, _) => step(w))
    feat.crossJoin(broadcast(wFinal))
      .withColumn("p", sigmoid(
        (col("w0") + col("w1") * col("x1") + col("w2") * col("x2")) / 1e6))
      .select(col("doc_id"), col("y"),
        expr("CAST(floor(p * 1000000 + 0.5) AS BIGINT)").as("p_ppm"))
      .withColumn("pred", (col("p_ppm") >= 500000).cast("long"))
      .orderBy("doc_id")
  }

  def qualityLogreg(s: SparkSession, dir: String): DataFrame =
    qualityScored(s, dir)

  /** The trained-and-scored relation, memoized per (session, dir)
    * under the [[Dedup]] shingle-cache discipline: quality_logreg,
    * quality_auc, quality_ece, and quality_threshold_sweep all
    * consume the same 8-step training chain, and a long-lived session
    * running the catalog must train it ONCE (the r6-verdict
    * shared-subtree rule). Entries of stopped sessions evict on
    * access. */
  private val scoredCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private def qualityScored(s: SparkSession, dir: String): DataFrame =
    scoredCache.synchronized {
      scoredCache.filterInPlace {
        case ((sess, _), _) => !sess.sparkContext.isStopped }
      scoredCache.getOrElseUpdate((s, dir),
        qualityLogregOn(Tables.documents(s, dir))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

  /** Per-language batch size for [[sampleUncertaintyOn]]. */
  val UncertaintyPerLang = 32

  /** L10k: inter-rater agreement — Cohen's kappa (Cohen 1960)
    * between the heuristic labeling rule (the `y` the classifier
    * trains on) and the trained model's prediction, the
    * curation-dashboard statistic behind "does the distilled filter
    * actually reproduce the labeling policy beyond chance". One
    * confusion-matrix aggregate over the memoized scored relation
    * (the quality_auc/ece discipline: one training chain per catalog
    * run), then pure integer arithmetic: with a1/b1 the raters'
    * positive counts,
    *   po = (n11 + n00) / n,  pe = (a1·b1 + a0·b0) / n²,
    *   kappa = (n·(n11+n00) − (a1·b1 + a0·b0)) / (n² − (a1·b1+a0·b0))
    * emitted in ppm via truncating integer division (negative kappa
    * — worse than chance — truncates toward zero identically in both
    * engines, the house rule). Products run in DECIMAL(38,0) so the
    * n² terms survive any corpus size (the agg_moments precedent);
    * the degenerate pe = 1 case (both raters constant) yields NULL.
    *
    * Scale: one map-side-combinable aggregate over the scored scan —
    * nothing after the first agg exceeds one row. */
  def qualityRaterKappa(s: SparkSession, dir: String): DataFrame =
    qualityScored(s, dir)
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1 && col("pred") === 1, 1L)
          .otherwise(0L)).as("n11"),
        sum(when(col("y") === 1 && col("pred") === 0, 1L)
          .otherwise(0L)).as("n10"),
        sum(when(col("y") === 0 && col("pred") === 1, 1L)
          .otherwise(0L)).as("n01"),
        sum(when(col("y") === 0 && col("pred") === 0, 1L)
          .otherwise(0L)).as("n00"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        expr("CAST((n11 + n00) * 1000000 DIV n AS BIGINT)").as("po_ppm"),
        expr("""CAST((CAST(n11 + n10 AS DECIMAL(38,0)) * (n11 + n01)
               |  + CAST(n01 + n00 AS DECIMAL(38,0)) * (n10 + n00))
               |  * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * n)
               |  AS BIGINT)""".stripMargin).as("pe_ppm"),
        expr("""CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * n >
               |    CAST(n11 + n10 AS DECIMAL(38,0)) * (n11 + n01)
               |    + CAST(n01 + n00 AS DECIMAL(38,0)) * (n10 + n00)
               |  THEN (CAST(n AS DECIMAL(38,0)) * (n11 + n00)
               |    - (CAST(n11 + n10 AS DECIMAL(38,0)) * (n11 + n01)
               |       + CAST(n01 + n00 AS DECIMAL(38,0)) * (n10 + n00)))
               |    * 1000000
               |    DIV (CAST(n AS DECIMAL(38,0)) * n
               |      - (CAST(n11 + n10 AS DECIMAL(38,0)) * (n11 + n01)
               |         + CAST(n01 + n00 AS DECIMAL(38,0)) * (n10 + n00)))
               |END AS BIGINT)""".stripMargin).as("kappa_ppm"))

  /** L10z: uncertainty sampling (Lewis & Gale, SIGIR 1994) — the
    * active-learning loop's selection step: the next documents worth
    * sending to the EXPENSIVE labeler (human, frontier-model judge)
    * are the ones the cheap trained filter is least sure about,
    * margin = |p − ½| smallest. Closes the distillation loop around
    * [[qualityLogregOn]]: train → score → pick the boundary batch →
    * relabel → retrain; a corpus pipeline runs exactly this to grow
    * its quality-filter training set where it matters.
    *
    * Scores come from the memoized trained classifier (one training
    * chain per catalog run — the quality_auc/ece discipline), so this
    * op adds ONE margin projection, a per-language rank window over
    * the margin order (ties to doc_id), and the ≤ 32·|langs|-row
    * output — the window partitions by language, never global. */
  def sampleUncertaintyOn(scored: DataFrame, langs: DataFrame,
      perLang: Int = UncertaintyPerLang): DataFrame = {
    require(perLang >= 1, s"need perLang >= 1, got $perLang")
    val m = scored.select(col("doc_id"), col("p_ppm"),
        abs(col("p_ppm") - 500000L).as("margin_ppm"))
      .join(langs, Seq("doc_id"))
    val w = Window.partitionBy("lang")
      .orderBy(col("margin_ppm").asc, col("doc_id").asc)
    m.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perLang)
      .select(col("lang"), col("rk"), col("doc_id"), col("p_ppm"),
        col("margin_ppm"))
      .orderBy("lang", "rk")
  }

  def sampleUncertainty(s: SparkSession, dir: String): DataFrame =
    sampleUncertaintyOn(qualityScored(s, dir),
      Tables.documents(s, dir).select(col("doc_id"), col("lang")))

  /** Per-token Jensen-Shannon contribution over Laplace-smoothed
    * unigram distributions — ONE string evaluated verbatim by both
    * engines (the shared-literal rule; ln correctly rounded, one
    * round(·10⁹) quantization at the contract boundary). Columns:
    * ca/cb token counts, na/nb totals, v union-vocabulary size. */
  private val jsNanoSql: String = {
    val pa = "((ca + 1) / CAST(na + v AS DOUBLE))"
    val pb = "((cb + 1) / CAST(nb + v AS DOUBLE))"
    val m = s"(0.5 * $pa + 0.5 * $pb)"
    s"CAST(round((0.5 * $pa * ln($pa / $m)" +
      s" + 0.5 * $pb * ln($pb / $m)) * 1000000000, 0) AS BIGINT)"
  }

  /** L4r: token-distribution divergence between two corpus slices —
    * the Jensen-Shannon divergence (Lin 1991; the standard
    * corpus-comparison measure behind mixture tuning and "did this
    * source drift" monitoring — symmetric and bounded by ln 2, unlike
    * KL) over Laplace-smoothed unigram distributions on the UNION
    * vocabulary (a token present in one slice only is exactly the
    * signal, never dropped — the profile_drift discipline at the
    * vocabulary level). Output: the top-`topK` divergence-driving
    * tokens with their per-token contribution in nano units, the
    * corpus-level total riding every row (summed over the FULL
    * vocabulary BEFORE the top-k cut, after per-token quantization so
    * the sum is order-free).
    *
    * Shape: two map-side-combinable wordcounts, one vocabulary-keyed
    * full-outer join, broadcast totals, a TakeOrdered top-k — nothing
    * row-scaled shuffles twice. */
  def textJsDivergenceOn(a: DataFrame, b: DataFrame,
      topK: Int = 50): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    def counts(df: DataFrame, c: String) = df
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as(c))
    val j = counts(a, "ca").join(counts(b, "cb"), Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .localCheckpoint(true) // totals + the scored pass
    val tot = j.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    val scored = j.crossJoin(broadcast(tot))
      .withColumn("js_nano", expr(jsNanoSql))
      .localCheckpoint(true) // total + top-k read it
    val total = scored.agg(sum(col("js_nano")).as("js_total_nano"))
    scored.crossJoin(broadcast(total))
      .orderBy(col("js_nano").desc, col("tok").asc)
      .limit(topK)
      .select("tok", "ca", "cb", "js_nano", "js_total_nano")
  }

  /** Catalog form: the src0 slice against the rest of the corpus —
    * the same split profile_drift monitors on document length, here
    * at the vocabulary level. */
  def textJsDivergence(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    textJsDivergenceOn(docs.filter(col("source") === "src0"),
      docs.filter(col("source") =!= "src0"))
  }

  /** L4q': AUC of the trained quality classifier — the accept metric
    * a production filter rollout actually reports (accuracy lies
    * under class imbalance; ranking quality is what the keep-
    * threshold sweep consumes). Exact, no floats: AUC is the
    * Mann-Whitney U statistic over (score, label) — rank positives
    * among all docs with midrank tie handling — computed on the
    * DISTINCT-score relation (p_ppm domain, ≤ 1e6 values) with
    * DOUBLED rank sums so midranks stay integral (the
    * [[graft.operators.Events.eventMannwhitneyOn]] discipline), and
    * the rank prefix comes from the bucketed
    * [[graft.operators.Events.prefixByCents]] sweep — no
    * single-partition sort even on the collapsed relation. Output:
    * one row (n_pos, n_neg, auc_ppm, gini_pm), NULL-gated when a
    * class is absent. */
  def qualityAucOn(scored: DataFrame): DataFrame = {
    val byV = scored
      .select(col("p_ppm").as("cents"), col("y"))
      .groupBy("cents")
      .agg(count(lit(1)).as("t"), sum(col("y")).as("t1"))
    graft.operators.Events.prefixByCents(byV, Seq("t"))
      .withColumn("cb", col("cum_t"))
      .agg(sum(col("t") - col("t1")).as("n_neg"), sum(col("t1")).as("n_pos"),
        sum(col("t1") * (lit(2L) * col("cb") + col("t") + lit(1L)))
          .as("r1_x2"))
      .select(col("n_pos"), col("n_neg"),
        (col("r1_x2") - col("n_pos") * (col("n_pos") + lit(1L)))
          .as("u1_x2"))
      .withColumn("auc_ppm", expr(
        """CASE WHEN n_pos > 0 AND n_neg > 0 THEN
          |  CAST(CAST(u1_x2 AS DECIMAL(38,0)) * 1000000
          |    DIV (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT)
          |END""".stripMargin))
      .withColumn("gini_pm", col("auc_ppm") * 2 - lit(1000000L))
      .select("n_pos", "n_neg", "u1_x2", "auc_ppm", "gini_pm")
  }

  def qualityAuc(s: SparkSession, dir: String): DataFrame =
    qualityAucOn(qualityScored(s, dir))

  /** The two deterministic annotators for [[qualityKappaOn]] — ONE
    * SQL string each, evaluated verbatim by both engines (the
    * DqRowRules / chi2Ladder discipline): a length-domain keep rule
    * and a whitespace-token-count keep rule, the classic pair of
    * cheap quality gates whose agreement a curation team audits. */
  val KappaRuleA = "n_chars BETWEEN 200 AND 2000"
  val KappaRuleB =
    "length(text) - length(replace(text, ' ', '')) + 1 >= 40"

  /** L4q'''': inter-annotator agreement via Cohen's kappa (Cohen
    * 1960) between two deterministic keep/drop labelers — the
    * agreement audit run before trusting any label source (two rule
    * filters, two model versions, model vs human sample): raw
    * agreement po overstates consensus when the base rate is skewed,
    * so kappa discounts the chance agreement pe implied by the two
    * marginals.
    *
    * Exact integer spelling: po − pe and 1 − pe are carried as the
    * cleared-denominator pair kappa_num = n·agree − (a₁b₁ + a₀b₀)
    * and kappa_den = n² − (a₁b₁ + a₀b₀); the one double division at
    * the end is a single correctly-rounded IEEE op on exact integers
    * (the agg_corr precedent), NULL-gated when pe = 1 (degenerate
    * all-one-cell marginals). kappa_num may be negative (worse than
    * chance), which is why the division is double, not DIV — the
    * graph_modularity negative-integer-division discipline. BIGINT
    * holds to n ~ 2³¹ rows; swap DECIMAL(38,0) beyond. Shape: one
    * scan, one 1-row aggregate — embarrassingly scalable. */
  def qualityKappaOn(docs: DataFrame): DataFrame =
    docs
      .select(expr(KappaRuleA).as("a"), expr(KappaRuleB).as("b"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"),
        sum(when(col("a"), 1L).otherwise(0L)).as("n_keep_a"),
        sum(when(col("b"), 1L).otherwise(0L)).as("n_keep_b"))
      .withColumn("chance",
        col("n_keep_a") * col("n_keep_b")
          + (col("n_docs") - col("n_keep_a"))
          * (col("n_docs") - col("n_keep_b")))
      .select(col("n_docs"), col("n_agree"), col("n_keep_a"),
        col("n_keep_b"),
        (col("n_agree") * col("n_docs") - col("chance")).as("kappa_num"),
        (col("n_docs") * col("n_docs") - col("chance")).as("kappa_den"))
      .withColumn("kappa",
        when(col("kappa_den") > 0,
          col("kappa_num").cast("double") / col("kappa_den")))

  def qualityKappa(s: SparkSession, dir: String): DataFrame =
    qualityKappaOn(Tables.documents(s, dir))

  /** L4q''': expected calibration error of the trained quality
    * classifier — the reliability audit a production keep-gate needs
    * before its scores can drive a THRESHOLD (AUC says the ranking is
    * right; ECE says the probabilities mean what they claim —
    * Guo et al., ICML 2017). Ten equal-width probability bins over
    * p_ppm; per bin the mean predicted probability is compared to the
    * empirical positive rate, and ECE is the kept-mass-weighted mean
    * absolute gap (MCE the max). Exact integers end to end: bin ids
    * and both per-bin rates are floor divisions of ppm sums, so no
    * float crosses an aggregation boundary. Shape: one pass over the
    * scored relation into a ≤10-row map-side-combinable rollup; the
    * two scalars ride the sanctioned 1-row broadcast crossJoin back
    * onto the bin rows. At 100 TB: one scan, 10 groups, no window. */
  def qualityEceOn(scored: DataFrame): DataFrame = {
    val byBin = scored
      .select(expr("CAST(least(p_ppm DIV 100000, 9) AS BIGINT)").as("bin"),
        col("p_ppm"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("p_ppm")).as("sp"),
        sum(col("y")).as("s1"))
      .select(col("bin"), col("n"),
        expr("sp DIV n").as("mean_p_ppm"),
        expr("(s1 * 1000000) DIV n").as("frac_pos_ppm"))
      .withColumn("gap_ppm", abs(col("mean_p_ppm") - col("frac_pos_ppm")))
    val ece = byBin.agg(
      expr("CAST(sum(n * gap_ppm) DIV sum(n) AS BIGINT)").as("ece_ppm"),
      max(col("gap_ppm")).as("mce_ppm"))
    byBin.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("mean_p_ppm"),
        col("frac_pos_ppm"), col("gap_ppm"), col("ece_ppm"), col("mce_ppm"))
      .orderBy("bin")
  }

  def qualityEce(s: SparkSession, dir: String): DataFrame =
    qualityEceOn(qualityScored(s, dir))

  /** L4q'''': keep-threshold sweep — the operating-curve table the
    * AUC scaladoc promises: for every DISTINCT classifier score,
    * the kept-document count, true positives, precision, recall, and
    * F1 of the gate "keep iff p_ppm ≥ thr". This is what turns a
    * trained filter into a DEPLOYED one: the curator picks the
    * threshold off this relation (target kept-mass or target
    * precision), not off the raw scores. Exact integers: suffix
    * counts come from the bucketed [[graft.operators.Events
    * .prefixByCents]] sweep over the distinct-score relation (≤1e6
    * rows by the ppm domain, no single-partition sort), totals ride
    * the 1-row broadcast, and all three rates are floor divisions.
    * `kept` ≥ 1 at every emitted threshold (the threshold is a
    * present score), so precision never divides by zero; recall and
    * F1 NULL-gate when a class is absent. */
  def qualityThresholdSweepOn(scored: DataFrame): DataFrame = {
    val byV = scored.select(col("p_ppm").as("cents"), col("y"))
      .groupBy("cents")
      .agg(count(lit(1)).as("t"), sum(col("y")).as("t1"))
    val tot = byV.agg(sum(col("t")).as("n_all"), sum(col("t1")).as("n_pos"))
    graft.operators.Events.prefixByCents(byV, Seq("t", "t1"))
      .crossJoin(broadcast(tot))
      .select(col("cents").as("thr_ppm"),
        (col("n_all") - col("cum_t")).as("kept"),
        (col("n_pos") - col("cum_t1")).as("tp"),
        col("n_pos"))
      .withColumn("precision_ppm", expr("(tp * 1000000) DIV kept"))
      .withColumn("recall_ppm",
        expr("CASE WHEN n_pos > 0 THEN (tp * 1000000) DIV n_pos END"))
      .withColumn("f1_ppm", expr(
        """CASE WHEN precision_ppm + recall_ppm > 0 THEN
          |  (2 * precision_ppm * recall_ppm)
          |    DIV (precision_ppm + recall_ppm) END""".stripMargin))
      .select("thr_ppm", "kept", "tp", "n_pos",
        "precision_ppm", "recall_ppm", "f1_ppm")
      .orderBy("thr_ppm")
  }

  def qualityThresholdSweep(s: SparkSession, dir: String): DataFrame =
    qualityThresholdSweepOn(qualityScored(s, dir))

  /** L4n: novelty scoring — what fraction of a document's trigram
    * shingles appears in NO lower-numbered document (doc order = the
    * corpus's ingest order, so this is "how much does each new doc
    * add", the curriculum/acquisition-value signal next to
    * [[textRepetitionOn]]'s within-doc redundancy). Ownership of a
    * shingle goes to its minimal doc_id — one gram-keyed MIN
    * aggregate (map-side combined, the dedup_substring shuffle) —
    * and the per-doc rollup joins ownership back doc-keyed. A doc of
    * entirely boilerplate scores 0; the corpus's first doc scores
    * 1e6 by construction. Integer ppm, no float ratio crosses the
    * gate. */
  def textNoveltyOn(docs: DataFrame): DataFrame = {
    val hs = Dedup.shingleHashesOf(docs)
    val owner = hs.groupBy("hs").agg(min(col("doc_id")).as("first_doc"))
    hs.join(owner, "hs")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("n_novel * 1000000 div n_shingles").as("novelty_ppm"))
  }

  def textNovelty(s: SparkSession, dir: String): DataFrame =
    textNoveltyOn(Tables.documents(s, dir)).orderBy("doc_id")

  /** L4g: normalization-then-exact-dedup — the standard first dedup
    * rung of a training pipeline: lowercase, strip punctuation,
    * collapse whitespace, THEN content-hash group. Catches trivial
    * variants (case, spacing, punctuation) that byte-exact dedup
    * misses; one groupBy shuffle carrying (hash, min_id, count). */
  def dedupNormalizedOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " ")).as("norm"))
      .groupBy(sha2(col("norm"), 256).as("norm_hash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_variants"))
      .orderBy("keeper_doc_id")

  def dedupNormalized(s: SparkSession, dir: String): DataFrame =
    dedupNormalizedOn(Tables.documents(s, dir))

  /** L4h: PII masking — regex redaction of email-shaped and
    * long-digit-run substrings before a corpus ships to training.
    * Patterns kept RE2-compatible so DuckDB reproduces them. */
  def textPiiMaskOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"),
            "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+", "<EMAIL>"),
          "[0-9]{6,}", "<NUM>").as("masked"),
        (length(col("text")) -
          length(regexp_replace(col("text"),
            "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+", ""))).as("n_email_chars"))
    // streaming-legal: no orderBy in the library form (see textQualityOn)

  def textPiiMask(s: SparkSession, dir: String): DataFrame =
    textPiiMaskOn(Tables.documents(s, dir)).orderBy("doc_id")

  /** L4i capstone: the corpus-cleaning pipeline a training-data prep
    * job runs end-to-end, composed from the library ops as ONE lazy
    * plan: (1) PII-mask the text, (2) quality-score the masked text
    * and keep only passing docs, (3) normalized-hash dedup among the
    * keepers (keeper = min doc_id per normalized content), (4) emit
    * the surviving documents with their quality stats. Shuffles: one
    * groupBy for the dedup + the output sort — masking and scoring
    * are map-only. */
  def corpusCleanOn(docs: DataFrame): DataFrame = {
    val masked = textPiiMaskOn(docs)
      .select(col("doc_id"), col("masked").as("text"))
    val scored = textQualityOn(masked)
    val kept = masked.join(
      scored.filter(col("keep"))
        .select(col("doc_id"), col("n_tokens"), col("stop_ratio")),
      "doc_id")
    val keepers = dedupNormalizedOn(kept)
      .select(col("keeper_doc_id").as("doc_id"), col("n_variants"))
    kept.join(keepers, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("stop_ratio"),
        col("n_variants"))
      .orderBy("doc_id")
  }

  def corpusClean(s: SparkSession, dir: String): DataFrame =
    corpusCleanOn(Tables.documents(s, dir))

  /** L4e: corpus vocabulary — global token frequencies, top 50 by
    * count (wordcount + TakeOrderedAndProject; at 100 TB this is the
    * classic two-level partial-agg shape). */
  def textVocab(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(toks(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(50)

  /** L4l: corpus heavy hitters — every token whose frequency exceeds
    * total/capacity, by the two-pass sketch-then-verify plan: pass 1
    * folds the token stream into ONE [[graft.plans.MisraGriesAgg]]
    * Misra-Gries sketch, so the shuffle carries at most `capacity`
    * counter slots per partial aggregate instead of the vocabulary;
    * pass 2 re-scans the corpus with the candidate list broadcast
    * back, counts ONLY candidate tokens exactly, and keeps
    * cnt * capacity > total. The MG under-count bound
    * (< total/(capacity+1)) guarantees every true heavy hitter is in
    * the candidate set, so the result equals the exact HAVING query
    * the oracle runs — while at 100 TB the exact-groupBy spelling
    * shuffles a web-scale power-law vocabulary and this plan shuffles
    * `capacity` slots plus the candidate-only recount (the second
    * scan's join is a broadcast semi-filter evaluated before any
    * shuffle). CustomAggSpec proves the guarantee where it is under
    * pressure: capacity far below the distinct-key count, skewed
    * counts, and partition-order races. */
  def heavyHittersOn(docs: DataFrame, capacity: Int = 200): DataFrame =
    heavyHitterTokensOn(
      docs.select(explode(toks(col("text"))).as("token")), capacity)

  /** Token-stream form of [[heavyHittersOn]]: input is any
    * single-string-column frame; both passes scan it. */
  def heavyHitterTokensOn(tokens: DataFrame, capacity: Int): DataFrame = {
    val tok = col(tokens.columns.head)
    val cand = tokens
      .agg(graft.plans.MisraGriesAgg.sketch(tok, capacity).as("s"))
      .select(explode(col("s.cands")).as("token"), col("s.total").as("total"))
    tokens.select(tok.as("token")).join(broadcast(cand), "token")
      .groupBy("token", "total")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * capacity > col("total"))
      .select(col("token"), col("cnt"))
      .orderBy("token")
  }

  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    heavyHittersOn(Tables.documents(s, dir))

  val CmsD = 3 // Count-Min hash rows
  val CmsW = 16 // buckets per row — deliberately tiny so collisions occur

  /** The D (d, bucket) cells a token hashes to, as an exploded array:
    * bucket = affine(polyHash(tok)) mod W, same (2d+3, 97d+31) affine
    * family as the minhash slots so every constant is already pinned
    * by the dedup oracles. */
  private[graft] def cmsCells(tok: Column): Column = {
    val h = polyHash(tok)
    explode(array((0 until CmsD).map(d =>
      struct(lit(d).as("d"),
        (((h * (2 * d + 3) + (97 * d + 31)) % P) % CmsW).as("bkt"))): _*))
  }

  /** L4n: Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency
    * estimates in FIXED memory, the companion to the Misra-Gries
    * heavy-hitter sketch: MG answers "which tokens are frequent",
    * CMS answers "how frequent is this token" for ANY token. Each
    * partition folds its token stream into a D x W counter grid
    * map-side (the cell aggregate is an ordinary sum, mergeable
    * by +), so exactly D*W counters cross the shuffle regardless of
    * corpus or vocabulary size — the property that makes the sketch
    * the 100 TB tool where exact per-token counts shuffle a web-scale
    * power-law vocabulary. Estimate = min over the D cells a token
    * hashes to; always >= exact, over by at most the colliding mass
    * in the best cell (<= total/W per row in expectation).
    *
    * W is deliberately small (16) so the synthetic vocabulary
    * actually collides and the min-over-rows estimate is exercised
    * (CustomAggSpec pins est >= exact and at least one true
    * overestimate). The exact count beside the estimate exists to
    * MEASURE the sketch at catalog scale — a real deployment ships
    * only the D x W grid and skips the token-keyed shuffle entirely. */
  def textCountminOn(docs: DataFrame): DataFrame = {
    val tokens = docs.select(explode(toks(col("text"))).as("tok"))
    // the sketch proper: stream -> cells -> one D*W-key aggregate
    val sketch = tokens
      .select(cmsCells(col("tok")).as("x"))
      .groupBy(col("x.d").as("d"), col("x.bkt").as("bkt"))
      .agg(count(lit(1)).as("bc"))
    // measurement side: exact vocabulary counts, probed against the
    // (broadcast, D*W-row) grid the same way a reader would probe
    val est = tokens.groupBy("tok").agg(count(lit(1)).as("n_exact"))
      .select(col("tok"), col("n_exact"), cmsCells(col("tok")).as("x"))
      .select(col("tok"), col("n_exact"),
        col("x.d").as("d"), col("x.bkt").as("bkt"))
      .join(broadcast(sketch), Seq("d", "bkt"))
      .groupBy("tok")
      .agg(max(col("n_exact")).as("n_exact"), min(col("bc")).as("n_est"))
    est.orderBy("tok")
  }

  def textCountmin(s: SparkSession, dir: String): DataFrame =
    textCountminOn(Tables.documents(s, dir))

  /** L4o: head-coverage curve — what fraction of the token MASS the
    * top-k vocabulary types cover, at k = powers of two: the curve
    * that sizes a tokenizer vocabulary or an embedding table ("32k
    * types cover 99.5% of tokens; the tail is <unk>"). One
    * token-keyed count (map-side combined), then rank + running mass
    * on the VOCABULARY relation — a global window, but over a
    * language-bounded relation that does not grow with corpus bytes
    * (the same justification as the k-means seed window; the
    * quarantined single-partition forms are the ROW-keyed ones).
    * Ratios are integer ppm (mass sums are exact BIGINTs). */
  def textCoverageCurveOn(docs: DataFrame): DataFrame = {
    val vocab = docs
      .select(explode(toks(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val ranked = Guards.requireBounded(vocab, 1L << 24,
        "text_coverage_curve vocabulary")
      .withColumn("rk", row_number().over(
        Window.partitionBy(Guards.one)
          .orderBy(col("cnt").desc, col("token"))))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(Guards.one).orderBy(col("rk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = vocab.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_types"))
    val ks = Seq(1, 2, 4, 8, 16, 32, 64)
    ranked.crossJoin(broadcast(tot))
      .select(explode(array(ks.map(lit(_)): _*)).as("k"),
        col("rk"), col("cum"), col("total"), col("n_types"))
      .filter(col("rk") <= col("k"))
      .groupBy("k")
      .agg(max(col("rk")).as("n_types_used"),
        max(col("cum")).as("mass"),
        max(col("total")).as("total"))
      .select(col("k"), col("n_types_used"),
        expr("mass * 1000000 div total").as("coverage_ppm"))
      .orderBy("k")
  }

  def textCoverageCurve(s: SparkSession, dir: String): DataFrame =
    textCoverageCurveOn(Tables.documents(s, dir))

  /** L4m: group-relative quality cut — keep documents strictly above
    * their language's median length, the "top half per group" filter
    * real curation pipelines apply so a verbose language's floor does
    * not become a terse language's ceiling. Shape: tiny per-lang
    * stats aggregate, broadcast back, map-side filter — the corpus is
    * scanned twice but never shuffled by document (the feat_scale
    * two-scan recipe). The default exact `percentile` keeps the
    * oracle bit-exact (medians of ints are k or k+0.5, both exact
    * doubles) but buffers each group's values on one reducer;
    * `approxAccuracy = Some(acc)` swaps in the percentile_approx
    * Greenwald-Khanna sketch (mergeable, map-side combined) — the
    * 100 TB operating mode, with its cut-set drift bounded by
    * RobustnessSpec at two scale factors. */
  def qualityFilterRelativeOn(docs: DataFrame,
      approxAccuracy: Option[Int] = None): DataFrame = {
    val cut = docs.groupBy("lang")
      .agg(approxAccuracy match {
        case Some(acc) =>
          percentile_approx(col("n_chars"), lit(0.5), lit(acc))
            .cast("double").as("median_chars")
        case None => expr("percentile(n_chars, 0.5)").as("median_chars")
      })
    docs.join(broadcast(cut), "lang")
      .filter(col("n_chars") > col("median_chars"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("median_chars"))
      .orderBy("doc_id")
  }

  def qualityFilterRelative(s: SparkSession, dir: String): DataFrame =
    qualityFilterRelativeOn(Tables.documents(s, dir))

  /** L4k: inverted-index (postings) construction — per token: document
    * frequency, total term count, and a "doc:tf:first_pos" postings
    * string sorted by doc id — the retrieval-side artifact curation
    * pipelines build for exact decontamination lookups and corpus
    * audit queries. Two-level aggregation: (token, doc) partials, then
    * a per-token fold — both map-side combined, so the shuffle carries
    * one row per (token, doc), never raw positions. The postings
    * string assembles from an array_sort'd struct list, making output
    * bytes deterministic under any partitioning. At 100 TB the
    * per-token list is the skew axis: stopword-grade tokens are
    * dropped by `maxDf` (the dedup_ngram df-cap lever) BEFORE the
    * string materializes, bounding the largest aggregation state —
    * df comes from a window over the (token, doc) partials (one row
    * per pair, so rows-per-token == df), whose token exchange is the
    * same partitioning the final fold needs: the early filter costs
    * no extra shuffle. */
  def invertedIndexOn(docs: DataFrame, maxDf: Long = Long.MaxValue): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), posexplode(toks(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"), min(col("pos")).as("p0"))
    perDoc
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy("token")))
      .filter(col("df") <= maxDf)
      .groupBy("token")
      .agg(max(col("df")).as("df"), sum(col("tf")).as("tf_total"),
        collect_list(struct(col("doc_id"), col("tf"), col("p0"))).as("ps"))
      .select(col("token"), col("df"), col("tf_total"),
        concat_ws(",", transform(array_sort(col("ps")),
          e => concat_ws(":", e("doc_id"), e("tf"), e("p0")))).as("postings"))
      .orderBy("token")
  }

  def textInvertedIndex(s: SparkSession, dir: String): DataFrame =
    invertedIndexOn(Tables.documents(s, dir))

  /** The catalog's fixed BM25 query set: (query_id, terms). Library
    * callers pass their own. */
  val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("spark", "join"),
    1 -> Seq("filter", "window"),
    2 -> Seq("hash", "merge", "batch"))

  /** L4f2: BM25 ranked retrieval (Robertson & Zaragoza 2009; the
    * Lucene `1 + (N - df + 0.5)/(df + 0.5)` inside the log, so idf is
    * always positive) — the ranking function behind every "find the
    * docs matching this contamination probe / eval query" lookup that
    * tf-idf cosine under-serves because it ignores length
    * normalization and tf saturation.
    *
    * Scale shape: the query term set is tiny and broadcast, so the
    * token explode FILTERS to query terms before any shuffle — the
    * corpus-sized aggregation is one map-side-combined (doc, term)
    * count over matching tokens only. df/avgdl are term-count-sized
    * and one-row relations crossing by broadcast. Per-(doc, term)
    * contributions are per-row double math quantized to integer
    * micro-units at the row boundary (floor(x·1e6 + ½)), so the
    * per-doc score is an order-free BIGINT sum — the graph_modularity
    * determinism recipe — and the top-k per query is one bounded
    * window over docs that matched at least one term. */
  def textBm25On(docs: DataFrame,
      queries: Seq[(Int, Seq[String])] = Bm25Queries, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = queries.flatMap(_._2).distinct
    val withDl = docs.select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        size(col("t")).cast("long").as("dl"))
    val st = withDl.agg(count(lit(1)).as("n"), sum(col("dl")).as("total"))
    val tf = withDl
      .select(col("doc_id"), col("dl"), explode(col("t")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val qRel = queries.flatMap { case (qid, ts) => ts.map((qid, _)) }
      .toDF("query_id", "token")
    val contrib = tf
      .join(broadcast(dfRel), "token").join(broadcast(qRel), "token")
      .crossJoin(broadcast(st))
      .withColumn("idf", log(lit(1.0) +
        (col("n").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("c_micro", floor(lit(1000000.0) * col("idf") *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl") * col("n").cast("double") /
            col("total").cast("double"))) + lit(0.5)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    contrib
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("c_micro")).as("score_micro"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }

  def textBm25(s: SparkSession, dir: String): DataFrame =
    textBm25On(Tables.documents(s, dir))

  /** L4f: TF-IDF — tf per (doc, token), df per token, idf = ln(N/df).
    * All counts integral; the one transcendental (ln) is rounded at
    * the boundary. The scalar N crosses via broadcast cross-join. */
  def textTfidf(s: SparkSession, dir: String): DataFrame =
    tfidfScored(s, dir)
      .filter(col("doc_id") < 20)
      .select("doc_id", "token", "tf", "df", "tfidf")
      .orderBy("doc_id", "token")

  /** Shared TF-IDF scoring relation (one row per (doc, token)) —
    * feeds both the sampled dump ([[textTfidf]]) and the per-doc
    * keyword ranking ([[textKeywords]]). */
  private def tfidfScored(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // df as a window count over tf (tf has one row per (doc, token),
    // so rows-per-token == docs-per-token): the groupBy+join spelling
    // re-ran tf's whole subtree — scan and explode included — as the
    // join's build side; the window computes df from tf's own
    // exchange, one corpus pass instead of two
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy("token")))
    withDf
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"))
  }

  /** L4f2: keyword extraction — the top-3 TF-IDF tokens per document,
    * the per-doc summary a retrieval index or a topic labeler wants.
    * Rank = row_number per doc over (tfidf DESC, token) — the tie
    * break on the token string makes the cut deterministic where the
    * synthetic corpus produces equal scores. The rank-then-filter
    * shape optimizes to WindowGroupLimit (partial top-k BEFORE the
    * shuffle, the sample_domain_cap plan pin), so at 100 TB each
    * partition forwards at most 3 rows per doc rather than every
    * (doc, token) pair. Ranking happens on the already-ROUNDED score
    * (6 dp, the oracle boundary) so both engines order identical
    * doubles. */
  def textKeywords(s: SparkSession, dir: String): DataFrame =
    tfidfScored(s, dir)
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("token"))))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("token"), col("tfidf"))
      .orderBy("doc_id", "rk")

  /** L4g: deterministic train/val/test assignment by content hash —
    * the reproducible split every training pipeline needs (never
    * rand(): re-runs and late-arriving shards must agree). */
  def textSplitAssign(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), (polyHash(col("text")) % 100).as("bucket"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")

  /** L4j: repetition signals (the Gopher-style repetition filters):
    * the fraction of a document's tokens taken by its most frequent
    * token and by its most frequent word 2-gram — boilerplate and
    * degenerate generations score high and get dropped before
    * training. Two per-doc partial aggregations (unigram and bigram
    * counts), each map-side combined — no all-pairs, no windows; at
    * 100 TB this is two wordcount-shaped passes. */
  def textRepetitionOn(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), toks(col("text")).as("t"))
    val top1 = base
      .select(col("doc_id"), size(col("t")).as("n_tokens"),
        explode(col("t")).as("tok"))
      .groupBy("doc_id", "n_tokens", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n_tokens").agg(max(col("c")).as("top_tok_cnt"))
    // word bigrams WITH multiplicity (the distinct-shingle expression
    // would collapse repeats, which is exactly the signal here)
    val top2 = base
      .select(col("doc_id"), explode(bigramStructs(col("t"))).as("bgs"))
      .select(col("doc_id"),
        concat(col("bgs.w1"), lit(" "), col("bgs.w2")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_bigram_cnt"))
    top1.join(top2, Seq("doc_id"), "left")
      .withColumn("top_bigram_cnt",
        coalesce(col("top_bigram_cnt"), lit(0L)))
      .withColumn("nb", greatest(col("n_tokens") - 1, lit(1)))
      // 6-decimal half-away rounding of both fractions in EXACT
      // BIGINT ((a*2e6 + b) div (2b)), one IEEE division by 1e6 at
      // the end — round(a/b, 6) on the double quotient is the
      // ts_gapfill ulp-tie hazard; the 0.2 thresholds compare the
      // SAME integers (frac < 0.2 <=> e6 < 200000 exactly)
      .withColumn("te6",
        expr("(top_tok_cnt * 2000000 + n_tokens) div (2 * n_tokens)"))
      .withColumn("be6",
        expr("(top_bigram_cnt * 2000000 + nb) div (2 * nb)"))
      .select(col("doc_id"), col("n_tokens"), col("top_tok_cnt"),
        (col("te6") / 1000000.0).as("top_tok_frac"),
        col("top_bigram_cnt"),
        (col("be6") / 1000000.0).as("top_bigram_frac"),
        (col("te6") < 200000L && col("be6") < 200000L).as("rep_ok"))
      .orderBy("doc_id")
  }

  def textRepetition(s: SparkSession, dir: String): DataFrame =
    textRepetitionOn(Tables.documents(s, dir))

  /** L4g: fixed-token-window chunking with overlap — long documents
    * split into `window`-token chunks every `stride` tokens, the
    * standard pre-tokenization step before sequence packing (cf.
    * [[Corpus.packSequences]]). Map-only: per-row sequence + slice,
    * no shuffle except the contract orderBy — embarrassingly parallel
    * at 100 TB, and chunk counts grow with document length, not corpus
    * size. */
  def textChunkOn(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("n"))
      // last chunk index = ceil(max(n - window, 0) / stride); every
      // token lands in some chunk, tail chunks may run short
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0L),
          greatest(ceil((col("n") - lit(window)).cast("double") / lit(stride)),
            lit(0L)))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ",
          slice(col("t"), (col("chunk_id") * stride + 1).cast("int"),
            lit(window))).as("chunk_text"),
        least(lit(window.toLong), col("n") - col("chunk_id") * stride)
          .as("n_chunk_toks"))
      .orderBy("doc_id", "chunk_id")
  }

  def textChunk(s: SparkSession, dir: String): DataFrame =
    textChunkOn(Tables.documents(s, dir))

  /** L4h: corpus-LM quality score — average bigram log-likelihood of
    * each document under an add-one-smoothed bigram model fitted on
    * the corpus itself (the cheap stand-in for "perplexity under a
    * small reference LM" that real pipelines filter on; gibberish and
    * boilerplate both surface as outliers). Two wordcount-shaped
    * aggregations (bigram + prefix counts) joined back to the bigram
    * stream — all map-side-combinable shuffles on token keys; the
    * model tables stay small (vocab-sized) and broadcast at scale.
    *
    * Cross-engine determinism: ln() on integers is IEEE-double in both
    * engines; the per-doc sum folds in token order on both sides
    * (sorted collect + left fold, not an unordered SUM) and the single
    * round(4) boundary absorbs any last-ulp libm differences. */
  def textLmScoreOn(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), toks(col("text")).as("t"))
    val bg = base
      .select(col("doc_id"), posexplode(bigramStructs(col("t"))))
      .select(col("doc_id"), col("pos"), col("col.w1").as("w1"),
        col("col.w2").as("w2"))
    val bigramCnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val prefixCnt = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = base
      .select(explode(col("t")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val scored = bg
      .join(bigramCnt, Seq("w1", "w2"))
      .join(prefixCnt, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("pos"),
        (log(col("c12") + 1) - log(col("c1") + col("v"))).as("lp"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("lp")))),
            x => x("lp")),
          lit(0.0), (acc, x) => acc + x).as("sum_lp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sum_lp") / col("n_bigrams"), 4).as("avg_logprob"))
      .orderBy("doc_id")
  }

  def textLmScore(s: SparkSession, dir: String): DataFrame =
    textLmScoreOn(Tables.documents(s, dir))

  /** Minimum bigram support for [[textCollocationsOn]]. */
  val CollocMinCount = 5L

  /** L4q: collocation extraction — the corpus's most associated
    * adjacent word pairs, ranked by LIFT (= exp(PMI); Church & Hanks
    * 1990's association-ratio spelled without the log so it stays
    * EXACT integer): lift_ppm = 10⁶·c₁₂·T² / (B·c₁·c₂) with c₁₂ the
    * bigram count over B total bigrams and c₁,c₂ unigram counts over
    * T total tokens. The standard corpus-analysis readout behind
    * stop-phrase lists, multi-word-expression vocab entries, and
    * tokenizer-merge sanity checks ("did BPE learn the corpus's real
    * collocations?") — reads beside text_bpe_merges, which greedily
    * merges the FREQUENT pairs while this ranks the ASSOCIATED ones.
    *
    * Shape: the token stream collapses immediately to three count
    * relations — bigram counts (vocab²-bounded post-support-filter),
    * unigram counts (vocab-bounded), and two single-row totals riding
    * broadcasts — then one vocab-keyed join pair; every shuffle is
    * map-side-combinable wordcount. The min-support filter (≥ 5)
    * fires BEFORE the unigram joins, so hapax noise (lift explodes
    * for two words seen exactly once, together) never reaches the
    * join. Numerator magnitude: c₁₂·T²·10⁶ inside DECIMAL(38,0) —
    * exact to ~3·10¹² total tokens; past that, run per-domain shards
    * (the corpus_mix split) and union. Top-50 by (lift desc, w1, w2)
    * is a TakeOrdered, not a global sort. */
  def textCollocationsOn(docs: DataFrame,
      minCount: Long = CollocMinCount): DataFrame = {
    val base = docs.select(col("doc_id"), toks(col("text")).as("t"))
    val bg = base.select(posexplode(bigramStructs(col("t"))))
      .select(col("col.w1").as("w1"), col("col.w2").as("w2"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val nb = bg.agg(count(lit(1)).as("nb"))
    val un = base.select(explode(col("t")).as("w"))
    val uc = un.groupBy("w").agg(count(lit(1)).as("c"))
    val nt = un.agg(count(lit(1)).as("nt"))
    bc.filter(col("c12") >= minCount)
      .join(uc.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uc.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nb))
      .crossJoin(broadcast(nt))
      .select(col("w1"), col("w2"), col("c12"),
        expr("""CAST(CAST(c12 AS DECIMAL(38,0)) * nt * nt * 1000000
               | DIV (CAST(nb AS DECIMAL(38,0)) * c1 * c2)
               | AS BIGINT)""".stripMargin).as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(50)
  }

  def textCollocations(s: SparkSession, dir: String): DataFrame =
    textCollocationsOn(Tables.documents(s, dir))

  /** L4n: BPE-style tokenizer merge induction — the first `merges`
    * byte-pair merges learned from the corpus (Sennrich et al. 2016,
    * the standard subword-tokenizer training step a corpus pipeline
    * runs before tokenizing). The working set is the WORD-FREQUENCY
    * table, the standard BPE trick: one initial wordcount collapses
    * the token stream to (symbol-array, freq) vocabulary rows, and
    * every later stage — pair counts (freq-weighted sums, identical
    * totals to counting raw instances), the global argmax (count
    * desc, then lexicographic pair — a 1-row TakeOrdered, no global
    * sort), and the greedy left-to-right remerge (a codegen'd
    * `aggregate` fold with the 1-row winner broadcast) — touches only
    * vocabulary-sized data. At 100 TB the corpus is scanned ONCE;
    * merge rounds cost vocabulary passes, not corpus passes. Rounds
    * are driver-coordinated like [[Similarity.kmeansOn]]'s Lloyd's
    * loop, with the word relation re-materialized per round so plans
    * stay constant-size.
    * All counts BIGINT, ties total-ordered: the DuckDB oracle unrolls
    * every round bit-for-bit (same fold, verified greedy-equivalent:
    * pair (a,a) on "aaaa" -> [aa][aa] in both engines). If a round
    * has no remaining pair the surviving rounds are emitted and the
    * rest degrade to zero rows — identically in the oracle. */
  /** Shared BPE induction loop over the word-frequency table: returns
    * (ranked merges, final word relation (w, cs, freq)). `remergeLast`
    * skips the final vocabulary rebuild when only the merge LIST is
    * needed ([[textBpeMergesOn]]); the encoder needs the rebuilt
    * vocabulary after every round. */
  private def bpeLoop(docs: DataFrame, merges: Int,
      remergeLast: Boolean): (DataFrame, DataFrame) = {
    require(merges >= 1, s"need merges >= 1, got $merges")
    var words = docs
      .select(explode(toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), split(col("w"), "").as("cs"), col("freq"))
      .localCheckpoint(true)
    var out: DataFrame = null
    for (r <- 1 to merges) {
      val top = words
        .select(col("freq"), explode(bigramStructs(col("cs"))).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("w1"), col("w2"))
        .limit(1)
        .localCheckpoint(true) // 1 row; feeds the output AND the rebuild
      val ranked = top.select(lit(r).as("rank"), col("w1"), col("w2"),
        col("cnt"))
      out = if (out == null) ranked else out.unionByName(ranked)
      if (r < merges || remergeLast)
        words = words.crossJoin(broadcast(top.select("w1", "w2")))
          .select(col("w"), aggregate(col("cs"), array().cast("array<string>"),
            (acc, x) => when(size(acc) > 0 &&
                element_at(acc, -1) === col("w1") && x === col("w2"),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(col("w1"), col("w2")))))
              .otherwise(concat(acc, array(x)))).as("cs"), col("freq"))
          .localCheckpoint(true)
    }
    (out.orderBy("rank"), words)
  }

  def textBpeMergesOn(docs: DataFrame, merges: Int = 3): DataFrame =
    bpeLoop(docs, merges, remergeLast = false)._1

  def textBpeMerges(s: SparkSession, dir: String): DataFrame =
    textBpeMergesOn(Tables.documents(s, dir))

  /** L4o: BPE tokenizer APPLY — encode every document with the merges
    * [[textBpeMergesOn]] just induced, closing the tokenizer loop
    * (train → encode → count): per doc, the whitespace token count
    * and the subword-symbol count after the merge rounds. The apply
    * is vocabulary-level — each UNIQUE word is encoded once (the
    * merge fold runs over the word table, never the token stream),
    * then the token stream joins the (word → n_sym) encode table and
    * aggregates per doc. At 100 TB that join shuffles on the word —
    * Zipf-skewed, but the encode side is one row per word and the
    * stream side carries two longs, and AQE skew-split handles the
    * hot words; the corpus text itself is scanned exactly once. */
  def textBpeEncodeOn(docs: DataFrame, merges: Int = 3): DataFrame = {
    val words = bpeLoop(docs, merges, remergeLast = true)._2
    val enc = words.select(col("w"), size(col("cs")).cast("long").as("n_sym"))
    docs.select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .join(enc, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_sym")).as("n_symbols"))
      .orderBy("doc_id")
  }

  def textBpeEncode(s: SparkSession, dir: String): DataFrame =
    textBpeEncodeOn(Tables.documents(s, dir))

  /** L4l': tokenizer fertility by language — symbols emitted per
    * whitespace word under the trained BPE vocabulary, the standard
    * cross-lingual tokenizer-fairness readout (a language whose
    * fertility is 2× another's pays 2× the context budget per word;
    * the metric multilingual-tokenizer evaluations report): per
    * language, Σ n_symbols over Σ words in exact milli, off the SAME
    * per-doc encode relation as [[textBpeEncodeOn]] plus one
    * broadcast-sized lang join and a |langs|-row rollup. */
  def textBpeFertilityOn(docs: DataFrame, merges: Int = 3): DataFrame =
    textBpeEncodeOn(docs, merges)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_words"),
        sum(col("n_symbols")).as("n_symbols"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_symbols"),
        expr("CAST(n_symbols * 1000 DIV n_words AS BIGINT)")
          .as("fertility_milli"))
      .orderBy("lang")

  def textBpeFertility(s: SparkSession, dir: String): DataFrame =
    textBpeFertilityOn(Tables.documents(s, dir))

  /** L4m: feature hashing (the "hashing trick", Weinberger et al.
    * 2009 — the HashingVectorizer / Vowpal Wabbit featurizer): tokens
    * map to a FIXED 2^b feature space by hash, with a second hash bit
    * choosing ±1 so collisions cancel in expectation instead of
    * biasing upward; per-doc features are the signed counts, zeros
    * dropped. The point at 100 TB: the feature space needs NO
    * vocabulary pass, no dictionary broadcast, and never grows — the
    * one-scan, bounded-schema featurizer for streaming/incremental
    * corpora, vs text_tfidf's two-pass vocabulary shape. One
    * map-side-combined (doc, bucket) rollup; long-form output is the
    * sparse-matrix exchange format the trainer consumes. */
  def textHashedFeaturesOn(docs: DataFrame, bitsLog2: Int = 8): DataFrame = {
    require(bitsLog2 >= 1 && bitsLog2 <= 24, s"bad bitsLog2 $bitsLog2")
    val m = 1L << bitsLog2
    docs
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .select(col("doc_id"), polyHash(col("tok")).as("h"))
      .select(col("doc_id"), (col("h") % m).as("bucket"),
        when(expr(s"(h div $m) % 2") === 0, 1L).otherwise(-1L).as("sgn"))
      .groupBy("doc_id", "bucket").agg(sum(col("sgn")).as("w"))
      .filter(col("w") =!= 0)
      .orderBy("doc_id", "bucket")
  }

  def textHashedFeatures(s: SparkSession, dir: String): DataFrame =
    textHashedFeaturesOn(Tables.documents(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_hashed_features" -> textHashedFeatures,
    "text_chunk" -> textChunk,
    "text_lm_score" -> textLmScore,
    "text_collocations" -> textCollocations,
    "text_bpe_merges" -> textBpeMerges,
    "text_bpe_encode" -> textBpeEncode,
    "text_bpe_fertility" -> textBpeFertility,
    "text_repetition" -> textRepetition,
    "dedup_normalized" -> dedupNormalized,
    "text_pii_mask" -> textPiiMask,
    "corpus_clean" -> corpusClean,
    "text_vocab" -> textVocab,
    "text_heavy_hitters" -> heavyHitters,
    "text_countmin" -> textCountmin,
    "text_keywords" -> textKeywords,
    "text_coverage_curve" -> textCoverageCurve,
    "quality_filter_relative" -> qualityFilterRelative,
    "text_inverted_index" -> textInvertedIndex,
    "text_tfidf" -> textTfidf,
    "text_bm25" -> textBm25,
    "quality_gopher" -> qualityGopher,
    "quality_filter_funnel" -> qualityFilterFunnel,
    "text_boilerplate" -> textBoilerplate,
    "text_split_assign" -> textSplitAssign,
    "text_tokens" -> textTokens,
    "text_readability" -> textReadability,
    "text_quality" -> textQuality,
    "text_langid" -> textLangid,
    "text_langid_eval" -> textLangidEval,
    "text_fingerprint" -> textFingerprint,
    "text_novelty" -> textNovelty,
    "quality_logreg" -> qualityLogreg,
    "sample_uncertainty" -> sampleUncertainty,
    "text_js_divergence" -> textJsDivergence,
    "quality_auc" -> qualityAuc,
    "quality_rater_kappa" -> qualityRaterKappa,
    "quality_ece" -> qualityEce,
    "quality_threshold_sweep" -> qualityThresholdSweep,
    "quality_kappa" -> qualityKappa,
  )

  private def sqlHits(words: Seq[String]): String =
    s"len(list_filter(string_split(text,' '), w -> w IN (${words.map(w => s"'$w'").mkString(",")})))"

  /** The Gopher rule CTE chain ending in `r(doc_id, n_tokens, n_stop,
    * c_max, r_count, r_len, r_stop, r_rep)` — shared by the
    * quality_gopher and quality_filter_funnel oracles. */
  private lazy val gopherRulesSql: String =
    s"""b AS (SELECT doc_id,
       |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
       |    CAST(length(text) - len(string_split(text,' ')) + 1 AS BIGINT)
       |      AS n_tok_chars,
       |    CAST(${sqlHits(enStop)} AS BIGINT) AS n_stop,
       |    CAST(list_max(list_transform(
       |        list_distinct(string_split(text,' ')),
       |        w -> len(list_filter(string_split(text,' '),
       |          x -> x = w)))) AS BIGINT) AS c_max
       |  FROM documents),
       |r AS (SELECT doc_id, n_tokens, n_stop, c_max,
       |    (n_tokens >= 10 AND n_tokens <= 10000) AS r_count,
       |    (n_tok_chars >= n_tokens * 2 AND n_tok_chars <= n_tokens * 8)
       |      AS r_len,
       |    (n_stop >= 2) AS r_stop,
       |    (c_max * 4 <= n_tokens) AS r_rep
       |  FROM b)""".stripMargin

  /** The langid decision CASE, shared by the text_langid and
    * text_langid_eval oracles (mirrors [[textLangidOn]]'s rule). */
  private lazy val langidPredSql: String =
    s"""CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
       |       WHEN ${sqlHits(enStop)} >= GREATEST(${sqlHits(deStop)}, ${sqlHits(esStop)}, ${sqlHits(frStop)}) THEN 'en'
       |       WHEN ${sqlHits(deStop)} >= GREATEST(${sqlHits(esStop)}, ${sqlHits(frStop)}) THEN 'de'
       |       WHEN ${sqlHits(esStop)} >= ${sqlHits(frStop)} THEN 'es'
       |       ELSE 'fr' END""".stripMargin

  /** DuckDB mirror of [[polyHash]] over an arbitrary string SQL
    * expression (shared across module oracles). */
  private[functions] def polySqlOf(e: String): String =
    s"""list_reduce(
       |  list_concat([CAST(0 AS BIGINT)],
       |    list_transform(string_split($e,''), c -> CAST(unicode(c) AS BIGINT))),
       |  (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  private[functions] val polySql = polySqlOf("text")

  /** One unrolled BPE round for the oracle: pair counts over `prev`,
    * 1-row argmax, merged word relation. The fold mirrors
    * [[textBpeMergesOn]]'s greedy left-to-right merge exactly. */
  private def bpeRoundSql(i: Int, prev: String): String =
    s"""p$i AS (SELECT cs[r.i] AS w1, cs[r.i + 1] AS w2,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM $prev, UNNEST(range(1, len(cs))) r(i) GROUP BY 1, 2),
       |m$i AS (SELECT w1, w2, cnt FROM p$i
       |  ORDER BY cnt DESC, w1, w2 LIMIT 1),
       |w$i AS (SELECT list_reduce(
       |    list_concat([CAST([] AS VARCHAR[])], list_transform(cs, c -> [c])),
       |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m$i.w1
       |        AND x[1] = m$i.w2
       |      THEN list_concat(acc[1:len(acc)-1], [m$i.w1 || m$i.w2])
       |      ELSE list_concat(acc, x) END) AS cs
       |  FROM $prev, m$i)""".stripMargin

  /** One unrolled VOCABULARY-level BPE round for the encode oracle:
    * freq-weighted pair counts (identical totals to instance counts,
    * so the same winner as [[bpeRoundSql]]), then the fold rebuilds
    * every unique word — mirroring [[bpeLoop]] with remergeLast. */
  private def bpeVocabRoundSql(i: Int, prev: String): String =
    s"""p$i AS (SELECT cs[r.i] AS w1, cs[r.i + 1] AS w2,
       |    CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM $prev, UNNEST(range(1, len(cs))) r(i) GROUP BY 1, 2),
       |n$i AS (SELECT w1, w2 FROM p$i ORDER BY cnt DESC, w1, w2 LIMIT 1),
       |v$i AS (SELECT w, list_reduce(
       |    list_concat([CAST([] AS VARCHAR[])], list_transform(cs, c -> [c])),
       |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = n$i.w1
       |        AND x[1] = n$i.w2
       |      THEN list_concat(acc[1:len(acc)-1], [n$i.w1 || n$i.w2])
       |      ELSE list_concat(acc, x) END) AS cs, freq
       |  FROM $prev, n$i)""".stripMargin

  /** DuckDB mirror of [[textLmScoreOn]] as a reusable CTE chain ending
    * in `per(doc_id, n_bigrams, sum_lp)` — shared by the text_lm_score
    * oracle and [[Corpus]]'s corpus_doremi oracle. */
  private[graft] val lmScoreCoreSql: String =
    """tk AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
      |bg AS (SELECT doc_id, i AS pos, t[i] AS w1, t[i+1] AS w2
      |       FROM tk, UNNEST(range(1, len(t))) AS r(i)
      |       WHERE len(t) >= 2),
      |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
      |uc AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
      |vc AS (SELECT COUNT(DISTINCT w) AS v FROM (
      |       SELECT unnest(t) AS w FROM tk)),
      |sc AS (SELECT doc_id, pos, ln(c12 + 1) - ln(c1 + v) AS lp
      |       FROM bg JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN vc),
      |per AS (SELECT doc_id, COUNT(*) AS n_bigrams,
      |        list_reduce(
      |          list_concat([CAST(0 AS DOUBLE)], list(lp ORDER BY pos)),
      |          (a, b) -> a + b) AS sum_lp
      |        FROM sc GROUP BY doc_id)""".stripMargin

  /** DuckDB mirror of [[corpusCleanOn]]'s mask -> quality-rule ->
    * normalized-exact-dedup chain, ending in `ckept(doc_id, text,
    * n_tokens, stop_ratio, keep)` and `cdedup(doc_id, n_variants)`
    * (names prefixed `c` so the chain composes beside
    * [[logregCoreSql]]'s `scored` in the corpus_pipeline_full
    * oracle). Shared by the corpus_clean and corpus_pipeline_full
    * oracles. */
  private[functions] lazy val cleanChainSql: String =
    s"""masked AS (
       |  SELECT doc_id,
       |    regexp_replace(
       |      regexp_replace(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
       |      '[0-9]{6,}', '<NUM>', 'g') AS text
       |  FROM documents),
       |cscored AS (
       |  SELECT doc_id, text,
       |    CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
       |    CAST(${sqlHits(enStop)} AS DOUBLE)
       |      / len(string_split(text,' ')) AS stop_ratio,
       |    (len(string_split(text,' ')) >= 10
       |     AND CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
       |       / len(string_split(text,' ')) > 0.1
       |     AND CAST(${sqlHits(enStop)} AS DOUBLE)
       |       / len(string_split(text,' ')) > 0.0) AS keep
       |  FROM masked),
       |ckept AS (SELECT * FROM cscored WHERE keep),
       |cdedup AS (
       |  SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_variants
       |  FROM (SELECT doc_id,
       |      sha256(trim(regexp_replace(
       |        regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
       |        ' +', ' ', 'g'))) AS nh
       |    FROM ckept)
       |  GROUP BY nh)""".stripMargin

  /** DuckDB mirror of [[qualityLogregOn]]'s training + scoring as a
    * reusable CTE chain ending in `scored(doc_id, y, p_ppm)` — shared
    * by the quality_logreg and quality_auc oracles. */
  private[functions] lazy val logregCoreSql: String = {
    val sig = "round(1.0/(1.0+exp(-((w.w0 + w.w1*x1 + w.w2*x2)" +
      "/1000000.0))), 9)"
    def stepSql(k: Int, prev: String): String =
      s"""p$k AS (SELECT y, x1, x2, w.w0, w.w1, w.w2, $sig AS p
         |  FROM feat, $prev w),
         |s$k AS MATERIALIZED (SELECT
         |    MAX(w0) + CAST(FLOOR(4.0 * SUM(CAST(FLOOR((y-p)*1000000+0.5)
         |      AS BIGINT)) / COUNT(*)) AS BIGINT) AS w0,
         |    MAX(w1) + CAST(FLOOR(4.0 * SUM(CAST(FLOOR((y-p)*x1*1000000+0.5)
         |      AS BIGINT)) / COUNT(*)) AS BIGINT) AS w1,
         |    MAX(w2) + CAST(FLOOR(4.0 * SUM(CAST(FLOOR((y-p)*x2*1000000+0.5)
         |      AS BIGINT)) / COUNT(*)) AS BIGINT) AS w2
         |  FROM p$k)""".stripMargin
    s"""feat AS MATERIALIZED (SELECT doc_id,
       |    CAST(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
       |      / len(string_split(text,' ')) > 0.46 AS BIGINT) AS y,
       |    (CAST(${sqlHits(enStop)} AS DOUBLE)
       |      / len(string_split(text,' ')) - 0.0625) * 10 AS x1,
       |    (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
       |      / len(string_split(text,' ')) - 0.46) * 10 AS x2
       |  FROM documents WHERE len(string_split(text,' ')) > 0),
       |s0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |    CAST(0 AS BIGINT) AS w2),
       |${(1 to 8).map(k => stepSql(k, s"s${k - 1}")).mkString(",\n")},
       |scored AS (SELECT doc_id, y,
       |    CAST(FLOOR(p*1000000+0.5) AS BIGINT) AS p_ppm
       |  FROM (SELECT doc_id, y, $sig AS p FROM feat, s8 w))""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // Interpolates the same two annotator rule literals the engine
    // evaluates; one double division on exact integers at the end.
    "quality_kappa" ->
      s"""WITH lab AS (SELECT $KappaRuleA AS a, $KappaRuleB AS b
         |  FROM documents),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_agree,
         |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_keep_a,
         |    CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_keep_b
         |  FROM lab),
         |c AS (SELECT *, n_keep_a * n_keep_b
         |    + (n_docs - n_keep_a) * (n_docs - n_keep_b) AS chance
         |  FROM m)
         |SELECT n_docs, n_agree, n_keep_a, n_keep_b,
         |  CAST(n_agree * n_docs - chance AS BIGINT) AS kappa_num,
         |  CAST(n_docs * n_docs - chance AS BIGINT) AS kappa_den,
         |  CASE WHEN n_docs * n_docs - chance > 0 THEN
         |    CAST(n_agree * n_docs - chance AS DOUBLE)
         |      / (n_docs * n_docs - chance) END AS kappa
         |FROM c""".stripMargin,
    "text_hashed_features" ->
      s"""WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |hh AS (SELECT doc_id, ${polySqlOf("tok")} AS h FROM tk),
         |f AS (SELECT doc_id, h % 256 AS bucket,
         |    CASE WHEN (h // 256) % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM hh)
         |SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS w
         |FROM f GROUP BY 1, 2 HAVING SUM(sgn) <> 0
         |ORDER BY doc_id, bucket""".stripMargin,
    "text_bpe_encode" ->
      s"""WITH v0 AS (SELECT w, string_split(w, '') AS cs,
         |    CAST(COUNT(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  GROUP BY w),
         |${bpeVocabRoundSql(1, "v0")},
         |${bpeVocabRoundSql(2, "v1")},
         |${bpeVocabRoundSql(3, "v2")},
         |enc AS (SELECT w, CAST(len(cs) AS BIGINT) AS n_sym FROM v3),
         |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n_sym) AS BIGINT) AS n_symbols
         |FROM t JOIN enc USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Same trained-vocab CTE chain as text_bpe_encode, rolled up to
    // the per-language fertility ratio.
    "text_bpe_fertility" ->
      s"""WITH v0 AS (SELECT w, string_split(w, '') AS cs,
         |    CAST(COUNT(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  GROUP BY w),
         |${bpeVocabRoundSql(1, "v0")},
         |${bpeVocabRoundSql(2, "v1")},
         |${bpeVocabRoundSql(3, "v2")},
         |enc AS (SELECT w, CAST(len(cs) AS BIGINT) AS n_sym FROM v3),
         |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(n_sym) AS BIGINT) AS n_symbols
         |  FROM t JOIN enc USING (w) GROUP BY doc_id)
         |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(pd.n_tokens) AS BIGINT) AS n_words,
         |  CAST(SUM(pd.n_symbols) AS BIGINT) AS n_symbols,
         |  CAST(SUM(pd.n_symbols) * 1000 // SUM(pd.n_tokens) AS BIGINT)
         |    AS fertility_milli
         |FROM pd JOIN documents d USING (doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "text_bpe_merges" ->
      s"""WITH w0 AS (SELECT string_split(w, '') AS cs
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
         |${bpeRoundSql(1, "w0")},
         |${bpeRoundSql(2, "w1")},
         |${bpeRoundSql(3, "w2")}
         |SELECT * FROM (
         |  SELECT 1 AS rank, w1, w2, cnt FROM m1
         |  UNION ALL SELECT 2 AS rank, w1, w2, cnt FROM m2
         |  UNION ALL SELECT 3 AS rank, w1, w2, cnt FROM m3)
         |ORDER BY rank""".stripMargin,
    "text_inverted_index" ->
      """WITH tk AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |p AS (SELECT doc_id, r.i - 1 AS pos, t[r.i] AS token
        |  FROM tk, UNNEST(range(1, len(t) + 1)) AS r(i)),
        |pd AS (SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
        |    MIN(pos) AS p0
        |  FROM p GROUP BY 1, 2)
        |SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
        |  CAST(SUM(tf) AS BIGINT) AS tf_total,
        |  string_agg(doc_id || ':' || tf || ':' || p0, ','
        |    ORDER BY doc_id) AS postings
        |FROM pd GROUP BY token ORDER BY token""".stripMargin,
    "text_chunk" ->
      """WITH tk AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |c AS (SELECT doc_id, t, len(t) AS n,
        |  unnest(range(0,
        |    GREATEST(CAST(ceil((len(t) - 64) / 48.0) AS BIGINT), 0) + 1))
        |    AS chunk_id
        |  FROM tk)
        |SELECT doc_id, chunk_id,
        |  array_to_string(t[CAST(chunk_id*48+1 AS BIGINT) :
        |    CAST(chunk_id*48+64 AS BIGINT)], ' ') AS chunk_text,
        |  LEAST(64, n - chunk_id*48) AS n_chunk_toks
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "text_lm_score" ->
      s"""WITH $lmScoreCoreSql
         |SELECT doc_id, n_bigrams, ROUND(sum_lp / n_bigrams, 4) AS avg_logprob
         |FROM per ORDER BY doc_id""".stripMargin,
    "text_collocations" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
         |bg AS (SELECT t[i] AS w1, t[i+1] AS w2
         |       FROM tk, UNNEST(range(1, len(t))) AS r(i)
         |       WHERE len(t) >= 2),
         |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
         |       FROM bg GROUP BY w1, w2),
         |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM bg),
         |un AS (SELECT unnest(t) AS w FROM tk),
         |uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM un GROUP BY w),
         |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM un)
         |SELECT w1, w2, c12,
         |  CAST(CAST(c12 AS HUGEINT) * nt * nt * 1000000
         |       // (CAST(nb AS HUGEINT) * c1 * c2) AS BIGINT) AS lift_ppm
         |FROM bc
         |JOIN (SELECT w AS w1, c AS c1 FROM uc) u1 USING (w1)
         |JOIN (SELECT w AS w2, c AS c2 FROM uc) u2 USING (w2)
         |CROSS JOIN nb CROSS JOIN nt
         |WHERE c12 >= $CollocMinCount
         |ORDER BY lift_ppm DESC, w1, w2 LIMIT 50""".stripMargin,
    "text_repetition" ->
      """WITH base AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |uni AS (SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
        |        unnest(t) AS tok FROM base),
        |uc AS (SELECT doc_id, n_tokens, tok, COUNT(*) AS c
        |       FROM uni GROUP BY 1, 2, 3),
        |t1 AS (SELECT doc_id, n_tokens, MAX(c) AS top_tok_cnt
        |       FROM uc GROUP BY 1, 2),
        |bgs AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(t)),
        |          i -> t[i] || ' ' || t[i+1])) AS bg FROM base),
        |bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgs GROUP BY 1, 2),
        |t2 AS (SELECT doc_id, MAX(c) AS top_bigram_cnt FROM bc GROUP BY 1)
        |SELECT t1.doc_id, t1.n_tokens, t1.top_tok_cnt,
        |  ((t1.top_tok_cnt * 2000000 + t1.n_tokens)
        |    // (2 * t1.n_tokens)) / 1000000.0 AS top_tok_frac,
        |  COALESCE(t2.top_bigram_cnt, 0) AS top_bigram_cnt,
        |  ((COALESCE(t2.top_bigram_cnt, 0) * 2000000
        |      + greatest(t1.n_tokens - 1, 1))
        |    // (2 * greatest(t1.n_tokens - 1, 1))) / 1000000.0
        |    AS top_bigram_frac,
        |  (((t1.top_tok_cnt * 2000000 + t1.n_tokens)
        |      // (2 * t1.n_tokens)) < 200000
        |   AND ((COALESCE(t2.top_bigram_cnt, 0) * 2000000
        |      + greatest(t1.n_tokens - 1, 1))
        |    // (2 * greatest(t1.n_tokens - 1, 1))) < 200000) AS rep_ok
        |FROM t1 LEFT JOIN t2 ON t1.doc_id = t2.doc_id
        |ORDER BY t1.doc_id""".stripMargin,
    "corpus_clean" ->
      s"""WITH $cleanChainSql
         |SELECT k.doc_id, k.n_tokens, k.stop_ratio, d.n_variants
         |FROM ckept k JOIN cdedup d ON k.doc_id = d.doc_id
         |ORDER BY k.doc_id""".stripMargin,
    "dedup_normalized" ->
      """SELECT sha256(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g'))) AS norm_hash,
        |  MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_variants
        |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin,
    "text_pii_mask" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS masked,
        |  CAST(length(text) - length(regexp_replace(text,
        |    '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '', 'g')) AS INT) AS n_email_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_coverage_curve" ->
      """WITH v AS (SELECT token, COUNT(*) AS cnt FROM (
        |    SELECT unnest(string_split(text,' ')) AS token
        |    FROM documents) GROUP BY token),
        |rk0 AS (SELECT cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, token)
        |      AS INTEGER) AS rk
        |  FROM v),
        |r AS (SELECT rk, CAST(SUM(cnt) OVER (ORDER BY rk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum
        |  FROM rk0),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM v)
        |SELECT k, MAX(rk) AS n_types_used,
        |  CAST(MAX(cum) * 1000000 // MAX(total) AS BIGINT)
        |    AS coverage_ppm
        |FROM r, t, UNNEST([1, 2, 4, 8, 16, 32, 64]) AS u(k)
        |WHERE rk <= k GROUP BY k ORDER BY k""".stripMargin,
    "text_keywords" ->
      """WITH tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text,' ')) AS token
        |    FROM documents) GROUP BY doc_id, token),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, tf.token AS token,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN df ON tf.token = df.token, n),
        |rk AS (SELECT doc_id, token, tfidf,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, token) AS INTEGER) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, token, tfidf FROM rk WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    "text_countmin" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |ex AS (SELECT tok, COUNT(*) AS n_exact FROM tok GROUP BY tok),
        |hh AS (SELECT tok, n_exact, list_reduce(
        |    list_concat([CAST(0 AS BIGINT)],
        |      list_transform(string_split(tok,''), c -> CAST(unicode(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS h FROM ex),
        |cells AS (SELECT tok, n_exact, d,
        |    ((h * (2*d + 3) + (97*d + 31)) % 1000000007) % 16 AS bkt
        |  FROM hh, UNNEST([0, 1, 2]) AS r(d)),
        |sk AS (SELECT d, bkt, CAST(SUM(n_exact) AS BIGINT) AS bc
        |  FROM cells GROUP BY d, bkt)
        |SELECT cells.tok, MAX(cells.n_exact) AS n_exact, MIN(sk.bc) AS n_est
        |FROM cells JOIN sk USING (d, bkt)
        |GROUP BY cells.tok ORDER BY tok""".stripMargin,
    "text_vocab" ->
      """SELECT token, COUNT(*) AS freq
        |FROM (SELECT unnest(string_split(text,' ')) AS token FROM documents)
        |GROUP BY token ORDER BY freq DESC, token ASC LIMIT 50""".stripMargin,
    "quality_filter_relative" ->
      """WITH cut AS (SELECT lang, median(n_chars) AS median_chars
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars, median_chars
        |FROM documents d JOIN cut USING (lang)
        |WHERE n_chars > median_chars
        |ORDER BY doc_id""".stripMargin,
    "text_heavy_hitters" ->
      """WITH tk AS (SELECT unnest(string_split(text,' ')) AS token
        |  FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tk)
        |SELECT token, COUNT(*) AS cnt FROM tk, n
        |GROUP BY token, n.total HAVING COUNT(*) * 200 > n.total
        |ORDER BY token""".stripMargin,
    "text_boilerplate" ->
      """WITH p AS (SELECT doc_id,
        |    array_to_string(string_split(text, ' ')[1:3], ' ') AS prefix
        |  FROM documents),
        |s AS (SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_sharing
        |  FROM p GROUP BY prefix)
        |SELECT doc_id, p.prefix, n_sharing,
        |  n_sharing >= 2 AS is_template
        |FROM p JOIN s ON p.prefix = s.prefix
        |ORDER BY doc_id""".stripMargin,
    // Mirrors qualityFilterFunnelOn: cumulative-conjunction counts
    // off the shared rule relation, 4-row marginal report.
    "quality_filter_funnel" ->
      s"""WITH $gopherRulesSql,
         |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         |    CAST(SUM(CASE WHEN r_count THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1,
         |    CAST(SUM(CASE WHEN r_count AND r_len THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n2,
         |    CAST(SUM(CASE WHEN r_count AND r_len AND r_stop
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         |    CAST(SUM(CASE WHEN r_count AND r_len AND r_stop AND r_rep
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n4
         |  FROM r),
         |rws AS (
         |  SELECT 1 AS stage_id, 'count' AS rule, n0 AS n_in,
         |    n0 - n1 AS n_removed, n1 AS n_out, n0 FROM c
         |  UNION ALL SELECT 2, 'len', n1, n1 - n2, n2, n0 FROM c
         |  UNION ALL SELECT 3, 'stop', n2, n2 - n3, n3, n0 FROM c
         |  UNION ALL SELECT 4, 'rep', n3, n3 - n4, n4, n0 FROM c)
         |SELECT CAST(stage_id AS BIGINT) AS stage_id, rule,
         |  n_in, n_removed, n_out,
         |  CAST(CASE WHEN n_in > 0 THEN n_removed * 1000000 // n_in
         |    ELSE 0 END AS BIGINT) AS removed_ppm,
         |  CAST((n0 - n_out) * 1000000 // n0 AS BIGINT)
         |    AS cum_removed_ppm
         |FROM rws ORDER BY stage_id""".stripMargin,
    "quality_gopher" ->
      s"""WITH $gopherRulesSql
         |SELECT doc_id, n_tokens, n_stop, c_max,
         |  r_count, r_len, r_stop, r_rep,
         |  (r_count AND r_len AND r_stop AND r_rep) AS keep,
         |  CAST((CASE WHEN r_count THEN 0 ELSE 1 END)
         |    + (CASE WHEN r_len THEN 0 ELSE 2 END)
         |    + (CASE WHEN r_stop THEN 0 ELSE 4 END)
         |    + (CASE WHEN r_rep THEN 0 ELSE 8 END) AS INT) AS reason_mask
         |FROM r ORDER BY doc_id""".stripMargin,
    "text_bm25" ->
      """WITH tk AS (SELECT doc_id, string_split(text,' ') AS t
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tk),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(dl) AS BIGINT) AS total FROM dl),
        |tok AS (SELECT doc_id, unnest(t) AS token FROM tk),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tok
        |  WHERE token IN ('spark','join','filter','window','hash','merge','batch')
        |  GROUP BY 1, 2),
        |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM tf GROUP BY 1),
        |q(query_id, token) AS (VALUES
        |  (0, 'spark'), (0, 'join'), (1, 'filter'), (1, 'window'),
        |  (2, 'hash'), (2, 'merge'), (2, 'batch')),
        |c AS (SELECT q.query_id, tf.doc_id,
        |    CAST(floor(1000000.0
        |      * ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
        |      * (tf * 2.2)
        |      / (tf + 1.2 * (0.25 + 0.75 * dl.dl * CAST(n AS DOUBLE)
        |          / CAST(total AS DOUBLE)))
        |      + 0.5) AS BIGINT) AS c_micro
        |  FROM tf JOIN df USING (token) JOIN q ON q.token = tf.token
        |    JOIN dl ON dl.doc_id = tf.doc_id, st)
        |SELECT query_id, doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(c_micro) AS BIGINT) AS score_micro,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY CAST(SUM(c_micro) AS BIGINT) DESC, doc_id) AS INT)
        |    AS rnk
        |FROM c GROUP BY query_id, doc_id
        |QUALIFY rnk <= 10
        |ORDER BY query_id, rnk""".stripMargin,
    "text_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text,' ')) AS token
        |    FROM documents) GROUP BY doc_id, token),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, tf.token, tf, df,
        |  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |FROM tf JOIN df ON tf.token = df.token, n
        |WHERE doc_id < 20
        |ORDER BY doc_id, tf.token""".stripMargin,
    "text_split_assign" ->
      s"""SELECT doc_id, $polySql % 100 AS bucket,
         |  CASE WHEN $polySql % 100 < 80 THEN 'train'
         |       WHEN $polySql % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text,' '))) AS INT) AS n_unique,
        |  CAST(length(text) AS INT) AS len_chars,
        |  CAST(len(string_split_regex(text,'[^a-z0-9]+')) AS INT) AS n_subtokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_readability" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
        |      AS BIGINT) AS n_alnum,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    greatest(CAST(length(regexp_replace(text, '[^.!?]', '', 'g'))
        |      AS BIGINT), 1) AS n_sent
        |  FROM documents)
        |SELECT doc_id, n_alnum, n_words, n_sent,
        |  4710 * n_alnum // n_words + 500 * n_words // n_sent - 21430
        |    AS ari_milli
        |FROM t ORDER BY doc_id""".stripMargin,
    "quality_logreg" ->
      s"""WITH $logregCoreSql
         |SELECT doc_id, y, p_ppm,
         |  CAST(p_ppm >= 500000 AS BIGINT) AS pred
         |FROM scored ORDER BY doc_id""".stripMargin,
    // Mirrors qualityRaterKappa: same confusion rollup over the same
    // scored CTE, HUGEINT products mirroring the engine's
    // DECIMAL(38,0), truncating // on the (possibly negative) kappa.
    "quality_rater_kappa" ->
      s"""WITH $logregCoreSql,
         |sc AS (SELECT y, CAST(p_ppm >= 500000 AS BIGINT) AS pred
         |  FROM scored),
         |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n11,
         |    CAST(SUM(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n10,
         |    CAST(SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n01,
         |    CAST(SUM(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n00
         |  FROM sc)
         |SELECT n, n11, n10, n01, n00,
         |  CAST((n11 + n00) * 1000000 // n AS BIGINT) AS po_ppm,
         |  CAST((CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
         |    + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) * 1000000
         |    // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_ppm,
         |  CAST(CASE WHEN CAST(n AS HUGEINT) * n >
         |      CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
         |      + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)
         |    THEN (CAST(n AS HUGEINT) * (n11 + n00)
         |      - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
         |         + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)))
         |      * 1000000
         |      // (CAST(n AS HUGEINT) * n
         |        - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
         |           + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)))
         |  END AS BIGINT) AS kappa_ppm
         |FROM c""".stripMargin,
    // AUC = Mann-Whitney U over (p_ppm, y) with midrank ties, exact
    // integers (doubled rank sums); mirrors qualityAucOn term for term.
    "quality_auc" ->
      s"""WITH $logregCoreSql,
         |g AS (SELECT p_ppm AS cents, CAST(COUNT(*) AS BIGINT) AS t,
         |    CAST(SUM(y) AS BIGINT) AS t1 FROM scored GROUP BY 1),
         |run AS (SELECT t, t1, CAST(COALESCE(SUM(t) OVER (ORDER BY cents
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS cb FROM g),
         |ag AS (SELECT CAST(SUM(t - t1) AS BIGINT) AS n_neg,
         |    CAST(SUM(t1) AS BIGINT) AS n_pos,
         |    CAST(SUM(t1 * (2 * cb + t + 1)) AS BIGINT) AS r1_x2 FROM run),
         |pre AS (SELECT n_pos, n_neg,
         |    CAST(r1_x2 - n_pos * (n_pos + 1) AS BIGINT) AS u1_x2 FROM ag),
         |fin AS (SELECT n_pos, n_neg, u1_x2,
         |    CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |      CAST(CAST(u1_x2 AS HUGEINT) * 1000000
         |        // (CAST(2 AS HUGEINT) * n_pos * n_neg) AS BIGINT)
         |    END AS auc_ppm FROM pre)
         |SELECT n_pos, n_neg, u1_x2, auc_ppm,
         |  CAST(auc_ppm * 2 - 1000000 AS BIGINT) AS gini_pm
         |FROM fin""".stripMargin,
    // Mirrors textJsDivergenceOn: the SAME jsNanoSql string, union
    // vocabulary with Laplace smoothing, full-vocab total pre-cut.
    "text_js_divergence" ->
      s"""WITH ta AS (SELECT unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE source = 'src0'),
         |tb AS (SELECT unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE source <> 'src0'),
         |ga AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS ca
         |  FROM ta GROUP BY 1),
         |gb AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cb
         |  FROM tb GROUP BY 1),
         |j AS (SELECT COALESCE(ga.tok, gb.tok) AS tok,
         |    COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
         |  FROM ga FULL OUTER JOIN gb ON ga.tok = gb.tok),
         |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
         |    CAST(SUM(cb) AS BIGINT) AS nb,
         |    CAST(COUNT(*) AS BIGINT) AS v FROM j),
         |sc AS (SELECT tok, ca, cb, $jsNanoSql AS js_nano
         |  FROM j, tot),
         |tt AS (SELECT CAST(SUM(js_nano) AS BIGINT) AS js_total_nano
         |  FROM sc)
         |SELECT tok, ca, cb, js_nano, js_total_nano
         |FROM sc, tt ORDER BY js_nano DESC, tok ASC LIMIT 50""".stripMargin,
    // Mirrors sampleUncertaintyOn: the shared trained scorer, margin
    // projection, per-language (margin asc, doc_id asc) rank prefix.
    "sample_uncertainty" ->
      s"""WITH $logregCoreSql,
         |m AS (SELECT s.doc_id, d.lang, s.p_ppm,
         |    abs(s.p_ppm - 500000) AS margin_ppm
         |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
         |r AS (SELECT lang, doc_id, p_ppm, margin_ppm,
         |    CAST(row_number() OVER (PARTITION BY lang
         |      ORDER BY margin_ppm ASC, doc_id ASC) AS BIGINT) AS rk
         |  FROM m)
         |SELECT lang, rk, doc_id, p_ppm,
         |  CAST(margin_ppm AS BIGINT) AS margin_ppm
         |FROM r WHERE rk <= $UncertaintyPerLang
         |ORDER BY lang, rk""".stripMargin,
    // Reliability bins + ECE/MCE; mirrors qualityEceOn term for term
    // (floor divisions on non-negative integers on both engines).
    "quality_ece" ->
      s"""WITH $logregCoreSql,
         |b AS (SELECT CAST(LEAST(p_ppm // 100000, 9) AS BIGINT) AS bin,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(p_ppm) AS BIGINT) AS sp,
         |    CAST(SUM(y) AS BIGINT) AS s1
         |  FROM scored GROUP BY 1),
         |r AS (SELECT bin, n, sp // n AS mean_p_ppm,
         |    (s1 * 1000000) // n AS frac_pos_ppm FROM b),
         |g AS (SELECT bin, n, mean_p_ppm, frac_pos_ppm,
         |    abs(mean_p_ppm - frac_pos_ppm) AS gap_ppm FROM r),
         |e AS (SELECT CAST(SUM(n * gap_ppm) // SUM(n) AS BIGINT)
         |      AS ece_ppm,
         |    CAST(MAX(gap_ppm) AS BIGINT) AS mce_ppm FROM g)
         |SELECT bin, n, mean_p_ppm, frac_pos_ppm, gap_ppm,
         |  ece_ppm, mce_ppm
         |FROM g, e ORDER BY bin""".stripMargin,
    // Operating curve at every distinct score; suffix counts via the
    // strictly-before window prefix (kept >= 1 at present scores).
    "quality_threshold_sweep" ->
      s"""WITH $logregCoreSql,
         |g AS (SELECT p_ppm AS thr_ppm, CAST(COUNT(*) AS BIGINT) AS t,
         |    CAST(SUM(y) AS BIGINT) AS t1 FROM scored GROUP BY 1),
         |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n_all,
         |    CAST(SUM(t1) AS BIGINT) AS n_pos FROM g),
         |run AS (SELECT thr_ppm,
         |    CAST(COALESCE(SUM(t) OVER (ORDER BY thr_ppm
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cb,
         |    CAST(COALESCE(SUM(t1) OVER (ORDER BY thr_ppm
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cb1 FROM g),
         |k AS (SELECT thr_ppm, n_all - cb AS kept, n_pos - cb1 AS tp,
         |    n_pos FROM run, tot),
         |p AS (SELECT thr_ppm, kept, tp, n_pos,
         |    (tp * 1000000) // kept AS precision_ppm,
         |    CASE WHEN n_pos > 0 THEN (tp * 1000000) // n_pos END
         |      AS recall_ppm FROM k)
         |SELECT thr_ppm, kept, tp, n_pos, precision_ppm, recall_ppm,
         |  CASE WHEN precision_ppm + recall_ppm > 0 THEN
         |    (2 * precision_ppm * recall_ppm)
         |      // (precision_ppm + recall_ppm) END AS f1_ppm
         |FROM p ORDER BY thr_ppm""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
         |  CAST(length(text) AS DOUBLE) / len(string_split(text,' ')) AS mean_tok_len,
         |  CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')) AS ttr,
         |  CAST(${sqlHits(enStop)} AS DOUBLE) / len(string_split(text,' ')) AS stop_ratio,
         |  (len(string_split(text,' ')) >= 10
         |   AND CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')) > 0.1
         |   AND CAST(${sqlHits(enStop)} AS DOUBLE) / len(string_split(text,' ')) > 0.0) AS keep
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id, lang AS labeled_lang,
         |  CAST(${sqlHits(enStop)} AS INT) AS en_hits,
         |  CAST(${sqlHits(deStop)} AS INT) AS de_hits,
         |  CAST(${sqlHits(esStop)} AS INT) AS es_hits,
         |  CAST(${sqlHits(frStop)} AS INT) AS fr_hits,
         |  $langidPredSql AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin,
    // Normalized confusion matrix of the langid rule vs the labeled
    // lang column; shares the prediction CASE with text_langid.
    "text_langid_eval" ->
      s"""WITH p AS (SELECT lang AS labeled_lang,
         |    $langidPredSql AS pred_lang FROM documents),
         |c AS (SELECT labeled_lang, pred_lang,
         |    CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
         |r AS (SELECT labeled_lang, CAST(SUM(n) AS BIGINT) AS row_total
         |  FROM c GROUP BY 1),
         |k AS (SELECT pred_lang, CAST(SUM(n) AS BIGINT) AS col_total
         |  FROM c GROUP BY 1),
         |a AS (SELECT CAST(SUM(CASE WHEN labeled_lang = pred_lang
         |      THEN n ELSE 0 END) * 1000000 // SUM(n) AS BIGINT)
         |    AS accuracy_ppm FROM c)
         |SELECT labeled_lang, pred_lang, n, row_total, col_total,
         |  (n * 1000000) // row_total AS recall_share_ppm,
         |  (n * 1000000) // col_total AS precision_share_ppm,
         |  accuracy_ppm
         |FROM c JOIN r USING (labeled_lang) JOIN k USING (pred_lang)
         |CROSS JOIN a
         |ORDER BY labeled_lang, pred_lang""".stripMargin,
    "text_novelty" ->
      s"""${Dedup.shingleHashSql},
         |own AS (SELECT hs, MIN(doc_id) AS first_doc FROM hs GROUP BY hs)
         |SELECT doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
         |    * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
         |FROM hs JOIN own USING (hs)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_concat([CAST(0 AS BIGINT)],
        |      list_transform(string_split(text,''), c -> CAST(unicode(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp_poly,
        |  substring(sha256(text), 1, 16) AS fp_sha
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
