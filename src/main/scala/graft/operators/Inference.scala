package graft.operators

import graft.{Guards, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-inference readouts and feature-engineering operators —
  * the second tier of warehouse statistics on top of Events.scala's
  * test battery: rank correlations (Spearman, Kendall tau-b) over the
  * calendar-bounded daily series, effect size (Cramer's V) beside the
  * chi-squared it summarizes, multiple-testing control (Benjamini-
  * Hochberg FDR), offline changepoint location (binary segmentation),
  * leave-one-out target encoding (the feature-store staple), a Pareto
  * skyline over document quality/length, and a deterministic
  * geometric-mechanism DP count release.
  *
  * House arithmetic rules throughout (ORACLES.md): sums quantized to
  * exact integers (cents/ppm/milli) BEFORE aggregation so every
  * corpus-wide aggregate is an order-free integer sum; `DIV`/`//`
  * only on non-negative operands; doubles appear only in final
  * sqrt/ratio readouts computed from exact integer moments (IEEE
  * sqrt is correctly rounded, so both engines produce the identical
  * bits — the agg_corr precedent).
  *
  * Scale notes: the rank/pair relations (`ts_spearman`, `ts_kendall`,
  * `ts_changepoint`) live on the per-(event_type, day) grid — rows
  * bounded by series x calendar, NOT by corpus size, the same
  * argument as ts_theilsen; their windows partition by event_type.
  * Everything else is one fact scan plus broadcast-sized reductions.
  */
object Inference {

  private def dailyCents(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .as("cents"))

  /** Spearman rank correlation between calendar day and daily summed
    * value per event_type — the nonparametric "is this series
    * monotonically trending?" readout (the rank sibling of
    * ts_theilsen's median slope). Average ranks for ties, carried as
    * DOUBLED integers (2*avgrank = 2*rank + ties - 1) so the rank
    * vectors stay exact; rho is then Pearson over the doubled ranks,
    * one double division at the end. Day ranks are dense (days are
    * distinct within a series); value ranks use min-rank + tie count
    * from two partitioned windows. At 100 TB the daily grid per
    * series is calendar-bounded, so the windows see ≤ a few thousand
    * rows per event_type regardless of corpus size. */
  def tsSpearmanOn(events: DataFrame): DataFrame = {
    val daily = dailyCents(events)
    val wd = Window.partitionBy("event_type").orderBy("d")
    val wy = Window.partitionBy("event_type").orderBy("cents")
    val ranked = daily
      .withColumn("dx", row_number().over(wd).cast("long") * 2)
      .withColumn("dy", rank().over(wy).cast("long") * 2
        + count(lit(1)).over(Window.partitionBy("event_type", "cents"))
        - 1)
    ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
      .select(col("event_type"), col("n_days"),
        expr("""CASE WHEN n_days * sxx - sx * sx > 0
               |       AND n_days * syy - sy * sy > 0 THEN
               |  (n_days * sxy - sx * sy) /
               |    sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
               |         * (n_days * syy - sy * sy)) END""".stripMargin)
          .as("rho_spearman"))
      .orderBy("event_type")
  }

  def tsSpearman(s: SparkSession, dir: String): DataFrame =
    tsSpearmanOn(Tables.events(s, dir))

  /** Kendall tau-b between day order and daily value per event_type.
    * Days are strictly increasing, so over the pair relation (i < j)
    * concordant = value rose, discordant = fell, tie = equal; tau-b's
    * tie correction uses the tied-value groups on the value axis only
    * (the day axis has no ties). The pair self-join is on the
    * calendar-bounded daily grid — the ts_theilsen shape — so pair
    * count is days², independent of corpus size. Exact integer
    * concordance counts; tau is the one final double ratio. */
  def tsKendallOn(events: DataFrame): DataFrame = {
    val daily = dailyCents(events).localCheckpoint(true)
    val a = daily.select(col("event_type"), col("d").as("d1"),
      col("cents").as("y1"))
    val b = daily.select(col("event_type"), col("d").as("d2"),
      col("cents").as("y2"))
    val pairs = a.join(b, Seq("event_type")).filter(col("d2") > col("d1"))
      .groupBy("event_type")
      .agg(sum(when(col("y2") > col("y1"), 1L).otherwise(0L)).as("nc"),
        sum(when(col("y2") < col("y1"), 1L).otherwise(0L)).as("nd"),
        sum(when(col("y2") === col("y1"), 1L).otherwise(0L)).as("nt"))
    val n = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    pairs.join(n, "event_type")
      .select(col("event_type"), col("n_days"), col("nc"), col("nd"),
        col("nt").as("n_tied"),
        expr("""CASE WHEN n_days >= 2
               |       AND n_days * (n_days - 1) DIV 2 > nt THEN
               |  (nc - nd) /
               |    sqrt(CAST(n_days * (n_days - 1) DIV 2 AS DOUBLE)
               |         * (n_days * (n_days - 1) DIV 2 - nt))
               |  END""".stripMargin).as("tau_b"))
      .orderBy("event_type")
  }

  def tsKendall(s: SparkSession, dir: String): DataFrame =
    tsKendallOn(Tables.events(s, dir))

  /** Cramer's V effect size for the event_type x ISO-weekday
    * contingency table — the "how strong is the association the
    * chi-squared just declared significant?" companion of
    * event_chi2. Same exact-integer cell algebra as event_chi2
    * ((o*n - r*c)^2 * 1e6 DIV (n*r*c) per cell, DECIMAL(38,0)
    * intermediates), summed to an exact chi2_ppm; V =
    * sqrt(chi2 / (n * (min(r,c)-1))) is the single double readout.
    * One fact scan; every join side is a broadcast-sized total. */
  def eventCramersVOn(events: DataFrame): DataFrame = {
    val cells = events
      .select(col("event_type"),
        (weekday(to_date(col("ts"))) + 1).cast("int").as("dow"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // feeds totals and the cell sum
    val rowT = cells.groupBy("event_type").agg(sum(col("o")).as("r"))
    val colT = cells.groupBy("dow").agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("event_type")).as("n_rows"),
      countDistinct(col("dow")).as("n_cols"))
    cells.join(broadcast(rowT), "event_type")
      .join(broadcast(colT), "dow")
      .crossJoin(broadcast(tot))
      .select(col("n"), col("n_rows"), col("n_cols"),
        expr("""CAST((CAST(o AS DECIMAL(38,0)) * n
               |      - CAST(r AS DECIMAL(38,0)) * c)
               |  * (CAST(o AS DECIMAL(38,0)) * n
               |     - CAST(r AS DECIMAL(38,0)) * c)
               |  * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * r * c)
               |  AS BIGINT)""".stripMargin).as("contrib_ppm"))
      .groupBy("n", "n_rows", "n_cols")
      .agg(sum(col("contrib_ppm")).as("chi2_ppm"))
      .select(col("n"), col("n_rows"), col("n_cols"), col("chi2_ppm"),
        expr("""CASE WHEN least(n_rows, n_cols) > 1 THEN
               |  sqrt(chi2_ppm /
               |    (CAST(n AS DOUBLE) * (least(n_rows, n_cols) - 1)
               |     * 1000000)) END""".stripMargin).as("v_cramer"))
  }

  def eventCramersV(s: SparkSession, dir: String): DataFrame =
    eventCramersVOn(Tables.events(s, dir))

  /** Benjamini-Hochberg FDR control (step-up, q = 0.05) over the
    * per-event-type "is this type's weekend share different from the
    * rest of the corpus?" two-proportion z-test family — the
    * standard guard against reading 1-in-20 noise as signal when a
    * dashboard fans one test out across many segments.
    *
    * z² per type is the pooled two-proportion statistic in exact
    * milli (the event_ab_test algebra, type vs rest). The p-value is
    * a PINNED step-function lookup: a 14-row chi-squared(1) tail
    * ladder in (z2_milli threshold → p_ppm), identical literal table
    * in engine and oracle, so no engine evaluates a CDF. BH then
    * sorts the family by p (tie-broken by event_type), marks
    * candidates with p_ppm * m <= rank * 50000 (q in ppm), and
    * rejects every test at or below the LARGEST candidate rank —
    * integer arithmetic end to end. The family relation is
    * |event types| rows — collapsed and broadcast-sized; the one
    * fact scan feeds it. */
  def eventFdrBhOn(events: DataFrame): DataFrame = {
    val m = Window.partitionBy(lit(1))
    val ranked = pValuesByType(events)
      .withColumn("rk",
        row_number().over(m.orderBy(col("p_ppm"), col("event_type")))
          .cast("long"))
      .withColumn("m", count(lit(1)).over(m))
      .withColumn("cand",
        col("p_ppm") * col("m") <= col("rk") * lit(50000L))
      .withColumn("k_star",
        max(when(col("cand"), col("rk")).otherwise(0L)).over(m))
    ranked
      .select(col("event_type"), col("z2_milli"), col("p_ppm"),
        col("rk"), col("m"), (col("rk") <= col("k_star")).as("reject"))
      .orderBy("rk")
  }

  /** The per-type p-value family — the shared front half of the two
    * multiple-testing procedures ([[eventFdrBhOn]] / [[eventHolmOn]]):
    * pooled two-proportion z² in exact milli for each type's
    * weekend-share contrast, mapped to p_ppm through the pinned
    * [[chi2Ladder]]. |event types| rows. */
  private def pValuesByType(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val byType = events
      .select(col("event_type"),
        ((weekday(to_date(col("ts"))) + 1) >= 6).cast("long").as("we"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n0"), sum(col("we")).as("x0"))
      .localCheckpoint(true)
    val tot = byType.agg(sum(col("n0")).as("nt"), sum(col("x0")).as("xt"))
    val z = byType.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n0"), col("x0"),
        (col("nt") - col("n0")).as("n1"), (col("xt") - col("x0")).as("x1"))
      .select(col("event_type"), col("n0"), col("x0"), col("n1"), col("x1"),
        expr("""CASE WHEN x0 + x1 > 0 AND x0 + x1 < n0 + n1
               |       AND n0 > 0 AND n1 > 0 THEN
               |  CAST((CAST(n0 AS DECIMAL(38,0)) + n1)
               |    * ((CAST(x0 AS DECIMAL(38,0)) * n1
               |        - CAST(x1 AS DECIMAL(38,0)) * n0)
               |       * (CAST(x0 AS DECIMAL(38,0)) * n1
               |          - CAST(x1 AS DECIMAL(38,0)) * n0))
               |    * 1000 DIV (CAST(n0 AS DECIMAL(38,0)) * n1
               |      * (CAST(x0 AS DECIMAL(38,0)) + x1)
               |      * (CAST(n0 AS DECIMAL(38,0)) + n1 - x0 - x1))
               |    AS BIGINT) ELSE 0 END""".stripMargin).as("z2_milli"))
    val ladder = chi2Ladder.toDF("thr_milli", "p_ppm")
    z.join(broadcast(ladder),
        col("z2_milli") >= col("thr_milli"), "left")
      .groupBy("event_type", "z2_milli")
      .agg(min(col("p_ppm")).as("p_ppm"))
  }

  /** Holm–Bonferroni step-down control of the familywise error rate
    * (Holm 1979) — the FWER sibling of [[eventFdrBhOn]]'s FDR on the
    * SAME p-value family: sort p ascending and compare each to
    * α/(m−rank+1); the procedure STOPS at the first failure, so a
    * hypothesis is rejected iff every rank at or below it passes.
    * Spelled division-free as holm_stat_ppm = p_ppm·(m−rank+1) ≤ α_ppm
    * and first_fail = min failing rank (NULL-coalesced past m when
    * all pass) — integer end to end. Uniformly more powerful than
    * plain Bonferroni, never rejects more than BH; running both over
    * one shared family relation is the standard dashboard pairing.
    * The family is |event types| rows off one fact scan — the
    * single-partition window is k-row bounded, licensed as in BH. */
  def eventHolmOn(events: DataFrame, alphaPpm: Long = 50000L)
      : DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000,
      s"need alphaPpm in [1, 1000000], got $alphaPpm")
    val m = Window.partitionBy(lit(1))
    val ranked = pValuesByType(events)
      .withColumn("rk",
        row_number().over(m.orderBy(col("p_ppm"), col("event_type")))
          .cast("long"))
      .withColumn("m", count(lit(1)).over(m))
      .withColumn("holm_stat_ppm",
        col("p_ppm") * (col("m") - col("rk") + 1L))
      .withColumn("first_fail",
        min(when(col("holm_stat_ppm") > alphaPpm, col("rk"))).over(m))
    ranked
      .select(col("event_type"), col("z2_milli"), col("p_ppm"),
        col("rk"), col("m"), col("holm_stat_ppm"),
        (col("rk") < coalesce(col("first_fail"), col("m") + 1L))
          .as("reject"))
      .orderBy("rk")
  }

  def eventHolm(s: SparkSession, dir: String): DataFrame =
    eventHolmOn(Tables.events(s, dir))

  /** chi-squared(1) upper-tail ladder: p first drops below each
    * published critical value; shared literal with the oracle SQL. */
  private val chi2Ladder: Seq[(Long, Long)] = Seq(
    0L -> 1000000L, 455L -> 500000L, 1000L -> 317300L,
    1323L -> 250000L, 1642L -> 200000L, 2072L -> 150000L,
    2706L -> 100000L, 3841L -> 50000L, 5024L -> 25000L,
    6635L -> 10000L, 7879L -> 5000L, 10828L -> 1000L,
    12116L -> 500L, 15137L -> 100L)

  private def chi2LadderSql: String =
    chi2Ladder.map { case (t, p) => s"($t, $p)" }.mkString(", ")

  def eventFdrBh(s: SparkSession, dir: String): DataFrame =
    eventFdrBhOn(Tables.events(s, dir))

  /** Offline changepoint: the single best binary-segmentation split
    * of each event_type's daily series — the location CUSUM only
    * alarms on. For every split position the between-segment score
    * (n_r*S_l - n_l*S_r)^2 / (n_l*n_r) is evaluated in DECIMAL(38,0)
    * (the squared term overflows BIGINT at corpus scale) from the
    * running prefix sums of one partitioned window pass; the argmax
    * row (earliest day pins ties) is the changepoint. Output keeps
    * the exact per-side means in cents and their signed gap —
    * readout columns stay in BIGINT range regardless of score
    * magnitude. Windows partition by event_type over the calendar-
    * bounded daily grid. */
  def tsChangepointOn(events: DataFrame): DataFrame = {
    val daily = dailyCents(events)
    val w = Window.partitionBy("event_type").orderBy("d")
    val wAll = Window.partitionBy("event_type")
    val scored = daily
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("sl", sum(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("st", sum(col("cents")).over(wAll))
      .filter(col("rn") < col("n"))
      .withColumn("score", expr(
        """((CAST(n - rn AS DECIMAL(38,0)) * sl
          |  - CAST(rn AS DECIMAL(38,0)) * (st - sl))
          | * (CAST(n - rn AS DECIMAL(38,0)) * sl
          |    - CAST(rn AS DECIMAL(38,0)) * (st - sl)))
          | DIV (CAST(rn AS DECIMAL(38,0)) * (n - rn))""".stripMargin))
    scored
      .withColumn("pick", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("score").desc, col("d").asc)))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("d").as("split_day"),
        col("rn").as("n_left"), (col("n") - col("rn")).as("n_right"),
        expr("sl DIV rn").as("mean_left_cents"),
        expr("(st - sl) DIV (n - rn)").as("mean_right_cents"),
        (expr("(st - sl) DIV (n - rn)") - expr("sl DIV rn"))
          .as("gap_cents"))
      .orderBy("event_type")
  }

  def tsChangepoint(s: SparkSession, dir: String): DataFrame =
    tsChangepointOn(Tables.events(s, dir))

  /** Leave-one-out target encoding of the customer's nation by order
    * total — the feature-store encoding that replaces a categorical
    * with "what does the target average for everyone ELSE in my
    * group?", leak-free by construction (the row's own target is
    * subtracted before the division). Beside it the m-estimate
    * smoothed encoding ((S + m*prior) / (n + m), m = 10) that keeps
    * rare categories near the global prior. All sums in exact order
    * cents; every division has non-negative operands (DIV == //).
    * Scale: one orders scan, broadcast of the 25-row nation sums and
    * the 1-row global prior — no per-row window, no self-join. */
  def featureTargetEncodeOn(orders: DataFrame,
      customer: DataFrame): DataFrame = {
    val withNation = orders
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
          .as("cents"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .localCheckpoint(true) // scanned for group sums and the encode pass
    val groups = withNation.groupBy("c_nationkey")
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("ng"))
    val prior = withNation
      .agg(expr("CAST(sum(cents) DIV count(1) AS BIGINT)").as("gmean"))
    withNation
      .join(broadcast(groups), "c_nationkey")
      .crossJoin(broadcast(prior))
      .select(col("o_orderkey"), col("c_nationkey"), col("cents"),
        expr("CASE WHEN ng >= 2 THEN (s - cents) DIV (ng - 1) END")
          .as("loo_cents"),
        expr("(s + 10 * gmean) DIV (ng + 10)").as("smooth_cents"))
      .orderBy("o_orderkey")
  }

  def featureTargetEncode(s: SparkSession, dir: String): DataFrame =
    featureTargetEncodeOn(Tables.orders(s, dir), Tables.customer(s, dir))

  /** Pareto skyline of the documents table on (length, lexical
    * diversity): the docs no other doc beats on BOTH token count and
    * type-token ratio (ties survive; strict in at least one axis to
    * dominate) — the "which documents are on the quality/length
    * frontier" selection a curation pipeline runs before trading off
    * axes. Two-phase distributed skyline: (1) bucket the x axis into
    * 64 ranges off the broadcast global max, take per-bucket max y,
    * and prune every row strictly under the running max of HIGHER
    * buckets (any such row is dominated by a strictly-longer doc
    * with >= diversity); (2) the surviving candidates — per-bucket
    * frontier contenders, a tiny fraction of the corpus — pass
    * through the exact pairwise dominance anti-join. Phase 1 is one
    * scan + a 64-row broadcast; phase 2's non-equi join only ever
    * sees candidates. The suffix-max window runs on the collapsed
    * 64-row bucket relation. */
  def corpusSkylineOn(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val d = docs
      .select(col("doc_id"), size(t).as("n_tokens"),
        size(array_distinct(t)).as("nd"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        expr("CAST(nd * 1000000 DIV n_tokens AS BIGINT)").as("ttr_ppm"))
      .localCheckpoint(true) // feeds max, bucket maxima, and both passes
    val xmax = d.agg(max(col("n_tokens")).as("xmax"))
    val bucketed = d.crossJoin(broadcast(xmax))
      .withColumn("b",
        least(expr("n_tokens * 64 DIV (xmax + 1)"), lit(63L)))
    val bmax = Guards.requireBounded(
        bucketed.groupBy("b").agg(max(col("ttr_ppm")).as("by")),
        256L, "quality_skyline bucket suffix-max")
      .withColumn("hmax", max(col("by")).over(
        Window.partitionBy(Guards.one).orderBy(col("b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select("b", "hmax")
    val cand = bucketed.join(broadcast(bmax), "b")
      .filter(col("hmax").isNull || col("ttr_ppm") >= col("hmax"))
      .select("doc_id", "n_tokens", "ttr_ppm")
      .localCheckpoint(true) // both sides of the exact dominance pass
    val other = cand.select(col("n_tokens").as("ox"),
      col("ttr_ppm").as("oy"))
    cand.join(other,
        col("ox") >= col("n_tokens") && col("oy") >= col("ttr_ppm") &&
          (col("ox") > col("n_tokens") || col("oy") > col("ttr_ppm")),
        "left_anti")
      .orderBy("doc_id")
  }

  def corpusSkyline(s: SparkSession, dir: String): DataFrame =
    corpusSkylineOn(Tables.documents(s, dir))

  /** Differentially-private release of per-event-type distinct-user
    * counts under the (truncated) geometric mechanism at eps = ln 2:
    * two-sided geometric noise P(k) ∝ 2^(-|k|) truncated at |k| <= 8,
    * realized EXACTLY by an inverse-CDF band ladder over a uniform
    * draw u in [0, 766) — the dyadic mass table (256 for 0, 128 each
    * for ±1, ... 1 each for ±8) sums to exactly 766, so no float ever
    * appears. The draw is the house affine hash (Knuth multiplicative
    * over a code-point seed of the key), which makes the release
    * DETERMINISTIC — that is the oracle/test seeding boundary, stated
    * per the surrogate convention: a production deployment swaps the
    * hash for a real RNG and drops the audit columns (true count and
    * noise) that this query keeps for verification. Released counts
    * clamp at zero. One scan, one tiny grouped aggregate. */
  def privacyDpCountsOn(events: DataFrame): DataFrame = {
    val counts = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_true"))
    counts
      .withColumn("seed",
        expr("""ascii(substr(event_type, 1, 1)) * 961
               | + ascii(substr(event_type, 2, 1)) * 31
               | + length(event_type)""".stripMargin))
      .withColumn("u", expr("(seed * 2654435761 + 12345) % 766"))
      .withColumn("noise", expr(
        """CASE WHEN u < 256 THEN 0
          | WHEN u < 384 THEN 1 WHEN u < 512 THEN -1
          | WHEN u < 576 THEN 2 WHEN u < 640 THEN -2
          | WHEN u < 672 THEN 3 WHEN u < 704 THEN -3
          | WHEN u < 720 THEN 4 WHEN u < 736 THEN -4
          | WHEN u < 744 THEN 5 WHEN u < 752 THEN -5
          | WHEN u < 756 THEN 6 WHEN u < 760 THEN -6
          | WHEN u < 762 THEN 7 WHEN u < 764 THEN -7
          | WHEN u < 765 THEN 8 ELSE -8 END""".stripMargin).cast("long"))
      .select(col("event_type"), col("n_true"), col("noise"),
        greatest(col("n_true") + col("noise"), lit(0L)).as("n_released"),
        lit(693L).as("epsilon_milli"))
      .orderBy("event_type")
  }

  def privacyDpCounts(s: SparkSession, dir: String): DataFrame =
    privacyDpCountsOn(Tables.events(s, dir))

  /** Two-sided geometric noise ladder for [[privacyDpTopkOn]] — the
    * privacy_dp_counts table (p = 2/3 ≈ ε 0.693 per draw) on an
    * INDEPENDENT pinned coin (different LCG constants), one string
    * evaluated verbatim by both engines. */
  private val dpTopkNoiseSql: String =
    """CASE WHEN u < 256 THEN 0
      | WHEN u < 384 THEN 1 WHEN u < 512 THEN -1
      | WHEN u < 576 THEN 2 WHEN u < 640 THEN -2
      | WHEN u < 672 THEN 3 WHEN u < 704 THEN -3
      | WHEN u < 720 THEN 4 WHEN u < 736 THEN -4
      | WHEN u < 744 THEN 5 WHEN u < 752 THEN -5
      | WHEN u < 756 THEN 6 WHEN u < 760 THEN -6
      | WHEN u < 762 THEN 7 WHEN u < 764 THEN -7
      | WHEN u < 765 THEN 8 ELSE -8 END""".stripMargin

  /** L16e: DP top-k selection by one-shot noisy counts (Durfee &
    * Rogers, NeurIPS 2019: adding independent noise to every count
    * and releasing the top-k ORDER is the practical top-k mechanism;
    * the iterated report-noisy-max peel is equivalent in
    * distribution): each per-type distinct-user count gets an
    * independent pinned two-sided geometric draw (the
    * privacy_dp_counts mechanism on a fresh coin), and the released
    * relation is the k best by noisy count — the NOISY rank and
    * count only; the true count and true rank ride along as the
    * est/err eval columns (sketch_theta discipline), measuring the
    * mechanism's rank fidelity in-catalog. Ranking windows run over
    * the |event types|-row collapsed relation — k-row bounded,
    * licensed as in event_fdr_bh. */
  def privacyDpTopkOn(events: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val counts = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_true"))
    val wN = Window.partitionBy(Guards.one)
      .orderBy(col("n_noisy").desc, col("event_type").asc)
    val wT = Window.partitionBy(Guards.one)
      .orderBy(col("n_true").desc, col("event_type").asc)
    Guards.requireBounded(counts, 10000L,
        "privacy_dp_topk event-type vocabulary")
      .withColumn("seed",
        expr("""ascii(substr(event_type, 1, 1)) * 961
               | + ascii(substr(event_type, 2, 1)) * 31
               | + length(event_type)""".stripMargin))
      .withColumn("u",
        expr("(CAST(seed AS BIGINT) * 1103515245 + 54321) % 766"))
      .withColumn("noise", expr(dpTopkNoiseSql).cast("long"))
      .withColumn("n_noisy", col("n_true") + col("noise"))
      .withColumn("noisy_rank", row_number().over(wN).cast("long"))
      .withColumn("true_rank", row_number().over(wT).cast("long"))
      .filter(col("noisy_rank") <= k)
      .select("noisy_rank", "event_type", "n_noisy", "n_true",
        "true_rank")
      .orderBy("noisy_rank")
  }

  def privacyDpTopk(s: SparkSession, dir: String): DataFrame =
    privacyDpTopkOn(Tables.events(s, dir))

  /** Propensity-style nearest-neighbor matching (the observational
    * causal-inference workhorse): every TREATED user (id-hash arm 1)
    * is matched to the control whose propensity score — here the
    * user's activity count, an exact integer — is nearest, and the
    * per-pair outcome gap (purchase cents) is the ATT evidence
    * table. Matching semantics pinned: nearest by |Δscore|, ties
    * prefer the backward (≤) side then the smaller control score;
    * WITH REPLACEMENT; one representative control per score (min
    * user_id via struct-min) so matching runs against the COLLAPSED
    * score relation — the score domain is bounded (activity counts),
    * which is what makes the broadcast nested-loop nearest-join a
    * map-side op at any corpus size (the bounded-domain argument;
    * continuous scores would first quantize, as every PSM caliper
    * implementation does). */
  def eventPsmAttOn(events: DataFrame): DataFrame = {
    val users = events.groupBy("user_id")
      .agg(count(lit(1)).as("score"),
        coalesce(sum(when(col("event_type") === "purchase",
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))), lit(0L))
          .as("out_cents"))
      .localCheckpoint(true) // treated and control sides
    val ctrl = users.filter(col("user_id") % 2 === 0)
      .groupBy("score")
      .agg(min(struct(col("user_id"), col("out_cents"))).as("m"))
      .select(col("score").as("score_c"),
        col("m.user_id").as("ctrl_user"), col("m.out_cents").as("out_c"))
    val treated = users.filter(col("user_id") % 2 === 1)
    treated.join(broadcast(ctrl),
        lit(true), "inner") // nearest is decided by the rank below
      .withColumn("gap", abs(col("score") - col("score_c")))
      .withColumn("dirn",
        when(col("score_c") <= col("score"), 0L).otherwise(1L))
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("gap"), col("dirn"), col("score_c"))))
      .filter(col("rk") === 1)
      .select(col("user_id").as("treated_user"),
        col("score").as("score_t"), col("ctrl_user"), col("score_c"),
        col("out_cents").as("out_t_cents"), col("out_c").as("out_c_cents"),
        (col("out_cents") - col("out_c")).as("diff_cents"))
      .orderBy("treated_user")
  }

  def eventPsmAtt(s: SparkSession, dir: String): DataFrame =
    eventPsmAttOn(Tables.events(s, dir))

  /** L21j: IPTW ATE by propensity subclassification (Rosenbaum &
    * Rubin 1984; Cochran 1968's 90%-bias-removal result) — the
    * observational-causal sibling of [[eventPsmAttOn]]: where PSM
    * matches each treated user to ONE control, inverse-propensity
    * weighting keeps every user, weights arms to a common covariate
    * distribution, and reads the AVERAGE treatment effect, not the
    * ATT. With the propensity fitted per covariate STRATUM (activity
    * bucket = n_events DIV 4 — the same confounder proxy PSM scores
    * on), IPTW reduces EXACTLY to the stratified estimator
    * ATE = Σ_s (n_s/N)·(ȳ₁ₛ − ȳ₀ₛ), which has a clean integer
    * spelling: per-stratum micro-means via BIGINT DIV, stratum
    * weights cleared through one DECIMAL(38,0) product, every floor
    * at a documented quantization boundary. Strata violating
    * positivity (an arm absent — IPTW's undefined-weight case) are
    * EXCLUDED before totals, the standard trimming, so N is the
    * retained population.
    *
    * Shape: one fact scan → user rollup (map-side-combinable) →
    * stratum rollup (tiny) → broadcast totals; nothing past the user
    * rollup scales with data. Output: one row per retained stratum
    * with its propensity (e_ppm), arm micro-means, effect, weighted
    * contribution, and the overall ate_micro riding every row. */
  def eventIptwOn(events: DataFrame): DataFrame = {
    val users = events.groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"),
        coalesce(sum(when(col("event_type") === "purchase",
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))), lit(0L))
          .as("out_cents"))
      .withColumn("treated", col("user_id") % 2 === 1)
      .withColumn("stratum", expr("n_ev DIV 4"))
    val st = users.groupBy("stratum").agg(
        count(lit(1)).as("n_s"),
        sum(when(col("treated"), 1L).otherwise(0L)).as("t_s"),
        coalesce(sum(when(col("treated"), col("out_cents"))), lit(0L))
          .as("sum_t_cents"),
        coalesce(sum(when(!col("treated"), col("out_cents"))), lit(0L))
          .as("sum_c_cents"))
      .filter(col("t_s") > 0 && col("t_s") < col("n_s"))
      .localCheckpoint(true) // totals + the weighted pass
    val tot = st.agg(sum(col("n_s")).as("n_tot"))
    val d = st.crossJoin(broadcast(tot))
      .withColumn("e_ppm", expr("t_s * 1000000 DIV n_s"))
      .withColumn("y1_micro", expr("sum_t_cents * 1000000 DIV t_s"))
      .withColumn("y0_micro",
        expr("sum_c_cents * 1000000 DIV (n_s - t_s)"))
      .withColumn("d_micro", col("y1_micro") - col("y0_micro"))
      .withColumn("w_contrib_micro", expr(
        "CAST(CAST(n_s AS DECIMAL(38,0)) * d_micro DIV n_tot AS BIGINT)"))
    val ate = d.agg(sum(col("w_contrib_micro")).as("ate_micro"))
    d.crossJoin(broadcast(ate))
      .select(col("stratum"), col("n_s"), col("t_s"), col("e_ppm"),
        col("y1_micro"), col("y0_micro"), col("d_micro"),
        col("w_contrib_micro"), col("ate_micro"))
      .orderBy("stratum")
  }

  def eventIptw(s: SparkSession, dir: String): DataFrame =
    eventIptwOn(Tables.events(s, dir))

  /** CUPED variance reduction (Deng et al., WSDM 2013): adjust each
    * user's experiment-period outcome Y by their PRE-period covariate
    * X — adj = Y − θ(X − E[X]) — so arm means keep their expectation
    * but shed the variance X explains. The pre/post cut is the pinned
    * corpus midpoint (Jan 16); arms are the id-hash. θ is the pooled
    * cov(X,Y)/var(X), QUANTIZED to milli by the exact moment sums
    * (θ_milli = (n·Sxy − Sx·Sy)·1000 DIV (n·Sxx − Sx²), DECIMAL(38,0)
    * intermediates; signed DIV — truncation toward zero matches //
    * on both engines, verified) and E[X] to whole cents — a pinned
    * quantized CUPED, stated in the contract rather than hidden in
    * float noise. Per-user adjustment and arm means are then exact
    * integer arithmetic end to end: one fact scan, one user-keyed
    * aggregate, broadcast 1-row moments. */
  def eventCupedOn(events: DataFrame): DataFrame = {
    val users = events
      .select(col("user_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
        (to_date(col("ts")) < lit("2024-01-16").cast("date"))
          .as("pre"))
      .groupBy("user_id")
      .agg(coalesce(sum(when(col("pre"), col("cents"))), lit(0L)).as("x"),
        coalesce(sum(when(!col("pre"), col("cents"))), lit(0L)).as("y"))
      .localCheckpoint(true) // moments + the adjusted pass
    val mom = users.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
    val withTheta = users.crossJoin(broadcast(mom))
      .withColumn("theta_milli", expr(
        """CASE WHEN CAST(n AS DECIMAL(38,0)) * sxx
          |       - CAST(sx AS DECIMAL(38,0)) * sx > 0 THEN
          |  CAST((CAST(n AS DECIMAL(38,0)) * sxy
          |        - CAST(sx AS DECIMAL(38,0)) * sy) * 1000
          |    DIV (CAST(n AS DECIMAL(38,0)) * sxx
          |         - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)
          |ELSE 0 END""".stripMargin))
      .withColumn("gx", expr("sx DIV n"))
      .withColumn("adj_milli",
        col("y") * 1000 - col("theta_milli") * (col("x") - col("gx")))
    withTheta
      .groupBy((col("user_id") % 2).cast("int").as("variant"))
      .agg(count(lit(1)).as("n_users"),
        expr("CAST(sum(y) * 1000 DIV count(1) AS BIGINT)")
          .as("mean_raw_milli"),
        expr("CAST(sum(adj_milli) DIV count(1) AS BIGINT)")
          .as("mean_adj_milli"),
        max(col("theta_milli")).as("theta_milli"))
      .orderBy("variant")
  }

  def eventCuped(s: SparkSession, dir: String): DataFrame =
    eventCupedOn(Tables.events(s, dir))

  /** L22: sample-ratio-mismatch alarm (Fabijan et al., KDD 2019 —
    * "Diagnosing sample ratio mismatch in A/B testing"): before ANY
    * experiment readout is trusted, check that the realized split
    * matches the designed 50/50 — a skewed split means broken
    * assignment/logging and invalidates every downstream metric. The
    * statistic is the 1-df chi-squared on the two arm sizes against
    * equal expectation, exact in milli:
    * z² = (n₀−n₁)²/(n₀+n₁) → z2_milli = 1000·(n₀−n₁)² DIV n, mapped
    * to p_ppm through the same pinned [[chi2Ladder]] the test battery
    * uses; the alarm fires at p < 0.001 (the industry SRM threshold —
    * deliberately far stricter than the usual 0.05, because the null
    * here is "the infrastructure works"). One user rollup, a 2-row
    * reduction, broadcast ladder lookup. */
  def eventSrmOn(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val arms = events
      .select(col("user_id")).distinct()
      .select((col("user_id") % 2).cast("int").as("variant"))
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"))
      .withColumn("z2_milli", expr(
        "CAST((n0 - n1) * (n0 - n1) * 1000 DIV (n0 + n1) AS BIGINT)"))
    val ladder = chi2Ladder.toDF("thr_milli", "p_ppm")
    arms.join(broadcast(ladder),
        col("z2_milli") >= col("thr_milli"), "left")
      .groupBy("n0", "n1", "z2_milli")
      .agg(min(col("p_ppm")).as("p_ppm"))
      .withColumn("srm_alarm", col("p_ppm") < 1000L)
      .select("n0", "n1", "z2_milli", "p_ppm", "srm_alarm")
  }

  def eventSrm(s: SparkSession, dir: String): DataFrame =
    eventSrmOn(Tables.events(s, dir))

  /** Trailing frame length for [[tsRsiOn]] (Wilder's classic 14). */
  val RsiPeriod = 14

  /** Relative Strength Index (Wilder 1978) in the simple-moving-
    * average (Cutler) form — the equal-weight variant whose trailing
    * sums are exact integers, where Wilder's own recursive smoothing
    * would compound a division each day: per event_type daily cents
    * series, gain = max(Δ,0) / loss = max(−Δ,0) from the lagged day,
    * 14-day trailing sums G and L over a COMPLETE frame only (first
    * emission at day period+1, matching the sma-cross discipline),
    * and RSI = 100·G/(G+L) carried exactly as one division,
    * rsi_ppm = 10⁶·G DIV (G+L); flat windows (G+L=0, RSI undefined)
    * emit nothing. >700000 is the classic overbought readout,
    * <300000 oversold. Day-1 deltas are pinned to 0 on BOTH engines
    * (no NULL-propagation ambiguity in GREATEST). One partitioned
    * window chain on the calendar-bounded daily grid — each series
    * windows independently at any scale. */
  def tsRsiOn(events: DataFrame, period: Int = RsiPeriod): DataFrame = {
    require(period >= 2, s"need period >= 2, got $period")
    val daily = dailyCents(events)
    val w = Window.partitionBy("event_type").orderBy("d")
    val wp = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(-(period - 1), 0)
    daily
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .withColumn("gain", when(col("prev").isNull, 0L)
        .otherwise(greatest(col("cents") - col("prev"), lit(0L))))
      .withColumn("loss", when(col("prev").isNull, 0L)
        .otherwise(greatest(col("prev") - col("cents"), lit(0L))))
      .withColumn("rn", row_number().over(w))
      .withColumn("g", sum(col("gain")).over(wp))
      .withColumn("l", sum(col("loss")).over(wp))
      .filter(col("rn") >= period + 1 && col("g") + col("l") > 0)
      .select(col("event_type"), col("d"), col("cents"),
        col("g").as("gain_sum"), col("l").as("loss_sum"),
        expr("CAST(g * 1000000 DIV (g + l) AS BIGINT)").as("rsi_ppm"))
      .orderBy("event_type", "d")
  }

  def tsRsi(s: SparkSession, dir: String): DataFrame =
    tsRsiOn(Tables.events(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "event_psm_att" -> eventPsmAtt,
    "event_iptw" -> eventIptw,
    "event_cuped" -> eventCuped,
    "ts_spearman" -> tsSpearman,
    "ts_kendall" -> tsKendall,
    "event_cramers_v" -> eventCramersV,
    "event_fdr_bh" -> eventFdrBh,
    "event_holm" -> eventHolm,
    "event_srm" -> eventSrm,
    "ts_changepoint" -> tsChangepoint,
    "ts_rsi" -> tsRsi,
    "feature_target_encode" -> featureTargetEncode,
    "corpus_skyline" -> corpusSkyline,
    "privacy_dp_counts" -> privacyDpCounts,
    "privacy_dp_topk" -> privacyDpTopk,
  )

  private val dailySql =
    """daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Shared oracle prefix mirroring [[pValuesByType]] + the p-sorted
    * rank relation: the family both multiple-testing oracles consume. */
  private def pValueCoreSql: String =
    s"""bt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n0,
       |    CAST(SUM(CASE WHEN isodow(CAST(ts AS DATE)) >= 6
       |      THEN 1 ELSE 0 END) AS BIGINT) AS x0
       |  FROM events GROUP BY 1),
       |t AS (SELECT SUM(n0) AS nt, SUM(x0) AS xt FROM bt),
       |z AS (SELECT event_type, n0, x0, nt - n0 AS n1, xt - x0 AS x1,
       |    CASE WHEN x0 + (xt - x0) > 0 AND xt < nt
       |          AND n0 > 0 AND nt - n0 > 0 THEN
       |      CAST((CAST(n0 AS HUGEINT) + (nt - n0))
       |        * ((CAST(x0 AS HUGEINT) * (nt - n0)
       |            - CAST(xt - x0 AS HUGEINT) * n0)
       |           * (CAST(x0 AS HUGEINT) * (nt - n0)
       |              - CAST(xt - x0 AS HUGEINT) * n0))
       |        * 1000 // (CAST(n0 AS HUGEINT) * (nt - n0)
       |          * (CAST(x0 AS HUGEINT) + (xt - x0))
       |          * (CAST(n0 AS HUGEINT) + (nt - n0) - xt))
       |        AS BIGINT) ELSE 0 END AS z2_milli
       |  FROM bt CROSS JOIN t),
       |ladder(thr_milli, p_ppm) AS (VALUES ${chi2LadderSql}),
       |wp AS (SELECT event_type, z2_milli,
       |    CAST(MIN(p_ppm) AS BIGINT) AS p_ppm
       |  FROM z JOIN ladder ON z2_milli >= thr_milli GROUP BY 1, 2),
       |rk AS (SELECT event_type, z2_milli, p_ppm,
       |    CAST(ROW_NUMBER() OVER (ORDER BY p_ppm, event_type)
       |      AS BIGINT) AS rk,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS m
       |  FROM wp)""".stripMargin

  val oracles: Map[String, String] = Map(
    "event_cuped" ->
      """WITH u AS (SELECT user_id,
        |    CAST(COALESCE(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0)
        |      AS BIGINT) AS x,
        |    CAST(COALESCE(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM u),
        |t AS (SELECT n, sx,
        |    CASE WHEN CAST(n AS HUGEINT) * sxx
        |           - CAST(sx AS HUGEINT) * sx > 0 THEN
        |      CAST((CAST(n AS HUGEINT) * sxy
        |            - CAST(sx AS HUGEINT) * sy) * 1000
        |        // (CAST(n AS HUGEINT) * sxx
        |           - CAST(sx AS HUGEINT) * sx) AS BIGINT)
        |    ELSE 0 END AS theta_milli,
        |    sx // n AS gx
        |  FROM m),
        |adj AS (SELECT user_id, y, theta_milli,
        |    y * 1000 - theta_milli * (x - gx) AS adj_milli
        |  FROM u CROSS JOIN t)
        |SELECT CAST(user_id % 2 AS INT) AS variant,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(y) * 1000 // COUNT(*) AS BIGINT) AS mean_raw_milli,
        |  CAST(SUM(adj_milli) // COUNT(*) AS BIGINT) AS mean_adj_milli,
        |  CAST(MAX(theta_milli) AS BIGINT) AS theta_milli
        |FROM adj GROUP BY 1 ORDER BY variant""".stripMargin,
    "event_psm_att" ->
      """WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS score,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0)
        |      AS BIGINT) AS out_cents
        |  FROM events GROUP BY 1),
        |c AS (SELECT score AS score_c, MIN(user_id) AS ctrl_user
        |  FROM u WHERE user_id % 2 = 0 GROUP BY 1),
        |co AS (SELECT score_c, c.ctrl_user, u.out_cents AS out_c
        |  FROM c JOIN u ON c.ctrl_user = u.user_id),
        |t AS (SELECT * FROM u WHERE user_id % 2 = 1),
        |j AS (SELECT t.user_id AS treated_user, t.score AS score_t,
        |    co.ctrl_user, co.score_c, t.out_cents AS out_t_cents,
        |    co.out_c AS out_c_cents,
        |    abs(t.score - co.score_c) AS gap,
        |    CASE WHEN co.score_c <= t.score THEN 0 ELSE 1 END AS dirn
        |  FROM t CROSS JOIN co)
        |SELECT treated_user, score_t, ctrl_user, score_c, out_t_cents,
        |  out_c_cents, out_t_cents - out_c_cents AS diff_cents
        |FROM j QUALIFY row_number() OVER (PARTITION BY treated_user
        |  ORDER BY gap, dirn, score_c) = 1
        |ORDER BY treated_user""".stripMargin,
    // Mirrors eventIptwOn: positivity-trimmed strata, integer
    // micro-means, DECIMAL-cleared stratum weights.
    "event_iptw" ->
      """WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0)
        |      AS BIGINT) AS out_cents,
        |    user_id % 2 = 1 AS treated
        |  FROM events GROUP BY 1),
        |st AS (SELECT n_ev // 4 AS stratum,
        |    CAST(COUNT(*) AS BIGINT) AS n_s,
        |    CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS t_s,
        |    CAST(COALESCE(SUM(CASE WHEN treated THEN out_cents END), 0)
        |      AS BIGINT) AS sum_t_cents,
        |    CAST(COALESCE(SUM(CASE WHEN NOT treated THEN out_cents END), 0)
        |      AS BIGINT) AS sum_c_cents
        |  FROM u GROUP BY 1
        |  HAVING t_s > 0 AND t_s < n_s),
        |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_tot FROM st),
        |d AS (SELECT stratum, n_s, t_s,
        |    CAST(t_s * 1000000 // n_s AS BIGINT) AS e_ppm,
        |    CAST(sum_t_cents * 1000000 // t_s AS BIGINT) AS y1_micro,
        |    CAST(sum_c_cents * 1000000 // (n_s - t_s) AS BIGINT) AS y0_micro,
        |    CAST(sum_t_cents * 1000000 // t_s
        |      - sum_c_cents * 1000000 // (n_s - t_s) AS BIGINT) AS d_micro,
        |    CAST(CAST(n_s AS HUGEINT)
        |      * (sum_t_cents * 1000000 // t_s
        |         - sum_c_cents * 1000000 // (n_s - t_s))
        |      // n_tot AS BIGINT) AS w_contrib_micro
        |  FROM st CROSS JOIN tot),
        |ate AS (SELECT CAST(SUM(w_contrib_micro) AS BIGINT) AS ate_micro
        |  FROM d)
        |SELECT stratum, n_s, t_s, e_ppm, y1_micro, y0_micro, d_micro,
        |  w_contrib_micro, ate_micro
        |FROM d CROSS JOIN ate ORDER BY stratum""".stripMargin,
    "ts_spearman" ->
      s"""WITH $dailySql,
        |r AS (SELECT event_type,
        |    2 * ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
        |      AS dx,
        |    2 * RANK() OVER (PARTITION BY event_type ORDER BY cents)
        |      + COUNT(*) OVER (PARTITION BY event_type, cents) - 1 AS dy
        |  FROM daily),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    SUM(dx) AS sx, SUM(dy) AS sy, SUM(dx * dy) AS sxy,
        |    SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_days,
        |  CASE WHEN n_days * sxx - sx * sx > 0
        |        AND n_days * syy - sy * sy > 0 THEN
        |    (n_days * sxy - sx * sy) /
        |      sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
        |           * (n_days * syy - sy * sy)) END AS rho_spearman
        |FROM m ORDER BY event_type""".stripMargin,
    "ts_kendall" ->
      s"""WITH $dailySql,
        |p AS (SELECT a.event_type,
        |    CAST(SUM(CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nc,
        |    CAST(SUM(CASE WHEN b.cents < a.cents THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nd,
        |    CAST(SUM(CASE WHEN b.cents = a.cents THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nt
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND b.d > a.d
        |  GROUP BY 1),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1)
        |SELECT p.event_type, n_days, nc, nd, nt AS n_tied,
        |  CASE WHEN n_days >= 2
        |        AND n_days * (n_days - 1) // 2 > nt THEN
        |    (nc - nd) /
        |      sqrt(CAST(n_days * (n_days - 1) // 2 AS DOUBLE)
        |           * (n_days * (n_days - 1) // 2 - nt)) END AS tau_b
        |FROM p JOIN n ON p.event_type = n.event_type
        |ORDER BY p.event_type""".stripMargin,
    "event_cramers_v" ->
      """WITH cells AS (SELECT event_type, isodow(CAST(ts AS DATE)) AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, SUM(o) AS r FROM cells GROUP BY 1),
        |ct AS (SELECT dow, SUM(o) AS c FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_rows,
        |    CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_cols
        |  FROM cells),
        |s AS (SELECT n, n_rows, n_cols,
        |    CAST(SUM((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |      * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |      * 1000000 // (CAST(n AS HUGEINT) * r * c)) AS BIGINT)
        |      AS chi2_ppm
        |  FROM cells JOIN rt ON cells.event_type = rt.event_type
        |    JOIN ct ON cells.dow = ct.dow CROSS JOIN t
        |  GROUP BY 1, 2, 3)
        |SELECT n, n_rows, n_cols, chi2_ppm,
        |  CASE WHEN least(n_rows, n_cols) > 1 THEN
        |    sqrt(chi2_ppm /
        |      (CAST(n AS DOUBLE) * (least(n_rows, n_cols) - 1)
        |       * 1000000)) END AS v_cramer
        |FROM s""".stripMargin,
    "event_fdr_bh" ->
      s"""WITH $pValueCoreSql,
        |ks AS (SELECT MAX(CASE WHEN p_ppm * m <= rk * 50000
        |    THEN rk ELSE 0 END) AS k_star FROM rk)
        |SELECT event_type, z2_milli, p_ppm, rk, m,
        |  rk <= k_star AS reject
        |FROM rk CROSS JOIN ks ORDER BY rk""".stripMargin,
    // Mirrors privacyDpTopkOn: same seed, same fresh LCG coin, same
    // noise ladder string, k = 3 released ranks with eval columns.
    "privacy_dp_topk" ->
      s"""WITH c AS (SELECT event_type,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
        |  FROM events GROUP BY 1),
        |s AS (SELECT event_type, n_true,
        |    (ascii(substr(event_type, 1, 1)) * 961
        |     + ascii(substr(event_type, 2, 1)) * 31
        |     + length(event_type)) AS seed
        |  FROM c),
        |nz AS (SELECT event_type, n_true,
        |    (CAST(seed AS BIGINT) * 1103515245 + 54321) % 766 AS u
        |  FROM s),
        |nn AS (SELECT event_type, n_true,
        |    n_true + CAST($dpTopkNoiseSql AS BIGINT) AS n_noisy
        |  FROM nz),
        |r AS (SELECT event_type, n_true, n_noisy,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_noisy DESC,
        |      event_type ASC) AS BIGINT) AS noisy_rank,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_true DESC,
        |      event_type ASC) AS BIGINT) AS true_rank
        |  FROM nn)
        |SELECT noisy_rank, event_type, n_noisy, n_true, true_rank
        |FROM r WHERE noisy_rank <= 3 ORDER BY noisy_rank""".stripMargin,
    // Mirrors eventSrmOn: distinct users, 50/50 chi-squared in milli,
    // pinned ladder lookup, p < 0.001 alarm.
    "event_srm" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1
        |  FROM u),
        |z AS (SELECT n0, n1,
        |    CAST((n0 - n1) * (n0 - n1) * 1000 // (n0 + n1) AS BIGINT)
        |      AS z2_milli
        |  FROM a),
        |ladder(thr_milli, p_ppm) AS (VALUES ${chi2LadderSql})
        |SELECT n0, n1, z2_milli,
        |  CAST(MIN(p_ppm) AS BIGINT) AS p_ppm,
        |  CAST(MIN(p_ppm) AS BIGINT) < 1000 AS srm_alarm
        |FROM z JOIN ladder ON z2_milli >= thr_milli
        |GROUP BY n0, n1, z2_milli""".stripMargin,
    // Mirrors eventHolmOn: step-down over the shared p family, reject
    // strictly below the first failing rank (all m+1 when none fail).
    "event_holm" ->
      s"""WITH $pValueCoreSql,
        |ff AS (SELECT MIN(CASE WHEN p_ppm * (m - rk + 1) > 50000
        |    THEN rk END) AS first_fail FROM rk)
        |SELECT event_type, z2_milli, p_ppm, rk, m,
        |  CAST(p_ppm * (m - rk + 1) AS BIGINT) AS holm_stat_ppm,
        |  rk < COALESCE(first_fail, m + 1) AS reject
        |FROM rk CROSS JOIN ff ORDER BY rk""".stripMargin,
    // Mirrors tsRsiOn: day-1 deltas pinned to 0, complete frames only,
    // flat windows dropped before the single division.
    "ts_rsi" ->
      s"""WITH $dailySql,
        |lagd AS (SELECT event_type, d, cents,
        |    LAG(cents, 1) OVER (PARTITION BY event_type ORDER BY d)
        |      AS prev
        |  FROM daily),
        |gl AS (SELECT event_type, d, cents,
        |    CASE WHEN prev IS NULL THEN 0
        |      ELSE GREATEST(cents - prev, 0) END AS gain,
        |    CASE WHEN prev IS NULL THEN 0
        |      ELSE GREATEST(prev - cents, 0) END AS loss,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        |  FROM lagd),
        |s AS (SELECT event_type, d, cents, rn,
        |    SUM(gain) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN ${RsiPeriod - 1} PRECEDING AND CURRENT ROW)
        |      AS g,
        |    SUM(loss) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN ${RsiPeriod - 1} PRECEDING AND CURRENT ROW)
        |      AS l
        |  FROM gl)
        |SELECT event_type, d, cents, CAST(g AS BIGINT) AS gain_sum,
        |  CAST(l AS BIGINT) AS loss_sum,
        |  CAST(g * 1000000 // (g + l) AS BIGINT) AS rsi_ppm
        |FROM s WHERE rn >= ${RsiPeriod + 1} AND g + l > 0
        |ORDER BY event_type, d""".stripMargin,
    "ts_changepoint" ->
      s"""WITH $dailySql,
        |w AS (SELECT event_type, d,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
        |      AS BIGINT) AS rn,
        |    SUM(cents) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    SUM(cents) OVER (PARTITION BY event_type) AS st
        |  FROM daily),
        |sc AS (SELECT event_type, d, rn, sl, n, st,
        |    ((CAST(n - rn AS HUGEINT) * sl
        |      - CAST(rn AS HUGEINT) * (st - sl))
        |     * (CAST(n - rn AS HUGEINT) * sl
        |        - CAST(rn AS HUGEINT) * (st - sl)))
        |     // (CAST(rn AS HUGEINT) * (n - rn)) AS score
        |  FROM w WHERE rn < n),
        |pk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY score DESC, d ASC) AS pick FROM sc)
        |SELECT event_type, d AS split_day, rn AS n_left,
        |  n - rn AS n_right,
        |  CAST(sl // rn AS BIGINT) AS mean_left_cents,
        |  CAST((st - sl) // (n - rn) AS BIGINT) AS mean_right_cents,
        |  CAST((st - sl) // (n - rn) - sl // rn AS BIGINT) AS gap_cents
        |FROM pk WHERE pick = 1 ORDER BY event_type""".stripMargin,
    "feature_target_encode" ->
      """WITH wn AS (SELECT o_orderkey, c_nationkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT c_nationkey, CAST(SUM(cents) AS BIGINT) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS ng
        |  FROM wn GROUP BY 1),
        |p AS (SELECT CAST(SUM(cents) // COUNT(*) AS BIGINT) AS gmean
        |  FROM wn)
        |SELECT o_orderkey, wn.c_nationkey, cents,
        |  CASE WHEN ng >= 2
        |    THEN CAST((s - cents) // (ng - 1) AS BIGINT) END AS loo_cents,
        |  CAST((s + 10 * gmean) // (ng + 10) AS BIGINT) AS smooth_cents
        |FROM wn JOIN g ON wn.c_nationkey = g.c_nationkey CROSS JOIN p
        |ORDER BY o_orderkey""".stripMargin,
    "corpus_skyline" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) * 1000000
        |      // len(string_split(text, ' ')) AS BIGINT) AS ttr_ppm
        |  FROM documents WHERE len(string_split(text, ' ')) > 0)
        |SELECT doc_id, n_tokens, ttr_ppm FROM d a
        |WHERE NOT EXISTS (SELECT 1 FROM d b
        |  WHERE b.n_tokens >= a.n_tokens AND b.ttr_ppm >= a.ttr_ppm
        |    AND (b.n_tokens > a.n_tokens OR b.ttr_ppm > a.ttr_ppm))
        |ORDER BY doc_id""".stripMargin,
    "privacy_dp_counts" ->
      """WITH c AS (SELECT event_type,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
        |  FROM events GROUP BY 1),
        |s AS (SELECT event_type, n_true,
        |    (CAST(ascii(substr(event_type, 1, 1)) AS BIGINT) * 961
        |     + ascii(substr(event_type, 2, 1)) * 31
        |     + length(event_type)) AS seed
        |  FROM c),
        |u AS (SELECT event_type, n_true,
        |    (seed * 2654435761 + 12345) % 766 AS u FROM s),
        |nz AS (SELECT event_type, n_true, CAST(CASE
        |    WHEN u < 256 THEN 0
        |    WHEN u < 384 THEN 1 WHEN u < 512 THEN -1
        |    WHEN u < 576 THEN 2 WHEN u < 640 THEN -2
        |    WHEN u < 672 THEN 3 WHEN u < 704 THEN -3
        |    WHEN u < 720 THEN 4 WHEN u < 736 THEN -4
        |    WHEN u < 744 THEN 5 WHEN u < 752 THEN -5
        |    WHEN u < 756 THEN 6 WHEN u < 760 THEN -6
        |    WHEN u < 762 THEN 7 WHEN u < 764 THEN -7
        |    WHEN u < 765 THEN 8 ELSE -8 END AS BIGINT) AS noise
        |  FROM u)
        |SELECT event_type, n_true, noise,
        |  greatest(n_true + noise, 0) AS n_released,
        |  CAST(693 AS BIGINT) AS epsilon_milli
        |FROM nz ORDER BY event_type""".stripMargin,
  )
}
