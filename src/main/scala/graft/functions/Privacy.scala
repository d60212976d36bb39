package graft.functions

import graft.{Guards, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy auditing for release-bound datasets — the k-anonymity /
  * l-diversity checks (Sweeney 2002; Machanavajjhala et al. 2007) a
  * pipeline runs before publishing user-derived training data or
  * aggregate statistics.
  *
  * Everything is windows and hash aggregates keyed by the
  * quasi-identifier — the natural Spark shape: at 100 TB the QI
  * window is a keyed shuffle like any groupBy, and the generalization
  * ladder costs one extra window over the SAME shuffle key prefix
  * (nation, segment, coarser bucket), never a global pass. All
  * arithmetic is integer (counts, floor-bucketed balances), so the
  * DuckDB oracle replays bit-for-bit.
  *
  * Reference tie-in: none (the reference pipeline publishes bbox
  * crops, not user tables) — this family belongs to the
  * training-data-pipeline extension surface, beside text_pii_mask
  * (Text.scala), which redacts VALUES inside free text while these
  * operators audit the STRUCTURE of a release.
  */
object Privacy {

  /** Anonymity threshold: a QI group under K rows is re-identifiable
    * (Sweeney's k). 5 is the classic census value. */
  val K = 5

  /** L16a: k-anonymity audit with one generalization-ladder step —
    * Samarati's lattice move, locally recoded:
    *
    *  - level 0: QI = (segment, balance bucketed to 100s). Groups
    *    with >= K rows publish as-is.
    *  - level 1: rows whose level-0 group is small re-bucket the
    *    balance to 1000s; if the MERGED small-row group reaches K it
    *    publishes at the coarser bucket.
    *  - level 2: still-small groups are suppressed ('*' bucket —
    *    counted, never published).
    *
    * Output: one row per published group with its generalization
    * level, row count, and the l-diversity of the nation attribute
    * (distinct nations inside the group — Machanavajjhala's l: a
    * k-anonymous group that is all one nation still leaks nation).
    *
    * Both "counts" are window functions over QI keys — two shuffles
    * total, no self-joins; the suppression decision rides along with
    * every row, so the final relation is one hash aggregate. */
  def privacyKanonOn(rows: DataFrame, k: Int = K): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val b = rows.select(
      col("c_mktsegment").as("segment"),
      col("c_nationkey").as("nation"),
      floor(col("c_acctbal") / 100).cast("long").as("b0"),
      floor(col("c_acctbal") / 1000).cast("long").as("b1"))
    val w0 = Window.partitionBy("segment", "b0")
    val w1 = Window.partitionBy("segment", "b1")
    val leveled = b
      .withColumn("n0", count(lit(1)).over(w0))
      // level-1 candidates are only the rows FAILING level 0 (local
      // recoding): count the failing rows inside the coarser bucket
      .withColumn("n1",
        sum(when(col("n0") < k, 1L).otherwise(0L)).over(w1))
      .withColumn("level",
        when(col("n0") >= k, 0)
          .when(col("n1") >= k, 1)
          .otherwise(2))
      .withColumn("bucket",
        when(col("level") === 0, concat(lit("h"), col("b0")))
          .when(col("level") === 1, concat(lit("k"), col("b1")))
          .otherwise(lit("*")))
    leveled.groupBy("segment", "bucket", "level")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("nation")).as("l_div"))
      .orderBy("segment", "bucket")
  }

  def privacyKanon(s: SparkSession, dir: String): DataFrame =
    privacyKanonOn(Tables.customer(s, dir))

  /** L16d: t-closeness audit (Li, Li & Venkatasubramanian, ICDE
    * 2007) — the rung ABOVE [[privacyKanonOn]]'s k/l ladder: a group
    * can be k-anonymous and l-diverse yet still leak when its
    * sensitive-value DISTRIBUTION diverges from the table's (the
    * classic "this ZIP is 90% one diagnosis" leak). For the
    * categorical sensitive attribute (nation) the t-distance is the
    * variational distance t = ½·Σ_v |p_class(v) − p_global(v)|,
    * spelled EXACTLY in integers by clearing both denominators:
    * Σ_v |n_cv·N − n_c·N_v| over present values plus the absent-value
    * residual n_c·(N − Σ_present N_v), then ONE division
    * t_ppm = 10⁶·num DIV (2·n_c·N) (all operands non-negative).
    * meets_t flags t_ppm <= 200000 (t = 0.2, the paper's working
    * example). QI classes = (segment, 1000s balance bucket) — the
    * kanon level-1 lattice cell, so the two audits read together.
    *
    * Shape: three map-side-combined rollups (class, class×value,
    * value) off one pass; the per-value join fans each class row out
    * by its PRESENT sensitive values only (≤ |nations| = 25,
    * vocabulary-bounded); global totals ride a broadcast. At 100 TB
    * nothing here scales past the class×value rollup. */
  def privacyTclosenessOn(rows: DataFrame): DataFrame = {
    val b = rows.select(col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 1000).cast("long").as("bucket"),
      col("c_nationkey").as("nation"))
    val cv = b.groupBy("segment", "bucket", "nation")
      .agg(count(lit(1)).as("n_cv"))
      .localCheckpoint(true) // class rollup + per-value join
    val cls = cv.groupBy("segment", "bucket")
      .agg(sum(col("n_cv")).as("n_c"))
    val gv = cv.groupBy("nation").agg(sum(col("n_cv")).as("n_v"))
    val tot = gv.agg(sum(col("n_v")).as("n_total"))
    val present = cv.join(broadcast(gv), "nation")
      .groupBy("segment", "bucket")
      .agg(sum(col("n_v")).as("n_v_present"))
    cv.join(broadcast(gv), "nation")
      .crossJoin(broadcast(tot))
      .join(cls, Seq("segment", "bucket"))
      .groupBy("segment", "bucket", "n_c", "n_total")
      .agg(sum(abs(col("n_cv") * col("n_total") - col("n_c") * col("n_v")))
        .as("num_present"))
      .join(present, Seq("segment", "bucket"))
      .select(col("segment"), col("bucket"), col("n_c").as("n_rows"),
        (col("num_present")
          + col("n_c") * (col("n_total") - col("n_v_present")))
          .as("t_num"),
        col("n_total"))
      .select(col("segment"), col("bucket"), col("n_rows"),
        expr("CAST(t_num * 1000000 DIV (2 * n_rows * n_total) AS BIGINT)")
          .as("t_ppm"))
      .withColumn("meets_t", col("t_ppm") <= 200000L)
      .orderBy("segment", "bucket")
  }

  def privacyTcloseness(s: SparkSession, dir: String): DataFrame =
    privacyTclosenessOn(Tables.customer(s, dir))

  /** L16e: recursive (c,l)-diversity audit (Machanavajjhala et al.,
    * TKDD 2007 §4.2) — the rung BETWEEN [[privacyKanonOn]]'s distinct-l
    * readout and [[privacyTclosenessOn]]'s distributional one: distinct
    * l-diversity passes a class where one sensitive value covers 99%
    * of rows and l−1 stragglers cover the rest; the recursive
    * criterion instead demands the MOST FREQUENT value not dominate
    * the tail, r₁ < c·(r_l + r_{l+1} + … + r_m) over the class's
    * desc-sorted sensitive-value counts r₁ ≥ … ≥ r_m. Pure counting —
    * no logs (that's ENTROPY l-diversity, deliberately skipped: its
    * Σp·ln p readout has no exact integer spelling), so both engines
    * replay bit-for-bit.
    *
    * QI classes are the (segment, 1000s-balance) cells of the
    * tcloseness audit, sensitive attribute = nation — the three
    * privacy audits read off the SAME class key. Shape: one
    * class×value rollup, one rank window INSIDE each class (≤ 25
    * nation rows per class — vocabulary-bounded, never a wide
    * partition), one final class rollup. At 100 TB all three hops key
    * on the QI prefix; nothing global. Ties in the count rank break
    * to the lower nation id, shared with the oracle. */
  def privacyRecursiveLdivOn(rows: DataFrame, l: Int = 3,
      c: Int = 2): DataFrame = {
    require(l >= 2 && c >= 1, s"need l >= 2 and c >= 1, got ($c,$l)")
    val b = rows.select(col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 1000).cast("long").as("bucket"),
      col("c_nationkey").as("nation"))
    val cv = b.groupBy("segment", "bucket", "nation")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("segment", "bucket")
      .orderBy(col("n").desc, col("nation").asc)
    cv.withColumn("rk", row_number().over(w))
      .groupBy("segment", "bucket")
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("m_distinct"),
        max(when(col("rk") === 1, col("n"))).as("r1"),
        coalesce(sum(when(col("rk") >= l, col("n"))), lit(0L))
          .as("tail_sum"))
      .withColumn("meets_cl", col("r1") < lit(c.toLong) * col("tail_sum"))
      .orderBy("segment", "bucket")
  }

  def privacyRecursiveLdiv(s: SparkSession, dir: String): DataFrame =
    privacyRecursiveLdivOn(Tables.customer(s, dir))

  /** Per-user event budget for [[privacyContributionCapOn]]. */
  val ContributionCap = 8

  /** L16f: user-contribution bounding — the CLIPPING step of
    * user-level DP aggregation (Wilson et al., VLDB 2020,
    * "Differentially Private SQL with Bounded User Contribution"):
    * before noise can promise user-level privacy, each user's
    * influence on every released count must be bounded, so each user
    * keeps only their FIRST `cap` events under the deterministic
    * (ts, event_id) total order and the rest are clipped. The audit
    * reports, per event type, raw vs capped counts and the clipped
    * mass in ppm — the utility price of making [[privacyDpCountsOn]]'
    * sensitivity-1 assumption actually true. Heavy users dominate the
    * clipped mass by construction; the per-type breakdown shows WHERE
    * the bound bites.
    *
    * Shape: one user-keyed rank window (bounded by per-user activity,
    * the repo's standard journey partitioning), then a
    * vocabulary-bounded rollup; integer ppm, total-order output. */
  def privacyContributionCapOn(events: DataFrame,
      cap: Int = ContributionCap): DataFrame = {
    require(cap >= 1, s"need cap >= 1, got $cap")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"))
      .withColumn("rk", row_number().over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("rk") <= cap, 1L).otherwise(0L)).as("n_capped"))
      .withColumn("n_clipped", col("n_raw") - col("n_capped"))
      .withColumn("clipped_ppm", expr("n_clipped * 1000000 DIV n_raw"))
      .orderBy("event_type")
  }

  def privacyContributionCap(s: SparkSession, dir: String): DataFrame =
    privacyContributionCapOn(Tables.events(s, dir))

  /** Per-user spend clip for [[privacyDpMeanOn]], in cents. */
  val DpMeanCapCents = 10000L

  /** L16h: DP mean release (the bounded-mean mechanism: clip each
    * user's contribution, add noise scaled to the clip to the SUM and
    * unit noise to the COUNT, divide — Dwork & Roth 2014 §3.4's
    * noisy-sum/noisy-count quotient, with the clipping step
    * [[privacyContributionCapOn]] audits made concrete): per event
    * type, per-user spend is clipped at [[DpMeanCapCents]], the sum
    * release adds a two-sided geometric draw × cap (sensitivity =
    * cap after clipping), the count release adds an independent unit
    * draw, both on pinned derandomized LCG coins (the
    * privacy_dp_counts surrogate convention — production swaps in a
    * real RNG and drops the audit columns). ε accounting: two ε≈0.693
    * releases → 1386 milli total. Released mean = noisy_sum·1000 DIV
    * noisy_n in milli-cents, NULL-gated when the noisy count lands
    * non-positive; clipped-user count rides as the utility audit.
    *
    * Shape: one user×type rollup (map-side combinable), then a
    * |types|-row aggregate — nothing past the rollup scales. */
  def privacyDpMeanOn(events: DataFrame,
      cap: Long = DpMeanCapCents): DataFrame = {
    require(cap >= 1, s"need cap >= 1, got $cap")
    val perUser = events.filter(col("event_type").isNotNull)
      .groupBy("event_type", "user_id")
      .agg(coalesce(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")),
        lit(0L)).as("spend"))
      .select(col("event_type"), col("user_id"),
        least(col("spend"), lit(cap)).as("clipped"),
        (col("spend") > cap).cast("long").as("hit"))
    perUser.groupBy("event_type")
      .agg(count(lit(1)).as("n_true"),
        sum(col("clipped")).as("sum_true_cents"),
        sum(col("hit")).as("n_clipped_users"))
      .withColumn("seed",
        expr("""ascii(substr(event_type, 1, 1)) * 961
               | + ascii(substr(event_type, 2, 1)) * 31
               | + length(event_type)""".stripMargin))
      .withColumn("u",
        expr("(CAST(seed AS BIGINT) * 1103515245 + 54321) % 766"))
      .withColumn("noise_sum", expr(dpGeomNoiseSql).cast("long"))
      .withColumn("u", expr("(CAST(seed AS BIGINT) * 69069 + 98765) % 766"))
      .withColumn("noise_n", expr(dpGeomNoiseSql).cast("long"))
      .select(col("event_type"), col("n_true"), col("sum_true_cents"),
        col("n_clipped_users"), col("noise_sum"), col("noise_n"),
        greatest(col("sum_true_cents") + col("noise_sum") * cap, lit(0L))
          .as("sum_released_cents"),
        greatest(col("n_true") + col("noise_n"), lit(0L))
          .as("n_released"))
      .withColumn("mean_released_milli", expr(
        """CASE WHEN n_released > 0
          | THEN sum_released_cents * 1000 DIV n_released END"""
          .stripMargin))
      .withColumn("epsilon_milli", lit(1386L))
      .orderBy("event_type")
  }

  def privacyDpMean(s: SparkSession, dir: String): DataFrame =
    privacyDpMeanOn(Tables.events(s, dir))

  /** The privacy_dp_counts two-sided geometric ladder (p = 2/3,
    * ε ≈ 0.693 per draw) over a coin column `u` ∈ [0, 766) — ONE
    * string evaluated verbatim by both engines (the shared-literal
    * rule). */
  private val dpGeomNoiseSql: String =
    """CASE WHEN u < 256 THEN 0
      | WHEN u < 384 THEN 1 WHEN u < 512 THEN -1
      | WHEN u < 576 THEN 2 WHEN u < 640 THEN -2
      | WHEN u < 672 THEN 3 WHEN u < 704 THEN -3
      | WHEN u < 720 THEN 4 WHEN u < 736 THEN -4
      | WHEN u < 744 THEN 5 WHEN u < 752 THEN -5
      | WHEN u < 756 THEN 6 WHEN u < 760 THEN -6
      | WHEN u < 762 THEN 7 WHEN u < 764 THEN -7
      | WHEN u < 765 THEN 8 ELSE -8 END""".stripMargin

  /** Keep-probability for [[privacyLdpFrequencyOn]], in milli (750 =
    * report the true value 75% of the time — ε = ln(3·(K−1)) for the
    * K-ary mechanism). */
  val LdpKeepMilli = 750L

  /** L16b: local-DP frequency estimation — k-ary randomized response
    * (Warner 1965; the RAPPOR/Apple-style collection shape): each
    * user reports their true category with probability p, else a
    * uniformly drawn category; the collector sees only the noisy
    * reports and inverts the mechanism,
    *   t̂_c = (K·o_c − (1−p)·N) / (K·p),
    * recovering unbiased counts WITHOUT ever storing a true value.
    * The catalog row carries the true counts beside the estimate
    * (est/err eval columns — the sketch_theta discipline), so the
    * mechanism's accuracy is measured in-catalog.
    *
    * The per-user coin is the derandomized LCG draw (the walk-corpus
    * discipline): r = (uid·1103515245 + 12345) mod 2³¹, keep iff
    * r mod 1000 < p_milli, else report the category ranked
    * (r div 1000) mod K — both engines replay the identical noise,
    * so the oracle is exact. Estimator arithmetic is pure integer
    * milli with the numerator clipped at 0 (sampling noise can push
    * it negative; DIV stays on non-negative operands). Shape: one
    * row-level draw against the broadcast K-row category rank, one
    * category rollup, 1-row N broadcast. */
  def privacyLdpFrequencyOn(users: DataFrame,
      keepMilli: Long = LdpKeepMilli): DataFrame = {
    require(keepMilli >= 1 && keepMilli <= 1000,
      s"need keepMilli in [1,1000], got $keepMilli")
    val base = users.select(col("c_custkey").cast("long").as("uid"),
      col("c_mktsegment").as("seg"))
    val wK = Window.partitionBy(Guards.one).orderBy("seg") // K rows only
    val cats = Guards.requireBounded(base.select("seg").distinct(),
        1024L, "privacy_ldp_frequency category vocabulary")
      .withColumn("k_idx", row_number().over(wK).cast("long") - 1)
      .localCheckpoint(true) // tiny; read by draw, rollup and readout
    val kCount = cats.agg(count(lit(1)).as("kk"))
    val reported = base
      .withColumn("r", expr("(uid * 1103515245 + 12345) % 2147483648"))
      .crossJoin(broadcast(kCount))
      .withColumn("keep", expr(s"r % 1000 < $keepMilli"))
      .withColumn("noise_idx", expr("(r div 1000) % kk"))
      .join(broadcast(cats.select(col("k_idx").as("noise_idx"),
        col("seg").as("noise_seg"))), Seq("noise_idx"))
      .select(col("uid"), col("seg").as("true_seg"),
        when(col("keep"), col("seg")).otherwise(col("noise_seg"))
          .as("rep_seg"))
    val obs = reported.groupBy(col("rep_seg").as("seg"))
      .agg(count(lit(1)).as("n_reported"))
    val truth = reported.groupBy(col("true_seg").as("seg"))
      .agg(count(lit(1)).as("n_true"))
    val n = reported.agg(count(lit(1)).as("nn"))
    obs.join(truth, Seq("seg"), "full_outer")
      .na.fill(0L, Seq("n_reported", "n_true"))
      .crossJoin(broadcast(n)).crossJoin(broadcast(kCount))
      .withColumn("t_hat_milli", expr(
        s"""greatest(kk * n_reported * 1000 - (1000 - $keepMilli) * nn, 0)
           | * 1000 div (kk * $keepMilli)""".stripMargin))
      .select(col("seg"), col("n_reported"), col("n_true"),
        col("t_hat_milli"),
        (col("t_hat_milli") - col("n_true") * 1000L).as("err_milli"))
      .orderBy("seg")
  }

  def privacyLdpFrequency(s: SparkSession, dir: String): DataFrame =
    privacyLdpFrequencyOn(Tables.customer(s, dir))

  /** ε in milli (100 = ε 0.1) and target quantile in milli (500 =
    * median) for [[privacyDpQuantileOn]]. */
  val DpQuantEpsMilli = 100L
  val DpQuantQMilli = 500L

  /** The exponential-mechanism weight of a candidate at milli-rank
    * distance `d` — ONE string evaluated verbatim by both engines
    * (the lm_kneser_ney discipline): exp crosses the round(,9)
    * contract boundary before the micro-unit floor, and the 1-floor
    * keeps every candidate drawable so the cumulative line has no
    * zero-width gaps. */
  private def dpqWeightSql(epsMilli: Long): String =
    s"greatest(1, CAST(floor(round(exp(-($epsMilli / 1000.0) * d" +
      " / 4000.0), 9) * 1000000) AS BIGINT))"

  /** L16c: DP quantile release via the exponential mechanism
    * (McSherry & Talwar, FOCS 2007; Smith 2011's quantile
    * instantiation) — the third DP primitive beside the central
    * Laplace counts (privacy_dp_counts) and local randomized
    * response (privacy_ldp_frequency): SELECTION. Publishing an
    * exact median leaks; the mechanism instead draws a candidate
    * value with probability ∝ exp(ε·u/2) where u is minus the rank
    * distance to the target quantile — utility degrades smoothly, so
    * no single record changes any candidate's weight by more than
    * the sensitivity.
    *
    * Derandomized end to end: weights are integer micro-units (the
    * exp passes the round(,9) boundary, then floors, then a 1-floor
    * so every candidate stays drawable), the cumulative-weight line
    * comes from the bucketed [[graft.operators.Events.prefixByCents]]
    * sweep (value-domain relation, NO single-partition sort), and
    * the draw is the walk-corpus LCG landed on that line exactly as
    * [[graft.functions.Clusters.graphNode2vecWalkOn]] lands its
    * neighbor draw: the unique candidate with cw ≤ r < cw + w. The
    * true quantile (the 2·cum ≥ 2·q·n rule — the agg_weighted_median
    * discipline) rides along so the mechanism's rank error is
    * measured in-catalog (the sketch_theta est/err convention).
    *
    * Shape at 100 TB: one scan to the distinct-cents relation, two
    * bucketed sweeps over it, three 1-row broadcasts, one filter.
    * Output: ONE row. */
  def privacyDpQuantileOn(rows: DataFrame,
      epsMilli: Long = DpQuantEpsMilli,
      qMilli: Long = DpQuantQMilli): DataFrame = {
    require(epsMilli >= 1, s"need epsMilli >= 1, got $epsMilli")
    require(qMilli >= 1 && qMilli <= 999,
      s"need qMilli in [1,999], got $qMilli")
    val byV = rows
      .select(floor(col("c_acctbal") * 100 + lit(0.5)).cast("long")
        .as("cents"))
      .groupBy("cents").agg(count(lit(1)).as("t"))
    val tot = byV.agg(sum(col("t")).as("n"))
    val ranked = graft.operators.Events.prefixByCents(byV, Seq("t"))
      .crossJoin(broadcast(tot))
      .withColumn("cum", col("cum_t") + col("t")) // # of rows <= v
      .withColumn("d",
        abs(lit(2000L) * col("cum") - lit(2L) * lit(qMilli) * col("n")))
      .withColumn("w", expr(dpqWeightSql(epsMilli)))
      .select("cents", "t", "cum", "d", "w", "n")
      // Round 12 (optimization): three consumers (true-quantile
      // filter, total-weight agg, the selection sweep) re-derived this
      // relation, and its derivation contains the bucketed
      // prefix-sweep WINDOW passes — post-exchange work that AQE
      // exchange reuse does NOT deduplicate (unlike the exchanges
      // themselves). One distinct-cents-sized checkpoint, three reads.
      .localCheckpoint(true)
    // true quantile: minimal v with 1000·cum >= q·n
    val trueQ = ranked
      .filter(lit(1000L) * col("cum") >= lit(qMilli) * col("n"))
      .agg(min(col("cents")).as("true_q_cents"))
    val totW = ranked.agg(sum(col("w")).as("tw"), max(col("n")).as("n2"))
    graft.operators.Events.prefixByCents(ranked, Seq("w"))
      .crossJoin(broadcast(totW))
      .withColumn("r",
        expr("((n2 * 1103515245 + 12345) % 2147483648) % tw"))
      .filter(col("cum_w") <= col("r") &&
        col("r") < col("cum_w") + col("w"))
      .crossJoin(broadcast(trueQ))
      .select(col("n"), col("cents").as("dp_q_cents"),
        col("d").as("rank_dist_milli_x2"), col("w").as("w_sel"),
        col("tw").as("tot_w"), col("true_q_cents"),
        (col("cents") - col("true_q_cents")).as("err_cents"))
      .orderBy("dp_q_cents")
  }

  def privacyDpQuantile(s: SparkSession, dir: String): DataFrame =
    privacyDpQuantileOn(Tables.customer(s, dir))

  /** ln(1/δ) at the pinned δ = 1e-5, quantized to integer nano-nats
    * BEFORE any further arithmetic (the per-term-quantization rule:
    * libm ln may differ by 1 ulp between engines — ~2e-14 absolute
    * here — which the +0.5 floor absorbs by 9 orders of magnitude). */
  val DpAcctLnInvDeltaNano = "CAST(floor(ln(100000.0) * 1000000000 + 0.5) AS BIGINT)"

  /** L13h: RDP privacy ACCOUNTANT for DP-SGD-style iterated Gaussian
    * mechanisms (Abadi et al. 2016; Mironov 2017, Rényi DP): for each
    * (noise multiplier σ, step count T) of a planning grid, the
    * composed (ε, δ=1e-5) guarantee via the standard RDP recipe —
    * per order α the Gaussian mechanism costs α/(2σ²) per step, RDP
    * composes ADDITIVELY over T steps, and the conversion to (ε, δ)
    * is ε(α) = T·α/(2σ²) + ln(1/δ)/(α−1), minimized over an integer α
    * grid. The design table a training pipeline reads BEFORE paying
    * for a private run (the event_mde_curve / dedup_lsh_planner
    * pattern: plan first, spend second). σ rides a tenths grid so
    * T·α/(2σ²) is EXACT integer arithmetic in nano-nats
    * (·100 / (2·σ_e1²)); the one transcendental term is quantized per
    * the house rule. Output per (σ, T): the minimizing α and ε in
    * nano-nats, plus the exact-integer RDP slope at that α.
    *
    * Scale: a 18-row literal relation with a 63-point α sweep per row
    * — one partitioned rank window; the value at 100 TB is what it
    * licenses you to train. */
  def privacyDpAccountant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grid = (for {
      sE1 <- Seq(5L, 8L, 10L, 15L, 20L, 30L)
      t <- Seq(100L, 1000L, 10000L)
    } yield (sE1, t)).toDF("sigma_e1", "t_steps")
    val w = Window.partitionBy("sigma_e1", "t_steps")
      .orderBy(col("eps_nano").asc, col("alpha").asc)
    grid
      .withColumn("alpha", explode(array((2L to 64L).map(lit): _*)))
      .withColumn("rdp_nano",
        expr("t_steps * alpha * 100000000000 DIV (2 * sigma_e1 * sigma_e1)"))
      .withColumn("eps_nano",
        expr(s"rdp_nano + $DpAcctLnInvDeltaNano DIV (alpha - 1)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("sigma_e1"), col("t_steps"),
        col("alpha").as("best_alpha"), col("eps_nano"),
        col("rdp_nano"))
      .orderBy("sigma_e1", "t_steps")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "privacy_dp_accountant" -> privacyDpAccountant,
    "privacy_kanon" -> privacyKanon,
    "privacy_ldp_frequency" -> privacyLdpFrequency,
    "privacy_dp_quantile" -> privacyDpQuantile,
    "privacy_tcloseness" -> privacyTcloseness,
    "privacy_recursive_ldiv" -> privacyRecursiveLdiv,
    "privacy_contribution_cap" -> privacyContributionCap,
    "privacy_dp_mean" -> privacyDpMean,
  )

  val oracles: Map[String, String] = Map(
    // Mirrors privacyDpAccountant: same integer nano-nat RDP slope,
    // same quantized ln(1/delta) term, same (eps, alpha) argmin.
    "privacy_dp_accountant" ->
      s"""WITH g AS (SELECT s.sigma_e1, t.t_steps
         |    FROM (SELECT UNNEST([5, 8, 10, 15, 20, 30])::BIGINT
         |      AS sigma_e1) s,
         |    (SELECT UNNEST([100, 1000, 10000])::BIGINT AS t_steps) t),
         |a AS (SELECT g.*, al.alpha FROM g,
         |    (SELECT UNNEST(range(2, 65)) AS alpha) al),
         |e AS (SELECT sigma_e1, t_steps, alpha,
         |    t_steps * alpha * 100000000000
         |      // (2 * sigma_e1 * sigma_e1) AS rdp_nano,
         |    t_steps * alpha * 100000000000
         |      // (2 * sigma_e1 * sigma_e1)
         |      + $DpAcctLnInvDeltaNano // (alpha - 1) AS eps_nano
         |  FROM a)
         |SELECT sigma_e1, t_steps, CAST(alpha AS BIGINT) AS best_alpha,
         |  CAST(eps_nano AS BIGINT) AS eps_nano,
         |  CAST(rdp_nano AS BIGINT) AS rdp_nano
         |FROM e
         |QUALIFY row_number() OVER (PARTITION BY sigma_e1, t_steps
         |  ORDER BY eps_nano ASC, alpha ASC) = 1
         |ORDER BY sigma_e1, t_steps""".stripMargin,
    // Mirrors privacyDpMeanOn: same clip, same two pinned coins and
    // shared noise ladder, same clamp-then-divide.
    "privacy_dp_mean" ->
      s"""WITH pu AS (SELECT event_type, user_id,
         |    COALESCE(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)), 0)
         |      AS spend
         |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
         |cl AS (SELECT event_type,
         |    LEAST(spend, $DpMeanCapCents) AS clipped,
         |    CASE WHEN spend > $DpMeanCapCents THEN 1 ELSE 0 END AS hit
         |  FROM pu),
         |ag AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true,
         |    CAST(SUM(clipped) AS BIGINT) AS sum_true_cents,
         |    CAST(SUM(hit) AS BIGINT) AS n_clipped_users,
         |    ascii(substr(event_type, 1, 1)) * 961
         |      + ascii(substr(event_type, 2, 1)) * 31
         |      + length(event_type) AS seed
         |  FROM cl GROUP BY 1),
         |n1 AS (SELECT *, (CAST(seed AS BIGINT) * 1103515245 + 54321)
         |    % 766 AS u FROM ag),
         |n2 AS (SELECT event_type, n_true, sum_true_cents,
         |    n_clipped_users, seed,
         |    CAST($dpGeomNoiseSql AS BIGINT) AS noise_sum FROM n1),
         |n3 AS (SELECT *, (CAST(seed AS BIGINT) * 69069 + 98765)
         |    % 766 AS u FROM n2),
         |n4 AS (SELECT event_type, n_true, sum_true_cents,
         |    n_clipped_users, noise_sum,
         |    CAST($dpGeomNoiseSql AS BIGINT) AS noise_n FROM n3),
         |r AS (SELECT *,
         |    GREATEST(sum_true_cents + noise_sum * $DpMeanCapCents,
         |      0) AS sum_released_cents,
         |    GREATEST(n_true + noise_n, 0) AS n_released FROM n4)
         |SELECT event_type, n_true, sum_true_cents, n_clipped_users,
         |  noise_sum, noise_n,
         |  CAST(sum_released_cents AS BIGINT) AS sum_released_cents,
         |  CAST(n_released AS BIGINT) AS n_released,
         |  CAST(CASE WHEN n_released > 0
         |    THEN sum_released_cents * 1000 // n_released END AS BIGINT)
         |    AS mean_released_milli,
         |  CAST(1386 AS BIGINT) AS epsilon_milli
         |FROM r ORDER BY event_type""".stripMargin,
    // Mirrors privacyContributionCapOn: same (ts, event_id) rank,
    // same cap literal, ppm floor.
    "privacy_contribution_cap" ->
      s"""WITH r AS (SELECT event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rk
         |  FROM events)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_raw,
         |  CAST(SUM(CASE WHEN rk <= $ContributionCap THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_capped,
         |  CAST(COUNT(*) - SUM(CASE WHEN rk <= $ContributionCap
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
         |  CAST((COUNT(*) - SUM(CASE WHEN rk <= $ContributionCap
         |    THEN 1 ELSE 0 END)) * 1000000 // COUNT(*) AS BIGINT)
         |    AS clipped_ppm
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // Mirrors privacyRecursiveLdivOn: desc-count rank inside each QI
    // class with the (n desc, nation asc) tie-break, then r1 vs the
    // c-scaled tail sum from rank l on.
    "privacy_recursive_ldiv" ->
      """WITH b AS (SELECT c_mktsegment AS segment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bucket,
        |    c_nationkey AS nation FROM customer),
        |cv AS (SELECT segment, bucket, nation,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1, 2, 3),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY segment, bucket
        |    ORDER BY n DESC, nation ASC) AS rk FROM cv)
        |SELECT segment, bucket,
        |  CAST(SUM(n) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS m_distinct,
        |  CAST(MAX(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS r1,
        |  CAST(COALESCE(SUM(CASE WHEN rk >= 3 THEN n END), 0)
        |    AS BIGINT) AS tail_sum,
        |  MAX(CASE WHEN rk = 1 THEN n END)
        |    < 2 * COALESCE(SUM(CASE WHEN rk >= 3 THEN n END), 0) AS meets_cl
        |FROM rk GROUP BY 1, 2 ORDER BY segment, bucket""".stripMargin,
    // Mirrors privacyTclosenessOn: variational distance with both
    // denominators cleared; absent sensitive values enter via the
    // n_c·(N − Σ_present N_v) residual.
    "privacy_tcloseness" ->
      """WITH b AS (SELECT c_mktsegment AS segment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bucket,
        |    c_nationkey AS nation FROM customer),
        |cv AS (SELECT segment, bucket, nation,
        |    CAST(COUNT(*) AS BIGINT) AS n_cv
        |  FROM b GROUP BY 1, 2, 3),
        |cls AS (SELECT segment, bucket, CAST(SUM(n_cv) AS BIGINT) AS n_c
        |  FROM cv GROUP BY 1, 2),
        |gv AS (SELECT nation, CAST(SUM(n_cv) AS BIGINT) AS n_v
        |  FROM cv GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_v) AS BIGINT) AS n_total FROM gv),
        |agg AS (SELECT cv.segment, cv.bucket,
        |    CAST(SUM(abs(cv.n_cv * tot.n_total - cls.n_c * gv.n_v))
        |      AS BIGINT) AS num_present,
        |    CAST(SUM(gv.n_v) AS BIGINT) AS n_v_present
        |  FROM cv JOIN gv ON gv.nation = cv.nation
        |  CROSS JOIN tot
        |  JOIN cls ON cls.segment = cv.segment AND cls.bucket = cv.bucket
        |  GROUP BY 1, 2)
        |SELECT a.segment, a.bucket, c.n_c AS n_rows,
        |  CAST((a.num_present + c.n_c * (t.n_total - a.n_v_present))
        |    * 1000000 // (2 * c.n_c * t.n_total) AS BIGINT) AS t_ppm,
        |  CAST((a.num_present + c.n_c * (t.n_total - a.n_v_present))
        |    * 1000000 // (2 * c.n_c * t.n_total) AS BIGINT) <= 200000
        |    AS meets_t
        |FROM agg a
        |JOIN cls c ON c.segment = a.segment AND c.bucket = a.bucket
        |CROSS JOIN tot t
        |ORDER BY a.segment, a.bucket""".stripMargin,
    "privacy_kanon" ->
      s"""WITH b AS (SELECT c_mktsegment AS segment, c_nationkey AS nation,
         |    CAST(floor(c_acctbal / 100) AS BIGINT) AS b0,
         |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS b1
         |  FROM customer),
         |l0 AS (SELECT segment, nation, b0, b1,
         |    COUNT(*) OVER (PARTITION BY segment, b0) AS n0
         |  FROM b),
         |lv AS (SELECT segment, nation, b0, b1, n0,
         |    SUM(CASE WHEN n0 < $K THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY segment, b1) AS n1
         |  FROM l0),
         |lab AS (SELECT segment, nation,
         |    CASE WHEN n0 >= $K THEN 0 WHEN n1 >= $K THEN 1 ELSE 2 END AS level,
         |    CASE WHEN n0 >= $K THEN 'h' || b0
         |         WHEN n1 >= $K THEN 'k' || b1 ELSE '*' END AS bucket
         |  FROM lv)
         |SELECT segment, bucket, CAST(level AS INT) AS level,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(DISTINCT nation) AS BIGINT) AS l_div
         |FROM lab GROUP BY 1, 2, 3 ORDER BY segment, bucket""".stripMargin,
    // Replays the derandomized LCG coin and the integer-milli estimator
    // bit-for-bit (same discipline as the walk-corpus oracles).
    "privacy_ldp_frequency" ->
      s"""WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS uid,
         |    c_mktsegment AS seg FROM customer),
         |cats AS (SELECT seg,
         |    CAST(ROW_NUMBER() OVER (ORDER BY seg) AS BIGINT) - 1 AS k_idx
         |  FROM (SELECT DISTINCT seg FROM base)),
         |kc AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk FROM cats),
         |draw AS (SELECT uid, seg,
         |    (uid * 1103515245 + 12345) % 2147483648 AS r FROM base),
         |rep AS (SELECT d.seg AS true_seg,
         |    CASE WHEN d.r % 1000 < $LdpKeepMilli THEN d.seg ELSE c.seg END
         |      AS rep_seg
         |  FROM draw d CROSS JOIN kc JOIN cats c
         |    ON c.k_idx = (d.r // 1000) % kc.kk),
         |obs AS (SELECT rep_seg AS seg, CAST(COUNT(*) AS BIGINT)
         |    AS n_reported FROM rep GROUP BY 1),
         |tru AS (SELECT true_seg AS seg, CAST(COUNT(*) AS BIGINT)
         |    AS n_true FROM rep GROUP BY 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM rep)
         |SELECT seg,
         |  COALESCE(n_reported, CAST(0 AS BIGINT)) AS n_reported,
         |  COALESCE(n_true, CAST(0 AS BIGINT)) AS n_true,
         |  CAST(GREATEST(kk * COALESCE(n_reported, 0) * 1000
         |      - (1000 - $LdpKeepMilli) * nn, 0)
         |    * 1000 // (kk * $LdpKeepMilli) AS BIGINT) AS t_hat_milli,
         |  CAST(GREATEST(kk * COALESCE(n_reported, 0) * 1000
         |      - (1000 - $LdpKeepMilli) * nn, 0)
         |    * 1000 // (kk * $LdpKeepMilli)
         |    - COALESCE(n_true, 0) * 1000 AS BIGINT) AS err_milli
         |FROM obs FULL OUTER JOIN tru USING (seg)
         |CROSS JOIN tot CROSS JOIN kc
         |ORDER BY seg""".stripMargin,
    // Replays the exponential mechanism exactly: same weight string
    // (round(,9) boundary + micro floor + 1-floor), same LCG landing
    // on the cumulative-weight line.
    "privacy_dp_quantile" ->
      s"""WITH v AS (SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
         |    AS cents FROM customer),
         |g AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS t
         |  FROM v GROUP BY 1),
         |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM g),
         |c AS (SELECT cents, t, CAST(SUM(t) OVER (ORDER BY cents
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS cum FROM g),
         |dd AS (SELECT cents, t, cum,
         |    abs(2000 * cum - 2 * $DpQuantQMilli * n) AS d, n
         |  FROM c, tot),
         |w AS (SELECT cents, cum, d, n,
         |    ${dpqWeightSql(DpQuantEpsMilli)} AS w
         |  FROM dd),
         |cw AS (SELECT cents, d, w, n,
         |    CAST(COALESCE(SUM(w) OVER (ORDER BY cents
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cw,
         |    CAST(SUM(w) OVER () AS BIGINT) AS tw
         |  FROM w),
         |sel AS (SELECT * FROM cw
         |  WHERE cw <= ((n * 1103515245 + 12345) % 2147483648) % tw
         |    AND ((n * 1103515245 + 12345) % 2147483648) % tw < cw + w),
         |tq AS (SELECT MIN(cents) AS true_q_cents FROM w
         |  WHERE 1000 * cum >= $DpQuantQMilli * n)
         |SELECT n, sel.cents AS dp_q_cents, d AS rank_dist_milli_x2,
         |  w AS w_sel, tw AS tot_w, true_q_cents,
         |  sel.cents - true_q_cents AS err_cents
         |FROM sel, tq ORDER BY dp_q_cents""".stripMargin,
  )
}
