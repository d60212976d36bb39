package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregations — SURVEY.md §2.4.
  *
  * Every groupBy here compiles to HashAggregateExec with a partial
  * (map-side) pass before the shuffle, so network volume is one row
  * per (partition, group), not per input row — the property that keeps
  * these shapes viable at 100 TB. Money sums go through Exact.* so the
  * DuckDB hash-compare is bit-stable.
  */
object Aggregates {

  /** Flagship relational agg (TPC-H Q1 shape): scan-filter-aggregate
    * with exact decimal money arithmetic. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        Exact.sumD(col("l_extendedprice")).as("sum_base_price"),
        Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("sum_disc_price"),
        (sum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A1 (raw_to_samples.py:156-164 `build_dict`): order-preserving
    * group-to-list. collect_list is partition-order nondeterministic,
    * so we collect (seq, item) structs and sort_array — the engine-side
    * restoration of the frame order the reference got from its loop.
    * Emitted as a joined string (array hash-compare is brittle across
    * engines; fn_array_ops covers array outputs). */
  def aggCollectList(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col("event_id"), col("event_type")))),
          x => x.getField("event_type")),
        ",").as("actions"))
      .orderBy("user_id")

  /** A2 (raw_to_samples.py:63-72): per-group max of a derived value
    * (+10 pad), integer math only. */
  def aggMaxGroup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_suppkey")
      .agg(
        max(col("l_quantity")).as("max_qty"),
        (max(abs(col("l_quantity") - col("l_linenumber") * 3)) + 10)
          .as("max_span_pad"))
      .orderBy("l_suppkey")

  /** A3 (raw_to_samples.py:147-153): label-frequency ratio HAVING —
    * per user, purchases/events > 0.3. Integer counts divided once in
    * double: bit-identical across engines. */
  def aggRatioHaving(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchase"),
        count(lit(1)).as("n_events"))
      .withColumn("ratio",
        col("n_purchase").cast("double") / col("n_events"))
      .filter(col("ratio") > 0.3)
      .orderBy("user_id")

  /** A4/J4 (raw_to_samples.py:212-216): HAVING count == scalar — the
    * full-coverage filter (`len(bboxs) == total_frames`). */
  def aggHaving(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") === 7)
      .orderBy("l_orderkey")

  /** A5 (preprocessed_to_raw.py:26-29): max-id + 1 scalar, 0 on empty
    * catalog (:21-23 init path). */
  def aggMaxScalar(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .agg(coalesce(max(col("o_orderkey")) + 1, lit(0L)).as("next_id"))

  /** A7 (raw_to_samples.py:236,262,287): distinct subject ids. */
  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type")

  /** A8: rollup over orders status x priority (engine-added; the
    * reference only ever groups one key at a time). */
  def aggRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        Exact.sumD(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** A8 (cube variant). */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** A9: approx_count_distinct (HLL++) — the 100 TB-scale substitute
    * for exact COUNT(DISTINCT). The sketch estimate itself is
    * implementation-specific (it can never hash-match a DuckDB
    * replay), so the OUTPUT is engine-portable checked columns: the
    * exact aggregate plus an in-bound flag computed in-query from the
    * sketch estimate (abs err within 3x the published 1.04/sqrt(m)
    * standard error at Spark's default relativeSD 0.05, i.e. 15%,
    * with an absolute floor of 1 for tiny groups where HLL++'s sparse
    * mode is exact anyway). The oracle emits the same exact aggregate
    * and a literal TRUE — an out-of-bound sketch therefore
    * hash-MISMATCHES, which is the correctness signal we want. The
    * sketch plan stays the measured subject; the raw estimate remains
    * visible via oracleBounds / sketch_hll. */
  def aggApproxDistinctRaw(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))

  def aggApproxDistinct(s: SparkSession, dir: String): DataFrame =
    aggApproxDistinctRaw(s, dir)
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          greatest(lit(1.0), col("exact_users") * 0.15))
          .as("approx_in_bound"))
      .orderBy("event_type")

  /** A10: exact median (interpolated percentile-0.5) + mode per group.
    * mode ties are engine-arbitrary, so the mode column is over
    * l_linenumber whose frequency is strictly decreasing in the TPC-H
    * generator (line 1 exists for every order) — unique argmax, hence
    * deterministic in both engines. */
  def aggMedianMode(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(median(col("l_quantity")).as("med_qty"),
        mode(col("l_linenumber")).as("mode_line"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** A11: boolean/conditional aggregates — count_if / bool_and /
    * bool_or, the predicates-as-aggregates family. */
  def aggBoolean(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(count_if(col("o_totalprice") > 150000).as("n_big"),
        bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
        bool_or(col("o_orderstatus") === "P").as("any_pending"))
      .orderBy("o_orderpriority")

  /** A12: fixed-width histogram — floor-bucket (explicit floor(): a
    * bare double->BIGINT cast truncates in Spark but rounds in
    * DuckDB), count + per-bucket min/max. The one-shuffle distributed
    * histogram shape (map-side partial per bucket). */
  def aggHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(floor(col("o_totalprice") / 50000).cast("long").as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy("bucket")

  /** A12b: equi-DEPTH histogram — bins hold equal row counts instead
    * of equal value ranges (the histogram an optimizer or a data
    * profiler actually wants on skewed money columns, where fixed
    * width piles everything into two buckets). Spelled WITHOUT the
    * single-partition global NTILE window: cut points are one exact
    * percentile aggregate (one row) broadcast back over the scan, and
    * bin assignment is a per-row comparison count — two scans, both
    * fully parallel, shuffle only for the final 8-key rollup. At
    * 100 TB swap the exact percentile for percentile_approx (the
    * GK-sketch trade agg_approx_quantile demonstrates) and the first
    * scan collapses into the same single pass.
    *
    * Money is quantized to integer cents via floor(x*100 + 0.5) —
    * explicit floor, not round(): both engines agree on floor over
    * IEEE doubles, while round()'s half-mode is engine-specific (the
    * A12 truncate-vs-round lesson). Boundaries interpolate at exact
    * eighths of integer cents, so the interpolated doubles are exact
    * in both engines and the `cents > bound` bin test cannot straddle
    * a ulp. Ties share a bin by construction (comparison against
    * fixed cut points), unlike NTILE which splits ties arbitrarily. */
  def aggHistogramEqdepth(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") * 100 + 0.5).as("cents"))
    val bounds = cents.agg(
      percentile(col("cents"),
        array((1 to 7).map(k => lit(k / 8.0)): _*)).as("bs"))
    cents.crossJoin(broadcast(bounds))
      .select(col("cents"),
        (1 to 7).map(j =>
            when(col("cents") > element_at(col("bs"), j), 1).otherwise(0))
          .reduce(_ + _).cast("long").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min(col("cents")).as("lo"),
        max(col("cents")).as("hi"), sum(col("cents")).as("total_cents"))
      .orderBy("bin")
  }

  /** A13: approximate quantiles (Greenwald-Khanna sketch) beside the
    * exact percentiles — the quantile to reach for at 100 TB, where
    * exact percentile needs a full sort per group. Same checked-column
    * convention as agg_approx_distinct: the GK estimates are
    * sketch-state-dependent, so the emitted columns are the exact
    * interpolated percentiles (quantized to integer cents so both
    * engines interpolate over exact doubles) plus in-bound flags for
    * the approx values (2% relative — GK at accuracy=1000 guarantees
    * rank error <= n/1000, far inside 2% value error on these
    * distributions; RobustnessSpec asserts the bound at two sfs). An
    * out-of-bound sketch flips the flag and hash-mismatches. */
  def aggApproxQuantileRaw(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + 0.5).as("cents"))
      .groupBy("l_returnflag")
      // ONE sketch and ONE exact buffer serve both percentiles (the
      // array forms): four scalar aggregates each kept their own
      // per-group value buffer / GK sketch — measured as 1.7x of this
      // op's noop cost for identical output (PERF.md noop-gap audit)
      .agg(
        percentile_approx(col("cents"), array(lit(0.5), lit(0.95)),
          lit(1000)).as("approx_arr"),
        percentile(col("cents"), array(lit(0.5), lit(0.95)))
          .as("exact_arr"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        element_at(col("approx_arr"), 1).as("approx_p50"),
        element_at(col("approx_arr"), 2).as("approx_p95"),
        element_at(col("exact_arr"), 1).as("exact_p50"),
        element_at(col("exact_arr"), 2).as("exact_p95"),
        col("n"))

  def aggApproxQuantile(s: SparkSession, dir: String): DataFrame =
    aggApproxQuantileRaw(s, dir)
      .select(col("l_returnflag"), col("exact_p50"), col("exact_p95"),
        col("n"),
        (abs(col("approx_p50") - col("exact_p50")) <=
          col("exact_p50") * 0.02).as("p50_in_bound"),
        (abs(col("approx_p95") - col("exact_p95")) <=
          col("exact_p95") * 0.02).as("p95_in_bound"))
      .orderBy("l_returnflag")

  /** A14: distinct-collection aggregate — collect_set is
    * partition-order nondeterministic, so the set is sorted before the
    * join (same reproducibility discipline as agg_collect_list). */
  def aggCollectSet(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        array_join(sort_array(collect_set(col("event_type"))), ",")
          .as("distinct_actions"),
        countDistinct(col("event_type")).as("n_distinct"))
      .orderBy("user_id")

  /** A15: higher statistical moments — per-group skewness and excess
    * kurtosis computed from exact integer POWER SUMS, not the
    * engines' built-ins (Spark's `skewness` is population-g1,
    * DuckDB's is sample-G1 — a definitional mismatch no tolerance
    * fixes; raw sums sidestep it). Quantities are integral, so
    * s_k = Σ x^k are exact BIGINTs that combine into the central
    * forms by clearing denominators:
    *   B2 = n·s2 − s1²                       (= n²·m2)
    *   A3 = n²·s3 − 3n·s1·s2 + 2·s1³         (= n³·m3)
    *   A4 = n³·s4 − 4n²·s1·s3 + 6n·s1²·s2 − 3·s1⁴  (= n⁴·m4)
    *   g1 = A3 / B2^{3/2},  g2 = A4 / B2² − 3
    * The A/B combinations run in DECIMAL(38,0) (n³·s4 overflows
    * BIGINT at catalog scale; 38 digits hold it to sf well past 1),
    * then ONE double expression per statistic, spelled identically
    * in the oracle — both engines divide the same exact integers.
    * Shape: one map-side-combined aggregate; the moment sums are the
    * only thing that crosses the shuffle (mergeable by +, the same
    * property every distributed stats engine exploits). Constant
    * groups (B2 = 0) yield NULL, not a division error. */
  def aggMoments(s: SparkSession, dir: String): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("q"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
        sum(col("q") * col("q")).as("s2"),
        sum(col("q") * col("q") * col("q")).as("s3"),
        sum(col("q") * col("q") * col("q") * col("q")).as("s4"))
      .withColumn("b2", expr(
        s"CAST(n AS $d38) * s2 - CAST(s1 AS $d38) * s1"))
      .withColumn("a3", expr(
        s"CAST(n AS $d38) * n * s3 - 3 * (CAST(n AS $d38) * s1 * s2)" +
          s" + 2 * (CAST(s1 AS $d38) * s1 * s1)"))
      .withColumn("a4", expr(
        s"CAST(n AS $d38) * n * n * s4" +
          s" - 4 * (CAST(n AS $d38) * n * s1 * s3)" +
          s" + 6 * (CAST(n AS $d38) * s1 * s1 * s2)" +
          s" - 3 * (CAST(s1 AS $d38) * s1 * s1 * s1)"))
      .select(col("l_returnflag"), col("n"), col("s1"), col("s2"),
        col("s3"), col("s4"),
        when(col("b2") > 0, round(expr(
          "CAST(a3 AS DOUBLE) / (CAST(b2 AS DOUBLE) * sqrt(CAST(b2 AS DOUBLE)))"),
          6)).as("skewness"),
        when(col("b2") > 0, round(expr(
          "CAST(a4 AS DOUBLE) / (CAST(b2 AS DOUBLE) * CAST(b2 AS DOUBLE)) - 3"),
          6)).as("kurtosis_excess"))
      .orderBy("l_returnflag")
  }

  /** A13: exact weighted median — the "median price per unit SOLD"
    * question (each row weighted by its quantity) that the plain
    * median answers wrongly when row sizes vary. Discrete rule, no
    * interpolation: the smallest value whose cumulative weight
    * reaches half the total (2·cum ≥ total — all integer, so both
    * engines agree bit-for-bit; intra-value row order cannot change
    * the winning VALUE). One value-ordered window per group plus the
    * group total — the same keyed-shuffle shape as any grouped
    * median, but mergeable-friendly: at 100 TB the cumulative scan
    * runs per partition-range (value-bucketed pre-agg first, the
    * histogram trick, since equal values collapse before the scan). */
  def aggWeightedMedianOn(lineitem: DataFrame): DataFrame = {
    val rows = lineitem.select(col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents"),
      floor(col("l_quantity")).cast("long").as("wt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy(col("cents").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
    rows
      .withColumn("cum", sum(col("wt")).over(w))
      .withColumn("tot", sum(col("wt")).over(wg))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("l_returnflag")
      .agg(min(col("cents")).as("wmedian_cents"),
        max(col("tot")).as("total_weight"))
      .orderBy("l_returnflag")
  }

  def aggWeightedMedian(s: SparkSession, dir: String): DataFrame =
    aggWeightedMedianOn(Tables.lineitem(s, dir))

  /** A11: winsorization — clamp each group's values into its own
    * [p05, p95] band (the standard outlier-robust preprocessing for
    * metrics feeding averages or models; trimming DELETES tails,
    * winsorizing pins them to the fence, preserving row count). The
    * fences are rank picks under the catalog's pinned rule
    * idx = (m−1)·q_ppm div 10⁶ + 1 (sketch_quantile's convention),
    * computed in one windowed pass and broadcast back as a
    * |groups|-row bounds relation; the clamp + before/after audit is
    * a second map-side-combined rollup. All exact BIGINT cents: the
    * output carries the fences, clamp counts per side, and raw vs
    * winsorized sums so the distortion is measured in-band. */
  def aggWinsorizeOn(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = lineitem.select(col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
        .as("cents"))
    val rk = Window.partitionBy("l_returnflag").orderBy("cents")
    val bounds = rows
      .withColumn("rn", row_number().over(rk))
      // same sorted spec + unbounded frame => ONE WindowExec carries
      // both rn and m (no second whole-partition-buffering pass)
      .withColumn("m", count(lit(1)).over(rk.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy("l_returnflag").agg(
        max(when(expr("rn = (m - 1) * 50000 div 1000000 + 1"),
          col("cents"))).as("lo_cents"),
        max(when(expr("rn = (m - 1) * 950000 div 1000000 + 1"),
          col("cents"))).as("hi_cents"))
    rows.join(broadcast(bounds), "l_returnflag")
      .groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        max(col("lo_cents")).as("lo_cents"),
        max(col("hi_cents")).as("hi_cents"),
        sum(when(col("cents") < col("lo_cents"), 1L).otherwise(0L))
          .as("n_clamped_low"),
        sum(when(col("cents") > col("hi_cents"), 1L).otherwise(0L))
          .as("n_clamped_high"),
        sum(col("cents")).as("sum_raw_cents"),
        sum(greatest(col("lo_cents"), least(col("hi_cents"), col("cents"))))
          .as("sum_winsorized_cents"))
      .orderBy("l_returnflag")
  }

  def aggWinsorize(s: SparkSession, dir: String): DataFrame =
    aggWinsorizeOn(Tables.lineitem(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_winsorize" -> aggWinsorize,
    "agg_weighted_median" -> aggWeightedMedian,
    "q1_agg" -> q1Agg,
    "agg_moments" -> aggMoments,
    "agg_collect_set" -> aggCollectSet,
    "agg_approx_quantile" -> aggApproxQuantile,
    "agg_median_mode" -> aggMedianMode,
    "agg_boolean" -> aggBoolean,
    "agg_histogram" -> aggHistogram,
    "agg_histogram_eqdepth" -> aggHistogramEqdepth,
    "agg_collect_list" -> aggCollectList,
    "agg_max_group" -> aggMaxGroup,
    "agg_ratio_having" -> aggRatioHaving,
    "agg_having" -> aggHaving,
    "agg_max_scalar" -> aggMaxScalar,
    "agg_distinct" -> aggDistinct,
    "agg_rollup" -> aggRollup,
    "agg_cube" -> aggCube,
    "agg_approx_distinct" -> aggApproxDistinct,
  )

  val oracles: Map[String, String] = Map(
    "agg_winsorize" ->
      """WITH r AS (SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |rk AS (SELECT l_returnflag, cents,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY cents) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS m
        |  FROM r),
        |b AS (SELECT l_returnflag,
        |    MAX(CASE WHEN rn = (m - 1) * 50000 // 1000000 + 1
        |      THEN cents END) AS lo_cents,
        |    MAX(CASE WHEN rn = (m - 1) * 950000 // 1000000 + 1
        |      THEN cents END) AS hi_cents
        |  FROM rk GROUP BY l_returnflag)
        |SELECT r.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  MAX(lo_cents) AS lo_cents, MAX(hi_cents) AS hi_cents,
        |  CAST(SUM(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clamped_low,
        |  CAST(SUM(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clamped_high,
        |  CAST(SUM(cents) AS BIGINT) AS sum_raw_cents,
        |  CAST(SUM(GREATEST(lo_cents, LEAST(hi_cents, cents)))
        |    AS BIGINT) AS sum_winsorized_cents
        |FROM r JOIN b USING (l_returnflag)
        |GROUP BY r.l_returnflag ORDER BY r.l_returnflag""".stripMargin,
    "agg_weighted_median" ->
      """WITH rws AS (SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(floor(l_quantity) AS BIGINT) AS wt
        |  FROM lineitem),
        |c AS (SELECT l_returnflag, cents,
        |    SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY cents ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(wt) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM rws)
        |SELECT l_returnflag, CAST(MIN(cents) AS BIGINT) AS wmedian_cents,
        |  CAST(MAX(tot) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= tot GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_moments" ->
      """WITH q AS (SELECT l_returnflag,
        |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS q FROM lineitem),
        |s AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(q) AS BIGINT) AS s1,
        |    CAST(SUM(q * q) AS BIGINT) AS s2,
        |    CAST(SUM(q * q * q) AS BIGINT) AS s3,
        |    CAST(SUM(q * q * q * q) AS BIGINT) AS s4
        |  FROM q GROUP BY l_returnflag),
        |c AS (SELECT l_returnflag, n, s1, s2, s3, s4,
        |    CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS b2,
        |    CAST(n AS HUGEINT) * n * s3
        |      - 3 * (CAST(n AS HUGEINT) * s1 * s2)
        |      + 2 * (CAST(s1 AS HUGEINT) * s1 * s1) AS a3,
        |    CAST(n AS HUGEINT) * n * n * s4
        |      - 4 * (CAST(n AS HUGEINT) * n * s1 * s3)
        |      + 6 * (CAST(n AS HUGEINT) * s1 * s1 * s2)
        |      - 3 * (CAST(s1 AS HUGEINT) * s1 * s1 * s1) AS a4
        |  FROM s)
        |SELECT l_returnflag, n, s1, s2, s3, s4,
        |  CASE WHEN b2 > 0 THEN round(CAST(a3 AS DOUBLE)
        |    / (CAST(b2 AS DOUBLE) * sqrt(CAST(b2 AS DOUBLE))), 6) END
        |    AS skewness,
        |  CASE WHEN b2 > 0 THEN round(CAST(a4 AS DOUBLE)
        |    / (CAST(b2 AS DOUBLE) * CAST(b2 AS DOUBLE)) - 3, 6) END
        |    AS kurtosis_excess
        |FROM c ORDER BY l_returnflag""".stripMargin,
    "agg_collect_set" ->
      """SELECT user_id,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type)
        |    AS distinct_actions,
        |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "agg_histogram_eqdepth" ->
      """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |             AS cents FROM orders),
        |b AS (SELECT quantile_cont(cents,
        |        [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bs FROM c)
        |SELECT CAST((CASE WHEN cents > bs[1] THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > bs[2] THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > bs[3] THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > bs[4] THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > bs[5] THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > bs[6] THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > bs[7] THEN 1 ELSE 0 END) AS BIGINT) AS bin,
        |  COUNT(*) AS n, MIN(cents) AS lo, MAX(cents) AS hi,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM c, b GROUP BY 1 ORDER BY bin""".stripMargin,
    "agg_median_mode" ->
      """SELECT l_returnflag, median(l_quantity) AS med_qty,
        |  mode(l_linenumber) AS mode_line, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_boolean" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_orderstatus = 'P') AS any_pending
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  SUM(l_quantity) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_collect_list" ->
      """SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_id) AS actions
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_max_group" ->
      """SELECT l_suppkey, MAX(l_quantity) AS max_qty,
        |  MAX(ABS(l_quantity - l_linenumber * 3)) + 10 AS max_span_pad
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "agg_ratio_having" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS ratio
        |FROM events GROUP BY user_id
        |HAVING CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) > 0.3
        |ORDER BY user_id""".stripMargin,
    "agg_having" ->
      """SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey HAVING COUNT(*) = 7 ORDER BY l_orderkey""".stripMargin,
    "agg_max_scalar" ->
      "SELECT COALESCE(MAX(o_orderkey) + 1, 0) AS next_id FROM orders",
    "agg_distinct" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "agg_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    // Checked-column convention (see aggApproxDistinct scaladoc): the
    // oracle computes the exact aggregate and asserts the flag TRUE;
    // an out-of-bound Spark sketch flips the flag -> hash mismatch.
    "agg_approx_distinct" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS approx_in_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_approx_quantile" ->
      """WITH c AS (SELECT l_returnflag,
        |    floor(l_extendedprice * 100 + 0.5) AS cents FROM lineitem)
        |SELECT l_returnflag,
        |  quantile_cont(cents, 0.5) AS exact_p50,
        |  quantile_cont(cents, 0.95) AS exact_p95,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  TRUE AS p50_in_bound, TRUE AS p95_in_bound
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
