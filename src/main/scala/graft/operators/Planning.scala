package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capacity and experiment planning over the event stream — the
  * readouts an operations/growth team derives from the same events
  * table the analytics battery (Events.scala) reads: peak-concurrency
  * sweeps for capacity sizing, lead-lag cross-correlation for
  * campaign/response alignment, and two-proportion power analysis for
  * experiment sizing (the planning sibling of event_ab_test).
  *
  * House arithmetic (ORACLES.md): timestamps as epoch microseconds
  * (BIGINT), counts/deltas as BIGINT, rates in ppm with integral DIV
  * on non-negative operands; the one double readout (Pearson r) comes
  * from exact integer moment sums through the agg_corr formula, so
  * both engines produce identical bits.
  *
  * Reference tie-in: none — the reference's pipeline is batch images;
  * this family belongs to the engine-added event-analytics surface
  * (SURVEY.md §2.11).
  */
object Planning {

  /** Session gap: two events of one user more than this many minutes
    * apart belong to different sessions (industry-standard 30). */
  val SessionGapMin = 30

  /** L21a: peak concurrent sessions per day — the capacity-planning
    * sweep ("how many sessions were open at the busiest instant?").
    * Classic interval stabbing via the +1/−1 boundary sweep:
    *
    *  1. sessionize per user (gap > [[SessionGapMin]] starts a new
    *     session) — one user-keyed window;
    *  2. split each session interval at midnight so the sweep key is
    *     the calendar day (sessions are gap-bounded, so the explode
    *     emits ≤ 2 segments in practice and is provably bounded by
    *     session span);
    *  3. per segment emit (+1, start) and (−1, end) boundary rows,
    *     ties resolved start-before-end (delta DESC) so touching
    *     sessions count as concurrent, then by (user_id, sid) so the
    *     order is total and both engines agree;
    *  4. running-sum the deltas and take the per-day max.
    *
    * The sweep is spelled as a TWO-PHASE prefix sum — the scalable
    * form: a per-(day, hour) local running sum (bounded partitions),
    * plus an hour-offset relation (≤ 24 rows per day) carrying the
    * cross-bucket carry-in, joined back by (day, hour). No global or
    * whole-day single-partition window anywhere, so the plan survives
    * a day with billions of boundaries; the oracle replays the
    * equivalent single-window spelling and the results are equal by
    * prefix-sum associativity. */
  /** Gap-threshold sessionization — one user-keyed window, shared by
    * the sweep and the bounce readout: (user_id, sid, s, e, n_events)
    * with s/e in epoch micros. */
  private def sessionsOf(events: DataFrame, gapMin: Int): DataFrame = {
    require(gapMin >= 1, s"need gapMin >= 1, got $gapMin")
    val gapUs = gapMin.toLong * 60L * 1000000L
    val wU = Window.partitionBy("user_id").orderBy("us")
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(wU))
      .withColumn("new_s",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(wU))
      .groupBy("user_id", "sid")
      .agg(min(col("us")).as("s"), max(col("us")).as("e"),
        count(lit(1)).as("n_events"))
  }

  def eventConcurrencyOn(events: DataFrame,
      gapMin: Int = SessionGapMin): DataFrame = {
    val sess = sessionsOf(events, gapMin)
    // midnight split: one row per calendar day the session touches,
    // clamped to that day's [00:00:00.000000, 23:59:59.999999]
    val segs = sess
      .withColumn("d", explode(sequence(
        to_date(timestamp_micros(col("s"))),
        to_date(timestamp_micros(col("e"))))))
      .withColumn("d0", unix_micros(col("d").cast("timestamp")))
      .select(col("user_id"), col("sid"), col("d"),
        greatest(col("s"), col("d0")).as("t0"),
        least(col("e"), col("d0") + 86399999999L).as("t1"))
    val bounds = segs.select(col("d"), col("user_id"), col("sid"),
        explode(array(
          struct(col("t0").as("t"), lit(1L).as("delta")),
          struct(col("t1").as("t"), lit(-1L).as("delta")))).as("b"))
      .select(col("d"), col("user_id"), col("sid"),
        col("b.t").as("t"), col("b.delta").as("delta"))
      .withColumn("h", expr("(t % 86400000000) div 3600000000"))
      .localCheckpoint(true) // read by both sweep phases
    val wLocal = Window.partitionBy("d", "h")
      .orderBy(col("t").asc, col("delta").desc,
        col("user_id").asc, col("sid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bounds.withColumn("run_local", sum(col("delta")).over(wLocal))
    val wOff = Window.partitionBy("d").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bounds.groupBy("d", "h")
      .agg(sum(col("delta")).as("btot"))
      .withColumn("off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
      .select("d", "h", "off")
    local.join(offsets, Seq("d", "h"))
      .groupBy("d")
      .agg(max(col("run_local") + col("off")).as("peak_concurrency"),
        sum(when(col("delta") > 0, 1L).otherwise(0L)).as("n_segments"))
      .orderBy("d")
  }

  def eventConcurrency(s: SparkSession, dir: String): DataFrame =
    eventConcurrencyOn(Tables.events(s, dir))

  /** L21d: daily bounce rate and session depth — the engagement
    * readout on the same sessionization as the sweep: per session-
    * START day, how many sessions opened, what share were bounces
    * (single-event sessions), and the mean events per session.
    * Rates in exact ppm/milli (integral DIV, non-negative), so the
    * oracle replays bit-for-bit. Shape: the sessionize window plus
    * one day-keyed rollup — nothing else. */
  def eventBounceOn(events: DataFrame,
      gapMin: Int = SessionGapMin): DataFrame =
    sessionsOf(events, gapMin)
      .select(to_date(timestamp_micros(col("s"))).as("d"),
        col("n_events"))
      .groupBy("d")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L))
          .as("n_bounces"),
        sum(col("n_events")).as("n_events"))
      .select(col("d"), col("n_sessions"), col("n_bounces"),
        expr("n_bounces * 1000000 div n_sessions").as("bounce_ppm"),
        expr("n_events * 1000 div n_sessions").as("depth_milli"))
      .orderBy("d")

  def eventBounce(s: SparkSession, dir: String): DataFrame =
    eventBounceOn(Tables.events(s, dir))

  /** L21f: pipeline freshness audit — per event stream, when did we
    * last see data and how far does it lag the corpus watermark (the
    * max event time across all streams)? The SLA check an ingestion
    * pipeline runs before promoting a snapshot: a stream lagging the
    * watermark by more than a day is flagged stale. Lag in whole
    * hours by integral DIV on non-negative micros. Shape: one
    * map-side-combined rollup per stream; the watermark re-reduces
    * the tiny per-stream relation and rides back on a broadcast
    * single-row cross. */
  def dqFreshnessOn(events: DataFrame): DataFrame = {
    val per = events.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros(col("ts"))).as("last_us"))
    val wm = per.agg(max(col("last_us")).as("corpus_us"))
    per.crossJoin(broadcast(wm))
      .select(col("event_type"), col("n_events"), col("last_us"),
        expr("(corpus_us - last_us) div 3600000000").as("lag_hours"),
        (col("corpus_us") - col("last_us") > 86400000000L).as("is_stale"))
      .orderBy("event_type")
  }

  def dqFreshness(s: SparkSession, dir: String): DataFrame =
    dqFreshnessOn(Tables.events(s, dir))

  /** L21g: per-column completeness + uniqueness audit — the dbt-test
    * / Deequ-shape contract check a pipeline runs before promoting a
    * table, completing the dq family (freshness = is it current,
    * referential = do the keys resolve, completeness = are the cells
    * there): for every column, row count, nulls, blanks (string
    * columns only: trimmed-empty), distinct non-null values, the
    * populated share in ppm, and the primary-key predicate
    * "distinct = non-null rows" (exactly one column should pass it).
    * Shape: ONE pass over the table — a single global aggregate
    * carrying all per-column counters (count_distinct per column
    * expands the aggregate |columns|-fold map-side, a COLUMN-bounded
    * constant, never row-scaled), unpivoted to |columns| rows via a
    * literal stack. */
  def dqCompletenessOn(docs: DataFrame): DataFrame = {
    val strCols = Set("text", "lang", "source")
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(sum(col(c).isNull.cast("long")).as(s"null_$c"),
        (if (strCols(c)) sum((trim(col(c)) === "").cast("long"))
         else lit(0L)).as(s"blank_$c"),
        count_distinct(col(c)).as(s"dist_$c"))
    }
    val one = docs.agg(aggs.head, aggs.tail: _*)
    one.select(col("n_rows"), expr(
        s"explode(array(${cols.map(c => s"named_struct('column_name', " +
          s"'$c', 'n_null', null_$c, 'n_blank', coalesce(blank_$c, " +
          s"CAST(0 AS BIGINT)), 'n_distinct', dist_$c)").mkString(", ")}))")
        .as("r"))
      .select(col("r.column_name"), col("n_rows"), col("r.n_null"),
        col("r.n_blank"), col("r.n_distinct"),
        expr("CAST((n_rows - r.n_null - r.n_blank) * 1000000 DIV n_rows " +
          "AS BIGINT)").as("populated_ppm"),
        (col("r.n_distinct") === col("n_rows") - col("r.n_null"))
          .as("is_unique"))
      .orderBy("column_name")
  }

  def dqCompleteness(s: SparkSession, dir: String): DataFrame =
    dqCompletenessOn(Tables.documents(s, dir))

  /** L21b: lead-lag cross-correlation between two daily event series
    * — "do clicks on day d predict purchases on day d+k?", the
    * two-series sibling of ts_autocorr (same spine-filled calendar
    * grid, same exact-moment Pearson). For each lag k in
    * [−maxLag, maxLag], pairs (x(d), y(d+k)) over the overlapping
    * days; r computed from BIGINT moment sums through DECIMAL(38,0)
    * with one double sqrt at the end (agg_corr precedent), rounded to
    * 6 places. The lag join is an equi-join on the day index — the
    * non-equi "d+k" folds into the join key arithmetic; the series
    * relation is calendar-bounded (days × 2 rows), so every window
    * and join here is independent of corpus size — the fact pass is
    * the one daily rollup. */
  def tsXcorrOn(events: DataFrame, xType: String = "click",
      yType: String = "purchase", maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val daily = events
      .filter(col("event_type").isin(xType, yType))
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = daily.sparkSession.range(1).crossJoin(broadcast(span))
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .select(datediff(col("d"), to_date(lit("1970-01-01")))
        .cast("long").as("i"))
    def series(t: String) = spine
      .join(daily.filter(col("event_type") === t)
          .select(datediff(col("d"), to_date(lit("1970-01-01")))
            .cast("long").as("i"), col("c")),
        Seq("i"), "left")
      .select(col("i"), coalesce(col("c"), lit(0L)).as("c"))
    val xs = series(xType).select(col("i"), col("c").as("x"))
      .localCheckpoint(true)
    val ys = series(yType).select(col("i").as("yi"), col("c").as("y"))
      .localCheckpoint(true)
    val ks = xs.sparkSession.range(1).select(explode(
      sequence(lit(-maxLag.toLong), lit(maxLag.toLong))).as("k"))
    xs.crossJoin(broadcast(ks))
      .join(ys, col("yi") === col("i") + col("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("vx", expr(
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("vy", expr(
        "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .select(col("k"), col("n"),
        when(col("vx") > 0 && col("vy") > 0, round(expr(
          """CAST(CAST(n AS DECIMAL(38,0)) * sxy
            |  - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
            |/ (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE)))"""
            .stripMargin), 6)).as("r_xcorr"))
      .orderBy("k")
  }

  def tsXcorr(s: SparkSession, dir: String): DataFrame =
    tsXcorrOn(Tables.events(s, dir))

  /** (zα/2 + zβ)² for α = 0.05 two-sided, power = 0.8 —
    * (1.959964 + 0.841621)², pinned in micro-units so the sizing
    * formula is pure integer arithmetic. */
  val PowerKMicro = 7848886L

  /** L21c: two-proportion experiment sizing — "how many users per arm
    * would the NEXT experiment need to detect the effect we just
    * observed?" (Lehr/standard normal-approximation sample size,
    * planning sibling of [[Events.eventAbTestOn]] which tests the
    * CURRENT one). Same arm assignment and per-user conversion rollup
    * as the test; then
    *   n_per_arm = K · (p0(1−p0) + p1(1−p1)) / (p1−p0)²
    * spelled exactly: rates in ppm, variance term v in ppm² (≤ 5·10¹¹),
    * K in micro-units, one integral DIV in DECIMAL(38,0):
    *   n = (K_micro · v) DIV (δ_ppm² · 10⁶)
    * — all operands non-negative, so Spark DIV and DuckDB // agree
    * bit-for-bit. δ = 0 (or an empty arm) gates to NULL rather than
    * dividing by zero. Shape: one user-keyed map-side-combined
    * rollup, then arithmetic on a 1-row relation. */
  def eventPowerOn(events: DataFrame): DataFrame = {
    val users = events
      .select(col("user_id"),
        (col("event_type") === "purchase").cast("long").as("isp"))
      .groupBy("user_id")
      .agg(max(col("isp")).as("converted"))
      .select((col("user_id") % 2).cast("int").as("variant"),
        col("converted"))
    // ONE global conditional aggregate, not per-arm reductions joined:
    // with an empty arm a crossJoin of filtered 1-row relations yields
    // 0 rows while the oracle's scalar subqueries yield 1 row of NULLs
    // — sum(when(...)) over no matching rows is NULL, matching the
    // oracle's gate exactly (and dropping a join from the plan).
    users.agg(
        sum(when(col("variant") === 0, 1L)).as("n0"),
        sum(when(col("variant") === 0, col("converted"))).as("x0"),
        sum(when(col("variant") === 1, 1L)).as("n1"),
        sum(when(col("variant") === 1, col("converted"))).as("x1"))
      .select(col("n0"), col("x0"), col("n1"), col("x1"),
        expr("CAST(x0 * 1000000 DIV n0 AS BIGINT)").as("p0_ppm"),
        expr("CAST(x1 * 1000000 DIV n1 AS BIGINT)").as("p1_ppm"))
      .withColumn("delta_ppm", col("p1_ppm") - col("p0_ppm"))
      .withColumn("n_per_arm", expr(
        s"""CASE WHEN delta_ppm <> 0 THEN
           |  CAST($PowerKMicro
           |    * (CAST(p0_ppm AS DECIMAL(38,0)) * (1000000 - p0_ppm)
           |       + CAST(p1_ppm AS DECIMAL(38,0)) * (1000000 - p1_ppm))
           |    DIV (CAST(delta_ppm AS DECIMAL(38,0)) * delta_ppm
           |         * 1000000) AS BIGINT) END""".stripMargin))
  }

  def eventPower(s: SparkSession, dir: String): DataFrame =
    eventPowerOn(Tables.events(s, dir))

  /** Sample-size factors swept by [[eventMdeCurveOn]], in milli. */
  val MdeFactorsMilli: Seq[Long] = Seq(250L, 500L, 1000L, 2000L, 4000L)

  /** L21d: minimum-detectable-effect curve — [[eventPowerOn]]'s
    * inverse, and the planning table experimentation platforms
    * actually show (Kohavi et al., "Trustworthy Online Controlled
    * Experiments" ch. 17): at each candidate per-arm size n·f,
    * f ∈ {¼,½,1,2,4} of the CURRENT population, the smallest absolute
    * rate lift detectable at α=.05 / power=.8,
    *   MDE = (z_{α/2}+z_β) · sqrt(2·p̄(1−p̄)/n_f),
    * with p̄ the pooled conversion. "Can this experiment see a 1%
    * lift, and how long until it can" is read straight off the rows.
    *
    * Determinism: p̄ and the variance term are exact integers
    * (ppm/ppm²); the single numerator K·2·v stays a BIGINT
    * (≤ 3.9·10¹⁸); one IEEE division by the exact 10⁶·n_f, one
    * correctly-rounded sqrt, one pinned floor at the ppm boundary —
    * identical in both engines (the sqrt-composition rule's sibling:
    * division and sqrt ARE correctly rounded, pow is not). n_f floors
    * at 1; a degenerate pooled rate (0 or 1) yields MDE 0 and is the
    * caller's signal that the normal approximation left the building.
    * Shape: the event_power user rollup, then a broadcast 5-row
    * factor fanout — 1-row arithmetic after the rollup. */
  def eventMdeCurveOn(events: DataFrame): DataFrame = {
    val users = events
      .select(col("user_id"),
        (col("event_type") === "purchase").cast("long").as("isp"))
      .groupBy("user_id")
      .agg(max(col("isp")).as("converted"))
    val base = users.agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_conv"))
      .select(col("n_users"), col("n_conv"),
        expr("n_users DIV 2").as("n_arm"),
        expr("CAST(n_conv * 1000000 DIV n_users AS BIGINT)").as("p_ppm"))
    val factors = events.sparkSession.range(0, MdeFactorsMilli.size)
      .select(col("id").cast("int").as("i"))
      .withColumn("factor_milli", expr(
        s"CAST(element_at(array(${MdeFactorsMilli.mkString(", ")}), " +
          "i + 1) AS BIGINT)"))
      .select("factor_milli")
    base.crossJoin(broadcast(factors))
      .select(col("factor_milli"), col("n_users"), col("p_ppm"),
        greatest(expr("n_arm * factor_milli DIV 1000"), lit(1L))
          .as("n_per_arm"))
      .withColumn("mde_ppm", expr(
        s"""CAST(floor(sqrt(
           |  CAST($PowerKMicro * 2 * (p_ppm * (1000000 - p_ppm))
           |    AS DOUBLE)
           |  / (1000000.0 * n_per_arm))) AS BIGINT)""".stripMargin))
      .orderBy("factor_milli")
  }

  def eventMdeCurve(s: SparkSession, dir: String): DataFrame =
    eventMdeCurveOn(Tables.events(s, dir))

  /** L22f: weighted flow reciprocity (Squartini et al., Nature SR
    * 2013 — "Reciprocity of weighted networks") over the user-journey
    * transition graph: for each unordered event-type pair, how much
    * of the combined A→B / B→A flow is reciprocated,
    * 2·min(w_ab, w_ba) / (w_ab + w_ba) in exact ppm — 10⁶ for
    * symmetric flows, → 0 for one-way funnels; the readout that
    * separates browse loops (view↔click) from conversion funnels
    * (click→purchase, rarely back). Transition counts are one
    * user-keyed lead window + a vocabulary-bounded rollup; the
    * direction pairing is a full-outer self-alignment on ≤ vocab²
    * rows. Self-loops are excluded (trivially reciprocal). */
  def graphReciprocityOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val e = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .filter(col("dst").isNotNull && col("dst") =!= col("event_type"))
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // both direction slices
    val fwd = e.filter(col("src") < col("dst"))
      .withColumnRenamed("n", "n_fwd")
    val rev = e.filter(col("src") > col("dst"))
      .select(col("dst").as("src"), col("src").as("dst"),
        col("n").as("n_rev"))
    fwd.join(rev, Seq("src", "dst"), "full_outer")
      .na.fill(0L, Seq("n_fwd", "n_rev"))
      .select(col("src").as("t_a"), col("dst").as("t_b"),
        col("n_fwd"), col("n_rev"),
        expr("""CAST(2 * least(n_fwd, n_rev) * 1000000
               | DIV (n_fwd + n_rev) AS BIGINT)""".stripMargin)
          .as("reciprocity_ppm"))
      .orderBy("t_a", "t_b")
  }

  def graphReciprocity(s: SparkSession, dir: String): DataFrame =
    graphReciprocityOn(Tables.events(s, dir))

  /** L22d: burstiness of the inter-event gap process (Goh &
    * Barabási, EPL 2008): B = (σ−μ)/(σ+μ) over per-type interarrival
    * gaps — −1 for a metronome, 0 for a Poisson process, →1 for
    * heavy-tailed bursts; the signal that tells a capacity planner
    * whether mean rate is a usable sizing number. Gaps in whole
    * seconds (floor of the µs delta — pinned identically both
    * engines); moments as exact integer sums through DECIMAL(38,0)
    * (n·Q − S² overflows BIGINT at corpus gap magnitudes), then
    * B = (√(nQ−S²) − S)/(√(nQ−S²) + S) with one correctly-rounded
    * sqrt and one division in double (the agg_corr discipline).
    * NULL gates: fewer than 2 gaps, or an all-zero gap process.
    * Shape: one type-keyed lag window, one rollup row per type. */
  def tsBurstinessOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("tus").asc, col("event_id").asc)
    events
      .select(col("event_type"), unix_micros(col("ts")).as("tus"),
        col("event_id"))
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        expr("(tus - prev) DIV 1000000").as("gap_s"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).as("sum_gap_s"),
        sum(expr("CAST(gap_s AS DECIMAL(38,0)) * gap_s")).as("q"))
      .select(col("event_type"), col("n_gaps"), col("sum_gap_s"),
        expr("""CASE WHEN n_gaps >= 2 AND sum_gap_s > 0 THEN
               |  (sqrt(CAST(CAST(n_gaps AS DECIMAL(38,0)) * q
               |     - CAST(sum_gap_s AS DECIMAL(38,0)) * sum_gap_s
               |     AS DOUBLE)) - CAST(sum_gap_s AS DOUBLE))
               |  / (sqrt(CAST(CAST(n_gaps AS DECIMAL(38,0)) * q
               |     - CAST(sum_gap_s AS DECIMAL(38,0)) * sum_gap_s
               |     AS DOUBLE)) + CAST(sum_gap_s AS DOUBLE))
               |END""".stripMargin).as("b_burstiness"))
      .orderBy("event_type")
  }

  def tsBurstiness(s: SparkSession, dir: String): DataFrame =
    tsBurstinessOn(Tables.events(s, dir))

  /** L22e: new-vs-returning daily actives — the standard growth
    * split: a user's first-ever active day classifies them "new" on
    * that day and "returning" on every later active day. First-seen
    * is a per-user min over the collapsed (user, day) incidence, the
    * classification joins it back user-keyed, the readout is a
    * day-keyed rollup with the exact ppm share. */
  def eventNewReturningOn(events: DataFrame): DataFrame = {
    val inc = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .localCheckpoint(true) // first-seen + the classification join
    val first = inc.groupBy("user_id").agg(min(col("d")).as("d0"))
    inc.join(first, "user_id")
      .groupBy("d")
      .agg(sum(when(col("d") === col("d0"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("d") > col("d0"), 1L).otherwise(0L))
          .as("n_returning"))
      .select(col("d"), col("n_new"), col("n_returning"),
        expr("""CAST(n_new * 1000000 DIV (n_new + n_returning)
               | AS BIGINT)""".stripMargin).as("new_share_ppm"))
      .orderBy("d")
  }

  def eventNewReturning(s: SparkSession, dir: String): DataFrame =
    eventNewReturningOn(Tables.events(s, dir))

  /** L22c: DAU/MAU stickiness (the standard product-engagement
    * ratio): per calendar day, distinct daily actives over distinct
    * trailing-30-day actives, exact in ppm. The trailing-window
    * DISTINCT is the interesting distributed bit — a sliding
    * count-distinct window cannot partial-aggregate, so the scalable
    * spelling expands the COLLAPSED (user, day) incidence 30× (each
    * active day contributes the user to the next 30 MAU days),
    * dedups, and counts — calendar-bounded fanout on the collapsed
    * relation, never on raw events; both rollups are day-keyed
    * map-side combines. Days come from the DAU side (inner join), so
    * trailing ghost days past the corpus end never emit. */
  def eventStickinessOn(events: DataFrame, windowDays: Int = 30)
      : DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    val inc = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .localCheckpoint(true) // dau + the 30x expansion
    val dau = inc.groupBy("d").agg(count(lit(1)).as("dau"))
    val mau = inc
      .select(col("user_id"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("k"),
        col("d"))
      .select(col("user_id"), date_add(col("d"), col("k")).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("mau"))
    dau.join(mau, dau("d") === mau("day"))
      .select(col("d"), col("dau"), col("mau"),
        expr("CAST(dau * 1000000 DIV mau AS BIGINT)")
          .as("stickiness_ppm"))
      .orderBy("d")
  }

  def eventStickiness(s: SparkSession, dir: String): DataFrame =
    eventStickinessOn(Tables.events(s, dir))

  /** L22b: market-basket association rules over event types (the
    * Agrawal-Srikant support/confidence/lift readout, here on the
    * user×event-type incidence): for every unordered type pair, how
    * many users did both, and is the co-occurrence above or below
    * independence? support_ppm = c_ab/n, the two directed
    * confidences c_ab/c_a and c_ab/c_b, and lift_milli =
    * 1000·n·c_ab / (c_a·c_b) — all exact integer divisions on
    * non-negative operands.
    *
    * Shape at 100 TB: the incidence relation is one distinct rollup
    * off the fact scan; pair enumeration is a user-keyed self-join
    * whose per-user fanout is C(|types|, 2) — vocabulary-bounded
    * (10 pairs at 5 types), never row-squared; the per-type singles
    * and the 1-row n cross in as broadcasts. */
  def eventMarketBasketOn(events: DataFrame): DataFrame = {
    val u = events.select(col("user_id"), col("event_type").as("t"))
      .distinct()
      .localCheckpoint(true) // pairs + singles + n off one relation
    val n = u.select("user_id").distinct().agg(count(lit(1)).as("n"))
    val singles = u.groupBy("t").agg(count(lit(1)).as("c"))
    val pairs = u.as("x").join(u.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.t") < col("y.t"))
      .groupBy(col("x.t").as("t_a"), col("y.t").as("t_b"))
      .agg(count(lit(1)).as("c_ab"))
    pairs
      .join(broadcast(singles.select(col("t").as("t_a"),
        col("c").as("c_a"))), "t_a")
      .join(broadcast(singles.select(col("t").as("t_b"),
        col("c").as("c_b"))), "t_b")
      .crossJoin(broadcast(n))
      .select(col("t_a"), col("t_b"), col("c_a"), col("c_b"),
        col("c_ab"),
        expr("CAST(c_ab * 1000000 DIV n AS BIGINT)").as("support_ppm"),
        expr("CAST(c_ab * 1000000 DIV c_a AS BIGINT)")
          .as("conf_a_to_b_ppm"),
        expr("CAST(c_ab * 1000000 DIV c_b AS BIGINT)")
          .as("conf_b_to_a_ppm"),
        expr("CAST(c_ab * n * 1000 DIV (c_a * c_b) AS BIGINT)")
          .as("lift_milli"))
      .orderBy("t_a", "t_b")
  }

  def eventMarketBasket(s: SparkSession, dir: String): DataFrame =
    eventMarketBasketOn(Tables.events(s, dir))

  /** The row-level constraint suite for [[dqRulesOn]], each rule one
    * engine-portable SQL predicate over a lineitem row. ONE string per
    * rule evaluated verbatim by both engines (the chi2Ladder / LCG
    * discipline), so the suites cannot drift. Numbered names pin the
    * output order. */
  val DqRowRules: Seq[(String, String)] = Seq(
    "01_orderkey_not_null" -> "l_orderkey IS NOT NULL",
    "02_quantity_in_1_50" -> "l_quantity BETWEEN 1 AND 50",
    "03_discount_in_0_10pct" -> "l_discount BETWEEN 0.0 AND 0.1",
    "04_tax_in_0_8pct" -> "l_tax BETWEEN 0.0 AND 0.08",
    "05_returnflag_in_set" -> "l_returnflag IN ('A', 'N', 'R')",
    "06_linestatus_in_set" -> "l_linestatus IN ('F', 'O')",
    "07_price_positive" -> "l_extendedprice > 0")

  /** L21e: declarative data-quality rule suite — the Deequ /
    * Great-Expectations shape (Schelter et al., VLDB 2018: "Automating
    * large-scale data quality verification"): a CONSTRAINT LIST is
    * evaluated against a relation and the report is one row per rule
    * with its violation count, rate, and verdict — the contract gate a
    * pipeline runs before promoting a batch.
    *
    * The Deequ insight this keeps at 100 TB: every ROW-LEVEL rule
    * folds into the SAME single aggregate pass — each predicate
    * becomes a summed CASE indicator (NULL-hostile: a NULL predicate
    * counts as a violation, so a null discount fails the domain rule
    * rather than slipping through), so 7 rules cost one scan, not 7.
    * Only the two whole-relation rules need more: key uniqueness
    * (distinct count of the candidate key over non-null keys — rule
    * 01 guards the null case, the Deequ convention) and referential
    * integrity into orders (LEFT join against the distinct key
    * relation, null-probe count — shuffles on the join key, no
    * broadcast assumption at fact-vs-fact scale). The three 1-row
    * summaries meet on broadcast crossJoins and explode into the
    * per-rule report. */
  def dqRulesOn(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      (DqRowRules.map { case (name, pred) =>
        sum(expr(s"CASE WHEN $pred THEN 0 ELSE 1 END")).as(s"v_$name")
      } :+
        countDistinct(col("l_orderkey"), col("l_linenumber"))
          .as("pk_distinct"))
    val rowAgg = lineitem.agg(aggs.head, aggs.tail: _*)
    val fkAgg = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
        .as("v_fk"))
    val ruleStructs = DqRowRules.map { case (name, _) =>
      s"named_struct('rule', '$name', 'v', v_$name)"
    } ++ Seq(
      "named_struct('rule', '08_pk_unique', 'v', n_rows - pk_distinct)",
      "named_struct('rule', '09_fk_orders_exists', 'v', v_fk)")
    rowAgg.crossJoin(broadcast(fkAgg))
      .select(col("n_rows"),
        expr(s"explode(array(${ruleStructs.mkString(", ")}))").as("r"))
      .select(col("r.rule"), col("n_rows").as("n_checked"),
        col("r.v").as("n_violations"),
        expr("CAST(r.v * 1000000 DIV n_rows AS BIGINT)")
          .as("violation_ppm"),
        (col("r.v") === 0L).as("pass"))
      .orderBy("rule")
  }

  def dqRules(s: SparkSession, dir: String): DataFrame =
    dqRulesOn(Tables.lineitem(s, dir), Tables.orders(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "event_concurrency" -> eventConcurrency,
    "event_bounce" -> eventBounce,
    "ts_xcorr" -> tsXcorr,
    "event_power" -> eventPower,
    "event_mde_curve" -> eventMdeCurve,
    "dq_freshness" -> dqFreshness,
    "dq_completeness" -> dqCompleteness,
    "dq_rules" -> dqRules,
    "event_market_basket" -> eventMarketBasket,
    "event_stickiness" -> eventStickiness,
    "ts_burstiness" -> tsBurstiness,
    "event_new_returning" -> eventNewReturning,
    "graph_reciprocity" -> graphReciprocity,
  )

  val oracles: Map[String, String] = Map(
    // Mirrors graphReciprocityOn: lead-window transitions, no self
    // loops, full-outer direction alignment, exact ppm.
    "graph_reciprocity" ->
      """WITH tr AS (SELECT user_id, event_type AS src,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |  FROM events),
        |e AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM tr WHERE dst IS NOT NULL AND dst <> src GROUP BY 1, 2),
        |f AS (SELECT src, dst, n AS n_fwd FROM e WHERE src < dst),
        |r AS (SELECT dst AS src, src AS dst, n AS n_rev FROM e
        |  WHERE src > dst)
        |SELECT COALESCE(f.src, r.src) AS t_a,
        |  COALESCE(f.dst, r.dst) AS t_b,
        |  COALESCE(n_fwd, CAST(0 AS BIGINT)) AS n_fwd,
        |  COALESCE(n_rev, CAST(0 AS BIGINT)) AS n_rev,
        |  CAST(2 * LEAST(COALESCE(n_fwd, 0), COALESCE(n_rev, 0))
        |    * 1000000 // (COALESCE(n_fwd, 0) + COALESCE(n_rev, 0))
        |    AS BIGINT) AS reciprocity_ppm
        |FROM f FULL OUTER JOIN r ON f.src = r.src AND f.dst = r.dst
        |ORDER BY t_a, t_b""".stripMargin,
    // Mirrors tsBurstinessOn: second-floored gaps, HUGEINT moments,
    // one sqrt + one division in double.
    "ts_burstiness" ->
      """WITH g AS (SELECT event_type,
        |    (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
        |      PARTITION BY event_type
        |      ORDER BY epoch_us(ts) ASC, event_id ASC)) // 1000000
        |      AS gap_s
        |  FROM events),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |    CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s,
        |    SUM(CAST(gap_s AS HUGEINT) * gap_s) AS q
        |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_gaps, sum_gap_s,
        |  CASE WHEN n_gaps >= 2 AND sum_gap_s > 0 THEN
        |    (sqrt(CAST(CAST(n_gaps AS HUGEINT) * q
        |       - CAST(sum_gap_s AS HUGEINT) * sum_gap_s AS DOUBLE))
        |     - CAST(sum_gap_s AS DOUBLE))
        |    / (sqrt(CAST(CAST(n_gaps AS HUGEINT) * q
        |       - CAST(sum_gap_s AS HUGEINT) * sum_gap_s AS DOUBLE))
        |     + CAST(sum_gap_s AS DOUBLE))
        |  END AS b_burstiness
        |FROM m ORDER BY event_type""".stripMargin,
    // Mirrors eventNewReturningOn: collapsed incidence, per-user
    // first-seen min, day rollup with exact ppm share.
    "event_new_returning" ->
      """WITH inc AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events),
        |f AS (SELECT user_id, MIN(d) AS d0 FROM inc GROUP BY 1)
        |SELECT inc.d,
        |  CAST(SUM(CASE WHEN inc.d = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(SUM(CASE WHEN inc.d > f.d0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_returning,
        |  CAST(SUM(CASE WHEN inc.d = f.d0 THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS new_share_ppm
        |FROM inc JOIN f USING (user_id)
        |GROUP BY inc.d ORDER BY inc.d""".stripMargin,
    // Mirrors eventStickinessOn: collapsed incidence, 30x expansion
    // with dedup for the trailing distinct, DAU-side inner join.
    "event_stickiness" ->
      """WITH inc AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events),
        |dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM inc
        |  GROUP BY 1),
        |ex AS (SELECT DISTINCT user_id,
        |    d + CAST(k.k AS INT) AS day
        |  FROM inc, range(0, 30) k(k)),
        |mau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS mau FROM ex
        |  GROUP BY 1)
        |SELECT dau.d, dau.dau, mau.mau,
        |  CAST(dau.dau * 1000000 // mau.mau AS BIGINT)
        |    AS stickiness_ppm
        |FROM dau JOIN mau ON mau.day = dau.d
        |ORDER BY d""".stripMargin,
    // Mirrors eventMarketBasketOn: distinct incidence, ordered-pair
    // self-join, singles + n joined in, exact integer ratios.
    "event_market_basket" ->
      """WITH u AS (SELECT DISTINCT user_id, event_type AS t
        |  FROM events),
        |n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
        |  FROM u),
        |s AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM u
        |  GROUP BY 1),
        |p AS (SELECT x.t AS t_a, y.t AS t_b,
        |    CAST(COUNT(*) AS BIGINT) AS c_ab
        |  FROM u x JOIN u y ON x.user_id = y.user_id AND x.t < y.t
        |  GROUP BY 1, 2)
        |SELECT p.t_a, p.t_b, sa.c AS c_a, sb.c AS c_b, p.c_ab,
        |  CAST(p.c_ab * 1000000 // n.n AS BIGINT) AS support_ppm,
        |  CAST(p.c_ab * 1000000 // sa.c AS BIGINT) AS conf_a_to_b_ppm,
        |  CAST(p.c_ab * 1000000 // sb.c AS BIGINT) AS conf_b_to_a_ppm,
        |  CAST(p.c_ab * n.n * 1000 // (sa.c * sb.c) AS BIGINT)
        |    AS lift_milli
        |FROM p JOIN s sa ON sa.t = p.t_a JOIN s sb ON sb.t = p.t_b
        |CROSS JOIN n ORDER BY t_a, t_b""".stripMargin,
    // Generated from the same DqRowRules literals the engine sums, so
    // the two suites cannot drift; pk/fk CTEs mirror dqRulesOn.
    "dq_rules" -> {
      val vSums = DqRowRules.map { case (n, p) =>
        s"CAST(SUM(CASE WHEN $p THEN 0 ELSE 1 END) AS BIGINT) AS v_$n"
      }.mkString(",\n    ")
      val unions = DqRowRules.map { case (n, _) =>
        s"UNION ALL SELECT '$n', n_rows, v_$n FROM r"
      }.mkString("\n  ")
      s"""WITH r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    $vSums,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM
         |      (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
         |       WHERE l_orderkey IS NOT NULL
         |         AND l_linenumber IS NOT NULL)) AS pk_distinct
         |  FROM lineitem),
         |fk AS (SELECT CAST(SUM(CASE WHEN o.o_orderkey IS NULL
         |      THEN 1 ELSE 0 END) AS BIGINT) AS v_fk
         |  FROM lineitem l
         |  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
         |    ON l.l_orderkey = o.o_orderkey),
         |u AS (SELECT '00' AS rule, CAST(0 AS BIGINT) AS n_rows,
         |    CAST(0 AS BIGINT) AS v WHERE 1 = 0
         |  $unions
         |  UNION ALL SELECT '08_pk_unique', n_rows,
         |    n_rows - pk_distinct FROM r
         |  UNION ALL SELECT '09_fk_orders_exists', n_rows, v_fk
         |    FROM r, fk)
         |SELECT rule, n_rows AS n_checked, CAST(v AS BIGINT)
         |    AS n_violations,
         |  CAST(v * 1000000 // n_rows AS BIGINT) AS violation_ppm,
         |  v = 0 AS pass
         |FROM u ORDER BY rule""".stripMargin
    },
    "event_concurrency" ->
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
         |lagd AS (SELECT user_id, us,
         |    LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS prev
         |  FROM ev),
         |marked AS (SELECT user_id, us,
         |    CASE WHEN prev IS NULL OR us - prev > ${SessionGapMin}*60*1000000
         |      THEN 1 ELSE 0 END AS new_s
         |  FROM lagd),
         |sids AS (SELECT user_id, us,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
         |      ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM marked),
         |sess AS (SELECT user_id, sid, MIN(us) AS s, MAX(us) AS e
         |  FROM sids GROUP BY user_id, sid),
         |segs AS (SELECT user_id, sid, CAST(g.dt AS DATE) AS d,
         |    GREATEST(s, epoch_us(g.dt)) AS t0,
         |    LEAST(e, epoch_us(g.dt) + 86399999999) AS t1
         |  FROM sess, UNNEST(generate_series(
         |    date_trunc('day', make_timestamp(s)),
         |    date_trunc('day', make_timestamp(e)),
         |    INTERVAL 1 DAY)) AS g(dt)),
         |bounds AS (
         |  SELECT d, user_id, sid, t0 AS t, CAST(1 AS BIGINT) AS delta
         |    FROM segs
         |  UNION ALL
         |  SELECT d, user_id, sid, t1 AS t, CAST(-1 AS BIGINT) AS delta
         |    FROM segs),
         |run AS (SELECT d, delta,
         |    SUM(delta) OVER (PARTITION BY d
         |      ORDER BY t ASC, delta DESC, user_id ASC, sid ASC
         |      ROWS UNBOUNDED PRECEDING) AS r
         |  FROM bounds)
         |SELECT d, CAST(MAX(r) AS BIGINT) AS peak_concurrency,
         |  CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_segments
         |FROM run GROUP BY d ORDER BY d""".stripMargin,
    "event_bounce" ->
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
         |lagd AS (SELECT user_id, us,
         |    LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS prev
         |  FROM ev),
         |marked AS (SELECT user_id, us,
         |    CASE WHEN prev IS NULL OR us - prev > ${SessionGapMin}*60*1000000
         |      THEN 1 ELSE 0 END AS new_s
         |  FROM lagd),
         |sids AS (SELECT user_id, us,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
         |      ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM marked),
         |sess AS (SELECT user_id, sid, MIN(us) AS s,
         |    CAST(COUNT(*) AS BIGINT) AS n_events
         |  FROM sids GROUP BY user_id, sid),
         |byday AS (SELECT CAST(make_timestamp(s) AS DATE) AS d,
         |    n_events FROM sess)
         |SELECT d, CAST(COUNT(*) AS BIGINT) AS n_sessions,
         |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_bounces,
         |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
         |    * 1000000 // COUNT(*) AS BIGINT) AS bounce_ppm,
         |  CAST(SUM(n_events) * 1000 // COUNT(*) AS BIGINT) AS depth_milli
         |FROM byday GROUP BY d ORDER BY d""".stripMargin,
    "ts_xcorr" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1, 2),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
        |spine AS (SELECT CAST(CAST(g.dt AS DATE) - DATE '1970-01-01'
        |      AS BIGINT) AS i
        |  FROM span, UNNEST(generate_series(
        |    CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS g(dt)),
        |dl AS (SELECT CAST(d - DATE '1970-01-01' AS BIGINT) AS i,
        |    event_type, c
        |  FROM daily),
        |xs AS (SELECT spine.i, COALESCE(dl.c, 0) AS x
        |  FROM spine LEFT JOIN dl
        |    ON dl.i = spine.i AND dl.event_type = 'click'),
        |ys AS (SELECT spine.i AS yi, COALESCE(dl.c, 0) AS y
        |  FROM spine LEFT JOIN dl
        |    ON dl.i = spine.i AND dl.event_type = 'purchase'),
        |ks AS (SELECT CAST(kk AS BIGINT) AS k
        |  FROM UNNEST(generate_series(-7, 7)) AS t(kk)),
        |m AS (SELECT k, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM xs CROSS JOIN ks JOIN ys ON yi = i + k
        |  GROUP BY k),
        |v AS (SELECT k, n, sx, sy, sxy, sxx, syy,
        |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS vx,
        |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vy
        |  FROM m)
        |SELECT k, CAST(n AS BIGINT) AS n,
        |  CASE WHEN vx > 0 AND vy > 0 THEN
        |    ROUND(CAST(CAST(n AS HUGEINT) * sxy
        |        - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |      / (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE))), 6)
        |  END AS r_xcorr
        |FROM v ORDER BY k""".stripMargin,
    "dq_freshness" ->
      """WITH per AS (SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
        |  FROM events GROUP BY event_type),
        |wm AS (SELECT MAX(last_us) AS corpus_us FROM per)
        |SELECT event_type, n_events, last_us,
        |  CAST((corpus_us - last_us) // 3600000000 AS BIGINT) AS lag_hours,
        |  corpus_us - last_us > 86400000000 AS is_stale
        |FROM per, wm ORDER BY event_type""".stripMargin,
    // Mirrors dqCompletenessOn: one global aggregate unpivoted to a
    // row per column; blanks counted on string columns only.
    "dq_completeness" ->
      """WITH one AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_doc_id,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS dist_doc_id,
        |  CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_lang,
        |  CAST(SUM(CASE WHEN trim(lang) = '' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS blank_lang,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS dist_lang,
        |  CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_n_chars,
        |  CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS dist_n_chars,
        |  CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_source,
        |  CAST(SUM(CASE WHEN trim(source) = '' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS blank_source,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS dist_source,
        |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_text,
        |  CAST(SUM(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS blank_text,
        |  CAST(COUNT(DISTINCT text) AS BIGINT) AS dist_text
        |  FROM documents),
        |u AS (
        |  SELECT 'doc_id' AS column_name, n_rows, null_doc_id AS n_null,
        |    CAST(0 AS BIGINT) AS n_blank, dist_doc_id AS n_distinct
        |    FROM one
        |  UNION ALL SELECT 'lang', n_rows, null_lang, blank_lang,
        |    dist_lang FROM one
        |  UNION ALL SELECT 'n_chars', n_rows, null_n_chars,
        |    CAST(0 AS BIGINT), dist_n_chars FROM one
        |  UNION ALL SELECT 'source', n_rows, null_source, blank_source,
        |    dist_source FROM one
        |  UNION ALL SELECT 'text', n_rows, null_text, blank_text,
        |    dist_text FROM one)
        |SELECT column_name, n_rows, n_null, n_blank, n_distinct,
        |  CAST((n_rows - n_null - n_blank) * 1000000 // n_rows AS BIGINT)
        |    AS populated_ppm,
        |  n_distinct = n_rows - n_null AS is_unique
        |FROM u ORDER BY column_name""".stripMargin,
    // Mirrors eventMdeCurveOn: pooled rate, exact BIGINT numerator,
    // one IEEE division + correctly-rounded sqrt, pinned ppm floor.
    "event_mde_curve" ->
      s"""WITH u AS (SELECT user_id,
         |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS converted
         |  FROM events GROUP BY user_id),
         |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         |    CAST(SUM(converted) AS BIGINT) AS n_conv FROM u),
         |p AS (SELECT n_users, n_conv, n_users // 2 AS n_arm,
         |    CAST(n_conv * 1000000 // n_users AS BIGINT) AS p_ppm FROM b),
         |f AS (SELECT UNNEST([${MdeFactorsMilli.mkString(", ")}])
         |    AS factor_milli)
         |SELECT CAST(factor_milli AS BIGINT) AS factor_milli, n_users,
         |  p_ppm,
         |  CAST(GREATEST(n_arm * factor_milli // 1000, 1) AS BIGINT)
         |    AS n_per_arm,
         |  CAST(floor(sqrt(
         |    CAST($PowerKMicro * 2 * (p_ppm * (1000000 - p_ppm))
         |      AS DOUBLE)
         |    / (1000000.0 * GREATEST(n_arm * factor_milli // 1000, 1))))
         |    AS BIGINT) AS mde_ppm
         |FROM p, f ORDER BY factor_milli""".stripMargin,
    "event_power" ->
      s"""WITH u AS (SELECT user_id,
         |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS converted
         |  FROM events GROUP BY user_id),
         |arms AS (SELECT CAST(user_id % 2 AS INT) AS variant,
         |    CAST(COUNT(*) AS BIGINT) AS n_users,
         |    CAST(SUM(converted) AS BIGINT) AS n_conv
         |  FROM u GROUP BY 1),
         |ab AS (SELECT
         |    (SELECT n_users FROM arms WHERE variant = 0) AS n0,
         |    (SELECT n_conv FROM arms WHERE variant = 0) AS x0,
         |    (SELECT n_users FROM arms WHERE variant = 1) AS n1,
         |    (SELECT n_conv FROM arms WHERE variant = 1) AS x1),
         |r AS (SELECT n0, x0, n1, x1,
         |    CAST(x0 * 1000000 // n0 AS BIGINT) AS p0_ppm,
         |    CAST(x1 * 1000000 // n1 AS BIGINT) AS p1_ppm
         |  FROM ab)
         |SELECT n0, x0, n1, x1, p0_ppm, p1_ppm,
         |  p1_ppm - p0_ppm AS delta_ppm,
         |  CAST(CASE WHEN p1_ppm - p0_ppm <> 0 THEN
         |    $PowerKMicro
         |      * (CAST(p0_ppm AS HUGEINT) * (1000000 - p0_ppm)
         |         + CAST(p1_ppm AS HUGEINT) * (1000000 - p1_ppm))
         |      // (CAST(p1_ppm - p0_ppm AS HUGEINT) * (p1_ppm - p0_ppm)
         |          * 1000000) END AS BIGINT) AS n_per_arm
         |FROM r""".stripMargin,
  )
}
