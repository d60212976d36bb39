package graft.operators

import graft.{Guards, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics — the warehouse-side operators a pipeline runs
  * over its own telemetry (ingest logs, user events, job audit trails):
  * cohort retention, ordered funnels, SCD2 change compression, and
  * calendar gap-fill. The reference's event handling stops at error
  * counting (raw_to_samples.py error lists); these are the standard
  * generalizations every event table eventually needs.
  *
  * All four are pure declarative plans: grouped aggregates and windows
  * keyed on user/event_type, so every shuffle is map-side combinable
  * and partitions by a bounded-cardinality or well-distributed key.
  */
object Events {

  /** Weekly cohort retention: users bucketed by first-activity date,
    * counted once per (cohort, weeks-since-cohort) cell — the classic
    * retention triangle. One fact scan; shuffles are keyed on user_id
    * (distinct activity days, then the per-user cohort-min window) or
    * the tiny (cohort, week) pair (final count-distinct). At 100 TB
    * the user dimension is the natural partition key throughout; no
    * step sees more than one row per user-day. */
  def eventRetentionOn(events: DataFrame): DataFrame = {
    val acts = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    // cohort via a window min over the distinct activity set, not a
    // groupBy+self-join: the join spelling re-executes the whole
    // distinct subtree (scan included) as its build side — the same
    // duplicate-subtree trap text_tfidf hit in round 2
    acts
      .withColumn("cohort_day",
        min(col("d")).over(Window.partitionBy("user_id")))
      .groupBy(col("cohort_day"),
        floor(datediff(col("d"), col("cohort_day")) / 7)
          .cast("int").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "week_offset")
  }

  /** First-touch ordered funnel over `steps`: a user reaches step k
    * when the first occurrences of steps 1..k are strictly increasing
    * in time (the deterministic first-touch convention; a re-click
    * after a later first view does not count). ONE grouped aggregate
    * computes every per-user first-touch time in a single scan; the
    * funnel itself reduces to a handful of global counters unpivoted
    * into (step_idx, step, n_users, pct) rows. Scale: one shuffle on
    * user_id, partial-aggregated; the final pass is a scalar agg. */
  def eventFunnelOn(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val firsts = events.groupBy("user_id").agg(
      min(when(col("event_type") === steps.head, col("ts"))).as("t0"),
      steps.tail.zipWithIndex.map { case (st, i) =>
        min(when(col("event_type") === st, col("ts"))).as(s"t${i + 1}")
      }: _*)
    // reached(k) = t0 < t1 < ... < tk (nulls fail every comparison)
    val reached: Seq[Column] = steps.indices.map { k =>
      (1 to k).map(i => col(s"t${i - 1}") < col(s"t$i"))
        .foldLeft(col("t0").isNotNull)(_ && _)
    }
    val counts = firsts.agg(
      count(when(reached.head, 1)).as("s0"),
      reached.tail.zipWithIndex.map { case (c, i) =>
        count(when(c, 1)).as(s"s${i + 1}")
      }: _*)
    counts.select(explode(array(steps.indices.map { k =>
        // 4-decimal half-away rounding of s_k/s0 in EXACT BIGINT
        // ((a*20000 + b) div (2b)), one IEEE division by 1e4 at the
        // end — round(a/b, 4) on the double quotient is the
        // ts_gapfill ulp-tie hazard (counts are nonnegative, so no
        // sign branch)
        struct(lit(k + 1).as("step_idx"), lit(steps(k)).as("step"),
          col(s"s$k").as("n_users"),
          (expr(s"(s$k * 20000 + s0) div (2 * s0)") / 10000.0)
            .as("pct"))
      }: _*)).as("f"))
      .select(col("f.step_idx"), col("f.step"), col("f.n_users"), col("f.pct"))
      .orderBy("step_idx")
  }

  /** SCD2 change compression: collapse each user's event stream into
    * validity intervals of its event_type "state" — rows where the
    * state differs from the previous row, with valid_to = next change
    * (NULL = current). The standard slowly-changing-dimension build
    * from a change log (the batch mirror of [[graft.functions.Corpus]]'
    * merge_upsert CDC rung). Both windows share one partitioning
    * (user_id), so the whole op is a single shuffle + two in-partition
    * passes. */
  def scd2IntervalsOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val changes = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from")
  }

  /** Calendar gap-fill + forward fill: one row per (event_type, day)
    * over the full observed date span — missing days appear with n = 0
    * and carry the last observed daily average forward. The date spine
    * is `sequence(min, max)` exploded per type (never a driver-side
    * loop); the fill is a `last(ignoreNulls)` running window per type.
    * Daily averages go through exact cent-integer sums (values are
    * 2-decimal) so both engines divide the same exact integers —
    * no accumulation-order float drift. Scale: the spine is
    * |types| x days (tiny vs the fact table); the single window
    * partitions by event_type — swap in (type, month) range buckets if
    * a type's spine ever outgrows one partition. */
  def tsGapfillOn(events: DataFrame): DataFrame = {
    // span and the type list both derive from the (tiny) daily
    // aggregate, so the fact table is scanned exactly ONCE; daily is
    // materialized because three plan branches read it
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .localCheckpoint(true)
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val w = Window.partitionBy("event_type").orderBy("d")
    // round-half-away-from-zero at 4 decimals in EXACT integer
    // arithmetic, then ONE division of identical integers: round(x, 4)
    // on the double quotient cents/100/n is a latent per-sf hash
    // hazard (a tie like ...37875 rounds differently per engine ulp —
    // caught live at sf0.001), while (|cents|*200 + n) div (2n) is the
    // same BIGINT in both engines and int/1e4 is one IEEE division
    val avgE4 = when(col("cents") >= 0,
      expr("(cents * 200 + n) div (2 * n)"))
      .otherwise(-expr("(-cents * 200 + n) div (2 * n)"))
    spine.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"),
        (last(avgE4, ignoreNulls = true).over(w) / 10000.0).as("avg_ff"))
      .orderBy("event_type", "d")
  }

  /** Last-touch attribution: each purchase is credited to the user's
    * most recent preceding non-purchase touch within `lookbackDays`
    * (calendar days, so both engines compare identical DATE integers);
    * purchases with no in-window touch fall to the 'organic' bucket.
    * One window pass — `last(ignoreNulls)` over rows up to 1 PRECEDING
    * carries the latest touch alongside every event — then a tiny
    * per-channel rollup. Revenue sums exact cents (2-decimal values)
    * with a single division at the end. Scale: one shuffle on user_id
    * for the window, then a partial-aggregated rollup onto ≤5 channel
    * keys — the same user-keyed single-pass shape as [[scd2IntervalsOn]]. */
  def eventAttributionOn(events: DataFrame, lookbackDays: Int = 7): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase",
          struct(col("ts").as("t_ts"), col("event_type").as("t_type"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("touch").isNotNull &&
          datediff(to_date(col("ts")), to_date(col("touch.t_ts")))
            <= lookbackDays,
          col("touch.t_type")).otherwise("organic").as("channel"),
        col("value"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(round(col("value") * 100).cast("long")) / 100.0, 2)
          .as("revenue"))
      .orderBy("channel")
  }

  /** First-order Markov transition matrix of the event stream: counts
    * and row-normalized probabilities of (event_type -> next
    * event_type) steps per user timeline. `lead` over the user window
    * forms the pairs in the same shuffle the SCD2 op uses; the count
    * rollup lands on |types|^2 keys and the probability divides two
    * exact counts once. The transition matrix is the standard session
    * model input (next-action prediction, funnel leak detection). */
  def eventTransitionsOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    pairs
      // exact BIGINT half-away rounding at 4 decimals (counts are
      // positive): round(n/tot, 4) on the double quotient is the
      // ts_gapfill ulp-tie hazard
      .withColumn("tot", sum(col("n")).over(Window.partitionBy("src")))
      .withColumn("p",
        expr("(n * 20000 + tot) div (2 * tot)") / 10000.0)
      .drop("tot")
      .orderBy("src", "dst")
  }

  def eventRetention(s: SparkSession, dir: String): DataFrame =
    eventRetentionOn(Tables.events(s, dir))

  def eventAttribution(s: SparkSession, dir: String): DataFrame =
    eventAttributionOn(Tables.events(s, dir))

  def eventTransitions(s: SparkSession, dir: String): DataFrame =
    eventTransitionsOn(Tables.events(s, dir))

  /** E8: path mining — the frequency table of each user's first
    * `depth` event types in time order, the clickstream question
    * ("what do journeys look like?") that transitions (pairwise
    * Markov) can't answer because it forgets history. Depth-capping
    * does two jobs: it bounds the path string (a power user's full
    * history would make an unbounded group key) and it lets the
    * per-user rank filter collapse to WindowGroupLimit (top-`depth`
    * rows forwarded per user BEFORE the shuffle). The collected path
    * is sorted by rank inside the row (the agg_collect_list
    * discipline — collect_list alone is partition-order racy). Two
    * shuffles total: user-keyed rank, path-keyed count. */
  def eventPathsOn(events: DataFrame, depth: Int = 5): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val first = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= depth)
    first.groupBy("user_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("rk"), col("event_type")))),
          x => x("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
  }

  def eventPaths(s: SparkSession, dir: String): DataFrame =
    eventPathsOn(Tables.events(s, dir))

  def eventFunnel(s: SparkSession, dir: String): DataFrame =
    eventFunnelOn(Tables.events(s, dir))

  def scd2Intervals(s: SparkSession, dir: String): DataFrame =
    scd2IntervalsOn(Tables.events(s, dir))

  def tsGapfill(s: SparkSession, dir: String): DataFrame =
    tsGapfillOn(Tables.events(s, dir))

  /** L19g: CUSUM change detection over daily event counts — the
    * sequential rate monitor (Page 1954) that flags sustained shifts
    * a plain threshold misses. The textbook recursion
    * s_t = max(0, s_{t-1} + (x_t - mean)) looks un-parallelizable,
    * but the clamp REWRITES as prefix sums: with S_t the running sum
    * of (x_t - mean), s_t = S_t - min(0, S_1..S_t) — two window
    * passes (running sum, running min) over ONE type-keyed shuffle,
    * fully distributed. All arithmetic is exact integers scaled by
    * nd (days per type): x*nd - total replaces x - total/nd, so no
    * float mean ever enters; the alarm fires when the scaled
    * statistic exceeds 2*total — i.e. the accumulated excess over
    * the mean reaches two average days' worth of events. */
  def eventCusumOn(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
    val stats = daily.groupBy("event_type")
      .agg(sum(col("x")).as("total"), count(lit(1)).as("nd"))
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(stats), "event_type")
      .withColumn("s", sum(col("x") * col("nd") - col("total")).over(w))
      .withColumn("smin", min(col("s")).over(w))
      .select(col("event_type"), col("d"), col("x"),
        (col("s") - least(col("smin"), lit(0L))).as("cusum"),
        ((col("s") - least(col("smin"), lit(0L))) > col("total") * 2)
          .as("alarm"))
  }

  def eventCusum(s: SparkSession, dir: String): DataFrame =
    eventCusumOn(Tables.events(s, dir)).orderBy("event_type", "d")

  /** L19i: exponentially decayed daily rate (the unnormalized EWMA
    * recursion y_t = x_t + y_{t-1}/2, the smoothing monitoring
    * dashboards run beside [[eventCusumOn]]'s shift detector),
    * truncated to a `span`-day tail. The recursion unrolls to
    * y_t = Σ x_i · 2^-(t-i); with α = 1/2 every weight is a power of
    * two, so each term x_i · 2^-k is EXACT in a double (integer times
    * a power of two) and with span ≤ 20 the sum's significand spread
    * (count bits + 19) stays under 53 bits — the decayed sum is
    * bit-exact and ORDER-FREE across engines and partitionings, no
    * float-accumulation caveat. The truncation discards < 2^-span of
    * the mass. Shape: one daily rollup, then a span-bounded band
    * self-join on the (tiny, day-bounded) daily relation keyed by
    * event_type — at 100 TB of raw events the fact table is touched
    * once; the band join amplifies only the daily rows, by at most
    * span x. */
  def tsEwmaOn(events: DataFrame, span: Int = 20): DataFrame = {
    require(span >= 1 && span <= 20,
      s"span must be in [1, 20] to keep the dyadic sum exact, got $span")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("d")))
      .localCheckpoint(true) // both band-join sides read it
    val hist = daily.select(col("event_type").as("et"),
      col("rn").as("ri"), col("x").as("xi"))
    daily.join(hist,
        col("event_type") === col("et") &&
        col("ri") <= col("rn") && col("ri") > col("rn") - span)
      .groupBy("event_type", "d", "x")
      .agg(sum(col("xi") * pow(lit(0.5), col("rn") - col("ri")))
        .as("decay_sum"))
      .orderBy("event_type", "d")
  }

  def tsEwma(s: SparkSession, dir: String): DataFrame =
    tsEwmaOn(Tables.events(s, dir))

  /** L19j: gaps-and-islands — each user's maximal runs of CONSECUTIVE
    * active days (the engagement-streak metric; the integer-adjacency
    * sibling of gap-threshold sessionization). The classic distributed
    * spelling: rank active days per user, subtract the rank from the
    * date — consecutive days collapse to one constant anchor date, so
    * a single (user, anchor) aggregate yields each island's bounds.
    * Two user-keyed shuffles (distinct + window share one), no
    * iteration, no self-join — at 100 TB the cost is one exchange on
    * user_id. */
  def eventStreaksOn(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    days
      .withColumn("anchor", date_sub(col("d"), row_number().over(w)))
      .groupBy("user_id", "anchor")
      .agg(min(col("d")).as("streak_start"), max(col("d")).as("streak_end"),
        count(lit(1)).as("streak_days"))
      .select("user_id", "streak_start", "streak_end", "streak_days")
      .orderBy("user_id", "streak_start")
  }

  def eventStreaks(s: SparkSession, dir: String): DataFrame =
    eventStreaksOn(Tables.events(s, dir))

  /** L19k: weekday-seasonal residuals — daily counts scored against
    * the series' SAME-WEEKDAY baseline, the first-line seasonality
    * control [[eventCusumOn]]'s flat-mean drift misses (a quiet
    * Sunday is not an incident; a quiet Tuesday might be). Exact
    * integer scaling throughout (the CUSUM x·nd − total recipe, here
    * per weekday): resid_scaled = x·n_w − total_w where n_w/total_w
    * count only the series' days on that ISO weekday; excess flags
    * |resid| > total_w (i.e. more than double / under zero the
    * weekday mean). The weekday stats relation is (types × 7)-sized —
    * broadcast — and the daily rollup is the only corpus-scale
    * aggregate. */
  def eventSeasonalityOn(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dow", (weekday(col("d")) + 1).cast("int"))
    val wk = daily.groupBy("event_type", "dow")
      .agg(sum(col("x")).as("total_w"), count(lit(1)).as("n_w"))
    daily.join(broadcast(wk), Seq("event_type", "dow"))
      .select(col("event_type"), col("d"), col("dow"), col("x"),
        col("n_w"), col("total_w"),
        (col("x") * col("n_w") - col("total_w")).as("resid_scaled"))
      .withColumn("excess",
        abs(col("resid_scaled")) > col("total_w"))
      .orderBy("event_type", "d")
  }

  def eventSeasonality(s: SparkSession, dir: String): DataFrame =
    eventSeasonalityOn(Tables.events(s, dir))

  /** L19l: RFM segmentation — recency / frequency / monetary
    * quintiles per purchasing user, the classic lifecycle-marketing
    * cut ("511 = just arrived, 155 = whale gone quiet"). The
    * interesting part at scale is the QUINTILE ranking: a naive
    * ntile() over all users is a single-partition global window, so
    * each metric ranks via [[graft.operators.Windows.denseIdsOn]]
    * (range partition + per-partition numbering — values identical
    * to the global rank, plan fully parallel), and the quintile is
    * integer math on the dense rank: score = 1 + (rk−1)·5 div n.
    * Monetary sums in exact cents; recency anchors to the corpus'
    * max purchase day (data-derived, so reruns agree). Higher
    * score = better (recent / frequent / high-spend). */
  def eventRfmOn(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val anchor = p.agg(max(col("d")).as("d_max"))
    val base = p.groupBy("user_id")
      .agg(max(col("d")).as("last_d"), count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
      .crossJoin(broadcast(anchor))
      .select(col("user_id"),
        datediff(col("d_max"), col("last_d")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary_cents"),
        (-col("frequency")).as("neg_f"), (-col("monetary_cents")).as("neg_m"))
      .localCheckpoint(true) // three rank passes read it
    val nRel = base.agg(count(lit(1)).as("n_total"))
    def score(ranked: DataFrame, out: String): DataFrame = ranked
      .crossJoin(broadcast(nRel))
      .withColumn(out,
        (lit(5) - expr("(dense_id - 1) * 5 div n_total")).cast("int"))
      .drop("dense_id", "n_total")
    val r = score(graft.operators.Windows.denseIdsOn(base,
      Seq("recency_days", "user_id")), "r")
    val f = score(graft.operators.Windows.denseIdsOn(
      base.select("user_id", "neg_f"), Seq("neg_f", "user_id")), "f")
      .select("user_id", "f")
    val m = score(graft.operators.Windows.denseIdsOn(
      base.select("user_id", "neg_m"), Seq("neg_m", "user_id")), "m")
      .select("user_id", "m")
    r.join(f, "user_id").join(m, "user_id")
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r"), col("f"), col("m"),
        (col("r") * 100 + col("f") * 10 + col("m")).as("segment"))
      .orderBy("user_id")
  }

  def eventRfm(s: SparkSession, dir: String): DataFrame =
    eventRfmOn(Tables.events(s, dir))

  /** L19m: linear gap interpolation — completes the [[tsGapfillOn]]
    * family (zero-fill, forward-fill) with the straight-line
    * estimate reporting pipelines chart through missing days:
    * for a missing day i steps after the previous known point (gap g
    * wide), value = (prev·(g−i) + next·i) / g. The ratio is emitted
    * as exact integer MILLI-units ((prev·(g−i) + next·i)·1000 div g)
    * so both engines agree bit-for-bit — counts are integers and g
    * divides a scaled integer, never a float. Bracketing points come
    * from two ignore-nulls window walks (last known before, first
    * known after) over the per-type calendar spine — the same
    * type-keyed shuffle gapfill already pays, no extra exchange.
    * Series edges (nothing to bracket) stay NULL: an interpolation
    * op that extrapolates is lying. */
  def tsInterpolateOn(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("d"))
    val w = Window.partitionBy("event_type").orderBy("d")
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    spine.join(daily, Seq("event_type", "d"), "left")
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_n", last(col("n"), ignoreNulls = true).over(before))
      .withColumn("prev_rn",
        last(when(col("n").isNotNull, col("rn")), ignoreNulls = true)
          .over(before))
      .withColumn("next_n", first(col("n"), ignoreNulls = true).over(after))
      .withColumn("next_rn",
        first(when(col("n").isNotNull, col("rn")), ignoreNulls = true)
          .over(after))
      .select(col("event_type"), col("d"), col("n"),
        col("n").isNull.as("is_interp"),
        when(col("n").isNotNull, col("n") * 1000)
          .otherwise(when(
            col("prev_rn").isNotNull && col("next_rn").isNotNull,
            expr("""(prev_n * (next_rn - rn) + next_n * (rn - prev_rn))
                   | * 1000 div (next_rn - prev_rn)""".stripMargin)))
          .as("n_milli"))
      .orderBy("event_type", "d")
  }

  def tsInterpolate(s: SparkSession, dir: String): DataFrame =
    tsInterpolateOn(Tables.events(s, dir))

  /** L20a: two-proportion experiment readout — the A/B-test gate every
    * event pipeline eventually grows: users split into two arms by a
    * deterministic id hash (user_id % 2 here; any stable bucketing
    * works), outcome = converted (>= 1 purchase), and the arms compare
    * through the pooled two-proportion z statistic. The entire
    * computation after the per-user rollup is arithmetic on FOUR
    * integers (n/x per arm), so the statistic is spelled exactly:
    *   z² = n·(x0·n1 − x1·n0)² / (n0·n1·x·(n−x))
    * in DECIMAL(38,0), emitted as z2_milli with one integral DIV —
    * exact while n·(x0·n1 − x1·n0)² < 10^38 (any realistic corpus:
    * the cross term is deviation-scaled, not n²-scaled, under a fair
    * split). significant = z2_milli > 3841 (χ²₁ at α = 0.05, since
    * z² ~ χ²₁). Shape: one user-keyed rollup (map-side combined),
    * then a 2-row aggregate — nothing after the first shuffle sees
    * more than one row per user. Degenerate gates (no conversions,
    * or all users converted) yield NULL z² instead of dividing by
    * zero. */
  def eventAbTestOn(events: DataFrame): DataFrame = {
    val users = events
      .select(col("user_id"),
        (col("event_type") === "purchase").cast("long").as("isp"))
      .groupBy("user_id")
      .agg(max(col("isp")).as("converted"))
      .select((col("user_id") % 2).cast("int").as("variant"),
        col("converted"))
    val arms = users.groupBy("variant")
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
    val a = arms.filter(col("variant") === 0)
      .select(col("n_users").as("n0"), col("n_conv").as("x0"))
    val b = arms.filter(col("variant") === 1)
      .select(col("n_users").as("n1"), col("n_conv").as("x1"))
    a.crossJoin(b) // both sides are single-row reductions
      .select(col("n0"), col("x0"), col("n1"), col("x1"),
        expr("CAST(x0 * 1000000 DIV n0 AS BIGINT)").as("cr0_ppm"),
        expr("CAST(x1 * 1000000 DIV n1 AS BIGINT)").as("cr1_ppm"),
        expr("""CASE WHEN x0 + x1 > 0 AND x0 + x1 < n0 + n1 THEN
               |  CAST((CAST(n0 AS DECIMAL(38,0)) + n1)
               |    * ((CAST(x0 AS DECIMAL(38,0)) * n1
               |        - CAST(x1 AS DECIMAL(38,0)) * n0)
               |       * (CAST(x0 AS DECIMAL(38,0)) * n1
               |          - CAST(x1 AS DECIMAL(38,0)) * n0))
               |    * 1000 DIV (CAST(n0 AS DECIMAL(38,0)) * n1
               |      * (CAST(x0 AS DECIMAL(38,0)) + x1)
               |      * (CAST(n0 AS DECIMAL(38,0)) + n1 - x0 - x1))
               |    AS BIGINT) END""".stripMargin).as("z2_milli"))
      .withColumn("significant", col("z2_milli") > 3841L)
  }

  def eventAbTest(s: SparkSession, dir: String): DataFrame =
    eventAbTestOn(Tables.events(s, dir))

  /** L20b: chi-squared independence test between event type and ISO
    * weekday — "does traffic mix shift by day of week?", the
    * categorical sibling of [[eventSeasonalityOn]]'s per-series
    * residuals. Expected counts clear denominators so every cell's
    * contribution is exact: with o = observed, r/c = row/col totals,
    * n = grand total,
    *   contrib = (o − r·c/n)² / (r·c/n) = (o·n − r·c)² / (n·r·c)
    * emitted as contrib_ppm via one integral DIV in DECIMAL(38,0)
    * (numerator is non-negative, so Spark DIV and DuckDB // agree;
    * exact while n⁴ < 10^38 — beyond that the same plan runs with the
    * one closed-form expression in DOUBLE, the aggregation shape is
    * unchanged). The statistic is the BIGINT sum of contrib_ppm over
    * the (types × 7) cell relation — order-free, no float
    * accumulation. Shape: one map-side-combined cell rollup; row/col/
    * grand totals derive from the tiny cell relation and join back
    * broadcast. e_milli (expected count, milli-units) rides along for
    * inspection. */
  def eventChi2On(events: DataFrame): DataFrame = {
    val cells = events
      .select(col("event_type"),
        (weekday(to_date(col("ts"))) + 1).cast("int").as("dow"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // totals + output both read it
    val rowT = cells.groupBy("event_type").agg(sum(col("o")).as("r"))
    val colT = cells.groupBy("dow").agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"))
    cells.join(broadcast(rowT), "event_type")
      .join(broadcast(colT), "dow")
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("dow"), col("o"),
        expr("CAST(CAST(r AS DECIMAL(38,0)) * c * 1000 DIV n AS BIGINT)")
          .as("e_milli"),
        expr("""CAST((CAST(o AS DECIMAL(38,0)) * n
               |      - CAST(r AS DECIMAL(38,0)) * c)
               |  * (CAST(o AS DECIMAL(38,0)) * n
               |     - CAST(r AS DECIMAL(38,0)) * c)
               |  * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * r * c)
               |  AS BIGINT)""".stripMargin).as("contrib_ppm"))
      .orderBy("event_type", "dow")
  }

  def eventChi2(s: SparkSession, dir: String): DataFrame =
    eventChi2On(Tables.events(s, dir))

  /** L20c: Gini concentration of per-user purchase spend — the
    * whale-curve summary ("what share of revenue rides on how few
    * users"). The rank-sum identity G = (2·Σ rk·xₖ − (n+1)·Σx)
    * / (n·Σx) over ascending-sorted values needs a GLOBAL rank — the
    * classic single-partition trap — so ranks come from
    * [[graft.operators.Windows.denseIdsOn]] (range partition +
    * per-partition numbering, identical values, fully parallel).
    * Ties sorted arbitrarily (by user_id here) do not move the sum:
    * equal x contribute the same Σ rk·x under any tie order. Spend
    * in exact cents; the numerator is non-negative by the sorted-rank
    * construction, so the ppm DIV matches DuckDB //. One row out:
    * n_users, total_cents, gini_ppm (0 = perfectly equal,
    * → 1e6 = one user is the whole book). */
  def eventGiniOn(events: DataFrame): DataFrame = {
    val spend = events.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
        .as("cents"))
    Windows.denseIdsOn(spend, Seq("cents", "user_id"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("total_cents"),
        sum(col("dense_id") * col("cents")).as("rksum"))
      .select(col("n_users"), col("total_cents"),
        expr("""CAST((2 * CAST(rksum AS DECIMAL(38,0))
               |      - (CAST(n_users AS DECIMAL(38,0)) + 1) * total_cents)
               |  * 1000000 DIV (CAST(n_users AS DECIMAL(38,0)) * total_cents)
               |  AS BIGINT)""".stripMargin).as("gini_ppm"))
  }

  def eventGini(s: SparkSession, dir: String): DataFrame =
    eventGiniOn(Tables.events(s, dir))

  /** L20d: lag-k autocorrelation of the daily series per event type —
    * the ACF profile that tells a forecaster whether the series is
    * weekly-seasonal (peak at lag 7), trending (slow decay), or noise.
    * The series is the ZERO-FILLED calendar spine (a gap is a real 0,
    * not a missing observation — lags must align on calendar days),
    * with days as integer epoch indices so each lag is an EQUI-join:
    * prev.i = cur.i − k, never a theta join. All five moment sums per
    * (type, lag) are exact BIGINTs; Pearson r then needs one sqrt, so
    * both engines evaluate the IDENTICAL double expression over
    * identical integers and round to 6 places — the agg_moments
    * recipe. Zero-variance windows yield NULL. Shape: the spine is
    * |types|·days rows (tiny next to the event scan); the lag join is
    * keyed on (type, day-index); the moment rollup is map-side
    * combined. At 100 TB the daily rollup IS the reduction — nothing
    * downstream exceeds types × days × maxLag rows. */
  def tsAutocorrOn(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val y = spine.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"),
        datediff(col("d"), to_date(lit("1970-01-01"))).cast("long").as("i"),
        coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint(true) // both sides of the lag join read it
    val ks = y.sparkSession.range(1)
      .select(explode(sequence(lit(1L), lit(maxLag.toLong))).as("lag"))
    // Both sides derive from the same checkpointed `y`; rename every
    // prev-side column so the join condition resolves on disjoint
    // attributes (no reliance on Spark's self-join disambiguation —
    // the classic trivially-true-predicate hazard).
    val cur = y.crossJoin(broadcast(ks))
      .select(col("event_type"), col("lag"), col("i"), col("x"))
    val prev = y.select(col("event_type").as("p_et"),
      col("i").as("pi"), col("x").as("px"))
    cur.join(prev,
        col("p_et") === col("event_type") &&
          col("pi") === col("i") - col("lag"))
      .groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("px")).as("sy"), sum(col("x") * col("px")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("px") * col("px")).as("syy"))
      .withColumn("vx", expr(
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("vy", expr(
        "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .select(col("event_type"), col("lag"), col("n"),
        when(col("vx") > 0 && col("vy") > 0, round(expr(
          """CAST(CAST(n AS DECIMAL(38,0)) * sxy
            |  - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
            |/ (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE)))"""
            .stripMargin), 6)).as("r_acf"))
      .orderBy("event_type", "lag")
  }

  def tsAutocorr(s: SparkSession, dir: String): DataFrame =
    tsAutocorrOn(Tables.events(s, dir))

  /** L20e: cohort LTV curves — cumulative purchase revenue per cohort
    * member by weeks-since-cohort, the revenue companion of
    * [[eventRetentionOn]] (same cohort convention: first activity
    * day). The heavy work is two fact passes — the distinct-day
    * cohort rollup and the purchase rollup — both user-keyed and
    * map-side combinable; everything after lives on the tiny
    * (cohort × week) cell relation, where the running sum is a
    * cohort-keyed window (bounded partitions) and the cohort-size
    * divisor joins back broadcast. Revenue in exact cents;
    * ltv_milli = cum_cents·1000 div cohort_n (non-negative, so both
    * engines' integral division agrees). Weeks with zero purchases
    * simply have no cell — the curve is reported at observed points. */
  def eventCohortLtvOn(events: DataFrame): DataFrame = {
    val cohorts = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id").agg(min(col("d")).as("cohort_day"))
      .localCheckpoint(true) // size rollup + revenue join both read it
    val sizes = cohorts.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_n"))
    val rev = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .join(cohorts, "user_id")
      .groupBy(col("cohort_day"),
        floor(datediff(col("d"), col("cohort_day")) / 7)
          .cast("int").as("week_offset"))
      .agg(sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy("cohort_day").orderBy("week_offset")
    rev.withColumn("cum_cents", sum(col("rev_cents")).over(w))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("week_offset"), col("rev_cents"),
        col("cum_cents"), col("cohort_n"),
        expr("CAST(cum_cents * 1000 DIV cohort_n AS BIGINT)")
          .as("ltv_milli"))
      .orderBy("cohort_day", "week_offset")
  }

  def eventCohortLtv(s: SparkSession, dir: String): DataFrame =
    eventCohortLtvOn(Tables.events(s, dir))

  /** L20f: forecast backtest — seasonal-naive (yhat = the value 7
    * days earlier) against lag-1 persistence, scored per event type
    * by mean absolute error over every day both models can forecast.
    * The baseline every forecasting effort must beat; run over the
    * ZERO-FILLED calendar spine so a silent day counts as an error,
    * not a skipped row. All error sums are exact BIGINTs; MAE is the
    * non-negative sae·1000 div n; the signed bias is emitted as its
    * raw numerator (se7) because signed integral division is the one
    * operation the engines round differently. One type-keyed window
    * pass over the spine (types × days rows), then a map-side
    * combined rollup — nothing here scales with the raw event count
    * beyond the daily rollup itself. */
  def tsForecastNaiveOn(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("d"))
    val w = Window.partitionBy("event_type").orderBy("d")
    spine.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("x"), lit(0L)).as("x"))
      .withColumn("f7", lag(col("x"), 7).over(w))
      .withColumn("f1", lag(col("x"), 1).over(w))
      .filter(col("f7").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(col("x") - col("f7"))).as("sae7"),
        sum(col("x") - col("f7")).as("se7"),
        sum(abs(col("x") - col("f1"))).as("sae1"))
      .select(col("event_type"), col("n_scored"), col("sae7"), col("se7"),
        col("sae1"),
        expr("CAST(sae7 * 1000 DIV n_scored AS BIGINT)").as("mae7_milli"),
        expr("CAST(sae1 * 1000 DIV n_scored AS BIGINT)").as("mae1_milli"))
      .orderBy("event_type")
  }

  def tsForecastNaive(s: SparkSession, dir: String): DataFrame =
    tsForecastNaiveOn(Tables.events(s, dir))

  /** L20o: Holt double exponential smoothing (Holt 1957) — the
    * level+trend forecaster [[tsForecastNaiveOn]]'s backtest exists
    * to beat and [[tsEwmaOn]]'s level-only recursion cannot express.
    * With alpha = beta = 1/2 both updates are a HALVING, so the whole
    * recursion is exact dyadic integer math: l_t = floor((x_t + l_tm1
    * + b_tm1)/2), b_t = floor((l_t - l_tm1 + b_tm1)/2), seeded l_1 =
    * x_1, b_1 = 0 (pinned). Halving is spelled `shiftright(·, 1)` —
    * ARITHMETIC shift, i.e. floor division even on negative trend
    * values — and the oracle spells the identical floor as
    * floor(·/2.0) (exact: magnitudes are day-sums, far below 2^52);
    * signed truncating DIV never appears (the engines disagree on
    * it). The fold runs over the ZERO-FILLED calendar spine (a silent
    * day must pull the level down, not vanish), scored by one-step
    * SSE (yhat_t = l_tm1 + b_tm1, t >= 2), and forecasts h steps out
    * along the trend line fc_h = l + h*b.
    *
    * Scale: the recursion is inherently sequential PER SERIES, so it
    * folds a sort_array(collect_list) via the `aggregate` HOF — the
    * collected series is DAY-DOMAIN bounded (|days| rows per type,
    * ~365/year regardless of raw event count), the same boundedness
    * license as the cents-domain sweeps; the only corpus-scale work
    * is the daily rollup, one map-side-combined type-keyed exchange. */
  def tsHoltOn(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint(true) // span + type list + fold all read it
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("d"))
    val lNext = "shiftright(e.x + a.l + a.b, 1)"
    spine.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("x"), lit(0L)).as("x"))
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("d"), col("x")))).as("s"))
      .withColumn("acc", expr(
        s"""aggregate(s,
           |  named_struct('l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
           |    'sse', CAST(0 AS BIGINT), 'i', CAST(0 AS BIGINT)),
           |  (a, e) -> CASE WHEN a.i = 0
           |    THEN named_struct('l', e.x, 'b', CAST(0 AS BIGINT),
           |      'sse', CAST(0 AS BIGINT), 'i', CAST(1 AS BIGINT))
           |    ELSE named_struct(
           |      'l', $lNext,
           |      'b', shiftright($lNext - a.l + a.b, 1),
           |      'sse', a.sse
           |        + (e.x - a.l - a.b) * (e.x - a.l - a.b),
           |      'i', a.i + 1) END)""".stripMargin))
      .select(col("event_type"), col("acc.i").as("n_days"),
        col("acc.l").as("level"), col("acc.b").as("trend"),
        col("acc.sse").as("sse"),
        (col("acc.l") + col("acc.b")).as("fc_1"),
        (col("acc.l") + lit(7L) * col("acc.b")).as("fc_7"))
      .orderBy("event_type")
  }

  def tsHolt(s: SparkSession, dir: String): DataFrame =
    tsHoltOn(Tables.events(s, dir))

  /** L20y: additive Holt-Winters (triple exponential smoothing;
    * Winters 1960) — [[tsHoltOn]] plus a 7-slot weekly seasonal
    * state, the forecast rung that handles level + trend + dow
    * pattern at once. Same exact-dyadic discipline: α = β = γ = ½ so
    * every update is one arithmetic shift (floor semantics on both
    * engines — Spark shiftright vs DuckDB floor(v/2.0)):
    *
    *   l_t = ⌊(x_t − s_old + l + b) / 2⌋
    *   b_t = ⌊(l_t − l + b) / 2⌋            (the Holt b-form)
    *   s_t = ⌊(x_t − l_t + s_old) / 2⌋      (slot (t−1) mod 7)
    *
    * Textbook init over the first full season: l₀ = ⌊Σx₁..₇ / 7⌋,
    * b₀ = 0, s_j = x_j − l₀; SSE accumulates the one-step-ahead error
    * against l + b + s_old. Series shorter than 8 days are dropped
    * (init needs a full season plus one step; pinned both engines).
    * The per-type fold is the ts_holt shape — the recursion lives in
    * one sort_array(collect_list) aggregate over the calendar-bounded
    * daily grid, the seasonal array rides inside the fold state, and
    * types fold independently in parallel; the oracle replays it as
    * a 7-state-column recursive CTE. */
  def tsHoltWintersOn(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint(true) // span + type list + both fold halves
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val w = Window.partitionBy("event_type").orderBy("d")
    val z = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("d"))
      .join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("x"), lit(0L)).as("x"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .localCheckpoint(true) // init + rest read it
    val init = z.filter(col("rn") <= 7)
      .groupBy("event_type")
      .agg(expr("sum(x) DIV 7").as("l0"),
        sort_array(collect_list(struct(col("rn"), col("x")))).as("xs"))
      .filter(size(col("xs")) === 7)
      .select(col("event_type"), col("l0"),
        expr("transform(xs, e -> e.x - l0)").as("s0"))
    val rest = z.filter(col("rn") >= 8)
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("rn"), col("x"))))
        .as("srest"))
    val slot = "CAST((e.rn - 1) % 7 AS INT)"
    val sOld = s"element_at(a.s, $slot + 1)"
    val lNew = s"shiftright(e.x - $sOld + a.l + a.b, 1)"
    val bNew = s"shiftright($lNew - a.l + a.b, 1)"
    val sNew = s"shiftright(e.x - $lNew + $sOld, 1)"
    init.join(rest, Seq("event_type")) // inner: needs >= 8 days
      .withColumn("acc", expr(
        s"""aggregate(srest,
           |  named_struct('l', l0, 'b', CAST(0 AS BIGINT), 's', s0,
           |    'sse', CAST(0 AS BIGINT), 'n', CAST(7 AS BIGINT)),
           |  (a, e) -> named_struct(
           |    'l', $lNew,
           |    'b', $bNew,
           |    's', transform(a.s, (v, j) ->
           |      CASE WHEN j = $slot THEN $sNew ELSE v END),
           |    'sse', a.sse + (e.x - a.l - a.b - $sOld)
           |      * (e.x - a.l - a.b - $sOld),
           |    'n', a.n + 1))""".stripMargin))
      .select(col("event_type"), col("acc.n").as("n_days"),
        col("acc.l").as("level"), col("acc.b").as("trend"),
        expr("element_at(acc.s, CAST(acc.n % 7 AS INT) + 1)")
          .as("s_next"),
        (col("acc.l") + col("acc.b")
          + expr("element_at(acc.s, CAST(acc.n % 7 AS INT) + 1)"))
          .as("fc_1"),
        col("acc.sse").as("sse"))
      .orderBy("event_type")
  }

  def tsHoltWinters(s: SparkSession, dir: String): DataFrame =
    tsHoltWintersOn(Tables.events(s, dir))

  /** L20p: sequential-pattern support (the GSP/PrefixSpan counting
    * core — Agrawal-Srikant 1996, Pei 2001): for every ordered
    * length-2 and length-3 event-type pattern, how many users contain
    * it as a (not necessarily contiguous) SUBSEQUENCE. Containment
    * uses the classic greedy earliest-occurrence argument — a>b>c is
    * contained iff scanning for the FIRST a, then the first b AFTER
    * it, then any c after THAT succeeds; greedy-earliest is complete
    * (any witness can be shifted left), so three bounded rollups
    * decide it exactly: t_a = min ts(a); t_ab = min ts(b) > t_a;
    * contained iff max ts(c) > t_ab. Repeats (a=a=a) are allowed and
    * need strictly increasing ts — two occurrences in the same
    * microsecond collapse (pinned tie rule; Spark truncates parquet
    * ns to micros so sub-micro order is not comparable anyway).
    *
    * Scale: no per-user sequence is ever materialized (THE PrefixSpan
    * scale trap — a user's full ordered history in one row). The
    * t_ab relation is |users|·vocab² at most, built by ONE user-keyed
    * equi-join whose fanout is the type VOCABULARY (not the event
    * count); pattern supports are map-side-combined rollups to
    * vocab²+vocab³ rows. Every shuffle is user-keyed or
    * vocabulary-sized. */
  def eventSeqPatternsOn(events: DataFrame): DataFrame = {
    val occ = events.select(col("user_id"), col("event_type").as("t"),
      col("ts")).localCheckpoint(true) // firstA + pair probe + lastC
    val nRel = occ.agg(count_distinct(col("user_id")).as("n_users"))
    val firstA = occ.groupBy(col("user_id"), col("t").as("a"))
      .agg(min(col("ts")).as("ta"))
    val lastC = occ.groupBy(col("user_id"), col("t").as("c"))
      .agg(max(col("ts")).as("tc"))
    val tab = occ.join(firstA, "user_id")
      .filter(col("ts") > col("ta"))
      .groupBy(col("user_id"), col("a"), col("t").as("b"))
      .agg(min(col("ts")).as("tab"))
      .localCheckpoint(true) // pair rollup + triple probe
    val pairs = tab.groupBy("a", "b")
      .agg(count(lit(1)).as("support"))
      .select(lit(2L).as("len"),
        concat_ws(">", col("a"), col("b")).as("pattern"), col("support"))
    val triples = tab.join(lastC, "user_id")
      .filter(col("tc") > col("tab"))
      .groupBy("a", "b", "c")
      .agg(count(lit(1)).as("support"))
      .select(lit(3L).as("len"),
        concat_ws(">", col("a"), col("b"), col("c")).as("pattern"),
        col("support"))
    pairs.unionByName(triples)
      .crossJoin(broadcast(nRel))
      .select(col("len"), col("pattern"), col("support"),
        expr("CAST(support * 1000000 DIV n_users AS BIGINT)")
          .as("support_ppm"))
      .orderBy("len", "pattern")
  }

  def eventSeqPatterns(s: SparkSession, dir: String): DataFrame =
    eventSeqPatternsOn(Tables.events(s, dir))

  /** L20g: Poisson bootstrap of total purchase revenue — THE
    * distributed bootstrap (resampling n-of-n is impossible when no
    * worker sees all n rows; Poisson(1) draw counts per row are
    * independent of n and embarrassingly parallel — Chamandy et al.,
    * "Estimating Uncertainty for Massive Data Streams", Google 2012).
    * Each (row, replicate) pair draws k ~ Poisson(1) DETERMINISTICALLY:
    * TWO rounds of the repo's mod-P mixing hash map (event_id, b) to
    * a uniform u in [0, P), and k = #{thresholds <= u} against the
    * Poisson(1) inverse CDF pre-scaled by P = 1e9+7 (truncated at
    * k = 8, P(K > 8) < 1.2e-6 — documented). The second multiply
    * round is LOAD-BEARING: after one round, b's contribution
    * (b·514229 < 2e7) only nudges the low 2% of u, leaving all
    * replicates nearly identical — re-multiplying lifts the b-delta
    * into the high bits (empirically: replicate sd of n_drawn goes
    * from ~3 to sqrt(n), the Poisson truth). Replicates cross in from
    * a broadcast literal range, so the plan is ONE map pass over
    * purchases and a reps-keyed rollup (map-side combined; `reps`
    * groups total). Downstream, the spread of total_cents across
    * replicates IS the sampling distribution of the corpus total. */
  def sampleBootstrapOn(events: DataFrame, reps: Int = 32): DataFrame = {
    require(reps >= 1, s"need reps >= 1, got $reps")
    val P = 1000000007L
    val thresholds = Seq(367879443L, 735758887L, 919698609L, 981011849L,
      996340160L, 999405822L, 999916765L, 999989757L)
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val rs = p.sparkSession.range(1)
      .select(explode(sequence(lit(1L), lit(reps.toLong))).as("b"))
    p.crossJoin(broadcast(rs))
      .withColumn("m1",
        ((col("event_id") % P) * 912367L + col("b") * 514229L + 40503L) % P)
      .withColumn("u", (col("m1") * 912367L + 40503L) % P)
      .withColumn("k",
        thresholds.map(t => (col("u") >= t).cast("long")).reduce(_ + _))
      .groupBy("b")
      .agg(sum(col("k")).as("n_drawn"),
        sum(col("k") * col("cents")).as("total_cents"))
      .orderBy("b")
  }

  def sampleBootstrap(s: SparkSession, dir: String): DataFrame =
    sampleBootstrapOn(Tables.events(s, dir))

  /** L20h: Mann-Whitney U rank-sum test — does the purchase-amount
    * DISTRIBUTION differ between the two user arms (arm = user_id
    * parity, the [[eventAbTestOn]] convention)? The nonparametric
    * sibling of the two-proportion z-test: no normality assumption,
    * whale-robust. Everything is exact integer arithmetic: ranks are
    * midranks over tied cents values, kept integral as DOUBLED rank
    * sums (2·midrank = 2·c_before + t + 1 is always an integer), so
    * r1_x2 = 2·R1 and u1_x2 = 2·U1. The normal-approximation z² with
    * the tie correction is one DECIMAL(38,0) expression,
    *   z² = 3·(2U1 − n0·n1)²·n·(n−1)
    *        / (n0·n1·((n+1)·n·(n−1) − Σ(t³−t)))
    * emitted as z2_milli (exact while the numerator < 10^38 — holds
    * through ~10^5.5 pooled purchases; beyond that the same plan runs
    * the one closed form in DOUBLE). Scale shape: one map-side
    * combinable groupBy collapses the stream to DISTINCT cents values
    * (bounded price domain), rank prefixes come from the bucketed
    * [[prefixByCents]] sweep — never a global sort, not even over the
    * collapsed relation — and the final reduce is scalar. */
  /** EXCLUSIVE prefix sums of `vals` over a distinct-`cents` relation,
    * with NO single-partition sort anywhere (the event_concurrency
    * (day,hour) discipline, pushed to a value domain): the sweep is
    * bucketed three-level —
    *   1. within-bucket (cents div 2^10) prefix: a bucket-PARTITIONED
    *      window, parallel across the price domain;
    *   2. bucket offsets within a super-bucket (cents div 2^20):
    *      a super-bucket-partitioned window over ≤ 1024 bucket rows;
    *   3. super-bucket offsets: a triangular join against the
    *      BROADCAST super relation (≤ domain/2^20 rows — ≤ 2048 even
    *      for a 2^31-cent domain), never a global window.
    * Buckets use floor division so the key is monotone in cents even
    * for negative values. Output: input columns + cum_<c> per value
    * column. */
  private[graft] def prefixByCents(byV0: DataFrame,
      vals: Seq[String]): DataFrame = {
    val byV = byV0
      .withColumn("bk", expr("CAST(floor(cents / 1024.0) AS BIGINT)"))
      .withColumn("sbk", expr("CAST(floor(cents / 1048576.0) AS BIGINT)"))
      .localCheckpoint(true) // read by all three sweep phases
    val wL = Window.partitionBy("bk").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = vals.foldLeft(byV)((d, c) =>
      d.withColumn(s"pre_$c", coalesce(sum(col(c)).over(wL), lit(0L))))
    val wB = Window.partitionBy("sbk").orderBy("bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val aggB = vals.map(c => sum(col(c)).as(s"bt_$c"))
    val boff0 = byV.groupBy("sbk", "bk").agg(aggB.head, aggB.tail: _*)
    val boff = vals.foldLeft(boff0)((d, c) =>
        d.withColumn(s"boff_$c",
          coalesce(sum(col(s"bt_$c")).over(wB), lit(0L))))
      .select(col("bk") +: vals.map(c => col(s"boff_$c")): _*)
    val aggS = vals.map(c => sum(col(c)).as(s"st_$c"))
    val stot = byV.groupBy("sbk").agg(aggS.head, aggS.tail: _*)
      .localCheckpoint(true) // tiny; both sides of the triangular join
    val rhs = stot.select(col("sbk").as("b_sbk") +:
      vals.map(c => col(s"st_$c").as(s"b_$c")): _*)
    val aggT = vals.map(c =>
      coalesce(sum(col(s"b_$c")), lit(0L)).as(s"soff_$c"))
    val soff = stot.select("sbk")
      .join(broadcast(rhs), col("b_sbk") < col("sbk"), "left")
      .groupBy("sbk").agg(aggT.head, aggT.tail: _*)
    vals.foldLeft(local.join(boff, "bk").join(soff, "sbk"))((d, c) =>
      d.withColumn(s"cum_$c",
        col(s"pre_$c") + col(s"boff_$c") + col(s"soff_$c")))
  }

  def eventMannwhitneyOn(events: DataFrame): DataFrame = {
    val byV = events.filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast("int").as("variant"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("cents")
      .agg(count(lit(1)).as("t"),
        sum((col("variant") === 1).cast("long")).as("t1"))
    prefixByCents(byV, Seq("t"))
      .withColumn("cb", col("cum_t"))
      .agg(sum(col("t") - col("t1")).as("n0"), sum(col("t1")).as("n1"),
        sum(col("t1") * (lit(2L) * col("cb") + col("t") + lit(1L)))
          .as("r1_x2"),
        sum(col("t") * col("t") * col("t") - col("t")).as("tie_cube"))
      .select(col("n0"), col("n1"), col("r1_x2"),
        (col("r1_x2") - col("n1") * (col("n1") + lit(1L))).as("u1_x2"),
        col("tie_cube"))
      .withColumn("z2_milli", expr(
        """CASE WHEN n0 > 0 AND n1 > 0
          |    AND (n0 + n1 + 1) * (n0 + n1) * (n0 + n1 - 1) > tie_cube
          |  THEN CAST(
          |    CAST(3000 AS DECIMAL(38,0))
          |      * (CAST(u1_x2 AS DECIMAL(38,0)) - CAST(n0 AS DECIMAL(38,0)) * n1)
          |      * (CAST(u1_x2 AS DECIMAL(38,0)) - CAST(n0 AS DECIMAL(38,0)) * n1)
          |      * (CAST(n0 AS DECIMAL(38,0)) + n1)
          |      * (CAST(n0 AS DECIMAL(38,0)) + n1 - 1)
          |    DIV (CAST(n0 AS DECIMAL(38,0)) * n1
          |      * ((CAST(n0 AS DECIMAL(38,0)) + n1 + 1)
          |          * (CAST(n0 AS DECIMAL(38,0)) + n1)
          |          * (CAST(n0 AS DECIMAL(38,0)) + n1 - 1)
          |        - tie_cube))
          |    AS BIGINT) END""".stripMargin))
      .withColumn("significant", col("z2_milli") > 3841L)
  }

  def eventMannwhitney(s: SparkSession, dir: String): DataFrame =
    eventMannwhitneyOn(Tables.events(s, dir))

  /** L20i: two-sample Kolmogorov–Smirnov test on the same two arms —
    * the max ECDF gap, sensitive to ANY distributional difference
    * (location, spread, shape), completing the test family
    * ([[eventAbTestOn]] rates, [[eventMannwhitneyOn]] ranks, KS
    * shapes). Exact by cross-multiplication: at each distinct cents
    * value, |F0 − F1| = |c0·n1 − c1·n0| / (n0·n1), so the sup is the
    * BIGINT max of the numerator (≤ n0·n1 ~ 10^11 at sf1 — safe) and
    * d_ppm divides once at the end. The α = 0.05 rejection uses the
    * asymptotic threshold c = 1.358·sqrt((n0+n1)/(n0·n1)) squared to
    * clear the root: 10000·d_num² > 18442·(n0+n1)·n0·n1 in
    * DECIMAL(38,0) (18442 = ceil(10^4·1.358²), conservative by
    * < 0.002%). Same scale shape as the rank test: groupBy to
    * distinct values, ECDFs via the bucketed [[prefixByCents]] sweep
    * (totals ride a broadcast 1-row relation), scalar reduce. */
  def eventKsOn(events: DataFrame): DataFrame = {
    val byV = events.filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast("int").as("variant"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("cents")
      .agg(sum((col("variant") === 0).cast("long")).as("v0"),
        sum((col("variant") === 1).cast("long")).as("v1"))
    val pref = prefixByCents(byV, Seq("v0", "v1"))
    val tot = pref.agg(sum(col("v0")).as("t0"), sum(col("v1")).as("t1"))
    pref.crossJoin(broadcast(tot))
      .withColumn("c0", col("cum_v0") + col("v0"))
      .withColumn("c1", col("cum_v1") + col("v1"))
      .agg(max(col("t0")).as("n0"), max(col("t1")).as("n1"),
        max(abs(col("c0") * col("t1") - col("c1") * col("t0")))
          .as("d_num"))
      .select(col("n0"), col("n1"), col("d_num"),
        expr("CAST(d_num * 1000000 DIV (n0 * n1) AS BIGINT)").as("d_ppm"),
        expr(
          """CAST(10000 AS DECIMAL(38,0)) * d_num * d_num
            |  > CAST(18442 AS DECIMAL(38,0)) * (n0 + n1) * n0 * n1"""
            .stripMargin).as("significant"))
  }

  def eventKs(s: SparkSession, dir: String): DataFrame =
    eventKsOn(Tables.events(s, dir))

  /** L20j: OHLC bar resampling — the market-data shape of downsampling
    * a point stream: per (event_type, day), the value at the bucket's
    * first and last instant (open/close), the extremes (high/low), and
    * the turnover (volume, n). First/last are decided by the TOTAL
    * order (microsecond timestamp, event_id) — event_id breaks
    * sub-microsecond ties so both engines pick the identical row (the
    * repo's ns-parquet rule: compare the micros integer, never raw
    * ts). One bucket-partitioned window pass tags the boundary rows,
    * then a map-side combinable rollup; bars ≡ (types × days), so
    * everything after the window is tiny. At 100 TB the window
    * partitions by bucket — parallel across the calendar, no global
    * sort. */
  def tsOhlcOn(events: DataFrame): DataFrame = {
    val base = events.select(col("event_type"), to_date(col("ts")).as("d"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val wa = Window.partitionBy("event_type", "d")
      .orderBy(col("us").asc, col("event_id").asc)
    val wd = Window.partitionBy("event_type", "d")
      .orderBy(col("us").desc, col("event_id").desc)
    base
      .withColumn("ra", row_number().over(wa))
      .withColumn("rd", row_number().over(wd))
      .groupBy("event_type", "d")
      .agg(max(when(col("ra") === 1, col("cents"))).as("open"),
        max(col("cents")).as("high"), min(col("cents")).as("low"),
        max(when(col("rd") === 1, col("cents"))).as("close"),
        sum(col("cents")).as("volume"), count(lit(1)).as("n"))
      .orderBy("event_type", "d")
  }

  def tsOhlc(s: SparkSession, dir: String): DataFrame =
    tsOhlcOn(Tables.events(s, dir))

  /** L20k: Kaplan–Meier at-risk table — right-censored churn
    * analysis. A user's duration is datediff(last activity, first
    * activity); the churn EVENT is observed only when the user has
    * been silent for more than `graceDays` before the corpus horizon
    * (max activity day) — users active near the horizon are CENSORED,
    * the defining feature survival analysis adds over a naive
    * duration histogram. Emits the KM risk table at every duration
    * with mass: n_at_risk(t) = #{duration ≥ t} (suffix cumsum),
    * d_events / n_censored at t, and the discrete hazard
    * d·10^6 div n_at_risk (the per-step KM factor's exact numerator;
    * the cumulative survival PRODUCT is intentionally left to the
    * caller — it is irrational in general and belongs in float
    * space). Scale shape: one user-keyed fact rollup, then the whole
    * table lives on distinct durations (≤ calendar span), where the
    * suffix window is bounded. */
  def eventSurvivalOn(events: DataFrame, graceDays: Int = 7): DataFrame = {
    val perUser = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id")
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val horizon = perUser.agg(max(col("d1")).as("m"))
    val byT = perUser.crossJoin(broadcast(horizon))
      .select(datediff(col("d1"), col("d0")).cast("long").as("t"),
        (datediff(col("m"), col("d1")) > graceDays).cast("long")
          .as("churned"))
      .groupBy("t")
      .agg(sum(col("churned")).as("d_events"),
        sum(lit(1L) - col("churned")).as("n_censored"))
    val wsuf = Window.partitionBy(Guards.one).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Guards.requireBounded(byT, 100000L, "event_survival day-gap domain")
      .withColumn("n_at_risk",
        sum(col("d_events") + col("n_censored")).over(wsuf))
      .select(col("t"), col("n_at_risk"), col("d_events"),
        col("n_censored"),
        expr("CAST(d_events * 1000000 DIV n_at_risk AS BIGINT)")
          .as("hazard_ppm"))
      .orderBy("t")
  }

  def eventSurvival(s: SparkSession, dir: String): DataFrame =
    eventSurvivalOn(Tables.events(s, dir))

  /** L20l: time-to-convert — the latency distribution from a user's
    * FIRST view to their first purchase strictly after it (first-touch
    * convention shared with [[eventFunnelOn]]). Latencies are exact
    * integer seconds ((p_us − v_us) div 10^6 on the micros pair —
    * non-negative by the strict filter, so both engines truncate
    * identically); the p50/p90 summary uses linear-interpolation
    * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, the
    * established [[graft.operators.Analytics]] agg_percentile
    * pairing). Scale shape: two user-keyed fact rollups and one
    * user-keyed join — all shuffles on user_id; the percentile
    * reduce sees one latency per converting user, and at extreme
    * user counts the same plan swaps in approx_percentile unchanged. */
  def eventTimeToConvertOn(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val fv = base.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val conv = base.filter(col("event_type") === "purchase")
      .join(fv, "user_id").filter(col("us") > col("v_us"))
      .groupBy("user_id", "v_us").agg(min(col("us")).as("p_us"))
      .select(expr("(p_us - v_us) DIV 1000000").as("lat_sec"))
    val nv = fv.agg(count(lit(1)).as("n_view_users"))
    conv
      .agg(count(lit(1)).as("n_converted"),
        expr("percentile(lat_sec, 0.5)").as("p50_sec"),
        expr("percentile(lat_sec, 0.9)").as("p90_sec"),
        max(col("lat_sec")).as("max_sec"))
      .crossJoin(broadcast(nv)) // single-row reduction
      .select(col("n_view_users"), col("n_converted"),
        expr("CAST(n_converted * 1000000 DIV n_view_users AS BIGINT)")
          .as("cr_ppm"),
        col("p50_sec"), col("p90_sec"), col("max_sec"))
  }

  def eventTimeToConvert(s: SparkSession, dir: String): DataFrame =
    eventTimeToConvertOn(Tables.events(s, dir))

  /** L19h: sequence-pattern matching over per-user event journeys —
    * the MATCH_RECOGNIZE surrogate: each user's ordered event-type
    * initials collapse to ONE journey string (in-row rank sort, the
    * event_paths determinism recipe), and row-pattern predicates
    * become plain regular expressions evaluated map-side on the
    * aggregated row. Spark has no MATCH_RECOGNIZE; this is the
    * standard rewrite, and it scales the same way sessionization
    * does: one user-keyed shuffle, journey length bounded by events
    * per user (cap with rk <= N for unbounded actors — the
    * event_paths depth cut). Patterns: signup strictly before the
    * first purchase; the view->click->purchase funnel with anything
    * between; an error immediately followed by a purchase. */
  def eventRegexOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        substring(col("event_type"), 1, 1).as("ch"))
      .withColumn("rk", row_number().over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        concat_ws("", expr(
          "transform(array_sort(collect_list(struct(rk, ch))), x -> x.ch)"))
          .as("journey"))
      .select(col("user_id"), col("n_events"), col("journey"),
        col("journey").rlike("^[^p]*s.*p").as("signup_before_purchase"),
        col("journey").rlike("v.*c.*p").as("funnel_vcp"),
        col("journey").rlike("ep").as("error_then_purchase"))
  }

  def eventRegex(s: SparkSession, dir: String): DataFrame =
    eventRegexOn(Tables.events(s, dir)).orderBy("user_id")

  /** L19i: temporal holdout split — the leakage-aware time-based
    * train/test cut every forecasting/recommendation eval needs:
    * the cutoff day is the FIRST day whose running event total
    * reaches 80% of the corpus (computed on the day-bounded daily
    * relation — one tiny window, broadcast back), train = strictly
    * before, test = at-or-after. Emitted per user so the leakage
    * question is first-class: a user with events on both sides is
    * exactly the entity whose test rows a user-level model has
    * already seen — `in_both` quantifies that, user-keyed and
    * map-side combined. All arithmetic exact: counts, one
    * cross-multiplied 80% threshold (5*run >= 4*total), dates. */
  def sampleHoldoutTemporalOn(events: DataFrame): DataFrame = {
    val daily = events.groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(Guards.one).orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg(sum(col("n")).as("total"))
    val cutoff = Guards.requireBounded(daily, 100000L,
        "sample_holdout_temporal calendar spine")
      .crossJoin(broadcast(tot))
      .withColumn("run", sum(col("n")).over(w))
      .filter(col("run") * 5 >= col("total") * 4)
      .agg(min(col("d")).as("cut"))
    events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .crossJoin(broadcast(cutoff))
      .groupBy("user_id")
      .agg(count(when(col("d") < col("cut"), 1)).as("n_train"),
        count(when(col("d") >= col("cut"), 1)).as("n_test"))
      .withColumn("in_both", col("n_train") > 0 && col("n_test") > 0)
  }

  def sampleHoldoutTemporal(s: SparkSession, dir: String): DataFrame =
    sampleHoldoutTemporalOn(Tables.events(s, dir)).orderBy("user_id")

  /** L20m: classical additive seasonal decomposition (the X-11 /
    * `decompose()` shape: Y = trend + seasonal + residual) of the
    * daily revenue series —
    *
    *  - trend: centered 7-day moving average, emitted only where the
    *    frame is complete (the classical edge rule);
    *  - seasonal: per-weekday mean of the detrended series (weekday
    *    spelled as days-since-a-fixed-Monday mod 7 — engine-portable,
    *    unlike dayofweek()'s engine-specific numbering);
    *  - residual: what's left.
    *
    * All integer cents; the two divisions are signed TRUNCATING
    * integer division (Spark `div` ≡ DuckDB `//`, both toward zero —
    * verified on negatives), so no float enters the pipeline.
    *
    * Scale shape: one day-keyed rollup shuffles the facts; everything
    * after lives on the DAY relation (bounded by the calendar span,
    * the day-spine precedent) — the global-order window is over that
    * bounded series, and the weekday aggregate is a 7-row hash agg. */
  def tsDecomposeOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(to_date(col("ts")).as("d"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("d").agg(sum(col("cents")).as("v_cents"))
      .withColumn("dow",
        (datediff(col("d"), lit("1970-01-05")) % 7).cast("int"))
    val w7 = Window.partitionBy(Guards.one)
      .orderBy(col("d").asc).rowsBetween(-3, 3)
    val trended = Guards.requireBounded(daily, 100000L,
        "ts_decompose calendar spine")
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("s7", sum(col("v_cents")).over(w7))
      .withColumn("trend_cents", when(col("n7") === 7, expr("s7 div 7")))
      .withColumn("detr", col("v_cents") - col("trend_cents"))
    val seasonal = trended.where(col("detr").isNotNull)
      .groupBy("dow")
      .agg(expr("sum(detr) div count(1)").as("seasonal_cents"))
    trended.join(broadcast(seasonal), Seq("dow"), "left")
      .select(col("d"), col("dow"), col("v_cents"), col("trend_cents"),
        col("seasonal_cents"),
        (col("detr") - col("seasonal_cents")).as("resid_cents"))
      .orderBy("d")
  }

  def tsDecompose(s: SparkSession, dir: String): DataFrame =
    tsDecomposeOn(Tables.events(s, dir))

  /** L20x: trend/seasonality STRENGTH of the decomposition (Wang,
    * Smith & Hyndman 2006; the `feasts` feature set's F_T/F_S):
    *   F_T = max(0, 1 − Var(R)/Var(T+R)),
    *   F_S = max(0, 1 − Var(R)/Var(S+R))
    * — the one-number answers to "is there a real trend/weekly cycle
    * or is the decomposition fitting noise", the gate before anyone
    * trusts ts_forecast_naive's seasonal path. EXACT integers end to
    * end: with a shared n the variance RATIO equals the ratio of the
    * numerators n·Σx² − (Σx)², both in DECIMAL(38,0), so no float
    * variance ever materializes; one truncating DIV at the ppm
    * boundary, GREATEST(0, ·) for the noise-dominated case,
    * NULL-gated when a denominator variance is zero. Consumes
    * [[tsDecomposeOn]]'s complete-frame rows; everything after the
    * day-bounded rollup is 1-row arithmetic. */
  def tsSeasonalityStrengthOn(events: DataFrame): DataFrame = {
    val d = tsDecomposeOn(events).where(col("trend_cents").isNotNull)
      .select(col("resid_cents").as("r"),
        (col("seasonal_cents") + col("resid_cents")).as("sr"),
        (col("trend_cents") + col("resid_cents")).as("tr"))
    d.agg(count(lit(1)).as("n_days"),
        sum(col("r")).as("s_r"),
        sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("q_r"),
        sum(col("sr")).as("s_sr"),
        sum(expr("CAST(sr AS DECIMAL(38,0)) * sr")).as("q_sr"),
        sum(col("tr")).as("s_tr"),
        sum(expr("CAST(tr AS DECIMAL(38,0)) * tr")).as("q_tr"))
      .select(col("n_days"),
        expr("n_days * q_r - CAST(s_r AS DECIMAL(38,0)) * s_r").as("vr"),
        expr("n_days * q_sr - CAST(s_sr AS DECIMAL(38,0)) * s_sr").as("vsr"),
        expr("n_days * q_tr - CAST(s_tr AS DECIMAL(38,0)) * s_tr").as("vtr"))
      .select(col("n_days"),
        expr("""CAST(CASE WHEN vtr > 0 THEN
               |  greatest(0, 1000000 - vr * 1000000 DIV vtr)
               |END AS BIGINT)""".stripMargin).as("f_trend_ppm"),
        expr("""CAST(CASE WHEN vsr > 0 THEN
               |  greatest(0, 1000000 - vr * 1000000 DIV vsr)
               |END AS BIGINT)""".stripMargin).as("f_seasonal_ppm"))
  }

  def tsSeasonalityStrength(s: SparkSession, dir: String): DataFrame =
    tsSeasonalityStrengthOn(Tables.events(s, dir))

  /** L20m': seasonal-aware anomaly detection — [[anomalyMadOn]]'s
    * robust MAD flag applied to [[tsDecomposeOn]]'s RESIDUAL instead
    * of the raw series (the STL-anomaly recipe: a Friday spike is
    * normal seasonality, a Tuesday at Friday's level is the anomaly
    * the raw-value z-score misses). Residuals are integer cents; the
    * two medians run on the bounded day relation; thresholds reuse
    * the 3·1.4826 normal-consistency convention and the mad > 0
    * degenerate-scale guard; the gate is 2.5 robust σ (3.7065·MAD) —
    * tighter than anomaly_mad's raw-value 3σ because the residual is
    * already de-trended and de-seasonalized, so surviving deviations
    * carry more signal. */
  def tsAnomalyDecomposedOn(events: DataFrame): DataFrame = {
    val dec = tsDecomposeOn(events).where(col("resid_cents").isNotNull)
    val med = dec.agg(median(col("resid_cents")).as("med"))
    val wm = dec.crossJoin(broadcast(med))
    val mad = wm.select(abs(col("resid_cents") - col("med")).as("adev"))
      .agg(median(col("adev")).as("mad"))
    wm.crossJoin(broadcast(mad))
      .filter(col("mad") > 0 &&
        abs(col("resid_cents") - col("med")) > lit(3.7065) * col("mad"))
      .select(col("d"), col("v_cents"), col("resid_cents"),
        round(abs(col("resid_cents") - col("med")) /
          (lit(1.4826) * col("mad")), 4).as("rz"))
      .orderBy("d")
  }

  def tsAnomalyDecomposed(s: SparkSession, dir: String): DataFrame =
    tsAnomalyDecomposedOn(Tables.events(s, dir))

  /** Events allowed per (user, 2-minute window) before throttling. */
  val RateLimitN = 3

  /** L20o: rate-limit audit — the abuse/bot-throttle pass every event
    * pipeline runs before counting anything downstream: within each
    * (user, 2-minute window), the first [[RateLimitN]] events by
    * (ts, event_id) are allowed, the rest are throttled. The decision
    * is one row_number over the (user, window) key — in a stream this
    * exact shape is the flatMapGroupsWithState counter with window
    * eviction; the batch shadow here audits it per user: windows
    * touched, events seen, events a limiter would have dropped.
    * Window starts come from the same 2-minute bucketing the
    * streaming family uses (time_bucket ≡ Spark window().start). */
  def eventRateLimitOn(events: DataFrame, limit: Int = RateLimitN): DataFrame = {
    require(limit >= 1, s"need limit >= 1, got $limit")
    val w = Window
      .partitionBy(col("user_id"), col("win"))
      .orderBy(col("tus").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"),
        window(col("ts"), "2 minutes").getField("start").as("win"))
      .withColumn("rn", row_number().over(w))
      .groupBy("user_id")
      .agg(countDistinct(col("win")).as("n_windows"),
        count(lit(1)).as("n_events"),
        sum(when(col("rn") > limit, 1L).otherwise(0L)).as("n_throttled"))
      .orderBy("user_id")
  }

  def eventRateLimit(s: SparkSession, dir: String): DataFrame =
    eventRateLimitOn(Tables.events(s, dir))

  /** L20p: position-based (U-shaped) multi-touch attribution — the
    * 40/20/40 rule marketing stacks run beside first/last-touch
    * ([[eventAttributionOn]] is last-touch): each purchase's credit
    * spreads over the touches since the user's previous purchase —
    * 40% to the first touch, 40% to the last, 20% split over the
    * middles (100% / 50-50 for 1- and 2-touch paths); purchases with
    * no preceding touch stay 'organic'.
    *
    * Credits are integer ppm (the middle split truncates — a path
    * loses < (n−2) ppm, never gains). Conversion paths are carved by
    * a purchases-before running count over the ONE user-keyed
    * shuffle; the per-path rank/size windows share the (user, conv)
    * partitioning. Every window is keyed by real data — the 100 TB
    * shape is the same as sessionization. */
  def eventAttributionPositionOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus").asc, col("event_id").asc)
    val marked = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"), col("event_type"))
      .withColumn("p_before",
        coalesce(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      // Round 12 (optimization): touches and purchases are each read
      // twice (credit join + organic anti-join), re-running this
      // user-keyed running-sum WINDOW over the full fact stream 4x —
      // one checkpoint, four reads.
      .localCheckpoint(true)
    val touches = marked.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), (col("p_before") + 1).as("conv"),
        col("tus"), col("event_id"), col("event_type"))
    val purchases = marked.filter(col("event_type") === "purchase")
      .select(col("user_id"), (col("p_before") + 1).as("conv"))
    val wt = Window.partitionBy("user_id", "conv")
      .orderBy(col("tus").asc, col("event_id").asc)
    val wn = Window.partitionBy("user_id", "conv")
    val credited = touches.join(purchases, Seq("user_id", "conv"))
      .withColumn("t_rn", row_number().over(wt))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("credit_ppm",
        when(col("n") === 1, 1000000L)
          .when(col("n") === 2, 500000L)
          .when(col("t_rn") === 1 || col("t_rn") === col("n"), 400000L)
          .otherwise(expr("200000L div (n - 2)")))
    val attributed = credited.groupBy(col("event_type").as("channel"))
      .agg(count(lit(1)).as("n_contribs"),
        sum(col("credit_ppm")).as("credit_ppm"))
    val organic = purchases
      .join(touches.select("user_id", "conv").distinct(),
        Seq("user_id", "conv"), "left_anti")
      .agg(count(lit(1)).as("n_contribs"),
        (count(lit(1)) * 1000000L).as("credit_ppm"))
      .select(lit("organic").as("channel"), col("n_contribs"),
        col("credit_ppm"))
    attributed.unionByName(organic)
      .filter(col("n_contribs") > 0).orderBy("channel")
  }

  def eventAttributionPosition(s: SparkSession, dir: String): DataFrame =
    eventAttributionPositionOn(Tables.events(s, dir))

  /** Half-life for [[eventAttributionDecayOn]], in whole days. */
  val DecayHalflifeDays = 3L

  /** L20s: exponential time-decay multi-touch attribution — the third
    * credit model beside last-touch ([[eventAttributionOn]]) and
    * U-shaped ([[eventAttributionPositionOn]]): a touch's credit
    * halves for every [[DecayHalflifeDays]] days between it and the
    * conversion, so recent touches dominate without zeroing the
    * early-funnel ones. Same journey model as the U-shaped op (a
    * journey = the touches between consecutive purchases, keyed by
    * the running purchase count).
    *
    * Decay is quantized to WHOLE half-lives so the weights stay exact
    * integers: w_micro = 10⁶ >> (age_days div H) — a floor division
    * by a power of two that both engines replay bit-for-bit (the
    * dyadic-EWMA discipline, no float pow). Credit normalizes per
    * journey: credit_ppm = w·10⁶ div Σw, integral DIV on non-negative
    * operands; a journey whose touches have ALL decayed to zero
    * weight credits nothing (gated, no division by zero). Shape: the
    * same two user-keyed windows and one (user, conv) equi-join as
    * the position model — nothing new crosses the wire. */
  def eventAttributionDecayOn(events: DataFrame,
      halflifeDays: Long = DecayHalflifeDays): DataFrame = {
    require(halflifeDays >= 1, s"need halflifeDays >= 1, got $halflifeDays")
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus").asc, col("event_id").asc)
    val marked = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"), col("event_type"))
      .withColumn("p_before",
        coalesce(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      // Round 12 (optimization): same 4-reference window dedup as
      // the position model above.
      .localCheckpoint(true)
    val touches = marked.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), (col("p_before") + 1).as("conv"),
        col("tus"), col("event_id"), col("event_type"))
    val purchases = marked.filter(col("event_type") === "purchase")
      .select(col("user_id"), (col("p_before") + 1).as("conv"),
        col("tus").as("p_tus"))
    val wn = Window.partitionBy("user_id", "conv")
    val credited = touches.join(purchases, Seq("user_id", "conv"))
      .withColumn("age_days", expr("(p_tus - tus) div 86400000000"))
      .withColumn("w_micro", expr(
        s"shiftright(1000000L, CAST(least(age_days div $halflifeDays, 62) AS INT))"))
      .withColumn("tot", sum(col("w_micro")).over(wn))
      .filter(col("tot") > 0)
      .withColumn("credit_ppm", expr("w_micro * 1000000 div tot"))
    val attributed = credited.groupBy(col("event_type").as("channel"))
      .agg(count(lit(1)).as("n_contribs"),
        sum(col("credit_ppm")).as("credit_ppm"))
    val organic = purchases
      .join(touches.select("user_id", "conv").distinct(),
        Seq("user_id", "conv"), "left_anti")
      .agg(count(lit(1)).as("n_contribs"),
        (count(lit(1)) * 1000000L).as("credit_ppm"))
      .select(lit("organic").as("channel"), col("n_contribs"),
        col("credit_ppm"))
    attributed.unionByName(organic)
      .filter(col("n_contribs") > 0).orderBy("channel")
  }

  def eventAttributionDecay(s: SparkSession, dir: String): DataFrame =
    eventAttributionDecayOn(Tables.events(s, dir))

  /** L20n: Markov-chain stationary distribution of the event-type
    * transition matrix — the steady-state "where do journeys spend
    * their time" summary on top of [[eventTransitionsOn]]'s pairwise
    * counts (the same power-iteration-to-fixpoint shape PageRank
    * runs on the web graph, here on the tiny behavioral chain).
    *
    * Eight unrolled multiplication rounds (the quality_logreg
    * precedent: fixed iteration count, every round a plan stage, the
    * oracle replays each as a CTE), all in integer ppm: each term
    * πᵢ·c(i,j) div r(i) truncates BEFORE the order-free integer sum,
    * so engines agree bit-for-bit; the ppm lost to truncation per
    * round is the documented price (Σπ drifts a few ppm under 10⁶,
    * never over). The transition relation is |types|² rows — every
    * join is a broadcast; the ONE fact-sized shuffle is the lead()
    * window building the pairs, shared with event_transitions.
    *
    * The chain is restricted to states with outgoing transitions
    * (mass flowing to a sink-only state would vanish next round);
    * on the gate corpus all five types transition both ways. The
    * empirical visit share (emp_ppm) rides along — stationary vs
    * empirical is the "is the chain mixing" diagnostic. */
  def eventMarkovStationaryOn(events: DataFrame, iters: Int = 8): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val t = trans
      .join(trans.groupBy("src").agg(sum(col("n")).as("r")), "src")
      .localCheckpoint(true) // referenced every round: keep plans flat
    val states = t.select(col("src").as("state")).distinct()
    var pi = states
      .crossJoin(broadcast(states.agg(count(lit(1)).as("ns"))))
      .select(col("state"), expr("1000000L div ns").as("pi_ppm"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      pi = t.join(pi, col("src") === col("state"))
        .select(col("dst"), expr("(pi_ppm * n) div r").as("m"))
        .groupBy("dst").agg(sum(col("m")).as("pi_ppm"))
        .withColumnRenamed("dst", "state")
        .localCheckpoint(true)
    }
    val total = events.agg(count(lit(1)).as("tot"))
    val emp = events.groupBy(col("event_type").as("state"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .select(col("state"), expr("(cnt * 1000000L) div tot").as("emp_ppm"))
    pi.join(emp, Seq("state"))
      .select(col("state"), col("pi_ppm"), col("emp_ppm"))
      .orderBy("state")
  }

  def eventMarkovStationary(s: SparkSession, dir: String): DataFrame =
    eventMarkovStationaryOn(Tables.events(s, dir))

  /** L20u: absorption analysis of the journey chain (Kemeny & Snell
    * 1960 ch. III: the fundamental matrix N = (I−Q)⁻¹, here its
    * truncated Neumann series) — treating `absorbing` ('purchase')
    * as the absorbing state, every transient event type gets
    *   t(v) ≈ expected further steps to conversion,
    *       t_k(v) = 1 + Σ_{b transient} q(v,b)·t_{k−1}(b), and
    *   a(v) ≈ probability of converting within the horizon,
    *       a_k(v) = q(v,abs) + Σ_{b transient} q(v,b)·a_{k−1}(b)
    * — the funnel readout "how far is each touchpoint from purchase
    * and what share ever arrives". Truncation at `iters` terms is the
    * documented semantics: exact for the k-step horizon, a lower
    * bound on the untruncated values (mass still in play after k
    * steps contributes 0). Exact integers: t in milli, a in ppm, one
    * floor DIV by the row total per state per round, replayed by the
    * oracle's unrolled CTEs. Censoring: each user's final event has
    * no successor, so row totals condition on the walk continuing; a
    * type observed only as a destination is a censored sink
    * (contributes 0 to both recursions) — both shared with the
    * oracle.
    *
    * Shape: ONE user-keyed lead window builds the transition counts
    * (the event_markov_stationary substrate), then every round is
    * arithmetic on the ≤|vocab|² checkpointed count relation —
    * nothing rescans facts, rounds are constant-size joins. */
  def eventAbsorptionOn(events: DataFrame, absorbing: String = "purchase",
      iters: Int = 8): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .filter(col("dst").isNotNull && col("event_type") =!= absorbing)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val t = trans.join(trans.groupBy("src").agg(sum(col("n")).as("r")), "src")
      .localCheckpoint(true) // referenced every round: keep plans flat
    var cur = t.select(col("src").as("state")).distinct()
      .select(col("state"), lit(0L).as("t_milli"), lit(0L).as("a_ppm"))
    for (_ <- 1 to iters) {
      cur = t.join(cur.select(col("state").as("dst"),
          col("t_milli").as("tb"), col("a_ppm").as("ab")), Seq("dst"), "left")
        .select(col("src"), col("r"), col("n"), col("dst"),
          coalesce(col("tb"), lit(0L)).as("tb"),
          coalesce(col("ab"), lit(0L)).as("ab"))
        .groupBy(col("src"), col("r"))
        .agg(sum(when(col("dst") =!= absorbing, col("n") * col("tb"))
            .otherwise(0L)).as("st"),
          sum(when(col("dst") === absorbing, col("n") * lit(1000000L))
            .otherwise(col("n") * col("ab"))).as("sa"))
        .select(col("src").as("state"),
          (lit(1000L) + expr("st DIV r")).as("t_milli"),
          expr("sa DIV r").as("a_ppm"))
      // no per-round checkpoint: 8 lazy rounds against the one
      // checkpointed count relation (see eventMarkovAttributionOn)
    }
    cur.orderBy("state")
  }

  def eventAbsorption(s: SparkSession, dir: String): DataFrame =
    eventAbsorptionOn(Tables.events(s, dir))

  /** The corpus transient-channel vocabulary for
    * [[eventMarkovAttributionOn]] — pinned (shared with the oracle's
    * generated removal runs) rather than runtime-discovered. */
  val MarkovChannels: Seq[String] = Seq("click", "error", "signup", "view")

  /** L20w: Markov removal-effect attribution (Anderl, Becker, von
    * Wangenheim & Schumann 2014/2016 — the data-driven alternative to
    * position rules): a channel's credit is how much the chain's
    * start→conversion probability DROPS when the channel is deleted
    * and walks entering it are LOST (not re-routed — Anderl's removal
    * semantics: row totals keep the original denominator). The chain
    * has a virtual '#start' (each user's first event), the event
    * types as transient states, 'purchase' absorbing, and an '#end'
    * sink for last events (censoring mass is real — without it every
    * state converts eventually and removal effects vanish).
    *
    * Each of the 1 + |channels| absorption runs is the
    * [[eventAbsorptionOn]] recursion (a_ppm only), `iters` unrolled
    * exact-integer rounds on the checkpointed ≤(V+2)² transition
    * relation; a removal run filters src ≠ c and lets the
    * LEFT-join-coalesce-0 zero out mass entering c. Removal
    * monotonicity (a_removed ≤ a_full at every round, floors
    * preserved) is asserted in-spec, not clamped. Credit shares
    * normalize once at the end (milli, NULL when no channel has any
    * effect). Everything after the one lead-window pass is
    * vocabulary-bounded arithmetic. */
  def eventMarkovAttributionOn(events: DataFrame,
      channels: Seq[String] = MarkovChannels,
      absorbing: String = "purchase", iters: Int = 8): DataFrame = {
    require(channels.nonEmpty && iters >= 1,
      s"need channels + iters >= 1, got $channels, $iters")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val seq0 = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rk", row_number().over(w))
      .withColumn("dst", lead(col("event_type"), 1).over(w))
    val startT = seq0.filter(col("rk") === 1)
      .groupBy(lit("#start").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    val midT = seq0
      .select(col("event_type").as("src"),
        coalesce(col("dst"), lit("#end")).as("dst"))
      .filter(col("src") =!= absorbing)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val trans = startT.unionByName(midT)
    val t = trans.join(trans.groupBy("src").agg(sum(col("n")).as("r")), "src")
      .localCheckpoint(true) // read by every round of every run
    def absorb(excluded: Option[String]): DataFrame = {
      // NO per-round checkpoint: the rounds chain lazily against the
      // ONE checkpointed transition relation — the per-run plan is 8
      // joins over a ≤(V+2)²-row scan, and eagerly materializing each
      // ≤V-row iterate cost ~0.1 s × rounds × (1+|channels|) runs
      // (measured 4.6 s for this query at sf0.1, nearly all of it
      // checkpoint overhead on single-digit-row relations).
      val tt = excluded.map(c => t.filter(col("src") =!= c)).getOrElse(t)
      var cur = tt.select(col("src").as("state")).distinct()
        .select(col("state"), lit(0L).as("a_ppm"))
      for (_ <- 1 to iters) {
        cur = tt.join(cur.select(col("state").as("dst"),
            col("a_ppm").as("ab")), Seq("dst"), "left")
          .groupBy(col("src"), col("r"))
          .agg(sum(when(col("dst") === absorbing, col("n") * lit(1000000L))
            .otherwise(col("n") * coalesce(col("ab"), lit(0L)))).as("sa"))
          .select(col("src").as("state"), expr("sa DIV r").as("a_ppm"))
      }
      cur.filter(col("state") === "#start").select(col("a_ppm"))
    }
    // The 1 + |channels| runs are INDEPENDENT once `t` is
    // checkpointed, and each is a deep lazy chain (iters joins) whose
    // per-action optimizer+codegen cost dominates its single-digit-row
    // data. Materializing each run's 1-row result as a CONCURRENT job
    // chain (the linkage-ladder/semantic-sweep fan) keeps every
    // optimizer pass small and overlaps the runs; the union below then
    // assembles checkpointed 1-row relations. Measured at sf0.1:
    // 6.5 s -> ~1 s for the default 4-channel run.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = (None +: channels.map(Some(_))).map { ex =>
      Future(absorb(ex).localCheckpoint(true))
    }.map(Await.result(_, Duration.Inf))
    val full = runs.head.select(col("a_ppm").as("p_full_ppm"))
    val eff = channels.zip(runs.tail).map { case (c, r) =>
        r.select(lit(c).as("channel"), col("a_ppm").as("p_removed_ppm"))
      }.reduce(_ unionByName _)
      .crossJoin(broadcast(full))
      .withColumn("removal_effect_ppm",
        col("p_full_ppm") - col("p_removed_ppm"))
      .localCheckpoint(true) // totals + the share pass
    val tot = eff.agg(sum(col("removal_effect_ppm")).as("te"))
    eff.crossJoin(broadcast(tot))
      .select(col("channel"), col("p_full_ppm"), col("p_removed_ppm"),
        col("removal_effect_ppm"),
        expr("""CAST(CASE WHEN te > 0
               |  THEN removal_effect_ppm * 1000 DIV te
               |END AS BIGINT)""".stripMargin).as("attribution_milli"))
      .orderBy("channel")
  }

  def eventMarkovAttribution(s: SparkSession, dir: String): DataFrame =
    eventMarkovAttributionOn(Tables.events(s, dir))

  /** L20m: Welch's unequal-variance t-test on per-user total spend
    * between the two deterministic id-hash arms — the continuous-
    * outcome sibling of [[eventAbTestOn]]'s two-proportion z. After
    * the per-user rollup the whole statistic is arithmetic on SIX
    * integers (n, S=Σspend, Q=Σspend² per arm), so it is spelled
    * exactly: with A = S₀n₁ − S₁n₀ and Uᵢ = nᵢQᵢ − Sᵢ² (both
    * non-negative by Cauchy-Schwarz),
    *   t² = A²(n₀−1)(n₁−1) / [U₀n₁²(n₁−1) + U₁n₀²(n₀−1)]
    * emitted as t2_milli via one integral DIV in DECIMAL(38,0) —
    * exact while A²·n² < 10^38 (holds through sf10; at true 100 TB
    * the identical plan runs the closed form in DOUBLE, the two-
    * shuffle shape is unchanged). significant = t2_milli > 3841
    * (t² ~ χ²₁ at these df). Degenerate gates (an arm with < 2 users
    * or both variances zero) yield NULL. Shape: one map-side-combined
    * user rollup, a 2-row arm aggregate, then single-row arithmetic —
    * identical scaling story to the z-test. */
  def eventTtestWelchOn(events: DataFrame): DataFrame = {
    val users = events
      .select(col("user_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(sum(col("cents")).as("spend"))
      .select((col("user_id") % 2).cast("int").as("variant"), col("spend"))
    val arms = users.groupBy("variant").agg(
      count(lit(1)).as("n"),
      sum(col("spend")).cast("decimal(38,0)").as("s"),
      sum(col("spend").cast("decimal(38,0)") * col("spend"))
        .cast("decimal(38,0)").as("q"))
    val a = arms.filter(col("variant") === 0)
      .select(col("n").as("n0"), col("s").as("s0"), col("q").as("q0"))
    val b = arms.filter(col("variant") === 1)
      .select(col("n").as("n1"), col("s").as("s1"), col("q").as("q1"))
    a.crossJoin(b) // both sides are single-row reductions
      .select(col("n0"), col("n1"),
        expr("CAST(s0 AS BIGINT)").as("spend0"),
        expr("CAST(s1 AS BIGINT)").as("spend1"),
        expr("CAST(s0 * 1000 DIV n0 AS BIGINT)").as("mean0_milli"),
        expr("CAST(s1 * 1000 DIV n1 AS BIGINT)").as("mean1_milli"),
        expr("""CASE WHEN n0 >= 2 AND n1 >= 2
               |  AND (n0 * q0 - s0 * s0) * n1 * n1 * (n1 - 1)
               |    + (n1 * q1 - s1 * s1) * n0 * n0 * (n0 - 1) > 0
               |THEN CAST(
               |  (s0 * n1 - s1 * n0) * (s0 * n1 - s1 * n0)
               |    * (n0 - 1) * (n1 - 1) * 1000
               |  DIV ((n0 * q0 - s0 * s0) * n1 * n1 * (n1 - 1)
               |     + (n1 * q1 - s1 * s1) * n0 * n0 * (n0 - 1))
               |  AS BIGINT) END""".stripMargin).as("t2_milli"))
      .withColumn("significant", col("t2_milli") > 3841L)
  }

  def eventTtestWelch(s: SparkSession, dir: String): DataFrame =
    eventTtestWelchOn(Tables.events(s, dir))

  /** L20n: one-way ANOVA across event types on per-event value — "do
    * the k categories differ in mean?", the k-group generalization of
    * [[eventTtestWelchOn]]. The sums of squares are spelled in exact
    * cents² with one integral DIV per term (every numerator is
    * nᵢQᵢ − Sᵢ² ≥ 0, so Spark DIV and DuckDB // agree):
    *   SSW = Σᵢ (nᵢQᵢ − Sᵢ²) div nᵢ,   SST = (nQ − S²) div n,
    *   SSB = SST − SSW,   F = [SSB/(k−1)] / [SSW/(n−k)]
    * with F emitted as f_milli through DECIMAL(38,0) (exact while
    * SSB·n < 10^35; past that the closed form runs in DOUBLE on the
    * same two-level aggregation). Truncation is applied identically
    * on both engines, so the ≤1-cent²-per-group floor loss is part of
    * the pinned semantics, not error. Shape: one map-side-combined
    * per-type rollup (k rows), then single-row arithmetic over the k
    * partials — the global n/S/Q are the SUMS of the per-type ones,
    * not a second fact scan. */
  def eventAnovaOn(events: DataFrame): DataFrame = {
    val groups = events
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("cents")).cast("decimal(38,0)").as("s"),
        sum(col("cents").cast("decimal(38,0)") * col("cents"))
          .cast("decimal(38,0)").as("q"))
    groups.agg(
        count(lit(1)).cast("long").as("k"),
        sum(col("n")).as("n"),
        sum(col("s")).cast("decimal(38,0)").as("st"),
        sum(col("q")).cast("decimal(38,0)").as("qt"),
        sum(expr("(n * q - s * s) DIV n")).cast("decimal(38,0)").as("ssw"))
      .select(col("k"), col("n"),
        expr("CAST(ssw AS BIGINT)").as("ssw_cents2"),
        expr("CAST((n * qt - st * st) DIV n - ssw AS BIGINT)")
          .as("ssb_cents2"))
      .withColumn("f_milli",
        expr("""CASE WHEN ssw_cents2 > 0 AND n > k AND k > 1 THEN
               |  CAST(CAST(ssb_cents2 AS DECIMAL(38,0)) * (n - k) * 1000
               |    DIV (CAST(ssw_cents2 AS DECIMAL(38,0)) * (k - 1))
               |    AS BIGINT) END""".stripMargin))
  }

  def eventAnova(s: SparkSession, dir: String): DataFrame =
    eventAnovaOn(Tables.events(s, dir))

  /** L20o: difference-in-differences readout — the quasi-experimental
    * design for a treatment that switches ON at a known date: arms by
    * the deterministic id hash, periods split at the corpus midpoint
    * (2024-01-16, pinned constant — a real deployment passes its
    * launch date), outcome = purchase conversion among users ACTIVE
    * in the cell. The 2×2 cell table is four (n, x) integer pairs;
    * each conversion rate is an exact ppm DIV and
    *   did_ppm = (crₜ,post − crₜ,pre) − (cr꜀,post − cr꜀,pre)
    * is plain BIGINT subtraction — no float anywhere. Parallel-trends
    * diagnostics (the pre-period gap) ship in the same row. Shape:
    * one user×period rollup (map-side combined), a 4-row cell
    * aggregate, then single-row arithmetic — the same collapse
    * pattern as the other experiment readouts. */
  def eventDidOn(events: DataFrame): DataFrame = {
    val cells = events
      .select(col("user_id"),
        (col("ts") >= lit("2024-01-16").cast("timestamp")).cast("int")
          .as("post"),
        (col("event_type") === "purchase").cast("long").as("isp"))
      .groupBy("user_id", "post")
      .agg(max(col("isp")).as("converted"))
      .select((col("user_id") % 2).cast("int").as("treated"),
        col("post"), col("converted"))
      .groupBy("treated", "post")
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("x"))
    val wide = cells.agg(
      sum(when(col("treated") === 1 && col("post") === 0, col("n"))).as("n_t_pre"),
      sum(when(col("treated") === 1 && col("post") === 0, col("x"))).as("x_t_pre"),
      sum(when(col("treated") === 1 && col("post") === 1, col("n"))).as("n_t_post"),
      sum(when(col("treated") === 1 && col("post") === 1, col("x"))).as("x_t_post"),
      sum(when(col("treated") === 0 && col("post") === 0, col("n"))).as("n_c_pre"),
      sum(when(col("treated") === 0 && col("post") === 0, col("x"))).as("x_c_pre"),
      sum(when(col("treated") === 0 && col("post") === 1, col("n"))).as("n_c_post"),
      sum(when(col("treated") === 0 && col("post") === 1, col("x"))).as("x_c_post"))
    wide.select(col("*"),
        expr("CAST(x_t_pre * 1000000 DIV n_t_pre AS BIGINT)").as("cr_t_pre_ppm"),
        expr("CAST(x_t_post * 1000000 DIV n_t_post AS BIGINT)").as("cr_t_post_ppm"),
        expr("CAST(x_c_pre * 1000000 DIV n_c_pre AS BIGINT)").as("cr_c_pre_ppm"),
        expr("CAST(x_c_post * 1000000 DIV n_c_post AS BIGINT)").as("cr_c_post_ppm"))
      .withColumn("pretrend_gap_ppm",
        col("cr_t_pre_ppm") - col("cr_c_pre_ppm"))
      .withColumn("did_ppm",
        (col("cr_t_post_ppm") - col("cr_t_pre_ppm"))
          - (col("cr_c_post_ppm") - col("cr_c_pre_ppm")))
  }

  def eventDid(s: SparkSession, dir: String): DataFrame =
    eventDidOn(Tables.events(s, dir))

  /** L14c: snapshot diff — classify every entity's state change
    * between two cut times (the table-diff a CDC pipeline publishes
    * when it has snapshots, not a log; complements
    * `stream_cdc_replay`'s log-apply direction). State at a cut = the
    * entity's LAST event_type at or before it, tie-broken by
    * event_id via one lexicographic struct max — so BOTH snapshots
    * come out of a single per-user aggregate over one scan
    * (`max(when(ts <= t1, struct))` and `max(struct)`), no window,
    * no self-join. insert = absent at t1; update/unchanged by state
    * compare; deletes can't occur in an append-only log (a real
    * deployment feeds tombstones through the same classify). Scale:
    * one map-side-combined shuffle on user_id — the two struct maxes
    * combine per-partition, so the shuffle carries 2 small structs
    * per user regardless of corpus size. */
  def cdcSnapshotDiffOn(events: DataFrame, t1: Column, t2: Column): DataFrame =
    events.filter(col("ts") <= t2)
      .groupBy("user_id")
      .agg(
        max(when(col("ts") <= t1,
          struct(col("ts"), col("event_id"), col("event_type")))).as("o"),
        max(struct(col("ts"), col("event_id"), col("event_type"))).as("n"))
      .select(col("user_id"),
        col("o.event_type").as("old_state"),
        col("n.event_type").as("new_state"))
      .withColumn("change_type",
        when(col("old_state").isNull, "insert")
          .when(col("old_state") === col("new_state"), "unchanged")
          .otherwise("update"))
      .orderBy("user_id")

  def cdcSnapshotDiff(s: SparkSession, dir: String): DataFrame =
    cdcSnapshotDiffOn(Tables.events(s, dir),
      lit("2024-01-10").cast("timestamp"), lit("2024-01-20").cast("timestamp"))

  /** L20v: incremental aggregate maintenance — the nightly
    * materialized-view contract (Gupta & Mumick 1995's
    * self-maintainable SUM/COUNT case): the (event_type, day) rollup
    * STATE from everything at cut t1, plus the DELTA rollup over
    * (t1, t2], composed by a full-outer coalesce-sum merge; the
    * `matches` audit column checks composed == full recompute at t2
    * row for row — the incremental-equals-batch theorem shipped as a
    * checked relation (the graph_cc_incremental discipline). At
    * 100 TB the nightly cost tracks the DELTA: the state table is
    * read, not rebuilt; SUM/COUNT are self-maintainable so no base
    * rescan; the merge keys on the same (type, day) the rollups
    * shuffle on. */
  def aggIncrementalRollupOn(events: DataFrame, t1: Column,
      t2: Column): DataFrame = {
    def rollup(df: DataFrame) = df
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")),
          lit(0L)).as("cents"))
    val state = rollup(events.filter(col("ts") <= t1))
    val delta = rollup(events.filter(col("ts") > t1 && col("ts") <= t2))
    val batch = rollup(events.filter(col("ts") <= t2))
    state.select(col("event_type"), col("d"), col("n").as("sn"),
        col("cents").as("sc"))
      .join(delta.select(col("event_type"), col("d"), col("n").as("dn"),
        col("cents").as("dc")), Seq("event_type", "d"), "full_outer")
      .select(col("event_type"), col("d"),
        coalesce(col("sn"), lit(0L)).as("state_n"),
        coalesce(col("dn"), lit(0L)).as("delta_n"),
        (coalesce(col("sn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_composed"),
        (coalesce(col("sc"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .as("cents_composed"))
      .join(batch.select(col("event_type"), col("d"), col("n").as("n_batch"),
        col("cents").as("cents_batch")), Seq("event_type", "d"))
      .withColumn("matches", col("n_composed") === col("n_batch") &&
        col("cents_composed") === col("cents_batch"))
      .orderBy("event_type", "d")
  }

  def aggIncrementalRollup(s: SparkSession, dir: String): DataFrame =
    aggIncrementalRollupOn(Tables.events(s, dir),
      lit("2024-01-10").cast("timestamp"), lit("2024-01-20").cast("timestamp"))

  /** L20p: time-boxed funnel — [[eventFunnelOn]]'s first-touch chain
    * with a CONVERSION WINDOW: step k counts only when its first
    * qualifying event lands strictly after step k−1's time and within
    * `windowDays` of it (the "clicked within 3 days of the view"
    * semantics every growth dashboard defaults to; the plain funnel
    * is the windowDays=∞ limit and always an upper bound). Each step
    * is ONE filtered per-user min-aggregate chained by an equi-join
    * on user_id — k map-side-combined shuffles all keyed on the same
    * column (co-partitioned end to end at scale); the readout
    * collapses to k single-row counts unpivoted with exact ppm
    * conversion. Timestamps compare raw (µs both engines) and the
    * window bound is a calendar INTERVAL — no epoch arithmetic. */
  def eventFunnelWindowOn(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      windowDays: Int = 3): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val s0 = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("ts")).as("t"))
    val times = steps.tail.foldLeft(Seq(s0)) { (acc, st) =>
      val prev = acc.last.select(col("user_id"), col("t").as("tp"))
      acc :+ events.filter(col("event_type") === st)
        .join(prev, "user_id")
        .filter(col("ts") > col("tp") &&
          col("ts") <= col("tp") + expr(s"INTERVAL $windowDays DAYS"))
        .groupBy("user_id").agg(min(col("ts")).as("t"))
    }
    val counts = times.zip(steps).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_idx"), lit(st).as("step"),
          col("n_users"))
    }.reduce(_ unionByName _)
    val first = counts.filter(col("step_idx") === 1)
      .select(col("n_users").as("n_first"))
    counts.crossJoin(broadcast(first)) // single-row scalar side
      .select(col("step_idx"), col("step"), col("n_users"),
        when(col("n_first") > 0,
          expr("n_users * 1000000 DIV n_first")).as("pct_ppm"))
      .orderBy("step_idx")
  }

  def eventFunnelWindow(s: SparkSession, dir: String): DataFrame =
    eventFunnelWindowOn(Tables.events(s, dir))

  /** L20q: uplift-by-segment readout with a Qini-style cumulative
    * curve (Radcliffe 2007): segments (a stable id-hash decile family
    * independent of the arm hash) each report treated/control
    * conversion and uplift_ppm = crₜ − cr꜀ (exact ppm DIVs), then
    * segments rank by uplift and accumulate the incremental-
    * conversions numerator incr_milli = (xₜn꜀ − x꜀nₜ)·1000 div n꜀ —
    * the curve a targeting policy reads to decide how deep to treat.
    * All integer; the per-segment relation is k rows, so the ranking
    * window is bounded and the only real shuffle is the one user
    * rollup. Segment key (user div 2) mod 5 stays orthogonal to the
    * user mod 2 arm split, so every cell is populated. */
  def eventUpliftOn(events: DataFrame): DataFrame = {
    val users = events
      .select(col("user_id"),
        (col("event_type") === "purchase").cast("long").as("isp"))
      .groupBy("user_id").agg(max(col("isp")).as("converted"))
      .select((expr("user_id div 2") % 5).cast("int").as("segment"),
        (col("user_id") % 2).cast("int").as("treated"), col("converted"))
    val cells = users.groupBy("segment").agg(
      sum(when(col("treated") === 1, 1L).otherwise(0L)).as("n_t"),
      sum(when(col("treated") === 1, col("converted"))).as("x_t"),
      sum(when(col("treated") === 0, 1L).otherwise(0L)).as("n_c"),
      sum(when(col("treated") === 0, col("converted"))).as("x_c"))
    val w = Window.partitionBy(Guards.one).orderBy(
      expr("CASE WHEN n_t > 0 AND n_c > 0 THEN " +
        "x_t * 1000000 DIV n_t - x_c * 1000000 DIV n_c END").desc_nulls_last,
      col("segment").asc)
    Guards.requireBounded(cells, 64L, "event_uplift segment cells")
      .withColumn("uplift_ppm",
        expr("""CASE WHEN n_t > 0 AND n_c > 0 THEN
               |  x_t * 1000000 DIV n_t - x_c * 1000000 DIV n_c
               |END""".stripMargin))
      .withColumn("rnk", row_number().over(w))
      .withColumn("incr_milli",
        expr("CASE WHEN n_c > 0 THEN (x_t * n_c - x_c * n_t) * 1000 DIV n_c END"))
      .withColumn("cum_incr_milli",
        sum(col("incr_milli")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select("segment", "n_t", "x_t", "n_c", "x_c", "uplift_ppm", "rnk",
        "incr_milli", "cum_incr_milli")
      .orderBy("rnk")
  }

  def eventUplift(s: SparkSession, dir: String): DataFrame =
    eventUpliftOn(Tables.events(s, dir))

  /** L20r: adstock / geometric carryover (Broadbent 1979, the
    * marketing-mix decay every media-effect model starts from):
    * today's effective exposure = Σ_{k=0..7} spend_{t−k}·λᵏ with
    * λ = ½, spelled EXACTLY as integer weights 2^(7−k) (so the
    * output is adstock × 2⁷ — no float decay chain, no recursion).
    * The recursive form y_t = x_t + λy_{t−1} is sequential; this
    * window-truncated closed form is its scale spelling: each daily
    * row EXPLODES into its ≤ 8 future carryover contributions
    * (map-side ×8) and ONE (type, day)-keyed sum folds them —
    * carryover-only days materialize automatically, no spine join.
    * Truncation error vs the infinite chain is ≤ λ⁸ < 0.4%. */
  def eventAdstockOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("event_type", "d").agg(sum(col("cents")).as("cents"))
    daily
      .select(col("event_type"), col("d"), col("cents"),
        explode(sequence(lit(0), lit(7))).as("k"))
      .select(col("event_type"), date_add(col("d"), col("k")).as("d"),
        (col("cents") * expr("shiftleft(CAST(1 AS BIGINT), 7 - k)"))
          .as("contrib"),
        when(col("k") === 0, col("cents")).otherwise(0L).as("raw"))
      .groupBy("event_type", "d")
      .agg(sum(col("contrib")).as("adstock_x128"),
        sum(col("raw")).as("cents_raw"))
      .orderBy("event_type", "d")
  }

  def eventAdstock(s: SparkSession, dir: String): DataFrame =
    eventAdstockOn(Tables.events(s, dir))

  /** L20s: moving-average crossover signals (the golden/death-cross
    * trading rule, here as the generic trend-shift detector for any
    * daily series): short (3-day) vs long (7-day) trailing means in
    * exact scaled integers — sums over COMPLETE row frames only
    * (first 6 days emit no signal), means kept as sum×lcm-scaled
    * integers so the comparison s·7 vs l·3 needs no division at all.
    * cross_up fires when short−long flips ≤0 → >0 between
    * consecutive days. One day-spine-free window chain per
    * event_type; at scale each series windows independently. */
  def tsSmaCrossOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("event_type", "d").agg(sum(col("cents")).as("cents"))
    val w = Window.partitionBy("event_type").orderBy("d")
    val s3 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-2, 0)
    val s7 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-6, 0)
    daily
      .withColumn("rn", row_number().over(w))
      .withColumn("sum3", sum(col("cents")).over(s3))
      .withColumn("sum7", sum(col("cents")).over(s7))
      // diff in cents·21 units: sum3/3 − sum7/7 = (7·sum3 − 3·sum7)/21
      .withColumn("diff_x21",
        when(col("rn") >= 7, col("sum3") * 7 - col("sum7") * 3))
      .withColumn("prev_diff_x21", lag(col("diff_x21"), 1).over(w))
      .withColumn("cross_up",
        col("diff_x21") > 0 &&
          coalesce(col("prev_diff_x21") <= 0, lit(false)))
      .withColumn("cross_down",
        col("diff_x21") <= 0 &&
          coalesce(col("prev_diff_x21") > 0, lit(false)))
      .filter(col("diff_x21").isNotNull)
      .select("event_type", "d", "cents", "diff_x21",
        "cross_up", "cross_down")
      .orderBy("event_type", "d")
  }

  def tsSmaCross(s: SparkSession, dir: String): DataFrame =
    tsSmaCrossOn(Tables.events(s, dir))

  /** L20t: maximum drawdown — the peak-to-trough statistic on the
    * DAILY level series (the largest decline from any prior peak —
    * "how far below its best day has this stream fallen"): peak_t =
    * running max of daily cents, dd_t = cents_t − peak_t ≤ 0, answer
    * = min dd with its date (earliest day wins ties — pinned by the
    * (dd, d) rank). One ordered window chain per series + a 1-row
    * argmin — exact BIGINT cents end to end. (On a cumulative
    * non-negative revenue total the drawdown is identically 0; the
    * level series is the one with risk in it.) */
  def tsDrawdownOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("event_type", "d").agg(sum(col("cents")).as("cents"))
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = daily
      .withColumn("peak", max(col("cents")).over(w))
      .withColumn("dd", col("cents") - col("peak"))
    val pick = Window.partitionBy("event_type")
      .orderBy(col("dd").asc, col("d").asc)
    dd.withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("d").as("trough_day"),
        col("peak").as("peak_cents"), col("cents").as("trough_cents"),
        col("dd").as("max_drawdown_cents"))
      .orderBy("event_type")
  }

  def tsDrawdown(s: SparkSession, dir: String): DataFrame =
    tsDrawdownOn(Tables.events(s, dir))

  /** L20u: inter-arrival statistics per series — the burstiness /
    * health profile of an event stream (uniform? bursty? dying?):
    * consecutive gaps by (ts, event_id) order in exact microseconds
    * (unix_micros lag diff), summarized as count, mean (one integral
    * DIV), and p50/p90 under the catalog's pinned rank rule
    * idx = (m−1)·q_ppm div 10⁶ + 1. Two windows per series (the gap
    * lag and the gap rank) — series profile independently in
    * parallel at any scale. */
  def tsInterarrivalOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("tus", "event_id")
    val gaps = events
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
      .filter(col("gap_us").isNotNull)
    val rk = Window.partitionBy("event_type").orderBy("gap_us", "event_id")
    gaps
      .withColumn("rn", row_number().over(rk))
      // same sorted spec + unbounded frame => ONE WindowExec carries
      // both rn and m (no second whole-partition-buffering pass)
      .withColumn("m", count(lit(1)).over(rk.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy("event_type").agg(
        max(col("m")).as("n_gaps"),
        expr("sum(gap_us) DIV count(1)").as("mean_gap_us"),
        max(when(expr("rn = (m - 1) * 500000 div 1000000 + 1"),
          col("gap_us"))).as("p50_gap_us"),
        max(when(expr("rn = (m - 1) * 900000 div 1000000 + 1"),
          col("gap_us"))).as("p90_gap_us"))
      .orderBy("event_type")
  }

  def tsInterarrival(s: SparkSession, dir: String): DataFrame =
    tsInterarrivalOn(Tables.events(s, dir))

  /** L20v: Theil–Sen robust trend (Theil 1950; Sen 1968) — the median
    * of all pairwise slopes, the trend line one outlier day cannot
    * bend (vs agg_regression's OLS, where a single spike drags the
    * fit). Slopes are exact integers:
    * slope_micro = Δcents·10⁶ div Δdays (denominator positive by
    * x2 > x1; both engines truncate toward zero identically); the
    * median is the pinned rank pick over the per-series pair
    * relation. Pairs are day-grid pairs — n·(n−1)/2 per series with
    * n ≤ days-in-corpus, so the self-join is calendar-bounded, not
    * data-bounded (435 pairs per series on a 30-day corpus; at any
    * corpus scale the per-series pair count stays O(days²) — sample
    * days for multi-year spans). */
  def tsTheilsenOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("event_type", "d").agg(sum(col("cents")).as("cents"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).cast("long")
          .as("x"),
        col("cents").as("y"))
    val a = daily.select(col("event_type"), col("x").as("x1"),
      col("y").as("y1"))
    val b = daily.select(col("event_type"), col("x").as("x2"),
      col("y").as("y2"))
    val slopes = a.join(b, Seq("event_type"))
      .filter(col("x2") > col("x1"))
      .select(col("event_type"),
        expr("(y2 - y1) * 1000000 DIV (x2 - x1)").as("slope_micro"),
        col("x1"), col("x2"))
    val rk = Window.partitionBy("event_type")
      .orderBy("slope_micro", "x1", "x2")
    slopes
      .withColumn("rn", row_number().over(rk))
      // one WindowExec for rn + m (see tsInterarrivalOn)
      .withColumn("m", count(lit(1)).over(rk.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy("event_type").agg(
        max(col("m")).as("n_pairs"),
        max(when(expr("rn = (m - 1) * 500000 div 1000000 + 1"),
          col("slope_micro"))).as("slope_micro"))
      .withColumn("rising", col("slope_micro") > 0)
      .orderBy("event_type")
  }

  def tsTheilsen(s: SparkSession, dir: String): DataFrame =
    tsTheilsenOn(Tables.events(s, dir))

  /** L20w: Benford first-digit audit (Benford 1938; Nigrini's fraud
    * screen) — natural multi-scale amounts put digit d first with
    * probability log₁₀(1+1/d); fabricated or truncated data breaks
    * the curve, so the deviation profile is a standard data-quality /
    * fraud alarm. The expected shares ride in as SHARED ppm literals
    * (both engines compare against the identical integer table — no
    * runtime log10), observed shares are exact ppm DIVs, and the
    * signed per-digit deviation is plain subtraction. Zero-cent rows
    * have no first significant digit and are excluded by definition.
    * One map-side-combined 9-row rollup; the digit is substring(1,1)
    * of the decimal string — exact at any magnitude. */
  def eventBenfordOn(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    val expected = s.createDataFrame(Seq(
      ("1", 301030L), ("2", 176091L), ("3", 124939L), ("4", 96910L),
      ("5", 79181L), ("6", 66947L), ("7", 57992L), ("8", 51153L),
      ("9", 45757L))).toDF("digit", "exp_ppm")
    val obs = events
      .select(floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val tot = obs.agg(sum(col("n_obs")).as("n"))
    // Broadcast the RIGHT (buildable) side: Spark cannot broadcast the
    // preserved side of a left-outer join, so hinting `expected` was
    // silently ignored (HintErrorLogger). `obs` is <= 9 rows.
    expected.join(broadcast(obs), Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .crossJoin(broadcast(tot)) // 1-row scalar side
      .withColumn("obs_ppm", expr("n_obs * 1000000 DIV n"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .select("digit", "n_obs", "obs_ppm", "exp_ppm", "dev_ppm")
      .orderBy("digit")
  }

  def eventBenford(s: SparkSession, dir: String): DataFrame =
    eventBenfordOn(Tables.events(s, dir))

  /** L20x: state-machine conformance audit — validate the observed
    * per-user event transitions against a declared whitelist (the
    * process-mining "conformance checking" step; instrumentation
    * regressions and bot traffic both surface as illegal edges).
    * Transitions come from the same one-window lag shape as
    * event_transitions; the whitelist is a broadcast literal
    * relation, so the audit is one map-side-combined pair rollup +
    * one broadcast probe at any scale. Output: every observed edge
    * with its count and allowed flag, illegal edges first (the
    * triage ordering), then by volume. */
  def eventTransitionAuditOn(events: DataFrame,
      allowed: Seq[(String, String)] = Seq(
        ("signup", "view"), ("view", "view"), ("view", "click"),
        ("view", "error"), ("click", "view"), ("click", "purchase"),
        ("click", "click"), ("purchase", "view"), ("error", "view")))
      : DataFrame = {
    val s = events.sparkSession
    val wl = broadcast(s.createDataFrame(allowed)
      .toDF("src", "dst").withColumn("ok", lit(true)))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("dst"))
      .withColumn("src", lag(col("dst"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .join(wl, Seq("src", "dst"), "left")
      .withColumn("allowed", coalesce(col("ok"), lit(false)))
      .select("src", "dst", "n", "allowed")
      .orderBy(col("allowed").asc, col("n").desc, col("src"), col("dst"))
  }

  def eventTransitionAudit(s: SparkSession, dir: String): DataFrame =
    eventTransitionAuditOn(Tables.events(s, dir))

  /** Sequential pattern match with negation — the MATCH_RECOGNIZE /
    * CEP shape "signup, then FIRST purchase within 7 days, with NO
    * error in between", decided per user in exact epoch-microseconds.
    * Three chained window aggregates over ONE user-partitioned sort
    * (each refers to the previous column, all share the partitioning,
    * so Spark stacks WindowExecs on a single exchange): first-signup
    * time, first qualifying purchase inside the window, then the
    * negation witness strictly between them. One fact scan, one
    * shuffle on user_id; the 7-day bound is closed on the right
    * (ts ≤ s + 7d), the negation open on both sides — pinned so both
    * engines agree on boundary events. */
  def eventPatternMatchOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val d = events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("s",
        min(when(col("event_type") === "signup", col("tus"))).over(w))
      .withColumn("p",
        min(when(col("event_type") === "purchase" &&
          col("tus") > col("s") &&
          col("tus") <= col("s") + lit(604800000000L), col("tus"))).over(w))
      .withColumn("bad",
        max(when(col("event_type") === "error" &&
          col("tus") > col("s") && col("tus") < col("p"), 1L)
          .otherwise(0L)).over(w))
    d.groupBy("user_id")
      .agg(max(col("s")).as("s"), max(col("p")).as("p"),
        max(col("bad")).as("bad"))
      .filter(col("s").isNotNull && col("p").isNotNull && col("bad") === 0)
      .select(col("user_id"), col("s").as("ts_signup_us"),
        col("p").as("ts_purchase_us"),
        expr("(p - s) DIV 60000000").as("lag_min"))
      .orderBy("user_id")
  }

  def eventPatternMatch(s: SparkSession, dir: String): DataFrame =
    eventPatternMatchOn(Tables.events(s, dir))

  /** Shapley-value channel attribution (Shapley 1953; Zhao et al.
    * 2018, "Shapley Value Methods for Attribution Modeling in Online
    * Advertising"): each channel's conversion credit is its average
    * marginal contribution over all orderings of the channel set —
    * the game-theoretic answer to last-touch's recency bias. The
    * coalition value v(S) is the observed conversion rate (ppm) of
    * users whose EXACT distinct exposure set is S (the paper's
    * simplified data model); unobserved coalitions and the empty set
    * take v = 0 (users with no non-purchase exposure are excluded by
    * construction). The closed form runs on the full 2^n mask
    * lattice:
    *   phi_num(i) = SUM over S with i not in S of
    *     |S|! * (n-1-|S|)! * (v_ppm(S+i) - v_ppm(S))
    *   phi_ppm(i) = phi_num(i) DIV n!   (signed; Spark DIV and
    *     DuckDB // both truncate toward zero — the event_uplift
    *     convention, re-verified on negative quotients)
    * Efficiency — SUM_i phi_num(i) = n! * (v(full) - v(empty)) — is
    * the spec's conservation check.
    *
    * Scale: ONE user-keyed shuffle builds the coalition masks (sum
    * of distinct channel bits + converted flag per user); the
    * coalition rollup lands on <= 2^n keys. Everything downstream —
    * the mask lattice, the bit map, the factorial table — is
    * vocabulary-bounded (n <= 8 enforced => <= 256 rows) and
    * broadcast, so no row-keyed work survives the first aggregate.
    * |S| is spelled as a lattice-x-channels membership join, not an
    * engine bit_count, so both engines run the identical program. */
  def eventShapleyOn(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    // vocabulary-bounded (<= 8 rows; the count-based gate below still
    // gives the precise actionable message)
    val chW = Window.partitionBy(Guards.one).orderBy("channel")
    val channels = Guards.requireBounded(
        events.filter(col("event_type") =!= "purchase")
          .select(col("event_type").as("channel")).distinct(),
        64L, "event_shapley channel vocabulary")
      .withColumn("rn", row_number().over(chW).cast("long"))
      .select(col("channel"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(rn - 1 AS INT))").as("bit"))
      .localCheckpoint(true) // <= 8 rows; reused by four consumers
    val nCh = channels.count()
    if (nCh < 1 || nCh > 8) throw new IllegalStateException(
      s"event_shapley needs 1..8 non-purchase channels, got $nCh: the " +
        "2^n coalition lattice is only tractable over a bounded channel " +
        "vocabulary; bucket channels upstream first.")
    val bits = events
      .filter(col("event_type") =!= "purchase")
      .join(broadcast(channels), col("event_type") === col("channel"))
      .select(col("user_id"), col("bit")).distinct()
    val convs = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
      .withColumn("conv", lit(1L))
    val coal = bits
      .groupBy("user_id").agg(sum(col("bit")).as("mask"))
      .join(convs, Seq("user_id"), "left")
      .na.fill(0L, Seq("conv"))
      .groupBy("mask")
      .agg(count(lit(1)).as("users"), sum(col("conv")).as("convs"))
    val nDf = channels.agg(count(lit(1)).as("n")) // 1 row
    val lattice = nDf
      .select(explode(sequence(lit(0L),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(n AS INT)) - 1"))).as("mask"))
      .join(coal, Seq("mask"), "left")
      .withColumn("v_ppm",
        coalesce(expr("convs * 1000000 DIV users"), lit(0L)))
      .select("mask", "v_ppm", "users", "convs")
      .localCheckpoint(true) // <= 2^n rows; both term sides + exposure
    val sizes = lattice.select(col("mask").as("s_mask"))
      .join(broadcast(channels.select(col("bit").as("szbit"))),
        expr("(s_mask & szbit) != 0"), "left")
      .groupBy("s_mask").agg(count(col("szbit")).as("sz"))
    val fact = s.createDataFrame(Seq(
      (0L, 1L), (1L, 1L), (2L, 2L), (3L, 6L), (4L, 24L),
      (5L, 120L), (6L, 720L), (7L, 5040L), (8L, 40320L)))
      .toDF("k", "f")
    val terms = lattice.select(col("mask").as("s_mask"), col("v_ppm").as("v_s"))
      .join(broadcast(channels), expr("(s_mask & bit) = 0"))
      .join(broadcast(lattice.select(col("mask").as("w_mask"),
        col("v_ppm").as("v_w"))), expr("w_mask = s_mask + bit"))
      .join(broadcast(sizes), Seq("s_mask"))
      .crossJoin(broadcast(nDf))
      .join(broadcast(fact.select(col("k").as("k_s"), col("f").as("f_s"))),
        col("k_s") === col("sz"))
      .join(broadcast(fact.select(col("k").as("k_t"), col("f").as("f_t"))),
        expr("k_t = n - 1 - sz"))
      .groupBy("channel", "bit")
      .agg(sum(expr("f_s * f_t * (v_w - v_s)")).as("phi_num"))
    val exposure = lattice
      .join(broadcast(channels.select(col("channel").as("xch"),
        col("bit").as("xbit"))), expr("(mask & xbit) != 0"))
      .select(col("xch").as("channel"), col("users"), col("convs"))
      .groupBy("channel")
      .agg(coalesce(sum(col("users")), lit(0L)).as("exposed_users"),
        coalesce(sum(col("convs")), lit(0L)).as("conv_users"))
    val nfactDf = nDf.join(fact, col("k") === col("n"))
      .select(col("f").as("nfact"))
    terms
      .join(exposure, Seq("channel"), "left")
      .na.fill(0L, Seq("exposed_users", "conv_users"))
      .crossJoin(broadcast(nfactDf))
      .withColumn("phi_ppm", expr("phi_num DIV nfact"))
      .select("channel", "exposed_users", "conv_users", "phi_num",
        "nfact", "phi_ppm")
      .orderBy("channel")
  }

  def eventShapley(s: SparkSession, dir: String): DataFrame =
    eventShapleyOn(Tables.events(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "event_shapley" -> eventShapley,
    "event_pattern_match" -> eventPatternMatch,
    "cdc_snapshot_diff" -> cdcSnapshotDiff,
    "agg_incremental_rollup" -> aggIncrementalRollup,
    "event_funnel_window" -> eventFunnelWindow,
    "event_uplift" -> eventUplift,
    "event_adstock" -> eventAdstock,
    "ts_sma_cross" -> tsSmaCross,
    "ts_drawdown" -> tsDrawdown,
    "ts_interarrival" -> tsInterarrival,
    "ts_theilsen" -> tsTheilsen,
    "event_benford" -> eventBenford,
    "event_transition_audit" -> eventTransitionAudit,
    "event_ttest_welch" -> eventTtestWelch,
    "event_anova" -> eventAnova,
    "event_did" -> eventDid,
    "event_attribution_position" -> eventAttributionPosition,
    "event_attribution_decay" -> eventAttributionDecay,
    "event_rate_limit" -> eventRateLimit,
    "ts_anomaly_decomposed" -> tsAnomalyDecomposed,
    "event_markov_stationary" -> eventMarkovStationary,
    "event_absorption" -> eventAbsorption,
    "event_markov_attribution" -> eventMarkovAttribution,
    "ts_decompose" -> tsDecompose,
    "ts_seasonality_strength" -> tsSeasonalityStrength,
    "event_regex" -> eventRegex,
    "sample_holdout_temporal" -> sampleHoldoutTemporal,
    "event_cusum" -> eventCusum,
    "ts_ewma" -> tsEwma,
    "event_streaks" -> eventStreaks,
    "event_seasonality" -> eventSeasonality,
    "event_rfm" -> eventRfm,
    "ts_interpolate" -> tsInterpolate,
    "event_ab_test" -> eventAbTest,
    "event_chi2" -> eventChi2,
    "event_gini" -> eventGini,
    "ts_autocorr" -> tsAutocorr,
    "event_retention" -> eventRetention,
    "event_funnel" -> eventFunnel,
    "scd2_intervals" -> scd2Intervals,
    "ts_gapfill" -> tsGapfill,
    "event_attribution" -> eventAttribution,
    "event_transitions" -> eventTransitions,
    "event_paths" -> eventPaths,
    "event_cohort_ltv" -> eventCohortLtv,
    "ts_forecast_naive" -> tsForecastNaive,
    "ts_holt" -> tsHolt,
    "ts_holt_winters" -> tsHoltWinters,
    "event_seq_patterns" -> eventSeqPatterns,
    "sample_bootstrap" -> sampleBootstrap,
    "event_mannwhitney" -> eventMannwhitney,
    "event_ks" -> eventKs,
    "ts_ohlc" -> tsOhlc,
    "event_survival" -> eventSurvival,
    "event_time_to_convert" -> eventTimeToConvert,
  )

  /** Generated DuckDB mirror of [[tsHoltWintersOn]]: the 7 seasonal
    * slots become 7 recursive-CTE state columns; every dyadic shift
    * is floor(v/2.0) (≡ Spark's arithmetic shiftright on negatives).
    * The l/b/s subexpressions are textually nested — verbose but
    * mechanically identical to the engine's lambda. */
  private def holtWintersOracleSql: String = {
    val sCols = (0 to 6).map(j => s"s$j").mkString(", ")
    val sOld = "CASE CAST((z.rn - 1) % 7 AS INT) " +
      (0 to 6).map(j => s"WHEN $j THEN h.s$j").mkString(" ") + " END"
    val lNew = s"CAST(floor((z.x - ($sOld) + h.l + h.b) / 2.0) AS BIGINT)"
    val bNew = s"CAST(floor((($lNew) - h.l + h.b) / 2.0) AS BIGINT)"
    val sNew = s"CAST(floor((z.x - ($lNew) + ($sOld)) / 2.0) AS BIGINT)"
    val sUpd = (0 to 6).map(j =>
      s"CASE WHEN CAST((z.rn - 1) % 7 AS INT) = $j THEN $sNew " +
        s"ELSE h.s$j END").mkString(",\n  ")
    val sInit = (0 to 6).map(j =>
      s"MAX(CASE WHEN rn = ${j + 1} THEN x END) - MIN(i.l0) AS s$j")
      .mkString(",\n    ")
    val sLast = "CASE CAST(h.rn % 7 AS INT) " +
      (0 to 6).map(j => s"WHEN $j THEN h.s$j").mkString(" ") + " END"
    s"""WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
       |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
       |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
       |spine AS (SELECT t.event_type, g.d
       |  FROM (SELECT DISTINCT event_type FROM daily) t
       |  CROSS JOIN (SELECT UNNEST(generate_series(d0, d1,
       |    INTERVAL 1 DAY))::DATE AS d FROM span) g),
       |z AS (SELECT s.event_type, s.d,
       |    CAST(COALESCE(dl.x, 0) AS BIGINT) AS x,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY s.event_type
       |      ORDER BY s.d) AS BIGINT) AS rn
       |  FROM spine s LEFT JOIN daily dl
       |    ON s.event_type = dl.event_type AND s.d = dl.d),
       |nmax AS (SELECT event_type FROM z GROUP BY 1
       |  HAVING MAX(rn) >= 8),
       |i AS (SELECT z.event_type, CAST(SUM(x) // 7 AS BIGINT) AS l0
       |  FROM z JOIN nmax USING (event_type) WHERE rn <= 7
       |  GROUP BY 1),
       |si AS (SELECT z.event_type, MIN(i.l0) AS l0,
       |    $sInit
       |  FROM z JOIN i USING (event_type) WHERE rn <= 7
       |  GROUP BY z.event_type),
       |h(event_type, rn, l, b, $sCols, sse) AS (
       |  SELECT event_type, CAST(7 AS BIGINT), l0, CAST(0 AS BIGINT),
       |    $sCols, CAST(0 AS BIGINT)
       |  FROM si
       |  UNION ALL
       |  SELECT z.event_type, z.rn,
       |  $lNew,
       |  $bNew,
       |  $sUpd,
       |  h.sse + (z.x - h.l - h.b - ($sOld))
       |    * (z.x - h.l - h.b - ($sOld))
       |  FROM h JOIN z ON z.event_type = h.event_type
       |    AND z.rn = h.rn + 1),
       |last AS (SELECT event_type, MAX(rn) AS rn FROM h GROUP BY 1)
       |SELECT h.event_type, h.rn AS n_days, h.l AS level,
       |  h.b AS trend, $sLast AS s_next,
       |  h.l + h.b + ($sLast) AS fc_1, h.sse
       |FROM h JOIN last ON last.event_type = h.event_type
       |  AND last.rn = h.rn
       |ORDER BY h.event_type""".stripMargin
  }

  private def markovRoundSql(i: Int): String =
    s"""p$i AS (SELECT tm.dst AS state,
       |    CAST(SUM((p${i - 1}.pi * tm.n) // tm.r) AS BIGINT) AS pi
       |  FROM tm JOIN p${i - 1} ON tm.src = p${i - 1}.state GROUP BY 1)"""
      .stripMargin

  /** Shared DuckDB CTE chain of [[tsDecomposeOn]] ending in
    * `tr(d, dow, v_cents, trend_cents, detr)` and
    * `se(dow, seasonal_cents)` — used by the ts_decompose oracle and
    * the residual-MAD anomaly oracle on top of it. */
  private val decomposeCoreSql =
    """daily AS (SELECT CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS v_cents
      |  FROM events GROUP BY 1),
      |dw AS (SELECT d, v_cents,
      |    CAST(datediff('day', DATE '1970-01-05', d) % 7 AS INT) AS dow,
      |    COUNT(*) OVER (ORDER BY d ASC
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7,
      |    SUM(v_cents) OVER (ORDER BY d ASC
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7
      |  FROM daily),
      |tr AS (SELECT d, dow, v_cents,
      |    CASE WHEN n7 = 7 THEN s7 // 7 END AS trend_cents,
      |    v_cents - (CASE WHEN n7 = 7 THEN s7 // 7 END) AS detr
      |  FROM dw),
      |se AS (SELECT dow,
      |    CAST(SUM(detr) // COUNT(*) AS BIGINT) AS seasonal_cents
      |  FROM tr WHERE detr IS NOT NULL GROUP BY dow)""".stripMargin

  val oracles: Map[String, String] = Map(
    // Mirrors eventShapleyOn: alphabetical bit map, exact-set
    // coalitions, 2^n lattice with v=0 fill, membership-join popcount,
    // factorial VALUES table, signed phi_num DIV n! (// truncates
    // toward zero in DuckDB, same as Spark DIV — verified).
    "event_shapley" ->
      """WITH ch AS (SELECT channel,
        |    (CAST(1 AS BIGINT) << CAST(ROW_NUMBER()
        |      OVER (ORDER BY channel) - 1 AS INT)) AS bit
        |  FROM (SELECT DISTINCT event_type AS channel FROM events
        |        WHERE event_type <> 'purchase')),
        |n AS (SELECT COUNT(*) AS n FROM ch),
        |bits AS (SELECT DISTINCT e.user_id, c.bit
        |  FROM events e JOIN ch c ON e.event_type = c.channel),
        |convs AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase'),
        |uc AS (SELECT b.user_id, SUM(b.bit) AS mask,
        |    MAX(CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM bits b LEFT JOIN convs cv ON b.user_id = cv.user_id
        |  GROUP BY b.user_id),
        |coal AS (SELECT mask, COUNT(*) AS users,
        |    CAST(SUM(conv) AS BIGINT) AS convs FROM uc GROUP BY mask),
        |masks AS (SELECT r.range AS mask FROM range(0, 256) r CROSS JOIN n
        |  WHERE r.range < (CAST(1 AS BIGINT) << CAST(n.n AS INT))),
        |lat AS (SELECT m.mask,
        |    COALESCE(c.convs * 1000000 // c.users, 0) AS v_ppm,
        |    c.users, c.convs
        |  FROM masks m LEFT JOIN coal c ON c.mask = m.mask),
        |sz AS (SELECT l.mask AS s_mask, COUNT(c.bit) AS sz
        |  FROM lat l LEFT JOIN ch c ON (l.mask & c.bit) <> 0
        |  GROUP BY l.mask),
        |f AS (SELECT * FROM (VALUES (0, 1), (1, 1), (2, 2), (3, 6),
        |    (4, 24), (5, 120), (6, 720), (7, 5040), (8, 40320))
        |  AS t(k, fct)),
        |terms AS (SELECT c.channel,
        |    CAST(SUM(CAST(fs.fct AS BIGINT) * ft.fct
        |      * (lw.v_ppm - ls.v_ppm)) AS BIGINT) AS phi_num
        |  FROM lat ls JOIN ch c ON (ls.mask & c.bit) = 0
        |  JOIN lat lw ON lw.mask = ls.mask + c.bit
        |  JOIN sz ON sz.s_mask = ls.mask
        |  CROSS JOIN n
        |  JOIN f fs ON fs.k = sz.sz
        |  JOIN f ft ON ft.k = n.n - 1 - sz.sz
        |  GROUP BY c.channel),
        |exposure AS (SELECT c.channel,
        |    CAST(COALESCE(SUM(l.users), 0) AS BIGINT) AS exposed_users,
        |    CAST(COALESCE(SUM(l.convs), 0) AS BIGINT) AS conv_users
        |  FROM lat l JOIN ch c ON (l.mask & c.bit) <> 0
        |  GROUP BY c.channel),
        |nf AS (SELECT CAST(f.fct AS BIGINT) AS nfact
        |  FROM n JOIN f ON f.k = n.n)
        |SELECT t.channel,
        |  COALESCE(x.exposed_users, 0) AS exposed_users,
        |  COALESCE(x.conv_users, 0) AS conv_users,
        |  t.phi_num, nf.nfact, t.phi_num // nf.nfact AS phi_ppm
        |FROM terms t LEFT JOIN exposure x ON t.channel = x.channel
        |CROSS JOIN nf
        |ORDER BY t.channel""".stripMargin,
    "event_pattern_match" ->
      """WITH ue AS (SELECT user_id, event_type, epoch_us(ts) AS tus
        |  FROM events),
        |sg AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN tus END) AS s
        |  FROM ue GROUP BY 1),
        |pu AS (SELECT ue.user_id,
        |    MIN(CASE WHEN event_type = 'purchase' AND tus > sg.s
        |      AND tus <= sg.s + 604800000000 THEN tus END) AS p
        |  FROM ue JOIN sg ON ue.user_id = sg.user_id GROUP BY 1),
        |bd AS (SELECT ue.user_id,
        |    MAX(CASE WHEN event_type = 'error' AND tus > sg.s
        |      AND tus < pu.p THEN 1 ELSE 0 END) AS bad
        |  FROM ue JOIN sg ON ue.user_id = sg.user_id
        |    JOIN pu ON ue.user_id = pu.user_id GROUP BY 1)
        |SELECT sg.user_id, CAST(sg.s AS BIGINT) AS ts_signup_us,
        |  CAST(pu.p AS BIGINT) AS ts_purchase_us,
        |  CAST((pu.p - sg.s) // 60000000 AS BIGINT) AS lag_min
        |FROM sg JOIN pu ON sg.user_id = pu.user_id
        |  JOIN bd ON sg.user_id = bd.user_id
        |WHERE sg.s IS NOT NULL AND pu.p IS NOT NULL AND bd.bad = 0
        |ORDER BY sg.user_id""".stripMargin,
    "event_transition_audit" ->
      """WITH wl(src, dst) AS (VALUES
        |  ('signup', 'view'), ('view', 'view'), ('view', 'click'),
        |  ('view', 'error'), ('click', 'view'), ('click', 'purchase'),
        |  ('click', 'click'), ('purchase', 'view'), ('error', 'view')),
        |tr AS (SELECT user_id, event_type AS dst,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS src
        |  FROM events),
        |agg AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM tr WHERE src IS NOT NULL GROUP BY 1, 2)
        |SELECT agg.src, agg.dst, n,
        |  wl.src IS NOT NULL AS allowed
        |FROM agg LEFT JOIN wl ON agg.src = wl.src AND agg.dst = wl.dst
        |ORDER BY allowed ASC, n DESC, agg.src, agg.dst""".stripMargin,
    "event_benford" ->
      """WITH exp_t(digit, exp_ppm) AS (VALUES
        |  ('1', 301030), ('2', 176091), ('3', 124939), ('4', 96910),
        |  ('5', 79181), ('6', 66947), ('7', 57992), ('8', 51153),
        |  ('9', 45757)),
        |obs AS (SELECT substr(CAST(cents AS VARCHAR), 1, 1) AS digit,
        |    CAST(COUNT(*) AS BIGINT) AS n_obs
        |  FROM (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |        FROM events) WHERE cents > 0 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
        |SELECT e.digit, COALESCE(n_obs, 0) AS n_obs,
        |  CAST(COALESCE(n_obs, 0) * 1000000 // n AS BIGINT) AS obs_ppm,
        |  CAST(exp_ppm AS BIGINT) AS exp_ppm,
        |  CAST(COALESCE(n_obs, 0) * 1000000 // n - exp_ppm AS BIGINT)
        |    AS dev_ppm
        |FROM exp_t e LEFT JOIN obs ON e.digit = obs.digit CROSS JOIN tot
        |ORDER BY e.digit""".stripMargin,
    "ts_drawdown" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, d, cents,
        |    MAX(cents) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM daily),
        |r AS (SELECT event_type, d, cents, peak, cents - peak AS dd,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY cents - peak ASC, d ASC) AS rk
        |  FROM p)
        |SELECT event_type, d AS trough_day, peak AS peak_cents,
        |  cents AS trough_cents, dd AS max_drawdown_cents
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "ts_interarrival" ->
      """WITH g0 AS (SELECT event_type, event_id, epoch_us(ts) AS tus
        |  FROM events),
        |g1 AS (SELECT event_type, event_id,
        |    tus - LAG(tus, 1) OVER (PARTITION BY event_type
        |      ORDER BY tus, event_id) AS gap_us
        |  FROM g0),
        |g AS (SELECT event_type, event_id, gap_us,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY gap_us, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS m
        |  FROM g1 WHERE gap_us IS NOT NULL)
        |SELECT event_type, CAST(MAX(m) AS BIGINT) AS n_gaps,
        |  CAST(SUM(gap_us) // COUNT(*) AS BIGINT) AS mean_gap_us,
        |  CAST(MAX(CASE WHEN rn = (m - 1) * 500000 // 1000000 + 1
        |    THEN gap_us END) AS BIGINT) AS p50_gap_us,
        |  CAST(MAX(CASE WHEN rn = (m - 1) * 900000 // 1000000 + 1
        |    THEN gap_us END) AS BIGINT) AS p90_gap_us
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ts_theilsen" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS x,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY 1, 2),
        |sl AS (SELECT a.event_type,
        |    (b.y - a.y) * 1000000 // (b.x - a.x) AS slope_micro,
        |    a.x AS x1, b.x AS x2
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND b.x > a.x),
        |r AS (SELECT event_type, slope_micro,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY slope_micro, x1, x2) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS m
        |  FROM sl)
        |SELECT event_type, CAST(MAX(m) AS BIGINT) AS n_pairs,
        |  CAST(MAX(CASE WHEN rn = (m - 1) * 500000 // 1000000 + 1
        |    THEN slope_micro END) AS BIGINT) AS slope_micro,
        |  MAX(CASE WHEN rn = (m - 1) * 500000 // 1000000 + 1
        |    THEN slope_micro END) > 0 AS rising
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "event_adstock" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |ex AS (SELECT event_type, d + CAST(k.k AS INT) AS d,
        |    cents * (CAST(1 AS BIGINT) << (7 - k.k)) AS contrib,
        |    CASE WHEN k.k = 0 THEN cents ELSE 0 END AS raw
        |  FROM daily, range(0, 8) k(k))
        |SELECT event_type, d,
        |  CAST(SUM(contrib) AS BIGINT) AS adstock_x128,
        |  CAST(SUM(raw) AS BIGINT) AS cents_raw
        |FROM ex GROUP BY 1, 2
        |ORDER BY event_type, d""".stripMargin,
    "ts_sma_cross" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, d, cents,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
        |    SUM(cents) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sum3,
        |    SUM(cents) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sum7
        |  FROM daily),
        |dd AS (SELECT event_type, d, cents,
        |    CASE WHEN rn >= 7 THEN sum3 * 7 - sum7 * 3 END AS diff_x21
        |  FROM w),
        |lg AS (SELECT event_type, d, cents, diff_x21,
        |    LAG(diff_x21, 1) OVER (PARTITION BY event_type ORDER BY d)
        |      AS prev_diff
        |  FROM dd)
        |SELECT event_type, d, cents, CAST(diff_x21 AS BIGINT) AS diff_x21,
        |  diff_x21 > 0 AND COALESCE(prev_diff <= 0, FALSE) AS cross_up,
        |  diff_x21 <= 0 AND COALESCE(prev_diff > 0, FALSE) AS cross_down
        |FROM lg WHERE diff_x21 IS NOT NULL
        |ORDER BY event_type, d""".stripMargin,
    "event_funnel_window" ->
      """WITH t0 AS (SELECT user_id, MIN(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t1 AS (SELECT e.user_id, MIN(e.ts) AS t
        |  FROM events e JOIN t0 ON e.user_id = t0.user_id
        |  WHERE e.event_type = 'click' AND e.ts > t0.t
        |    AND e.ts <= t0.t + INTERVAL 3 DAY GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(e.ts) AS t
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t1.t
        |    AND e.ts <= t1.t + INTERVAL 3 DAY GROUP BY 1),
        |n AS (SELECT 1 AS step_idx, 'view' AS step,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM t0) AS n_users
        |  UNION ALL SELECT 2, 'click',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM t1)
        |  UNION ALL SELECT 3, 'purchase',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM t2))
        |SELECT step_idx, step, n_users,
        |  CASE WHEN (SELECT n_users FROM n WHERE step_idx = 1) > 0 THEN
        |    CAST(n_users * 1000000
        |      // (SELECT n_users FROM n WHERE step_idx = 1) AS BIGINT)
        |  END AS pct_ppm
        |FROM n ORDER BY step_idx""".stripMargin,
    "event_uplift" ->
      """WITH u AS (SELECT user_id,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS converted
        |  FROM events GROUP BY user_id),
        |cells AS (SELECT CAST((user_id // 2) % 5 AS INT) AS segment,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_t,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN converted END)
        |      AS BIGINT) AS x_t,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_c,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN converted END)
        |      AS BIGINT) AS x_c
        |  FROM u GROUP BY 1),
        |r AS (SELECT segment, n_t, x_t, n_c, x_c,
        |    CAST(CASE WHEN n_t > 0 AND n_c > 0 THEN
        |      x_t * 1000000 // n_t - x_c * 1000000 // n_c END AS BIGINT)
        |      AS uplift_ppm,
        |    CAST(CASE WHEN n_c > 0 THEN
        |      (x_t * n_c - x_c * n_t) * 1000 // n_c END AS BIGINT)
        |      AS incr_milli,
        |    CAST(ROW_NUMBER() OVER (ORDER BY
        |      CASE WHEN n_t > 0 AND n_c > 0 THEN
        |        x_t * 1000000 // n_t - x_c * 1000000 // n_c END
        |        DESC NULLS LAST,
        |      segment ASC) AS INT) AS rnk
        |  FROM cells)
        |SELECT segment, n_t, x_t, n_c, x_c, uplift_ppm, rnk, incr_milli,
        |  CAST(SUM(incr_milli) OVER (ORDER BY rnk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_incr_milli
        |FROM r ORDER BY rnk""".stripMargin,
    "cdc_snapshot_diff" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-20'),
        |new_s AS (SELECT user_id, event_type AS new_state FROM (
        |    SELECT user_id, event_type, ROW_NUMBER() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |old_s AS (SELECT user_id, event_type AS old_state FROM (
        |    SELECT user_id, event_type, ROW_NUMBER() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM e WHERE ts <= TIMESTAMP '2024-01-10') WHERE rn = 1)
        |SELECT n.user_id, o.old_state, n.new_state,
        |  CASE WHEN o.old_state IS NULL THEN 'insert'
        |       WHEN o.old_state = n.new_state THEN 'unchanged'
        |       ELSE 'update' END AS change_type
        |FROM new_s n LEFT JOIN old_s o USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // Mirrors eventMarkovAttributionOn: one generated absorption run
    // per removal (same unrolled recursion as event_absorption), the
    // '#start'/'#end' framing, Anderl unrenormalized removal.
    "event_markov_attribution" -> {
      val chans = MarkovChannels
      def runSql(tag: String, cond: String): String = {
        val base =
          s"""tm_$tag AS (SELECT * FROM tm WHERE $cond),
             |c0_$tag AS (SELECT DISTINCT src AS state,
             |    CAST(0 AS BIGINT) AS a FROM tm_$tag)""".stripMargin
        val rounds = (1 to 8).map { k =>
          s"""c${k}_$tag AS MATERIALIZED (SELECT t.src AS state,
             |    CAST(SUM(CASE WHEN t.dst = 'purchase'
             |        THEN t.n * 1000000
             |        ELSE t.n * COALESCE(p.a, 0) END) // t.r AS BIGINT)
             |      AS a
             |  FROM tm_$tag t LEFT JOIN c${k - 1}_$tag p
             |    ON t.dst = p.state
             |  GROUP BY t.src, t.r)""".stripMargin
        }.mkString(",\n")
        s"$base,\n$rounds,\n" +
          s"res_$tag AS (SELECT a FROM c8_$tag WHERE state = '#start')"
      }
      val runs = (runSql("full", "TRUE") +:
        chans.map(c => runSql(c, s"src <> '$c'"))).mkString(",\n")
      val rows = chans.map(c =>
        s"""SELECT '$c' AS channel,
           |    (SELECT a FROM res_full) AS p_full,
           |    (SELECT a FROM res_$c) AS p_removed""".stripMargin)
        .mkString("\n  UNION ALL ")
      s"""WITH sq AS (SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rk,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS dst
         |  FROM events),
         |stt AS (SELECT '#start' AS src, event_type AS dst,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM sq WHERE rk = 1 GROUP BY 2),
         |md AS (SELECT event_type AS src, COALESCE(dst, '#end') AS dst,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM sq WHERE event_type <> 'purchase' GROUP BY 1, 2),
         |tru AS (SELECT * FROM stt UNION ALL SELECT * FROM md),
         |tm AS MATERIALIZED (SELECT tru.src, tru.dst, tru.n, rr.r
         |  FROM tru JOIN (SELECT src, CAST(SUM(n) AS BIGINT) AS r
         |    FROM tru GROUP BY 1) rr USING (src)),
         |$runs,
         |rws AS (
         |  $rows),
         |tot AS (SELECT CAST(SUM(p_full - p_removed) AS BIGINT) AS te
         |  FROM rws)
         |SELECT channel, CAST(p_full AS BIGINT) AS p_full_ppm,
         |  CAST(p_removed AS BIGINT) AS p_removed_ppm,
         |  CAST(p_full - p_removed AS BIGINT) AS removal_effect_ppm,
         |  CAST(CASE WHEN te > 0
         |    THEN (p_full - p_removed) * 1000 // te END AS BIGINT)
         |    AS attribution_milli
         |FROM rws, tot ORDER BY channel""".stripMargin
    },
    // Mirrors aggIncrementalRollupOn: state + delta rollups, full
    // outer coalesce-sum merge, batch recompute audit.
    "agg_incremental_rollup" ->
      """WITH st AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COALESCE(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)),
        |      0) AS BIGINT) AS cents
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-10' GROUP BY 1, 2),
        |de AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COALESCE(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)),
        |      0) AS BIGINT) AS cents
        |  FROM events WHERE ts > TIMESTAMP '2024-01-10'
        |    AND ts <= TIMESTAMP '2024-01-20' GROUP BY 1, 2),
        |ba AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COALESCE(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)),
        |      0) AS BIGINT) AS cents
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-20' GROUP BY 1, 2),
        |cm AS (SELECT COALESCE(st.event_type, de.event_type) AS event_type,
        |    COALESCE(st.d, de.d) AS d,
        |    CAST(COALESCE(st.n, 0) AS BIGINT) AS state_n,
        |    CAST(COALESCE(de.n, 0) AS BIGINT) AS delta_n,
        |    CAST(COALESCE(st.n, 0) + COALESCE(de.n, 0) AS BIGINT)
        |      AS n_composed,
        |    CAST(COALESCE(st.cents, 0) + COALESCE(de.cents, 0) AS BIGINT)
        |      AS cents_composed
        |  FROM st FULL OUTER JOIN de
        |    ON st.event_type = de.event_type AND st.d = de.d)
        |SELECT cm.event_type, cm.d, state_n, delta_n, n_composed,
        |  cents_composed, ba.n AS n_batch, ba.cents AS cents_batch,
        |  n_composed = ba.n AND cents_composed = ba.cents AS matches
        |FROM cm JOIN ba ON cm.event_type = ba.event_type AND cm.d = ba.d
        |ORDER BY cm.event_type, cm.d""".stripMargin,
    "event_ttest_welch" ->
      """WITH u AS (SELECT user_id,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS spend
        |  FROM events GROUP BY user_id),
        |arms AS (SELECT CAST(user_id % 2 AS INT) AS variant,
        |    CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(spend) AS HUGEINT) AS s,
        |    CAST(SUM(CAST(spend AS HUGEINT) * spend) AS HUGEINT) AS q
        |  FROM u GROUP BY 1),
        |ab AS (SELECT
        |    (SELECT n FROM arms WHERE variant = 0) AS n0,
        |    (SELECT s FROM arms WHERE variant = 0) AS s0,
        |    (SELECT q FROM arms WHERE variant = 0) AS q0,
        |    (SELECT n FROM arms WHERE variant = 1) AS n1,
        |    (SELECT s FROM arms WHERE variant = 1) AS s1,
        |    (SELECT q FROM arms WHERE variant = 1) AS q1)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  CAST(s0 AS BIGINT) AS spend0, CAST(s1 AS BIGINT) AS spend1,
        |  CAST(s0 * 1000 // n0 AS BIGINT) AS mean0_milli,
        |  CAST(s1 * 1000 // n1 AS BIGINT) AS mean1_milli,
        |  CAST(CASE WHEN n0 >= 2 AND n1 >= 2
        |    AND (n0 * q0 - s0 * s0) * n1 * n1 * (n1 - 1)
        |      + (n1 * q1 - s1 * s1) * n0 * n0 * (n0 - 1) > 0
        |  THEN (s0 * n1 - s1 * n0) * (s0 * n1 - s1 * n0)
        |      * (n0 - 1) * (n1 - 1) * 1000
        |    // ((n0 * q0 - s0 * s0) * n1 * n1 * (n1 - 1)
        |       + (n1 * q1 - s1 * s1) * n0 * n0 * (n0 - 1))
        |  END AS BIGINT) AS t2_milli,
        |  CASE WHEN n0 >= 2 AND n1 >= 2
        |    AND (n0 * q0 - s0 * s0) * n1 * n1 * (n1 - 1)
        |      + (n1 * q1 - s1 * s1) * n0 * n0 * (n0 - 1) > 0
        |  THEN (s0 * n1 - s1 * n0) * (s0 * n1 - s1 * n0)
        |      * (n0 - 1) * (n1 - 1) * 1000
        |    // ((n0 * q0 - s0 * s0) * n1 * n1 * (n1 - 1)
        |       + (n1 * q1 - s1 * s1) * n0 * n0 * (n0 - 1)) > 3841
        |  END AS significant
        |FROM ab""".stripMargin,
    "event_anova" ->
      """WITH g AS (SELECT event_type,
        |    CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
        |      AS s,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS HUGEINT)
        |             * CAST(floor(value * 100 + 0.5) AS HUGEINT))
        |      AS HUGEINT) AS q
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n) AS HUGEINT) AS n,
        |    CAST(SUM(s) AS HUGEINT) AS st,
        |    CAST(SUM(q) AS HUGEINT) AS qt,
        |    CAST(SUM((n * q - s * s) // n) AS HUGEINT) AS ssw
        |  FROM g)
        |SELECT k, CAST(n AS BIGINT) AS n,
        |  CAST(ssw AS BIGINT) AS ssw_cents2,
        |  CAST((n * qt - st * st) // n - ssw AS BIGINT) AS ssb_cents2,
        |  CAST(CASE WHEN ssw > 0 AND n > k AND k > 1 THEN
        |    ((n * qt - st * st) // n - ssw) * (n - k) * 1000
        |      // (ssw * (k - 1)) END AS BIGINT) AS f_milli
        |FROM tot""".stripMargin,
    "event_did" ->
      """WITH up AS (SELECT user_id,
        |    CAST(ts >= TIMESTAMP '2024-01-16' AS INT) AS post,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS converted
        |  FROM events GROUP BY 1, 2),
        |cells AS (SELECT CAST(user_id % 2 AS INT) AS treated, post,
        |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(converted) AS BIGINT) AS x
        |  FROM up GROUP BY 1, 2),
        |w AS (SELECT
        |  CAST(SUM(CASE WHEN treated = 1 AND post = 0 THEN n END) AS BIGINT) AS n_t_pre,
        |  CAST(SUM(CASE WHEN treated = 1 AND post = 0 THEN x END) AS BIGINT) AS x_t_pre,
        |  CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN n END) AS BIGINT) AS n_t_post,
        |  CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN x END) AS BIGINT) AS x_t_post,
        |  CAST(SUM(CASE WHEN treated = 0 AND post = 0 THEN n END) AS BIGINT) AS n_c_pre,
        |  CAST(SUM(CASE WHEN treated = 0 AND post = 0 THEN x END) AS BIGINT) AS x_c_pre,
        |  CAST(SUM(CASE WHEN treated = 0 AND post = 1 THEN n END) AS BIGINT) AS n_c_post,
        |  CAST(SUM(CASE WHEN treated = 0 AND post = 1 THEN x END) AS BIGINT) AS x_c_post
        |  FROM cells)
        |SELECT n_t_pre, x_t_pre, n_t_post, x_t_post,
        |  n_c_pre, x_c_pre, n_c_post, x_c_post,
        |  CAST(x_t_pre * 1000000 // n_t_pre AS BIGINT) AS cr_t_pre_ppm,
        |  CAST(x_t_post * 1000000 // n_t_post AS BIGINT) AS cr_t_post_ppm,
        |  CAST(x_c_pre * 1000000 // n_c_pre AS BIGINT) AS cr_c_pre_ppm,
        |  CAST(x_c_post * 1000000 // n_c_post AS BIGINT) AS cr_c_post_ppm,
        |  CAST(x_t_pre * 1000000 // n_t_pre AS BIGINT)
        |    - CAST(x_c_pre * 1000000 // n_c_pre AS BIGINT)
        |    AS pretrend_gap_ppm,
        |  (CAST(x_t_post * 1000000 // n_t_post AS BIGINT)
        |    - CAST(x_t_pre * 1000000 // n_t_pre AS BIGINT))
        |  - (CAST(x_c_post * 1000000 // n_c_post AS BIGINT)
        |    - CAST(x_c_pre * 1000000 // n_c_pre AS BIGINT)) AS did_ppm
        |FROM w""".stripMargin,
    "event_attribution_position" ->
      """WITH m AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS p_before
        |  FROM events),
        |t AS (SELECT user_id, p_before + 1 AS conv, tus, event_id, event_type
        |  FROM m WHERE event_type <> 'purchase'),
        |p AS (SELECT user_id, p_before + 1 AS conv FROM m
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT t.user_id, t.conv, t.event_type,
        |    row_number() OVER (PARTITION BY t.user_id, t.conv
        |      ORDER BY t.tus ASC, t.event_id ASC) AS t_rn,
        |    COUNT(*) OVER (PARTITION BY t.user_id, t.conv) AS n
        |  FROM t JOIN p ON t.user_id = p.user_id AND t.conv = p.conv),
        |a AS (SELECT event_type AS channel,
        |    CAST(COUNT(*) AS BIGINT) AS n_contribs,
        |    CAST(SUM(CASE WHEN n = 1 THEN 1000000
        |      WHEN n = 2 THEN 500000
        |      WHEN t_rn = 1 OR t_rn = n THEN 400000
        |      ELSE 200000 // (n - 2) END) AS BIGINT) AS credit_ppm
        |  FROM c GROUP BY 1),
        |o AS (SELECT 'organic' AS channel,
        |    CAST(COUNT(*) AS BIGINT) AS n_contribs,
        |    CAST(COUNT(*) * 1000000 AS BIGINT) AS credit_ppm
        |  FROM p LEFT JOIN (SELECT DISTINCT user_id, conv FROM t) tc
        |    ON p.user_id = tc.user_id AND p.conv = tc.conv
        |  WHERE tc.user_id IS NULL)
        |SELECT channel, n_contribs, credit_ppm FROM a
        |UNION ALL SELECT channel, n_contribs, credit_ppm FROM o
        |  WHERE n_contribs > 0
        |ORDER BY channel""".stripMargin,
    "event_attribution_decay" ->
      s"""WITH m AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type,
         |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS p_before
         |  FROM events),
         |t AS (SELECT user_id, p_before + 1 AS conv, tus, event_id, event_type
         |  FROM m WHERE event_type <> 'purchase'),
         |p AS (SELECT user_id, p_before + 1 AS conv, tus AS p_tus FROM m
         |  WHERE event_type = 'purchase'),
         |c AS (SELECT t.user_id, t.conv, t.event_type,
         |    1000000 // (CAST(1 AS BIGINT) << CAST(LEAST(
         |      ((p.p_tus - t.tus) // 86400000000) // $DecayHalflifeDays,
         |      62) AS INT)) AS w_micro
         |  FROM t JOIN p ON t.user_id = p.user_id AND t.conv = p.conv),
         |n AS (SELECT user_id, conv, event_type, w_micro,
         |    SUM(w_micro) OVER (PARTITION BY user_id, conv) AS tot
         |  FROM c),
         |a AS (SELECT event_type AS channel,
         |    CAST(COUNT(*) AS BIGINT) AS n_contribs,
         |    CAST(SUM(w_micro * 1000000 // tot) AS BIGINT) AS credit_ppm
         |  FROM n WHERE tot > 0 GROUP BY 1),
         |o AS (SELECT 'organic' AS channel,
         |    CAST(COUNT(*) AS BIGINT) AS n_contribs,
         |    CAST(COUNT(*) * 1000000 AS BIGINT) AS credit_ppm
         |  FROM p LEFT JOIN (SELECT DISTINCT user_id, conv FROM t) tc
         |    ON p.user_id = tc.user_id AND p.conv = tc.conv
         |  WHERE tc.user_id IS NULL)
         |SELECT channel, n_contribs, credit_ppm FROM a
         |UNION ALL SELECT channel, n_contribs, credit_ppm FROM o
         |  WHERE n_contribs > 0
         |ORDER BY channel""".stripMargin,
    "event_rate_limit" ->
      """WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    time_bucket(INTERVAL 2 MINUTES, ts) AS win
        |  FROM events),
        |r AS (SELECT user_id, win,
        |    row_number() OVER (PARTITION BY user_id, win
        |      ORDER BY tus ASC, event_id ASC) AS rn
        |  FROM b)
        |SELECT user_id,
        |  CAST(COUNT(DISTINCT win) AS BIGINT) AS n_windows,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN rn > 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_throttled
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ts_anomaly_decomposed" ->
      s"""WITH $decomposeCoreSql,
         |rs AS (SELECT tr.d, tr.v_cents,
         |    CAST(tr.detr - se.seasonal_cents AS BIGINT) AS resid_cents
         |  FROM tr JOIN se ON tr.dow = se.dow
         |  WHERE tr.detr IS NOT NULL),
         |med AS (SELECT median(resid_cents) AS med FROM rs),
         |mad AS (SELECT median(abs(resid_cents - med)) AS mad
         |  FROM rs, med)
         |SELECT d, v_cents, resid_cents,
         |  round(abs(resid_cents - med) / (1.4826 * mad), 4) AS rz
         |FROM rs, med, mad
         |WHERE mad > 0 AND abs(resid_cents - med) > 3.7065 * mad
         |ORDER BY d""".stripMargin,
    "event_markov_stationary" ->
      s"""WITH tp AS (SELECT user_id, event_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS dst
         |  FROM events),
         |t AS (SELECT event_type AS src, dst, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tp WHERE dst IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT src, CAST(SUM(n) AS BIGINT) AS r FROM t GROUP BY 1),
         |tm AS (SELECT t.src, t.dst, t.n, r.r FROM t JOIN r USING (src)),
         |st AS (SELECT DISTINCT src AS state FROM t),
         |ns AS (SELECT COUNT(*) AS ns FROM st),
         |p0 AS (SELECT state, 1000000 // ns AS pi FROM st, ns),
         |${(1 to 8).map(markovRoundSql).mkString(",\n")},
         |tot AS (SELECT COUNT(*) AS tot FROM events),
         |emp AS (SELECT event_type AS state,
         |    (COUNT(*) * 1000000) // (SELECT tot FROM tot) AS emp_ppm
         |  FROM events GROUP BY 1)
         |SELECT p8.state, p8.pi AS pi_ppm,
         |  CAST(emp.emp_ppm AS BIGINT) AS emp_ppm
         |FROM p8 JOIN emp USING (state) ORDER BY state""".stripMargin,
    // Mirrors eventAbsorptionOn: same lead substrate, eight unrolled
    // truncated-Neumann rounds, one floor DIV per state per round.
    "event_absorption" -> {
      def round(k: Int): String =
        s"""c$k AS MATERIALIZED (SELECT tm.src AS state,
           |    1000 + CAST(SUM(CASE WHEN tm.dst <> 'purchase'
           |        THEN tm.n * COALESCE(p.t_milli, 0) ELSE 0 END)
           |      // tm.r AS BIGINT) AS t_milli,
           |    CAST(SUM(CASE WHEN tm.dst = 'purchase' THEN tm.n * 1000000
           |        ELSE tm.n * COALESCE(p.a_ppm, 0) END)
           |      // tm.r AS BIGINT) AS a_ppm
           |  FROM tm LEFT JOIN c${k - 1} p ON tm.dst = p.state
           |  GROUP BY tm.src, tm.r)""".stripMargin
      s"""WITH tp AS (SELECT user_id, event_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS dst
         |  FROM events),
         |t AS (SELECT event_type AS src, dst, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tp WHERE dst IS NOT NULL AND event_type <> 'purchase'
         |  GROUP BY 1, 2),
         |r AS (SELECT src, CAST(SUM(n) AS BIGINT) AS r FROM t GROUP BY 1),
         |tm AS MATERIALIZED (SELECT t.src, t.dst, t.n, r.r
         |  FROM t JOIN r USING (src)),
         |c0 AS (SELECT DISTINCT src AS state, CAST(0 AS BIGINT) AS t_milli,
         |    CAST(0 AS BIGINT) AS a_ppm FROM t),
         |${(1 to 8).map(round).mkString(",\n")}
         |SELECT state, t_milli, a_ppm FROM c8 ORDER BY state""".stripMargin
    },
    // Mirrors tsSeasonalityStrengthOn: shared-n variance-numerator
    // ratio, truncating ppm DIV, GREATEST(0) noise clamp.
    "ts_seasonality_strength" ->
      s"""WITH $decomposeCoreSql,
         |j AS (SELECT tr.detr - se.seasonal_cents AS r,
         |    se.seasonal_cents + (tr.detr - se.seasonal_cents) AS sr,
         |    tr.trend_cents + (tr.detr - se.seasonal_cents) AS trr
         |  FROM tr JOIN se ON tr.dow = se.dow
         |  WHERE tr.trend_cents IS NOT NULL),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    SUM(CAST(r AS HUGEINT)) AS s_r,
         |    SUM(CAST(r AS HUGEINT) * r) AS q_r,
         |    SUM(CAST(sr AS HUGEINT)) AS s_sr,
         |    SUM(CAST(sr AS HUGEINT) * sr) AS q_sr,
         |    SUM(CAST(trr AS HUGEINT)) AS s_tr,
         |    SUM(CAST(trr AS HUGEINT) * trr) AS q_tr
         |  FROM j),
         |v AS (SELECT n, n * q_r - s_r * s_r AS vr,
         |    n * q_sr - s_sr * s_sr AS vsr,
         |    n * q_tr - s_tr * s_tr AS vtr FROM a)
         |SELECT n AS n_days,
         |  CAST(CASE WHEN vtr > 0 THEN
         |    GREATEST(0, 1000000 - vr * 1000000 // vtr)
         |  END AS BIGINT) AS f_trend_ppm,
         |  CAST(CASE WHEN vsr > 0 THEN
         |    GREATEST(0, 1000000 - vr * 1000000 // vsr)
         |  END AS BIGINT) AS f_seasonal_ppm
         |FROM v""".stripMargin,
    "ts_decompose" ->
      s"""WITH $decomposeCoreSql
         |SELECT tr.d, tr.dow, tr.v_cents,
         |  CAST(tr.trend_cents AS BIGINT) AS trend_cents,
         |  se.seasonal_cents,
         |  CAST(tr.detr - se.seasonal_cents AS BIGINT) AS resid_cents
         |FROM tr LEFT JOIN se ON tr.dow = se.dow
         |ORDER BY tr.d""".stripMargin,
    "event_regex" ->
      """WITH o AS (SELECT user_id, event_id, ts,
        |    substring(event_type, 1, 1) AS ch,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rk
        |  FROM events),
        |j AS (SELECT user_id, COUNT(*) AS n_events,
        |    string_agg(ch, '' ORDER BY rk) AS journey
        |  FROM o GROUP BY user_id)
        |SELECT user_id, n_events, journey,
        |  regexp_matches(journey, '^[^p]*s.*p') AS signup_before_purchase,
        |  regexp_matches(journey, 'v.*c.*p') AS funnel_vcp,
        |  regexp_matches(journey, 'ep') AS error_then_purchase
        |FROM j ORDER BY user_id""".stripMargin,
    "sample_holdout_temporal" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM daily),
        |r AS (SELECT d, SUM(n) OVER (ORDER BY d) AS run, total
        |  FROM daily CROSS JOIN t),
        |c AS (SELECT MIN(d) AS cut FROM r WHERE run * 5 >= total * 4)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN CAST(ts AS DATE) < cut THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_train,
        |  CAST(SUM(CASE WHEN CAST(ts AS DATE) >= cut THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_test,
        |  SUM(CASE WHEN CAST(ts AS DATE) < cut THEN 1 ELSE 0 END) > 0 AND
        |  SUM(CASE WHEN CAST(ts AS DATE) >= cut THEN 1 ELSE 0 END) > 0
        |    AS in_both
        |FROM events CROSS JOIN c
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "event_ab_test" ->
      """WITH u AS (SELECT user_id,
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
        |    (SELECT n_conv FROM arms WHERE variant = 1) AS x1)
        |SELECT n0, x0, n1, x1,
        |  CAST(x0 * 1000000 // n0 AS BIGINT) AS cr0_ppm,
        |  CAST(x1 * 1000000 // n1 AS BIGINT) AS cr1_ppm,
        |  CAST(CASE WHEN x0 + x1 > 0 AND x0 + x1 < n0 + n1 THEN
        |    (CAST(n0 AS HUGEINT) + n1)
        |      * ((CAST(x0 AS HUGEINT) * n1 - CAST(x1 AS HUGEINT) * n0)
        |         * (CAST(x0 AS HUGEINT) * n1 - CAST(x1 AS HUGEINT) * n0))
        |      * 1000 // (CAST(n0 AS HUGEINT) * n1
        |        * (CAST(x0 AS HUGEINT) + x1)
        |        * (CAST(n0 AS HUGEINT) + n1 - x0 - x1))
        |    END AS BIGINT) AS z2_milli,
        |  CASE WHEN x0 + x1 > 0 AND x0 + x1 < n0 + n1 THEN
        |    (CAST(n0 AS HUGEINT) + n1)
        |      * ((CAST(x0 AS HUGEINT) * n1 - CAST(x1 AS HUGEINT) * n0)
        |         * (CAST(x0 AS HUGEINT) * n1 - CAST(x1 AS HUGEINT) * n0))
        |      * 1000 // (CAST(n0 AS HUGEINT) * n1
        |        * (CAST(x0 AS HUGEINT) + x1)
        |        * (CAST(n0 AS HUGEINT) + n1 - x0 - x1)) > 3841
        |    END AS significant
        |FROM ab""".stripMargin,
    "event_chi2" ->
      """WITH cells AS (SELECT event_type,
        |    CAST(isodow(CAST(ts AS DATE)) AS INT) AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r
        |  FROM cells GROUP BY event_type),
        |ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c
        |  FROM cells GROUP BY dow),
        |tt AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
        |SELECT event_type, dow, o,
        |  CAST(CAST(r AS HUGEINT) * c * 1000 // n AS BIGINT) AS e_milli,
        |  CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |    * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |    * 1000000 // (CAST(n AS HUGEINT) * r * c) AS BIGINT)
        |    AS contrib_ppm
        |FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
        |CROSS JOIN tt
        |ORDER BY event_type, dow""".stripMargin,
    "event_gini" ->
      """WITH p AS (SELECT user_id,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |r AS (SELECT cents,
        |    row_number() OVER (ORDER BY cents, user_id) AS rk FROM p)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents,
        |  CAST((2 * SUM(CAST(rk AS HUGEINT) * cents)
        |      - (CAST(COUNT(*) AS HUGEINT) + 1) * SUM(cents))
        |    * 1000000 // (CAST(COUNT(*) AS HUGEINT) * SUM(cents))
        |    AS BIGINT) AS gini_ppm
        |FROM r""".stripMargin,
    "ts_autocorr" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
        |spine AS (SELECT t.event_type,
        |    unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY))::DATE AS d
        |  FROM (SELECT DISTINCT event_type FROM daily) t, span s),
        |y AS (SELECT sp.event_type,
        |    CAST(sp.d - DATE '1970-01-01' AS BIGINT) AS i,
        |    COALESCE(dl.x, 0) AS x
        |  FROM spine sp LEFT JOIN daily dl
        |    ON sp.event_type = dl.event_type AND sp.d = dl.d),
        |ks AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag),
        |pr AS (SELECT c.event_type, k.lag, c.x AS xc, p.x AS xp
        |  FROM y c CROSS JOIN ks k
        |  JOIN y p ON p.event_type = c.event_type AND p.i = c.i - k.lag),
        |m AS (SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(xc) AS BIGINT) AS sx, CAST(SUM(xp) AS BIGINT) AS sy,
        |    CAST(SUM(xc * xp) AS BIGINT) AS sxy,
        |    CAST(SUM(xc * xc) AS BIGINT) AS sxx,
        |    CAST(SUM(xp * xp) AS BIGINT) AS syy
        |  FROM pr GROUP BY 1, 2),
        |v AS (SELECT event_type, lag, n, sx, sy, sxy,
        |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS vx,
        |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vy
        |  FROM m)
        |SELECT event_type, lag, n,
        |  CASE WHEN vx > 0 AND vy > 0 THEN
        |    round(CAST(CAST(n AS HUGEINT) * sxy
        |        - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |      / (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE))), 6)
        |    END AS r_acf
        |FROM v ORDER BY event_type, lag""".stripMargin,
    "ts_interpolate" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
        |spine AS (SELECT t.event_type,
        |    unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY))::DATE AS d
        |  FROM (SELECT DISTINCT event_type FROM daily) t, span s),
        |r0 AS (SELECT sp.event_type, sp.d, dl.n,
        |    row_number() OVER (PARTITION BY sp.event_type ORDER BY sp.d)
        |      AS rn
        |  FROM spine sp LEFT JOIN daily dl
        |    ON sp.event_type = dl.event_type AND sp.d = dl.d),
        |j AS (SELECT event_type, d, n, rn,
        |    last_value(n IGNORE NULLS) OVER
        |      (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_n,
        |    last_value(CASE WHEN n IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_rn,
        |    first_value(n IGNORE NULLS) OVER
        |      (w ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS next_n,
        |    first_value(CASE WHEN n IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER (w ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS next_rn
        |  FROM r0
        |  WINDOW w AS (PARTITION BY event_type ORDER BY d))
        |SELECT event_type, d, n, (n IS NULL) AS is_interp,
        |  CAST(CASE WHEN n IS NOT NULL THEN n * 1000
        |    WHEN prev_rn IS NOT NULL AND next_rn IS NOT NULL THEN
        |      (prev_n * (next_rn - rn) + next_n * (rn - prev_rn))
        |        * 1000 // (next_rn - prev_rn)
        |    END AS BIGINT) AS n_milli
        |FROM j ORDER BY event_type, d""".stripMargin,
    "event_rfm" ->
      """WITH p AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT MAX(d) AS d_max FROM p),
        |b AS (SELECT user_id,
        |    CAST(date_diff('day', MAX(d), d_max) AS BIGINT) AS recency_days,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(cents) AS BIGINT) AS monetary_cents
        |  FROM p, a GROUP BY user_id, d_max),
        |n AS (SELECT COUNT(*) AS n_total FROM b),
        |rk AS (SELECT user_id, recency_days, frequency, monetary_cents,
        |    row_number() OVER (ORDER BY recency_days, user_id) AS rr,
        |    row_number() OVER (ORDER BY frequency DESC, user_id) AS rf,
        |    row_number() OVER (ORDER BY monetary_cents DESC, user_id) AS rm
        |  FROM b)
        |SELECT user_id, recency_days, frequency, monetary_cents,
        |  CAST(5 - (rr - 1) * 5 // n_total AS INT) AS r,
        |  CAST(5 - (rf - 1) * 5 // n_total AS INT) AS f,
        |  CAST(5 - (rm - 1) * 5 // n_total AS INT) AS m,
        |  CAST((5 - (rr - 1) * 5 // n_total) * 100
        |    + (5 - (rf - 1) * 5 // n_total) * 10
        |    + (5 - (rm - 1) * 5 // n_total) AS INT) AS segment
        |FROM rk, n ORDER BY user_id""".stripMargin,
    "event_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events),
        |a AS (SELECT user_id, d,
        |    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
        |      AS INT) AS anchor
        |  FROM days)
        |SELECT user_id, MIN(d) AS streak_start, MAX(d) AS streak_end,
        |  CAST(COUNT(*) AS BIGINT) AS streak_days
        |FROM a GROUP BY user_id, anchor
        |ORDER BY user_id, streak_start""".stripMargin,
    "event_seasonality" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |dd AS (SELECT event_type, d, x, CAST(isodow(d) AS INT) AS dow
        |  FROM daily),
        |wk AS (SELECT event_type, dow, CAST(SUM(x) AS BIGINT) AS total_w,
        |    CAST(COUNT(*) AS BIGINT) AS n_w
        |  FROM dd GROUP BY 1, 2)
        |SELECT dd.event_type, d, dd.dow, x, n_w, total_w,
        |  CAST(x * n_w - total_w AS BIGINT) AS resid_scaled,
        |  abs(x * n_w - total_w) > total_w AS excess
        |FROM dd JOIN wk ON dd.event_type = wk.event_type
        |  AND dd.dow = wk.dow
        |ORDER BY dd.event_type, d""".stripMargin,
    "ts_ewma" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, d, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        |  FROM daily)
        |SELECT t.event_type, t.d, t.x,
        |  SUM(h.x * power(0.5, t.rn - h.rn)) AS decay_sum
        |FROM r t JOIN r h ON h.event_type = t.event_type
        |  AND h.rn <= t.rn AND h.rn > t.rn - 20
        |GROUP BY t.event_type, t.d, t.x
        |ORDER BY t.event_type, t.d""".stripMargin,
    "event_cusum" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    COUNT(*) AS x FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(SUM(x) AS BIGINT) AS total,
        |    COUNT(*) AS nd FROM daily GROUP BY 1),
        |sr AS (SELECT daily.event_type, d, x, total,
        |    SUM(x * nd - total) OVER (PARTITION BY daily.event_type
        |      ORDER BY d) AS s
        |  FROM daily JOIN st USING (event_type)),
        |m AS (SELECT event_type, d, x, total, s,
        |    MIN(s) OVER (PARTITION BY event_type ORDER BY d) AS smin
        |  FROM sr)
        |SELECT event_type, d, CAST(x AS BIGINT) AS x,
        |  CAST(s - LEAST(smin, 0) AS BIGINT) AS cusum,
        |  (s - LEAST(smin, 0)) > total * 2 AS alarm
        |FROM m ORDER BY event_type, d""".stripMargin,
    "event_paths" ->
      """WITH o AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rk
        |  FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rk)
        |    AS path
        |  FROM o WHERE rk <= 5 GROUP BY user_id)
        |SELECT path, COUNT(*) AS n_users FROM p
        |GROUP BY path ORDER BY n_users DESC, path""".stripMargin,
    "event_retention" ->
      """WITH acts AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events),
        |coh AS (SELECT user_id, MIN(d) AS cohort_day FROM acts
        |  GROUP BY user_id)
        |SELECT c.cohort_day,
        |  CAST(FLOOR((a.d - c.cohort_day) / 7) AS INT) AS week_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM acts a JOIN coh c USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "event_funnel" ->
      """WITH per AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0,
        |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t1,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
        |  FROM events GROUP BY user_id),
        |f AS (SELECT
        |    COUNT(CASE WHEN t0 IS NOT NULL THEN 1 END) AS s0,
        |    COUNT(CASE WHEN t0 < t1 THEN 1 END) AS s1,
        |    COUNT(CASE WHEN t0 < t1 AND t1 < t2 THEN 1 END) AS s2
        |  FROM per)
        |SELECT 1 AS step_idx, 'view' AS step, s0 AS n_users,
        |  ((s0 * 20000 + s0) // (2 * s0)) / 10000.0 AS pct FROM f
        |UNION ALL SELECT 2, 'click', s1,
        |  ((s1 * 20000 + s0) // (2 * s0)) / 10000.0 FROM f
        |UNION ALL SELECT 3, 'purchase', s2,
        |  ((s2 * 20000 + s0) // (2 * s0)) / 10000.0 FROM f
        |ORDER BY step_idx""".stripMargin,
    "scd2_intervals" ->
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (SELECT user_id, event_type, ts, event_id FROM o
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type AS state, ts AS valid_from,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS valid_to,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    IS NULL AS is_current
        |FROM ch
        |ORDER BY user_id, valid_from""".stripMargin,
    "event_attribution" ->
      """WITH t AS (SELECT user_id, event_id, ts, event_type, value,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase'
        |        THEN struct_pack(t_ts := ts, t_type := event_type) END
        |      IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT CASE WHEN touch IS NOT NULL
        |    AND CAST(ts AS DATE) - CAST(touch.t_ts AS DATE) <= 7
        |    THEN touch.t_type ELSE 'organic' END AS channel,
        |  COUNT(*) AS n_purchases,
        |  ROUND(SUM(CAST(round(value * 100) AS BIGINT)) / 100.0, 2)
        |    AS revenue
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "event_transitions" ->
      """WITH p AS (SELECT event_type AS src,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |  FROM events),
        |c AS (SELECT src, dst, COUNT(*) AS n FROM p
        |  WHERE dst IS NOT NULL GROUP BY src, dst)
        |SELECT src, dst, n,
        |  ((n * 20000 + SUM(n) OVER (PARTITION BY src))
        |    // (2 * SUM(n) OVER (PARTITION BY src))) / 10000.0 AS p
        |FROM c ORDER BY src, dst""".stripMargin,
    "ts_gapfill" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT MIN(CAST(ts AS DATE)) AS d0,
        |    MAX(CAST(ts AS DATE)) AS d1 FROM events),
        |spine AS (SELECT t.event_type,
        |    unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY))::DATE AS d
        |  FROM (SELECT DISTINCT event_type FROM events) t, span s)
        |SELECT sp.event_type, sp.d,
        |  COALESCE(dl.n, 0) AS n,
        |  last_value(CASE WHEN dl.cents >= 0
        |      THEN (dl.cents * 200 + dl.n) // (2 * dl.n)
        |      ELSE -((-dl.cents * 200 + dl.n) // (2 * dl.n))
        |    END IGNORE NULLS)
        |    OVER (PARTITION BY sp.event_type ORDER BY sp.d) / 10000.0
        |    AS avg_ff
        |FROM spine sp LEFT JOIN daily dl
        |  ON sp.event_type = dl.event_type AND sp.d = dl.d
        |ORDER BY sp.event_type, sp.d""".stripMargin,
    "event_cohort_ltv" ->
      """WITH coh AS MATERIALIZED (SELECT user_id,
        |    MIN(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |sz AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_n
        |  FROM coh GROUP BY cohort_day),
        |rev AS (SELECT c.cohort_day,
        |    CAST(date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) // 7
        |      AS INT) AS week_offset,
        |    CAST(SUM(CAST(floor(e.value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS rev_cents
        |  FROM events e JOIN coh c USING (user_id)
        |  WHERE e.event_type = 'purchase' GROUP BY 1, 2),
        |cum AS (SELECT cohort_day, week_offset, rev_cents,
        |    CAST(SUM(rev_cents) OVER (PARTITION BY cohort_day
        |      ORDER BY week_offset) AS BIGINT) AS cum_cents
        |  FROM rev)
        |SELECT m.cohort_day, m.week_offset, m.rev_cents, m.cum_cents,
        |  s.cohort_n,
        |  CAST(m.cum_cents * 1000 // s.cohort_n AS BIGINT) AS ltv_milli
        |FROM cum m JOIN sz s USING (cohort_day)
        |ORDER BY cohort_day, week_offset""".stripMargin,
    "ts_forecast_naive" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
        |spine AS (SELECT t.event_type, g.d
        |  FROM (SELECT DISTINCT event_type FROM daily) t
        |  CROSS JOIN (SELECT UNNEST(generate_series(d0, d1,
        |    INTERVAL 1 DAY))::DATE AS d FROM span) g),
        |z AS (SELECT s.event_type, s.d, CAST(COALESCE(dl.x, 0) AS BIGINT)
        |    AS x
        |  FROM spine s LEFT JOIN daily dl
        |    ON s.event_type = dl.event_type AND s.d = dl.d),
        |l AS (SELECT event_type, x,
        |    lag(x, 7) OVER (PARTITION BY event_type ORDER BY d) AS f7,
        |    lag(x, 1) OVER (PARTITION BY event_type ORDER BY d) AS f1
        |  FROM z),
        |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored,
        |    CAST(SUM(abs(x - f7)) AS BIGINT) AS sae7,
        |    CAST(SUM(x - f7) AS BIGINT) AS se7,
        |    CAST(SUM(abs(x - f1)) AS BIGINT) AS sae1
        |  FROM l WHERE f7 IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n_scored, sae7, se7, sae1,
        |  CAST(sae7 * 1000 // n_scored AS BIGINT) AS mae7_milli,
        |  CAST(sae1 * 1000 // n_scored AS BIGINT) AS mae1_milli
        |FROM agg ORDER BY event_type""".stripMargin,
    // Mirrors tsHoltOn: the dyadic recursion replayed row-by-row by a
    // recursive CTE; floor(·/2.0) is the oracle's spelling of the
    // Spark side's arithmetic shiftright(·, 1) (exact, < 2^52).
    "ts_holt_winters" -> holtWintersOracleSql,
    "ts_holt" ->
      """WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
        |spine AS (SELECT t.event_type, g.d
        |  FROM (SELECT DISTINCT event_type FROM daily) t
        |  CROSS JOIN (SELECT UNNEST(generate_series(d0, d1,
        |    INTERVAL 1 DAY))::DATE AS d FROM span) g),
        |z AS (SELECT s.event_type, s.d,
        |    CAST(COALESCE(dl.x, 0) AS BIGINT) AS x,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY s.event_type
        |      ORDER BY s.d) AS BIGINT) AS rn
        |  FROM spine s LEFT JOIN daily dl
        |    ON s.event_type = dl.event_type AND s.d = dl.d),
        |h(event_type, rn, l, b, sse) AS (
        |  SELECT event_type, rn, x, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  FROM z WHERE rn = 1
        |  UNION ALL
        |  SELECT z.event_type, z.rn,
        |    CAST(floor((z.x + h.l + h.b) / 2.0) AS BIGINT),
        |    CAST(floor((CAST(floor((z.x + h.l + h.b) / 2.0) AS BIGINT)
        |      - h.l + h.b) / 2.0) AS BIGINT),
        |    h.sse + (z.x - h.l - h.b) * (z.x - h.l - h.b)
        |  FROM h JOIN z ON z.event_type = h.event_type
        |    AND z.rn = h.rn + 1),
        |last AS (SELECT event_type, MAX(rn) AS rn FROM h GROUP BY 1)
        |SELECT h.event_type, h.rn AS n_days, h.l AS level, h.b AS trend,
        |  h.sse, h.l + h.b AS fc_1, h.l + 7 * h.b AS fc_7
        |FROM h JOIN last ON last.event_type = h.event_type
        |  AND last.rn = h.rn
        |ORDER BY h.event_type""".stripMargin,
    // Mirrors eventSeqPatternsOn: greedy earliest-occurrence
    // subsequence containment decided by three bounded rollups.
    "event_seq_patterns" ->
      """WITH occ AS (SELECT user_id, event_type AS t, ts FROM events),
        |n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM occ),
        |fa AS (SELECT user_id, t AS a, MIN(ts) AS ta FROM occ
        |  GROUP BY 1, 2),
        |lc AS (SELECT user_id, t AS c, MAX(ts) AS tc FROM occ
        |  GROUP BY 1, 2),
        |tab AS (SELECT o.user_id, fa.a, o.t AS b, MIN(o.ts) AS tab
        |  FROM occ o JOIN fa ON fa.user_id = o.user_id
        |  WHERE o.ts > fa.ta GROUP BY 1, 2, 3),
        |pairs AS (SELECT CAST(2 AS BIGINT) AS len,
        |    concat_ws('>', a, b) AS pattern,
        |    CAST(COUNT(*) AS BIGINT) AS support
        |  FROM tab GROUP BY 2),
        |triples AS (SELECT CAST(3 AS BIGINT) AS len,
        |    concat_ws('>', tab.a, tab.b, lc.c) AS pattern,
        |    CAST(COUNT(*) AS BIGINT) AS support
        |  FROM tab JOIN lc ON lc.user_id = tab.user_id
        |  WHERE lc.tc > tab.tab GROUP BY 2),
        |u AS (SELECT * FROM pairs UNION ALL SELECT * FROM triples)
        |SELECT len, pattern, support,
        |  CAST(support * 1000000 // n.n_users AS BIGINT) AS support_ppm
        |FROM u CROSS JOIN n
        |ORDER BY len, pattern""".stripMargin,
    "sample_bootstrap" ->
      """WITH p AS (SELECT event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |rs AS (SELECT UNNEST(range(1, 33))::BIGINT AS b),
        |m AS (SELECT p.cents, rs.b,
        |    ((p.event_id % 1000000007) * 912367 + rs.b * 514229 + 40503)
        |      % 1000000007 AS m1
        |  FROM p CROSS JOIN rs),
        |u AS (SELECT cents, b,
        |    (m1 * 912367 + 40503) % 1000000007 AS u FROM m),
        |k AS (SELECT b, cents,
        |    CAST(u >= 367879443 AS BIGINT) + CAST(u >= 735758887 AS BIGINT)
        |    + CAST(u >= 919698609 AS BIGINT)
        |    + CAST(u >= 981011849 AS BIGINT)
        |    + CAST(u >= 996340160 AS BIGINT)
        |    + CAST(u >= 999405822 AS BIGINT)
        |    + CAST(u >= 999916765 AS BIGINT)
        |    + CAST(u >= 999989757 AS BIGINT) AS k
        |  FROM u)
        |SELECT b, CAST(SUM(k) AS BIGINT) AS n_drawn,
        |  CAST(SUM(k * cents) AS BIGINT) AS total_cents
        |FROM k GROUP BY b ORDER BY b""".stripMargin,
    "event_mannwhitney" ->
      """WITH p AS (SELECT (user_id % 2)::INT AS variant,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS t,
        |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS t1
        |  FROM p GROUP BY cents),
        |r AS (SELECT t, t1, CAST(COALESCE(SUM(t) OVER (ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cb
        |  FROM v),
        |a AS (SELECT CAST(SUM(t - t1) AS BIGINT) AS n0,
        |    CAST(SUM(t1) AS BIGINT) AS n1,
        |    CAST(SUM(t1 * (2 * cb + t + 1)) AS BIGINT) AS r1_x2,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie_cube
        |  FROM r),
        |b AS (SELECT n0, n1, r1_x2, r1_x2 - n1 * (n1 + 1) AS u1_x2,
        |    tie_cube FROM a),
        |z AS (SELECT n0, n1, r1_x2, u1_x2, tie_cube,
        |  CASE WHEN n0 > 0 AND n1 > 0
        |      AND (n0 + n1 + 1) * (n0 + n1) * (n0 + n1 - 1) > tie_cube
        |    THEN CAST(CAST(3000 AS HUGEINT)
        |      * (u1_x2 - CAST(n0 AS HUGEINT) * n1)
        |      * (u1_x2 - CAST(n0 AS HUGEINT) * n1)
        |      * (n0 + n1) * (n0 + n1 - 1)
        |      // (CAST(n0 AS HUGEINT) * n1 * ((CAST(n0 AS HUGEINT) + n1 + 1)
        |        * (n0 + n1) * (n0 + n1 - 1) - tie_cube))
        |      AS BIGINT) END AS z2_milli
        |  FROM b)
        |SELECT n0, n1, r1_x2, u1_x2, tie_cube, z2_milli,
        |  z2_milli > 3841 AS significant FROM z""".stripMargin,
    "event_ks" ->
      """WITH p AS (SELECT (user_id % 2)::INT AS variant,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT cents,
        |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v0,
        |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v1
        |  FROM p GROUP BY cents),
        |c AS (SELECT SUM(v0) OVER (ORDER BY cents) AS c0,
        |    SUM(v1) OVER (ORDER BY cents) AS c1,
        |    SUM(v0) OVER () AS t0, SUM(v1) OVER () AS t1
        |  FROM v),
        |a AS (SELECT CAST(MAX(t0) AS BIGINT) AS n0,
        |    CAST(MAX(t1) AS BIGINT) AS n1,
        |    CAST(MAX(abs(c0 * t1 - c1 * t0)) AS BIGINT) AS d_num FROM c)
        |SELECT n0, n1, d_num,
        |  CAST(d_num * 1000000 // (n0 * n1) AS BIGINT) AS d_ppm,
        |  CAST(10000 AS HUGEINT) * d_num * d_num
        |    > CAST(18442 AS HUGEINT) * (n0 + n1) * n0 * n1 AS significant
        |FROM a""".stripMargin,
    "ts_ohlc" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    epoch_us(ts) AS us, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type, d
        |      ORDER BY us, event_id) AS ra,
        |    row_number() OVER (PARTITION BY event_type, d
        |      ORDER BY us DESC, event_id DESC) AS rd
        |  FROM b)
        |SELECT event_type, d,
        |  CAST(MAX(CASE WHEN ra = 1 THEN cents END) AS BIGINT) AS open,
        |  CAST(MAX(cents) AS BIGINT) AS high,
        |  CAST(MIN(cents) AS BIGINT) AS low,
        |  CAST(MAX(CASE WHEN rd = 1 THEN cents END) AS BIGINT) AS close,
        |  CAST(SUM(cents) AS BIGINT) AS volume,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM r GROUP BY event_type, d ORDER BY event_type, d""".stripMargin,
    "event_survival" ->
      """WITH u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0,
        |    MAX(CAST(ts AS DATE)) AS d1 FROM events GROUP BY user_id),
        |h AS (SELECT MAX(d1) AS m FROM u),
        |t AS (SELECT CAST(date_diff('day', d0, d1) AS BIGINT) AS t,
        |    CASE WHEN date_diff('day', d1, m) > 7 THEN 1 ELSE 0 END
        |      AS churned
        |  FROM u CROSS JOIN h),
        |bt AS (SELECT t, CAST(SUM(churned) AS BIGINT) AS d_events,
        |    CAST(SUM(1 - churned) AS BIGINT) AS n_censored
        |  FROM t GROUP BY t),
        |k AS (SELECT t, d_events, n_censored,
        |    CAST(SUM(d_events + n_censored) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_at_risk
        |  FROM bt)
        |SELECT t, n_at_risk, d_events, n_censored,
        |  CAST(d_events * 1000000 // n_at_risk AS BIGINT) AS hazard_ppm
        |FROM k ORDER BY t""".stripMargin,
    "event_time_to_convert" ->
      """WITH b AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |fv AS (SELECT user_id, MIN(us) AS v_us FROM b
        |  WHERE event_type = 'view' GROUP BY user_id),
        |conv AS (SELECT b.user_id, fv.v_us, MIN(b.us) AS p_us
        |  FROM b JOIN fv USING (user_id)
        |  WHERE b.event_type = 'purchase' AND b.us > fv.v_us
        |  GROUP BY b.user_id, fv.v_us),
        |lat AS (SELECT (p_us - v_us) // 1000000 AS lat_sec FROM conv),
        |nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_view_users FROM fv),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
        |    quantile_cont(lat_sec, 0.5) AS p50_sec,
        |    quantile_cont(lat_sec, 0.9) AS p90_sec,
        |    CAST(MAX(lat_sec) AS BIGINT) AS max_sec
        |  FROM lat)
        |SELECT n_view_users, n_converted,
        |  CAST(n_converted * 1000000 // n_view_users AS BIGINT) AS cr_ppm,
        |  p50_sec, p90_sec, max_sec
        |FROM a CROSS JOIN nv""".stripMargin,
  )
}
