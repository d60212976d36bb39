package graft.functions

import graft.{Guards, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable set sketches beyond single-stream distinct counts — the
  * KMV/theta family (Bar-Yossef et al. 2002 "Counting distinct
  * elements in a data stream"; Dasgupta et al. 2016, the Theta Sketch
  * Framework behind Apache DataSketches), which answers what HLL
  * cannot: cardinalities of UNIONS and INTERSECTIONS across many
  * overlapping segments — the "how many users did both A and B"
  * question every audience/overlap dashboard asks at 100 TB, where
  * the exact distinct-join is the query you must never run.
  *
  * The sketch of a set is its k smallest hash values; sketches merge
  * by union-then-rekeep-k (associative, commutative — the mergeable-
  * summaries property that lets every partition sketch locally and a
  * tiny reduce combine them). The estimator is (k-1)/θ with θ = the
  * k-th smallest hash as a fraction of the hash space — spelled here
  * in pure integer arithmetic ((k-1)·P div h_k), so the whole
  * operator is hash/sort/count: bit-identical in any engine, no
  * floats anywhere.
  *
  * Unlike agg_approx_distinct (HLL++, bounds-mode oracle), this
  * sketch is DETERMINISTIC given the seeded hash — the DuckDB oracle
  * replays it exactly; and the output carries its own accuracy eval
  * (exact intersection + signed error) per the catalog's
  * "measure, don't guess" convention (sim_ann_recall_matrix).
  */
object Sketches {

  /** Sketch size: 32 keeps the estimator honest (types hold ~150+
    * distinct users at the gate sf, so θ < 1 and estimation is real
    * work, not a pass-through). Relative error ~ 1/√(k−2) ≈ 18%. */
  val SketchK = 32

  private[graft] val P = 1000000007L

  /** L17a: theta-sketch audience overlap — per event-type pair, the
    * KMV estimates of each audience, their union (merged sketch) and
    * their intersection (inclusion–exclusion, clamped at 0), beside
    * the exact intersection and the signed error (estimate − exact,
    * plain integer subtraction — engine-portable, unlike a ratio).
    *
    * Shapes: ONE aggregation over the raw fact stream builds every
    * per-type sketch through the mergeable [[graft.plans.KmvAgg]]
    * buffer (map-side partials of ≤ k longs, merged exactly), the
    * pair relation is |types|² rows of pure array arithmetic, and
    * the union sketch never touches the facts again. The exact
    * column is a distinct-shuffle — affordable here, and exactly the
    * pass the sketch exists to replace at 100×; it stays in the
    * output as the in-catalog accuracy eval. */
  def sketchThetaOn(events: DataFrame, k: Int = SketchK): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    // ONE aggregation builds every sketch: the mergeable KmvAgg
    // buffer ([[graft.plans.KmvAgg]]) holds the k smallest distinct
    // hashes, so partitions sketch locally and the shuffle carries
    // <= k longs per (partition, type) — no distinct-shuffle of the
    // full hash stream, the property that makes theta sketches THE
    // overlap tool at 100 TB.
    // a set with fewer than k distinct hashes is in EXACT MODE
    // (DataSketches semantics): the sketch IS the whole distinct set,
    // the estimate is its size, no k-th value involved
    val sk = events
      .select(col("event_type"),
        expr(s"(user_id * 2654435761 + 12345) % $P").as("h"))
      .groupBy("event_type")
      .agg(graft.plans.KmvAgg.kmv(col("h"), k).as("sk"))
      .select(col("event_type"), col("sk"),
        when(size(col("sk")) === k, element_at(col("sk"), k)).as("kth"))
    // pair relation: tiny (|types|^2); the merged sketch is pure
    // array arithmetic on the two k-arrays — union, resort, recap
    val pairs = sk
      .select(col("event_type").as("type_a"), col("sk").as("sk_a"),
        col("kth").as("kth_a"))
      .join(sk.select(col("event_type").as("type_b"), col("sk").as("sk_b"),
        col("kth").as("kth_b")), col("type_a") < col("type_b"))
      .withColumn("mu", array_sort(array_union(col("sk_a"), col("sk_b"))))
      .withColumn("kth_u",
        when(size(col("mu")) >= k, element_at(col("mu"), k)))
    // exact distinct intersection — the eval column
    val users = events.select(col("event_type"), col("user_id")).distinct()
    val exact = users.select(col("event_type").as("type_a"), col("user_id"))
      .join(users.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("exact_inter"))
    pairs
      .join(exact, Seq("type_a", "type_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .select(col("type_a"), col("type_b"),
        coalesce(expr(s"${(k - 1) * P}L div kth_a"),
          size(col("sk_a")).cast("long")).as("est_a"),
        coalesce(expr(s"${(k - 1) * P}L div kth_b"),
          size(col("sk_b")).cast("long")).as("est_b"),
        coalesce(expr(s"${(k - 1) * P}L div kth_u"),
          size(col("mu")).cast("long")).as("est_union"),
        col("exact_inter"))
      .withColumn("est_inter",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .withColumn("err", col("est_inter") - col("exact_inter"))
      .select("type_a", "type_b", "est_a", "est_b", "est_union",
        "est_inter", "exact_inter", "err")
      .orderBy("type_a", "type_b")
  }

  def sketchTheta(s: SparkSession, dir: String): DataFrame =
    sketchThetaOn(Tables.events(s, dir))

  /** L17b: mergeable quantile sketch by bottom-k-by-hash sampling —
    * the rank-statistics sibling of [[sketchThetaOn]], built on
    * [[graft.plans.KmvPairAgg]]: each group keeps the `k`
    * lexicographically smallest distinct (rowhash, value) pairs, a
    * deterministic uniform sample that merges associatively (Agarwal
    * et al., PODS 2012: random samples ARE mergeable summaries — this
    * one derandomized by the seeded row hash, so the DuckDB oracle
    * replays it exactly, unlike GK/KLL whose compaction is
    * state-path-dependent). Quantile estimates are rank picks in the
    * sorted sample under the pinned rule idx = (m−1)·q_ppm div 10⁶ +
    * 1; sampling error ~1/√k in rank (k=256 → ~6%). Below k distinct
    * pairs the sample is the whole group — exact mode. The output
    * carries the exact quantiles (full sort-rank pass — precisely the
    * cost the sketch replaces at 100×) and signed errors as the
    * in-catalog accuracy eval. Shapes: the sketch is ONE map-side-
    * combined aggregation shipping ≤ k pairs per partition-group; the
    * eval columns are one window rank over the fact scan. */
  def sketchQuantileOn(lineitem: DataFrame, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"need k >= 2, got $k")
    val rows = lineitem.select(
      col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents"),
      expr(s"((l_orderkey * 31 + l_linenumber) % $P * 2654435761) % $P")
        .as("h"))
    val sk = rows.groupBy("l_returnflag").agg(
        graft.plans.KmvPairAgg.kmvSample(col("h"), col("cents"), k).as("vals"))
      .withColumn("sv", array_sort(col("vals")))
      .withColumn("m", size(col("sv")).cast("long"))
      .select(col("l_returnflag"), col("m"),
        element_at(col("sv"),
          expr("CAST((m - 1) * 500000 div 1000000 + 1 AS INT)"))
          .as("p50_cents"),
        element_at(col("sv"),
          expr("CAST((m - 1) * 950000 div 1000000 + 1 AS INT)"))
          .as("p95_cents"))
    // exact rank picks under the identical rule — the accuracy eval.
    // The group size rides the SAME sorted window spec under an
    // unbounded frame, so Catalyst folds row_number and count into
    // ONE WindowExec (two frame processors, one sort, one pass) —
    // not the second whole-partition-buffering window pass a bare
    // count().over(partitionBy) costs.
    val wr = Window.partitionBy("l_returnflag").orderBy("cents", "h")
    val exact = rows
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wr.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy("l_returnflag").agg(
        max(col("n")).as("n"),
        max(when(expr("rn = (n - 1) * 500000 div 1000000 + 1"),
          col("cents"))).as("exact_p50"),
        max(when(expr("rn = (n - 1) * 950000 div 1000000 + 1"),
          col("cents"))).as("exact_p95"))
    sk.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n"), col("m"),
        col("p50_cents"), col("p95_cents"),
        col("exact_p50"), col("exact_p95"),
        (col("p50_cents") - col("exact_p50")).as("err_p50"),
        (col("p95_cents") - col("exact_p95")).as("err_p95"))
      .orderBy("l_returnflag")
  }

  def sketchQuantile(s: SparkSession, dir: String): DataFrame =
    sketchQuantileOn(Tables.lineitem(s, dir))

  /** Relative-error quantile sketch on LOG buckets — the DDSketch
    * idea (Masson et al., VLDB 2019) at γ = 2: every positive value
    * collapses to bucket ⌊log₂ v⌋, computed EXACTLY as
    * length(bin(v)) − 1 (both engines print minimal binary — no
    * float log anywhere), so the per-group sketch state is a ≤ 64-row
    * (bucket, count) histogram — trivially mergeable, constant-size,
    * the 100 TB shape. Quantile readout walks the collapsed
    * histogram's cumulative counts under the house rank rule and
    * answers the bucket MIDPOINT 3·2^(b−1) (b = 0 → 1), guaranteed
    * within ×1.5 of any value in the bucket; the in-catalog eval
    * joins the exact rank picks beside the estimates with signed
    * errors and a within-×2 flag, per the sketch-eval convention.
    * γ = 2 trades DDSketch's usual 1–2% for a zero-float contract;
    * tighter γ needs log buckets only a float log can index — the
    * documented boundary. */
  def sketchLogHistogramOn(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = lineitem.select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
          .as("cents"))
      .filter(col("cents") > 0)
      .withColumn("b", (length(bin(col("cents"))) - 1).cast("long"))
      .localCheckpoint(true) // sketch + exact eval both read it
    val hist = rows.groupBy("l_returnflag", "b")
      .agg(count(lit(1)).as("c"))
    val wb = Window.partitionBy("l_returnflag").orderBy("b")
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy("l_returnflag")))
    val est = cum.groupBy("l_returnflag")
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n - 1) * 500000 DIV 1000000 + 1"),
          col("b"))).as("b50"),
        min(when(col("cum") >= expr("(n - 1) * 950000 DIV 1000000 + 1"),
          col("b"))).as("b95"))
      .select(col("l_returnflag"), col("n"),
        expr("""CASE WHEN b50 = 0 THEN CAST(1 AS BIGINT)
               |ELSE shiftleft(CAST(3 AS BIGINT), CAST(b50 - 1 AS INT))
               |END""".stripMargin).as("p50_est"),
        expr("""CASE WHEN b95 = 0 THEN CAST(1 AS BIGINT)
               |ELSE shiftleft(CAST(3 AS BIGINT), CAST(b95 - 1 AS INT))
               |END""".stripMargin).as("p95_est"))
    val wr = Window.partitionBy("l_returnflag").orderBy("cents")
    val exact = rows
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("l_returnflag")))
      .groupBy("l_returnflag").agg(
        max(when(expr("rn = (n - 1) * 500000 DIV 1000000 + 1"),
          col("cents"))).as("exact_p50"),
        max(when(expr("rn = (n - 1) * 950000 DIV 1000000 + 1"),
          col("cents"))).as("exact_p95"))
    est.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n"),
        col("p50_est"), col("p95_est"),
        col("exact_p50"), col("exact_p95"),
        (col("p50_est") - col("exact_p50")).as("err_p50"),
        (col("p95_est") - col("exact_p95")).as("err_p95"),
        (col("p50_est") <= col("exact_p50") * 2 &&
          col("exact_p50") <= col("p50_est") * 2 &&
          col("p95_est") <= col("exact_p95") * 2 &&
          col("exact_p95") <= col("p95_est") * 2).as("within_2x"))
      .orderBy("l_returnflag")
  }

  def sketchLogHistogram(s: SparkSession, dir: String): DataFrame =
    sketchLogHistogramOn(Tables.lineitem(s, dir))

  /** L17c: theta-sketch ROLLUP — the dashboard move the mergeable-
    * summaries property exists for: per-segment sketches built once
    * (here per event type, by the same [[graft.plans.KmvAgg]] pass as
    * [[sketchThetaOn]]) merge into the ALL-segments audience without
    * touching the fact stream again — union = pool the ≤ k·|types|
    * hashes, re-keep the k smallest (exact mode below k). At 100 TB
    * this is the difference between re-scanning the corpus per rollup
    * cell and merging |cells| tiny arrays. The exact global distinct
    * (the shuffle the sketch replaces) ships beside the estimate with
    * the signed error, per the in-catalog-eval convention. The
    * pooled-hash rank window is bounded by k·|types| rows — never
    * data-sized. */
  def sketchThetaRollupOn(events: DataFrame, k: Int = SketchK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"need k >= 2, got $k")
    val sk = events
      .select(col("event_type"),
        expr(s"(user_id * 2654435761 + 12345) % $P").as("h"))
      .groupBy("event_type")
      .agg(graft.plans.KmvAgg.kmv(col("h"), k).as("sk"))
    val types = sk.agg(count(lit(1)).as("n_types"))
    val pooled = Guards.requireBounded(
        sk.select(explode(col("sk")).as("h")).distinct(),
        1L << 20, "sketch_theta pooled k-minimum values")
      .withColumn("rn",
        row_number().over(Window.partitionBy(Guards.one).orderBy("h")))
      .filter(col("rn") <= k)
      .agg(count(lit(1)).as("m"),
        max(when(col("rn") === k, col("h"))).as("kth"))
    val exact = events.agg(countDistinct(col("user_id")).as("exact_users"))
    pooled.crossJoin(broadcast(types)).crossJoin(broadcast(exact))
      .select(col("n_types"),
        coalesce(expr(s"${(k - 1) * P}L div kth"), col("m")).as("est_users"),
        col("exact_users"))
      .withColumn("err", col("est_users") - col("exact_users"))
  }

  def sketchThetaRollup(s: SparkSession, dir: String): DataFrame =
    sketchThetaRollupOn(Tables.events(s, dir))

  /** Bloom geometry for [[sketchBloomFprOn]]: 2^13 bits / 3 hashes
    * puts the catalog member set near load kn/m ≈ 0.5, where the FPR
    * (~6%) is actually measurable on the probe set. */
  val BloomBitsLog2 = 13
  val BloomK = 3

  /** L17e: Bloom-filter false-positive calibration — MEASURE the FPR
    * against guaranteed non-members and put it beside the textbook
    * prediction (1 − e^(−kn/m))^k (Bloom 1970; Broder & Mitzenmacher
    * 2004 survey): the eval that decides whether a filter's hash
    * family is behaving before a pipeline trusts "maybe" answers at
    * scale (the in-catalog accuracy-eval discipline of
    * sim_ann_recall_eval / dedup_minhash_estimate, applied to the
    * dedup_bloom machinery — same double-mix position hashes, same
    * broadcast bit-set probe). The fill ratio n_set_bits/m rides
    * along as the second theory check (expected m·(1−e^(−kn/m))).
    * Theory crosses the engines through the pinned round(,9)-then-
    * floor boundary (the lm_kneser_ney exp contract); n/m is exact
    * in double because m is a power of two. Measured side is pure
    * integer. One pass over members, k broadcast probes, 1-row out. */
  def sketchBloomFprOn(members: DataFrame, probes: DataFrame,
      bitsLog2: Int = BloomBitsLog2, k: Int = BloomK): DataFrame = {
    require(bitsLog2 >= 4 && bitsLog2 <= 30, s"bad bitsLog2 $bitsLog2")
    require(k >= 1 && k <= 8, s"bad k $k")
    val m = 1L << bitsLog2
    // xorshift-mixed key hash (splitmix-style): the multiplicative-
    // only h = key·A mod P maps an arithmetic key progression to a
    // shifted progression, and a probe set at a constant key offset
    // then lands on the member bits almost surely (this op MEASURED
    // that pathology at 995333 ppm vs 75502 theory before the mix was
    // added — the calibration catching its own hash family)
    def h(key: Column): Column = {
      val a = key * lit(2654435761L) + lit(1013904223L)
      val b = a.bitwiseXOR(shiftright(a, 15))
      val d = pmod(pmod(b, lit(P)) * lit(2246822519L), lit(P))
      pmod(d.bitwiseXOR(shiftright(d, 13)), lit(P))
    }
    def pos(hc: Column, j: Int): Column =
      pmod(hc * lit(2L * j + 3) + lit(97L * j + 31), lit(P)) % lit(m)
    val mh = members.select(h(col("key")).as("h"))
      .localCheckpoint(true) // k bit projections + the n scalar
    val bits = (0 until k)
      .map(j => mh.select(pos(col("h"), j).as("bitpos")))
      .reduce(_ union _).distinct()
      .localCheckpoint(true) // k probe joins + the fill count
    val ph = probes.select(h(col("key")).as("h"))
    val flagged = (0 until k).foldLeft(ph) { (df, j) =>
      df.join(broadcast(bits.withColumnRenamed("bitpos", s"bp$j")),
        pos(col("h"), j) === col(s"bp$j"), "left")
    }.withColumn("maybe",
      (0 until k).map(j => col(s"bp$j").isNotNull).reduce(_ && _))
    flagged
      .agg(count(lit(1)).as("n_probes"),
        sum(col("maybe").cast("long")).as("n_false_pos"))
      .crossJoin(broadcast(mh.agg(count(lit(1)).as("n_members"))))
      .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_set_bits"))))
      .select(lit(m).as("m_bits"), lit(k).as("k_hashes"),
        col("n_members"), col("n_set_bits"), col("n_probes"),
        col("n_false_pos"),
        expr("CAST(n_false_pos * 1000000 DIV n_probes AS BIGINT)")
          .as("measured_fpr_ppm"),
        expr(s"""CAST(floor(round(power(
               |  1.0 - exp(-($k.0 * n_members) / $m.0), $k.0), 9)
               |  * 1000000) AS BIGINT)""".stripMargin)
          .as("theory_fpr_ppm"))
  }

  def sketchBloomFpr(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("key"))
    // probes offset into a disjoint key space: guaranteed non-members
    sketchBloomFprOn(keys,
      keys.select((col("key") + 1000000000L).as("key")))
  }

  /** HLL geometry for [[sketchHllOn]]: m = 2⁸ = 256 registers; the
    * hash suffix w = h DIV m lives below P/m < 2²² so its MSB index
    * is ≤ 21 and ρ = 22 − msb ∈ [1, 22] (ρ = 23 for w = 0). */
  val HllM = 256L
  val HllWBits = 22
  /** floor(10⁶ · 0.7213 / (1 + 1.079/256)) — the standard α₂₅₆ bias
    * constant (Flajolet et al. 2007 §5; Heule et al. 2013 use the
    * same family), pinned in micro so both engines share it. */
  val HllAlphaMicro = 718272L

  /** L17f: HyperLogLog distinct-count sketch built from scratch —
    * the OTHER mergeable cardinality sketch beside [[sketchThetaOn]]'s
    * KMV: m=256 registers each holding the max leading-zero rank ρ of
    * the hashed suffix, estimate α·m²/Σ2^(−M_j) with linear-counting
    * fallback below 2.5m when empty registers remain (Flajolet,
    * Fusy, Gandouet, Meunier, AofA 2007). Spark's own
    * approx_count_distinct is HLL++ with an engine-private hash —
    * un-replayable by construction (hence agg_approx_distinct's
    * bounds-mode oracle); THIS one is derandomized on the repo's
    * pinned LCG hash, so the DuckDB oracle replays the registers,
    * the scaled harmonic sum, and the estimate bit-for-bit — a
    * hash-exact HLL next to the bounds-checked built-in.
    *
    * Exactness spelling: ρ needs the MSB index of w, found with a
    * 22-row powers-of-two join (no float log2 — the graph_katz
    * discipline); the harmonic sum is scaled by 2²³ so every term
    * 2^(23−ρ) is a BIGINT and Σ ≤ 256·2²³; the one estimate division
    * runs in DECIMAL(38,0); the linear-counting branch's ln is a
    * documented floor boundary on the 255 possible inputs. Empty
    * registers contribute V·2²³ via arithmetic — no 256-row spine is
    * materialized.
    *
    * Shape: registers collapse FIRST (groupBy (type, bucket) min(w) —
    * map-side combinable, ρ is antitone in w so max ρ = ρ(min w));
    * the powers join runs on ≤ |types|·256 rows, never the fact
    * stream. The exact distinct stays as the in-catalog eval column,
    * the pass the sketch replaces at 100×. */
  /** Estimate finisher over an HLL register-minima grid keyed by
    * `keys` + (bucket, wmin): powers-join MSB → ρ, 2²³-scaled
    * harmonic sum, raw estimate and the linear-counting branch —
    * shared by the batch per-type sketch and the streaming windowed
    * grid (where it runs sink-side over ≤ 256 rows per window). */
  private[graft] def hllFinish(grid: DataFrame,
      keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val pows = grid.sparkSession.range(0, HllWBits)
      .select(col("id").cast("int").as("i"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").as("pw"))
    val rho = grid.join(broadcast(pows), col("pw") <= col("wmin"), "left")
      .groupBy((kc :+ col("bucket")): _*)
      .agg(max(col("i")).as("msb"))
      .select((kc :+ coalesce(lit(HllWBits) - col("msb"),
        lit(HllWBits + 1)).as("rho")): _*)
    val scale = 1L << (HllWBits + 1)
    rho.groupBy(kc: _*)
      .agg(count(lit(1)).as("n_hit"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(${HllWBits + 1} - rho AS INT))")).as("s_hit"))
      .withColumn("v_empty", lit(HllM) - col("n_hit"))
      .withColumn("s_scaled", col("s_hit") + col("v_empty") * lit(scale))
      .withColumn("est_raw", expr(
        s"""CAST(CAST($HllAlphaMicro AS DECIMAL(38,0))
           |  * ${HllM * HllM} * $scale
           |  DIV (CAST(s_scaled AS DECIMAL(38,0)) * 1000000)
           |  AS BIGINT)""".stripMargin))
      .withColumn("est",
        when(col("est_raw") <= lit(5L * HllM / 2) && col("v_empty") > 0,
          expr(s"CAST(floor(CAST($HllM AS DOUBLE) " +
            s"* ln(CAST($HllM AS DOUBLE) / v_empty)) AS BIGINT)"))
          .otherwise(col("est_raw")))
      .drop("s_hit")
  }

  def sketchHllOn(events: DataFrame): DataFrame = {
    val reg = events.select(col("event_type"),
        expr(s"(user_id * 2654435761 + 12345) % $P").as("h"))
      .select(col("event_type"),
        expr(s"h % $HllM").as("bucket"), expr(s"h DIV $HllM").as("w"))
      .groupBy("event_type", "bucket").agg(min(col("w")).as("wmin"))
    val exact = events.select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("exact_users"))
    hllFinish(reg, Seq("event_type"))
      .join(exact, Seq("event_type"))
      .withColumn("err", col("est") - col("exact_users"))
      .select("event_type", "n_hit", "v_empty", "s_scaled",
        "est_raw", "est", "exact_users", "err")
      .orderBy("event_type")
  }

  def sketchHll(s: SparkSession, dir: String): DataFrame =
    sketchHllOn(Tables.events(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_bloom_fpr" -> sketchBloomFpr,
    "sketch_theta" -> sketchTheta,
    "sketch_quantile" -> sketchQuantile,
    "sketch_theta_rollup" -> sketchThetaRollup,
    "sketch_log_histogram" -> sketchLogHistogram,
    "sketch_hll" -> sketchHll,
  )

  val oracles: Map[String, String] = Map(
    // Mirrors sketchHllOn: same LCG hash, powers-join MSB (no float
    // log2), 2^23-scaled harmonic sum, pinned ln floor boundary on
    // the linear-counting branch.
    "sketch_hll" ->
      s"""WITH h AS (SELECT event_type,
         |    (user_id * 2654435761 + 12345) % $P AS h FROM events),
         |mn AS (SELECT event_type, h % $HllM AS bucket,
         |    MIN(h // $HllM) AS wmin
         |  FROM h GROUP BY 1, 2),
         |ms AS (SELECT event_type, bucket, MAX(i) AS msb
         |  FROM mn LEFT JOIN range(0, $HllWBits) r(i)
         |    ON (CAST(1 AS BIGINT) << CAST(i AS INT)) <= wmin
         |  GROUP BY 1, 2),
         |rh AS (SELECT event_type,
         |    COALESCE($HllWBits - msb, ${HllWBits + 1}) AS rho FROM ms),
         |per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hit,
         |    CAST(SUM(CAST(1 AS BIGINT)
         |      << CAST(${HllWBits + 1} - rho AS INT)) AS BIGINT) AS s_hit
         |  FROM rh GROUP BY 1),
         |c AS (SELECT event_type, n_hit,
         |    CAST($HllM - n_hit AS BIGINT) AS v_empty,
         |    CAST(s_hit + ($HllM - n_hit)
         |      * (CAST(1 AS BIGINT) << ${HllWBits + 1}) AS BIGINT) AS s_scaled
         |  FROM per),
         |e AS (SELECT *, CAST(CAST($HllAlphaMicro AS HUGEINT)
         |    * ${HllM * HllM} * ${1L << (HllWBits + 1)}
         |    // (CAST(s_scaled AS HUGEINT) * 1000000) AS BIGINT) AS est_raw
         |  FROM c),
         |f AS (SELECT *, CASE WHEN est_raw <= ${5L * HllM / 2}
         |      AND v_empty > 0
         |    THEN CAST(floor(CAST($HllM AS DOUBLE)
         |      * ln(CAST($HllM AS DOUBLE) / v_empty)) AS BIGINT)
         |    ELSE est_raw END AS est FROM e),
         |x AS (SELECT event_type,
         |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
         |  FROM events GROUP BY 1)
         |SELECT f.event_type, n_hit, v_empty, s_scaled, est_raw, est,
         |  exact_users, CAST(est - exact_users AS BIGINT) AS err
         |FROM f JOIN x ON f.event_type = x.event_type
         |ORDER BY f.event_type""".stripMargin,
    // Mirrors sketchBloomFprOn: same mixing hash, same k position
    // hashes, same pinned round(,9)-floor theory boundary.
    "sketch_bloom_fpr" -> {
      val m = 1L << BloomBitsLog2
      def pos(hx: String, j: Int) =
        s"(($hx * ${2 * j + 3} + ${97 * j + 31}) % $P + $P) % $P % $m"
      val probeJoin = (0 until BloomK).map { j =>
        s"""LEFT JOIN bits b$j ON ${pos("p.h", j)} = b$j.bitpos"""
      }.mkString("\n  ")
      val maybe = (0 until BloomK)
        .map(j => s"b$j.bitpos IS NOT NULL").mkString(" AND ")
      val bitsUnion = (0 until BloomK)
        .map(j => s"SELECT DISTINCT ${pos("h", j)} AS bitpos FROM mh")
        .mkString("\n  UNION\n  ")
      s"""WITH mk AS (SELECT CAST(c_custkey AS BIGINT) AS key
         |  FROM customer),
         |ma AS (SELECT key * 2654435761 + 1013904223 AS a FROM mk),
         |md AS (SELECT xor(a, a >> 15) % $P * 2246822519 % $P AS d
         |  FROM ma),
         |mh AS (SELECT xor(d, d >> 13) % $P AS h FROM md),
         |bits AS ($bitsUnion),
         |pa AS (SELECT (key + 1000000000) * 2654435761 + 1013904223
         |    AS a FROM mk),
         |pd AS (SELECT xor(a, a >> 15) % $P * 2246822519 % $P AS d
         |  FROM pa),
         |pr AS (SELECT xor(d, d >> 13) % $P AS h FROM pd),
         |fl AS (SELECT p.h, $maybe AS maybe
         |  FROM pr p
         |  $probeJoin),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         |    CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_false_pos FROM fl),
         |nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members FROM mh),
         |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_set_bits
         |  FROM bits)
         |SELECT CAST($m AS BIGINT) AS m_bits,
         |  CAST($BloomK AS INT) AS k_hashes,
         |  n_members, n_set_bits, n_probes, n_false_pos,
         |  CAST(n_false_pos * 1000000 // n_probes AS BIGINT)
         |    AS measured_fpr_ppm,
         |  CAST(floor(round(power(
         |    1.0 - exp(-($BloomK.0 * n_members) / $m.0), $BloomK.0), 9)
         |    * 1000000) AS BIGINT) AS theory_fpr_ppm
         |FROM agg CROSS JOIN nm CROSS JOIN nb""".stripMargin
    },
    "sketch_log_histogram" ->
      """WITH r AS (SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem WHERE floor(l_extendedprice * 100 + 0.5) > 0),
        |bk AS (SELECT l_returnflag, cents,
        |    CAST(length(bin(cents)) - 1 AS BIGINT) AS b FROM r),
        |h AS (SELECT l_returnflag, b, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM bk GROUP BY 1, 2),
        |cu AS (SELECT l_returnflag, b, c,
        |    SUM(c) OVER (PARTITION BY l_returnflag ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(c) OVER (PARTITION BY l_returnflag) AS n FROM h),
        |e AS (SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
        |    MIN(CASE WHEN cum >= (n - 1) * 500000 // 1000000 + 1
        |      THEN b END) AS b50,
        |    MIN(CASE WHEN cum >= (n - 1) * 950000 // 1000000 + 1
        |      THEN b END) AS b95
        |  FROM cu GROUP BY 1),
        |es AS (SELECT l_returnflag, n,
        |    CASE WHEN b50 = 0 THEN CAST(1 AS BIGINT)
        |      ELSE 3 * (CAST(1 AS BIGINT) << CAST(b50 - 1 AS INT))
        |    END AS p50_est,
        |    CASE WHEN b95 = 0 THEN CAST(1 AS BIGINT)
        |      ELSE 3 * (CAST(1 AS BIGINT) << CAST(b95 - 1 AS INT))
        |    END AS p95_est
        |  FROM e),
        |ex AS (SELECT l_returnflag,
        |    MAX(CASE WHEN rn = (n - 1) * 500000 // 1000000 + 1
        |      THEN cents END) AS exact_p50,
        |    MAX(CASE WHEN rn = (n - 1) * 950000 // 1000000 + 1
        |      THEN cents END) AS exact_p95
        |  FROM (SELECT l_returnflag, cents,
        |      ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |        ORDER BY cents) AS rn,
        |      COUNT(*) OVER (PARTITION BY l_returnflag) AS n FROM bk)
        |  GROUP BY 1)
        |SELECT es.l_returnflag, n, p50_est, p95_est,
        |  exact_p50, exact_p95,
        |  p50_est - exact_p50 AS err_p50, p95_est - exact_p95 AS err_p95,
        |  (p50_est <= exact_p50 * 2 AND exact_p50 <= p50_est * 2
        |   AND p95_est <= exact_p95 * 2 AND exact_p95 <= p95_est * 2)
        |    AS within_2x
        |FROM es JOIN ex ON es.l_returnflag = ex.l_returnflag
        |ORDER BY es.l_returnflag""".stripMargin,
    "sketch_theta_rollup" ->
      s"""WITH hs AS (SELECT DISTINCT event_type,
         |    (user_id * 2654435761 + 12345) % $P AS h FROM events),
         |sk AS (SELECT event_type, h,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h ASC)
         |      AS rn
         |  FROM hs QUALIFY rn <= $SketchK),
         |nt AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT)
         |    AS n_types FROM sk),
         |pool AS (SELECT DISTINCT h FROM sk),
         |pr AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h ASC) AS rn
         |  FROM pool QUALIFY rn <= $SketchK),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |    MAX(CASE WHEN rn = $SketchK THEN h END) AS kth FROM pr),
         |ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
         |    AS exact_users FROM events)
         |SELECT n_types,
         |  CAST(COALESCE(${(SketchK - 1) * P} // kth, m) AS BIGINT)
         |    AS est_users,
         |  exact_users,
         |  CAST(COALESCE(${(SketchK - 1) * P} // kth, m) - exact_users
         |    AS BIGINT) AS err
         |FROM agg CROSS JOIN nt CROSS JOIN ex""".stripMargin,
    "sketch_quantile" ->
      s"""WITH r AS (SELECT l_returnflag,
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         |    ((l_orderkey * 31 + l_linenumber) % $P * 2654435761) % $P AS h
         |  FROM lineitem),
         |dp AS (SELECT DISTINCT l_returnflag, h, cents FROM r),
         |sk AS (SELECT l_returnflag, cents, ROW_NUMBER() OVER (
         |    PARTITION BY l_returnflag ORDER BY h, cents) AS rn FROM dp),
         |sq AS (SELECT l_returnflag, cents, ROW_NUMBER() OVER (
         |      PARTITION BY l_returnflag ORDER BY cents) AS vr,
         |    COUNT(*) OVER (PARTITION BY l_returnflag) AS m
         |  FROM sk WHERE rn <= 256),
         |est AS (SELECT l_returnflag, CAST(MAX(m) AS BIGINT) AS m,
         |    MAX(CASE WHEN vr = (m - 1) * 500000 // 1000000 + 1
         |        THEN cents END) AS p50_cents,
         |    MAX(CASE WHEN vr = (m - 1) * 950000 // 1000000 + 1
         |        THEN cents END) AS p95_cents
         |  FROM sq GROUP BY l_returnflag),
         |ex AS (SELECT l_returnflag, cents, ROW_NUMBER() OVER (
         |      PARTITION BY l_returnflag ORDER BY cents, h) AS rn,
         |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n FROM r),
         |exq AS (SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
         |    MAX(CASE WHEN rn = (n - 1) * 500000 // 1000000 + 1
         |        THEN cents END) AS exact_p50,
         |    MAX(CASE WHEN rn = (n - 1) * 950000 // 1000000 + 1
         |        THEN cents END) AS exact_p95
         |  FROM ex GROUP BY l_returnflag)
         |SELECT est.l_returnflag, n, m, p50_cents, p95_cents,
         |  exact_p50, exact_p95,
         |  p50_cents - exact_p50 AS err_p50,
         |  p95_cents - exact_p95 AS err_p95
         |FROM est JOIN exq USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin,
    "sketch_theta" ->
      s"""WITH hs AS (SELECT DISTINCT event_type,
         |    (user_id * 2654435761 + 12345) % $P AS h FROM events),
         |sk AS (SELECT event_type, h,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
         |  FROM hs QUALIFY rn <= $SketchK),
         |kth AS (SELECT event_type, COUNT(*) AS n_sk,
         |    MAX(CASE WHEN rn = $SketchK THEN h END) AS kth
         |  FROM sk GROUP BY event_type),
         |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    a.kth AS kth_a, b.kth AS kth_b, a.n_sk AS n_a, b.n_sk AS n_b
         |  FROM kth a JOIN kth b ON a.event_type < b.event_type),
         |pu AS (SELECT type_a, type_b, h FROM pairs
         |    JOIN sk ON sk.event_type = pairs.type_a
         |  UNION
         |  SELECT type_a, type_b, h FROM pairs
         |    JOIN sk ON sk.event_type = pairs.type_b),
         |ku AS (SELECT type_a, type_b,
         |    MAX(CASE WHEN rn = $SketchK THEN h END) AS kth_u,
         |    COUNT(*) AS n_u
         |  FROM (SELECT type_a, type_b, h,
         |    ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h ASC) AS rn
         |  FROM pu) WHERE rn <= $SketchK GROUP BY type_a, type_b),
         |us AS (SELECT DISTINCT event_type, user_id FROM events),
         |ex AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    CAST(COUNT(*) AS BIGINT) AS exact_inter
         |  FROM us a JOIN us b
         |    ON a.user_id = b.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2),
         |est AS (SELECT pairs.type_a, pairs.type_b,
         |    COALESCE(${(SketchK - 1) * P} // kth_a, n_a) AS est_a,
         |    COALESCE(${(SketchK - 1) * P} // kth_b, n_b) AS est_b,
         |    COALESCE(${(SketchK - 1) * P} // kth_u, n_u) AS est_union,
         |    COALESCE(exact_inter, 0) AS exact_inter
         |  FROM pairs JOIN ku USING (type_a, type_b)
         |  LEFT JOIN ex USING (type_a, type_b))
         |SELECT type_a, type_b, est_a, est_b, est_union,
         |  GREATEST(0, est_a + est_b - est_union) AS est_inter,
         |  exact_inter,
         |  GREATEST(0, est_a + est_b - est_union) - exact_inter AS err
         |FROM est ORDER BY type_a, type_b""".stripMargin,
  )
}
