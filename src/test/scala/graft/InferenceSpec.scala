package graft

import java.sql.Timestamp
import graft.operators.Inference
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Hand-computable fixtures for the statistical-inference module
  * (operators/Inference.scala): rank correlations, Cramer's V, BH-FDR,
  * binary-segmentation changepoint, target encoding, Pareto skyline,
  * and the deterministic geometric-mechanism DP release. */
class InferenceSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(rows: (String, String, Double)*): DataFrame =
    rows.zipWithIndex.map { case ((et, day, v), i) =>
      (i.toLong, Timestamp.valueOf(day + " 12:00:00"), (i % 7).toLong, et, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("spearman: strictly rising daily series -> rho exactly 1") {
    val e = ev(("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-03", 3.0), ("a", "2024-01-04", 4.0))
    val r = Inference.tsSpearmanOn(e).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 4L)
    assert(r(0).getDouble(2) === 1.0)
  }

  test("spearman: strictly falling -> -1; constant series -> NULL (zero variance)") {
    val fall = ev(("a", "2024-01-01", 3.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-03", 1.0))
    assert(Inference.tsSpearmanOn(fall).collect()(0).getDouble(2) === -1.0)
    val const = ev(("a", "2024-01-01", 5.0), ("a", "2024-01-02", 5.0))
    assert(Inference.tsSpearmanOn(const).collect()(0).isNullAt(2))
  }

  test("spearman: tied values use average ranks (hand case)") {
    // days 1..4, cents 100,200,200,300 -> y doubled avg ranks 2,5,5,8;
    // x doubled ranks 2,4,6,8: sxy=118, sxx=120, syy=118
    val e = ev(("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-03", 2.0), ("a", "2024-01-04", 3.0))
    val rho = Inference.tsSpearmanOn(e).collect()(0).getDouble(2)
    val expect = (4.0 * 118 - 400) / math.sqrt((4.0 * 120 - 400) * (4.0 * 118 - 400))
    assert(rho === expect)
  }

  test("kendall: [1,3,2] -> nc=2 nd=1 tau=1/3; ties counted separately") {
    val e = ev(("a", "2024-01-01", 1.0), ("a", "2024-01-02", 3.0),
      ("a", "2024-01-03", 2.0))
    val r = Inference.tsKendallOn(e).collect()(0)
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((2L, 1L, 0L)))
    assert(math.abs(r.getDouble(5) - 1.0 / 3) < 1e-12)
    val tied = ev(("a", "2024-01-01", 1.0), ("a", "2024-01-02", 1.0),
      ("a", "2024-01-03", 2.0))
    val t = Inference.tsKendallOn(tied).collect()(0)
    // pairs: (1,1) tie, (1,2) C, (1,2) C -> tau_b = 2/sqrt(3*2)
    assert((t.getLong(2), t.getLong(3), t.getLong(4)) === ((2L, 0L, 1L)))
    assert(math.abs(t.getDouble(5) - 2.0 / math.sqrt(6.0)) < 1e-12)
  }

  test("cramers v: 2x2 contingency [[30,10],[10,30]] -> chi2 20, V = 0.5") {
    // 2024-01-01 is a Monday, 2024-01-06 a Saturday
    val rows = Seq.fill(30)(("a", "2024-01-01", 1.0)) ++
      Seq.fill(10)(("a", "2024-01-06", 1.0)) ++
      Seq.fill(10)(("b", "2024-01-01", 1.0)) ++
      Seq.fill(30)(("b", "2024-01-06", 1.0))
    val r = Inference.eventCramersVOn(ev(rows: _*)).collect()(0)
    assert(r.getLong(0) === 80L)
    assert(r.getLong(3) === 20000000L) // chi2_ppm exact
    assert(r.getDouble(4) === 0.5)
  }

  test("fdr: identical weekend shares -> z2=0, p=1, nothing rejected") {
    val rows = Seq.fill(10)(("a", "2024-01-01", 1.0)) ++
      Seq.fill(10)(("a", "2024-01-06", 1.0)) ++
      Seq.fill(10)(("b", "2024-01-01", 1.0)) ++
      Seq.fill(10)(("b", "2024-01-06", 1.0))
    val r = Inference.eventFdrBhOn(ev(rows: _*)).collect()
    assert(r.forall(_.getLong(1) === 0L))
    assert(r.forall(_.getLong(2) === 1000000L))
    assert(r.forall(!_.getBoolean(5)))
  }

  test("fdr: one heavily weekend-skewed type is rejected first") {
    val rows = Seq.fill(40)(("skew", "2024-01-06", 1.0)) ++
      Seq.fill(40)(("a", "2024-01-01", 1.0)) ++
      Seq.fill(20)(("b", "2024-01-01", 1.0)) ++
      Seq.fill(20)(("b", "2024-01-06", 1.0))
    val r = Inference.eventFdrBhOn(ev(rows: _*)).collect()
    val byRank = r.sortBy(_.getLong(3))
    // skew (100% weekend vs 25% rest) hits the ladder floor and is rejected
    val skew = byRank.find(_.getString(0) === "skew").get
    assert(skew.getLong(2) === 100L)
    assert(skew.getBoolean(5))
    // p_ppm non-decreasing in rank, rejects form a prefix
    assert(byRank.map(_.getLong(2)).sliding(2).forall(p => p(0) <= p(1)))
    val rejects = byRank.map(_.getBoolean(5))
    assert(!rejects.dropWhile(identity).contains(true))
  }

  test("changepoint: step series 10,10,10,50,50,50 splits after day 3") {
    val e = ev(("a", "2024-01-01", 10.0), ("a", "2024-01-02", 10.0),
      ("a", "2024-01-03", 10.0), ("a", "2024-01-04", 50.0),
      ("a", "2024-01-05", 50.0), ("a", "2024-01-06", 50.0))
    val r = Inference.tsChangepointOn(e).collect()(0)
    assert(r.getDate(1).toString === "2024-01-03")
    assert((r.getLong(2), r.getLong(3)) === ((3L, 3L)))
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((1000L, 5000L, 4000L)))
  }

  test("iptw: planted uniform effect in one stratum recovers it exactly; " +
    "no-overlap strata are trimmed") {
    // users 1..8, 4 events each (stratum 1); odd = treated buys 3.00,
    // even = control buys 2.00 -> d_micro = 100 cents * 1e6
    val oneStratum = (1L to 8L).flatMap { u =>
      val buy = ("purchase", if (u % 2 == 1) 3.0 else 2.0)
      (Seq(buy) ++ Seq.fill(3)(("view", 0.0))).zipWithIndex.map {
        case ((et, v), k) =>
          (u * 10 + k, Timestamp.valueOf("2024-01-05 12:00:00"), u, et, v)
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = operators.Inference.eventIptwOn(oneStratum).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("n_s") == 8L && r.getAs[Long]("t_s") == 4L)
    assert(r.getAs[Long]("e_ppm") == 500000L)
    assert(r.getAs[Long]("y1_micro") == 300000000L)
    assert(r.getAs[Long]("y0_micro") == 200000000L)
    assert(r.getAs[Long]("ate_micro") == 100000000L)
    // all-treated stratum (one odd user with 8 events) must vanish
    val noOverlap = (1L to 8L).map { k =>
      (100L + k, Timestamp.valueOf("2024-01-05 12:00:00"), 9L,
        "view", 0.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out2 = operators.Inference.eventIptwOn(oneStratum.union(noOverlap))
    assert(out2.where(col("stratum") === 2L).count() == 0)
    assert(out2.count() == 1)
  }

  test("iptw: ate is the n_s-weighted mean of per-stratum effects " +
    "(two-strata hand case)") {
    // stratum 1 (4 events): 2 treated d=+100c, 2 control; stratum 2
    // (8 events): 1 treated d=+300c, 1 control
    def user(u: Long, nEv: Int, buyVal: Double) = {
      val rows = (("purchase", buyVal)) +: Seq.fill(nEv - 1)(("view", 0.0))
      rows.zipWithIndex.map { case ((et, v), k) =>
        (u * 100 + k, Timestamp.valueOf("2024-01-05 12:00:00"), u, et, v)
      }
    }
    val df = (user(1, 4, 3.0) ++ user(3, 4, 3.0) ++ user(2, 4, 2.0) ++
      user(4, 4, 2.0) ++ user(5, 8, 6.0) ++ user(6, 8, 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = operators.Inference.eventIptwOn(df)
      .select("stratum", "n_s", "d_micro", "w_contrib_micro", "ate_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // ate = (4*100e6 + 2*300e6) / 6 = 166_666_666 (floor)
    assert(out == Seq(
      (1L, 4L, 100000000L, 66666666L, 166666666L),
      (2L, 2L, 300000000L, 100000000L, 166666666L)))
  }

  test("target encode: hand LOO and m-estimate smoothing") {
    val orders = Seq((1L, 10L, 100.0), (2L, 11L, 200.0), (3L, 12L, 300.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Seq((10L, 7), (11L, 7), (12L, 7))
      .toDF("c_custkey", "c_nationkey")
    val r = Inference.featureTargetEncodeOn(orders, cust)
      .collect().sortBy(_.getLong(0))
    // group sum 60000 cents, n=3, gmean=20000
    assert(r(0).getLong(3) === 25000L) // (60000-10000)/2
    assert(r(2).getLong(3) === 15000L) // (60000-30000)/2
    assert(r.forall(_.getLong(4) === 20000L)) // (60000+200000)/13
  }

  test("target encode: singleton group gets NULL LOO, prior-pulled smooth") {
    val orders = Seq((1L, 10L, 100.0), (2L, 11L, 300.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Seq((10L, 1), (11L, 2)).toDF("c_custkey", "c_nationkey")
    val r = Inference.featureTargetEncodeOn(orders, cust)
      .collect().sortBy(_.getLong(0))
    assert(r.forall(_.isNullAt(3)))
    // gmean = 20000; smooth = (10000 + 200000)/11 = 19090
    assert(r(0).getLong(4) === 19090L)
  }

  test("skyline: frontier keeps non-dominated docs, duplicates survive") {
    val docs = Seq(
      (1L, "a b c d"),          // 4 tokens ttr 1e6 — frontier
      (2L, "a b c d a b c d"),  // 8 tokens ttr 5e5 — frontier
      (3L, "w w"),              // 2 tokens ttr 5e5 — dominated by 2
      (4L, "a a a a b b b b"),  // 8 tokens ttr 25e4 — dominated by 2
      (5L, "a b c d a b c d"))  // duplicate of 2 — ties survive
      .toDF("doc_id", "text")
    val ids = Inference.corpusSkylineOn(docs).collect().map(_.getLong(0))
    assert(ids.toSet === Set(1L, 2L, 5L))
  }

  test("skyline: matches the exact O(n^2) dominance filter on the corpus table") {
    val docs = Tables.documents(spark, sf)
    val got = Inference.corpusSkylineOn(docs)
      .collect().map(_.getLong(0)).toSet
    import org.apache.spark.sql.functions._
    val t = split(col("text"), " ")
    val d = docs.select(col("doc_id"), size(t).cast("long").as("x"),
        expr("CAST(size(array_distinct(split(text, ' '))) * 1000000 DIV size(split(text, ' ')) AS BIGINT)").as("y"))
      .filter(col("x") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = d.filter { case (_, x, y) =>
      !d.exists { case (_, ox, oy) =>
        ox >= x && oy >= y && (ox > x || oy > y) }
    }.map(_._1).toSet
    assert(got === expect)
  }

  test("dp counts: pinned noise draws, clamp at zero, bounded magnitude") {
    val rows = Seq.fill(3)(("click", "2024-01-01", 1.0)) ++
      Seq.fill(9)(("view", "2024-01-02", 1.0))
    val r = Inference.privacyDpCountsOn(ev(rows: _*))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).sortBy(_._1)
    // pinned by the affine hash: click -> -1, view -> +1 (see scaladoc)
    // user_id cycles i % 7, so 3 click rows = 3 users, 9 view rows = 7
    assert(r(0) === (("click", 3L, -1L, 2L)))
    assert(r(1) === (("view", 7L, 1L, 8L)))
    val corpus = Inference.privacyDpCountsOn(
      Tables.events(spark, sf)).collect()
    assert(corpus.forall(x => math.abs(x.getLong(2)) <= 8))
    assert(corpus.forall(x => x.getLong(3) >= 0))
    assert(corpus.forall(x =>
      x.getLong(3) === math.max(x.getLong(1) + x.getLong(2), 0L)))
  }

  test("holm: step-down stops at the first failing rank") {
    // a: 20 weekday-only rows -> z2_milli 15000 -> p 500 ppm;
    // b, c: 10 weekday + 10 weekend each -> z2_milli 3750 -> p 100000
    val rows = Seq.fill(20)(("a", "2024-01-01", 1.0)) ++
      Seq.fill(10)(("b", "2024-01-01", 1.0)) ++
      Seq.fill(10)(("b", "2024-01-06", 1.0)) ++
      Seq.fill(10)(("c", "2024-01-01", 1.0)) ++
      Seq.fill(10)(("c", "2024-01-06", 1.0))
    val r = Inference.eventHolmOn(ev(rows: _*)).collect()
    assert(r.map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    assert(r.map(_.getLong(2)).toSeq === Seq(500L, 100000L, 100000L))
    // holm_stat = p * (m - rk + 1): 1500, 200000, 100000
    assert(r.map(_.getLong(5)).toSeq === Seq(1500L, 200000L, 100000L))
    // rank 2 is the first failure -> only rank 1 rejected (rank 3
    // would pass its own threshold but the step-down already stopped)
    assert(r.map(_.getBoolean(6)).toSeq === Seq(true, false, false))
  }

  test("holm: flat family (all p = 1) rejects nothing") {
    val rows = Seq.fill(10)(("a", "2024-01-01", 1.0)) ++
      Seq.fill(10)(("a", "2024-01-06", 1.0)) ++
      Seq.fill(10)(("b", "2024-01-01", 1.0)) ++
      Seq.fill(10)(("b", "2024-01-06", 1.0))
    val r = Inference.eventHolmOn(ev(rows: _*)).collect()
    assert(r.forall(_.getLong(2) === 1000000L))
    assert(r.forall(!_.getBoolean(6)))
  }

  test("srm: balanced split stays quiet, a broken split alarms") {
    // users 0..9 -> 5/5 -> z2 = 0 -> p = 1, no alarm
    val ok = ev((0 until 20).map(i =>
      ("a", "2024-01-0" + (1 + i % 5), 1.0)): _*)
    val r = Inference.eventSrmOn(ok).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((4L, 3L)))
    // ev() assigns user_id = i % 7 -> users 0..6 -> 4 even, 3 odd:
    // z2_milli = 1*1000/7 = 142 -> p = 1e6, quiet
    assert(r.getLong(3) === 1000000L && !r.getBoolean(4))
    // broken assignment: 40 users, all even -> z2 = 40000 milli ->
    // p = 100 ppm -> alarm
    val broken = (0 until 40).map(i => (i.toLong * 2,
        Timestamp.valueOf("2024-01-01 12:00:00"), "a", 1.0))
      .map { case (u, t, et, v) => (u, t, u, et, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val b = Inference.eventSrmOn(broken).collect()(0)
    assert(b.getLong(0) === 40L && b.getLong(1) === 0L)
    assert(b.getBoolean(4))
  }

  test("dp topk: pinned noise, released ranks carry true-rank eval") {
    val r = Inference.privacyDpTopk(spark, sf).collect()
    assert(r.length === 3)
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // mechanism invariant: noisy = true + noise with |noise| <= 8
    assert(r.forall(x => math.abs(x.getLong(2) - x.getLong(3)) <= 8))
    // ranks are a permutation readout, both sides positive
    assert(r.forall(x => x.getLong(4) >= 1L))
  }

  test("rsi: hand series, complete frames only, exact integer ratio") {
    val e = ev(("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-03", 1.5), ("a", "2024-01-04", 3.0),
      ("a", "2024-01-05", 2.5))
    val r = Inference.tsRsiOn(e, period = 3).collect()
    // first emission at rn=4: gains 100+0+150, losses 0+50+0
    assert(r.length === 2)
    assert((r(0).getLong(3), r(0).getLong(4)) === ((250L, 50L)))
    assert(r(0).getLong(5) === 250L * 1000000 / 300) // 833333
    assert((r(1).getLong(3), r(1).getLong(4)) === ((150L, 100L)))
    assert(r(1).getLong(5) === 600000L)
  }

  test("rsi: flat series emits nothing; rising-only pins at 10^6") {
    val flat = ev(("a", "2024-01-01", 5.0), ("a", "2024-01-02", 5.0),
      ("a", "2024-01-03", 5.0), ("a", "2024-01-04", 5.0))
    assert(Inference.tsRsiOn(flat, period = 3).collect().isEmpty)
    val rise = ev(("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-03", 3.0), ("a", "2024-01-04", 4.0))
    val r = Inference.tsRsiOn(rise, period = 3).collect()
    assert(r.length === 1 && r(0).getLong(5) === 1000000L)
  }
}
