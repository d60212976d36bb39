package graft

import org.apache.spark.sql.functions._

/** privacy_kanon: generalization-ladder fixture covering publish /
  * generalize / suppress, plus corpus invariants. */
class PrivacySpec extends SparkSpecBase {
  import spark.implicits._

  private def cust(rows: Seq[(Long, Int, Double, String)]) =
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")

  test("ladder fixture: level 0 publishes, level 1 merges, level 2 suppresses") {
    val rows =
      // 5 rows in one fine bucket (bal 100..199) -> level 0
      (1L to 5L).map(i => (i, (i % 3).toInt, 150.0, "A")) ++
      // 5 rows spread over fine buckets of the SAME coarse bucket
      // (bal 1000..1900 step 200) -> each fine group of 1 -> level 1
      (11L to 15L).map(i => (i, (i % 2).toInt, 1000.0 + (i - 11) * 200, "A")) ++
      // 2 isolated rows in their own coarse bucket -> suppressed
      Seq((21L, 0, 5000.0, "A"), (22L, 1, 5100.0, "A"))
    val out = functions.Privacy.privacyKanonOn(cust(rows))
      .select("segment", "bucket", "level", "n_rows", "l_div")
      .as[(String, String, Int, Long, Long)].collect().toSet
    assert(out == Set(
      ("A", "h1", 0, 5L, 3L),   // floor(150/100)=1
      ("A", "k1", 1, 5L, 2L),   // floor(1000..1800/1000)=1
      ("A", "*", 2, 2L, 2L)))
  }

  test("recursive (c,l)-diversity: dominant-value class fails, balanced " +
    "class passes, thin-tail class zero-gates") {
    val rows =
      // class (A, bal~1xxx): 9 of nation 0, 1 each of 1 and 2 ->
      // r1=9, tail(rk>=3)=1 -> 9 < 2*1 FALSE
      (1L to 9L).map(i => (i, 0, 1500.0, "A")) ++
        Seq((10L, 1, 1500.0, "A"), (11L, 2, 1500.0, "A")) ++
        // class (B, bal~2xxx): 4+4+4 balanced -> r1=4, tail=4 -> 4 < 8 TRUE
        (20L to 23L).map(i => (i, 0, 2500.0, "B")) ++
        (24L to 27L).map(i => (i, 1, 2500.0, "B")) ++
        (28L to 31L).map(i => (i, 2, 2500.0, "B")) ++
        // class (C, bal~3xxx): only 2 distinct values -> tail empty ->
        // r1 < 0 never holds
        Seq((40L, 0, 3500.0, "C"), (41L, 1, 3500.0, "C"))
    val out = functions.Privacy.privacyRecursiveLdivOn(cust(rows))
      .select("segment", "n_rows", "m_distinct", "r1", "tail_sum", "meets_cl")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      ("A", 11L, 3L, 9L, 1L, false),
      ("B", 12L, 3L, 4L, 4L, true),
      ("C", 2L, 2L, 1L, 0L, false)))
  }

  test("recursive (c,l)-diversity: rank ties break to the lower nation id") {
    // two values tied at the top: r1 must be the count of the LOWER id
    // and the tail starts at rank 3 regardless of the tie
    val rows = (1L to 3L).map(i => (i, 7, 1500.0, "A")) ++
      (4L to 6L).map(i => (i, 2, 1500.0, "A")) ++
      Seq((7L, 5, 1500.0, "A"))
    val r = functions.Privacy.privacyRecursiveLdivOn(cust(rows)).collect()(0)
    assert(r.getAs[Long]("r1") == 3L)       // nation 2 wins rank 1
    assert(r.getAs[Long]("tail_sum") == 1L) // nation 5 at rank 3
  }

  test("ldp: keepMilli=1000 degenerates to exact counts with zero error") {
    val rows = (1L to 40L).map(i => (i, 0, 0.0, s"S${i % 4}"))
    val out = functions.Privacy.privacyLdpFrequencyOn(cust(rows), 1000L)
      .select("seg", "n_reported", "n_true", "t_hat_milli", "err_milli")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length == 4)
    out.foreach { case (_, nRep, nTrue, tHat, err) =>
      assert(nRep == nTrue); assert(tHat == nTrue * 1000L); assert(err == 0L)
    }
  }

  test("ldp: estimator matches an independent replay of the planted coin") {
    val keep = 600L
    val rows = (1L to 60L).map(i => (i, 0, 0.0, s"S${i % 3}"))
    // independent Scala replay of the derandomized mechanism
    val cats = rows.map(_._4).distinct.sorted
    val kk = cats.length.toLong
    val rep = rows.map { case (uid, _, _, seg) =>
      val r = (uid * 1103515245L + 12345L) % 2147483648L
      val repSeg =
        if (r % 1000L < keep) seg else cats(((r / 1000L) % kk).toInt)
      (seg, repSeg)
    }
    val nn = rep.size.toLong
    val expected = cats.map { s =>
      val nRep = rep.count(_._2 == s).toLong
      val nTrue = rep.count(_._1 == s).toLong
      val tHat = math.max(kk * nRep * 1000L - (1000L - keep) * nn, 0L) *
        1000L / (kk * keep)
      (s, nRep, nTrue, tHat, tHat - nTrue * 1000L)
    }.toSet
    val out = functions.Privacy.privacyLdpFrequencyOn(cust(rows), keep)
      .select("seg", "n_reported", "n_true", "t_hat_milli", "err_milli")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == expected)
    // reports are conserved: every user reports exactly one category
    assert(expected.toSeq.map(_._2).sum == nn)
  }

  test("dp quantile: two-candidate fixture replays the weight table and " +
    "the LCG landing by hand; corpus run replays imperatively and the " +
    "released value stays in the data's domain") {
    import spark.implicits._
    // cents 100 (cum 1, d 0, w 1e6) and 300 (cum 2, d 2000, w
    // floor(round(exp(-0.05),9)*1e6) = 951229); tw 1951229,
    // r = (2*1103515245+12345) % 2^31 % tw = 1022317 >= 1e6 -> 300
    val fx = functions.Privacy.privacyDpQuantileOn(cust(Seq(
      (1L, 0, 1.0, "A"), (2L, 1, 3.0, "A")))).collect()
    assert(fx.length == 1)
    val r0 = fx(0)
    assert(r0.getAs[Long]("dp_q_cents") == 300L &&
      r0.getAs[Long]("w_sel") == 951229L &&
      r0.getAs[Long]("tot_w") == 1951229L &&
      r0.getAs[Long]("true_q_cents") == 100L &&
      r0.getAs[Long]("err_cents") == 200L)
    // corpus: exactly one released row; independent imperative replay
    // of weights + landing agrees; release is a value present in the
    // data (the mechanism can only select candidates)
    val cents = Tables.customer(spark, sf)
      .select(floor(col("c_acctbal") * 100 + lit(0.5)).cast("long")
        .as("c")).as[Long].collect().sorted
    val n = cents.length.toLong
    val grouped = cents.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    def replay(epsMilli: Long): Long = {
      def weight(d: Long): Long = {
        val x = math.exp(-(epsMilli / 1000.0) * d / 4000.0)
        math.max(1L, math.floor(BigDecimal(x)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
          .toLong)
      }
      var cum = 0L
      val wts = grouped.map { case (v, t) =>
        cum += t; (v, weight(math.abs(2000L * cum - 1000L * n)))
      }
      val tw = wts.map(_._2).sum
      val r = ((n * 1103515245L + 12345L) % 2147483648L) % tw
      var acc = 0L
      wts.find { case (_, w) =>
        val hit = acc <= r && r < acc + w; acc += w; hit }.get._1
    }
    val out = functions.Privacy.privacyDpQuantile(spark, sf).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("dp_q_cents") == replay(100L))
    assert(out(0).getAs[Long]("n") == n)
    assert(cents.contains(out(0).getAs[Long]("dp_q_cents")))
    // a sharper epsilon is replayed the same way and lands at least
    // as close to the target rank (concentration)
    val sharp = functions.Privacy.privacyDpQuantileOn(
      Tables.customer(spark, sf), epsMilli = 8000L).collect()(0)
    assert(sharp.getAs[Long]("dp_q_cents") == replay(8000L))
  }

  test("t-closeness: hand distribution — the all-one-nation classes " +
      "fail t=0.2 (absent values enter via the residual term), the " +
      "near-global-mix class passes; exact variational ppm") {
    import spark.implicits._
    // N=7: nation0×4, nation1×3. Class X (bucket 0): {0,0} — skewed.
    // Class Z (bucket 1): {0,0,1} — near the global 4:3 mix.
    // Class W (bucket 2): {1,1} — skewed, nation0 ABSENT (residual).
    val rows = Seq(
      ("S", 100.0, 0L), ("S", 200.0, 0L),
      ("S", 1100.0, 0L), ("S", 1200.0, 0L), ("S", 1300.0, 1L),
      ("S", 2100.0, 1L), ("S", 2200.0, 1L))
      .toDF("c_mktsegment", "c_acctbal", "c_nationkey")
    val got = functions.Privacy.privacyTclosenessOn(rows)
      .select("segment", "bucket", "n_rows", "t_ppm", "meets_t")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    // t(X) = ½(|1−4/7|+|0−3/7|) = 3/7; t(Z) = 2/21; t(W) = 4/7
    assert(got == Seq(
      ("S", 0L, 2L, 428571L, false),
      ("S", 1L, 3L, 95238L, true),
      ("S", 2L, 2L, 571428L, false)), got.mkString(","))
  }

  test("published groups meet k; suppressed rows are counted, never bucketed") {
    val out = functions.Privacy.privacyKanon(spark, sf).cache()
    assert(out.filter(col("level") < 2 && col("n_rows") < functions.Privacy.K)
      .count() == 0)
    assert(out.filter(col("level") === 2 && col("bucket") =!= "*").count() == 0)
    // total rows conserved
    val total = out.agg(sum("n_rows")).as[Long].head()
    assert(total == Tables.customer(spark, sf).count())
    out.unpersist()
  }

  test("contribution cap: hand users — the heavy user clips, the light " +
    "user survives whole, the alternating user clips both types") {
    import java.sql.Timestamp
    def u(uid: Long, types: Seq[String]) = types.zipWithIndex.map {
      case (t, k) => (uid * 100 + k,
        Timestamp.valueOf(f"2024-01-01 10:${k}%02d:00"), uid, t, 0.0)
    }
    // user1: 10xT (keeps 8); user2: 3xU (keeps all);
    // user3: T,U alternating x12 (keeps first 8 = 4T+4U)
    val ev = (u(1, Seq.fill(10)("T")) ++ u(2, Seq.fill(3)("U")) ++
      u(3, (0 until 12).map(k => if (k % 2 == 0) "T" else "U")))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = functions.Privacy.privacyContributionCapOn(ev)
      .select("event_type", "n_raw", "n_capped", "n_clipped", "clipped_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("T", 16L, 12L, 4L, 250000L),
      ("U", 9L, 7L, 2L, 222222L)))
  }

  test("dp mean: clip, pinned coins and the quotient replayed by hand") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    // seeds: TT -> noise_sum 0, noise_n 0; UU -> noise_sum 0, noise_n 1
    val ev = Seq(
      (1L, t0, 1L, "TT", 50.0),   // 5000 cents, under cap
      (2L, t0, 2L, "TT", 100.0),  // user2 total 15000 -> clipped 10000
      (3L, t0, 2L, "TT", 50.0),
      (4L, t0, 3L, "UU", 20.0))   // 2000 cents
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = functions.Privacy.privacyDpMeanOn(ev)
      .select("event_type", "n_true", "sum_true_cents", "n_clipped_users",
        "noise_sum", "noise_n", "sum_released_cents", "n_released",
        "mean_released_milli")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      ("TT", 2L, 15000L, 1L, 0L, 0L, 15000L, 2L, 7500000L),
      ("UU", 1L, 2000L, 0L, 0L, 1L, 2000L, 2L, 1000000L)))
  }

  test("dp mean on the corpus: releases clamp at zero, epsilon constant, " +
    "clipped audit bounded by the population") {
    val out = functions.Privacy.privacyDpMean(spark, sf)
      .localCheckpoint(true)
    assert(out.count() > 0)
    assert(out.where(col("sum_released_cents") < 0L ||
      col("n_released") < 0L).count() == 0)
    assert(out.where(col("n_clipped_users") > col("n_true")).count() == 0)
    assert(out.where(col("epsilon_milli") =!= 1386L).count() == 0)
    assert(out.where(col("n_released") > 0L &&
      col("mean_released_milli").isNull).count() == 0)
  }

  test("contribution cap on the corpus: capped never exceeds raw or " +
    "cap*users, and totals reconcile") {
    val out = functions.Privacy.privacyContributionCap(spark, sf)
      .localCheckpoint(true)
    assert(out.count() > 0)
    assert(out.where(col("n_capped") > col("n_raw")).count() == 0)
    assert(out.where(col("n_clipped") =!=
      col("n_raw") - col("n_capped")).count() == 0)
    val users = Tables.events(spark, sf).select("user_id")
      .distinct().count()
    val cappedTotal = out.agg(sum("n_capped")).as[Long].head()
    assert(cappedTotal <= 8L * users)
  }

  test("privacy_dp_accountant: one cell replayed by hand (full 63-point " +
    "alpha sweep); epsilon monotone down in sigma, up in T") {
    val out = functions.Privacy.privacyDpAccountant(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.length == 18)
    // hand replay for (sigma=1.0 -> sigma_e1=10, T=1000)
    val lnNano = math.floor(math.log(100000.0) * 1e9 + 0.5).toLong
    val sweep = (2L to 64L).map { a =>
      val rdp = 1000L * a * 100000000000L / (2 * 10 * 10)
      (rdp + lnNano / (a - 1), a, rdp)
    }
    val (bestEps, bestA, bestRdp) = sweep.min
    val cell = out.find(r => r._1 == 10L && r._2 == 1000L).get
    assert(cell._3 == bestA && cell._4 == bestEps && cell._5 == bestRdp,
      s"$cell vs ($bestA, $bestEps, $bestRdp)")
    // more noise => smaller epsilon at fixed T; more steps => larger
    // epsilon at fixed sigma
    out.groupBy(_._2).values.foreach { g =>
      assert(g.sortBy(_._1).map(_._4).sliding(2).forall(p =>
        p.length < 2 || p(0) >= p(1)))
    }
    out.groupBy(_._1).values.foreach { g =>
      assert(g.sortBy(_._2).map(_._4).sliding(2).forall(p =>
        p.length < 2 || p(0) <= p(1)))
    }
  }
}
