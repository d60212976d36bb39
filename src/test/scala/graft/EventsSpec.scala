package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Semantic invariants for the event-analytics operators (each also
  * has a DuckDB oracle; these pin the intended meaning directly). */
class EventsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("event_funnel: strict first-touch ordering gates each step") {
    // user 1 converts fully in order; user 2 clicked BEFORE first view
    // (fails step 2 despite having both); user 3 only views
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (2L, 1L, "click", ts("2024-01-01 11:00:00")),
      (3L, 1L, "purchase", ts("2024-01-01 12:00:00")),
      (4L, 2L, "click", ts("2024-01-02 09:00:00")),
      (5L, 2L, "view", ts("2024-01-02 10:00:00")),
      (6L, 3L, "view", ts("2024-01-03 08:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.Events.eventFunnelOn(ev)
      .select("step", "n_users").as[(String, Long)].collect().toSeq
    assert(got == Seq(("view", 3L), ("click", 1L), ("purchase", 1L)))
  }

  test("scd2_intervals: intervals tile per user and only the last is open") {
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (2L, 1L, "a", ts("2024-01-01 11:00:00")), // no change: absorbed
      (3L, 1L, "b", ts("2024-01-01 12:00:00")),
      (4L, 1L, "a", ts("2024-01-01 13:00:00"))) // back to a: NEW interval
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.Events.scd2IntervalsOn(ev)
      .select("state", "valid_from", "valid_to", "is_current")
      .as[(String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(got.map(_._1) == Seq("a", "b", "a"))
    // each interval closes exactly where the next opens
    assert(got.init.zip(got.tail).forall { case (cur, nxt) =>
      cur._3.contains(nxt._2)
    })
    assert(got.map(_._4) == Seq(false, false, true))
  }

  test("scd2_intervals covers every user's full span on the corpus") {
    val iv = operators.Events.scd2Intervals(spark, sf)
    assert(iv.filter(col("is_current")).groupBy("user_id").count()
      .filter(col("count") =!= 1).count() == 0) // exactly one open row each
    assert(iv.filter(col("valid_to") <= col("valid_from")).count() == 0)
  }

  test("ts_gapfill: full calendar spine, zero-filled counts conserve the total") {
    val g = operators.Events.tsGapfill(spark, sf)
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    val days = g.select("d").distinct().count()
    assert(g.count() == types * days) // dense spine
    assert(g.agg(sum("n")).as[Long].head() ==
      Tables.events(spark, sf).count()) // gap rows add 0, nothing lost
    // forward fill: avg is non-null from each type's first observed day on
    val bad = g.withColumn("seen",
      max(when(col("n") > 0, col("d"))).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy("d")))
      .filter(col("seen").isNotNull && col("avg_ff").isNull)
    assert(bad.count() == 0)
  }

  test("event_retention: week 0 counts every user exactly once") {
    val r = operators.Events.eventRetention(spark, sf)
    val week0 = r.filter(col("week_offset") === 0)
      .agg(sum("n_users")).as[Long].head()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(week0 == users) // everyone is active in their own cohort week
    assert(r.filter(col("week_offset") < 0).count() == 0)
  }

  test("event_attribution: last preceding touch wins, stale touches go organic") {
    val ev = Seq(
      // user 1: view then click then purchase -> credited to click (latest)
      (1L, 1L, "view", ts("2024-01-01 10:00:00"), 10.0),
      (2L, 1L, "click", ts("2024-01-02 10:00:00"), 0.0),
      (3L, 1L, "purchase", ts("2024-01-03 10:00:00"), 25.0),
      // user 2: only touch is 30 days before the purchase -> organic
      (4L, 2L, "view", ts("2024-01-01 10:00:00"), 0.0),
      (5L, 2L, "purchase", ts("2024-02-15 10:00:00"), 40.0),
      // user 3: purchase with no preceding event at all -> organic
      (6L, 3L, "purchase", ts("2024-01-05 10:00:00"), 5.0),
      // user 4: a touch AFTER the purchase must not attribute backwards
      (7L, 4L, "purchase", ts("2024-01-06 10:00:00"), 7.0),
      (8L, 4L, "click", ts("2024-01-07 10:00:00"), 0.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = operators.Events.eventAttributionOn(ev)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("click", 1L, 25.0), ("organic", 3L, 52.0)))
  }

  test("event_attribution conserves purchases and revenue on the corpus") {
    val a = operators.Events.eventAttribution(spark, sf)
    val ev = Tables.events(spark, sf).filter(col("event_type") === "purchase")
    assert(a.agg(sum("n_purchases")).as[Long].head() == ev.count())
    val cents = ev.agg(sum(round(col("value") * 100).cast("long"))).as[Long].head()
    assert(a.agg(sum(round(col("revenue") * 100).cast("long"))).as[Long].head()
      == cents)
  }

  test("event_transitions: rows normalize to 1 per source and count all steps") {
    val t = operators.Events.eventTransitions(spark, sf)
    // per-source probabilities sum to ~1 (round-4 residue at most 3e-4)
    val sums = t.groupBy("src").agg(sum("p").as("sp"))
      .filter(abs(col("sp") - 1.0) > 0.0003)
    assert(sums.count() == 0, sums.collect().mkString(","))
    // total transition count = events - one terminal step per user
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(t.agg(sum("n")).as[Long].head() == expected)
  }

  test("triangleCountOn: counts known triangles once, ignores squares and dups") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // triangle {1,2,3}
      (2L, 1L),                     // reversed duplicate: collapsed
      (3L, 4L),                     // dangling edge: no triangle
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L)) // 4-cycle, no diagonal
      .toDF("a", "b")
    val got = functions.Clusters.triangleCountOn(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCountOn: hub fan graph counts right under the " +
    "degree-ordered orientation") {
    // hub 0 + rim path 1-2-...-20: one triangle (0, i, i+1) per rim
    // edge. The hub is the highest-degree node, so the orientation
    // gives it ZERO out-edges — the deg^2 wedge blowup the a<b
    // orientation would concentrate on the hub's reduce task cannot
    // exist — while the counts stay those of the undirected graph.
    val edges = ((1 to 20).map(i => (0L, i.toLong)) ++
      (1 until 20).map(i => (i.toLong, i.toLong + 1))).toDF("a", "b")
    val got = functions.Clusters.triangleCountOn(edges)
      .as[(Long, Long)].collect().toMap
    val want = Map(0L -> 19L) ++ (1 to 20).map(i =>
      i.toLong -> (if (i == 1 || i == 20) 1L else 2L)).toMap
    assert(got == want)
  }

  test("event_paths: depth cap keeps the first five events in time " +
    "order; corpus paths partition the users") {
    import java.sql.Timestamp
    // user 1 has 7 events a..g — the path is a>b>c>d>e (first 5);
    // user 2's two events arrive out of id order — ts wins
    val ev = (
      ('a' to 'g').zipWithIndex.map { case (c, i) =>
        (1L, i.toLong, new Timestamp(1000L * (i + 1)), c.toString)
      } ++ Seq(
        (2L, 100L, new Timestamp(9000L), "x"),
        (2L, 99L, new Timestamp(10000L), "y")))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = operators.Events.eventPathsOn(ev)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a>b>c>d>e" -> 1L, "x>y" -> 1L))
    val corpus = operators.Events.eventPaths(spark, sf)
    val users = Tables.events(spark, sf).select("user_id")
      .distinct().count()
    assert(corpus.agg(sum(col("n_users"))).as[Long].head() == users)
  }

  test("join_asof_nearest: never a larger gap than either directional " +
    "variant, and covers every purchase they cover") {
    val near = operators.Joins.joinAsofNearest(spark, sf)
      .select(col("purchase_id"), col("gap_us").as("g"))
    val back = operators.Joins.joinAsof(spark, sf)
      .select(col("purchase_id"), col("gap_us").as("gb"))
    assert(near.join(back, "purchase_id")
      .filter(col("g") > col("gb")).count() == 0)
    // nearest matches wherever backward does (superset coverage:
    // a purchase with a preceding click always has SOME nearest)
    assert(back.join(near, Seq("purchase_id"), "left_anti").count() == 0)
    assert(near.count() >= back.count())
  }

  test("L19g CUSUM: window spelling equals the clamped recursion on every " +
    "corpus series, and a planted burst raises exactly the burst day") {
    // corpus: per type, replay s_t = max(0, s_{t-1} + (x*nd - total))
    // sequentially and compare against the two-window spelling
    val rows = operators.Events.eventCusum(spark, sf)
      .as[(String, java.sql.Date, Long, Long, Boolean)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, series) =>
      val sorted = series.sortBy(_._2.toString)
      val nd = sorted.length.toLong
      val total = sorted.map(_._3).sum
      var s = 0L
      sorted.foreach { case (_, _, x, cusum, alarm) =>
        s = math.max(0L, s + (x * nd - total))
        assert(s == cusum, s"recursion $s != window $cusum")
        assert(alarm == (cusum > 2 * total))
      }
    }
    // fixture: flat rate with one 5x day -> the burst day (and only
    // days at-or-after it while the excess persists) can alarm
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = (0 until 10).flatMap { day =>
      val n = if (day == 6) 50 else 10
      (0 until n).map(i => (day * 100L + i,
        new java.sql.Timestamp(base.getTime + day * 86400000L + i * 1000L),
        "t"))
    }.toDF("event_id", "ts", "event_type")
    val got = operators.Events.eventCusumOn(ev)
      .orderBy("d").as[(String, java.sql.Date, Long, Long, Boolean)]
      .collect().toSeq
    // mean 14/day, scaled by nd=10: normal days drift -40 (clamped by
    // the running min), the burst adds +360 -> cusum 360, 320, 280,
    // 240 from the burst on; threshold 2*total = 280 exceeded on the
    // burst day and the one after, then the drift decays it back
    assert(got.filter(_._5).map(_._2.toString) ==
      Seq("2024-01-07", "2024-01-08"), got.toString)
  }

  test("L19h journey regex: hand-built journeys hit exactly the right patterns") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(uid: Long, seq: String) = seq.zipWithIndex.map { case (c, i) =>
      val t = Map('v' -> "view", 'c' -> "click", 'p' -> "purchase",
        's' -> "signup", 'e' -> "error")(c)
      (uid * 1000 + i, new java.sql.Timestamp(base.getTime + i * 1000L),
        uid, t)
    }
    val events = (ev(1, "svcp") ++ ev(2, "pvs") ++ ev(3, "vep") ++
      ev(4, "vcep")).toDF("event_id", "ts", "user_id", "event_type")
    val got = operators.Events.eventRegexOn(events).orderBy("user_id")
      .as[(Long, Long, String, Boolean, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(
      // signup->view->click->purchase: signup first, full funnel, no ep
      (1L, 4L, "svcp", true, true, false),
      // purchase BEFORE signup: anchored prefix must reject
      (2L, 3L, "pvs", false, false, false),
      // view->error->purchase: no signup, no click, error-then-purchase
      (3L, 3L, "vep", false, false, true),
      // view->click->error->purchase: funnel allows gaps, ep adjacent
      (4L, 4L, "vcep", false, true, true)))
  }

  test("L19i temporal holdout: cutoff puts ~80% of events in train, split " +
    "counts rebuild the corpus, leakage flag is consistent") {
    val got = operators.Events.sampleHoldoutTemporal(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    val train = got.map(_._2).sum
    val test = got.map(_._3).sum
    val total = train + test
    // cutoff = FIRST day whose running total reaches 80%: everything
    // strictly before it is under 80% by minimality, exactly
    assert(train * 5 < total * 4, s"$train/$total")
    assert(test > 0 && train > 0)
    got.foreach { case (_, tr, te, both) =>
      assert(both == (tr > 0 && te > 0))
    }
  }
  test("L19i EWMA: band-join spelling equals the decayed recursion; dyadic exactness") {
    // corpus: per type, replay y_t = x_t + y_{t-1}/2 (truncation only
    // drops mass below 2^-20 of a day's count, far under the 1e-9
    // tolerance-free compare for series shorter than the span)
    val rows = operators.Events.tsEwma(spark, sf)
      .as[(String, java.sql.Date, Long, Double)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, series) =>
      val sorted = series.sortBy(_._2.toString)
      var y = 0.0
      sorted.zipWithIndex.foreach { case ((_, _, x, decay), t) =>
        y = x + y / 2.0
        if (t < 20) assert(y == decay, s"recursion $y != band $decay")
        else assert(math.abs(y - decay) <= y * 1e-5)
      }
    }
    // fixture: counts 1,1,1 per day -> exact 1, 1.5, 1.75
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = (0 until 3).map(day => (day.toLong,
      new java.sql.Timestamp(base.getTime + day * 86400000L), "t"))
      .toDF("event_id", "ts", "event_type")
    val got = operators.Events.tsEwmaOn(ev).orderBy("d")
      .select("decay_sum").as[Double].collect().toSeq
    assert(got == Seq(1.0, 1.5, 1.75), got.toString)
  }
  test("L19j streaks: islands are maximal consecutive runs; days conserved") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(day: Int, id: Long) = (id,
      new java.sql.Timestamp(base.getTime + day * 86400000L), 1L)
    val fx = Seq(ev(0, 1), ev(1, 2), ev(2, 3), ev(4, 4), ev(5, 5), ev(9, 6))
      .toDF("event_id", "ts", "user_id")
    val got = operators.Events.eventStreaksOn(fx)
      .select("streak_start", "streak_days").as[(java.sql.Date, Long)]
      .collect().toSeq
    assert(got.map(_._2) == Seq(3L, 2L, 1L), got.toString)
    assert(got.map(_._1.toString) ==
      Seq("2024-01-01", "2024-01-05", "2024-01-10"))
    // corpus: per user, streak days partition the active-day set and
    // consecutive streaks are separated by a genuine gap
    val out = operators.Events.eventStreaks(spark, sf).cache()
    val active = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .groupBy("user_id").agg(count(lit(1)).as("n_active"))
    val viol = out.groupBy("user_id")
      .agg(sum(col("streak_days")).as("s"))
      .join(active, "user_id").filter(col("s") =!= col("n_active")).count()
    assert(viol == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("streak_start")
    assert(out.withColumn("prev_end", lag(col("streak_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        datediff(col("streak_start"), col("prev_end")) < 2).count() == 0)
    out.unpersist()
  }

  test("L19k seasonality: weekday residuals sum to zero per (type, dow)") {
    val out = operators.Events.eventSeasonality(spark, sf).cache()
    // Σ(x·n_w − total_w) over a weekday group is algebraically 0
    assert(out.groupBy("event_type", "dow")
      .agg(sum(col("resid_scaled")).as("s"))
      .filter(col("s") =!= 0L).count() == 0)
    // excess is exactly the |resid| > total_w predicate
    assert(out.filter(
      (abs(col("resid_scaled")) > col("total_w")) =!= col("excess"))
      .count() == 0)
    // dow is ISO 1..7 and every daily row survived the join
    assert(out.filter(col("dow") < 1 || col("dow") > 7).count() == 0)
    val nDaily = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts"))).distinct().count()
    assert(out.count() == nDaily)
    out.unpersist()
  }

  test("L20a ab test: planted lift is significant, balanced arms are not, " +
      "degenerate gates go NULL") {
    def users(evenConv: Int, oddConv: Int, perArm: Int) =
      (0 until perArm).flatMap { i =>
        Seq((2L * i, if (i < evenConv) "purchase" else "view"),
          (2L * i + 1, if (i < oddConv) "purchase" else "view"))
      }.toDF("user_id", "event_type")
    val planted = operators.Events.eventAbTestOn(users(10, 40, 50)).head()
    assert(planted.getAs[Long]("n0") == 50 && planted.getAs[Long]("x0") == 10)
    assert(planted.getAs[Long]("x1") == 40)
    assert(planted.getAs[Boolean]("significant"))
    // z² for 10/50 vs 40/50: pooled p = .5, z² = 100·(.6)²/(.5·.5·(2/50)) = 36
    assert(planted.getAs[Long]("z2_milli") == 36000L)
    val flat = operators.Events.eventAbTestOn(users(20, 20, 50)).head()
    assert(flat.getAs[Long]("z2_milli") == 0L)
    assert(!flat.getAs[Boolean]("significant"))
    val allConv = operators.Events.eventAbTestOn(users(50, 50, 50)).head()
    assert(allConv.isNullAt(allConv.fieldIndex("z2_milli")))
  }

  test("L20b chi2: exact independence fixture scores zero everywhere; " +
      "corpus cells conserve the grand total") {
    // counts = rowfactor x colfactor -> o = r*c/n exactly in every cell
    // (2024-01-01 is a Monday)
    val fx = (for {
      (t, rf) <- Seq(("A", 2), ("B", 1))
      (day, cf) <- Seq(0, 1).zip(Seq(3, 5))
      k <- 0 until rf * cf
    } yield (t, ts(s"2024-01-0${day + 1} 00:00:00"))).toDF("event_type", "ts")
    val z = operators.Events.eventChi2On(fx)
    assert(z.filter(col("contrib_ppm") =!= 0L).count() == 0)
    val out = operators.Events.eventChi2(spark, sf).cache()
    assert(out.filter(col("contrib_ppm") < 0L || col("e_milli") <= 0L)
      .count() == 0)
    assert(out.agg(sum(col("o"))).head().getLong(0) ==
      Tables.events(spark, sf).count())
    out.unpersist()
  }

  test("L20c gini: equal spends score 0, planted whale matches the " +
      "closed form") {
    def evs(spends: Seq[Long]) = spends.zipWithIndex.map { case (s, i) =>
      (i.toLong, "purchase", s.toDouble)
    }.toDF("user_id", "event_type", "value")
    assert(operators.Events.eventGiniOn(evs(Seq(7, 7, 7, 7))).head()
      .getAs[Long]("gini_ppm") == 0L)
    // spends (1,1,1,97): rksum = 1+2+3+4*97 = 394 over total 100 cents*100
    // gini = (2*394*100 - 5*100*100) / (4*100*100) = 28800/40000 = .72
    val whale = operators.Events.eventGiniOn(evs(Seq(1, 1, 1, 97))).head()
    assert(whale.getAs[Long]("n_users") == 4L)
    assert(whale.getAs[Long]("gini_ppm") == 720000L)
  }

  test("L20d autocorr: exact alternating series hits -1 at lag 1 and +1 " +
      "at lag 2 through the zero-filled spine") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 10 events on even days 0..18, NOTHING on odd days: the spine must
    // supply the zeros or the lags misalign
    val fx = (for (d <- 0 until 20 by 2; k <- 0 until 10)
      yield ("blink", new java.sql.Timestamp(base.getTime + d * 86400000L)))
      .toDF("event_type", "ts")
    val acf = operators.Events.tsAutocorrOn(fx)
      .select("lag", "r_acf").as[(Long, Double)].collect().toMap
    assert(acf(1L) == -1.0 && acf(2L) == 1.0)
    assert(acf(3L) == -1.0 && acf(4L) == 1.0)
  }

  test("L20e cohort ltv: running revenue divides by FULL cohort size, " +
      "non-purchasers included; second cohort stays separate") {
    // users 1,2 both first seen Jan 1 (cohort of TWO even though only
    // user 1 ever buys); user 3 opens a second cohort Jan 5
    val ev = Seq(
      (1L, "purchase", ts("2024-01-01 10:00:00"), 1.0),
      (2L, "view", ts("2024-01-01 11:00:00"), 0.0),
      (1L, "purchase", ts("2024-01-10 09:00:00"), 2.0), // day 9 -> week 1
      (3L, "purchase", ts("2024-01-05 12:00:00"), 3.0))
      .toDF("user_id", "event_type", "ts", "value")
    val got = operators.Events.eventCohortLtvOn(ev)
      .select("cohort_day", "week_offset", "rev_cents", "cum_cents",
        "cohort_n", "ltv_milli")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 100L, 100L, 2L, 50000L),
      ("2024-01-01", 1, 200L, 300L, 2L, 150000L),
      ("2024-01-05", 0, 300L, 300L, 1L, 300000L)))
  }

  test("L20f forecast backtest: period-7 series has ZERO seasonal-naive " +
      "error only because the spine zero-fills silent days") {
    val base = ts("2024-01-01 00:00:00")
    // counts by day over 14 days: 2,1,1,0,1,1,1 repeated twice — days 3
    // and 10 have NO rows at all; without the zero-filled spine the
    // lag-7 pairs misalign and sae7 would not be zero
    val counts = Seq(2, 1, 1, 0, 1, 1, 1, 2, 1, 1, 0, 1, 1, 1)
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(("e", new Timestamp(base.getTime + d * 86400000L)))
    }.toDF("event_type", "ts")
    val r = operators.Events.tsForecastNaiveOn(ev).head()
    assert(r.getAs[Long]("n_scored") == 7L)
    assert(r.getAs[Long]("sae7") == 0L && r.getAs[Long]("se7") == 0L)
    // lag-1 persistence errors over days 7..13: |2-1|, |1-2|, 0,
    // |0-1|, |1-0|, 0, 0 — the zero days hurt the lag-1 model too
    assert(r.getAs[Long]("sae1") == 4L)
    assert(r.getAs[Long]("mae7_milli") == 0L)
    assert(r.getAs[Long]("mae1_milli") == 571L) // 4000 div 7
  }

  test("L20o holt: dyadic recursion replayed imperatively with " +
      "Math.floorDiv; the declining series drives the trend NEGATIVE " +
      "(arithmetic-shift floor, where truncation would differ); the " +
      "silent day zero-fills into the fold") {
    val base = ts("2024-01-01 00:00:00")
    // counts by day: 9,7,5,0,1 — day 4 has NO rows (spine must
    // zero-fill it) and the decline forces b < 0 at the first update
    val counts = Seq(9, 7, 5, 0, 1)
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(("e", new Timestamp(base.getTime + d * 86400000L)))
    }.toDF("event_type", "ts")
    var l = 9L; var b = 0L; var sse = 0L
    for (x <- Seq(7L, 5L, 0L, 1L)) {
      sse += (x - l - b) * (x - l - b)
      val lN = Math.floorDiv(x + l + b, 2)
      b = Math.floorDiv(lN - l + b, 2)
      l = lN
    }
    assert(b < 0) // the replay itself must exercise the negative floor
    val r = operators.Events.tsHoltOn(ev).head()
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("level") == l && r.getAs[Long]("trend") == b)
    assert(r.getAs[Long]("sse") == sse)
    assert(r.getAs[Long]("fc_1") == l + b)
    assert(r.getAs[Long]("fc_7") == l + 7 * b)
  }

  test("L20y holt-winters: the 14-day fold replayed imperatively — " +
      "season init x_j - l0, slot rotation, negative-floor shifts, " +
      "one-step SSE against l + b + s_old") {
    val base = ts("2024-01-01 00:00:00")
    // two weeks with a weekly impulse + decline: init week seeds the
    // seasonal slots, week 2 exercises every slot once
    val counts = Seq(14, 2, 3, 2, 2, 2, 9, 10, 1, 2, 1, 1, 1, 6)
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(("e", new Timestamp(base.getTime + d * 86400000L)))
    }.toDF("event_type", "ts")
    val l0 = counts.take(7).map(_.toLong).sum / 7
    var l = l0; var b = 0L; var sse = 0L
    val s = counts.take(7).map(_.toLong - l0).toArray
    for ((x0, i) <- counts.drop(7).map(_.toLong).zipWithIndex) {
      val rn = i + 8
      val j = (rn - 1) % 7
      val sOld = s(j)
      sse += (x0 - l - b - sOld) * (x0 - l - b - sOld)
      val lN = Math.floorDiv(x0 - sOld + l + b, 2)
      val bN = Math.floorDiv(lN - l + b, 2)
      s(j) = Math.floorDiv(x0 - lN + sOld, 2)
      l = lN; b = bN
    }
    val r = operators.Events.tsHoltWintersOn(ev).head()
    assert(r.getAs[Long]("n_days") == 14L)
    assert(r.getAs[Long]("level") == l)
    assert(r.getAs[Long]("trend") == b)
    assert(r.getAs[Long]("s_next") == s(14 % 7))
    assert(r.getAs[Long]("fc_1") == l + b + s(14 % 7))
    assert(r.getAs[Long]("sse") == sse)
    // the replay must itself exercise a negative seasonal / trend
    assert(s.exists(_ < 0L) && b <= 0L)
  }

  test("L20p seq patterns: greedy earliest-occurrence containment — " +
      "the b AFTER the first a is found even when an earlier b " +
      "precedes it; order gates pairs; repeats need strictly later " +
      "ts; one count per user regardless of witness multiplicity") {
    val ev = Seq(
      // user 1: view click view purchase — rich in patterns
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "view", ts("2024-01-01 12:00:00")),
      (1L, "purchase", ts("2024-01-01 13:00:00")),
      // user 2: purchase BEFORE view — view>purchase must NOT count
      (2L, "purchase", ts("2024-01-02 10:00:00")),
      (2L, "view", ts("2024-01-02 11:00:00")),
      // user 3: lone view — view>view needs a strictly later second
      (3L, "view", ts("2024-01-03 10:00:00")),
      // user 4: click view click purchase — view>click>purchase only
      // matches via the click AFTER the first view (the greedy step;
      // the global first click is too early)
      (4L, "click", ts("2024-01-04 10:00:00")),
      (4L, "view", ts("2024-01-04 11:00:00")),
      (4L, "click", ts("2024-01-04 12:00:00")),
      (4L, "purchase", ts("2024-01-04 13:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = operators.Events.eventSeqPatternsOn(ev)
      .select("len", "pattern", "support", "support_ppm")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._2 -> (r._1, r._3, r._4)).toMap
    assert(got("view>purchase") == (2L, 2L, 500000L)) // 1+4; user 2 gated
    assert(!got.contains("purchase>click"))
    assert(got("view>click>purchase") == (3L, 2L, 500000L)) // users 1+4
    assert(got("view>view>purchase") == (3L, 1L, 250000L)) // user 1 only
    assert(got("click>view>click") == (3L, 1L, 250000L)) // user 4 greedy
    assert(!got.contains("view>view>view")) // no third view anywhere
    assert(got("purchase>view") == (2L, 1L, 250000L)) // user 2 only
  }

  test("L20g poisson bootstrap: deterministic replay, mean-one draw " +
      "counts, and replicate totals bracketing the true total") {
    val out = operators.Events.sampleBootstrap(spark, sf).cache()
    assert(out.select("b").as[Long].collect().toSeq == (1L to 32L))
    val p = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .cache()
    val n = p.count()
    val total = p.agg(sum("cents")).head().getLong(0)
    // each replicate draws Poisson(1) per row: E[n_drawn] = n, and the
    // replicate spread estimates the sampling error of the corpus total
    val bad = out.filter(col("n_drawn") < n * 7 / 10 ||
      col("n_drawn") > n * 13 / 10).count()
    assert(bad == 0, s"n_drawn outside ±30% of $n")
    // unbiasedness where the law of large numbers actually has room:
    // 32·n pair draws of mean 1 — the pooled mean is within 5% of n
    val meanDrawn = out.agg(avg("n_drawn")).head().getDouble(0)
    assert(math.abs(meanDrawn - n) < 0.05 * n)
    // replicate totals bracket the truth loosely: a whale purchase's
    // 32-replicate mean draw count still carries ~1/sqrt(32) noise
    val meanTotal = out.agg(avg("total_cents")).head().getDouble(0)
    assert(math.abs(meanTotal - total) < 0.35 * total)
    // pure hash arithmetic: a second run replays bit-identically
    val again = operators.Events.sampleBootstrap(spark, sf)
    assert(out.exceptAll(again).count() == 0 &&
      again.exceptAll(out).count() == 0)
    p.unpersist(); out.unpersist()
  }

  private def purchases(pairs: Seq[(Long, Double)]) =
    pairs.map { case (u, v) => (u, "purchase", v) }
      .toDF("user_id", "event_type", "value")

  test("L20h mann-whitney: 3v3 complete separation lands exactly on " +
      "the z2 = 3.857 textbook value; full ties gate to NULL") {
    // odd user_ids (arm 1) hold {10,20,30}, even (arm 0) {1,2,3}:
    // pooled ranks 1..6, R1 = 15, U1 = 9 = n0*n1 (max separation),
    // z2 = 3*(18-9)^2*6*5 / (9*(7*6*5)) = 7290/1890 = 3.857...
    val sep = operators.Events.eventMannwhitneyOn(purchases(Seq(
      (0L, 1.0), (2L, 2.0), (4L, 3.0),
      (1L, 10.0), (3L, 20.0), (5L, 30.0)))).head()
    assert(sep.getAs[Long]("n0") == 3L && sep.getAs[Long]("n1") == 3L)
    assert(sep.getAs[Long]("r1_x2") == 30L)
    assert(sep.getAs[Long]("u1_x2") == 18L)
    assert(sep.getAs[Long]("tie_cube") == 0L)
    assert(sep.getAs[Long]("z2_milli") == 3857L)
    assert(sep.getAs[Boolean]("significant")) // just past chi2(1) 3.841
    // every value identical: tie correction kills the variance -> NULL
    val tied = operators.Events.eventMannwhitneyOn(purchases(Seq(
      (0L, 5.0), (2L, 5.0), (1L, 5.0), (3L, 5.0)))).head()
    assert(tied.getAs[Long]("tie_cube") == 60L)
    assert(tied.isNullAt(tied.fieldIndex("z2_milli")))
  }

  test("L20i ks test: disjoint supports hit D = 1 exactly; identical " +
      "samples score zero") {
    val sep = operators.Events.eventKsOn(purchases(Seq(
      (0L, 1.0), (2L, 2.0), (4L, 3.0), (6L, 4.0),
      (1L, 11.0), (3L, 12.0), (5L, 13.0), (7L, 14.0)))).head()
    assert(sep.getAs[Long]("d_num") == 16L) // = n0*n1 at the gap
    assert(sep.getAs[Long]("d_ppm") == 1000000L)
    assert(sep.getAs[Boolean]("significant"))
    val same = operators.Events.eventKsOn(purchases(Seq(
      (0L, 1.0), (2L, 2.0), (1L, 1.0), (3L, 2.0)))).head()
    assert(same.getAs[Long]("d_num") == 0L)
    assert(!same.getAs[Boolean]("significant"))
  }

  test("L20j ohlc: boundary rows picked by (micros, event_id) total " +
      "order — sub-microsecond ties fall to the id") {
    val ev = Seq(
      (1L, "trade", ts("2024-01-01 00:00:00"), 5.0),
      (2L, "trade", ts("2024-01-01 12:00:00"), 1.0),
      (3L, "trade", ts("2024-01-01 23:59:59"), 3.0),
      // day 2: both rows share ONE timestamp; ids order open/close
      (4L, "trade", ts("2024-01-02 09:00:00"), 2.0),
      (5L, "trade", ts("2024-01-02 09:00:00"), 7.0))
      .toDF("event_id", "event_type", "ts", "value")
    val got = operators.Events.tsOhlcOn(ev)
      .select("d", "open", "high", "low", "close", "volume", "n")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6))).toSeq
    assert(got == Seq(
      ("2024-01-01", 500L, 500L, 100L, 300L, 900L, 3L),
      ("2024-01-02", 200L, 700L, 200L, 700L, 900L, 2L)))
  }

  test("L20k survival: censoring splits from churn at the grace " +
      "boundary and the at-risk suffix counts every longer duration") {
    // horizon = day 30. user 1 spans 0..30 (censored, t=30); user 2
    // spans 0..10 (silent 20d -> churned, t=10); user 3 one-shot on
    // day 5 (churned, t=0); user 4 spans 2..28 (silent 2d -> censored)
    val base = ts("2024-01-01 00:00:00")
    def at(day: Int) = new Timestamp(base.getTime + day * 86400000L)
    val ev = Seq((1L, at(0)), (1L, at(30)), (2L, at(0)), (2L, at(10)),
      (3L, at(5)), (4L, at(2)), (4L, at(28)))
      .toDF("user_id", "ts")
    val got = operators.Events.eventSurvivalOn(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (0L, 4L, 1L, 0L, 250000L),
      (10L, 3L, 1L, 0L, 333333L),
      (26L, 2L, 0L, 1L, 0L),
      (30L, 1L, 0L, 1L, 0L)))
  }

  test("L20l time-to-convert: strictly-after first-touch pairing; " +
      "pre-view purchases and view-only users dilute the rate only") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-01 10:01:30")), // converts, 90s
      (1L, "purchase", ts("2024-01-01 12:00:00")), // later buy ignored
      (2L, "purchase", ts("2024-01-02 09:00:00")), // buys BEFORE view
      (2L, "view", ts("2024-01-02 10:00:00")),
      (3L, "view", ts("2024-01-03 08:00:00")), // never buys
      (4L, "purchase", ts("2024-01-04 07:00:00"))) // no view at all
      .toDF("user_id", "event_type", "ts")
    val r = operators.Events.eventTimeToConvertOn(ev).head()
    assert(r.getAs[Long]("n_view_users") == 3L)
    assert(r.getAs[Long]("n_converted") == 1L)
    assert(r.getAs[Long]("cr_ppm") == 333333L)
    assert(r.getAs[Double]("p50_sec") == 90.0)
    assert(r.getAs[Double]("p90_sec") == 90.0)
    assert(r.getAs[Long]("max_sec") == 90L)
  }

  test("L20p position attribution: 40/20/40 on a hand path, organic for untouched purchases") {
    import spark.implicits._
    val t0 = 1700000000000L
    val mk = (eid: Long, uid: Long, typ: String, off: Long) =>
      (eid, new java.sql.Timestamp(t0 + off * 1000), uid, typ, 1.0, "{}")
    val ev = Seq(
      // user 1: view, click, view, signup -> purchase (4-touch path)
      mk(1, 1L, "view", 0), mk(2, 1L, "click", 10), mk(3, 1L, "view", 20),
      mk(4, 1L, "signup", 30), mk(5, 1L, "purchase", 40),
      // user 2: purchase with no touches -> organic
      mk(6, 2L, "purchase", 0),
      // user 2 again: one touch then purchase -> 100%
      mk(7, 2L, "click", 10), mk(8, 2L, "purchase", 20),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Events.eventAttributionPositionOn(ev)
      .select("channel", "n_contribs", "credit_ppm")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // 4-touch: first view 400000, click 100000, middle view 100000,
    // signup (last) 400000; plus user 2's solo click 1000000
    assert(out("view") == (2L, 500000L))
    assert(out("click") == (2L, 1100000L))
    assert(out("signup") == (1L, 400000L))
    assert(out("organic") == (1L, 1000000L))
  }

  test("L20s decay attribution: whole-half-life halving on a hand path, organic preserved") {
    import spark.implicits._
    val day = 86400000L // ms
    val mk = (eid: Long, uid: Long, typ: String, offMs: Long) =>
      (eid, new java.sql.Timestamp(1700000000000L + offMs), uid, typ, 1.0, "{}")
    val ev = Seq(
      // user 1: click 4 days before purchase (1 half-life at H=3 ->
      // w 500000), view same day (w 1000000): credits 333333/666666
      mk(1, 1L, "click", 0), mk(2, 1L, "view", 4 * day),
      mk(3, 1L, "purchase", 4 * day + 1000),
      // user 2: untouched purchase -> organic
      mk(4, 2L, "purchase", 0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Events.eventAttributionDecayOn(ev)
      .select("channel", "n_contribs", "credit_ppm")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("click") == (1L, 333333L))
    assert(out("view") == (1L, 666666L))
    assert(out("organic") == (1L, 1000000L))
  }

  test("A13 weighted median: weight shifts the median off the row median") {
    import spark.implicits._
    val li = Seq(
      ("A", 1.0, 4.0), ("A", 2.0, 1.0), ("A", 3.0, 1.0),
    ).toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val out = operators.Aggregates.aggWeightedMedianOn(li)
      .select("l_returnflag", "wmedian_cents", "total_weight")
      .as[(String, Long, Long)].collect()
    // row median of prices is 2.00; weight 4 on 1.00 drags it down
    assert(out.toSeq == Seq(("A", 100L, 6L)))
  }

  test("L20o rate limit: first N by time pass, later events in the window throttle") {
    import spark.implicits._
    val t0 = 1700000000000L
    val ev = Seq(
      // user 1: five events inside one 2-min window (ids shuffled to
      // prove ordering is by ts), two in a later window
      (10L, 1L, 0L), (11L, 1L, 5L), (12L, 1L, 10L), (13L, 1L, 15L),
      (14L, 1L, 20L),
      (15L, 1L, 300L), (16L, 1L, 305L),
      // user 2: exactly the limit
      (20L, 2L, 0L), (21L, 2L, 5L), (22L, 2L, 10L),
    ).map { case (eid, uid, off) =>
      (eid, new java.sql.Timestamp(t0 + off * 1000), uid, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Events.eventRateLimitOn(ev)
      .select("user_id", "n_windows", "n_events", "n_throttled")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 7L, 2L), (2L, 1L, 3L, 0L)))
  }

  test("L20n markov: integer power iteration matches an independent replay of the recurrence") {
    import spark.implicits._
    // Eulerian path B B B A A A A B A -> transitions AA:3 AB:1 BA:2 BB:2
    val seq = Seq("B", "B", "B", "A", "A", "A", "A", "B", "A")
    val ev = seq.zipWithIndex.map { case (t, i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
        1L, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Events.eventMarkovStationaryOn(ev)
      .select("state", "pi_ppm", "emp_ppm").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // independent replay of the truncating integer recurrence
    var (pa, pb) = (500000L, 500000L)
    for (_ <- 1 to 8) {
      val na = (pa * 3) / 4 + (pb * 2) / 4
      val nb = (pa * 1) / 4 + (pb * 2) / 4
      pa = na; pb = nb
    }
    assert(out("A") == (pa, 5L * 1000000 / 9))
    assert(out("B") == (pb, 4L * 1000000 / 9))
  }

  test("L20n markov on the corpus: mass conserved within truncation, all states present") {
    import spark.implicits._
    val out = operators.Events.eventMarkovStationary(spark, sf)
      .select("state", "pi_ppm").as[(String, Long)].collect()
    assert(out.length == 5)
    val mass = out.map(_._2).sum
    // each of 8 rounds loses < |types|^2 ppm to truncation
    assert(mass <= 1000000L && mass > 1000000L - 8 * 25)
  }

  test("L20m decompose: periodic series over constant trend zeroes the residual") {
    import spark.implicits._
    // 14 daily points starting Monday 2024-01-01: v_i = 7.00 + 0.07*(i%7)
    // -> any 7-day window sums to 5047 cents -> trend 721 everywhere
    // interior, seasonal(dow) = 7*dow - 21, residual exactly 0
    val rows = (0 until 14).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i)
          .atTime(12, 0).toString.replace('T', ' ') + ":00"),
        1L, "view", 7.0 + 0.07 * (i % 7), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Events.tsDecomposeOn(rows)
      .select("dow", "v_cents", "trend_cents", "seasonal_cents", "resid_cents")
      .collect()
    assert(out.length == 14)
    val interior = out.filter(!_.isNullAt(2))
    assert(interior.length == 8) // days 3..10 have a complete frame
    interior.foreach { r =>
      assert(r.getLong(2) == 721L)
      assert(r.getLong(3) == 7L * r.getInt(0) - 21L)
      assert(r.getLong(4) == 0L)
    }
  }

  test("L20m' decomposed anomaly flags equal an independent Scala replay of the MAD rule") {
    import spark.implicits._
    val resid = operators.Events.tsDecompose(spark, sf)
      .where(col("resid_cents").isNotNull)
      .select("d", "resid_cents").as[(java.sql.Date, Long)].collect()
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val m = med(resid.map(_._2.toDouble).toSeq)
    val mad = med(resid.map(r => math.abs(r._2 - m)).toSeq)
    val expected = resid.filter(r =>
      mad > 0 && math.abs(r._2 - m) > 3.7065 * mad).map(_._1.toString).toSet
    val got = operators.Events.tsAnomalyDecomposed(spark, sf)
      .select("d").as[java.sql.Date].collect().map(_.toString).toSet
    assert(got == expected)
  }

  test("L20m decompose on the corpus: identity holds, edges untrended") {
    val out = operators.Events.tsDecompose(spark, sf).cache()
    // Y = trend + seasonal + residual wherever all parts exist
    assert(out.filter(col("trend_cents").isNotNull &&
      col("v_cents") =!= col("trend_cents") + col("seasonal_cents") +
        col("resid_cents")).count() == 0)
    // first and last 3 days never get a trend (incomplete frame)
    val n = out.count()
    assert(out.filter(col("trend_cents").isNull).count() >= 6 || n < 7)
    out.unpersist()
  }

  private def spends(pairs: Seq[(Long, String, Double)]) =
    pairs.toDF("user_id", "event_type", "value")

  test("L20m welch t-test: 3v3 fixture lands on t2 = 9.6237 exactly; " +
      "degenerate arms gate to NULL") {
    // arm0 (even ids) spends {1,2,3}, arm1 (odd) {10,20,30} dollars:
    // A = 600*3-6000*3 = -16200, U0 = 60000, U1 = 6e6,
    // t2 = A^2*4 / (60000*18 + 6e6*18) = 9.62376...
    val sep = operators.Events.eventTtestWelchOn(spends(Seq(
      (0L, "view", 1.0), (2L, "view", 2.0), (4L, "view", 3.0),
      (1L, "view", 10.0), (3L, "view", 20.0), (5L, "view", 30.0)))).head()
    assert(sep.getAs[Long]("n0") == 3L && sep.getAs[Long]("n1") == 3L)
    assert(sep.getAs[Long]("spend0") == 600L)
    assert(sep.getAs[Long]("mean1_milli") == 2000000L)
    assert(sep.getAs[Long]("t2_milli") == 9623L)
    assert(sep.getAs[Boolean]("significant"))
    // single-user arm (< 2) -> NULL statistic
    val tiny = operators.Events.eventTtestWelchOn(spends(Seq(
      (0L, "view", 1.0), (2L, "view", 2.0), (1L, "view", 5.0)))).head()
    assert(tiny.isNullAt(tiny.fieldIndex("t2_milli")))
    // zero variance in BOTH arms -> NULL, not divide-by-zero
    val flat = operators.Events.eventTtestWelchOn(spends(Seq(
      (0L, "view", 5.0), (2L, "view", 5.0),
      (1L, "view", 7.0), (3L, "view", 7.0)))).head()
    assert(flat.isNullAt(flat.fieldIndex("t2_milli")))
  }

  test("L20n anova: two 3-row groups give F = 9.6237; partial sums " +
      "reconcile with the per-event totals") {
    // type a cents {100,200,300}, type b {1000,2000,3000}:
    // SSW = 20000 + 2000000, SST = 6880000, F = 4860000*4/2020000
    val r = operators.Events.eventAnovaOn(spends(Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 10.0), (5L, "b", 20.0), (6L, "b", 30.0)))).head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("ssw_cents2") == 2020000L)
    assert(r.getAs[Long]("ssb_cents2") == 4860000L)
    assert(r.getAs[Long]("f_milli") == 9623L)
    // one group (k = 1) -> F undefined
    val one = operators.Events.eventAnovaOn(spends(Seq(
      (1L, "a", 1.0), (2L, "a", 2.0)))).head()
    assert(one.isNullAt(one.fieldIndex("f_milli")))
    // corpus: SSB + SSW recompose SST within the per-group floor loss
    val c = operators.Events.eventAnova(spark, sf).head()
    assert(c.getAs[Long]("n") ==
      Tables.events(spark, sf).count())
    assert(c.getAs[Long]("ssb_cents2") >= 0L &&
      c.getAs[Long]("ssw_cents2") >= 0L)
  }

  test("L20o diff-in-diffs: hand 2x2 gives +500000 ppm lift and a " +
      "clean pre-trend") {
    // control (even): u0 converts only post, u2 never; treated (odd):
    // u1 and u3 both convert post only -> DiD = (1.0-0) - (0.5-0)
    val ev = Seq(
      (0L, "view", ts("2024-01-05 10:00:00")),
      (0L, "purchase", ts("2024-01-20 10:00:00")),
      (2L, "view", ts("2024-01-05 11:00:00")),
      (2L, "view", ts("2024-01-20 11:00:00")),
      (1L, "view", ts("2024-01-06 09:00:00")),
      (1L, "purchase", ts("2024-01-21 09:00:00")),
      (3L, "view", ts("2024-01-07 09:00:00")),
      (3L, "purchase", ts("2024-01-22 09:00:00")))
      .toDF("user_id", "event_type", "ts")
    val r = operators.Events.eventDidOn(ev).head()
    assert(r.getAs[Long]("n_t_pre") == 2L && r.getAs[Long]("x_t_pre") == 0L)
    assert(r.getAs[Long]("n_t_post") == 2L && r.getAs[Long]("x_t_post") == 2L)
    assert(r.getAs[Long]("cr_c_post_ppm") == 500000L)
    assert(r.getAs[Long]("pretrend_gap_ppm") == 0L)
    assert(r.getAs[Long]("did_ppm") == 500000L)
    // exactly one output row on the corpus; cells conserve active users
    val c = operators.Events.eventDid(spark, sf)
    assert(c.count() == 1)
  }

  test("L20p windowed funnel: late steps fall out of the conversion " +
      "window; wider windows only grow each step") {
    // u1 completes all in-window; u2's click is 9 days late; u3's
    // purchase is 17 days after the click; u4 never views
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (2L, 1L, "click", ts("2024-01-02 10:00:00")),
      (3L, 1L, "purchase", ts("2024-01-03 10:00:00")),
      (4L, 2L, "view", ts("2024-01-01 10:00:00")),
      (5L, 2L, "click", ts("2024-01-10 10:00:00")),
      (6L, 3L, "view", ts("2024-01-01 10:00:00")),
      (7L, 3L, "click", ts("2024-01-02 10:00:00")),
      (8L, 3L, "purchase", ts("2024-01-19 10:00:00")),
      (9L, 4L, "click", ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.Events.eventFunnelWindowOn(ev)
      .select("step", "n_users", "pct_ppm")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("view", 3L, 1000000L), ("click", 2L, 666666L),
      ("purchase", 1L, 333333L)))
    // corpus: tightening the window can only shrink each step (the
    // 30-day window spans the whole corpus = the sequential funnel;
    // note this funnel is SEQUENTIAL — each step chains off the
    // previous qualifying event, so it is not bounded by the stricter
    // first-touch eventFunnel)
    val wf = operators.Events.eventFunnelWindowOn(
        Tables.events(spark, sf))
      .select("step", "n_users").as[(String, Long)].collect().toMap
    val wide = operators.Events.eventFunnelWindowOn(
        Tables.events(spark, sf), windowDays = 30)
      .select("step", "n_users").as[(String, Long)].collect().toMap
    wf.foreach { case (step, n) => assert(n <= wide(step),
      s"3-day $step=$n exceeds 30-day ${wide(step)}") }
    assert(wf("view") == wide("view"))
  }

  test("L20r adstock: a single spike decays through exact powers of " +
      "two over its 8-day tail") {
    val ev = Seq((1L, 1L, "ad", 1.0, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val got = operators.Events.eventAdstockOn(ev)
      .select("d", "adstock_x128", "cents_raw")
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(12800L, 6400L, 3200L, 1600L, 800L,
      400L, 200L, 100L)) // 100 cents x 2^(7-k)
    assert(got.map(_._3) == (Seq(100L) ++ Seq.fill(7)(0L)))
    assert(got.map(_._1.toString) ==
      (1 to 8).map(i => f"2024-01-$i%02d"))
    // corpus: the raw series is conserved (k=0 terms) and adstock
    // dominates 128x raw only when there is no carryover
    val c = operators.Events.eventAdstock(spark, sf).cache()
    val rawSum = c.agg(sum("cents_raw")).as[Long].head()
    val direct = Tables.events(spark, sf)
      .select(floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .agg(sum("c")).as[Long].head()
    assert(rawSum == direct)
    assert(c.filter(col("adstock_x128") < col("cents_raw") * 128).count() == 0)
    c.unpersist()
  }

  test("L20s sma crossover: flat series never signals; a spike fires " +
      "exactly one up-cross") {
    val days = (1 to 9).map { i =>
      val v = if (i == 8) 100.0 else if (i == 9) 0.01 else 0.10
      (i.toLong, 1L, "a", v, ts(f"2024-01-$i%02d 10:00:00"))
    }
    val ev = days.toDF("event_id", "user_id", "event_type", "value", "ts")
    val got = operators.Events.tsSmaCrossOn(ev)
      .select("d", "diff_x21", "cross_up", "cross_down")
      .as[(java.sql.Date, Long, Boolean, Boolean)].collect().toSeq
    assert(got.map(_._2) == Seq(0L, 39960L, 39924L))
    assert(got.map(_._3) == Seq(false, true, false))
    assert(got.forall(!_._4))
    // corpus: signals only fire on actual sign flips of the diff
    val c = operators.Events.tsSmaCross(spark, sf).collect()
    c.groupBy(_.getAs[String]("event_type")).values.foreach { g =>
      val s = g.sortBy(_.getAs[java.sql.Date]("d").toString)
      s.sliding(2).foreach {
        case Array(a, b) =>
          val flipUp = b.getAs[Long]("diff_x21") > 0 &&
            a.getAs[Long]("diff_x21") <= 0
          assert(b.getAs[Boolean]("cross_up") == flipUp)
        case _ =>
      }
    }
  }

  test("L20x transition audit: illegal edges surface first with exact " +
      "counts; whitelist edges pass") {
    val ev = Seq(
      (1L, 1L, "signup", ts("2024-01-01 10:00:00")),
      (2L, 1L, "view", ts("2024-01-01 10:01:00")),
      (3L, 1L, "click", ts("2024-01-01 10:02:00")),
      (4L, 1L, "purchase", ts("2024-01-01 10:03:00")),
      (5L, 2L, "purchase", ts("2024-01-02 10:00:00")),
      (6L, 2L, "purchase", ts("2024-01-02 10:01:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.Events.eventTransitionAuditOn(ev)
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(got.head == ("purchase", "purchase", 1L, false))
    assert(got.tail.forall(_._4))
    assert(got.map(_._3).sum == 4L) // every consecutive pair audited
    // corpus: edge counts conserve the lag relation
    val c = operators.Events.eventTransitionAudit(spark, sf)
    val nEdges = c.agg(sum("n")).as[Long].head()
    val users = Tables.events(spark, sf).groupBy("user_id").count()
    val expected = users.agg(sum(col("count") - 1)).as[Long].head()
    assert(nEdges == expected)
  }

  test("L20w benford: hand digit counts hit exact ppm shares; zero " +
      "amounts are excluded; all nine digits always present") {
    val ev = Seq(1.00, 0.25, 2.50, 0.09, 0.00).zipWithIndex.map {
      case (v, i) => (i.toLong, 1L, "a", v, ts("2024-01-01 10:00:00"))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
    val got = operators.Events.eventBenfordOn(ev)
      .select("digit", "n_obs", "obs_ppm", "dev_ppm")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(r => r._1 -> r._2).toMap ==
      Map("1" -> 1L, "2" -> 2L, "3" -> 0L, "4" -> 0L, "5" -> 0L,
        "6" -> 0L, "7" -> 0L, "8" -> 0L, "9" -> 1L))
    val m = got.map(r => r._1 -> r).toMap
    assert(m("1")._3 == 250000L && m("2")._3 == 500000L)
    assert(m("2")._4 == 500000L - 176091L)
    assert(m("3")._4 == -124939L) // absent digit: minus expected
    // corpus: shares sum to ~1e6 (floor loss < 9 ppm)
    val c = operators.Events.eventBenford(spark, sf)
    val total = c.agg(sum("obs_ppm")).as[Long].head()
    assert(total > 999991L && total <= 1000000L)
    assert(c.count() == 9)
  }

  test("L20t drawdown: trough below the running peak found with its " +
      "date; tie goes to the earliest day") {
    val ev = Seq(1.00, 3.00, 2.00, 0.50, 2.50).zipWithIndex.map {
      case (v, i) => (i.toLong, 1L, "a", v,
        ts(f"2024-01-${i + 1}%02d 10:00:00"))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = operators.Events.tsDrawdownOn(ev).head()
    assert(r.getAs[java.sql.Date]("trough_day").toString == "2024-01-04")
    assert(r.getAs[Long]("peak_cents") == 300L)
    assert(r.getAs[Long]("trough_cents") == 50L)
    assert(r.getAs[Long]("max_drawdown_cents") == -250L)
    // corpus: drawdown is never positive, and the trough day is real
    val c = operators.Events.tsDrawdown(spark, sf)
    assert(c.filter(col("max_drawdown_cents") > 0).count() == 0)
    assert(c.count() ==
      Tables.events(spark, sf).select("event_type").distinct().count())
  }

  test("L20u interarrival: hand gaps give the pinned mean and rank " +
      "percentiles") {
    val ev = Seq(0, 10, 40, 100).zipWithIndex.map { case (sec, i) =>
      (i.toLong, 1L, "a", new Timestamp(1704100000000L + sec * 1000L))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val r = operators.Events.tsInterarrivalOn(ev).head()
    assert(r.getAs[Long]("n_gaps") == 3L)
    assert(r.getAs[Long]("mean_gap_us") == 33333333L)
    assert(r.getAs[Long]("p50_gap_us") == 30000000L)
    assert(r.getAs[Long]("p90_gap_us") == 30000000L)
    // corpus: p50 <= p90 everywhere, gaps non-negative
    val c = operators.Events.tsInterarrival(spark, sf)
    assert(c.filter(col("p50_gap_us") > col("p90_gap_us")).count() == 0)
    assert(c.filter(col("mean_gap_us") < 0).count() == 0)
  }

  test("L20v theil-sen: one outlier day cannot bend the median slope") {
    val ev = Seq(1.0, 2.0, 3.0, 100.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, "a", v, ts(f"2024-01-${i + 1}%02d 10:00:00"))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = operators.Events.tsTheilsenOn(ev).head()
    assert(r.getAs[Long]("n_pairs") == 6L)
    // clean 100 cents/day despite the 100x final-day outlier
    assert(r.getAs[Long]("slope_micro") == 100000000L)
    assert(r.getAs[Boolean]("rising"))
    // corpus: every series yields days*(days-1)/2 pairs
    val c = operators.Events.tsTheilsen(spark, sf).collect()
    val days = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      .groupBy("event_type").count().collect()
      .map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
    c.foreach { row =>
      val n = days(row.getAs[String]("event_type"))
      assert(row.getAs[Long]("n_pairs") == n * (n - 1) / 2)
    }
  }

  test("L20q uplift: planted segment effect ranks first with the right " +
      "qini increment; corpus cells partition the users") {
    // seg0 (users 0,1,10,11): both treated convert, controls don't;
    // seg1 (users 2,3,12,13): nobody converts
    val ev = Seq(
      (1L, 1L, "purchase", ts("2024-01-02 10:00:00")),
      (2L, 11L, "purchase", ts("2024-01-03 10:00:00")),
      (3L, 0L, "view", ts("2024-01-02 10:00:00")),
      (4L, 10L, "view", ts("2024-01-02 10:00:00")),
      (5L, 2L, "view", ts("2024-01-02 10:00:00")),
      (6L, 3L, "view", ts("2024-01-02 10:00:00")),
      (7L, 12L, "view", ts("2024-01-02 10:00:00")),
      (8L, 13L, "view", ts("2024-01-02 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.Events.eventUpliftOn(ev).collect()
    val top = got.head
    assert(top.getAs[Int]("segment") == 0 && top.getAs[Int]("rnk") == 1)
    assert(top.getAs[Long]("uplift_ppm") == 1000000L)
    assert(top.getAs[Long]("incr_milli") == 2000L) // 2 incremental convs
    assert(got.last.getAs[Long]("cum_incr_milli") ==
      got.map(_.getAs[Long]("incr_milli")).sum)
    // corpus: 5 segments, cells partition all active users, ranking
    // follows uplift descending
    val c = operators.Events.eventUplift(spark, sf).collect()
    assert(c.length == 5)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(c.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).sum
      == users)
    val ups = c.sortBy(_.getAs[Int]("rnk")).map(r =>
      if (r.isNullAt(r.fieldIndex("uplift_ppm"))) Long.MinValue
      else r.getAs[Long]("uplift_ppm"))
    assert(ups.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("event_shapley: hand lattice — full credit to the carrying " +
    "channel, zero to the free rider; signed truncation pinned; " +
    "corpus efficiency conserves n! * v(full)") {
    def ev(rows: Seq[(Long, String)]) = rows.zipWithIndex.map {
      case ((u, t), i) => (i.toLong, u, t, ts("2024-01-01 10:00:00"))
    }.toDF("event_id", "user_id", "event_type", "ts")
    // u1 click->buy (v{click}=1e6), u2 click+view->buy (v{full}=1e6),
    // u3 view only (v{view}=0): click carries everything, view rides
    val h = operators.Events.eventShapleyOn(ev(Seq(
      (1L, "click"), (1L, "purchase"),
      (2L, "click"), (2L, "view"), (2L, "purchase"),
      (3L, "view"))))
      .select("channel", "exposed_users", "conv_users", "phi_num",
        "nfact", "phi_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(h == Seq(
      ("click", 2L, 2L, 2000000L, 2L, 1000000L),
      ("view", 2L, 1L, 0L, 2L, 0L)))
    // negative marginal with an inexact quotient: -333333 DIV 2 must
    // truncate toward zero (-166666) in BOTH engines, not floor
    val neg = operators.Events.eventShapleyOn(ev(Seq(
      (1L, "click"), (1L, "purchase"), // 1 of 3 click-only users buys
      (2L, "click"), (3L, "click"),
      (4L, "click"), (4L, "view")))) // click+view user does NOT buy
      .select("channel", "phi_num", "phi_ppm")
      .as[(String, Long, Long)].collect().toSeq
    assert(neg == Seq(
      ("click", 333333L, 166666L),
      ("view", -333333L, -166666L)))
    // > 8 channels refuses: the 2^n lattice must stay bounded
    val wide = ev((1 to 9).map(i => (1L, s"ch$i")) :+ ((1L, "purchase")))
    intercept[IllegalStateException] {
      operators.Events.eventShapleyOn(wide).collect()
    }
    // corpus: efficiency sum(phi_num) = n! * (v(full) - v(empty))
    val events = Tables.events(spark, sf)
    val c = operators.Events.eventShapleyOn(events).collect()
    val nfact = c.head.getAs[Long]("nfact")
    val chans = events.filter(col("event_type") =!= "purchase")
      .select("event_type").distinct().count()
    val full = events.groupBy("user_id")
      .agg(countDistinct(when(col("event_type") =!= "purchase",
        col("event_type"))).as("nch"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      .filter(col("nch") === chans)
      .agg(count(lit(1)).as("u"), sum("conv").as("cv"))
      .select(expr("cv * 1000000 DIV u")).as[Long].head()
    assert(c.map(_.getAs[Long]("phi_num")).sum == nfact * full)
  }

  test("event_absorption: geometric chain unrolled by hand converges on " +
    "t=1.5 steps / a=1; a censored sink contributes zero") {
    // transitions from 'view': view->view once, view->purchase twice
    // (r=3): t_k = 1000 + floor(t_{k-1}/3) -> 1499 at k=8;
    // a_k = floor((2e6 + a_{k-1})/3) -> 999847 at k=8
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (2L, 1L, "purchase", ts("2024-01-01 11:00:00")),
      (3L, 2L, "view", ts("2024-01-02 09:00:00")),
      (4L, 2L, "view", ts("2024-01-02 10:00:00")),
      (5L, 2L, "purchase", ts("2024-01-02 11:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.Events.eventAbsorptionOn(ev)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("view", 1499L, 999847L)))
    // x -> y with y terminal and never absorbing: y is a censored
    // sink, so x never converts and every step costs exactly 1
    val dead = Seq(
      (1L, 1L, "x", ts("2024-01-01 10:00:00")),
      (2L, 1L, "y", ts("2024-01-01 11:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val g2 = operators.Events.eventAbsorptionOn(dead)
      .as[(String, Long, Long)].collect().toSeq
    assert(g2 == Seq(("x", 1000L, 0L)))
  }

  test("ts_seasonality_strength: a pure weekly pattern reads F_S = 1 and " +
    "NULL-gates F_T; a constant series gates both") {
    // one event per day, value = (i % 7 + 1) dollars: the 7-day MA is
    // exactly 400 cents everywhere, detr == the seasonal mean per dow,
    // residual identically zero
    val weekly = (0 until 21).map { i =>
      (i.toLong, i.toLong, "purchase",
        Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
        (i % 7 + 1).toDouble)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val r = operators.Events.tsSeasonalityStrengthOn(weekly).collect()(0)
    assert(r.getAs[Long]("n_days") == 15L)
    assert(r.isNullAt(r.fieldIndex("f_trend_ppm")))
    assert(r.getAs[Long]("f_seasonal_ppm") == 1000000L)
    val const = (0 until 21).map { i =>
      (i.toLong, i.toLong, "purchase",
        Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"), 5.0)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val c = operators.Events.tsSeasonalityStrengthOn(const).collect()(0)
    assert(c.isNullAt(c.fieldIndex("f_trend_ppm")) &&
      c.isNullAt(c.fieldIndex("f_seasonal_ppm")))
  }

  test("event_markov_attribution: removal effects unrolled by hand on a " +
    "two-channel chain; shares floor against the effect total") {
    // u1 view->purchase; u2 view->click->purchase; u3 click(end);
    // u4 view(end). Exact: a(start)=0.5; remove click -> 0.249999;
    // remove view -> 0.125
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (2L, 1L, "purchase", ts("2024-01-01 11:00:00")),
      (3L, 2L, "view", ts("2024-01-02 10:00:00")),
      (4L, 2L, "click", ts("2024-01-02 11:00:00")),
      (5L, 2L, "purchase", ts("2024-01-02 12:00:00")),
      (6L, 3L, "click", ts("2024-01-03 10:00:00")),
      (7L, 4L, "view", ts("2024-01-04 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = operators.Events.eventMarkovAttributionOn(ev,
      channels = Seq("click", "view"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("click", 500000L, 249999L, 250001L, 400L),
      ("view", 500000L, 125000L, 375000L, 599L)))
  }

  test("event_markov_attribution on the corpus: removal never helps, " +
    "p_full constant, shares bounded by 1000") {
    val out = operators.Events.eventMarkovAttribution(spark, sf)
      .localCheckpoint(true)
    assert(out.count() == 4)
    assert(out.select("p_full_ppm").distinct().count() == 1)
    assert(out.where(col("removal_effect_ppm") < 0L).count() == 0)
    val shares = out.agg(sum("attribution_milli")).as[Long].head()
    assert(shares <= 1000L && shares >= 996L)
  }

  test("agg_incremental_rollup: composed always equals batch (the " +
    "self-maintainability theorem), delta-only days insert cleanly") {
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-05 10:00:00"), 1.0),
      (2L, 2L, "view", ts("2024-01-05 11:00:00"), 2.0),
      (3L, 1L, "view", ts("2024-01-15 10:00:00"), 4.0),   // delta, same key
      (4L, 3L, "click", ts("2024-01-16 10:00:00"), 8.0),  // delta-only key
      (5L, 9L, "view", ts("2024-01-25 10:00:00"), 99.0))  // past t2: ignored
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = operators.Events.aggIncrementalRollupOn(ev,
      lit("2024-01-10").cast("timestamp"), lit("2024-01-20").cast("timestamp"))
      .select("event_type", "state_n", "delta_n", "n_composed",
        "cents_composed", "matches")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("click", 0L, 1L, 1L, 800L, true),
      ("view", 2L, 0L, 2L, 300L, true),
      ("view", 0L, 1L, 1L, 400L, true)))
  }

  test("agg_incremental_rollup on the corpus: every row matches and " +
    "state+delta reconcile") {
    val out = operators.Events.aggIncrementalRollup(spark, sf)
      .localCheckpoint(true)
    assert(out.count() > 0)
    assert(out.where(!col("matches")).count() == 0)
    assert(out.where(col("state_n") + col("delta_n") =!= col("n_composed"))
      .count() == 0)
  }

  test("event_absorption on the corpus: probabilities in [0, 1e6], " +
    "expected steps at least one, purchase never a transient row") {
    val out = operators.Events.eventAbsorption(spark, sf)
      .localCheckpoint(true)
    assert(out.count() > 0)
    assert(out.where(col("state") === "purchase").count() == 0)
    assert(out.where(col("a_ppm") < 0L || col("a_ppm") > 1000000L)
      .count() == 0)
    assert(out.where(col("t_milli") < 1000L).count() == 0)
  }
}
