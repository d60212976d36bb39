package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.operators.Planning

/** Hand-computable fixtures for the capacity/experiment-planning
  * operators (operators/Planning.scala): the interval-sweep peak
  * concurrency, lead-lag cross-correlation, and two-proportion
  * sample-size planning. Each also has a DuckDB oracle; these pin
  * the intended semantics directly. */
class PlanningSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*): DataFrame =
    rows.zipWithIndex.map { case ((uid, et, t), i) =>
      (i.toLong, ts(t), uid, et, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("concurrency: overlapping sessions of two users peak at 2") {
    // u1 active 10:00-10:20, u2 active 10:10-10:30 -> overlap 10:10-10:20
    val e = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:20:00"),
      (2L, "view", "2024-01-01 10:10:00"),
      (2L, "view", "2024-01-01 10:30:00"))
    val r = Planning.eventConcurrencyOn(e).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 2L) // peak
    assert(r(0).getLong(2) === 2L) // two session segments that day
  }

  test("concurrency: a >30min gap splits one user into two sessions, peak stays 1") {
    val e = ev(
      (1L, "view", "2024-01-01 09:00:00"),
      (1L, "view", "2024-01-01 09:10:00"),
      (1L, "view", "2024-01-01 11:00:00")) // 110min after: new session
    val r = Planning.eventConcurrencyOn(e).collect()
    assert(r(0).getLong(1) === 1L)
    assert(r(0).getLong(2) === 2L)
  }

  test("concurrency: touching end/start instants count as concurrent (start-before-end tie rule)") {
    // u2's session starts at the exact microsecond u1's ends
    val e = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:10:00"),
      (2L, "view", "2024-01-01 10:10:00"),
      (2L, "view", "2024-01-01 10:15:00"))
    assert(Planning.eventConcurrencyOn(e).collect()(0).getLong(1) === 2L)
  }

  test("concurrency: a midnight-crossing session is split and counted on both days") {
    val e = ev(
      (1L, "view", "2024-01-01 23:50:00"),
      (1L, "view", "2024-01-02 00:10:00"))
    val r = Planning.eventConcurrencyOn(e)
      .select("d", "peak_concurrency", "n_segments")
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    assert(r.map(_._1.toString) === Seq("2024-01-01", "2024-01-02"))
    assert(r.map(_._2) === Seq(1L, 1L))
    assert(r.map(_._3) === Seq(1L, 1L))
  }

  test("xcorr: purchases = clicks shifted by 2 days -> r exactly 1 at k=2") {
    // clicks on days 1-4 with counts 1,2,3,4; purchases identical on
    // days 3-6: at k=2 the overlapping pairs are (1,1),(2,2),(3,3),(4,4)
    val rows = for {
      (day, n, et) <- Seq(("01", 1, "click"), ("02", 2, "click"),
        ("03", 3, "click"), ("04", 4, "click"),
        ("03", 1, "purchase"), ("04", 2, "purchase"),
        ("05", 3, "purchase"), ("06", 4, "purchase"))
      j <- 1 to n
    } yield (j.toLong, s"2024-01-$day 0$j:00:00")
    val e = ev(rows.zip(rows.indices).map { case ((u, t), i) =>
      (u, if (i < 10) "click" else "purchase", t)
    }: _*)
    // rebuild with correct event types: first 10 rows are the click
    // days (1+2+3+4), the rest the purchase days
    val r = Planning.tsXcorrOn(e, maxLag = 3)
      .select("k", "r_xcorr").as[(Long, Option[Double])]
      .collect().toMap
    assert(r(2L) === Some(1.0))
    assert(r(0L).exists(_ < 1.0)) // unshifted series are not identical
  }

  test("power: n0=n1=5, x0=1, x1=2 -> n_per_arm = 78 (hand-checked)") {
    // p0=0.2, p1=0.4 -> v = 2e5*8e5 + 4e5*6e5 = 4.0e11 ppm^2,
    // delta = 2e5 ppm -> n = 7848886 * 4e11 div (4e10 * 1e6) = 78
    val rows = (0L to 9L).map { u =>
      (u, if (u == 0L || u == 1L || u == 3L) "purchase" else "view",
        s"2024-01-01 0${u % 10}:00:00")
    }
    val e = ev(rows: _*)
    val r = Planning.eventPowerOn(e).collect()(0)
    assert(r.getAs[Long]("n0") === 5L)
    assert(r.getAs[Long]("x0") === 1L)
    assert(r.getAs[Long]("x1") === 2L)
    assert(r.getAs[Long]("delta_ppm") === 200000L)
    assert(r.getAs[Long]("n_per_arm") === 78L)
  }

  test("bounce: single-event session counts as a bounce; depth averages exactly") {
    // u1: one 2-event session; u2: one 1-event session (bounce)
    val e = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:10:00"),
      (2L, "view", "2024-01-01 12:00:00"))
    val r = Planning.eventBounceOn(e).collect()(0)
    assert(r.getAs[Long]("n_sessions") === 2L)
    assert(r.getAs[Long]("n_bounces") === 1L)
    assert(r.getAs[Long]("bounce_ppm") === 500000L)
    assert(r.getAs[Long]("depth_milli") === 1500L)
  }

  test("bounce: sessions land on their START day") {
    val e = ev(
      (1L, "view", "2024-01-01 23:50:00"),
      (1L, "view", "2024-01-02 00:05:00")) // same session, starts Jan 1
    val r = Planning.eventBounceOn(e)
      .select("d").as[java.sql.Date].collect().toSeq
    assert(r.map(_.toString) === Seq("2024-01-01"))
  }

  test("freshness: a stream lagging the corpus watermark by >24h flags stale") {
    val e = ev(
      (1L, "click", "2024-01-03 12:00:00"),
      (2L, "error", "2024-01-02 10:00:00")) // 26h behind the watermark
    val byType = Planning.dqFreshnessOn(e)
      .select("event_type", "lag_hours", "is_stale")
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byType("click") === ((0L, false)))
    assert(byType("error") === ((26L, true)))
  }

  test("power: equal conversion rates gate to NULL instead of dividing by zero") {
    val e = ev(
      (0L, "purchase", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"))
    assert(Planning.eventPowerOn(e).collect()(0)
      .isNullAt(Planning.eventPowerOn(e).columns.indexOf("n_per_arm")))
  }

  test("dq_completeness: nulls and whitespace-only blanks both drain " +
    "populated_ppm; a duplicate key flips is_unique; blanks only " +
    "count on string columns") {
    import spark.implicits._
    val docs = Seq(
      (Some(1L), Some("hello"), Some("en"), Some("s1"), Some(5L)),
      (Some(1L), Some("   "), Some("en"), Some("s2"), Some(3L)), // dup id, blank text
      (Some(2L), None, None, Some("s1"), None))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Planning.dqCompletenessOn(docs)
      .select("column_name", "n_rows", "n_null", "n_blank", "n_distinct",
        "populated_ppm", "is_unique")
      .as[(String, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      ("doc_id", 3L, 0L, 0L, 2L, 1000000L, false), // dup key caught
      ("lang", 3L, 1L, 0L, 1L, 666666L, false),
      ("n_chars", 3L, 1L, 0L, 2L, 666666L, true), // 2 distinct = 2 non-null
      ("source", 3L, 0L, 0L, 2L, 1000000L, false),
      // unique-among-non-null: the blank IS a distinct value
      ("text", 3L, 1L, 1L, 2L, 333333L, true)), got.mkString(","))
  }

  test("power: an EMPTY arm still yields one row, NULL-gated (the oracle's " +
    "scalar-subquery semantics), never zero rows") {
    // only odd user ids -> arm 0 is empty
    val e = ev(
      (1L, "purchase", "2024-01-01 01:00:00"),
      (3L, "view", "2024-01-01 02:00:00"))
    val out = Planning.eventPowerOn(e).collect()
    assert(out.length == 1)
    val r = out(0)
    val cols = Planning.eventPowerOn(e).columns
    for (c <- Seq("n0", "x0", "p0_ppm", "delta_ppm", "n_per_arm"))
      assert(r.isNullAt(cols.indexOf(c)), s"$c should be NULL")
    assert(r.getAs[Long]("n1") === 2L)
    assert(r.getAs[Long]("x1") === 1L)
  }

  test("dq rules: NULL predicates violate; dup keys and fk orphans counted") {
    val li = Seq(
      // (okey, lineno, qty, price, disc, tax, rflag, lstatus)
      (Some(1L), 1, 10.0, 100.0, 0.05, 0.02, "A", "F"),  // clean
      (Some(1L), 1, 10.0, 100.0, 0.05, 0.02, "A", "F"),  // dup key
      (Some(2L), 1, 99.0, -5.0, 0.50, 0.99, "X", "Z"),   // 5 row violations
      (None, 2, Double.NaN, 100.0, 0.05, 0.02, "N", "O"), // null key
      (Some(9L), 1, 10.0, 100.0, 0.05, 0.02, "R", "O"))  // fk orphan
      .map { case (ok, ln, q, p, d, t, rf, ls) =>
        (ok, ln, Option(q).filterNot(_.isNaN), p, d, t, rf, ls)
      }
      .toDF("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus")
    val ord = Seq(1L, 2L).toDF("o_orderkey")
    val r = Planning.dqRulesOn(li, ord).collect()
      .map(x => (x.getString(0), x.getLong(2), x.getBoolean(4)))
    assert(r.map(_._1).toSeq === Seq(
      "01_orderkey_not_null", "02_quantity_in_1_50",
      "03_discount_in_0_10pct", "04_tax_in_0_8pct",
      "05_returnflag_in_set", "06_linestatus_in_set",
      "07_price_positive", "08_pk_unique", "09_fk_orders_exists"))
    val v = r.map(x => x._1 -> x._2).toMap
    assert(v("01_orderkey_not_null") === 1L)  // the null-key row
    assert(v("02_quantity_in_1_50") === 2L)   // 99 + NULL qty
    assert(v("03_discount_in_0_10pct") === 1L)
    assert(v("04_tax_in_0_8pct") === 1L)
    assert(v("05_returnflag_in_set") === 1L)
    assert(v("06_linestatus_in_set") === 1L)
    assert(v("07_price_positive") === 1L)
    // 5 rows - 3 distinct non-null keys {1/1, 2/1, 9/1}: the dup AND
    // the null-key row are key violations (a NULL key can't be unique)
    assert(v("08_pk_unique") === 2L)
    assert(v("09_fk_orders_exists") === 2L)   // orphan 9 + null key
    assert(r.forall(x => !x._3 || x._2 === 0L))
  }

  test("market basket: hand incidence gives exact support/confidence/lift") {
    // users: 1 {a,b}, 2 {a,b}, 3 {a}, 4 {b,c} -> n=4
    // pair (a,b): c_ab=2, c_a=3, c_b=3 -> lift = 1000*4*2/9 = 888
    // pair (b,c): c_ab=1, c_b=3, c_c=1 -> lift = 4000/3 = 1333
    val e = ev(
      (1L, "a", "2024-01-01 10:00:00"), (1L, "b", "2024-01-01 10:01:00"),
      (1L, "a", "2024-01-01 10:02:00"), // duplicate incidence collapses
      (2L, "a", "2024-01-01 10:00:00"), (2L, "b", "2024-01-01 10:01:00"),
      (3L, "a", "2024-01-01 10:00:00"),
      (4L, "b", "2024-01-01 10:00:00"), (4L, "c", "2024-01-01 10:01:00"))
    val r = Planning.eventMarketBasketOn(e).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6),
        x.getLong(7), x.getLong(8)))
    assert(r.toSeq === Seq(
      ("a", "b", 3L, 3L, 2L, 500000L, 666666L, 666666L, 888L),
      ("b", "c", 3L, 1L, 1L, 250000L, 333333L, 1000000L, 1333L)))
  }

  test("stickiness: trailing distinct actives, ghost days never emit") {
    val e = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-01 11:00:00"),
      (1L, "view", "2024-01-02 10:00:00"),
      (3L, "view", "2024-01-03 10:00:00"))
    val r = Planning.eventStickinessOn(e, windowDays = 2).collect()
      .map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2),
        x.getLong(3)))
    assert(r.toSeq === Seq(
      ("2024-01-01", 2L, 2L, 1000000L),
      ("2024-01-02", 1L, 2L, 500000L),   // u1 active; {u1,u2} trailing
      ("2024-01-03", 1L, 2L, 500000L)))  // u3 active; {u1,u3} trailing
  }

  test("burstiness: metronome pins -1, bursts go positive, " +
    "single-gap and zero-gap processes NULL-gate") {
    val metro = ev((0 to 3).map(i =>
      (1L, "a", f"2024-01-01 10:0$i:00")): _*) // gaps 60,60,60
    val m = Planning.tsBurstinessOn(metro).collect()(0)
    assert(m.getLong(1) === 3L && m.getDouble(3) === -1.0)
    // gaps 0, 0, 30 -> B = (sqrt(1800) - 30)/(sqrt(1800) + 30)
    val burst = ev(
      (1L, "a", "2024-01-01 10:00:00"), (1L, "a", "2024-01-01 10:00:00"),
      (1L, "a", "2024-01-01 10:00:00"), (1L, "a", "2024-01-01 10:00:30"))
    val b = Planning.tsBurstinessOn(burst).collect()(0)
    val expect = (math.sqrt(1800.0) - 30) / (math.sqrt(1800.0) + 30)
    assert(math.abs(b.getDouble(3) - expect) < 1e-12)
    // one gap -> n_gaps < 2 -> NULL
    val one = ev((1L, "a", "2024-01-01 10:00:00"),
      (1L, "a", "2024-01-01 10:01:00"))
    assert(Planning.tsBurstinessOn(one).collect()(0).isNullAt(3))
  }

  test("new vs returning: first-ever day is new, later days returning") {
    val e = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-02 10:00:00"),
      (2L, "view", "2024-01-02 11:00:00"))
    val r = Planning.eventNewReturningOn(e).collect()
      .map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2),
        x.getLong(3)))
    assert(r.toSeq === Seq(
      ("2024-01-01", 1L, 0L, 1000000L),
      ("2024-01-02", 1L, 1L, 500000L)))
  }

  test("reciprocity: symmetric flow pins 10^6, one-way flow pins 0, " +
    "min-rule exact on asymmetric pairs") {
    // u1: a->b, b->a (symmetric); u2: a->c, a->c via two sessions?
    // build per-user chains: u1 a b a ; u2 a c ; u3 a c ; u4 c a? no:
    // want one-way a->c only: u2 and u3 both a then c
    val e = ev(
      (1L, "a", "2024-01-01 10:00:00"), (1L, "b", "2024-01-01 10:01:00"),
      (1L, "a", "2024-01-01 10:02:00"),
      (2L, "a", "2024-01-01 10:00:00"), (2L, "c", "2024-01-01 10:01:00"),
      (3L, "a", "2024-01-01 10:00:00"), (3L, "c", "2024-01-01 10:01:00"),
      (4L, "c", "2024-01-01 10:00:00"), (4L, "a", "2024-01-01 10:01:00"),
      (4L, "c", "2024-01-01 10:02:00"), (4L, "a", "2024-01-01 10:03:00"))
    val r = Planning.graphReciprocityOn(e).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    // a<->b: 1 each way -> 10^6; a<->c: fwd a->c = 2+1(u4)=3,
    // rev c->a = 2 -> 2*2*1e6/5 = 800000
    assert(r.toSeq === Seq(
      ("a", "b", 1L, 1L, 1000000L),
      ("a", "c", 3L, 2L, 800000L)))
    // one-way only: b -> c never reciprocated
    val ow = ev((1L, "b", "2024-01-01 10:00:00"),
      (1L, "c", "2024-01-01 10:01:00"))
    val o = Planning.graphReciprocityOn(ow).collect()(0)
    assert((o.getLong(2), o.getLong(3), o.getLong(4)) === ((1L, 0L, 0L)))
  }

  test("dq rules: clean relation passes every rule") {
    val li = Seq((1L, 1, 10.0, 100.0, 0.05, 0.02, "A", "F"),
      (1L, 2, 20.0, 50.0, 0.0, 0.0, "N", "O"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus")
    val ord = Seq(1L).toDF("o_orderkey")
    val r = Planning.dqRulesOn(li, ord).collect()
    assert(r.length === 9)
    assert(r.forall(_.getBoolean(4)))
    assert(r.forall(_.getLong(3) === 0L))
  }

  test("mde curve: hand pooled rate replays the formula; MDE shrinks " +
    "as 1/sqrt(n) across the factor sweep") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    // 100 users, 25 convert -> p = 250000 ppm, n_arm = 50
    val ev = (1L to 100L).map { u =>
      (u, t0, u, if (u <= 25) "purchase" else "view", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = operators.Planning.eventMdeCurveOn(ev)
      .select("factor_milli", "n_per_arm", "p_ppm", "mde_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == Seq(250L, 500L, 1000L, 2000L, 4000L))
    assert(out.forall(_._3 == 250000L))
    assert(out.map(_._2) == Seq(12L, 25L, 50L, 100L, 200L))
    // replay: mde = floor(sqrt(K*2*p(1e6-p) / (1e6*n)))
    out.foreach { r =>
      val want = math.floor(math.sqrt(
        (7848886L * 2L * (250000L * 750000L)).toDouble /
          (1000000.0 * r._2))).toLong
      assert(r._4 == want, s"row $r want $want")
    }
    // monotone: quadrupling n halves the MDE (within floor slack)
    assert(out.head._4 > out.last._4)
  }
}
