package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** sketch_theta: planted identical/disjoint audiences + corpus
  * invariants. */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(rows: Seq[(String, Long)]) =
    rows.zipWithIndex.map { case ((t, u), i) =>
      (i.toLong, new Timestamp(1700000000000L + i * 1000L), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("identical audiences: sketches coincide, intersection estimate equals the set estimate") {
    // types X and Y share exactly the same 40 users; Z is disjoint
    val users = (1L to 40L)
    val rows = users.flatMap(u => Seq(("X", u), ("Y", u))) ++
      users.map(u => ("Z", u + 1000L))
    val out = functions.Sketches.sketchThetaOn(ev(rows))
      .select("type_a", "type_b", "est_a", "est_b", "est_union",
        "est_inter", "exact_inter", "err")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val xy = out(("X", "Y"))
    // same set -> same sketch -> union sketch == each sketch
    assert(xy._3 == xy._4 && xy._4 == xy._5 && xy._6 == xy._3)
    assert(xy._7 == 40L && xy._8 == xy._6 - 40L)
    val xz = out(("X", "Z"))
    assert(xz._7 == 0L && xz._6 >= 0L)
    // disjoint union must estimate at least the larger single set
    assert(xz._5 >= math.max(xz._3, xz._4))
  }

  test("exact mode below k: estimates equal true cardinalities, err is zero") {
    // 10 users per type < k=32 -> every sketch holds its whole set
    val users = (1L to 10L)
    val rows = users.flatMap(u => Seq(("X", u), ("Y", u + 5))) // overlap 5
    val out = functions.Sketches.sketchThetaOn(ev(rows))
      .select("est_a", "est_b", "est_union", "est_inter", "exact_inter", "err")
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert((0 to 4).map(r.getLong).toSeq == Seq(10L, 10L, 15L, 5L, 5L))
    assert(r.getLong(5) == 0L)
  }

  test("corpus run: 10 pairs, union dominates both sides, err column consistent") {
    // test sf holds 15 distinct users per type -> k=8 keeps estimation
    // real here; the catalog query's k=32 works against the gate sf's
    // 150+ users per type
    val out = functions.Sketches
      .sketchThetaOn(Tables.events(spark, sf), k = 8).cache()
    assert(out.count() == 10) // C(5,2) event-type pairs
    assert(out.filter(col("est_union") < greatest(col("est_a"), col("est_b")))
      .count() == 0)
    assert(out.filter(col("err") =!= col("est_inter") - col("exact_inter"))
      .count() == 0)
    assert(out.filter(col("est_inter") < 0).count() == 0)
    out.unpersist()
  }

  test("theta rollup: merging per-type sketches of one shared audience " +
      "reproduces the single-set estimate; corpus error is bounded") {
    // X and Y hold the SAME 40 users: the merged union sketch must
    // equal each per-type sketch, so the rollup estimate matches the
    // pairwise op's est_a exactly
    val users = (1L to 40L)
    val rows = users.flatMap(u => Seq(("X", u), ("Y", u)))
    val roll = functions.Sketches.sketchThetaRollupOn(ev(rows)).head()
    val pair = functions.Sketches.sketchThetaOn(ev(rows)).head()
    assert(roll.getAs[Long]("n_types") == 2L)
    assert(roll.getAs[Long]("est_users") == pair.getAs[Long]("est_a"))
    assert(roll.getAs[Long]("exact_users") == 40L)
    // corpus: estimate within the sketch's coarse band, same under
    // repartitioning (mergeability)
    val c = functions.Sketches.sketchThetaRollup(spark, sf).head()
    val exact = c.getAs[Long]("exact_users")
    assert(math.abs(c.getAs[Long]("err")) < exact,
      s"rollup err ${c.getAs[Long]("err")} vs exact $exact")
    val again = functions.Sketches.sketchThetaRollupOn(
      Tables.events(spark, sf).repartition(13)).head()
    assert(again.getAs[Long]("est_users") == c.getAs[Long]("est_users"))
  }

  private def li(rows: Seq[(Long, Int, String, Double)]) =
    rows.toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")

  test("quantile sketch: exact mode below k reproduces the exact rank " +
      "picks; partitioning never changes the sample") {
    // 9 rows, one group, k=256 >> 9: sample == group, errors == 0
    val rows = (1L to 9L).map(o => (o, 1, "A", o * 10.0))
    val out = functions.Sketches.sketchQuantileOn(li(rows)).head()
    assert(out.getAs[Long]("n") == 9L && out.getAs[Long]("m") == 9L)
    // rank rule: p50 idx = (9-1)*0.5+1 = 5 -> 50.00; p95 idx = 8.6->8+1...
    assert(out.getAs[Long]("p50_cents") == 5000L)
    assert(out.getAs[Long]("exact_p50") == 5000L)
    assert(out.getAs[Long]("err_p50") == 0L && out.getAs[Long]("err_p95") == 0L)
    // mergeability: 1-partition and 8-partition runs agree exactly
    val base = li((1L to 500L).map(o => (o, 1, (o % 3).toString, o * 1.0)))
    val one = functions.Sketches.sketchQuantileOn(base.repartition(1))
    val many = functions.Sketches.sketchQuantileOn(base.repartition(8))
    assert(one.exceptAll(many).count() == 0 && many.exceptAll(one).count() == 0)
  }

  test("quantile sketch on the corpus: real estimation with bounded error") {
    val c = functions.Sketches.sketchQuantile(spark, sf).cache()
    // every returnflag group is far beyond k -> sample saturates at 256
    assert(c.filter(col("n") <= 256 || col("m") =!= 256).count() == 0)
    // sampling error stays inside ~4/sqrt(k) of the value scale
    val bad = c.filter(
      abs(col("err_p50")) > col("exact_p50") * 0.25 ||
      abs(col("err_p95")) > col("exact_p95") * 0.25).count()
    assert(bad == 0, "quantile estimate outside 25% of exact")
    c.unpersist()
  }

  test("bloom fpr: no false positives at trivial load, and the " +
    "corpus calibration lands near the textbook prediction") {
    import spark.implicits._
    // 4 members in 2^16 bits: theory FPR ~ 0 ppm; disjoint probes
    val members = Seq(1L, 2L, 3L, 4L).toDF("key")
    val probes = Seq(100L, 200L, 300L).toDF("key")
    val tiny = functions.Sketches.sketchBloomFprOn(members, probes,
      bitsLog2 = 16).collect()(0)
    assert(tiny.getLong(2) === 4L && tiny.getLong(4) === 3L)
    assert(tiny.getLong(5) === 0L && tiny.getLong(7) === 0L)
    // corpus: fill ratio within 2% of m(1-e^(-kn/m)); false-positive
    // COUNT within a loose Poisson envelope of the predicted count
    // (at spec scale the prediction can round to zero hits)
    val r = functions.Sketches.sketchBloomFpr(spark, sf).collect()(0)
    val (m, n, setBits) = (r.getLong(0), r.getLong(2), r.getLong(3))
    val expFill = m * (1 - math.exp(-3.0 * n / m))
    assert(math.abs(setBits - expFill) < m * 0.02, s"$setBits vs $expFill")
    val expected = r.getLong(4) * r.getLong(7) / 1e6
    assert(r.getLong(7) > 0)
    assert(r.getLong(5) <= 3 * expected + 4,
      s"${r.getLong(5)} FPs vs expected $expected")
  }

  test("hll: registers are multiplicity-invariant, the raw-estimate " +
    "formula replays, and linear counting lands within a few of exact") {
    val users = (1L to 30L)
    val once = ev(users.map(u => ("X", u)))
    val thrice = ev(users.flatMap(u => Seq(("X", u), ("X", u), ("X", u))))
    val a = functions.Sketches.sketchHllOn(once).collect()(0)
    val b = functions.Sketches.sketchHllOn(thrice).collect()(0)
    // a register is max-rho over occurrences: duplicates change nothing
    assert(a.getAs[Long]("s_scaled") == b.getAs[Long]("s_scaled"))
    assert(a.getAs[Long]("est") == b.getAs[Long]("est"))
    assert(a.getAs[Long]("exact_users") == 30L)
    // 30 << 2.5m with empty registers -> the linear-counting branch,
    // whose error at this occupancy is a couple of collisions at most
    assert(math.abs(a.getAs[Long]("err")) <= 4L)
    // mechanism replay: est_raw = floor(alpha_micro*m^2*2^23/(S*1e6))
    val s = a.getAs[Long]("s_scaled")
    val want = (BigInt(718272) * 65536 * 8388608 /
      (BigInt(s) * 1000000)).toLong
    assert(a.getAs[Long]("est_raw") == want)
  }

  test("hll on the corpus: register geometry conserved, estimates " +
    "inside a generous multiple of the published 6.5% error") {
    val out = functions.Sketches.sketchHll(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_hit") + r.getAs[Long]("v_empty") == 256L)
      val exact = r.getAs[Long]("exact_users")
      assert(exact > 0L)
      assert(math.abs(r.getAs[Long]("err")) <=
        math.max(10L, exact * 25 / 100),
        s"${r.getAs[String]("event_type")}: est=${r.getAs[Long]("est")} " +
          s"exact=$exact")
    }
  }
}
