package graft

import org.apache.spark.sql.functions._

/** Invariant specs for the analytics/sources surface (each query also
  * has a DuckDB oracle; these pin semantic invariants directly). */
class AnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  test("scan_filter_paths lists exactly the 10 corpus tables") {
    val names = sources.Sources.scanFilterPaths(spark, sf)
      .select("file_name").as[String].collect().toSet
    assert(names == Tables.names.map(_ + ".parquet").toSet)
  }

  test("pivot conserves rows: per-user counts sum to the event total") {
    val p = operators.Analytics.aggPivot(spark, sf)
    val total = p.select(
      (col("click") + col("view") + col("purchase") +
        col("signup") + col("error")).as("s"))
      .agg(sum("s")).as[Long].head()
    assert(total == Tables.events(spark, sf).count())
  }

  test("range-frame running spend always includes the current order") {
    val bad = operators.Analytics.windowRangeFrame(spark, sf)
      .filter(col("spend_90d") < col("o_totalprice")).count()
    assert(bad == 0)
  }

  test("unpivot is the inverse of the pivot shape (cell count preserved)") {
    val wide = Tables.orders(spark, sf).select("o_orderpriority")
      .distinct().count()
    assert(operators.Analytics.aggUnpivot(spark, sf).count() == wide * 3)
  }

  test("anomaly_mad: only the planted outlier flags; constant groups flag nothing") {
    val events = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0),
      (5L, "a", 100.0), // median 3, adev [2,1,0,1,97], mad 1 -> only this flags
      (6L, "b", 7.0), (7L, "b", 7.0), (8L, "b", 7.0)) // mad 0, no deviation
      .toDF("event_id", "event_type", "value")
    val got = operators.Analytics.anomalyMadOn(events)
      .as[(Long, String, Double, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq((5L, "a", 100.0)))
    assert(got.head._4 == BigDecimal(97.0 / 1.4826)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("split assignment is ~80/10/10 and deterministic across runs") {
    val a = operators.Analytics.aggTypedArgmax(spark, sf) // warm unrelated
    val s1 = functions.Text.textSplitAssign(spark, sf)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val s2 = functions.Text.textSplitAssign(spark, sf)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(s1 == s2)
    val n = s1.values.sum.toDouble
    assert(s1("train") / n > 0.7 && s1("train") / n < 0.9)
  }

  test("equi-depth histogram: 8 ordered non-overlapping bins that " +
    "partition the rows near-evenly") {
    import org.apache.spark.sql.functions.col
    val h = operators.Aggregates.aggHistogramEqdepth(spark, sf)
      .select("bin", "n", "lo", "hi")
      .as[(Long, Long, Long, Long)].collect()
    assert(h.map(_._1).toSeq == (0L to 7L))
    val total = Tables.orders(spark, sf).count()
    assert(h.map(_._2).sum == total)
    // value ranges are disjoint and increasing
    h.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bins ${a._1}/${b._1} overlap")
    }
    // equi-DEPTH: no bin strays far from total/8 (ties can nudge
    // counts, but a fixed-width-style pile-up would blow this bound)
    val expect = total / 8.0
    assert(h.forall(r => r._2 > expect * 0.5 && r._2 < expect * 1.5),
      h.map(_._2).mkString(","))
  }
  test("agg_interval_union: overlapping intervals merge, adjacency " +
    "joins a segment, duplicates add nothing, disjoint gaps split") {
    import java.sql.Timestamp
    def li(rows: Seq[(Long, String, Double)]) = rows.map { case (k, d, q) =>
      (k, Timestamp.valueOf(d + " 00:00:00"), q)
    }.toDF("l_suppkey", "l_shipdate", "l_quantity")
    // supplier 1: quantity 2 -> transit 3 days; intervals (day grid
    // from 1992-01-01): [0,3] and [1,4] overlap -> covered [0,4]=5;
    // duplicate [1,4] adds 0; [5,8] is ADJACENT (s=5=pmax+1): same
    // segment, covered 9; [12,15] after a gap: second segment
    val got = operators.Analytics.aggIntervalUnionOn(li(Seq(
      (1L, "1992-01-01", 2.0), (1L, "1992-01-02", 2.0),
      (1L, "1992-01-02", 2.0), (1L, "1992-01-06", 2.0),
      (1L, "1992-01-13", 2.0))))
      .select("l_suppkey", "covered_days", "n_segments", "raw_days",
        "first_day", "last_day", "overlap_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 13L, 2L, 20L, 0L, 15L, 1538461L)))
    // corpus invariants: union <= raw, union <= calendar span,
    // segments >= 1, overlap factor >= 1e6 (raw double-counts)
    val c = operators.Analytics.aggIntervalUnion(spark, sf).collect()
    assert(c.nonEmpty)
    assert(c.forall { r =>
      val cov = r.getAs[Long]("covered_days")
      val raw = r.getAs[Long]("raw_days")
      val span = r.getAs[Long]("last_day") - r.getAs[Long]("first_day") + 1
      cov <= raw && cov <= span && r.getAs[Long]("n_segments") >= 1L &&
        r.getAs[Long]("overlap_ppm") >= 1000000L
    })
  }

  test("dq_volume_anomaly: a silently missing day flags 'missing', a " +
    "retry-storm day flags 'volume', steady days read 'ok'") {
    import java.sql.Timestamp
    // type T: 10 events/day on days 1..9 except day 5 (absent) and
    // day 7 (100 events) -> med 10, mad 0? counts: 10,10,10,10,0,10,100,10,10
    // med=10, adev: 0x6,10,90,0... adev values {0,0,0,0,10,0,90,0,0} med=0 -> mad=0
    // mad=0 degenerate: only 'missing' flags fire. Add jitter so mad>0:
    // counts 8,12,9,11,0,10,100,9,11 -> med 10, adev {2,2,1,1,10,0,90,1,1} med=1 -> mad=1
    val perDay = Seq(8, 12, 9, 11, 0, 10, 100, 9, 11)
    val ev = perDay.zipWithIndex.flatMap { case (n, i) =>
      (0 until n).map { k =>
        (i.toLong * 1000 + k, k.toLong, "T",
          Timestamp.valueOf(f"2024-01-0${i + 1}%d 10:00:00"), 1.0)
      }
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = operators.Analytics.dqVolumeAnomalyOn(ev)
      .select("d", "n", "flag")
      .as[(java.sql.Date, Long, String)].collect().toSeq.sortBy(_._1.toString)
    assert(out.size == 9)
    assert(out(4)._2 == 0L && out(4)._3 == "missing")
    assert(out(6)._2 == 100L && out(6)._3 == "volume")
    assert(out.count(_._3 == "ok") == 7)
  }

  test("dq_volume_anomaly on the corpus: spine is complete per type and " +
    "flags are from the closed vocabulary") {
    val out = operators.Analytics.dqVolumeAnomaly(spark, sf)
      .localCheckpoint(true)
    val spine = out.groupBy("event_type").count()
      .select("count").distinct().count()
    assert(spine == 1) // every type spans the same calendar
    assert(out.where(!col("flag").isin("ok", "missing", "volume"))
      .count() == 0)
  }
}
