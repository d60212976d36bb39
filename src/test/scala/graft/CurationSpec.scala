package graft

import java.sql.Timestamp
import graft.functions.Curation
import graft.operators.Inference

/** Fixtures for CUPED, DPO pair mining, and the tie-safe SCD2 PIT
  * join. */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.zipWithIndex.map { case ((u, day, et, v), i) =>
      (i.toLong + 1, Timestamp.valueOf(day + " 12:00:00"), u, et, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("cuped: perfectly correlated covariate collapses both arms to a constant") {
    // each user's post outcome equals their pre covariate -> theta = 1.000
    // and every adjusted value becomes 1000 * mean(x)
    val e = ev(
      (1L, "2024-01-02", "view", 1.0), (1L, "2024-01-20", "view", 1.0),
      (2L, "2024-01-02", "view", 2.0), (2L, "2024-01-20", "view", 2.0),
      (3L, "2024-01-02", "view", 3.0), (3L, "2024-01-20", "view", 3.0),
      (4L, "2024-01-02", "view", 4.0), (4L, "2024-01-20", "view", 4.0))
    val r = Inference.eventCupedOn(e).collect()
    assert(r.length === 2)
    assert(r.forall(_.getLong(4) === 1000L)) // theta_milli
    assert(r.forall(_.getLong(3) === 250000L)) // mean_adj_milli = 1000*gx
    // expectation preserved per arm: raw means unchanged by construction
    val raw = r.map(x => x.getInt(0) -> x.getLong(2)).toMap
    assert(raw(0) === (200L + 400L) * 100 * 1000 / 2 / 100) // 300000
    assert(raw(1) === (100L + 300L) * 100 * 1000 / 2 / 100) // 200000
  }

  test("cuped: zero pre-period variance degrades to theta 0, raw means") {
    val e = ev(
      (1L, "2024-01-02", "view", 5.0), (1L, "2024-01-20", "view", 1.0),
      (2L, "2024-01-02", "view", 5.0), (2L, "2024-01-20", "view", 9.0))
    val r = Inference.eventCupedOn(e).collect()
    assert(r.forall(_.getLong(4) === 0L))
    assert(r.forall(x => x.getLong(2) === x.getLong(3)))
  }

  test("dpo pairs: top-2 x bottom-2 with positive margin, dedup by identity") {
    val docs = Seq(
      (1L, "s0", "a b c d"),   // ttr 1e6 (hi)
      (2L, "s0", "a b a b"),   // ttr 5e5 (mid)
      (3L, "s0", "a a a a"))   // ttr 25e4 (low)
      .toDF("doc_id", "source", "text")
    val r = Curation.corpusDpoPairsOn(docs)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toSet
    assert(r === Set((1L, 3L), (1L, 2L), (2L, 3L)))
  }

  test("dpo pairs: uniform-quality group emits nothing") {
    val docs = Seq((1L, "s0", "a b"), (2L, "s0", "c d"))
      .toDF("doc_id", "source", "text")
    assert(Curation.corpusDpoPairsOn(docs).collect().isEmpty)
  }

  test("scd2 pit: version intervals reproduce the direct running tier") {
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val e = Seq(
      (1L, t(1), 7L, "purchase", 600.0), // cum 60000 -> tier 0
      (2L, t(2), 7L, "view", 0.0),       // tier 0
      (3L, t(3), 7L, "purchase", 600.0), // cum 120000 -> tier 1
      (4L, t(4), 7L, "view", 0.0))       // tier 1
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Curation.joinScd2PitOn(e)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("scd2 pit: same-microsecond events order by event_id (tie pin)") {
    val ts = Timestamp.valueOf("2024-01-05 00:00:00")
    val e = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "view", 0.0),
      (4L, ts, 7L, "view", 0.0),             // before the crossing purchase
      (5L, ts, 7L, "purchase", 1200.0),      // crosses to tier 1
      (6L, ts, 7L, "view", 0.0))             // after it
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Curation.joinScd2PitOn(e)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r === Map(1L -> 0L, 4L -> 0L, 5L -> 1L, 6L -> 1L))
  }
}
