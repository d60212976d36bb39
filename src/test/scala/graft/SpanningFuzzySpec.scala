package graft

import graft.functions.{Fuzzy, Spanning}

/** Fixtures for Borůvka MST (Spanning.scala) and the fuzzy-join /
  * RAKE pair (Fuzzy.scala). The MST corpus check replays Prim's
  * algorithm driver-side on the collected (tiny) nation edge list —
  * an independent algorithm, so agreement is a real cross-check. */
class SpanningFuzzySpec extends SparkSpecBase {
  import spark.implicits._

  test("boruvka: path graph plus heavy chords keeps the path") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L),
      (1L, 4L, 10L), (1L, 3L, 5L)).toDF("src", "dst", "w")
    val mst = Spanning.minimumSpanningForestOn(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mst === Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L)))
  }

  test("boruvka: disconnected graph yields a spanning FOREST") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 9L),
      (10L, 11L, 4L)).toDF("src", "dst", "w")
    val mst = Spanning.minimumSpanningForestOn(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mst === Set((1L, 2L), (2L, 3L), (10L, 11L)))
  }

  test("boruvka: mutual-min pair components select the edge once") {
    val edges = Seq((1L, 2L, 7L)).toDF("src", "dst", "w")
    val mst = Spanning.minimumSpanningForestOn(edges).collect()
    assert(mst.length === 1)
  }

  test("graph_mst agrees with a driver-side Prim replay on the corpus") {
    val got = Spanning.graphMst(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent check: Prim over the same collapsed edge list
    val raw = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" =!= $"s_nationkey")
      .selectExpr("least(c_nationkey, s_nationkey) AS a",
        "greatest(c_nationkey, s_nationkey) AS b",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy("a", "b").sum("cents")
      .collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong,
        r.getLong(2) * 1024 + r.getInt(0) * 25 + r.getInt(1)))
    val nodes = raw.flatMap(t => Seq(t._1, t._2)).distinct
    var inTree = Set(nodes.min)
    var picked = Set.empty[(Long, Long)]
    while (inTree.size < nodes.length) {
      val cand = raw.filter(t =>
        inTree(t._1) ^ inTree(t._2)).minBy(_._3)
      picked += ((cand._1, cand._2))
      inTree += (if (inTree(cand._1)) cand._2 else cand._1)
    }
    assert(got === picked)
    assert(got.size === nodes.length - 1)
  }

  test("fuzzy join: one match per edit kind, exact hit at distance 0") {
    val got = Fuzzy.joinFuzzy(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSet === Set(
      ("ECONMY", "ECONOMY", 1L), ("STANDRD", "STANDARD", 1L),
      ("LARG", "LARGE", 1L), ("MEDIAM", "MEDIUM", 1L),
      ("SMALLS", "SMALL", 1L), ("PROMO", "PROMO", 0L)))
  }

  test("fuzzy join: distance-2 blocking candidates are verified away") {
    val dict = Seq("ab").toDF("term")
    // variants of "ba" and "ab" intersect ({a, b}) but lev = 2
    val got = Fuzzy.joinFuzzyOn(dict, Seq("ba")).collect()
    assert(got.isEmpty)
  }

  test("fuzzy join blocking is recall-complete vs brute levenshtein") {
    val vocab = Tables.part(spark, sf).select("p_type").distinct()
      .collect().map(_.getString(0))
    val brute = for {
      p <- Fuzzy.FuzzyProbes
      t <- vocab
      if levenshteinDist(p, t) <= 1
    } yield (p, t)
    val got = Fuzzy.joinFuzzy(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSet === brute.toSet)
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("rake: stopword-delimited phrases score degree/freq (hand case)") {
    // doc "x y the x": phrases "x y" and "x".
    // x: freq 2, degree 2+1=3 -> 1_500_000 ppm; y: freq 1, degree 2 -> 2_000_000
    val docs = Seq((1L, "x y the x")).toDF("doc_id", "text")
    val r = Fuzzy.textRakeOn(docs).collect()
      .map(x => (x.getString(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq === Seq(("x y", 3500000L, 1L), ("x", 1500000L, 2L)))
  }

  test("rake: leading/only-stopword docs produce no empty phrases") {
    val docs = Seq((1L, "the a of"), (2L, "the end")).toDF("doc_id", "text")
    val r = Fuzzy.textRakeOn(docs).collect()
    assert(r.forall(_.getString(1).nonEmpty))
    assert(r.map(_.getLong(0)).toSet === Set(2L))
  }

  test("scc: a 3-cycle collapses to one component, a tail stays singleton") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = Spanning.graphSccOn(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)))
  }

  test("scc: two cycles bridged one-way stay separate components") {
    val e = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (2L, 3L))
      .toDF("src", "dst")
    val got = Spanning.graphSccOn(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)))
  }

  test("bipartite: even cycle passes, odd cycle is caught") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), // C4
      (5L, 6L), (6L, 7L), (7L, 5L)) // triangle
      .toDF("src", "dst")
    val got = Spanning.graphBipartiteOn(e)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.length === 2)
    assert(got(0) === ((1L, 4L, 0L, true)))
    assert(got(1)._1 === 5L)
    assert(got(1)._2 === 3L)
    assert(!got(1)._4)
    assert(got(1)._3 > 0L)
  }

  test("pattern match: window bound closed, negation strict, order enforced") {
    import java.sql.Timestamp
    def t(day: Int, hour: Int = 0): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    val rows = Seq(
      // u1: clean signup -> purchase 3 days later
      (1L, "signup", t(1)), (1L, "purchase", t(4)),
      // u2: error strictly between -> excluded
      (2L, "signup", t(1)), (2L, "error", t(2)), (2L, "purchase", t(3)),
      // u3: purchase 8 days later -> outside window
      (3L, "signup", t(1)), (3L, "purchase", t(9)),
      // u4: purchase BEFORE signup only -> no qualifying purchase
      (4L, "purchase", t(1)), (4L, "signup", t(2)),
      // u5: purchase exactly at the 7-day boundary -> included (closed)
      (5L, "signup", t(1)), (5L, "purchase", t(8)),
      // u6: error at exactly the purchase instant -> NOT between (strict)
      (6L, "signup", t(1)), (6L, "error", t(4)), (6L, "purchase", t(4)))
      .map { case (u, et, ts) => (u * 100, ts, u, et, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Events.eventPatternMatchOn(rows)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got.keySet === Set(1L, 5L, 6L))
    assert(got(1L) === 3L * 24 * 60)
    assert(got(5L) === 7L * 24 * 60)
  }

  test("transitive closure: chain reaches all descendants, converges") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val r = Spanning.transitiveClosureOn(e)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r === (for (a <- 1 to 5; b <- a + 1 to 5)
      yield (a.toLong, b.toLong)).toSet)
  }

  test("eccentricity: path P4 has diameter 3, radius 2; components split") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), // P4
      (10L, 11L)) // K2 in its own component
      .toDF("src", "dst")
    val r = Spanning.graphEccentricityOn(e)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).sortBy(_._1)
    assert(r.map(t => t._1 -> t._3).toMap ===
      Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 3L, 10L -> 1L, 11L -> 1L))
    assert(r.filter(_._2 === 1L).forall(t => t._4 === 3L && t._5 === 2L))
    assert(r.filter(_._2 === 10L).forall(t => t._4 === 1L && t._5 === 1L))
  }

  test("min-plus closure: C4 opposite corners at distance 2") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val d = Spanning.minPlusClosureOn(e)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2)))
      .toMap
    assert(d((1L, 3L)) === 2L)
    assert(d((1L, 2L)) === 1L)
    assert(d((1L, 1L)) === 0L)
  }

  test("psm: nearest match with backward tie-break, with replacement") {
    import java.sql.Timestamp
    // treated users (odd) with activity scores 3 and 5;
    // controls (even) with scores 2 and 6.
    // score 3: gaps 1 vs 3 -> control 2. score 5: gaps 3 vs 1 -> control 6.
    def rows(u: Long, n: Int, spend: Double) =
      (1 to n).map(i => (u * 100 + i, Timestamp.valueOf(
        f"2024-01-${i}%02d 00:00:00"), u,
        if (i == 1) "purchase" else "view",
        if (i == 1) spend else 0.0))
    val e = (rows(1L, 3, 10.0) ++ rows(3L, 5, 20.0) ++
      rows(2L, 2, 1.0) ++ rows(4L, 6, 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.operators.Inference.eventPsmAttOn(e)
      .collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(6))).sortBy(_._1)
    // treated 1 (out 1000c) -> ctrl 2 (100c): diff 900
    // treated 3 (out 2000c) -> ctrl 4 (200c): diff 1800
    assert(r.toSeq === Seq((1L, 2L, 900L), (3L, 4L, 1800L)))
  }

  test("stem: each ladder rule and its length guard (hand cases)") {
    val docs = Seq((1L,
      "glasses ponies class cats is running doing played bed"))
      .toDF("doc_id", "text")
    val got = graft.functions.Fuzzy.textStemOn(docs)
      .collect().map(r => r.getString(0)).toSet
    assert(got === Set("glass", "poni", "class", "cat", "is",
      "runn", "doing", "play", "bed"))
  }

  test("stem: surface forms collapse and counts add up") {
    val docs = Seq((1L, "cat cats cats running runs")).toDF("doc_id", "text")
    // "cat"+"cats" -> stem cat (2 forms, 3 occ); runs -> run; running -> runn
    val m = graft.functions.Fuzzy.textStemOn(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m("cat") === ((2L, 3L)))
    assert(m("run") === ((1L, 1L)))
    assert(m("runn") === ((1L, 1L)))
  }

  test("zipf audit: rank-1 ratio is exactly 1e6, products exact") {
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val r = graft.functions.Fuzzy.textZipfAuditOn(docs)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(3),
        x.getLong(4)))
    assert(r(0) === ((1L, "a", 4L, 1000000L)))
    assert(r(1) === ((2L, "b", 4L, 1000000L))) // 2*2 = 4 -> exactly Zipf
    assert(r(2) === ((3L, "c", 3L, 750000L)))
  }

  test("psm: equidistant controls pin to the backward (lower-score) side") {
    import java.sql.Timestamp
    def rows(u: Long, n: Int) = (1 to n).map(i =>
      (u * 100 + i, Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00"),
        u, "view", 0.0))
    // treated score 4; controls at scores 3 and 5 (both gap 1)
    val e = (rows(1L, 4) ++ rows(2L, 3) ++ rows(4L, 5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.operators.Inference.eventPsmAttOn(e).collect()
    assert(r.length === 1)
    assert(r(0).getLong(2) === 2L) // the score-3 control
  }
}
