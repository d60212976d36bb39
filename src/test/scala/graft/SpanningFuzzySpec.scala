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
}
