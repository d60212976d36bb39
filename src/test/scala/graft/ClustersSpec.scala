package graft

import org.apache.spark.sql.functions._

/** Connected-components cluster assignment (functions.Clusters):
  * synthetic graphs with hand-checkable components, convergence
  * behavior, and the corpus-level invariants of dedup_clusters. */
class ClustersSpec extends SparkSpecBase {
  import spark.implicits._

  test("transitive merge: A~B, B~C, D~E -> components {A,B,C}, {D,E}") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
    val got = functions.Clusters.clustersOn(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (10L, 10L, 2L, true), (11L, 10L, 2L, false)))
  }

  test("long chain converges to the chain min (diameter > 2 rounds)") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("da", "db")
    val lbls = functions.Clusters.connectedComponentsOn(pairs)
      .select("lbl").distinct().as[Long].collect()
    assert(lbls.toSeq == Seq(1L))
  }

  test("maxIter too small for the diameter throws instead of under-merging") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("da", "db")
    intercept[IllegalStateException] {
      functions.Clusters.connectedComponentsOn(pairs, maxIter = 2)
    }
  }

  test("pair order and duplicate edges don't change the components") {
    val a = Seq((2L, 1L), (1L, 2L), (3L, 2L), (7L, 9L)).toDF("da", "db")
    val b = Seq((1L, 2L), (2L, 3L), (9L, 7L)).toDF("da", "db")
    val ca = functions.Clusters.clustersOn(a).collect().toSeq
    val cb = functions.Clusters.clustersOn(b).collect().toSeq
    assert(ca == cb)
  }

  test("dedup_semantic_sweep: censuses are monotone DECREASING up the " +
    "cut ladder, reconcile with dedup_semantic at the 0.45 operating " +
    "point, and clustered + singleton mass always totals the corpus") {
    val sw = functions.Clusters.dedupSemanticSweep(spark, sf)
      .select("thr_e4", "n_points", "n_pairs", "n_clusters",
        "n_clustered", "n_singletons", "max_cluster_size")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(sw.map(_._1) == Seq(4000L, 4500L, 5000L, 5500L))
    assert(sw.map(_._2).distinct.size == 1) // n_points constant
    assert(sw.forall { case (_, n, _, _, cl, sg, _) => cl + sg == n })
    // raising the cut only removes edges: pairs, clustered mass and
    // max cluster size are monotone non-increasing
    assert(sw.sliding(2).forall { case Seq(lo, hi) =>
      lo._3 >= hi._3 && lo._5 >= hi._5 && lo._7 >= hi._7 })
    assert(sw.head._3 > 0, "the 0.40 cut must see some pairs")
    // the 4500 rung IS dedup_semantic's component census
    val sem = functions.Clusters.dedupSemantic(spark, sf)
    val semClusters = sem.select("cluster_id").distinct().count()
    val semMass = sem.count()
    val r4500 = sw.find(_._1 == 4500L).get
    assert(r4500._4 == semClusters && r4500._5 == semMass,
      s"sweep $r4500 vs semantic ($semClusters, $semMass)")
  }

  test("dedup_semantic covers exactly the paired vectors, one keeper per " +
    "cluster") {
    val out = functions.Clusters.dedupSemantic(spark, sf).cache()
    val pairs = functions.Dedup.dedupEmbeddingOn(
      Tables.embeddings(spark, sf), threshold = 0.45)
    val nodes = pairs.select(col("da").as("n"))
      .union(pairs.select(col("db").as("n"))).distinct()
    assert(out.count() == nodes.count() && nodes.count() > 0)
    assert(out.groupBy("cluster_id")
      .agg(sum(col("is_keeper").cast("long")).as("k"))
      .filter(col("k") =!= 1).count() == 0)
    out.unpersist()
  }

  test("alternating-star components equal label propagation on chains, " +
    "cliques, and the corpus pair graph") {
    // the Kiveris et al. alternative must agree with the propagation
    // loop everywhere: a long chain (its raison d'etre — diameter >>
    // rounds), a clique + singleton-pair mix, and the real
    // minhash-verified pair graph
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("da", "db")
    val clique = (for (i <- 1 to 5; j <- (i + 1) to 5)
      yield (i.toLong, j.toLong)).toDF("da", "db") unionByName
      Seq((100L, 101L), (200L, 200L)).toDF("da", "db")
    val corpus = functions.Dedup.dedupMinhash(spark, sf).select("da", "db")
    Seq(chain, clique, corpus).foreach { pairs =>
      val prop = functions.Clusters.connectedComponentsOn(pairs)
        .as[(Long, Long)].collect().toSet
      val star = functions.Clusters.connectedComponentsAltStarOn(pairs)
        .as[(Long, Long)].collect().toSet
      assert(star == prop, s"star=$star prop=$prop")
    }
  }

  test("alternating star equals propagation on seeded random multigraphs " +
    "(self-loops, duplicates, isolated pairs included)") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 60
      val edges = (1 to 120)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .toDF("da", "db")
      val prop = functions.Clusters.connectedComponentsOn(edges)
        .as[(Long, Long)].collect().toSet
      val star = functions.Clusters.connectedComponentsAltStarOn(edges)
        .as[(Long, Long)].collect().toSet
      assert(star == prop)
    }
  }

  test("alternating star converges in few rounds on a long chain " +
    "(maxIter far below the diameter suffices)") {
    // 200-node chain, diameter 199: O(log n) rounds means maxIter 10
    // is plenty — the same bound would throw on the propagation loop
    // without pointer jumping
    val pairs = (1L until 200L).map(i => (i, i + 1)).toDF("da", "db")
    val lbls = functions.Clusters
      .connectedComponentsAltStarOn(pairs, maxIter = 10)
      .select("lbl").distinct().as[Long].collect()
    assert(lbls.toSeq == Seq(1L))
  }

  test("semanticPairsClusteredOn recovers planted near-dups (SemDeDup recall)") {
    // 40 well-separated deterministic base vectors + 10 planted
    // near-identical copies: the clustered (within-cell) pair source
    // must recover every planted pair — a near-identical copy lands in
    // its original's k-means cell — and invent none at cos >= 0.99
    val dim = 16
    def base(i: Int): Array[Float] =
      Array.tabulate(dim)(j => (((i * 31 + j * 17) % 13) - 6) / 6.0f +
        (if (j == i % dim) 3.0f else 0.0f))
    val rows =
      (0 until 40).map(i => (i.toLong, base(i))) ++
      (0 until 10).map { i =>
        val v = base(i).clone(); v(0) += 0.001f; (1000L + i, v)
      }
    val emb = rows.toDF("vec_id", "embedding")
    val got = functions.Clusters
      .semanticPairsClusteredOn(emb, k = 4, iters = 2, threshold = 0.99)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val planted = (0 until 10).map(i => (i.toLong, 1000L + i)).toSet
    assert(got == planted, s"got=$got")
    // and the exact all-pairs source agrees at this operating point,
    // i.e. restricting pairs to cells lost nothing here
    val exact = functions.Dedup
      .dedupEmbeddingOn(emb, threshold = 0.99)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(got == exact, s"clustered=$got exact=$exact")
  }

  test("dedup_clusters invariants: keepers = clusters, members >= 2, " +
    "cluster id is the member min, pairs' nodes all covered") {
    val out = functions.Clusters.dedupClusters(spark, sf).cache()
    val pairs = functions.Dedup.dedupMinhash(spark, sf)
    val nodes = pairs.select(col("da").as("n"))
      .union(pairs.select(col("db").as("n"))).distinct()
    assert(out.count() == nodes.count())
    assert(out.filter(col("n_members") < 2).count() == 0)
    val perCluster = out.groupBy("cluster_id")
      .agg(min("doc_id").as("mn"), count(lit(1)).as("n"),
        sum(col("is_keeper").cast("long")).as("k"),
        max("n_members").as("n_members"))
    assert(perCluster.filter(col("mn") =!= col("cluster_id")).count() == 0)
    assert(perCluster.filter(col("k") =!= 1).count() == 0)
    assert(perCluster.filter(col("n") =!= col("n_members")).count() == 0)
    out.unpersist()
  }

  test("pagerank: 2-cycle is a fixpoint; star center outranks leaves (hand-unrolled)") {
    // symmetric 2-cycle: contrib = 1e9 each round -> rank stays 1e9
    val cycle = functions.Clusters.graphPagerankOn(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toSeq
    assert(cycle == Seq((1L, 1000000000L), (2L, 1000000000L)))
    // undirected star 1-3, 2-3: three rounds unrolled by hand
    //   r1 = (575000000, 575000000, 1850000000)
    //   r2 = (936250000, 936250000, 1127500000)
    //   r3 = (629187500, 629187500, 1741625000)
    val star = functions.Clusters.graphPagerankOn(
      Seq((1L, 3L), (2L, 3L), (3L, 1L), (3L, 2L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toSeq
    assert(star == Seq(
      (1L, 629187500L), (2L, 629187500L), (3L, 1741625000L)))
  }

  test("graph_katz: path-3 unrolled by hand; attenuation derived as the " +
    "power of two above d_max") {
    // path 1-2-3 symmetrized: d_max = 2 -> p = 4
    //   x1 = (250e6, 500e6, 250e6)
    //   x2 = (125e6, 125e6, 125e6)
    //   x3 = (31.25e6, 62.5e6, 31.25e6)
    val katz = functions.Clusters.graphKatzOn(
      Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toSeq
    assert(katz == Seq(
      (1L, 406250000L), (2L, 687500000L), (3L, 406250000L)))
    // 2-cycle: d_max = 1 -> p = 2; x_k = S/2^k -> 500e6+250e6+125e6
    val cyc = functions.Clusters.graphKatzOn(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toSeq
    assert(cyc == Seq((1L, 875000000L), (2L, 875000000L)))
  }

  test("graph_katz on the corpus: positive everywhere, bounded by the " +
    "geometric ceiling") {
    val out = functions.Clusters.graphKatz(spark, sf)
    assert(out.count() > 0)
    assert(out.where(col("katz_scaled") <= 0L).count() == 0)
    // each hop contributes x_k <= S, three hops -> katz < 3*S
    assert(out.where(col("katz_scaled") >= 3000000000L).count() == 0)
  }

  test("graph_label_spread: path-4 with opposite seeds unrolled by hand; " +
    "symmetric tie breaks to the lower label") {
    // path 1-2-3-4, seeds 1->label 0 and 4->label 1; three rounds give
    // node2: {0: 625, 1: 250}, node3: {0: 250, 1: 625}
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val seeds = Seq((1L, 0L), (4L, 1L)).toDF("node", "label")
    val out = functions.Clusters.graphLabelSpreadOn(edges, seeds)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 0L, 625L), (3L, 1L, 625L)))
    // path 1-2-3: node2 sees both seeds equally -> 500/500 tie -> label 0
    val e3 = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val s3 = Seq((1L, 0L), (3L, 1L)).toDF("node", "label")
    val mid = functions.Clusters.graphLabelSpreadOn(e3, s3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(mid == Seq((2L, 0L, 500L)))
  }

  test("graph_label_spread on the corpus: non-seed nodes only, labels in " +
    "the region vocabulary, confidence inside (0, 1000]") {
    val out = functions.Clusters.graphLabelSpread(spark, sf)
      .localCheckpoint(true)
    assert(out.count() > 0)
    assert(out.where(col("node") % 4 === 0 && col("node") < 1000000L)
      .count() == 0)
    assert(out.where(col("pred_label") < 0L || col("pred_label") > 4L)
      .count() == 0)
    assert(out.where(col("conf_milli") <= 0L || col("conf_milli") > 1000L)
      .count() == 0)
    // the in-catalog accuracy eval carries both verdicts
    assert(out.select("correct").distinct().count() >= 1)
  }

  test("graph_conductance: two bridged triangles by hand — each side " +
    "phi = 1/7; an isolated community NULL-gates") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L), (9L, 9L)).toDF("node", "community")
    val out = functions.Clusters.graphConductanceOn(edges, labels)
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSeq
    // vol(each triangle) = 2*3 internal + 1 bridge = 7; cut = 1;
    // 2m = 14 -> min(7, 7) = 7 -> phi = 142857 ppm
    assert(out == Seq(
      (1L, 3L, 7L, 1L, Some(142857L)),
      (4L, 3L, 7L, 1L, Some(142857L)),
      (9L, 1L, 0L, 0L, None)))
  }

  test("graph_conductance on the corpus: volumes conserve the edge " +
    "count and phi stays in [0, 1e6]") {
    val out = functions.Clusters.graphConductance(spark, sf)
      .localCheckpoint(true)
    assert(out.count() > 0)
    assert(out.where(col("phi_ppm") < 0L || col("phi_ppm") > 1000000L)
      .count() == 0)
    // sum of volumes = 2m
    val sums = out.agg(sum("vol"), sum("cut")).as[(Long, Long)].head()
    assert(sums._1 % 2 == 0 && sums._2 % 2 == 0)
  }

  test("dedup stage funnel: each rung charged only its marginal " +
    "removals; an exact-dup pair already removed costs near-dup nothing") {
    val docs = (1L to 8L).map(i =>
      (i, if (i == 4) "same text three" else s"text number $i"))
      .toDF("doc_id", "text")
      .withColumn("text", when(col("doc_id") === 3, "same text three")
        .otherwise(col("text")))
    val urls = (1L to 8L).map(i =>
      (i, if (i <= 2) "https://www.a.com/x" else s"https://a.com/$i"))
      .toDF("doc_id", "url")
    // near-dup graph: (3,4) is ALSO an exact pair (stage 2 takes it);
    // (5,6) is near-only (stage 3's marginal removal)
    val pairs = Seq((3L, 4L), (5L, 6L)).toDF("da", "db")
    val out = functions.Clusters.dedupStageFunnelOn(docs, urls, pairs)
      .select("stage_id", "stage", "n_in", "n_removed", "n_out",
        "removed_ppm", "cum_removed_ppm")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "url", 8L, 1L, 7L, 125000L, 125000L),
      (2L, "exact", 7L, 1L, 6L, 142857L, 250000L),
      (3L, "near", 6L, 1L, 5L, 166666L, 375000L)))
  }

  test("dedup stage funnel on the corpus: conservation across rungs and " +
    "monotone cumulative shrinkage") {
    val out = functions.Clusters.dedupStageFunnel(spark, sf)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(out.map(_._2) == Seq("url", "exact", "near"))
    out.sliding(2).foreach { case Seq(a, b) => assert(a._5 == b._3) }
    out.foreach(r => assert(r._3 - r._4 == r._5))
    assert(out.map(_._7) == out.map(_._7).sorted)
  }

  test("graph_bfs: hop distances on a path graph, horizon cut at maxHops") {
    // path 1-2-3-4-5-6 (symmetrized), source = min node = 1
    val edges = (1L to 5L).flatMap(i =>
      Seq((i, i + 1), (i + 1, i))).toDF("src", "dst")
    val got = functions.Clusters.graphBfsOn(edges, maxHops = 4)
      .as[(Long, Long)].collect().toMap
    // node 6 sits at hop 5, beyond the horizon — absent, not wrong
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // on the corpus graph: source at dist 0, every dist <= maxHops,
    // and each non-source dist has a neighbor one hop closer
    // (triangle property of BFS layers)
    val corpus = functions.Clusters.graphBfs(spark, sf)
    assert(corpus.filter(col("dist") === 0).count() == 1)
    assert(corpus.filter(col("dist") > 4 || col("dist") < 0).count() == 0)
  }

  test("neighbor jaccard: opposite corners of a 4-cycle are perfect " +
    "structural twins; adjacent nodes share nothing") {
    // cycle 1-2-3-4-1: N(1) = {2,4} = N(3), N(2) = {1,3} = N(4);
    // adjacent pairs have disjoint neighbor sets (no wedge) -> absent
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val got = functions.Clusters.graphNeighborJaccardOn(edges)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 1.0), (2L, 4L, 1.0)))
    // corpus: scores live in (0, 1] and pairs are canonical u < v
    val g = functions.Clusters.graphNeighborJaccard(spark, sf)
    assert(g.filter(col("jac") <= 0 || col("jac") > 1).count() == 0)
    assert(g.filter(col("u") >= col("v")).count() == 0)
    assert(g.count() > 0)
  }

  test("label propagation: two synchronous rounds on bridged " +
    "triangles, replayed by hand") {
    // triangles 1-2-3 and 4-5-6 bridged by 3-4; labels start at the
    // node id, each round takes the neighbor-majority with min-label
    // tie break, all nodes updating from the SAME previous labeling:
    //   r1: 1->2, 2->1, 3->1, 4->3, 5->4, 6->4
    //   r2: 1->1, 2->1, 3->1, 4->4, 5->3, 6->3
    // triangle {1,2,3} has converged to community 1; the second
    // triangle still oscillates — exactly why rounds are capped
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = functions.Clusters.labelPropagationOn(edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L))
    // corpus: labels actually merge (fewer communities than nodes)
    val c = functions.Clusters.graphCommunities(spark, sf)
    assert(c.select("community").distinct().count() < c.count())
  }

  test("soft dedup: cluster mass sums to one document's worth, " +
    "singletons keep full weight, corpus covers every doc") {
    val r = functions.Clusters.corpusSoftDedup(spark, sf)
    assert(r.count() === Tables.documents(spark, sf).count())
    // per cluster: sum of weights within one ppm-floor of 10^6
    val bad = r.groupBy("cluster_id")
      .agg(sum("weight_ppm").as("w"), count(lit(1)).as("n"))
      .filter(col("w") > 1000000L || col("w") <= lit(1000000L) - col("n"))
      .count()
    assert(bad === 0L)
    // singleton weight exactly 10^6; every multi-member weight below
    assert(r.filter(col("cluster_size") === 1 &&
      col("weight_ppm") =!= 1000000L).count() === 0L)
    assert(r.filter(col("cluster_size") > 1 &&
      col("weight_ppm") >= 1000000L).count() === 0L)
    // near-dup clusters exist at this sf (dedup_clusters is non-empty)
    assert(r.filter(col("cluster_size") > 1).count() > 0L)
  }

  test("er blocking eval: truth pair at rank distance 2 is missed by " +
    "window 2, caught from 3; candidate volume closed form; corpus " +
    "recall monotone") {
    val recs = Seq((1L, "aa", 0L), (2L, "ab", 0L), (3L, "zz", 0L),
      (4L, "aa", 1L)).toDF("rid", "name", "grp")
    val r = functions.Clusters.erBlockingEvalOn(recs)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
        x.getLong(3), if (x.isNullAt(4)) -1L else x.getLong(4)))
    // only truth pair: (1,2), lev("aa","ab") = 1, ranks 1 vs 3
    assert(r.map(_._2).toSet === Set(1L))
    // candidate volume clamps at n = 4: windows >= n cover all C(4,2)
    assert(r.toSeq === Seq(
      (2, 1L, 0L, 3L, 0L), (3, 1L, 1L, 5L, 1000000L),
      (4, 1L, 1L, 6L, 1000000L), (6, 1L, 1L, 6L, 1000000L),
      (8, 1L, 1L, 6L, 1000000L)))
    val c = functions.Clusters.erBlockingEval(spark, sf)
      .select("win_size", "recall_ppm").as[(Int, Long)].collect()
      .sortBy(_._1)
    assert(c.sliding(2).forall { case Array(a, b) => a._2 <= b._2
      case _ => true })
  }

  test("k-truss: supports hand-checked, pendant edge peels, cascades " +
    "run to the fixpoint, non-convergence throws") {
    // K4 (every edge closes 2 triangles) + pendant triangle {5,6,7}
    // (support 1 each) + tail 7-8 (support 0)
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L), (5L, 7L), (6L, 7L), (7L, 8L)).toDF("a", "b")
    val t3 = functions.Clusters.trussOn(g, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(t3 == Set((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L),
      (5L, 6L, 1L), (5L, 7L, 1L), (6L, 7L, 1L)))
    // k=4 drops the pendant triangle, keeps the clique
    assert(functions.Clusters.trussOn(g, k = 4)
      .as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
        (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
    // two bridged triangles sharing edge 1-3: at k=4 round 1 removes
    // every support-1 edge, exposing 1-3 as support-0 -> round 2
    // empties the graph; a 1-round budget must throw instead
    val bridged = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 4L))
      .toDF("a", "b")
    assert(functions.Clusters.trussOn(bridged, k = 4).count() == 0)
    intercept[IllegalStateException] {
      functions.Clusters.trussOn(bridged, k = 4, maxIter = 1).count()
    }
    // corpus truss: every surviving edge meets the support threshold
    val corpus = functions.Clusters.graphTruss(spark, sf)
    assert(corpus.filter(col("sup") < functions.Clusters.TrussK - 2)
      .count() == 0)
    assert(corpus.count() > 0)
  }

  test("k-core: pendant peels off a clique, chains cascade to empty, " +
    "and the corpus core honors the threshold") {
    // 3-core of K4 + pendant: node 5 peels, the clique survives with
    // in-core degree 3 everywhere
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val core = functions.Clusters.kcoreOn(k4, k = 3)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // 2-core of a path: endpoints peel, exposing new endpoints —
    // the cascade empties the graph
    val path = (1L to 5L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("a", "b")
    assert(functions.Clusters.kcoreOn(path, k = 2).count() == 0)
    // corpus core: every surviving degree meets the threshold
    val g = functions.Clusters.graphKcore(spark, sf)
    assert(g.filter(col("core_deg") < functions.Clusters.KcoreK)
      .count() == 0)
    assert(g.count() > 0)
  }

  test("modularity numerators: hand-computed on the bridged triangles " +
    "under the LPA labeling; corpus conservation laws hold") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = functions.Clusters.labelPropagationOn(edges, rounds = 2)
    // m=7; communities {1,2,3} (3 intra, deg 7), {4} (0 intra, deg 3),
    // {5,6} (1 intra, deg 4) -> numerators 35, -9, 12
    val got = functions.Clusters.modularityOn(edges, labels)
      .select("community", "intra_edges", "deg_sum", "contrib_num")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 7L, 35L), (3L, 1L, 4L, 12L),
      (4L, 0L, 3L, -9L)))
    // conservation: degrees sum to 2m, intra edges never exceed m,
    // every labeled node appears in exactly one community row
    val m = functions.Clusters.graphModularity(spark, sf)
    val und = functions.Similarity.simKnnJoinOn(Tables.embeddings(spark, sf))
      .select(least(col("qid"), col("nid")).as("a"),
        greatest(col("qid"), col("nid")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val mEdges = und.count()
    assert(m.agg(sum(col("deg_sum"))).as[Long].head() == 2 * mEdges)
    assert(m.agg(sum(col("intra_edges"))).as[Long].head() <= mEdges)
  }

  test("L18g projection: hand-checked co-occurrence counts, symmetric top-k, " +
    "rank cut respects (co desc, partner asc)") {
    // baskets: {1,2,3}, {1,2}, {2,3}, {4} -> co(1,2)=2, co(1,3)=1,
    // co(2,3)=2; 4 co-occurs with nobody and must not appear
    val m = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L), (11L, 2L),
      (12L, 2L), (12L, 3L), (13L, 4L)).toDF("grp", "member")
    val got = functions.Clusters.graphProjectionOn(m)
      .orderBy("src", "rk")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1), (1L, 3L, 1L, 2),
      (2L, 1L, 2L, 1), (2L, 3L, 2L, 2),
      (3L, 2L, 2L, 1), (3L, 1L, 1L, 2)))
  }

  test("L16 ER pipeline: chained name variants resolve transitively, hard " +
    "block stops cross-group merges, survivorship keeps the max balance") {
    val recs = Seq(
      (1L, "acct-001", 0L, 10.0), // 1~2~3 chain via 1-char edits
      (2L, "acct-002", 0L, 30.0),
      (3L, "acct-003", 0L, 20.0),
      (4L, "acct-004", 1L, 99.0), // name-adjacent but different group
      (5L, "zzz-9999", 0L, 50.0)) // no near name
      .toDF("rid", "name", "grp", "bal")
    val got = functions.Clusters.erResolveOn(recs)
      .as[(Long, Long, Double)].collect().toSeq
    // one resolved entity: {1,2,3}, canonical id 1, bal = max = 30;
    // 4 is blocked out by grp, 5 by distance -> singletons, no row
    assert(got == Seq((1L, 3L, 30.0)))
    // corpus: members never exceed their cluster count, ids canonical
    val corpus = functions.Clusters.erPipeline(spark, sf)
    assert(corpus.count() > 0)
    assert(corpus.filter(col("n_members") < 2).count() == 0)
  }
  test("L16 ER closure: alt-star CC (the wired path) labels exactly as " +
    "min-label propagation on the corpus blocking pairs") {
    val recs = Tables.customer(spark, sf)
      .select(col("c_custkey").as("rid"), col("c_name").as("name"),
        col("c_nationkey").as("grp"), col("c_acctbal").as("bal"))
    val pairs = functions.Clusters.erPairsOn(recs).localCheckpoint(true)
    val star = functions.Clusters
      .clustersOn(pairs, functions.Clusters.connectedComponentsAltStarOn(_))
    val prop = functions.Clusters
      .clustersOn(pairs, functions.Clusters.connectedComponentsOn(_))
    assert(star.exceptAll(prop).isEmpty && prop.exceptAll(star).isEmpty)
  }

  test("memoized relations are keyed by (session, dir): same key returns " +
    "the same instance, a different dir a different one") {
    val sfB = "/root/testdata/sf0.01" // the spec default sf is sf0.001
    assert(functions.Clusters.knnEdges(spark, sf) eq
      functions.Clusters.knnEdges(spark, sf))
    assert(functions.Similarity.cosPairsCached(spark, sf) eq
      functions.Similarity.cosPairsCached(spark, sf))
    assert(!(functions.Clusters.knnEdges(spark, sf) eq
      functions.Clusters.knnEdges(spark, sfB)))
    // the round-9 continuation caches follow the same discipline
    assert(functions.Dedup.dedupMinhashCached(spark, sf) eq
      functions.Dedup.dedupMinhashCached(spark, sf))
    assert(functions.Clusters.erClustersCached(spark, sf) eq
      functions.Clusters.erClustersCached(spark, sf))
    assert(functions.Clusters.tradeEdgesDirected(spark, sf) eq
      functions.Clusters.tradeEdgesDirected(spark, sf))
    assert(!(functions.Clusters.tradeEdgesDirected(spark, sf) eq
      functions.Clusters.tradeEdgesDirected(spark, sfB)))
    // and the two dirs' relations really are different data
    val a = functions.Clusters.knnEdges(spark, sf)
      .agg(sum(col("cos"))).head().getDouble(0)
    val b = functions.Clusters.knnEdges(spark, sfB)
      .agg(sum(col("cos"))).head().getDouble(0)
    assert(a != b)
  }

  test("L18g Adamic-Adar: rare shared neighbors outscore hubs; path fixture exact") {
    import spark.implicits._
    // path a-b-c: (a,c) share b (deg 2) -> floor(1e6/ln2 + .5)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val gotPath = functions.Clusters.graphAdamicAdarOn(path)
      .select("u", "v", "n_common", "aa_micro")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(gotPath == Seq((1L, 3L, 1L, 1442695L)), gotPath.toString)
    // star center 0 with leaves 1..4 (deg 4) plus an extra pair (5,6)
    // sharing low-degree 7: the rare wedge outscores every hub wedge
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (5L, 7L), (6L, 7L)).toDF("a", "b")
    val got = functions.Clusters.graphAdamicAdarOn(g).cache()
    val hub = got.filter(col("u") === 1L && col("v") === 2L)
      .select("aa_micro").as[Long].head()
    val rare = got.filter(col("u") === 5L && col("v") === 6L)
      .select("aa_micro").as[Long].head()
    assert(rare > hub, s"rare $rare !> hub $hub")
    assert(hub == math.floor(1e6 / math.log(4.0) + 0.5).toLong)
    got.unpersist()
    // corpus: scores positive, pairs canonical u < v
    val corpus = functions.Clusters.graphAdamicAdar(spark, sf)
    assert(corpus.filter(col("u") >= col("v")).count() == 0)
    assert(corpus.filter(col("aa_micro") <= 0).count() == 0)
  }

  test("hits: two mutual-reinforcement rounds replayed by hand on a " +
      "directed bipartite fixture") {
    // 1 -> {10, 11}, 2 -> {10}:
    //   a1 = (10: 2, 11: 1); h1 = (1: 3, 2: 2)
    //   a2 = (10: 5, 11: 3); h2 = (1: 8, 2: 5)
    val got = functions.Clusters.graphHitsOn(
      Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst"), iters = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(
      (1L, "hub", 8L), (2L, "hub", 5L),
      (10L, "authority", 5L), (11L, "authority", 3L)))
    // corpus trade graph: every score positive, both roles present,
    // and role populations match the side cardinalities of the graph
    val corpus = functions.Clusters.graphHits(spark, sf).cache()
    assert(corpus.filter(col("score") <= 0).count() == 0)
    val roles = corpus.groupBy("role").count().as[(String, Long)]
      .collect().toMap
    assert(roles("hub") > 0 && roles("authority") > 0)
    corpus.unpersist()
  }

  test("L18j assortativity: star is exactly -1, path-4 exactly -1/2, " +
      "bipartite corpus comes out disassortative") {
    def sym(pairs: Seq[(Long, Long)]) = pairs.flatMap { case (a, b) =>
      Seq((a, b), (b, a)) }.toDF("src", "dst")
    // star 0-{1,2,3}: every edge joins deg 3 to deg 1 -> r = -1
    val star = functions.Clusters.graphAssortativityOn(
      sym(Seq((0L, 1L), (0L, 2L), (0L, 3L)))).head()
    assert(star.getAs[Long]("m") == 6L)
    assert(star.getAs[Long]("r_milli") == -1000L)
    // path 1-2-3-4: m=6, sx=10, sxy=16, sx2=18 ->
    //   r = (96-100)/(108-100) = -1/2 (truncation exact: 4000/8)
    val path = functions.Clusters.graphAssortativityOn(
      sym(Seq((1L, 2L), (2L, 3L), (3L, 4L)))).head()
    assert((path.getAs[Long]("m"), path.getAs[Long]("sx"),
      path.getAs[Long]("sxy"), path.getAs[Long]("sx2")) ==
      ((6L, 10L, 16L, 18L)))
    assert(path.getAs[Long]("r_milli") == -500L)
    // the trade graph is bipartite: hubs can only attach across to
    // the sparser side -> negative by structure
    val corpus = functions.Clusters.graphAssortativity(spark, sf).head()
    assert(corpus.getAs[Long]("r_milli") < 0L)
  }

  test("L15c louvain move: hand-computed gains on the two-triangle barbell") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} bridged by 3-4; LPA(2) labels
    // {1,2,3}->1, {4}->4, {5,6}->3; m=7
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val out = functions.Clusters.graphLouvainMoveOn(edges)
      .select("node", "old_label", "new_label", "gain_num")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // bridge node 4 joins the {5,6} community: 2m*k_in - k*sigma =
    // 28 - 12 = 16, beating both staying (0) and the left triangle (-7)
    assert(out(4L) == (4L, 3L, 16L))
    // node 5 stays: own-community gain 14 - 2*(4-2) = 10 beats moving (8)
    assert(out(5L) == (3L, 3L, 10L))
    // node 3 stays in the triangle: 28 - 3*(7-3) = 16
    assert(out(3L) == (1L, 1L, 16L))
  }

  test("L15c louvain move on the corpus: picks dominate the stay option") {
    import spark.implicits._
    // independent replay: the chosen gain must be >= the stay gain
    // computed from the same labeling (never a forced move)
    val edges = functions.Similarity.simKnnJoinOn(
      Tables.embeddings(spark, sf)).select("qid", "nid")
    val moves = functions.Clusters.graphLouvainMoveOn(edges)
    val lab = functions.Clusters.labelPropagationOn(edges)
    val und = edges.select(least(col("qid"), col("nid")).as("a"),
        greatest(col("qid"), col("nid")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val adj = und.select(explode(array(
        struct(col("a").as("node"), col("b").as("nb")),
        struct(col("b").as("node"), col("a").as("nb")))).as("p"))
      .select("p.node", "p.nb")
    val deg = adj.groupBy("node").agg(count(lit(1)).as("k"))
    val m = und.count()
    val sigma = lab.join(deg, "node").groupBy(col("community"))
      .agg(sum(col("k")).as("sigma_tot"))
    val kinOwn = adj
      .join(lab.select(col("node").as("nb"), col("community").as("c")), "nb")
      .join(lab.withColumnRenamed("community", "own"), "node")
      .filter(col("c") === col("own"))
      .groupBy("node", "own").agg(count(lit(1)).as("k_in_own"))
    val stay = lab.withColumnRenamed("community", "own")
      .join(kinOwn, Seq("node", "own"), "left")
      .join(deg, "node")
      .join(sigma.withColumnRenamed("community", "own"), "own")
      .select(col("node"),
        (lit(2L * m) * coalesce(col("k_in_own"), lit(0L)) -
          col("k") * (col("sigma_tot") - col("k"))).as("stay_gain"))
    val bad = moves.join(stay, "node")
      .filter(col("gain_num") < col("stay_gain")).count()
    assert(bad == 0)
  }

  test("L16b golden record: per-attribute survivorship rules on a hand cluster") {
    import spark.implicits._
    val recs = Seq(
      (1L, "alpha", 1, 5.0), (2L, "alphb", 1, 9.0), (3L, "alpha", 1, 7.0),
      (9L, "zzzzz", 1, 1.0), // singleton: no golden record row
    ).toDF("rid", "name", "grp", "bal")
    val out = functions.Clusters.erGoldenRecordOn(recs)
      .select("n_members", "canonical_id", "surviving_name",
        "surviving_grp", "surviving_bal")
      .as[(Long, Long, String, Int, Double)].collect()
    assert(out.toSeq == Seq((3L, 1L, "alpha", 1, 9.0)))
  }

  test("L16b golden record on the corpus: agrees with er_pipeline's clusters") {
    import spark.implicits._
    val gr = functions.Clusters.erGoldenRecord(spark, sf)
      .select("cluster_id", "n_members", "surviving_bal")
    val er = functions.Clusters.erPipeline(spark, sf)
      .select("cluster_id", "n_members", "surviving_bal")
    // same clusters, same member counts, same max-bal survivor
    assert(gr.exceptAll(er).count() == 0 && er.exceptAll(gr).count() == 0)
  }

  test("L18n harmonic centrality: exact hand values on the path graph; " +
      "center beats endpoint") {
    import spark.implicits._
    // path 1-2-3-4: H(1) = 1/1+1/2+1/3 = 1833333 micro over 3 nodes;
    // H(2) = 1+1+1/2 = 2500000 (center reaches everyone in <= 2)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val got = functions.Clusters.graphHarmonicOn(und,
        Seq(1L, 2L).toDF("node"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1833333L, 3L),
      (2L, 3L, 2500000L, 2L)))
    // corpus: every seed reaches a real neighborhood, and no distance
    // exceeds the 4-hop cutoff
    val c = functions.Clusters.graphHarmonic(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(c.nonEmpty && c.forall(r => r._2 > 0 && r._4 <= 4))
  }

  test("L18r clustering coefficient: triangle+pendant hand values; " +
      "pendant NULL-gates; corpus ccs valid milli and mean matches") {
    import spark.implicits._
    // triangle 1-2-3 with pendant 4 on node 3
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = functions.Clusters.clusteringCoeffOn(g).collect()
    val by = got.map(r => r.getAs[Long]("node") -> r).toMap
    assert(by(1L).getAs[Long]("cc_milli") == 1000L &&
      by(2L).getAs[Long]("cc_milli") == 1000L &&
      by(3L).getAs[Long]("cc_milli") == 333L)
    assert(by(4L).isNullAt(by(4L).fieldIndex("cc_milli")))
    assert(got.forall(_.getAs[Long]("avg_cc_milli") == 777L))
    // corpus: every gated cc a valid milli; mean equals the integer
    // mean of the gated column recomputed independently
    val c = functions.Clusters.graphClusteringCoeff(spark, sf).collect()
    val gated = c.filter(!_.isNullAt(3)).map(_.getAs[Long]("cc_milli"))
    assert(gated.forall(x => x >= 0 && x <= 1000))
    assert(c.head.getAs[Long]("avg_cc_milli") ==
      gated.sum / gated.length)
  }

  test("L18q betweenness: path graph puts all dependency on the bridge " +
      "nodes; diamond splits sigma exactly in half; seeds never appear") {
    import spark.implicits._
    // path 1-2-3-4-5, seed {1}: delta(2)=3e6, delta(3)=2e6,
    // delta(4)=1e6, delta(5)=0 (Brandes backward sums, sigma all 1)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val got = functions.Clusters.graphBetweennessOn(path,
        Seq(1L).toDF("node"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (2L, 3000000L, 1L), (3L, 2000000L, 1L),
      (4L, 1000000L, 1L), (5L, 0L, 0L)))
    // diamond 1-{2,3}-4, seed {1}: two shortest paths to 4 (sigma 2),
    // each middle node carries exactly half the unit dependency
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val d = functions.Clusters.graphBetweennessOn(diamond,
        Seq(1L).toDF("node"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(d == Seq((2L, 500000L, 1L), (3L, 500000L, 1L), (4L, 0L, 0L)))
    // corpus: deterministic repeat, seeds excluded, dependencies
    // non-negative
    val c = functions.Clusters.graphBetweenness(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(c.nonEmpty && c.forall(r => r._1 >= 10 && r._2 >= 0))
    val again = functions.Clusters.graphBetweenness(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(c == again)
  }

  test("L18m personalized pagerank: proximity decays with distance from " +
      "the seed; deterministic replay") {
    import spark.implicits._
    // undirected path 1-2-3-4, seed {1}: rank strictly decays along it
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val r = functions.Clusters.graphPprOn(und, Seq(1L).toDF("node"))
      .as[(Long, Boolean, Long)].collect().toSeq
    assert(r.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(r.map(_._2) == Seq(true, false, false, false))
    val ranks = r.map(_._3)
    assert(ranks.sliding(2).forall(p => p(0) > p(1)),
      s"expected decay along the path, got $ranks")
    // corpus: seeds outrank the non-seed average, replay is identical
    val c = functions.Clusters.graphPpr(spark, sf).cache()
    val seedMin = c.filter(col("is_seed")).agg(min("rank_scaled"))
      .as[Long].head()
    val otherAvg = c.filter(!col("is_seed")).agg(avg("rank_scaled"))
      .as[Double].head()
    assert(seedMin > otherAvg,
      s"seed floor $seedMin should exceed non-seed mean $otherAvg")
    val again = functions.Clusters.graphPpr(spark, sf)
    assert(c.exceptAll(again).count() == 0 && again.exceptAll(c).count() == 0)
    c.unpersist()
  }

  test("graph_cc_incremental: hand graph — a delta edge merges two " +
    "base components (both sides relabel to the joint min), " +
    "delta-only nodes enter as self-labeled and merge, an untouched " +
    "base component never changes; corpus labels are component minima") {
    val edges = Seq(
      (1L, 2L, 0L), (3L, 4L, 0L), (5L, 6L, 0L), // base
      (2L, 3L, 9L), (7L, 8L, 9L), (6L, 9L, 9L)) // delta
      .toDF("a", "b", "h")
    val got = functions.Clusters.graphCcIncrementalCompose(edges)
      .select("node", "lbl_base", "lbl", "changed")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, false), (2L, 1L, 1L, false),
      (3L, 3L, 1L, true), (4L, 3L, 1L, true),
      (5L, 5L, 5L, false), (6L, 5L, 5L, false),
      (7L, 7L, 7L, false), (8L, 8L, 7L, true),
      (9L, 9L, 5L, true)), got.mkString(","))
    // corpus: composed labels are component MINIMA (lbl = min node
    // among its members — the batch-CC contract; full batch equality
    // is the DuckDB oracle's job) and the delta actually merged
    val c = functions.Clusters.graphCcIncremental(spark, sf)
      .select("node", "lbl", "changed")
      .as[(Long, Long, Boolean)].collect().toSeq
    val mins = c.groupBy(_._2).map { case (l, m) => (l, m.map(_._1).min) }
    assert(mins.forall { case (l, m) => l == m }, mins)
    assert(c.exists(_._3)) // at least one delta-driven relabel
  }

  test("cluster_linkage_ladder: two pairs merge exactly at their " +
    "single-linkage height, the isolate never joins; corpus ladder " +
    "is monotone in clustered mass and max size") {
    // A-B at 4000, C-D at 4000, B-C gap 16000, E far away:
    // dendrogram heights — pairs form by rung 5000, the 4-cluster
    // at 20000, E singleton throughout
    val got = functions.Clusters.clusterLinkageLadderOn(Seq(
        (0L, 0.000f, 0.000f), (1L, 0.004f, 0.000f),
        (2L, 0.020f, 0.000f), (3L, 0.024f, 0.000f),
        (4L, 0.100f, 0.100f))
      .map { case (i, a, b) => (i, Seq(a, b)) }.toDF("vec_id", "embedding"))
      .select("eps_micro", "n_points", "n_clusters", "n_clustered",
        "n_singletons", "max_cluster_size", "pct_clustered_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (5000L, 5L, 2L, 4L, 1L, 2L, 800000L),
      (10000L, 5L, 2L, 4L, 1L, 2L, 800000L),
      (20000L, 5L, 1L, 4L, 1L, 4L, 800000L),
      (40000L, 5L, 1L, 4L, 1L, 4L, 800000L)), got.mkString(","))
    val c = functions.Clusters.clusterLinkageLadder(spark, sf)
      .select("eps_micro", "n_points", "n_clustered", "n_singletons",
        "max_cluster_size")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(c.map(_._2).distinct.size == 1) // n_points constant
    assert(c.forall { case (_, n, cl, s, _) => cl + s == n })
    assert(c.sliding(2).forall { case Seq(lo, hi) =>
      lo._3 <= hi._3 && lo._5 <= hi._5 }) // dendrogram monotonicity
  }

  test("anomaly_lof: imperative all-pairs replay equals the grid " +
    "operator on a fixture forcing every pinned rule — the outlier " +
    "beside the dense blob scores > 1.5, a scored point whose N_k " +
    "holds TWO sparse neighbors uses their raw d2 as reach and " +
    "excludes them from the lrd average, the isolate is sparse") {
    // blob ids 0-4 (mutually within eps), F id 5 = the blob-adjacent
    // outlier; cross p id 6 with arms 7,8 (scored), 9 (sparse, 3
    // nbrs) and far arm f id 10 (sparse, 3 nbrs) BOTH inside p's N_k;
    // isolate id 11
    val raw = Seq(
      (0L, 0.000f, 0.000f), (1L, 0.002f, 0.000f), (2L, 0.000f, 0.002f),
      (3L, 0.002f, 0.002f), (4L, 0.001f, 0.001f),
      (5L, 0.015f, 0.001f),
      (6L, 0.050f, 0.050f), (7L, 0.055f, 0.050f), (8L, 0.050f, 0.055f),
      (9L, 0.045f, 0.050f), (10L, 0.063f, 0.063f),
      (11L, 0.200f, 0.200f))
    val got = functions.Clusters.anomalyLofOn(
      raw.map { case (i, a, b) => (i, Seq(a, b)) }
        .toDF("vec_id", "embedding"))
      .select("vec_id", "n_nb", "role", "kdist2", "lrd_e12", "lof_milli")
      .as[(Long, Long, String, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    // all-pairs imperative replay of the pinned formulas
    val m = raw.map { case (i, a, b) =>
      i -> (math.floor(a * 1e6 + 0.5).toLong, math.floor(b * 1e6 + 0.5).toLong)
    }.toMap
    def d2(i: Long, j: Long) = {
      val (xi, yi) = m(i); val (xj, yj) = m(j)
      (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj)
    }
    val ids = raw.map(_._1)
    val nbrs = ids.map(i => i ->
      ids.filter(j => j != i && d2(i, j) <= 400000000L)).toMap
    val kd = nbrs.collect { case (i, ns) if ns.size >= 4 =>
      i -> ns.map(j => (d2(i, j), j)).sorted.apply(3)._1
    }
    val nk = kd.map { case (i, kdist) =>
      i -> nbrs(i).filter(j => d2(i, j) <= kdist) }
    val lrd = nk.map { case (i, ns) =>
      val sreach = ns.map(j =>
        math.max(d2(i, j), kd.getOrElse(j, d2(i, j)))).sum
      i -> (if (sreach > 0) Some(ns.size * 1000000000000L / sreach)
            else None)
    }
    val want = ids.map { i =>
      val scoredNbrLrds =
        nk.get(i).toSeq.flatten.flatMap(j => lrd.getOrElse(j, None))
      val lof = for {
        lp <- lrd.getOrElse(i, None) if lp > 0 && scoredNbrLrds.nonEmpty
      } yield scoredNbrLrds.sum * 1000L / (scoredNbrLrds.size * lp)
      (i, nbrs(i).size.toLong,
        if (nbrs(i).size >= 4) "scored" else "sparse",
        kd.get(i), lrd.getOrElse(i, None), lof)
    }
    assert(got == want, s"\ngot  $got\nwant $want")
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(5L)._6.exists(_ > 1500L)) // blob-adjacent outlier fires
    assert((0L to 4L).forall(i => byId(i)._6.exists(_ <= 1500L)))
    assert(byId(9L)._3 == "sparse" && byId(10L)._3 == "sparse")
    assert(byId(6L)._3 == "scored") // N_k = {7,8,9,10}: two sparse in it
    assert(byId(11L)._3 == "sparse" && byId(11L)._4.isEmpty)
  }

  test("cluster_dbscan: hand grid — dense blobs are cores with the " +
    "component-min label, the thin satellite is border, the isolate " +
    "is noise; exact-eps distance is inclusive; corpus labels are " +
    "component minima") {
    def emb(rows: Seq[(Long, Float, Float)]) = rows.map { case (i, a, b) =>
      (i, Seq(a, b))
    }.toDF("vec_id", "embedding")
    // blob 1 (ids 0-3): pairwise < eps=0.02 -> 4 cores, label 0
    // E (id 4): within eps of B and D only (n_nb=3 < minPts) -> border
    // blob 2 (ids 5-8): includes an EXACT-eps pair (G-H at 0.02) -> cores
    // F (id 9): isolated -> noise
    val got = functions.Clusters.clusterDbscanOn(emb(Seq(
      (0L, 0.000f, 0.000f), (1L, 0.010f, 0.000f),
      (2L, 0.000f, 0.010f), (3L, 0.010f, 0.010f),
      (4L, 0.025f, 0.000f),
      (5L, -0.100f, -0.100f), (6L, -0.080f, -0.100f),
      (7L, -0.090f, -0.110f), (8L, -0.090f, -0.090f),
      (9L, 0.200f, 0.200f))))
      .select("vec_id", "n_nb", "role", "cluster")
      .as[(Long, Long, String, Option[Long])].collect().toSeq
    assert(got == Seq(
      (0L, 4L, "core", Some(0L)), (1L, 5L, "core", Some(0L)),
      (2L, 4L, "core", Some(0L)), (3L, 5L, "core", Some(0L)),
      (4L, 3L, "border", Some(0L)),
      (5L, 4L, "core", Some(5L)), (6L, 4L, "core", Some(5L)),
      (7L, 4L, "core", Some(5L)), (8L, 4L, "core", Some(5L)),
      (9L, 1L, "noise", None)), got.mkString(","))
    // corpus: labels are component minima, border labels come from
    // the core label set, noise is unlabeled
    val c = functions.Clusters.clusterDbscan(spark, sf).collect()
    val coreLbls = c.filter(_.getAs[String]("role") == "core")
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("vec_id")))
    val mins = coreLbls.groupBy(_._1).map { case (l, m) => (l, m.map(_._2).min) }
    assert(mins.forall { case (l, m) => l == m }, mins)
    val coreSet = coreLbls.map(_._1).toSet
    assert(c.filter(_.getAs[String]("role") == "border")
      .forall(r => coreSet.contains(r.getAs[Long]("cluster"))))
    assert(c.filter(_.getAs[String]("role") == "noise")
      .forall(r => r.isNullAt(r.fieldIndex("cluster"))))
  }
}
