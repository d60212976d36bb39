package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Near-duplicate cluster assignment — the rung a real dedup pipeline
  * needs between "candidate pairs" ([[Dedup]]) and "keep one copy":
  * connected components over the verified near-dup pair graph, with
  * cluster id = min doc_id in the component and the canonical keeper
  * flagged. (Pairs alone under-delete: if A~B and B~C but A!~C,
  * pairwise keep-min drops B twice but keeps both A and C of a
  * three-way group; the component {A,B,C} keeps exactly A.)
  *
  * Scale design: iterative min-label propagation, the Pregel form of
  * GraphX's connectedComponents, as plain DataFrame joins — each
  * iteration is one equi-join of the (symmetric) edge list against the
  * current labels plus a groupBy(node) min, i.e. two shuffles keyed on
  * node id, map-side combined. Rounds needed = graph diameter, and
  * near-dup components are almost-cliques (diameter 2-3) regardless of
  * corpus size, so the round count does not grow with data volume. For
  * adversarial long-chain graphs the O(log n)-round alternating
  * large-star/small-star algorithm (Kiveris et al., MapReduce CC) is
  * the drop-in upgrade. Labels are re-materialized each round
  * (localCheckpoint) so the plan stays constant-size instead of
  * deepening by two joins per round; on a cluster this would be a
  * checkpoint to reliable storage every few rounds.
  *
  * Reference behavior: the reference pipeline dedups per-episode by
  * exact id (skip-if-exists, raw_to_samples.py:310-313); corpus-level
  * near-dup grouping is the training-data generalization of that step.
  */
object Clusters {

  /** Connected components of an undirected pair graph. Input: any
    * two-column DataFrame of (node, node) edges; output: (node, lbl)
    * with lbl = min node id in the component. Runs the label loop
    * eagerly (iterative algorithms are driver-coordinated actions, as
    * in GraphX); throws if `maxIter` rounds don't reach a fixpoint
    * rather than returning partially-merged clusters. */
  def connectedComponentsOn(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val Array(ca, cb) = pairs.columns.take(2)
    // symmetrize in ONE pass over the pair pipeline: a union of the
    // two directions re-executes the (possibly expensive) upstream
    // pair join per branch — ReuseExchange does not fire across
    // union branches (the r2 double-scan trap; measured again here)
    val edges = pairs
      .select(col(ca).cast("long").as("a"), col(cb).cast("long").as("b"))
      .select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    try while (changed > 0 && iter < maxIter) {
      // min label among neighbors, one shuffle on the edge endpoint
      val nbrMin = edges.as("e")
        .join(labels.as("l"), col("e.b") === col("l.node"))
        .groupBy(col("e.a")).agg(min(col("l.lbl")).as("nlbl"))
        .withColumnRenamed("a", "nnode")
      val hop = labels.as("o")
        .join(nbrMin, col("o.node") === col("nnode"), "left")
        .select(col("o.node").as("node"), col("o.lbl").as("old"),
          least(col("o.lbl"), coalesce(col("nlbl"), col("o.lbl"))).as("lbl"))
      // pointer jumping: resolve each new label through the new label
      // map itself — lbl(lbl(x)) <= lbl(x), so label distances compound
      // per round and long chains collapse in O(log diameter) rounds
      // instead of one hop per round (a chainy threshold graph measured
      // 10x slower without this). Skipped in round 0: dup groups are
      // usually near-cliques that converge by round 1, where the extra
      // self-join is pure overhead; chains recoup it from round 1 on.
      val jumped =
        if (iter == 0) hop
        else {
          val hopMap = hop.select(col("node").as("pnode"), col("lbl").as("plbl"))
          hop.join(hopMap, col("lbl") === col("pnode"), "left")
            .select(col("node"), col("old"),
              least(col("lbl"), coalesce(col("plbl"), col("lbl"))).as("lbl"))
        }
      val step = jumped.persist(StorageLevel.MEMORY_AND_DISK)
      changed = step.filter(col("lbl") < col("old")).count()
      if (sys.env.contains("GRAFT_CC_VERBOSE"))
        System.err.println(s"[cc] iter=$iter changed=$changed")
      val prev = labels
      labels = step.select("node", "lbl").localCheckpoint(true)
      step.unpersist()
      prev.unpersist()
      iter += 1
    } finally edges.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds")
    labels
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the O(log n)-round algorithm
    * [[connectedComponentsOn]]'s scaladoc names for adversarial
    * long-chain graphs, implemented rather than cited. Each round is
    * two edge-set rewrites, each ONE groupBy-min plus one equi-join
    * back (two node-keyed, map-side-combinable shuffles):
    *
    *  - large-star: per node u with m = min(N(u) ∪ u), rewire every
    *    LARGER neighbor v > u to (m, v);
    *  - small-star: per node u over its smaller-or-equal neighbors,
    *    rewire all of them plus u itself to their minimum.
    *
    * The edge set monotonically contracts toward one star per
    * component (root = component min); unlike plain min-label
    * propagation — whose round count is the graph DIAMETER unless
    * pointer jumping compounds — the star operations provably halve
    * component height every round. Convergence = edge set unchanged,
    * checked exactly in ONE action per round (both relations are
    * distinct, so set equality = no row occurs exactly once in their
    * union — a single groupBy-count; at 100 TB the cheap check is a
    * (count, xor of edge hashes) pair — one partial aggregate, no
    * set op at all). Each round re-materializes
    * (localCheckpoint) so the plan stays constant-size. Output
    * contract matches [[connectedComponentsOn]]: (node, lbl) with
    * lbl = component min, every input endpoint present. */
  def connectedComponentsAltStarOn(pairs: DataFrame,
      maxIter: Int = 30): DataFrame = {
    val Array(ca, cb) = pairs.columns.take(2)
    val raw = pairs
      .select(col(ca).cast("long").as("a"), col(cb).cast("long").as("b"))
    val nodes = raw.select(explode(array(col("a"), col("b"))).as("node"))
      .distinct().localCheckpoint(true)
    var edges = raw.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct().localCheckpoint(true)
    // emitted pairs always carry m = min < v, so (a, b) stays the
    // canonical (smaller, larger) orientation without re-sorting
    def largeStar(e: DataFrame): DataFrame = {
      val nbr = e.select(explode(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(col("b").as("u"), col("a").as("v")))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
      val mins = nbr.groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // duplicates tolerated here: smallStar's groupBy-min is
      // insensitive to them and its trailing distinct restores set
      // semantics — one fewer shuffle per round
      nbr.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      // key every edge on its LARGER endpoint; v <= u by construction
      val nbr = e.select(col("b").as("u"), col("a").as("v"))
      val mins = nbr.groupBy("u").agg(min(col("v")).as("m"))
      val rewired = nbr.join(mins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
      val self = mins.select(col("m").as("a"), col("u").as("b"))
      rewired.unionByName(self).filter(col("a") =!= col("b")).distinct()
    }
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // convergence = set equality of two DISTINCT relations, read as
      // "no row appears exactly once in their union" — count-equality
      // and subset in ONE action over the two checkpointed RDDs
      // (replacing the previous count() + except().isEmpty pair; at
      // suite scale the per-round driver jobs ARE the CC cost)
      converged = next.unionByName(edges)
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
        .filter(col("c") === 1).isEmpty
      edges = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"alternating star did not converge within $maxIter rounds")
    nodes.join(edges.select(col("b").as("node"), col("a").as("plbl")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("plbl"), col("node")).as("lbl"))
  }

  /** Cluster assignment over any (doc_id-ish, doc_id-ish) pair frame:
    * (doc_id, cluster_id, n_members, is_keeper), keeper = min id.
    * `cc` picks the component algorithm (default: min-label
    * propagation; [[connectedComponentsAltStarOn]] is the
    * adversarial-chain alternative). */
  def clustersOn(pairs: DataFrame,
      cc: DataFrame => DataFrame = connectedComponentsOn(_)): DataFrame = {
    val ccOut = cc(pairs)
    val sizes = ccOut.groupBy("lbl").agg(count(lit(1)).as("n_members"))
    ccOut.join(sizes, "lbl")
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
        col("n_members"), (col("node") === col("lbl")).as("is_keeper"))
      .orderBy("cluster_id", "doc_id")
  }

  /** Fixed-iteration PageRank over a directed edge list, in EXACT
    * integer arithmetic — the third member of the iterative family
    * ([[connectedComponentsOn]] label propagation,
    * [[Similarity.kmeansOn]] Lloyd's): importance scores for
    * graph-shaped corpus metadata (link graphs, citation graphs,
    * user-item interaction graphs) that data-curation pipelines use
    * as quality priors.
    *
    * Ranks are integers scaled by 1e9; each round is
    * r' = 0.15*SCALE + floor(0.85 * sum(floor(r_in / deg_in))) with
    * every step a BIGINT floor-division — no accumulation-order float
    * math, so the DuckDB oracle replays all rounds bit-for-bit (the
    * [[Similarity.kmeansOn]] determinism recipe). Per round: one
    * equi-join of the edge list against current ranks + one groupBy
    * on the destination — two map-side-combinable shuffles keyed on
    * node id, the textbook Pregel step as DataFrames. The node set is
    * constant, so each round references the previous ranks exactly
    * once and the unrolled plan stays LINEAR in iteration count.
    *
    * Contract: every node must appear as a source (outdeg >= 1) —
    * feed sink nodes a self-loop or both directions of an undirected
    * graph (the catalog form does the latter). Rank mass of a node
    * is bounded by N*SCALE, so sums stay far inside BIGINT. */
  def graphPagerankOn(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
      col(cd).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src")
    val nodes = deg.select(col("src").as("node"))
    var r = nodes.withColumn("r", lit(1000000000L))
    for (_ <- 1 to iters) {
      val contrib = ed.join(r, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      r = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(150000000L) +
            expr("coalesce(s, CAST(0 AS BIGINT)) * 85 div 100")).as("r"))
    }
    r.select(col("node"), col("r").as("rank_scaled")).orderBy("node")
  }

  /** Catalog form: rank customers and suppliers on the undirected
    * bipartite who-traded-with-whom graph (customer c bought a part
    * supplied by s; supplier nodes offset by 1e6 into their own id
    * space). Edge construction — the orders x lineitem join — runs
    * once into a checkpoint; the rank loop never re-derives it. */
  def graphPagerank(s: SparkSession, dir: String): DataFrame =
    graphPagerankOn(bipartiteEdges(s, dir))

  /** L18s: Katz centrality (Katz 1953; Bonacich 1987) — the walk-count
    * centrality that PageRank replaced but that link-graph curation
    * still uses when degree normalization is unwanted (a page cited by
    * one hub should inherit the hub's full mass, not 1/deg of it):
    * katz(v) = Σ_{k≥1} α^k · |walks of length k ending at v|,
    * truncated at `iters` hops.
    *
    * The attenuation is DERIVED FROM THE GRAPH, not tuned: α = 1/p
    * with p the smallest power of two strictly above the max degree,
    * so α < 1/d_max ≤ 1/λ_max — inside Katz's convergence radius by
    * construction — and every attenuation step is one exact BIGINT
    * floor-division x_k(v) = ⌊Σ_{(u,v)∈E} x_{k−1}(u) / p⌋ that the
    * DuckDB oracle replays bit-for-bit. p itself is spelled in
    * integers on both engines (min over the 62 BIGINT powers of two
    * exceeding d_max — no float log2 at the power-of-two boundary)
    * and rides in on a broadcast single-row relation, the
    * [[graphPpr]] scalar trick. Magnitudes are self-bounding:
    * Σ_in x ≤ d_max·SCALE < p·SCALE, so x_k ≤ SCALE = 10⁹ forever.
    *
    * Per round: one edge⋈rank equi-join + one map-side-combinable
    * rollup on the destination — the same two-shuffle Pregel step as
    * [[graphPagerankOn]], linear plan growth in `iters`. The final
    * score sums the per-hop relations with a union + rollup (every
    * node holds a row every round on a graph where each node has an
    * in-edge — the catalog's undirected form guarantees it).
    * Contract: every node must appear as a destination; feed
    * undirected graphs as both directions. */
  def graphKatzOn(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
      col(cd).cast("long").as("dst"))
    val dmax = e.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max(col("d")).as("dmax"))
    val p = e.sparkSession.range(1, 63)
      .select(expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").as("pw"))
      .crossJoin(broadcast(dmax))
      .filter(col("pw") > col("dmax"))
      .agg(min(col("pw")).as("p"))
    val nodes = e.select(col("src").as("node")).distinct()
    // Round 12 (optimization): checkpoint the 1-row attenuation scalar
    // and each V-sized hop relation. The lazy chain re-derived hop k-1
    // inside hop k AND inside every union branch (hop 1 evaluated
    // `iters` times, the dmax aggregate over the edge relation once
    // per hop per branch — ~2x the whole query's work at iters = 3,
    // plan-verified: 30 scans / 100 Exchange nodes collapsed to one
    // linear chain). Three eager V-row materializations buy the
    // elimination; the markov per-round-checkpoint rejection does not
    // apply — that loop's iterates were single-digit rows where
    // checkpoint overhead dominated, these are V-sized and re-derived
    // multiplicatively by the union fan.
    val pc = p.localCheckpoint(true)
    var x = nodes.withColumn("x", lit(1000000000L))
    val hops = (1 to iters).map { _ =>
      x = e.join(x, col("src") === col("node"))
        .crossJoin(broadcast(pc))
        .groupBy(col("dst"), col("p"))
        .agg(expr("sum(x) div p").as("x"))
        .select(col("dst").as("node"), col("x"))
        .localCheckpoint(true) // read by hop k+1 AND the union
      x
    }
    hops.reduce(_ union _)
      .groupBy("node").agg(sum(col("x")).as("katz_scaled"))
      .orderBy("node")
  }

  /** Catalog form: the customer⇄supplier trade graph, same substrate
    * as [[graphPagerank]] so the two centralities read side by side
    * (Katz rewards raw walk volume, PageRank the normalized share). */
  def graphKatz(s: SparkSession, dir: String): DataFrame =
    graphKatzOn(bipartiteEdges(s, dir))

  /** L18t: semi-supervised label propagation with clamped seeds (Zhu
    * & Ghahramani, CMU CALD-02-107; Zhou et al., NIPS 2004 "learning
    * with local and global consistency") — the transductive move a
    * corpus pipeline uses to SPREAD sparse expensive labels (human
    * quality ratings, licensing verdicts, topic tags) over a cheap
    * similarity graph: labeled nodes hold their label distribution
    * fixed; every unlabeled node repeatedly takes the degree-averaged
    * distribution of its neighbors.
    *
    * Exact integer spelling: distributions live in milli (seed =
    * 1000 on its own label), one propagation round is
    * x_k(v, ℓ) = ⌊Σ_{(u,v)∈E} x_{k−1}(u, ℓ) / deg(v)⌋ — a single
    * floor per (node, label) per round, replayed by the oracle's
    * unrolled CTEs; argmax ties break to the smaller label id. Mass
    * is sub-stochastic by construction (unlabeled-neighbor leakage),
    * which is the CONFIDENCE readout: conf_milli near 1000 means a
    * label-pure neighborhood.
    *
    * Shape per round: one edge⋈x equi-join + one (node, label)
    * map-side-combinable rollup + the broadcast-deg division —
    * the pagerank Pregel step with a |labels|-bounded fanout (≤ 5
    * here); the argmax window partitions by node over ≤ |labels|
    * rows. Linear plan growth in `iters`; nothing global. */
  def graphLabelSpreadOn(edges: DataFrame, seeds: DataFrame,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
      col(cd).cast("long").as("dst"))
    val deg = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("deg"))
    val sd = seeds.select(col("node").cast("long").as("node"),
      col("label").cast("long").as("label")).localCheckpoint(true)
    val x0 = sd.select(col("node"), col("label"), lit(1000L).as("x"))
    var x = x0
    for (_ <- 1 to iters) {
      val y = e.join(x, col("src") === col("node"))
        .groupBy(col("dst"), col("label"))
        .agg(sum(col("x")).as("sx"))
        .select(col("dst").as("node"), col("label"), col("sx"))
        .join(deg, "node")
        .select(col("node"), col("label"), expr("sx DIV deg").as("x"))
        .join(sd.select("node").distinct(), Seq("node"), "left_anti")
      x = x0.unionByName(y)
    }
    val w = Window.partitionBy("node")
      .orderBy(col("x").desc, col("label").asc)
    x.join(sd.select("node").distinct(), Seq("node"), "left_anti")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("node"), col("label").as("pred_label"),
        col("x").as("conf_milli"))
      .orderBy("node")
  }

  /** Catalog form: every 4th customer is seeded with its REGION; the
    * spread infers regions for suppliers and the unlabeled customers
    * over the trade graph, and the known nation→region of every node
    * rides along as the in-catalog accuracy eval (`correct`). */
  def graphLabelSpread(s: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_regionkey").cast("long"))
    val custRegion = Tables.customer(s, dir)
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").cast("long").as("node"),
        col("n_regionkey").as("region"))
    val suppRegion = Tables.supplier(s, dir)
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select((col("s_suppkey") + 1000000L).as("node"),
        col("n_regionkey").as("region"))
    val seeds = custRegion.filter(col("node") % 4 === 0)
      .select(col("node"), col("region").as("label"))
    val truth = custRegion.unionByName(suppRegion)
    graphLabelSpreadOn(bipartiteEdges(s, dir), seeds)
      .join(truth, Seq("node"))
      .select(col("node"), col("pred_label"), col("conf_milli"),
        col("region").as("true_region"),
        (col("pred_label") === col("region")).as("correct"))
      .orderBy("node")
  }

  /** L18m: personalized PageRank (Haveliwala 2002; the random-walk-
    * with-restart scorer behind "related items", seed-expansion
    * community detection, and graph-based retrieval): identical
    * Pregel loop to [[graphPagerankOn]], but ALL teleport mass
    * returns to the `seeds` set, so scores measure proximity to the
    * seeds instead of global importance. Exact integer arithmetic
    * throughout: the per-seed teleport is 0.15·SCALE·N div |S|
    * (floors shared with the oracle), r₀ = the teleport vector, and
    * each round is r' = tele + floor(0.85·Σ floor(r_in/deg_in)) in
    * BIGINT. The N/|S| scalar rides in on a broadcast single-row
    * aggregate — no driver-side collect. Same two-shuffle round and
    * same contract as pagerank (every node needs outdeg ≥ 1; seeds
    * must be non-empty and present in the graph, else ranks gate to
    * NULL via the div-by-zero rather than silently uniformizing). */
  def graphPprOn(edges: DataFrame, seeds: DataFrame,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
      col(cd).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src")
    val sd = seeds.select(col(seeds.columns.head).cast("long").as("node"))
      .distinct().withColumn("seed_hit", lit(true))
    val nodes = deg.select(col("src").as("node"))
      .join(sd, Seq("node"), "left")
      .withColumn("is_seed", coalesce(col("seed_hit"), lit(false)))
      .drop("seed_hit")
    val scal = broadcast(nodes.agg(count(lit(1)).as("nn"),
      sum(when(col("is_seed"), lit(1L)).otherwise(0L)).as("ns")))
    val base = nodes.crossJoin(scal) // scalar side: one broadcast row
      .withColumn("tele", when(col("is_seed"),
        expr("150000000 * nn div ns")).otherwise(lit(0L)))
      .select("node", "is_seed", "tele")
      .localCheckpoint(true)
    var r = base.withColumn("r", col("tele"))
    for (_ <- 1 to iters) {
      val contrib = ed.join(r.select(col("node"), col("r")),
          col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      r = base.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"), col("is_seed"), col("tele"),
          (col("tele") +
            expr("coalesce(s, CAST(0 AS BIGINT)) * 85 div 100")).as("r"))
    }
    r.select(col("node"), col("is_seed"), col("r").as("rank_scaled"))
      .orderBy("node")
  }

  /** Catalog form: proximity to the first nine customers on the
    * bipartite trade graph. */
  def graphPpr(s: SparkSession, dir: String): DataFrame = {
    val edges = bipartiteEdges(s, dir)
    graphPprOn(edges, edges.select(col("src")).filter(col("src") < 10))
  }

  /** L18i: HITS hubs & authorities (Kleinberg 1999) on a DIRECTED
    * graph: hubs are sources that point at many strong authorities;
    * authorities are destinations pointed at by many strong hubs.
    * `iters` mutual-reinforcement rounds in exact integer arithmetic:
    * the classical per-round L2 normalization only RESCALES scores,
    * so the ranking is identical without it and the un-normalized
    * scores stay exact BIGINTs both engines replay — bounded by
    * maxdeg^(2·iters)·n (document-checked for the catalog graph; at
    * deeper iteration swap the running sums to DECIMAL(38,0), the
    * plan is unchanged). Each half-round is ONE adjacency equi-join +
    * ONE key-grouped sum (map-side combined) — the two-shuffle Pregel
    * shape of [[graphPagerankOn]]; the edge relation is checkpointed
    * once and read by all 2·iters joins. */
  def graphHitsOn(edges: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
        col(cd).cast("long").as("dst"))
      .localCheckpoint(true)
    var h = e.select(col("src").as("node")).distinct()
      .withColumn("h", lit(1L))
    var a = h.select(col("node").as("dst"), col("h").as("a")).limit(0)
    for (_ <- 1 to iters) {
      a = e.join(h, col("src") === col("node"))
        .groupBy("dst").agg(sum(col("h")).as("a"))
      h = e.join(a.select(col("dst").as("dn"), col("a")),
          col("dst") === col("dn"))
        .groupBy("src").agg(sum(col("a")).as("h"))
        .select(col("src").as("node"), col("h"))
    }
    h.select(col("node"), lit("hub").as("role"), col("h").as("score"))
      .unionByName(a.select(col("dst").as("node"),
        lit("authority").as("role"), col("a").as("score")))
      .orderBy("node")
  }

  /** Catalog form: the directed customer → supplier trade graph (who
    * buys from whom; supplier ids offset by 1e6) — hub customers buy
    * across the strong-supplier pool, authority suppliers serve the
    * strong-buyer pool. */
  def graphHits(s: SparkSession, dir: String): DataFrame =
    graphHitsOn(tradeEdgesDirected(s, dir))

  /** L18j: degree assortativity (Newman 2002) — do high-degree nodes
    * attach to other high-degree nodes (r > 0, social networks) or to
    * leaves (r < 0, hub-and-spoke)? Over the SYMMETRIZED edge list the
    * x/y marginals coincide, so Pearson's r collapses to the exact
    * rational (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²) — no square root, no
    * floats. The raw BIGINT moments ship alongside r_milli so any
    * downstream precision policy can recompute; r_milli itself is one
    * DECIMAL(38,0) division spelled sign-first (negate, divide
    * non-negative, re-negate) because Spark DIV truncates toward zero
    * while DuckDB // floors — they only agree on non-negative
    * operands. Scale shape: one degree rollup + two node-keyed joins
    * decorate each edge endpoint — shuffles on node id only, never a
    * pairs blow-up. */
  def graphAssortativityOn(edges: DataFrame): DataFrame = {
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
      col(cd).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    e.join(deg, "src")
      .select(col("dst"), col("deg").as("x"))
      .join(deg.select(col("src").as("dst"), col("deg").as("y")), "dst")
      .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"))
      .select(col("m"), col("sx"), col("sxy"), col("sx2"),
        expr(
          """CASE WHEN CAST(m AS DECIMAL(38,0)) * sx2
            |       - CAST(sx AS DECIMAL(38,0)) * sx > 0 THEN
            |  CAST(CASE WHEN CAST(m AS DECIMAL(38,0)) * sxy
            |        - CAST(sx AS DECIMAL(38,0)) * sx < 0
            |    THEN -((CAST(sx AS DECIMAL(38,0)) * sx
            |        - CAST(m AS DECIMAL(38,0)) * sxy) * 1000
            |      DIV (CAST(m AS DECIMAL(38,0)) * sx2
            |        - CAST(sx AS DECIMAL(38,0)) * sx))
            |    ELSE (CAST(m AS DECIMAL(38,0)) * sxy
            |        - CAST(sx AS DECIMAL(38,0)) * sx) * 1000
            |      DIV (CAST(m AS DECIMAL(38,0)) * sx2
            |        - CAST(sx AS DECIMAL(38,0)) * sx) END
            |    AS BIGINT) END""".stripMargin).as("r_milli"))
  }

  /** Catalog form: the symmetrized trade graph — bipartite, so
    * high-degree hubs necessarily attach to the opposite (sparser)
    * side and r comes out negative (disassortative), the classic
    * bipartite signature. */
  def graphAssortativity(s: SparkSession, dir: String): DataFrame =
    graphAssortativityOn(bipartiteEdges(s, dir))

  private val bipCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]
  private val knnCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** Memoize per (session, dir) — the [[Dedup]] shingle-cache
    * discipline: synchronized first-build, stopped-session eviction. */
  private def memo(cache: scala.collection.concurrent.TrieMap[
      (SparkSession, String), DataFrame],
      s: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    cache.synchronized {
      cache.filterInPlace { case ((sess, _), _) =>
        !sess.sparkContext.isStopped }
      cache.getOrElseUpdate((s, dir), build)
    }

  /** kNN similarity edges over the embedding corpus — SEVEN graph
    * catalog wrappers (triangles, degrees, neighbor-jaccard,
    * adamic-adar, communities, modularity, louvain) consume this
    * exact relation; memoized per (session, dir) so a catalog run
    * derives the brute-force kNN join once, not per query (the
    * r6 bench charged each of them ~1.5-2 s for the same edges). */
  private[graft] def knnEdges(s: SparkSession, dir: String): DataFrame =
    memo(knnCache, s, dir) {
      Similarity.simKnnJoinCached(s, dir)
        .localCheckpoint(true)
    }

  /** Symmetrized customer–supplier trade graph shared by the
    * bipartite catalog forms ([[graphPagerank]], [[graphBfs]]):
    * supplier nodes offset by 1e6 into their own id space. Edge
    * construction — the orders x lineitem join — runs once into a
    * checkpoint, memoized per (session, dir) across the NINE
    * consuming catalog wrappers. */
  private[graft] def bipartiteEdges(s: SparkSession, dir: String): DataFrame =
    memo(bipCache, s, dir) { bipartiteEdgesBuild(s, dir) }

  private val dirTradeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** The DIRECTED customer → supplier trade edge list (distinct
    * (o_custkey, l_suppkey + 1e6) pairs of the orders ⋈ lineitem
    * join), memoized per (session, dir): graph_hits consumes it
    * directly and [[bipartiteEdges]] is its symmetrization, so the
    * fact-table join + distinct — the only corpus-sized work in
    * either — runs once per catalog run. */
  private[graft] def tradeEdgesDirected(s: SparkSession, dir: String): DataFrame =
    memo(dirTradeCache, s, dir) {
      Tables.orders(s, dir).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
        .localCheckpoint(true)
    }

  private def bipartiteEdgesBuild(s: SparkSession, dir: String): DataFrame = {
    val e = tradeEdgesDirected(s, dir)
    e.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
      .localCheckpoint(true)
  }

  /** L18g: bipartite → unipartite projection with top-k partners —
    * the market-basket / item-item collaborative-filtering step:
    * entities that co-occur in the same group (suppliers in one
    * order, tokens in one doc, items in one basket) become edges
    * weighted by co-occurrence count; each entity keeps its top-k
    * partners. The scale hazards and their levers, both explicit:
    * (1) wedge blowup — pairs per group grow as group_degree², so
    * the group-keyed self-join is bounded ONLY when per-group
    * membership is bounded (orders hold ~7 suppliers; for power-law
    * groups, cap or sample members first — the dedup_ngram df-cap
    * move); (2) output size — the full projection is quadratic-ish
    * in co-occurrence density, so the catalog emits the RANKED top-3
    * per source (rank-then-filter collapses to WindowGroupLimit:
    * partial top-k BEFORE the shuffle, the text_keywords plan pin).
    * Both orientations rank, so every member gets partners. */
  def graphProjectionOn(membership: DataFrame, topK: Int = 3): DataFrame = {
    val e = membership.select(col("grp"), col("member")).distinct()
    val pairs = e.select(col("grp"), col("member").as("sa"))
      .join(e.select(col("grp"), col("member").as("sb")), "grp")
      .filter(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("co"))
    val sym = pairs.select(explode(array(
        struct(col("sa").as("src"), col("sb").as("partner"), col("co")),
        struct(col("sb").as("src"), col("sa").as("partner"), col("co"))))
        .as("p"))
      .select("p.src", "p.partner", "p.co")
    sym
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(col("co").desc, col("partner").asc)))
      .filter(col("rk") <= topK)
  }

  /** Catalog wrapper: suppliers co-occurring in an order. */
  def graphProjection(s: SparkSession, dir: String): DataFrame =
    graphProjectionOn(Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("grp"), col("l_suppkey").as("member")))
      .orderBy("src", "rk")

  /** Single-source BFS hop distances — the reachability-with-depth
    * primitive (lineage radius, contamination blast-radius, "how far
    * is this doc from a flagged seed"). Pregel form as plain
    * DataFrame ops: each round joins the current distance relation
    * to the edge list and folds a per-node MIN — two shuffles per
    * round, both keyed on node id and map-side combined, with
    * localCheckpoint keeping the plan constant-size (the
    * [[connectedComponentsOn]] discipline). Rounds = `maxHops`
    * exactly (no convergence probe needed: dist values are final the
    * round they first appear). Source = MIN node id, computed as a
    * 1-row aggregate INSIDE the plan — no driver-side collect.
    * At 100 TB the standard refinement is frontier-only expansion
    * (join only the rows whose dist changed last round); the
    * full-relation MIN spelling here trades that for plan simplicity
    * and is exactly what the min-label CC loop already shards. */
  def graphBfsOn(edges: DataFrame, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"need maxHops >= 1, got $maxHops")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
      col(cd).cast("long").as("dst"))
    var dist = e.agg(min(col("src")).as("node"))
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    for (_ <- 1 to maxHops) {
      val nxt = dist.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
      dist = dist.union(nxt)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist.orderBy("node")
  }

  def graphBfs(s: SparkSession, dir: String): DataFrame =
    graphBfsOn(bipartiteEdges(s, dir))

  /** L18n: k-hop harmonic centrality for a seed set (Marchiori &
    * Latora 2000; Boldi & Vigna's preferred centrality for
    * disconnected graphs, since unreachable nodes contribute 0
    * instead of poisoning the mean): H(s) = Σ_{v≠s, d(v,s)≤k} 1/d.
    * Multi-source [[graphBfsOn]] — the distance relation carries a
    * seed column, so ALL seeds expand in the same `maxHops` Pregel
    * rounds (one edge join + one (seed, node)-keyed MIN fold per
    * round, both map-side combined; state is |seeds|·|reached|
    * rows — the standard multi-source trick that beats |S| separate
    * sweeps). The k-hop cutoff is pinned semantics, not error: this
    * is "4-hop harmonic centrality", the form HyperBall-style systems
    * compute at scale; per-term 1e6 div d is exact in both engines
    * and summed order-free. */
  def graphHarmonicOn(edges: DataFrame, seeds: DataFrame,
      maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"need maxHops >= 1, got $maxHops")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
      col(cd).cast("long").as("dst")).localCheckpoint(true)
    var dist = seeds
      .select(col(seeds.columns.head).cast("long").as("seed")).distinct()
      .select(col("seed"), col("seed").as("node"))
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    for (_ <- 1 to maxHops) {
      val nxt = dist.join(e, col("node") === col("src"))
        .select(col("seed"), col("dst").as("node"),
          (col("dist") + 1).as("dist"))
      dist = dist.union(nxt)
        .groupBy("seed", "node").agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist.filter(col("node") =!= col("seed"))
      .groupBy("seed").agg(
        count(lit(1)).as("n_reached"),
        sum(expr("1000000 div dist")).as("harmonic_micro"),
        max(col("dist")).as("max_dist"))
      .orderBy("seed")
  }

  private val seedBfsCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String),
      (IndexedSeq[DataFrame], IndexedSeq[DataFrame])]

  /** The forward multi-source BFS over the trade graph from the
    * shared catalog seed set (customers < 10, 4-hop horizon) —
    * graph_betweenness and graph_harmonic walk the SAME graph from
    * the SAME seeds to the SAME horizon, so the expansion (the
    * dominant cost of both: one edge join + one (seed, node) rollup
    * per level) runs ONCE per (session, dir) and each query keeps
    * only its own consumption — Brandes' backward pass for
    * betweenness, the distance census for harmonic. */
  private def tradeSeedBfs(s: SparkSession, dir: String)
      : (IndexedSeq[DataFrame], IndexedSeq[DataFrame]) =
    seedBfsCache.synchronized {
      seedBfsCache.filterInPlace { case ((sess, _), _) =>
        !sess.sparkContext.isStopped }
      seedBfsCache.getOrElseUpdate((s, dir), {
        val edges = bipartiteEdges(s, dir)
        seedBfsForward(edges,
          edges.select(col("src")).filter(col("src") < 10), 4)
      })
    }

  /** Catalog form: the first nine customers on the trade graph (the
    * graph_ppr seed set — the two centralities read side by side).
    * Consumes the [[tradeSeedBfs]] frontiers: a node's first-reached
    * level IS its shortest distance (the anti-join guarantees first
    * reach), so the harmonic census is a projection of the shared
    * expansion — level 0 (the seeds themselves, excluded by Brandes
    * and by H(s)'s v != s) simply drops. */
  def graphHarmonic(s: SparkSession, dir: String): DataFrame = {
    val (frontiers, _) = tradeSeedBfs(s, dir)
    frontiers.drop(1).reduce(_ unionByName _)
      .select(col("seed"), col("node"), col("dist"))
      .groupBy("seed").agg(
        count(lit(1)).as("n_reached"),
        sum(expr("1000000 div dist")).as("harmonic_micro"),
        max(col("dist")).as("max_dist"))
      .orderBy("seed")
  }

  /** L18q: seed-sampled betweenness centrality, Brandes' algorithm
    * (Brandes 2001) with the pivot-sampling estimator of Brandes &
    * Pich 2007 and a k-hop horizon — the standard way betweenness is
    * actually computed at scale (exact all-pairs is O(V·E) and
    * unsampled betweenness on 100 TB is off the table; a seed sample
    * with bounded depth is what HyperBall-era systems report).
    *
    * Forward: multi-source BFS carrying the shortest-PATH-COUNT σ —
    * per level one edge join + one (seed, node) rollup summing σ
    * over predecessors, with an anti-join keeping only first-reached
    * nodes (the [[graphHarmonicOn]] multi-source trick, plus σ).
    * The shortest-path DAG then materializes once: reached(u) ⋈ E ⋈
    * reached(v) with dist(v) = dist(u)+1, carrying σ_u and σ_v.
    * Backward: Brandes' dependency accumulation δ(u) = Σ_succ
    * σ_u/σ_v·(1+δ(v)) unrolled from the horizon down, δ in integer
    * MICRO units with the per-term floor division BEFORE the
    * order-free sum (the harmonic/logreg quantization convention —
    * both engines replay bit-for-bit). Betweenness of a node is its
    * δ summed over seeds, seeds themselves excluded (Brandes sums
    * over sources s ≠ v).
    *
    * Shape per round (forward and backward both): one equi-join +
    * one map-side-combinable rollup, state |seeds|·|reached| rows.
    * Each LEVEL's frontier checkpoints once and `reached` is the
    * lazy union of those checkpoints — materializing the growing
    * union per round would rewrite level 0..l−1 O(maxHops) times.
    * No window, no single-partition hop. */
  def graphBetweennessOn(edges: DataFrame, seeds: DataFrame,
      maxHops: Int = 4): DataFrame = {
    val (frontiers, dagAt) = seedBfsForward(edges, seeds, maxHops)
    betweennessBackward(frontiers, dagAt, maxHops)
  }

  /** Forward multi-source BFS carrying the shortest-path count σ —
    * the shared expansion behind [[graphBetweennessOn]] (which runs
    * Brandes' backward pass over it) and the catalog
    * [[graphHarmonic]] (whose census needs only the first-reached
    * distances, a projection of the same frontiers). Returns one
    * checkpointed frontier per level (level 0 = the seeds) plus the
    * per-level shortest-path-DAG slices. */
  private def seedBfsForward(edges: DataFrame, seeds: DataFrame,
      maxHops: Int): (IndexedSeq[DataFrame], IndexedSeq[DataFrame]) = {
    require(maxHops >= 2, s"need maxHops >= 2, got $maxHops")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
      col(cd).cast("long").as("dst")).distinct()
      .localCheckpoint(true) // read by every forward round + the DAG
    // one checkpoint PER LEVEL (the frontier), never the growing
    // union — re-materializing levels 0..l−1 every round would write
    // the same rows O(maxHops) times; `reached` stays a lazy union
    // of the checkpointed frontiers
    val f0 = seeds
      .select(col(seeds.columns.head).cast("long").as("seed")).distinct()
      .select(col("seed"), col("seed").as("node"))
      .withColumn("dist", lit(0L)).withColumn("sigma", lit(1L))
      .localCheckpoint(true)
    val frontiers = scala.collection.mutable.ArrayBuffer(f0)
    // per-level slice of the shortest-path DAG, built INSIDE the
    // forward loop off the same checkpointed expansion that feeds the
    // σ rollup — a separate reached⋈E⋈reached pass afterwards would
    // re-derive every expansion a second time (measured ~1/3 of the
    // op's cost before this fusion)
    val dagAt = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var reached = f0
    for (l <- 1 to maxHops) {
      // NOT checkpointed: the σ rollup reads it now; the DAG slice
      // recomputes it lazily IF the backward pass reads that level
      // (dagAt(0) never is — edges into level 1 only feed the seeds'
      // own δ, which Brandes drops). Re-deriving a frontier⋈E join
      // on demand measured cheaper than eagerly materializing every
      // Σdeg-row expansion.
      val expand = frontiers(l - 1)
        .select(col("seed"), col("node").as("u"), col("sigma").as("su"))
        .join(e, col("u") === col("src"))
        .select(col("seed"), col("u"), col("su"), col("dst"))
      val cand = expand.groupBy(col("seed"), col("dst"))
        .agg(sum(col("su")).as("sigma"))
      val fresh = cand
        .join(reached.select(col("seed"), col("node").as("dst")),
          Seq("seed", "dst"), "left_anti")
        .select(col("seed"), col("dst").as("node"),
          lit(l.toLong).as("dist"), col("sigma"))
        .localCheckpoint(true)
      frontiers += fresh
      reached = reached.union(fresh)
      // DAG edges ending at level l: expansion rows whose target was
      // FIRST reached at l (equi-join on (seed, dst) — a successor's
      // dist is always its predecessor's + 1, no filter needed)
      dagAt += expand
        .join(fresh.select(col("seed"), col("node").as("dst"),
          col("sigma").as("sv")), Seq("seed", "dst"))
        .select(col("seed"), col("u"), col("su"),
          col("dst").as("v"), col("sv"))
    }
    (frontiers.toIndexedSeq, dagAt.toIndexedSeq)
  }

  /** Brandes' dependency accumulation over a [[seedBfsForward]]
    * result — δ in integer micro units, per-term floor division
    * before the order-free sum. */
  private def betweennessBackward(frontiers: IndexedSeq[DataFrame],
      dagAt: IndexedSeq[DataFrame], maxHops: Int): DataFrame = {
    val f0 = frontiers(0)
    var delta = frontiers(maxHops)
      .select(col("seed"), col("node"))
      .withColumn("delta_micro", lit(0L))
    var acc = delta
    for (l <- (maxHops - 1) to 1 by -1) {
      val contrib = dagAt(l) // edges u@l -> v@l+1 (0-indexed buffer)
        .join(delta.select(col("seed"), col("node").as("v"),
          col("delta_micro").as("dv")), Seq("seed", "v"), "left")
        .na.fill(0L, Seq("dv"))
        .select(col("seed"), col("u"),
          expr("su * (1000000 + dv) div sv").as("term"))
        .groupBy(col("seed"), col("u"))
        .agg(sum(col("term")).as("d"))
      delta = frontiers(l)
        .select(col("seed"), col("node"))
        .join(contrib.select(col("seed"), col("u").as("node"),
          col("d")), Seq("seed", "node"), "left")
        .na.fill(0L, Seq("d"))
        .select(col("seed"), col("node"), col("d").as("delta_micro"))
        .localCheckpoint(true)
      acc = acc.union(delta)
    }
    acc
      .join(f0.select(col("node")).distinct(), Seq("node"), "left_anti")
      .groupBy("node")
      .agg(sum(col("delta_micro")).as("bc_micro"),
        sum(when(col("delta_micro") > 0, 1L).otherwise(0L))
          .as("n_seeds_pos"))
      .orderBy("node")
  }

  /** Catalog form: the graph_ppr/graph_harmonic seed set on the
    * trade graph — the three centralities read side by side. Runs
    * Brandes' backward pass over the [[tradeSeedBfs]] forward
    * expansion shared with graph_harmonic. */
  def graphBetweenness(s: SparkSession, dir: String): DataFrame = {
    val (frontiers, dagAt) = tradeSeedBfs(s, dir)
    betweennessBackward(frontiers, dagAt, 4)
  }

  /** Per-node triangle counts over an undirected edge list — the
    * local clustering signal (dense near-dup neighborhoods, community
    * cores) that complements [[connectedComponentsOn]]'s reachability
    * and [[graphPagerankOn]]'s centrality. Edges are canonicalized
    * and deduplicated once, then oriented low → high in the
    * (degree, node) total order — the Suri & Vassilvitskii "last
    * reducer" orientation (MapReduce triangle counting, WWW 2011):
    * every out-degree is bounded by O(sqrt(m)), so a hub's wedge set
    * is no longer deg² and no reduce task goes hot on a skewed graph.
    * Each triangle u<v<w (in that order) is enumerated EXACTLY ONCE
    * by the wedge join e1(u,v) |x| e2(u,w) |x| e3(v,w) — three equi-
    * joins keyed on node ids, no cross product; every node of the
    * triangle then gets one count. The oriented edge list
    * materializes eagerly (localCheckpoint) because the join tree
    * references it three times. The per-wedge (deg, node) comparison
    * needs the DESTINATION degree carried on each oriented edge —
    * one extra BIGINT per edge, the standard price of the
    * orientation. */
  def triangleCountOn(edges: DataFrame): DataFrame = {
    val Array(ca, cb) = edges.columns.take(2)
    val und = edges
      .select(least(col(ca), col(cb)).cast("long").as("a"),
        greatest(col(ca), col(cb)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val ed = und
      .join(deg.select(col("node").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("degb")), "b")
      .select(when(
        struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
        struct(col("a").as("u"), col("b").as("v"), col("degb").as("dv")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("v"), col("dega").as("dv")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .localCheckpoint(true)
    val tri = ed.as("e1")
      .join(ed.as("e2"),
        col("e1.u") === col("e2.u") &&
          struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v")))
      .join(ed.as("e3"),
        col("e1.v") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .orderBy("node")
  }

  /** Catalog form: triangles of the exact k-NN graph
    * ([[Similarity.simKnnJoinOn]], k = 3) — mutual-neighbor density
    * over the embedding corpus, the structure SemDeDup-style pruning
    * reads as "this neighborhood is one semantic clump". */
  def graphTriangles(s: SparkSession, dir: String): DataFrame =
    triangleCountOn(
      knnEdges(s, dir)
        .select("qid", "nid"))

  /** L18r: local clustering coefficient (Watts & Strogatz 1998) —
    * the per-node closure ratio CC(v) = 2T(v) / deg(v)(deg(v)−1)
    * that turns the triangle counts into the standard
    * neighborhood-density metric (the small-world signal; on the
    * k-NN graph it reads "how clique-like is this embedding
    * neighborhood"). Rides [[triangleCountOn]]'s skew-proof oriented
    * wedge join unchanged; degrees come from the same deduplicated
    * undirected edge relation; nodes with deg < 2 NULL-gate (no
    * wedge to close). The graph-wide mean over gated nodes rides the
    * 1-row broadcast. Exact integer milli end to end. */
  def clusteringCoeffOn(edges: DataFrame): DataFrame = {
    val Array(ca, cb) = edges.columns.take(2)
    val und = edges
      .select(least(col(ca), col(cb)).cast("long").as("a"),
        greatest(col(ca), col(cb)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val cc = deg
      .join(triangleCountOn(edges), Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .withColumn("cc_milli", expr(
        """CASE WHEN deg >= 2
          |  THEN (2000 * n_triangles) DIV (deg * (deg - 1)) END"""
          .stripMargin))
    val avg = cc.filter(col("deg") >= 2)
      .agg(expr("CAST(sum(cc_milli) DIV count(1) AS BIGINT)")
        .as("avg_cc_milli"))
    cc.crossJoin(broadcast(avg))
      .select("node", "deg", "n_triangles", "cc_milli", "avg_cc_milli")
      .orderBy("node")
  }

  /** Catalog form: the same k-NN graph as [[graphTriangles]] — the
    * two relations read side by side. */
  def graphClusteringCoeff(s: SparkSession, dir: String): DataFrame =
    clusteringCoeffOn(knnEdges(s, dir).select("qid", "nid"))

  private val minhashCcCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** Catalog form: components of the MinHash-verified near-dup pairs
    * (jac >= 0.8), i.e. the full Dedup rung chain
    * shingle -> minhash -> band -> verify -> cluster. Memoized per
    * (session, dir): dedup_clusters, dedup_apply, and
    * corpus_pipeline_full all consume this exact relation, and a
    * catalog run must pay the CC rounds once (the knnEdges
    * discipline). */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    memo(minhashCcCache, s, dir) {
      clustersOn(Dedup.dedupMinhashCached(s, dir).select("da", "db"))
        .localCheckpoint(true)
    }

  /** L2m: soft deduplication — down-WEIGHT near-duplicates instead
    * of dropping them (the SoftDedup idea: duplicates carry signal;
    * deleting all but one forfeits it, keeping all over-trains on
    * it — so give every member of a near-dup cluster sampling weight
    * 1/|cluster| and the cluster contributes exactly one document's
    * worth of expected mass to training): every document joins its
    * MinHash-verified near-dup component and gets weight_ppm =
    * 10⁶ DIV cluster_size; singletons keep full weight. One LEFT
    * join of the corpus spine against the MEMOIZED minhash-CC cluster
    * relation ([[dedupClusters]] — the shared
    * shingle→minhash→band→verify→CC chain, paid once per catalog
    * run; label identity across CC spellings is the alt-star
    * invariant the specs pin). Downstream, a
    * weighted sampler ([[Corpus.sampleWeightedOn]]'s shape) consumes
    * weight_ppm directly. */
  def corpusSoftDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select("doc_id")
      .join(dedupClusters(s, dir) // the memoized minhash-CC relation
          .select("doc_id", "cluster_id", "n_members"),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("n_members"), lit(1L)).as("cluster_size"),
        expr("CAST(1000000 DIV coalesce(n_members, 1) AS BIGINT)")
          .as("weight_ppm"))
      .orderBy("doc_id")

  /** Catalog form: the same clustering through the alternating-star
    * algorithm — identical output by construction (shared oracle),
    * O(log n) rounds on graphs whose diameter would stretch label
    * propagation. */
  def dedupClustersAltStar(s: SparkSession, dir: String): DataFrame =
    clustersOn(Dedup.dedupMinhashCached(s, dir).select("da", "db"),
      connectedComponentsAltStarOn(_))

  /** L2n: staged-dedup funnel accounting — the production pipeline
    * readout (RefinedWeb, Penedo et al. 2023 §3/Table 2, publishes
    * exactly this table: URL dedup, then exact-substring/hash, then
    * fuzzy, each charged only what it removes ON TOP of the earlier
    * rungs): stage 1 = URL-canonical dedup, stage 2 = exact content
    * hash over stage-1 survivors, stage 3 = MinHash-verified near-dup
    * components over what remains (keeper = min SURVIVING member per
    * component). Marginal yield is the decision variable — a fuzzy
    * rung that "removes 30%" standalone is worthless if exact hashing
    * already took those rows — and this op measures it directly.
    * Output: per stage n_in/n_removed/n_out, the stage's marginal
    * removed_ppm, and the cumulative corpus shrinkage. Counts are
    * 1-row broadcast scalars unioned into a 3-row report; the cluster
    * relation rides the shared memoized shingle→minhash→band→verify
    * chain and the O(log n) alternating-star CC. */
  def dedupStageFunnelOn(docs: DataFrame, urls: DataFrame,
      pairs: DataFrame): DataFrame = {
    val s1 = urls.withColumn("curl", Dedup.canonicalUrl(col("url")))
      .groupBy("curl").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").localCheckpoint(true)
    val s2 = docs.join(s1, "doc_id")
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").localCheckpoint(true)
    val lbl = clustersOn(pairs, connectedComponentsAltStarOn(_))
      .select(col("doc_id"), col("cluster_id"))
    val rem3 = s2.join(lbl, Seq("doc_id"))
      .groupBy("cluster_id").agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("r"))
    val cns = docs.agg(count(lit(1)).as("n0"))
      .crossJoin(s1.agg(count(lit(1)).as("n1")))
      .crossJoin(s2.agg(count(lit(1)).as("n2")))
      .crossJoin(rem3)
      .localCheckpoint(true) // read by all three report rows
    val rows = cns.select(lit(1L).as("stage_id"), lit("url").as("stage"),
        col("n0").as("n_in"), (col("n0") - col("n1")).as("n_removed"),
        col("n1").as("n_out"), col("n0"))
      .unionByName(cns.select(lit(2L).as("stage_id"),
        lit("exact").as("stage"), col("n1").as("n_in"),
        (col("n1") - col("n2")).as("n_removed"), col("n2").as("n_out"),
        col("n0")))
      .unionByName(cns.select(lit(3L).as("stage_id"),
        lit("near").as("stage"), col("n2").as("n_in"),
        col("r").as("n_removed"), (col("n2") - col("r")).as("n_out"),
        col("n0")))
    rows.select(col("stage_id"), col("stage"), col("n_in"),
        col("n_removed"), col("n_out"),
        expr("CAST(n_removed * 1000000 DIV n_in AS BIGINT)")
          .as("removed_ppm"),
        expr("CAST((n0 - n_out) * 1000000 DIV n0 AS BIGINT)")
          .as("cum_removed_ppm"))
      .orderBy("stage_id")
  }

  def dedupStageFunnel(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    dedupStageFunnelOn(docs, Dedup.syntheticUrlsOf(docs),
      Dedup.dedupMinhashCached(s, dir).select("da", "db"))
  }

  /** Catalog form (SemDeDup shape): components of the exact embedding
    * cosine pairs at cos >= 0.45 — semantic duplicate groups, one
    * keeper per group. Same propagation loop; only the edge source
    * differs (embedding-space neighbors instead of lexical shingle
    * overlap). Threshold note: at 0.4 this synthetic corpus's pair
    * graph degenerates into one ~1000-node chain (random vectors just
    * under the threshold everywhere) and min-label flooding needs ~11
    * rounds even with pointer jumping; 0.45 — the dedup_embedding_lsh
    * operating point — keeps the planted structure, converges in a
    * handful of rounds, and stays non-empty at every test sf (sf0.001
    * cosine ceiling is 0.479). Real semantic-dup graphs live at 0.9+
    * and are cliques, where the loop is 2-3 rounds regardless of
    * corpus size. */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame =
    clustersOn(
      Dedup.dedupEmbeddingCached(s, dir, threshold = 0.45)
        .select("da", "db"))
      .withColumnRenamed("doc_id", "vec_id")

  /** L2j: semantic-dedup THRESHOLD SWEEP — the cosine sibling of
    * [[clusterLinkageLadderOnPairs]], and the dashboard behind "which
    * cosine cut do we ship": for each cut of a fixed ladder, the
    * census of the near-dup graph at that threshold (pair count,
    * cluster count, clustered mass, largest cluster, retained share).
    * Raising the cut can only remove edges, so clustered mass and max
    * cluster size are monotone DECREASING up the ladder (the spec's
    * invariant — opposite sign to the distance ladder). All cuts
    * filter the ONE memoized corpus pair relation
    * ([[Dedup.dedupEmbeddingCached]] over Similarity.cosPairsCached),
    * and each cut's alternating-star CC + 1-row census materializes
    * as a CONCURRENT job chain (the linkage-ladder lesson: a fan of
    * independent iterative plans is driver-latency-bound run
    * sequentially). Cosines ride the corpus round(·,4) convention,
    * quantized to integer e4 (floor(cos·1e4 + 0.5): the 4-dp double
    * is within 1e-12 of the grid, so the +0.5 floor cannot straddle).
    *
    * Scale: at 100 TB the pair source swaps for the SemDeDup
    * within-cell relation ([[semanticPairsClusteredOn]]) — the sweep
    * itself adds only |cuts| CC runs on monotone-shrinking edge
    * subsets, each O(log n) rounds. */
  def dedupSemanticSweepOn(pairs: DataFrame, nPoints: DataFrame,
      cutsE4: Seq[Long] = Seq(4000L, 4500L, 5000L, 5500L),
      sourceThrE4: Long = 4000L): DataFrame = {
    require(cutsE4.nonEmpty && cutsE4.size <= 8,
      s"the cut ladder must be a small constant, got $cutsE4")
    // The pairs relation was generated AT a threshold; any cut below
    // it would census a graph silently truncated at the source cut.
    // The caller declares that source threshold so the coupling is a
    // checked contract, not a comment.
    require(cutsE4.min >= sourceThrE4,
      s"cut ladder min ${cutsE4.min} below the pair-source threshold " +
        s"$sourceThrE4 — the census would be silently truncated")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val p = pairs
      .select(col("da"), col("db"),
        floor(col("cos") * 10000 + 0.5).cast("long").as("c4"))
      .localCheckpoint(true) // one filter pass per cut
    val perCut = cutsE4.sorted.map { cut =>
      Future {
        val e = p.filter(col("c4") >= cut)
        val np = e.agg(count(lit(1)).as("n_pairs"))
        val cc = connectedComponentsAltStarOn(e.select("da", "db"))
        cc.groupBy("lbl").agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)).as("n_clusters"),
            coalesce(sum(col("sz")), lit(0L)).as("n_clustered"),
            coalesce(max(col("sz")), lit(1L)).as("max_cluster_size"))
          .crossJoin(broadcast(np))
          .withColumn("thr_e4", lit(cut))
          .localCheckpoint(true)
      }
    }.map(Await.result(_, Duration.Inf))
    perCut.reduce(_ unionByName _)
      .crossJoin(broadcast(nPoints))
      .select(col("thr_e4"), col("n_points"), col("n_pairs"),
        col("n_clusters"), col("n_clustered"),
        (col("n_points") - col("n_clustered")).as("n_singletons"),
        col("max_cluster_size"),
        expr("CAST(n_clustered * 1000000 DIV n_points AS BIGINT)")
          .as("pct_clustered_ppm"))
      .orderBy("thr_e4")
  }

  def dedupSemanticSweep(s: SparkSession, dir: String): DataFrame =
    dedupSemanticSweepOn(
      Dedup.dedupEmbeddingCached(s, dir, threshold = 0.40),
      Tables.embeddings(s, dir).agg(count(lit(1)).as("n_points")),
      sourceThrE4 = 4000L)

  /** Candidate near-dup edges the SemDeDup way (Abbas et al. 2023):
    * pair generation bounded INSIDE k-means cells — vectors are first
    * clustered ([[Similarity.kmeansOn]]), then cosine runs only
    * between same-cell vectors, so pair work is sum(cell^2) instead of
    * the corpus-quadratic all-pairs grid of
    * [[Dedup.dedupEmbeddingOn]]. The cell id is the equi-join key
    * (one shuffle keyed on cell; the shuffle_hash hint keeps the
    * scale-true shape instead of a test-size broadcast), so at 100 TB
    * each reduce task verifies one cell's pairs and no task ever sees
    * the whole corpus. Approximate by construction: a cross-cell
    * near-dup pair is unseen — the recall trade SemDeDup accepts, and
    * the spec quantifies on planted dups. Cell assignments come from
    * one eager pass (the k-means loop is already driver-coordinated);
    * the tiny (vec_id, cell) relation is checkpointed so the
    * self-join's two branches don't re-run Lloyd's. */
  def semanticPairsClusteredOn(emb: DataFrame, k: Int = 8, iters: Int = 2,
      threshold: Double = 0.45): DataFrame =
    semanticPairsFromCells(
      Similarity.kmeansOn(emb, k, iters)
        .select("vec_id", "cell").localCheckpoint(true),
      emb, threshold)

  /** Within-cell cosine pairs over a PRE-TRAINED (vec_id, cell)
    * assignment — the plan half of [[semanticPairsClusteredOn]], split
    * out so the catalog form can ride the memoized
    * [[Similarity.kmeansCached]] relation (same defaults) instead of
    * re-running Lloyd's. `cells` must be materialized (checkpointed)
    * by the caller: the self-join reads it on both branches. */
  def semanticPairsFromCells(cells: DataFrame, emb: DataFrame,
      threshold: Double = 0.45): DataFrame = {
    val ev = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), col("emb"), Similarity.norm2(col("emb")).as("nrm"))
      .join(cells, "vec_id")
    ev.as("l")
      .join(ev.as("r").hint("shuffle_hash"),
        col("l.cell") === col("r.cell") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("da"), col("r.vec_id").as("db"),
        round(Similarity.dot(col("l.emb"), col("r.emb")) /
          (col("l.nrm") * col("r.nrm")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Catalog form (true SemDeDup): components over within-cell cosine
    * pairs at the same 0.45 operating point as [[dedupSemantic]] —
    * the subquadratic sibling whose edge source scales. Cells come
    * from the memoized catalog k-means ([[Similarity.kmeansCached]],
    * identical defaults), so a catalog run trains Lloyd's once across
    * this query, cluster_kmeans, sim_ann_ivf_trained and the sampling
    * consumers. */
  def dedupSemanticClustered(s: SparkSession, dir: String): DataFrame =
    clustersOn(
      semanticPairsFromCells(
        Similarity.kmeansCached(s, dir).select("vec_id", "cell"),
        Tables.embeddings(s, dir)).select("da", "db"))
      .withColumnRenamed("doc_id", "vec_id")

  /** L10b: dedup APPLY — the corpus rewrite that consumes
    * [[clustersOn]]'s verdicts: every document that is either unique
    * (touched by no near-dup pair) or its cluster's keeper survives;
    * non-keeper members drop. Output carries n_merged (how many
    * originals each surviving row absorbs) so downstream mixing can
    * reweight. Shapes: one left-anti join against the (small)
    * non-keeper list + one left-outer join against the keeper list —
    * both keyed on doc_id, both a fraction of the corpus, so the
    * corpus itself crosses the wire once. This is the step that turns
    * the pair/cluster analytics into the actual deduplicated
    * training corpus. */
  def dedupApplyOn(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val dropped = clusters.filter(!col("is_keeper")).select("doc_id")
    val keepers = clusters.filter(col("is_keeper"))
      .select(col("doc_id"), col("n_members"))
    docs.join(dropped, Seq("doc_id"), "left_anti")
      .join(keepers, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("lang"), col("source"),
        coalesce(col("n_members"), lit(1L)).as("n_merged"),
        when(col("n_members").isNotNull, "keeper").otherwise("unique")
          .as("status"))
      .orderBy("doc_id")
  }

  def dedupApply(s: SparkSession, dir: String): DataFrame =
    dedupApplyOn(Tables.documents(s, dir), dedupClusters(s, dir))

  /** L18b: degree distribution — the first diagnostic run on any
    * corpus-derived graph (near-dup graphs, k-NN graphs, link
    * graphs): node-degree histogram of the undirected edge set. Two
    * chained map-side-combinable aggs (node -> deg, deg -> count):
    * the histogram is degree-bounded, the per-node relation is
    * node-bounded — both shard cleanly at any scale. Hub detection
    * here is what decides between the plain and degree-ordered
    * triangle paths ([[triangleCountOn]]). */
  def graphDegreesOn(edges: DataFrame): DataFrame = {
    val und = edges.select(least(col("qid"), col("nid")).as("a"),
      greatest(col("qid"), col("nid")).as("b")).distinct()
    und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
      .orderBy("deg")
  }

  def graphDegrees(s: SparkSession, dir: String): DataFrame =
    graphDegreesOn(
      knnEdges(s, dir)
        .select("qid", "nid"))

  /** Neighbor-set Jaccard of node pairs — the classic link-prediction
    * / role-similarity score: two nodes are alike when they touch the
    * same neighbors, whether or not they touch each other. Candidate
    * pairs come ONLY from wedges (pairs sharing at least one
    * neighbor, enumerated by the center-keyed self-join) — never all
    * pairs, so the work is sum-of-deg² like [[triangleCountOn]]'s
    * wedge stage and shares its skew remedy (a hub's wedge set is the
    * bottleneck; cap or degree-orient when the degree histogram
    * [[graphDegreesOn]] says so). Intersection = wedge count per
    * pair; union via the degree relation joined back — jac =
    * common / (deg_u + deg_v - common), the [[Dedup]] jac spelling on
    * adjacency sets instead of shingle sets. */
  def graphNeighborJaccardOn(edges: DataFrame,
      threshold: Double = 0.25): DataFrame = {
    val Array(ca, cb) = edges.columns.take(2)
    val und = edges
      .select(least(col(ca), col(cb)).cast("long").as("a"),
        greatest(col(ca), col(cb)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = und.select(explode(array(
        struct(col("a").as("node"), col("b").as("nb")),
        struct(col("b").as("node"), col("a").as("nb")))).as("p"))
      .select(col("p.node").as("node"), col("p.nb").as("nb"))
      .localCheckpoint(true)
    val deg = adj.groupBy("node").agg(count(lit(1)).as("deg"))
    val common = adj.as("x")
      .join(adj.as("y"),
        col("x.nb") === col("y.nb") && col("x.node") < col("y.node"))
      .groupBy(col("x.node").as("u"), col("y.node").as("v"))
      .agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"),
        (col("common").cast("double") /
          (col("du") + col("dv") - col("common"))).as("jac"))
      .filter(col("jac") >= threshold)
      .orderBy("u", "v")
  }

  /** Catalog form: neighbor similarity on the exact k-NN graph —
    * "these two vectors sit in the same semantic neighborhood", the
    * relation SemDeDup-style pruning and cluster-balanced sampling
    * both read. */
  def graphNeighborJaccard(s: SparkSession, dir: String): DataFrame =
    graphNeighborJaccardOn(
      knnEdges(s, dir)
        .select("qid", "nid"))

  /** L18g: Adamic–Adar link prediction (Adamic & Adar 2003) — scores
    * a non-adjacent pair by Σ 1/ln(deg(w)) over common neighbors w:
    * [[graphNeighborJaccardOn]] weighted so a RARE shared neighbor
    * counts more than a hub everyone touches (the standard
    * link-prediction baseline that Jaccard's flat count misses).
    * Same wedge self-join shape as Jaccard — the hub-degree cap
    * lever applies identically at scale. A common neighbor has edges
    * to both endpoints, so deg(w) >= 2 and ln is always positive;
    * each wedge contributes floor(1e6/ln(deg) + ½) — per-row double
    * math quantized at the row boundary — making the pair score an
    * order-free BIGINT sum both engines replay exactly. */
  def graphAdamicAdarOn(edges: DataFrame): DataFrame = {
    val Array(ca, cb) = edges.columns.take(2)
    val und = edges
      .select(least(col(ca), col(cb)).cast("long").as("a"),
        greatest(col(ca), col(cb)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = und.select(explode(array(
        struct(col("a").as("node"), col("b").as("nb")),
        struct(col("b").as("node"), col("a").as("nb")))).as("p"))
      .select(col("p.node").as("node"), col("p.nb").as("nb"))
      .localCheckpoint(true)
    val deg = adj.groupBy("node").agg(count(lit(1)).as("deg"))
    // deg-1 nodes cannot be common neighbors (a wedge needs edges to
    // both endpoints) — drop them BEFORE the weight projection so
    // ln(1) = 0 never reaches the division under ANSI mode
    val wNb = deg.filter(col("deg") >= 2).select(col("node").as("nb"),
      floor(lit(1000000.0) / log(col("deg").cast("double")) + lit(0.5))
        .as("w_micro"))
    adj.as("x")
      .join(adj.as("y"),
        col("x.nb") === col("y.nb") && col("x.node") < col("y.node"))
      // node-keyed equi-join (NOT a broadcast: the degree relation is
      // node-cardinality — AQE may still broadcast it when small)
      .join(wNb, col("x.nb") === wNb("nb"))
      .groupBy(col("x.node").as("u"), col("y.node").as("v"))
      .agg(count(lit(1)).as("n_common"), sum(col("w_micro")).as("aa_micro"))
      .orderBy("u", "v")
  }

  def graphAdamicAdar(s: SparkSession, dir: String): DataFrame =
    graphAdamicAdarOn(
      knnEdges(s, dir)
        .select("qid", "nid"))

  /** Synchronous label propagation (Raghavan et al. 2007), `rounds`
    * fixed rounds — community detection, the MIDDLE ground between
    * [[connectedComponentsOn]] (pure reachability: one bridge edge
    * merges two dense groups) and [[triangleCountOn]] (purely local
    * density): labels flow to the neighbor-majority, so dense groups
    * converge to one label while a single bridge edge cannot pull
    * two communities together. Determinism (LPA is notoriously
    * order-sensitive) is forced by two choices: SYNCHRONOUS rounds
    * (all nodes update from the same previous labeling — no
    * sequential drift) and an ordered argmax (max count, then min
    * label — spelled max(struct(cnt, -lbl)), the exact mirror of the
    * oracle's ORDER BY cnt DESC, lbl). Bounded rounds are the
    * production spelling (GraphFrames' LPA caps maxIter the same
    * way; the algorithm oscillates rather than converges on
    * bipartite-ish graphs). Each round is one adjacency join + one
    * (node, lbl) count + one per-node argmax — all keyed on node id,
    * map-side combined, the same shuffle shape as every other rung
    * here; localCheckpoint per round keeps the plan constant. */
  def labelPropagationOn(edges: DataFrame, rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val Array(ca, cb) = edges.columns.take(2)
    val und = edges
      .select(least(col(ca), col(cb)).cast("long").as("a"),
        greatest(col(ca), col(cb)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = und.select(explode(array(
        struct(col("a").as("node"), col("b").as("nb")),
        struct(col("b").as("node"), col("a").as("nb")))).as("p"))
      .select(col("p.node").as("node"), col("p.nb").as("nb"))
      .localCheckpoint(true)
    var labels = adj.select(col("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.select(col("node").as("nb"), col("lbl")), "nb")
        .groupBy("node", "lbl").agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("lbl"))
        .localCheckpoint(true)
    }
    labels.select(col("node"), col("lbl").as("community"))
      .orderBy("node")
  }

  def graphCommunities(s: SparkSession, dir: String): DataFrame =
    labelPropagationOn(
      knnEdges(s, dir)
        .select("qid", "nid"))

  /** L18u: per-community CONDUCTANCE — the cut-quality readout that
    * complements [[graphModularityOn]]'s global score (Kannan, Vempala
    * & Vetta 2004; Leskovec et al. 2009's NCP plots made it THE
    * community-quality measure): φ(S) = cut(S) / min(vol(S), 2m −
    * vol(S)) per community, exact ppm — low φ = a real module, high φ
    * = a label that leaks. Communities are [[labelPropagationOn]]'s
    * labels; an LPA label that leaks half its edges is exactly what
    * this catches before anyone trusts the clustering downstream.
    *
    * Exact integers: cut and volume are edge counts (each cross edge
    * charges BOTH sides; volume counts internal edges twice via the
    * endpoint explode), one truncating DIV at the ppm boundary,
    * NULL-gated for isolated communities. Shape: one label join pair
    * over the undirected edge relation, two label-keyed rollups, a
    * broadcast 2m scalar — nothing beyond the edge pass scales. */
  def graphConductanceOn(edges: DataFrame, labels: DataFrame): DataFrame = {
    val Array(ca, cb) = edges.columns.take(2)
    val und = edges
      .select(least(col(ca), col(cb)).cast("long").as("a"),
        greatest(col(ca), col(cb)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val lab = labels.select(col("node").cast("long").as("node"),
      col("community").cast("long").as("c"))
    val e2 = und
      .join(lab.select(col("node").as("a"), col("c").as("cla")), "a")
      .join(lab.select(col("node").as("b"), col("c").as("clb")), "b")
      .localCheckpoint(true) // total + volume + cut passes
    val tot = e2.agg((count(lit(1)) * 2).as("vol_total"))
    val vol = e2.select(explode(array(col("cla"), col("clb"))).as("c"))
      .groupBy("c").agg(count(lit(1)).as("vol"))
    val cut = e2.filter(col("cla") =!= col("clb"))
      .select(explode(array(col("cla"), col("clb"))).as("c"))
      .groupBy("c").agg(count(lit(1)).as("cut"))
    lab.groupBy("c").agg(count(lit(1)).as("n_nodes"))
      .join(vol, Seq("c"), "left")
      .join(cut, Seq("c"), "left")
      .crossJoin(broadcast(tot))
      .select(col("c").as("community"), col("n_nodes"),
        coalesce(col("vol"), lit(0L)).as("vol"),
        coalesce(col("cut"), lit(0L)).as("cut"),
        col("vol_total"))
      .select(col("community"), col("n_nodes"), col("vol"), col("cut"),
        expr("""CAST(CASE WHEN least(vol, vol_total - vol) > 0
               |  THEN cut * 1000000 DIV least(vol, vol_total - vol)
               |END AS BIGINT)""".stripMargin).as("phi_ppm"))
      .orderBy("community")
  }

  /** Catalog form: conductance of the LPA communities over the same
    * k-NN similarity graph — the two relations read side by side
    * (modularity scores the PARTITION, conductance each COMMUNITY). */
  def graphConductance(s: SparkSession, dir: String): DataFrame =
    graphConductanceOn(knnEdges(s, dir).select("qid", "nid"),
      graphCommunities(s, dir))

  /** k-core decomposition (the `k`-core): iteratively peel nodes of
    * degree < k until a fixpoint — the standard "dense part of the
    * graph" extraction (spam rings, tightly-coupled near-dup hubs,
    * community cores survive; tendrils and chains peel away). A
    * genuinely different iterative shape from the label loops: the
    * state is the EDGE SET, shrinking monotonically, and a round is
    * one degree count + two anti-joins against the weak-node set —
    * all node-keyed, map-side combined. localCheckpoint per round
    * keeps the plan constant; `maxIter` throws rather than returning
    * a half-peeled graph (the [[connectedComponentsOn]] discipline).
    * Peeling is idempotent at the fixpoint, so the oracle's fixed
    * unroll of [[KcoreRounds]] rounds equals the engine's converged
    * result whenever the engine converges within that many rounds —
    * the throw enforces exactly that. Output: the surviving nodes
    * with their degree INSIDE the core. */
  def kcoreOn(edges: DataFrame, k: Int = KcoreK,
      maxIter: Int = KcoreRounds): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val Array(ca, cb) = edges.columns.take(2)
    var e = edges
      .select(least(col(ca), col(cb)).cast("long").as("a"),
        greatest(col(ca), col(cb)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var iter = 0
    var weakCount = 1L
    while (weakCount > 0) {
      if (iter >= maxIter)
        throw new IllegalStateException(
          s"k-core peel did not converge in $maxIter rounds")
      iter += 1
      val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val weak = deg.filter(col("deg") < k).select("node")
        .localCheckpoint(true)
      weakCount = weak.count()
      if (weakCount > 0)
        e = e
          .join(weak.select(col("node").as("a")), Seq("a"), "left_anti")
          .join(weak.select(col("node").as("b")), Seq("b"), "left_anti")
          .localCheckpoint(true)
    }
    e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("core_deg"))
      .orderBy("node")
  }

  val KcoreRounds = 6

  /** Core threshold for the catalog form. The kNN-3 graph is
    * degenerate for coring — its degrees are so uniform that the
    * 3-core keeps everything and the 4-core cascades to empty — so
    * the catalog peels the bipartite trade graph instead, whose
    * power-law-ish degrees give the peel an actual gradient. */
  val KcoreK = 4

  def graphKcore(s: SparkSession, dir: String): DataFrame =
    kcoreOn(bipartiteEdges(s, dir))

  val TrussRounds = 6
  val TrussK = 3

  /** k-truss decomposition (Cohen 2008; the triangle-support sibling
    * of [[kcoreOn]]'s degree peel): iteratively delete edges whose
    * SUPPORT — the number of triangles they close — is below k−2,
    * until a fixpoint. Where the k-core keeps "nodes with enough
    * neighbors", the truss keeps "edges with enough MUTUAL neighbors"
    * — the standard cohesive-subgraph extraction one tier stronger
    * than coring (every k-truss is inside the (k−1)-core but not vice
    * versa); on the kNN graph it isolates neighborhoods that are
    * mutually-confirming semantic clumps rather than hub spokes.
    *
    * Per round: one degree-oriented triangle enumeration (the
    * [[triangleCountOn]] low-to-high orientation, so wedge fanout is
    * O(sqrt m) per node on skewed graphs, not deg²), an edge-keyed
    * support rollup (each triangle charges its three normalized
    * edges), and one inner join that keeps qualifying edges. The
    * state is the shrinking EDGE SET, localCheckpointed per round for
    * a constant-size plan; `maxIter` throws rather than returning a
    * half-peeled graph, which also licenses the oracle's fixed
    * [[TrussRounds]]-round unroll (peeling is idempotent at the
    * fixpoint — the kcore discipline). Output: surviving edges with
    * their support inside the truss. */
  def trussOn(edges: DataFrame, k: Int = TrussK,
      maxIter: Int = TrussRounds): DataFrame = {
    require(k >= 3, s"need k >= 3, got $k")
    val Array(ca, cb) = edges.columns.take(2)
    def supportOf(e: DataFrame): DataFrame = {
      val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val ed = e
        .join(deg.select(col("node").as("a"), col("deg").as("dega")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("degb")), "b")
        .select(when(
          struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("degb").as("dv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"),
            col("dega").as("dv"))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"),
          col("e.dv").as("dv"))
        .localCheckpoint(true) // referenced three times by the wedge join
      ed.as("e1")
        .join(ed.as("e2"), col("e1.u") === col("e2.u") &&
          struct(col("e1.dv"), col("e1.v"))
            < struct(col("e2.dv"), col("e2.v")))
        .join(ed.as("e3"),
          col("e1.v") === col("e3.u") && col("e2.v") === col("e3.v"))
        .select(col("e1.u").as("x"), col("e1.v").as("y"),
          col("e2.v").as("z"))
        .select(explode(array(
          struct(least(col("x"), col("y")).as("a"),
            greatest(col("x"), col("y")).as("b")),
          struct(least(col("x"), col("z")).as("a"),
            greatest(col("x"), col("z")).as("b")),
          struct(least(col("y"), col("z")).as("a"),
            greatest(col("y"), col("z")).as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("sup"))
    }
    var e = edges
      .select(least(col(ca), col(cb)).cast("long").as("a"),
        greatest(col(ca), col(cb)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var n = e.count()
    var iter = 0
    var removed = 1L
    while (removed > 0 && n > 0) {
      if (iter >= maxIter)
        throw new IllegalStateException(
          s"k-truss peel did not converge in $maxIter rounds")
      iter += 1
      val kept = e.join(supportOf(e), Seq("a", "b"))
        .filter(col("sup") >= k - 2)
        .select("a", "b")
        .localCheckpoint(true)
      val keptN = kept.count()
      removed = n - keptN
      n = keptN
      e = kept
    }
    // fixpoint support readout (all surviving edges qualify by
    // construction, so the join keeps every row)
    e.join(supportOf(e), Seq("a", "b"))
      .select(col("a"), col("b"), col("sup"))
      .orderBy("a", "b")
  }

  def graphTruss(s: SparkSession, dir: String): DataFrame =
    trussOn(knnEdges(s, dir).select("qid", "nid"))

  /** Newman modularity decomposition of a labeling — the evaluation
    * rung for [[labelPropagationOn]]: per community c, the intra-edge
    * count e_c, the degree mass d_c, and the exact integer numerator
    * 4·m·e_c − d_c² of its modularity contribution (the full score is
    * Q = Σ_c (4·m·e_c − d_c²) / (4·m²), every term exact BIGINT).
    * The DIVISION deliberately stays OUT of the relation: the
    * numerator can be negative, and negative integer division
    * truncates toward zero in Spark but floors in DuckDB — emitting
    * the exact numerator sidesteps the one cross-engine semantic the
    * repo cannot pin (same discipline as keeping raw ns timestamps
    * out of outputs). At web scale swap BIGINT for DECIMAL(38,0):
    * 4·m·e_c overflows 64 bits once m exceeds ~2^31 edges. Shape:
    * two broadcast-scalar joins and two node-keyed aggregates. */
  def modularityOn(edges: DataFrame, labels: DataFrame): DataFrame = {
    val Array(ca, cb) = edges.columns.take(2)
    val und = edges
      .select(least(col(ca), col(cb)).cast("long").as("a"),
        greatest(col(ca), col(cb)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val Array(cn, cl) = labels.columns.take(2)
    val lab = labels.select(col(cn).cast("long").as("node"),
      col(cl).cast("long").as("community"))
    val mRel = und.agg(count(lit(1)).as("m"))
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val dSum = lab.join(deg, "node")
      .groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("deg_sum"))
    val intra = und
      .join(lab.select(col("node").as("a"), col("community").as("c1")), "a")
      .join(lab.select(col("node").as("b"), col("community").as("c2")), "b")
      .filter(col("c1") === col("c2"))
      .groupBy(col("c1").as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    dSum.join(intra, Seq("community"), "left")
      .crossJoin(broadcast(mRel))
      .select(col("community"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("deg_sum"),
        (lit(4L) * col("m") * coalesce(col("intra_edges"), lit(0L)) -
          col("deg_sum") * col("deg_sum")).as("contrib_num"))
      .orderBy("community")
  }

  def graphModularity(s: SparkSession, dir: String): DataFrame = {
    val edges = knnEdges(s, dir)
      .select("qid", "nid").localCheckpoint(true)
    modularityOn(edges, labelPropagationOn(edges))
  }

  /** L16: end-to-end entity resolution — the composed record-linkage
    * pipeline every MDM/dedup system runs, wired from rungs the
    * library already ships: sorted-neighborhood BLOCKING (rank window
    * over a similarity-preserving sort key, candidates linear in n —
    * [[Dedup.dedupSortedNeighborhoodOn]]'s shape), pairwise VERIFY
    * (same-group + edit-distance <= 1, evaluated only on in-window
    * pairs), [[connectedComponentsOn]] transitive CLOSURE, and a
    * SURVIVORSHIP rule (canonical id = min member, surviving balance
    * = max over the cluster — the "best value wins" merge).
    *
    * Scale: blocking is the 100 TB lever — candidates are
    * (window-1) * n EQUI-join rows on rank, never a name cross-join;
    * ranks come from the range-partitioned dense-id helper (no
    * single-partition window); the verify predicate runs map-side on
    * each candidate row; CC rounds are bounded by entity diameter
    * (near-clique, 2-3). Levenshtein cost is bounded by the window,
    * not the corpus. Output: one row per RESOLVED entity (clusters
    * of >= 2 records — singletons are already canonical). */
  /** The blocking + verify stage of [[erResolveOn]], exposed so its
    * plan shape (equi-join on rank, map-side levenshtein) is pinnable
    * independently of the eager CC loop downstream. */
  def erPairsOn(records: DataFrame, window: Int = 4): DataFrame = {
    val ranked = graft.operators.Windows.denseIdsOn(
      records.select("rid", "name", "grp"), Seq("name", "rid"))
    val probes = ranked.select(col("rid").as("pa"), col("name").as("na"),
      col("grp").as("ga"),
      explode(array((1 until window).map(k =>
        col("dense_id") + k): _*)).as("ridx"))
    probes
      .join(ranked.select(col("rid").as("pb"), col("name").as("nb"),
        col("grp").as("gb"), col("dense_id").as("ridx")), "ridx")
      .filter(col("ga") === col("gb") &&
        levenshtein(col("na"), col("nb")) <= 1)
      .select(least(col("pa"), col("pb")).as("da"),
        greatest(col("pa"), col("pb")).as("db"))
  }

  /** Closure runs on the O(log n)-round alternating-star CC: ER
    * components are near-cliques, but the generated name distribution
    * makes min-label propagation's round count bimodal (PERF.md:
    * 1.8-9.5 s across rounds); the star contraction bounds rounds
    * deterministically. Labels are identical (component min) — see
    * the equality spec in ClustersSpec. */
  def erResolveOn(records: DataFrame, window: Int = 4): DataFrame =
    erResolveFromClusters(
      clustersOn(erPairsOn(records, window), connectedComponentsAltStarOn(_)),
      records)

  private def erResolveFromClusters(clusters: DataFrame,
      records: DataFrame): DataFrame =
    clusters
      .join(records.select(col("rid").as("doc_id"), col("bal")), "doc_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"), max(col("bal")).as("surviving_bal"))

  private val erCcCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** The catalog entity records — customers as ER input (name = match
    * string, nation = hard block, balance = survivorship value). */
  private def erCustomerRecords(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey").as("rid"), col("c_name").as("name"),
        col("c_nationkey").as("grp"), col("c_acctbal").as("bal"))

  /** The resolved ER cluster relation (blocking-window pairs +
    * alt-star CC) over the catalog customer records, memoized per
    * (session, dir): er_pipeline and er_golden_record both consume
    * this exact relation, so a catalog run pays the blocking window,
    * the levenshtein verify and the CC rounds once. */
  private[graft] def erClustersCached(s: SparkSession, dir: String): DataFrame =
    memo(erCcCache, s, dir) {
      clustersOn(erPairsOn(erCustomerRecords(s, dir)),
        connectedComponentsAltStarOn(_)).localCheckpoint(true)
    }

  /** L15c: one synchronous Louvain refinement round (the parallel
    * variant of Louvain's inner loop — Blondel et al. 2008; Staudt &
    * Meyerhenke 2016 for the synchronous-moves form) on top of the
    * LPA communities: every node evaluates, against the CURRENT
    * labeling, the modularity gain of joining each neighboring
    * community and takes the argmax when it is strictly positive.
    *
    * The gain is kept as the exact INTEGER numerator of ΔQ·4m²'s
    * node-relevant part, 2m·k_in(c) − k_i·Σ'_tot(c) (Σ' excludes the
    * node itself when c is its own community) — no floats, ties break
    * to the smaller community label, both engines replay bit-for-bit.
    * The "stay" option is always a candidate (k_in possibly 0), so a
    * node never moves on a negative gain differential.
    *
    * Shapes: neighbor-community tallies are one (node, community)
    * hash aggregate over the adjacency; Σ_tot is a community-keyed
    * aggregate joined back broadcast-sized; the argmax is one window
    * over each node's ≤ degree candidates. One synchronous round =
    * one pass over the edges — the unit Louvain repeats until quiet;
    * emitting the per-node gain makes the convergence measurable
    * in-catalog. */
  def graphLouvainMoveOn(edges: DataFrame): DataFrame = {
    val Array(ca, cb) = edges.columns.take(2)
    val und = edges
      .select(least(col(ca), col(cb)).cast("long").as("a"),
        greatest(col(ca), col(cb)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val adj = und.select(explode(array(
        struct(col("a").as("node"), col("b").as("nb")),
        struct(col("b").as("node"), col("a").as("nb")))).as("p"))
      .select(col("p.node").as("node"), col("p.nb").as("nb"))
    val deg = adj.groupBy("node").agg(count(lit(1)).as("k"))
    val mRel = und.agg(count(lit(1)).as("m"))
    val lab = labelPropagationOn(und).select(col("node"),
      col("community").as("own"))
      .localCheckpoint(true)
    val kin = adj
      .join(lab.select(col("node").as("nb"), col("own").as("c")), "nb")
      .groupBy("node", "c").agg(count(lit(1)).as("k_in"))
    val sigma = lab.join(deg, "node")
      .groupBy(col("own").as("c")).agg(sum(col("k")).as("sigma_tot"))
    // candidates = neighbor communities ∪ the stay option (k_in 0)
    val cand = kin
      .unionByName(lab.select(col("node"), col("own").as("c"),
        lit(0L).as("k_in")))
      .groupBy("node", "c").agg(max(col("k_in")).as("k_in"))
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy("node").orderBy(col("gain_num").desc, col("c").asc)
    cand
      .join(lab, "node").join(deg, "node")
      .join(sigma, "c").crossJoin(broadcast(mRel))
      .select(col("node"), col("own"), col("c"),
        (lit(2L) * col("m") * col("k_in") - col("k") *
          (col("sigma_tot") -
            when(col("c") === col("own"), col("k")).otherwise(lit(0L))))
          .as("gain_num"))
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("node"), col("own").as("old_label"),
        col("c").as("new_label"), col("gain_num"))
      .orderBy("node")
  }

  def graphLouvainMove(s: SparkSession, dir: String): DataFrame =
    graphLouvainMoveOn(knnEdges(s, dir)
      .select("qid", "nid"))

  /** L16b: golden-record construction — the full per-ATTRIBUTE
    * survivorship pass MDM systems run after [[erResolveOn]]'s
    * clustering (er_pipeline keeps one "best value"; real survivorship
    * applies a rule per column): canonical id = min member id, name =
    * longest-then-lexicographic (completeness rule), group = mode with
    * ties to the smaller key (consensus rule), balance = max (recency/
    * best-value rule). Each rule is a window or aggregate keyed by
    * cluster_id — one member-keyed shuffle feeds them all; every rule
    * picks an EXISTING value (no arithmetic), so doubles pass through
    * bit-identical and the oracle replays exactly. */
  def erGoldenRecordOn(records: DataFrame, window: Int = 4): DataFrame =
    erSurvivorshipOn(
      clustersOn(erPairsOn(records, window),
        connectedComponentsAltStarOn(_)), // O(log n) rounds, same labels
      records)

  /** The survivorship pass of [[erGoldenRecordOn]] over a
    * pre-resolved cluster relation — split out so the catalog form
    * rides [[erClustersCached]]. */
  private def erSurvivorshipOn(clusters: DataFrame,
      records: DataFrame): DataFrame = {
    val mem = clusters
      .join(records.select(col("rid").as("doc_id"), col("name"),
        col("grp"), col("bal")), "doc_id")
      .localCheckpoint(true) // feeds three survivorship branches
    val wName = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(length(col("name")).desc, col("name").asc)
    val nm = mem.withColumn("rk", row_number().over(wName))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("name").as("surviving_name"))
    val wMode = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("cnt").desc, col("grp").asc)
    val gm = mem.groupBy("cluster_id", "grp").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(wMode))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("grp").as("surviving_grp"))
    mem.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        min(col("doc_id")).as("canonical_id"),
        max(col("bal")).as("surviving_bal"))
      .join(nm, "cluster_id").join(gm, "cluster_id")
      .select("cluster_id", "n_members", "canonical_id", "surviving_name",
        "surviving_grp", "surviving_bal")
      .orderBy("cluster_id")
  }

  def erGoldenRecord(s: SparkSession, dir: String): DataFrame =
    erSurvivorshipOn(erClustersCached(s, dir), erCustomerRecords(s, dir))

  /** L16e: blocking-recall evaluation of the sorted-neighborhood
    * stage — the pairs-completeness audit (Christen 2012's blocking
    * evaluation methodology) behind every "is the SNM window big
    * enough?" decision: ground truth is the EXACT within-group match
    * set (grp equi-join + levenshtein ≤ 1 — group-keyed, never a
    * global cross product), each true pair carries its sort-RANK
    * distance under the same (name, rid) key the blocker uses, and
    * the whole window sweep then reads off ONE distance relation —
    * recall(w) = share of true pairs with rank distance < w, i.e.
    * the sweep costs one truth join total, not one blocking run per
    * window. n_candidates is the closed-form (w−1)·n − w(w−1)/2
    * candidate volume, the cost axis of the recall/cost trade. SNM
    * verify is a subset of truth by construction, so precision is
    * identically 1 and recall is the whole story. */
  def erBlockingEvalOn(records: DataFrame,
      windows: Seq[Int] = Seq(2, 3, 4, 6, 8)): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 2),
      s"need windows >= 2, got $windows")
    val ranked = graft.operators.Windows.denseIdsOn(
      records.select("rid", "name", "grp"), Seq("name", "rid"))
      .localCheckpoint(true) // both truth sides + the n scalar
    val n = ranked.agg(count(lit(1)).as("n"))
    // Truth via deletion-variant blocking (the join_fuzzy theorem:
    // lev(x,y) <= 1 ONLY IF the variant sets intersect — a lossless
    // prefilter), so the within-group pair join is a (grp, variant)
    // EQUI-join and the exact levenshtein verifies only the few
    // colliding candidates — never the O(group²) all-pairs scan.
    val vx = ranked.select(col("rid"), col("grp"), col("name"),
      col("dense_id"), explode(Fuzzy.variants(col("name"))).as("v"))
    val truth = vx.as("x").join(vx.as("y"),
        col("x.grp") === col("y.grp") && col("x.v") === col("y.v") &&
          col("x.rid") < col("y.rid"))
      .select(col("x.rid").as("ra"), col("y.rid").as("rb"),
        col("x.name").as("na"), col("y.name").as("nb"),
        col("x.dense_id").as("da"), col("y.dense_id").as("db"))
      .distinct()
      .filter(levenshtein(col("na"), col("nb")) <= 1)
      .select(abs(col("da") - col("db")).as("dist"))
      .localCheckpoint(true) // one conditional-sum pass per window
    val per = windows.map { w =>
      truth.agg(count(lit(1)).as("n_truth"),
          coalesce(sum(when(col("dist") < w, 1L).otherwise(0L)), lit(0L))
            .as("n_found"))
        .withColumn("win_size", lit(w))
    }.reduce(_ unionByName _)
    per.crossJoin(broadcast(n))
      .select(col("win_size"), col("n_truth"), col("n_found"),
        expr("CAST((least(win_size, n) - 1) * n" +
          " - least(win_size, n) * (least(win_size, n) - 1) DIV 2" +
          " AS BIGINT)").as("n_candidates"),
        expr("""CASE WHEN n_truth > 0 THEN
               |  CAST(n_found * 1000000 DIV n_truth AS BIGINT)
               |END""".stripMargin).as("recall_ppm"))
      .orderBy("win_size")
  }

  def erBlockingEval(s: SparkSession, dir: String): DataFrame =
    erBlockingEvalOn(Tables.customer(s, dir)
      .select(col("c_custkey").as("rid"), col("c_name").as("name"),
        col("c_nationkey").as("grp")))

  /** Catalog wrapper: customers as entity records — name as the match
    * string, nation as the hard block, account balance as the
    * survivorship value. */
  def erPipeline(s: SparkSession, dir: String): DataFrame =
    erResolveFromClusters(erClustersCached(s, dir),
      erCustomerRecords(s, dir))
      .orderBy("cluster_id")

  /** Walk length for [[graphRandomWalkOn]] — bounded and unrolled, so
    * the plan is linear in it (DeepWalk uses 40+; 4 keeps the oracle
    * replay tractable while exercising the full join shape). */
  val WalkSteps = 4

  /** L18n: deterministic DeepWalk-style walk corpus (Perozzi et al.,
    * KDD 2014) — the graph-embedding training-data generator: one
    * walk per node, each step moving to a pseudo-randomly chosen
    * neighbor. "Random" is a derandomized LCG draw
    *   r(w, k) = (w·1103515245 + k·12345 + 6789) mod 2³¹,
    * next = neighbor ranked r mod degree — the dedup_minhash seeding
    * discipline: both engines replay the identical walk, no RNG state.
    *
    * Scale shape: the neighbor relation carries a per-source dense
    * rank (one keyed window), degrees are a slim (src, deg) rollup,
    * and each of the [[WalkSteps]] unrolled rounds is TWO equi-joins —
    * frontier⋈degs on the node to form the rank draw, then
    * frontier⋈neighbors on (node, rank) to move. Nothing ever
    * materializes a hub's full adjacency against the frontier: the
    * (node, rank) key selects exactly ONE neighbor row per walk per
    * step, so a power-law hub costs the same as a leaf. Frontier size
    * is constant (|V|), rounds are bounded — the classic bounded-
    * iteration Pregel shape, same tier as [[graphPagerankOn]]. */
  def graphRandomWalkOn(edges: DataFrame, steps: Int = WalkSteps): DataFrame = {
    require(steps >= 1, s"need steps >= 1, got $steps")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
      col(cd).cast("long").as("dst")).distinct()
    val wN = Window.partitionBy("src").orderBy("dst")
    val nbrs = e
      .withColumn("rn", row_number().over(wN).cast("long") - 1)
      .localCheckpoint(true) // read once per unrolled step
    val degs = nbrs.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    var frontier = degs.select(col("src").as("walk_id"))
      .withColumn("node", col("walk_id"))
    var out = frontier.withColumn("step", lit(0L))
    for (k <- 1 to steps) {
      val draw = frontier
        .join(degs, frontier("node") === degs("src"))
        .select(col("walk_id"), col("node"),
          expr(s"((walk_id * 1103515245 + $k * 12345 + 6789) " +
            "% 2147483648) % deg").as("rnk"))
      frontier = draw.join(nbrs,
          draw("node") === nbrs("src") && draw("rnk") === nbrs("rn"))
        .select(col("walk_id"), col("dst").as("node"))
        .localCheckpoint(true) // each union branch would otherwise
        // re-derive every earlier step's draw chain
      out = out.union(frontier.withColumn("step", lit(k.toLong)))
    }
    out.select("walk_id", "step", "node")
  }

  /** Catalog form: walks over the undirected customer–supplier trade
    * graph (same edge relation as [[graphPagerank]]; every node has
    * degree ≥ 1 in it, so walks never dead-end). The dump orderBy
    * lives HERE, not in the library form — consumers like
    * [[graphSkipgramPairs]] feed the sort-free relation to joins. */
  private val walkCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** The uniform walk corpus, memoized per (session, dir) — BOTH
    * catalog consumers (graph_random_walk itself and the skip-gram
    * pair extractor) read this relation, so a catalog run pays the
    * unrolled walk chain once (the r6-verdict shared-subtree rule;
    * each query independently re-derived a ~4 s walk before). */
  private def randomWalkCached(s: SparkSession, dir: String): DataFrame =
    memo(walkCache, s, dir) {
      graphRandomWalkOn(bipartiteEdges(s, dir)).localCheckpoint(true)
    }

  def graphRandomWalk(s: SparkSession, dir: String): DataFrame =
    randomWalkCached(s, dir).orderBy("walk_id", "step")

  /** Integer node2vec weights for [[graphNode2vecWalkOn]] —
    * return/common/forward = 1/2/4, i.e. p = 2, q = 1/2 in node2vec
    * terms (explore-leaning), kept as exact integers so the
    * cumulative-weight draw needs no float normalization. */
  val N2vReturnW = 1L
  val N2vCommonW = 2L
  val N2vForwardW = 4L

  /** L18o: node2vec second-order biased walks (Grover & Leskovec, KDD
    * 2016) — the walk corpus with the return/explore dial: a step
    * from `cur` (having arrived from `prev`) weights each neighbor x
    * by its distance to prev — 1 for going back (x = prev), 2 for
    * staying in the triangle (edge prev–x exists), 4 for leaving the
    * neighborhood. The draw is the same derandomized LCG as
    * [[graphRandomWalkOn]], landed on the CUMULATIVE weight line:
    * next = the unique candidate with cumw − w ≤ r mod Σw < cumw.
    *
    * Scale shape per unrolled step: frontier⋈neighbors on the current
    * node (this one, unlike the uniform walk, DOES materialize the
    * frontier's adjacency — inherent to second-order bias, the same
    * cost node2vec's alias tables pay in preprocessing), a LEFT
    * equi-join against the edge set on (prev, x) to classify, and
    * one walk-keyed window for the cumulative line — candidate rows
    * per step are Σ deg(cur), bounded by |E|, never deg². The first
    * step has prev = start, so every candidate classifies as
    * "common" and the draw is uniform — no special case. */
  def graphNode2vecWalkOn(edges: DataFrame, steps: Int = 3): DataFrame = {
    require(steps >= 1, s"need steps >= 1, got $steps")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
      col(cd).cast("long").as("dst")).distinct()
      .localCheckpoint(true) // read by every step's move and classify
    var frontier = e.select(col("src").as("walk_id")).distinct()
      .select(col("walk_id"), col("walk_id").as("prev"),
        col("walk_id").as("cur"))
    var out = frontier.select(col("walk_id"), lit(0L).as("step"),
      col("cur").as("node"))
    // ONE window spec (partition+order shared) so cumw and tot land
    // in the SAME WindowExec pass — tot's frame is unbounded-both,
    // order-insensitive, and a separate orderless spec would cost a
    // second window operator over the candidate relation per step
    val wC = Window.partitionBy("walk_id").orderBy("dst")
    for (k <- 1 to steps) {
      val cand = frontier
        .join(e, frontier("cur") === e("src"))
        .select(col("walk_id"), col("prev"), col("cur"), col("dst"))
      val ep = e.select(col("src").as("p_src"), col("dst").as("p_dst"))
      val weighted = cand
        .join(ep, cand("prev") === ep("p_src") &&
          cand("dst") === ep("p_dst"), "left")
        .select(col("walk_id"), col("cur"), col("dst"),
          when(col("dst") === col("prev"), lit(N2vReturnW))
            .when(col("p_src").isNotNull, lit(N2vCommonW))
            .otherwise(lit(N2vForwardW)).as("w"))
      val drawn = weighted
        .withColumn("cumw", sum(col("w"))
          .over(wC.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum(col("w")).over(wC.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("r", expr(
          s"((walk_id * 1103515245 + $k * 12345 + 6789) % 2147483648) % tot"))
        .filter(col("cumw") > col("r") && col("cumw") - col("w") <= col("r"))
      frontier = drawn.select(col("walk_id"), col("cur").as("prev"),
        col("dst").as("cur"))
        .localCheckpoint(true) // each union branch would otherwise
        // re-derive every earlier step's candidate/window chain
      out = out.union(frontier.select(col("walk_id"),
        lit(k.toLong).as("step"), col("cur").as("node")))
    }
    out.orderBy("walk_id", "step")
  }

  /** Catalog form: biased walks over the same trade graph as
    * [[graphRandomWalk]] — the adjacency-array spelling, which the
    * round-10 isolated measurement put at ~1.7x the join spelling on
    * this corpus (PERF.md round-10 section; the join spelling stays
    * as [[graphNode2vecWalkOn]] — the hub-robust form a skewed-degree
    * graph would switch back to — and the two are equivalence-proven
    * in WalkBudgetSpec). */
  def graphNode2vecWalk(s: SparkSession, dir: String): DataFrame =
    graphNode2vecWalkAdjOn(bipartiteEdges(s, dir))

  /** Adjacency-array spelling of [[graphNode2vecWalkOn]] — the
    * round-10 structural attempt at the suite's standing #1: build
    * the neighbor ARRAY relation once, carry the previous node's
    * array on the frontier, and classify candidates with
    * array_contains instead of the Σdeg-sized LEFT join against the
    * edge set.
    *
    * Round 12 (optimization): the WINDOW is gone — the draw rides the
    * aggregation. The prior spelling shuffled the Σdeg-row candidate
    * relation into a walk-keyed window (shuffle + SORT + two frame
    * processors + filter) for the cumulative-weight line, then joined
    * nbrs a second time to refetch the drawn node's array. Both
    * disappear: the classified candidates groupBy (walk_id, cur) into
    * tot = sum(w) (map-side combinable, codegen) and arr =
    * sort_array(collect_list(struct(dst, w))) — dst is unique per
    * group, so struct order = the window's ORDER BY dst — and the
    * drawn index is #(prefix sums <= r), one O(deg) `aggregate` fold
    * per walk row. The new prev's array is transform(arr, s -> s.dst)
    * (arr IS cur's full sorted adjacency), so the post-draw refetch
    * join disappears too. Per step: one expand join + one groupBy
    * exchange, no sort, no window, no refetch. Classification is
    * UNCHANGED (codegen'd array_contains per candidate row — an
    * earlier all-in-one-row fold variant was measured 12x WORSE: a
    * hub's O(deg_cur x deg_prev) probes landed in ONE interpreted
    * lambda with no row-level parallelism; candidates keep the probes
    * codegen'd and spread across rows). Identical draw arithmetic,
    * identical output — equivalence stays spec-checked. Scale caveat
    * unchanged: membership probes are O(deg(prev)) per candidate, so
    * hub-heavy graphs still prefer the join spelling. */
  def graphNode2vecWalkAdjOn(edges: DataFrame, steps: Int = 3): DataFrame = {
    require(steps >= 1, s"need steps >= 1, got $steps")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).cast("long").as("src"),
      col(cd).cast("long").as("dst")).distinct()
    val nbrs = e.groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .localCheckpoint(true) // read by every step's expand
    var frontier = nbrs.select(col("src").as("walk_id"),
      col("src").as("prev"), col("src").as("cur"),
      col("nbrs").as("nbrs_prev"))
    var out = frontier.select(col("walk_id"), lit(0L).as("step"),
      col("cur").as("node"))
    for (k <- 1 to steps) {
      val cand = frontier.as("f")
        .join(nbrs.as("n"), col("f.cur") === col("n.src"))
        .select(col("f.walk_id"), col("f.prev"), col("f.cur"),
          col("f.nbrs_prev"), explode(col("n.nbrs")).as("dst"))
      // codegen'd per-candidate weights; nbrs_prev never crosses an
      // exchange (classified in the expand stage, dropped before the
      // groupBy shuffle ships the slim (walk_id, cur, dst, w) rows)
      val weighted = cand.select(col("walk_id"), col("cur"), col("dst"),
        when(col("dst") === col("prev"), lit(N2vReturnW))
          .when(array_contains(col("nbrs_prev"), col("dst")),
            lit(N2vCommonW))
          .otherwise(lit(N2vForwardW)).as("w"))
      val drawn = weighted
        .groupBy("walk_id", "cur")
        .agg(sum(col("w")).as("tot"),
          sort_array(collect_list(struct(col("dst"), col("w"))))
            .as("arr"))
        .withColumn("r", expr(
          s"((walk_id * 1103515245 + $k * 12345 + 6789) % 2147483648)" +
            " % tot"))
        // drawn 0-based index = #(strictly-increasing prefix sums <= r)
        .withColumn("sel", expr(
          """aggregate(arr,
            |  named_struct('cum', CAST(0 AS BIGINT), 'cnt', 0),
            |  (st, s) -> named_struct('cum', st.cum + s.w,
            |    'cnt', st.cnt + IF(st.cum + s.w <= r, 1, 0)),
            |  st -> st.cnt)""".stripMargin))
      frontier = drawn
        .select(col("walk_id"), col("cur").as("prev"),
          expr("arr[sel].dst").as("cur"),
          expr("transform(arr, s -> s.dst)").as("nbrs_prev"))
        .localCheckpoint(true) // each union branch would otherwise
        // re-derive every earlier step's draw chain
      out = out.union(frontier.select(col("walk_id"),
        lit(k.toLong).as("step"), col("cur").as("node")))
    }
    out.orderBy("walk_id", "step")
  }

  /** L18p: skip-gram pair extraction — the step that turns a walk
    * corpus into word2vec/DeepWalk TRAINING PAIRS: for every walk
    * position, each node within `window` steps becomes a (center,
    * context) example; pairs aggregate to (center, context, n_pairs)
    * counts (the co-occurrence matrix word2vec's negative-sampling
    * objective factorizes — Levy & Goldberg 2014). Shape: one
    * walk_id-keyed self-join whose per-key fan-out is (steps+1)², a
    * CONSTANT (25 here) — so the pair relation is linear in walk
    * count — then one map-side-combinable rollup on the pair key. */
  def graphSkipgramPairsOn(walks: DataFrame, window: Int = 2): DataFrame = {
    require(window >= 1, s"need window >= 1, got $window")
    val a = walks.select(col("walk_id"), col("step").as("ci"),
      col("node").as("center"))
    val b = walks.select(col("walk_id"), col("step").as("oi"),
      col("node").as("context"))
    a.join(b, Seq("walk_id"))
      .filter(col("oi") =!= col("ci") &&
        abs(col("oi") - col("ci")) <= window)
      .groupBy("center", "context")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("center", "context")
  }

  /** Catalog form: skip-gram pairs of the uniform walk corpus. The
    * walk relation is materialized (localCheckpoint) before the
    * self-join — otherwise each join side re-derives the entire
    * unrolled walk subtree (2x the walk cost for a corpus that is
    * n*(steps+1) small rows). */
  def graphSkipgramPairs(s: SparkSession, dir: String): DataFrame =
    graphSkipgramPairsOn(randomWalkCached(s, dir))

  /** Directed micro-grid eps-pairs (qid, nid, d2) over the first two
    * embedding dims, SELF-PAIRS INCLUDED, complete for every pair
    * within `cellMicro` distance (3×3 stencil with cell side =
    * cellMicro — provably lossless at radius <= cell side). The
    * shared substrate of the four density/graph ops below
    * ([[clusterDbscanOnPairs]] eps=20000, [[anomalyLofOnPairs]]
    * eps=20000, [[clusterLinkageLadderOnPairs]] rungs <= 40000,
    * [[graphCcIncrementalOn]] eps=5000), memoized per (session, dir,
    * CELL SIZE): equal-radius consumers (dbscan + lof) share one
    * build; different radii build their own. One substrate for all
    * four at the max radius was measured 3-6x WORSE than per-radius
    * builds — candidate pairs grow ~r² on this data, so feeding the
    * eps=5000 consumer from a 40000-radius relation materializes
    * ~64x the pairs it needs; the r²-growth beats the shared-scan
    * saving. The knnEdges discipline still applies within a radius. */
  private[graft] def gridPairsBuild(emb: DataFrame, cellMicro: Long): DataFrame = {
    val pts = emb.select(col("vec_id"),
        expr("CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000000 + 0.5) " +
          "AS BIGINT)").as("x"),
        expr("CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5) " +
          "AS BIGINT)").as("y"))
      .withColumn("cx", expr(s"(x + 2000000) DIV $cellMicro"))
      .withColumn("cy", expr(s"(y + 2000000) DIV $cellMicro"))
      .localCheckpoint(true) // probe + build sides of the stencil join
    val probe = pts
      .select(col("vec_id").as("qid"), col("x").as("qx"),
        col("y").as("qy"), col("cx"), col("cy"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("qid"), col("qx"), col("qy"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    probe.join(pts, Seq("cx", "cy"))
      .filter(expr(
        s"(qx - x) * (qx - x) + (qy - y) * (qy - y) " +
          s"<= $cellMicro * $cellMicro"))
      .select(col("qid"), col("vec_id").as("nid"),
        expr("(qx - x) * (qx - x) + (qy - y) * (qy - y)").as("d2"))
  }

  private val gridCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Long), DataFrame]

  /** The complete-within-`cellMicro` pair relation, one stencil join
    * per (session, dir, cell size) — see [[gridPairsBuild]]. */
  private[graft] def gridPairs(s: SparkSession, dir: String,
      cellMicro: Long): DataFrame =
    gridCache.synchronized {
      gridCache.filterInPlace { case ((sess, _, _), _) =>
        !sess.sparkContext.isStopped }
      gridCache.getOrElseUpdate((s, dir, cellMicro),
        gridPairsBuild(Tables.embeddings(s, dir), cellMicro)
          .localCheckpoint(true))
    }

  /** Grid-bucketed DBSCAN (Ester et al. KDD 1996; the cell-partition
    * parallelization of He et al.'s MR-DBSCAN): density clustering
    * over the first two embedding dimensions on the exact micro
    * integer grid. eps-neighborhoods come from a 3x3 NEIGHBOR-CELL
    * equi-join with cell side = eps — every true neighbor is inside
    * the 9-cell stencil by construction, so the bucketed form equals
    * the all-pairs definition while each point only meets its cell
    * neighborhood (the oracle IS the all-pairs spelling, proving the
    * equivalence per row). Core points (|N_eps| >= minPts, self
    * included) connect into clusters via the O(log n)-round
    * alternating-star CC on core-core eps-edges; border points take
    * the MIN cluster label among their core neighbors (the pinned
    * deterministic tie rule — plain DBSCAN is order-dependent here);
    * the rest is noise. Labels are component minima, so the output
    * is fully deterministic.
    *
    * Scale: the quadratic blow-up is confined to within-stencil
    * candidate pairs (density-bounded, the MR-DBSCAN contract), the
    * only row-keyed shuffles are cell/qid-keyed, and CC rounds are
    * logarithmic with constant-size checkpointed plans. Coordinates
    * are offset non-negative before the cell DIV so floor semantics
    * never meet a negative operand. */
  def clusterDbscanOn(emb: DataFrame, epsMicro: Long = 20000L,
      minPts: Long = 4L): DataFrame =
    clusterDbscanOnPairs(
      gridPairsBuild(emb, epsMicro).localCheckpoint(true),
      epsMicro, minPts)

  /** Core over a (qid, nid, d2) pair relation that must contain every
    * directed pair within epsMicro INCLUDING self-pairs — either this
    * op's own stencil or the shared [[gridPairs]] superset. */
  def clusterDbscanOnPairs(pairs: DataFrame, epsMicro: Long = 20000L,
      minPts: Long = 4L): DataFrame = {
    val eps2 = epsMicro * epsMicro
    val nbrs = pairs.filter(col("d2") <= eps2)
      .select(col("qid"), col("nid"))
      .localCheckpoint(true) // degree + core edges + border assign
    val deg = nbrs.groupBy("qid").agg(count(lit(1)).as("n_nb"))
      .localCheckpoint(true)
    val coreSet = deg.filter(col("n_nb") >= minPts).select("qid")
    val coreEdges = nbrs
      .join(coreSet, "qid")
      .join(coreSet.select(col("qid").as("nid")), "nid")
      .filter(col("qid") < col("nid"))
      .select(col("qid").as("a"), col("nid").as("b"))
    val cc = connectedComponentsAltStarOn(coreEdges)
    val coreLbl = coreSet
      .join(cc.select(col("node").as("qid"), col("lbl")), Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("lbl"), col("qid")).as("cluster")) // isolated core
      .localCheckpoint(true)
    val borderLbl = nbrs
      .join(deg.filter(col("n_nb") < minPts).select("qid"), "qid")
      .join(coreLbl.select(col("qid").as("nid"), col("cluster")), "nid")
      .groupBy("qid").agg(min(col("cluster")).as("cluster"))
    pairs.filter(col("qid") === col("nid")) // self-pairs = the spine
      .select(col("qid").as("vec_id"))
      .join(deg.select(col("qid").as("vec_id"), col("n_nb")), "vec_id")
      .join(coreLbl.select(col("qid").as("vec_id"),
        col("cluster").as("core_cluster")), Seq("vec_id"), "left")
      .join(borderLbl.select(col("qid").as("vec_id"),
        col("cluster").as("border_cluster")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("n_nb"),
        when(col("core_cluster").isNotNull, lit("core"))
          .when(col("border_cluster").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("core_cluster"), col("border_cluster")).as("cluster"))
      .orderBy("vec_id")
  }

  def clusterDbscan(s: SparkSession, dir: String): DataFrame =
    clusterDbscanOnPairs(gridPairs(s, dir, 20000L))

  /** Eps-bounded Local Outlier Factor (Breunig et al. SIGMOD 2000)
    * over [[clusterDbscanOn]]'s micro-integer grid: where DBSCAN
    * labels regions, LOF SCORES each point by how much sparser its
    * neighborhood is than its neighbors' neighborhoods — the density
    * RATIO that catches outliers sitting next to a dense cluster,
    * which a global distance threshold misses. Same provably-lossless
    * 3x3 stencil (cell side = eps; the oracle is the all-pairs
    * spelling); self excluded. The eps bound is the scale
    * contract — candidate search stays density-bounded instead of
    * global k-NN — and induces two pinned deviations from the
    * textbook: (1) a point with fewer than k eps-neighbors is
    * role='sparse', unscored (it IS the extreme outlier tier); (2) a
    * sparse neighbor o contributes reach2(p,o) = d2 (its k-distance
    * is undefined) and is excluded from the lrd average, whose
    * divisor counts scored neighbors only. All squared-distance
    * integer math: kdist2 = the rank-k d2 (ties broken by nid, N_k
    * includes ALL d2 <= kdist2 ties), lrd_e12 = |N_k|·10^12 DIV
    * Σreach2 (min eps-bounded lrd is 10^12/eps2 = 2500 > 0, so no
    * zero-divide at the default eps; both guards spelled anyway),
    * lof_milli = Σlrd(o)·1000 DIV (n_sc·lrd(p)) — ~1000 in uniform
    * density, > 1500 flags the outlier. Every shuffle is cell- or
    * qid-keyed; the stencil fanout is the 9-cell constant. */
  def anomalyLofOn(emb: DataFrame, epsMicro: Long = 20000L,
      k: Int = 4): DataFrame =
    anomalyLofOnPairs(
      gridPairsBuild(emb, epsMicro).localCheckpoint(true), epsMicro, k)

  /** Core over a (qid, nid, d2) pair relation complete within
    * epsMicro with self-pairs (see [[clusterDbscanOnPairs]]). */
  def anomalyLofOnPairs(pairs: DataFrame, epsMicro: Long = 20000L,
      k: Int = 4): DataFrame = {
    val eps2 = epsMicro * epsMicro
    val nbrs = pairs
      .filter(col("qid") =!= col("nid") && col("d2") <= eps2)
      .select("qid", "nid", "d2")
      .localCheckpoint(true) // degree + kdist + N_k + lrd + lof passes
    val deg = nbrs.groupBy("qid").agg(count(lit(1)).as("n_nb"))
    val kd = nbrs
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy("d2", "nid")))
      .filter(col("rn") === k).select(col("qid"), col("d2").as("kdist2"))
      .localCheckpoint(true) // own side + neighbor side + final spine
    val nk = nbrs.join(kd, "qid").filter(col("d2") <= col("kdist2"))
      .select("qid", "nid", "d2")
      .localCheckpoint(true) // reach pass + lof pass
    val lrd = nk
      .join(kd.select(col("qid").as("nid"), col("kdist2").as("kdist2_o")),
        Seq("nid"), "left")
      .withColumn("reach2",
        greatest(col("d2"), coalesce(col("kdist2_o"), col("d2"))))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_k"), sum(col("reach2")).as("sreach"))
      .select(col("qid"), expr(
        "CASE WHEN sreach > 0 THEN CAST(n_k * 1000000000000 DIV sreach " +
          "AS BIGINT) END").as("lrd_e12"))
      .localCheckpoint(true) // own score + neighbor average
    val lof = nk
      .join(lrd.select(col("qid").as("nid"), col("lrd_e12").as("lrd_o")),
        Seq("nid"), "left")
      .groupBy("qid")
      .agg(sum(when(col("lrd_o").isNotNull, 1L).otherwise(0L)).as("n_sc"),
        sum(col("lrd_o")).as("s_lrd"))
    pairs.filter(col("qid") === col("nid")) // self-pairs = the spine
      .select(col("qid").as("vec_id"))
      .join(deg.select(col("qid").as("vec_id"), col("n_nb")),
        Seq("vec_id"), "left")
      .join(kd.select(col("qid").as("vec_id"), col("kdist2")),
        Seq("vec_id"), "left")
      .join(lrd.select(col("qid").as("vec_id"), col("lrd_e12")),
        Seq("vec_id"), "left")
      .join(lof.select(col("qid").as("vec_id"), col("n_sc"), col("s_lrd")),
        Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("n_nb"), lit(0L)).as("n_nb"),
        when(coalesce(col("n_nb"), lit(0L)) >= k, lit("scored"))
          .otherwise(lit("sparse")).as("role"),
        col("kdist2"), col("lrd_e12"),
        expr("CASE WHEN lrd_e12 IS NOT NULL AND lrd_e12 > 0 AND n_sc > 0 " +
          "THEN CAST(s_lrd * 1000 DIV (n_sc * lrd_e12) AS BIGINT) END")
          .as("lof_milli"))
      .withColumn("is_outlier", col("lof_milli") > 1500L)
      .orderBy("vec_id")
  }

  def anomalyLof(s: SparkSession, dir: String): DataFrame =
    anomalyLofOnPairs(gridPairs(s, dir, 20000L))

  /** Single-linkage dendrogram ladder (SLINK semantics, Sibson 1973;
    * the distributed cut-at-height form): at each rung eps of a fixed
    * height ladder, the single-linkage clustering at merge height eps
    * IS the connected components of the eps-threshold graph — so the
    * ladder of component censuses (cluster count, clustered mass,
    * largest cluster, singleton count) is the dendrogram summary
    * without ever building the O(n²) merge tree. The eps-edge
    * relation is built ONCE at the TOP rung via the
    * [[clusterDbscanOn]] 3×3 stencil (cell side = max eps, provably
    * lossless; the oracle is the all-pairs spelling) and each rung
    * just filters it by d2 <= eps² before the O(log n) alternating-
    * star CC. Census rules pinned: a cluster is a component of size
    * >= 2; max_cluster_size floors at 1 (an all-singleton rung);
    * pct_clustered_ppm divides once at the end. Monotonicity is the
    * spec's invariant: clustered mass and max size never DECREASE up
    * the ladder, cluster count can move either way (merges vs
    * newly-paired singletons).
    *
    * Scale: |rungs| is a constant (4), so the whole op is 4 CC runs
    * on density-bounded edge subsets of ONE stencil join — each CC
    * logarithmic-round with checkpointed constant-size plans; the
    * census rollups are label-keyed map-side combines. The rungs are
    * INDEPENDENT problems, and at any scale each CC run is partly
    * driver-latency-bound (its per-round jobs serialize), so the
    * ladder materializes the four 1-row rung censuses as CONCURRENT
    * job submissions (the standard Spark multi-job idiom, cf. ML
    * tuning's parallelism): wall-clock tracks the slowest rung, not
    * the sum. Two sequential alternatives were built and MEASURED
    * here (PERF.md round 8): label contraction up the ladder — rung
    * r+1's CC on fresh band edges mapped through rung r's labels,
    * exact by the [[graphCcIncrementalOnPairs]] minima-composition
    * theorem — both with per-rung relabel checkpoints (+45%, round 7)
    * and lazy-chained (round 8: no win; the chain forces the rungs
    * sequential, which is exactly the latency the parallel batch form
    * removes). Contraction remains the upgrade path only where a
    * single rung's CC dominates wall-clock. */
  def clusterLinkageLadderOn(emb: DataFrame,
      rungsMicro: Seq[Long] = Seq(5000L, 10000L, 20000L, 40000L))
      : DataFrame =
    clusterLinkageLadderOnPairs(
      gridPairsBuild(emb, rungsMicro.max).localCheckpoint(true),
      rungsMicro)

  /** Core over a (qid, nid, d2) pair relation complete within
    * rungsMicro.max with self-pairs (see [[clusterDbscanOnPairs]]). */
  def clusterLinkageLadderOnPairs(pairs: DataFrame,
      rungsMicro: Seq[Long] = Seq(5000L, 10000L, 20000L, 40000L))
      : DataFrame = {
    require(rungsMicro.nonEmpty && rungsMicro.size <= 8,
      s"the rung ladder must be a small constant, got $rungsMicro")
    val epsMax = rungsMicro.max
    val edges = pairs
      .filter(col("qid") < col("nid") &&
        col("d2") <= lit(epsMax) * lit(epsMax))
      .select(col("qid").as("a"), col("nid").as("b"), col("d2"))
      .localCheckpoint(true) // one band-filter pass per ladder step
    val nRel = pairs.filter(col("qid") === col("nid"))
      .agg(count(lit(1)).as("n_points"))
    // independent rungs: submit each rung's CC + 1-row census as its
    // own concurrent job chain; localCheckpoint(true) inside the
    // future forces the work there, so the final union is 4 cached
    // single rows
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val perRung = rungsMicro.sorted.map { eps =>
      Future {
        val cc = connectedComponentsAltStarOn(
          edges.filter(col("d2") <= eps * eps).select("a", "b"))
        cc.groupBy("lbl").agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)).as("n_clusters"),
            coalesce(sum(col("sz")), lit(0L)).as("n_clustered"),
            coalesce(max(col("sz")), lit(1L)).as("max_cluster_size"))
          .withColumn("eps_micro", lit(eps))
          .localCheckpoint(true)
      }
    }.map(Await.result(_, Duration.Inf))
    perRung.reduce(_ unionByName _)
      .crossJoin(broadcast(nRel))
      .select(col("eps_micro"), col("n_points"), col("n_clusters"),
        col("n_clustered"),
        (col("n_points") - col("n_clustered")).as("n_singletons"),
        col("max_cluster_size"),
        expr("CAST(n_clustered * 1000000 DIV n_points AS BIGINT)")
          .as("pct_clustered_ppm"))
      .orderBy("eps_micro")
  }

  def clusterLinkageLadder(s: SparkSession, dir: String): DataFrame =
    clusterLinkageLadderOnPairs(gridPairs(s, dir, 40000L))

  /** Incremental connected components by LABEL CONTRACTION (the
    * union-find-on-summaries idiom of incremental graph systems, cf.
    * Stefani et al.; [[Dedup.dedupIncremental]]'s graph sibling): a
    * nightly pipeline holds CC labels for its BASE edge set and a
    * day's DELTA of new edges arrives — recomputing from scratch
    * re-shuffles every edge ever seen, but merges can only happen
    * ALONG delta edges, so it suffices to (1) map each delta
    * endpoint through its base label (identity for unseen nodes),
    * (2) run CC on that contracted label graph — DELTA-sized, not
    * corpus-sized, and (3) compose. Labels are component minima at
    * every stage, so composed minima = batch minima EXACTLY — and
    * the oracle IS the batch spelling over base ∪ delta, making the
    * incremental-equals-batch theorem a checked row, not a comment.
    * Graph: the eps=5000 embedding stencil graph (small components —
    * see [[clusterLinkageLadderOn]] rung 5000 — keeping the oracle's
    * closure cheap); the base/delta split is a deterministic mixing
    * hash on the edge (8:2). Output per node: lbl_base (its label
    * seen only base edges, itself if delta-only), lbl (final), and
    * changed — the audit column an incremental promotion gate reads.
    *
    * Scale: THE point — the second CC runs on a relation bounded by
    * |delta| + touched labels, so the nightly cost tracks the day's
    * arrivals; the base CC is the one-time backfill. Both CCs are
    * the O(log n) alternating-star; everything else is node-keyed
    * equi-joins off checkpointed relations. */
  def graphCcIncrementalOn(emb: DataFrame, epsMicro: Long = 5000L)
      : DataFrame =
    graphCcIncrementalOnPairs(
      gridPairsBuild(emb, epsMicro).localCheckpoint(true), epsMicro)

  /** Edge derivation over a (qid, nid, d2) pair relation complete
    * within epsMicro (see [[clusterDbscanOnPairs]]). */
  def graphCcIncrementalOnPairs(pairs: DataFrame,
      epsMicro: Long = 5000L): DataFrame =
    graphCcIncrementalCompose(pairs
      .filter(col("qid") < col("nid") &&
        col("d2") <= lit(epsMicro) * lit(epsMicro))
      .select(col("qid").as("a"), col("nid").as("b"))
      .withColumn("h", expr("(a * 912367 + b * 514229) % 10"))
      .localCheckpoint(true)) // base CC + delta contraction + node spine

  /** The contraction core, parameterized by the hash-split edge
    * relation (columns a, b, h) so the spec can drive a hand graph. */
  def graphCcIncrementalCompose(edges: DataFrame): DataFrame = {
    val ccB = connectedComponentsAltStarOn(
        edges.filter(col("h") < 8).select("a", "b"))
      .localCheckpoint(true) // delta relabel ×2 + final spine
    val contracted = edges.filter(col("h") >= 8)
      .join(ccB.select(col("node").as("a"), col("lbl").as("la")),
        Seq("a"), "left")
      .join(ccB.select(col("node").as("b"), col("lbl").as("lb")),
        Seq("b"), "left")
      .select(coalesce(col("la"), col("a")).as("x"),
        coalesce(col("lb"), col("b")).as("y"))
    val cc2 = connectedComponentsAltStarOn(contracted)
    edges.select(explode(array(col("a"), col("b"))).as("node")).distinct()
      .join(ccB, Seq("node"), "left")
      .select(col("node"), coalesce(col("lbl"), col("node")).as("lbl_base"))
      .join(cc2.select(col("node").as("lbl_base"), col("lbl").as("l2")),
        Seq("lbl_base"), "left")
      .select(col("node"), col("lbl_base"),
        coalesce(col("l2"), col("lbl_base")).as("lbl"))
      .withColumn("changed", col("lbl") =!= col("lbl_base"))
      .orderBy("node")
  }

  def graphCcIncremental(s: SparkSession, dir: String): DataFrame =
    graphCcIncrementalOnPairs(gridPairs(s, dir, 5000L))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "anomaly_lof" -> anomalyLof,
    "cluster_dbscan" -> clusterDbscan,
    "cluster_linkage_ladder" -> clusterLinkageLadder,
    "graph_cc_incremental" -> graphCcIncremental,
    "graph_random_walk" -> graphRandomWalk,
    "graph_node2vec_walk" -> graphNode2vecWalk,
    "graph_skipgram_pairs" -> graphSkipgramPairs,
    "graph_louvain_move" -> graphLouvainMove,
    "er_golden_record" -> erGoldenRecord,
    "er_pipeline" -> erPipeline,
    "er_blocking_eval" -> erBlockingEval,
    "graph_projection" -> graphProjection,
    "dedup_apply" -> dedupApply,
    "graph_degrees" -> graphDegrees,
    "dedup_clusters" -> dedupClusters,
    "corpus_soft_dedup" -> corpusSoftDedup,
    "dedup_stage_funnel" -> dedupStageFunnel,
    "dedup_clusters_altstar" -> dedupClustersAltStar,
    "dedup_semantic" -> dedupSemantic,
    "dedup_semantic_sweep" -> dedupSemanticSweep,
    "dedup_semantic_clustered" -> dedupSemanticClustered,
    "graph_pagerank" -> graphPagerank,
    "graph_katz" -> graphKatz,
    "graph_label_spread" -> graphLabelSpread,
    "graph_ppr" -> graphPpr,
    "graph_harmonic" -> graphHarmonic,
    "graph_betweenness" -> graphBetweenness,
    "graph_hits" -> graphHits,
    "graph_assortativity" -> graphAssortativity,
    "graph_bfs" -> graphBfs,
    "graph_triangles" -> graphTriangles,
    "graph_clustering_coeff" -> graphClusteringCoeff,
    "graph_neighbor_jaccard" -> graphNeighborJaccard,
    "graph_adamic_adar" -> graphAdamicAdar,
    "graph_communities" -> graphCommunities,
    "graph_conductance" -> graphConductance,
    "graph_kcore" -> graphKcore,
    "graph_truss" -> graphTruss,
    "graph_modularity" -> graphModularity,
  )

  /** Unrolled peel rounds — each deletes edges touching nodes of
    * degree < 3; idempotent once converged, so [[KcoreRounds]] rounds
    * replay the engine's fixpoint exactly (the engine throws if it
    * needs more). NOT EXISTS, not NOT IN — null-safe by discipline. */
  private val kcoreIterSql = (1 to KcoreRounds).map { i =>
    val prev = s"e${i - 1}"
    // each round references its predecessor several times — without
    // MATERIALIZED, DuckDB inlines the whole chain per reference and
    // the expansion grows exponentially in rounds (observed as a
    // too-many-open-files blowup on the base parquet)
    s"""d$i AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM (
       |    SELECT a AS node FROM $prev
       |    UNION ALL SELECT b FROM $prev) GROUP BY node),
       |w$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg < $KcoreK),
       |e$i AS MATERIALIZED (SELECT a, b FROM $prev
       |  WHERE NOT EXISTS (SELECT 1 FROM w$i WHERE w$i.node = $prev.a)
       |    AND NOT EXISTS (SELECT 1 FROM w$i WHERE w$i.node = $prev.b))"""
      .stripMargin
  }.mkString(",\n")

  /** Unrolled k-truss peel rounds — per round: id-oriented triangle
    * enumeration (same triangle SET as the engine's degree-oriented
    * wedge join; orientation only affects skew, not the result), the
    * three-edge support rollup, and the keep-join. MATERIALIZED for
    * the same chain-inlining reason as [[kcoreIterSql]]. */
  private val trussIterSql = (1 to TrussRounds).map { i =>
    val prev = s"e${i - 1}"
    s"""t$i AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM $prev e1 JOIN $prev e2 ON e1.a = e2.a AND e1.b < e2.b
       |  JOIN $prev e3 ON e3.a = e1.b AND e3.b = e2.b),
       |s$i AS MATERIALIZED (SELECT a, b, COUNT(*) AS sup FROM (
       |    SELECT x AS a, y AS b FROM t$i
       |    UNION ALL SELECT x, z FROM t$i
       |    UNION ALL SELECT y, z FROM t$i) GROUP BY 1, 2),
       |e$i AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
       |  JOIN s$i s ON s.a = e.a AND s.b = e.b
       |  WHERE s.sup >= ${TrussK - 2})""".stripMargin
  }.mkString(",\n")

  /** Unrolled synchronous LPA rounds — per round: neighbor-label
    * counts, then the (cnt DESC, lbl) argmax per node via QUALIFY. */
  private val lpaIterSql = (1 to 2).map { i =>
    val prev = s"l${i - 1}"
    s"""l$i AS (SELECT node, lbl FROM (
       |    SELECT a.node AS node, p.lbl AS lbl, COUNT(*) AS cnt
       |    FROM adj a JOIN $prev p ON a.nb = p.node GROUP BY 1, 2)
       |  QUALIFY row_number() OVER (PARTITION BY node
       |    ORDER BY cnt DESC, lbl) = 1)""".stripMargin
  }.mkString(",\n")

  /** Unrolled BFS rounds as CTEs — each round unions the frontier
    * expansion onto the previous distance relation and folds MIN,
    * replaying [[graphBfsOn]]'s recurrence exactly. */
  private val bfsIterSql = (1 to 4).map { i =>
    val prev = s"d${i - 1}"
    s"""d$i AS (SELECT node, MIN(dist) AS dist FROM (
       |    SELECT node, dist FROM $prev
       |    UNION ALL
       |    SELECT eb.dst AS node, p.dist + 1 AS dist
       |    FROM $prev p JOIN eb ON eb.src = p.node) GROUP BY node)""".stripMargin
  }.mkString(",\n")

  /** Unrolled PageRank rounds as CTEs — the oracle replays the exact
    * integer recurrence of [[graphPagerankOn]] (cf. the kmeans oracle,
    * which unrolls Lloyd's the same way). */
  private val prIterSql = (1 to 3).map { i =>
    val prev = if (i == 1) "r0" else s"r${i - 1}"
    s"""c$i AS (SELECT eb.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
       |  FROM eb JOIN $prev r ON eb.src = r.node JOIN deg d ON eb.src = d.src
       |  GROUP BY eb.dst),
       |r$i AS (SELECT n.node,
       |    CAST(150000000 + (COALESCE(c$i.s, 0) * 85) // 100 AS BIGINT) AS r
       |  FROM r0 n LEFT JOIN c$i ON n.node = c$i.node)""".stripMargin
  }.mkString(",\n")

  private val harmIterSql = (1 to 4).map { i =>
    val prev = s"h${i - 1}"
    s"""h$i AS (SELECT seed, node, MIN(dist) AS dist FROM (
       |    SELECT seed, node, dist FROM $prev
       |    UNION ALL
       |    SELECT p.seed, eb.dst AS node, p.dist + 1 AS dist
       |    FROM $prev p JOIN eb ON eb.src = p.node) GROUP BY seed, node)"""
      .stripMargin
  }.mkString(",\n")

  /** Unrolled Brandes forward rounds — candidates from the previous
    * FRONTIER only (dist = i−1), σ summed over predecessors, NOT
    * EXISTS keeping first-reached nodes (mirrors the engine's
    * left_anti). MATERIALIZED per round: each r$i is referenced by
    * the next round, the DAG, and the backward pass. */
  private val btwFwdSql = (1 to 4).map { i =>
    val prev = s"r${i - 1}"
    s"""c$i AS (SELECT p.seed, eb.dst,
       |    CAST(SUM(p.sigma) AS BIGINT) AS sigma
       |  FROM $prev p JOIN eb ON eb.src = p.node
       |  WHERE p.dist = ${i - 1} GROUP BY p.seed, eb.dst),
       |f$i AS (SELECT seed, dst AS node, CAST($i AS BIGINT) AS dist,
       |    sigma FROM c$i
       |  WHERE NOT EXISTS (SELECT 1 FROM $prev
       |    WHERE $prev.seed = c$i.seed AND $prev.node = c$i.dst)),
       |r$i AS MATERIALIZED (SELECT * FROM $prev
       |  UNION ALL SELECT * FROM f$i)""".stripMargin
  }.mkString(",\n")

  /** Unrolled Brandes backward rounds, horizon down to level 1 —
    * per-term floor division BEFORE the order-free sum, exactly the
    * engine's quantization. */
  private val btwBwdSql = (3 to 1 by -1).map { l =>
    val succ = s"d${l + 1}"
    s"""ct$l AS (SELECT g.seed, g.u,
       |    CAST(SUM(g.su * (1000000 + COALESCE(d.delta, 0)) // g.sv)
       |      AS BIGINT) AS d
       |  FROM dag g LEFT JOIN $succ d
       |    ON d.seed = g.seed AND d.node = g.v
       |  WHERE g.du = $l GROUP BY g.seed, g.u),
       |d$l AS MATERIALIZED (SELECT r.seed, r.node,
       |    CAST(COALESCE(ct.d, 0) AS BIGINT) AS delta
       |  FROM r4 r LEFT JOIN ct$l ct
       |    ON ct.seed = r.seed AND ct.u = r.node
       |  WHERE r.dist = $l)""".stripMargin
  }.mkString(",\n")

  private val pprIterSql = (1 to 3).map { i =>
    val prev = if (i == 1) "p0" else s"p${i - 1}"
    s"""pc$i AS (SELECT eb.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
       |  FROM eb JOIN $prev r ON eb.src = r.node JOIN deg d ON eb.src = d.src
       |  GROUP BY eb.dst),
       |p$i AS (SELECT b.node, b.is_seed, b.tele,
       |    CAST(b.tele + (COALESCE(pc$i.s, 0) * 85) // 100 AS BIGINT) AS r
       |  FROM base b LEFT JOIN pc$i ON b.node = pc$i.node)""".stripMargin
  }.mkString(",\n")

  /** Recursive reachability closure + cluster stats over a `pairs`
    * CTE (da, db) — the shared oracle tail; fine at oracle corpus
    * scale (component sizes are tiny), where the engine side runs the
    * label-propagation loop instead. `idCol` names the output id. */
  private[functions] val ccCoreSql: String =
    """pe AS (SELECT da AS a, db AS b FROM pairs
      |       UNION SELECT db AS a, da AS b FROM pairs),
      |nodes AS (SELECT DISTINCT a AS node FROM pe),
      |rr(node, reach) AS (
      |  SELECT node, node AS reach FROM nodes
      |  UNION
      |  SELECT pe.b AS node, rr.reach FROM rr JOIN pe ON pe.a = rr.node),
      |lbl AS (SELECT node, MIN(reach) AS cluster_id FROM rr GROUP BY node),
      |sz AS (SELECT cluster_id, COUNT(*) AS n_members FROM lbl GROUP BY cluster_id)""".stripMargin

  private def ccTailSql(idCol: String): String =
    s"""$ccCoreSql
       |SELECT l.node AS $idCol, l.cluster_id, s.n_members,
       |  l.node = l.cluster_id AS is_keeper
       |FROM lbl l JOIN sz s ON l.cluster_id = s.cluster_id
       |ORDER BY l.cluster_id, $idCol""".stripMargin

  private val dedupClustersOracle: String =
    s"""${Dedup.minhashCoreSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |pairs AS (SELECT da, db
       |  FROM ix JOIN sig sa ON da = sa.doc_id JOIN sig sb ON db = sb.doc_id
       |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8),
       |${ccTailSql("doc_id")}""".stripMargin

  /** Shared DuckDB chain of the ER pipeline (records -> rank ->
    * blocked+verified pairs -> connected components as `lbl`). */
  private val erChainSql: String =
    s"""r AS (SELECT c_custkey AS rid, c_name AS name,
       |    c_nationkey AS grp, c_acctbal AS bal FROM customer),
       |rk AS (SELECT rid, name, grp,
       |    CAST(row_number() OVER (ORDER BY name, rid) - 1 AS BIGINT) AS rnk
       |  FROM r),
       |pairs AS (SELECT LEAST(a.rid, b.rid) AS da, GREATEST(a.rid, b.rid) AS db
       |  FROM rk a JOIN rk b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + 3
       |  WHERE a.grp = b.grp AND levenshtein(a.name, b.name) <= 1),
       |$ccCoreSql""".stripMargin

  /** Unrolled walk steps — each wk CTE replays the engine's LCG draw
    * and (node, rank) neighbor selection for step k exactly. */
  private val walkIterSql = (1 to WalkSteps).map { k =>
    val prev = s"w${k - 1}"
    s"""w$k AS MATERIALIZED (SELECT w.walk_id, nb.dst AS node
       |  FROM $prev w JOIN deg d ON w.node = d.src
       |  JOIN nb ON nb.src = w.node
       |    AND nb.rn = ((w.walk_id * 1103515245 + $k * 12345 + 6789)
       |                 % 2147483648) % d.deg)""".stripMargin
  }.mkString(",\n")

  private val walkUnionSql = (0 to WalkSteps).map { k =>
    s"SELECT walk_id, CAST($k AS BIGINT) AS step, node FROM w$k"
  }.mkString("\nUNION ALL ")

  /** Unrolled node2vec steps — each fk CTE replays classify (1/2/4
    * weights), the cumulative-weight line, and the LCG landing. */
  private val n2vIterSql = (1 to 3).map { k =>
    val prev = s"f${k - 1}"
    s"""c$k AS (SELECT f.walk_id, f.prev, f.cur, nb.dst,
       |    CASE WHEN nb.dst = f.prev THEN $N2vReturnW
       |         WHEN ep.src IS NOT NULL THEN $N2vCommonW
       |         ELSE $N2vForwardW END AS w
       |  FROM $prev f JOIN eb nb ON nb.src = f.cur
       |  LEFT JOIN eb ep ON ep.src = f.prev AND ep.dst = nb.dst),
       |d$k AS (SELECT walk_id, cur, dst, w,
       |    SUM(w) OVER (PARTITION BY walk_id ORDER BY dst
       |      ROWS UNBOUNDED PRECEDING) AS cumw,
       |    SUM(w) OVER (PARTITION BY walk_id) AS tot
       |  FROM c$k),
       |f$k AS MATERIALIZED (SELECT walk_id, cur AS prev, dst AS cur
       |  FROM d$k
       |  WHERE cumw > ((walk_id * 1103515245 + $k * 12345 + 6789)
       |                % 2147483648) % tot
       |    AND cumw - w <= ((walk_id * 1103515245 + $k * 12345 + 6789)
       |                     % 2147483648) % tot)""".stripMargin
  }.mkString(",\n")

  private val n2vUnionSql = (0 to 3).map { k =>
    s"SELECT walk_id, CAST($k AS BIGINT) AS step, cur AS node FROM f$k"
  }.mkString("\nUNION ALL ")

  val oracles: Map[String, String] = Map(
    // Mirrors anomalyLofOn SEMANTICS via the all-pairs definition (no
    // grid): equality proves the 9-cell stencil finds every
    // eps-neighbor. Same pinned sparse-neighbor rules.
    "anomaly_lof" ->
      """WITH pts AS (SELECT vec_id,
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
        |      AS BIGINT) AS x,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000 + 0.5)
        |      AS BIGINT) AS y
        |  FROM embeddings),
        |nbrs AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
        |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        |  FROM pts a JOIN pts b ON a.vec_id <> b.vec_id
        |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |    <= 400000000),
        |deg AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_nb FROM nbrs
        |  GROUP BY qid),
        |kd AS (SELECT qid, d2 AS kdist2 FROM (SELECT qid, d2,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn
        |  FROM nbrs) WHERE rn = 4),
        |nk AS (SELECT n.qid, n.nid, n.d2 FROM nbrs n
        |  JOIN kd ON kd.qid = n.qid WHERE n.d2 <= kd.kdist2),
        |lrd AS (SELECT r.qid, CASE WHEN SUM(r.reach2) > 0 THEN
        |    CAST(COUNT(*) * 1000000000000 // SUM(r.reach2) AS BIGINT)
        |    END AS lrd_e12
        |  FROM (SELECT nk.qid,
        |      GREATEST(nk.d2, COALESCE(ko.kdist2, nk.d2)) AS reach2
        |    FROM nk LEFT JOIN kd ko ON ko.qid = nk.nid) r
        |  GROUP BY r.qid),
        |lof AS (SELECT nk.qid,
        |    CAST(SUM(CASE WHEN lo.lrd_e12 IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_sc,
        |    SUM(lo.lrd_e12) AS s_lrd
        |  FROM nk LEFT JOIN lrd lo ON lo.qid = nk.nid GROUP BY nk.qid)
        |SELECT p.vec_id, COALESCE(d.n_nb, 0) AS n_nb,
        |  CASE WHEN COALESCE(d.n_nb, 0) >= 4 THEN 'scored'
        |       ELSE 'sparse' END AS role,
        |  kd.kdist2, l.lrd_e12,
        |  CASE WHEN l.lrd_e12 IS NOT NULL AND l.lrd_e12 > 0
        |      AND f.n_sc > 0 THEN
        |    CAST(f.s_lrd * 1000 // (f.n_sc * l.lrd_e12) AS BIGINT)
        |  END AS lof_milli,
        |  CASE WHEN l.lrd_e12 IS NOT NULL AND l.lrd_e12 > 0
        |      AND f.n_sc > 0 THEN
        |    CAST(f.s_lrd * 1000 // (f.n_sc * l.lrd_e12) AS BIGINT) > 1500
        |  END AS is_outlier
        |FROM pts p LEFT JOIN deg d ON d.qid = p.vec_id
        |LEFT JOIN kd ON kd.qid = p.vec_id
        |LEFT JOIN lrd l ON l.qid = p.vec_id
        |LEFT JOIN lof f ON f.qid = p.vec_id
        |ORDER BY p.vec_id""".stripMargin,
    // Mirrors graphCcIncrementalOn with the BATCH spelling over
    // base ∪ delta — equality is the incremental-equals-batch proof.
    // lbl = closure over ALL edges; lbl_base = closure over the
    // h<8 subset only, identity for delta-only nodes.
    "graph_cc_incremental" ->
      """WITH RECURSIVE pts AS (SELECT vec_id,
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
        |      AS BIGINT) AS x,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000 + 0.5)
        |      AS BIGINT) AS y
        |  FROM embeddings),
        |e AS (SELECT a.vec_id AS a, b.vec_id AS b,
        |    (a.vec_id * 912367 + b.vec_id * 514229) % 10 AS h
        |  FROM pts a JOIN pts b ON a.vec_id < b.vec_id
        |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |    <= 25000000),
        |pe AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |peb AS (SELECT a, b FROM e WHERE h < 8
        |  UNION SELECT b, a FROM e WHERE h < 8),
        |nodes AS (SELECT DISTINCT a AS node FROM pe),
        |rr(node, reach) AS (
        |  SELECT node, node FROM nodes
        |  UNION
        |  SELECT pe.b, rr.reach FROM rr JOIN pe ON pe.a = rr.node),
        |lbl AS (SELECT node, MIN(reach) AS lbl FROM rr GROUP BY node),
        |nb AS (SELECT DISTINCT a AS node FROM peb),
        |rrb(node, reach) AS (
        |  SELECT node, node FROM nb
        |  UNION
        |  SELECT peb.b, rrb.reach FROM rrb JOIN peb ON peb.a = rrb.node),
        |lblb AS (SELECT node, MIN(reach) AS lb FROM rrb GROUP BY node)
        |SELECT n.node, COALESCE(bb.lb, n.node) AS lbl_base, l.lbl,
        |  l.lbl <> COALESCE(bb.lb, n.node) AS changed
        |FROM nodes n JOIN lbl l ON l.node = n.node
        |LEFT JOIN lblb bb ON bb.node = n.node
        |ORDER BY n.node""".stripMargin,
    // Mirrors clusterLinkageLadderOn via the all-pairs eps-graphs:
    // components by recursive reachability with the rung riding the
    // recursion state; census rules identical (clusters are size>=2
    // components, max floors at 1 via MAX over all sizes).
    "cluster_linkage_ladder" ->
      """WITH RECURSIVE pts AS (SELECT vec_id,
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
        |      AS BIGINT) AS x,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000 + 0.5)
        |      AS BIGINT) AS y
        |  FROM embeddings),
        |rungs AS (SELECT UNNEST([5000, 10000, 20000, 40000])::BIGINT
        |    AS eps),
        |pe AS (SELECT r.eps, a.vec_id AS a, b.vec_id AS b
        |  FROM pts a JOIN pts b ON a.vec_id <> b.vec_id
        |  JOIN rungs r
        |    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |       <= r.eps * r.eps),
        |rr(eps, node, reach) AS (
        |  SELECT r.eps, p.vec_id, p.vec_id FROM rungs r CROSS JOIN pts p
        |  UNION
        |  SELECT pe.eps, pe.b, rr.reach FROM rr
        |  JOIN pe ON pe.eps = rr.eps AND pe.a = rr.node),
        |lbl AS (SELECT eps, node, MIN(reach) AS l FROM rr GROUP BY 1, 2),
        |sz AS (SELECT eps, l, CAST(COUNT(*) AS BIGINT) AS sz FROM lbl
        |  GROUP BY 1, 2),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points FROM pts),
        |cen AS (SELECT eps,
        |    CAST(COUNT(CASE WHEN sz >= 2 THEN 1 END) AS BIGINT)
        |      AS n_clusters,
        |    CAST(COALESCE(SUM(CASE WHEN sz >= 2 THEN sz END), 0)
        |      AS BIGINT) AS n_clustered,
        |    CAST(MAX(sz) AS BIGINT) AS max_cluster_size
        |  FROM sz GROUP BY 1)
        |SELECT c.eps AS eps_micro, n.n_points, c.n_clusters,
        |  c.n_clustered, n.n_points - c.n_clustered AS n_singletons,
        |  c.max_cluster_size,
        |  CAST(c.n_clustered * 1000000 // n.n_points AS BIGINT)
        |    AS pct_clustered_ppm
        |FROM cen c CROSS JOIN n ORDER BY eps_micro""".stripMargin,
    // Mirrors clusterDbscanOn SEMANTICS via the all-pairs definition
    // (no grid): the equality proves the 9-cell stencil is lossless.
    // Components by recursive reachability, labels = component min.
    "cluster_dbscan" ->
      """WITH RECURSIVE pts AS (SELECT vec_id,
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
        |      AS BIGINT) AS x,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000 + 0.5)
        |      AS BIGINT) AS y
        |  FROM embeddings),
        |nbrs AS (SELECT a.vec_id AS qid, b.vec_id AS nid
        |  FROM pts a JOIN pts b
        |  ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |     <= 400000000),
        |deg AS (SELECT qid, COUNT(*) AS n_nb FROM nbrs GROUP BY qid),
        |cores AS (SELECT qid FROM deg WHERE n_nb >= 4),
        |pe AS (SELECT n.qid AS a, n.nid AS b FROM nbrs n
        |  JOIN cores ca ON ca.qid = n.qid
        |  JOIN cores cb ON cb.qid = n.nid
        |  WHERE n.qid <> n.nid),
        |rr(node, reach) AS (
        |  SELECT qid, qid FROM cores
        |  UNION
        |  SELECT pe.b, rr.reach FROM rr JOIN pe ON pe.a = rr.node),
        |corelbl AS (SELECT node AS qid, MIN(reach) AS cluster
        |  FROM rr GROUP BY node),
        |borderlbl AS (SELECT n.qid, MIN(cl.cluster) AS cluster
        |  FROM nbrs n JOIN deg d ON d.qid = n.qid AND d.n_nb < 4
        |  JOIN corelbl cl ON cl.qid = n.nid
        |  GROUP BY n.qid)
        |SELECT p.vec_id, d.n_nb,
        |  CASE WHEN c.cluster IS NOT NULL THEN 'core'
        |       WHEN b.cluster IS NOT NULL THEN 'border'
        |       ELSE 'noise' END AS role,
        |  COALESCE(c.cluster, b.cluster) AS cluster
        |FROM pts p JOIN deg d ON d.qid = p.vec_id
        |LEFT JOIN corelbl c ON c.qid = p.vec_id
        |LEFT JOIN borderlbl b ON b.qid = p.vec_id
        |ORDER BY p.vec_id""".stripMargin,
    "graph_node2vec_walk" ->
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |eb AS MATERIALIZED (SELECT src, dst FROM e
         |       UNION ALL SELECT dst AS src, src AS dst FROM e),
         |f0 AS (SELECT DISTINCT src AS walk_id, src AS prev, src AS cur
         |  FROM eb),
         |$n2vIterSql
         |$n2vUnionSql
         |ORDER BY walk_id, step""".stripMargin,
    "graph_random_walk" ->
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |eb AS (SELECT src, dst FROM e
         |       UNION ALL SELECT dst AS src, src AS dst FROM e),
         |nb AS MATERIALIZED (SELECT src, dst,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst)
         |      AS BIGINT) - 1 AS rn
         |  FROM eb),
         |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM nb GROUP BY src),
         |w0 AS (SELECT src AS walk_id, src AS node FROM deg),
         |$walkIterSql
         |$walkUnionSql
         |ORDER BY walk_id, step""".stripMargin,
    "graph_skipgram_pairs" ->
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |eb AS (SELECT src, dst FROM e
         |       UNION ALL SELECT dst AS src, src AS dst FROM e),
         |nb AS MATERIALIZED (SELECT src, dst,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst)
         |      AS BIGINT) - 1 AS rn
         |  FROM eb),
         |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM nb GROUP BY src),
         |w0 AS (SELECT src AS walk_id, src AS node FROM deg),
         |$walkIterSql,
         |walks AS ($walkUnionSql)
         |SELECT a.node AS center, b.node AS context,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM walks a JOIN walks b ON a.walk_id = b.walk_id
         |WHERE b.step <> a.step AND ABS(b.step - a.step) <= 2
         |GROUP BY 1, 2 ORDER BY center, context""".stripMargin,
    "graph_projection" ->
      """WITH e AS (SELECT DISTINCT l_orderkey AS grp, l_suppkey AS member
        |  FROM lineitem),
        |p AS (SELECT a.member AS sa, b.member AS sb, COUNT(*) AS co
        |  FROM e a JOIN e b ON a.grp = b.grp AND a.member < b.member
        |  GROUP BY 1, 2),
        |sym AS (SELECT sa AS src, sb AS partner, co FROM p
        |        UNION ALL SELECT sb AS src, sa AS partner, co FROM p)
        |SELECT src, partner, CAST(co AS BIGINT) AS co,
        |  CAST(row_number() OVER (PARTITION BY src
        |    ORDER BY co DESC, partner ASC) AS INT) AS rk
        |FROM sym QUALIFY rk <= 3 ORDER BY src, rk""".stripMargin,
    "er_pipeline" ->
      s"""WITH RECURSIVE $erChainSql
         |SELECT l.cluster_id, COUNT(*) AS n_members,
         |  MAX(r.bal) AS surviving_bal
         |FROM lbl l JOIN r ON l.node = r.rid
         |GROUP BY l.cluster_id ORDER BY cluster_id""".stripMargin,
    // Mirrors erBlockingEvalOn: global (name, rid) rank, group-keyed
    // exact truth with rank distances, LEFT-join window sweep.
    "er_blocking_eval" ->
      """WITH r AS (SELECT c_custkey AS rid, c_name AS name,
        |    c_nationkey AS grp FROM customer),
        |rk AS (SELECT rid, name, grp,
        |    CAST(ROW_NUMBER() OVER (ORDER BY name, rid) AS BIGINT)
        |      AS dense_id
        |  FROM r),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rk),
        |t AS (SELECT abs(x.dense_id - y.dense_id) AS dist
        |  FROM rk x JOIN rk y ON x.grp = y.grp AND x.rid < y.rid
        |  WHERE levenshtein(x.name, y.name) <= 1),
        |w(win) AS (VALUES (2), (3), (4), (6), (8)),
        |m AS (SELECT w.win, CAST(COUNT(t.dist) AS BIGINT) AS n_truth,
        |    CAST(COALESCE(SUM(CASE WHEN t.dist < w.win THEN 1
        |      ELSE 0 END), 0) AS BIGINT) AS n_found
        |  FROM w LEFT JOIN t ON TRUE GROUP BY w.win)
        |SELECT CAST(win AS INT) AS win_size, n_truth, n_found,
        |  CAST((LEAST(win, n.n) - 1) * n.n
        |    - LEAST(win, n.n) * (LEAST(win, n.n) - 1) // 2 AS BIGINT)
        |    AS n_candidates,
        |  CASE WHEN n_truth > 0 THEN
        |    CAST(n_found * 1000000 // n_truth AS BIGINT) END
        |    AS recall_ppm
        |FROM m CROSS JOIN n ORDER BY win_size""".stripMargin,
    "graph_louvain_move" ->
      s"""WITH ${Similarity.knnCoreSql},
         |und AS (SELECT DISTINCT LEAST(qid, nid) AS a,
         |    GREATEST(qid, nid) AS b FROM knn WHERE qid <> nid),
         |adj AS (SELECT a AS node, b AS nb FROM und
         |        UNION ALL SELECT b AS node, a AS nb FROM und),
         |l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),
         |$lpaIterSql,
         |dg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS k
         |  FROM adj GROUP BY node),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
         |kin AS (SELECT a.node, p.lbl AS c, CAST(COUNT(*) AS BIGINT) AS k_in
         |  FROM adj a JOIN l2 p ON a.nb = p.node GROUP BY 1, 2),
         |st AS (SELECT node, lbl AS c, CAST(0 AS BIGINT) AS k_in FROM l2),
         |cand AS (SELECT node, c, MAX(k_in) AS k_in FROM
         |  (SELECT * FROM kin UNION ALL SELECT * FROM st) GROUP BY 1, 2),
         |sg AS (SELECT l.lbl AS c, CAST(SUM(dg.k) AS BIGINT) AS sigma_tot
         |  FROM l2 l JOIN dg ON l.node = dg.node GROUP BY 1),
         |g AS (SELECT cand.node, l2.lbl AS own, cand.c,
         |    2 * mm.m * cand.k_in - dg.k * (sg.sigma_tot -
         |      CASE WHEN cand.c = l2.lbl THEN dg.k ELSE 0 END) AS gain_num
         |  FROM cand JOIN l2 ON cand.node = l2.node
         |  JOIN dg ON cand.node = dg.node
         |  JOIN sg ON cand.c = sg.c, mm)
         |SELECT node, own AS old_label, c AS new_label,
         |  CAST(gain_num AS BIGINT) AS gain_num
         |FROM (SELECT *, row_number() OVER (PARTITION BY node
         |    ORDER BY gain_num DESC, c ASC) AS rk FROM g)
         |WHERE rk = 1 ORDER BY node""".stripMargin,
    "er_golden_record" ->
      s"""WITH RECURSIVE $erChainSql,
         |mem AS (SELECT l.cluster_id, r.rid, r.name, r.grp, r.bal
         |  FROM lbl l JOIN r ON l.node = r.rid),
         |nm AS (SELECT cluster_id, name FROM (SELECT cluster_id, name,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY length(name) DESC, name ASC) AS rk FROM mem)
         |  WHERE rk = 1),
         |gm AS (SELECT cluster_id, grp FROM (SELECT cluster_id, grp,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY COUNT(*) DESC, grp ASC) AS rk
         |  FROM mem GROUP BY cluster_id, grp) WHERE rk = 1),
         |ag AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |    MIN(rid) AS canonical_id, MAX(bal) AS surviving_bal
         |  FROM mem GROUP BY 1)
         |SELECT ag.cluster_id, ag.n_members, ag.canonical_id,
         |  nm.name AS surviving_name, CAST(gm.grp AS INT) AS surviving_grp,
         |  ag.surviving_bal
         |FROM ag JOIN nm USING (cluster_id) JOIN gm USING (cluster_id)
         |ORDER BY ag.cluster_id""".stripMargin,
    // Mirrors trussOn: TrussRounds unrolled peel rounds, fixpoint
    // support readout from the surviving edge set.
    "graph_truss" ->
      s"""WITH ${Similarity.knnCoreSql},
         |e0 AS (SELECT DISTINCT LEAST(qid, nid) AS a,
         |    GREATEST(qid, nid) AS b FROM knn WHERE qid <> nid),
         |$trussIterSql,
         |tf AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM e$TrussRounds e1
         |  JOIN e$TrussRounds e2 ON e1.a = e2.a AND e1.b < e2.b
         |  JOIN e$TrussRounds e3 ON e3.a = e1.b AND e3.b = e2.b),
         |sf AS (SELECT a, b, COUNT(*) AS sup FROM (
         |    SELECT x AS a, y AS b FROM tf
         |    UNION ALL SELECT x, z FROM tf
         |    UNION ALL SELECT y, z FROM tf) GROUP BY 1, 2)
         |SELECT e.a, e.b, CAST(sf.sup AS BIGINT) AS sup
         |FROM e$TrussRounds e JOIN sf ON sf.a = e.a AND sf.b = e.b
         |ORDER BY e.a, e.b""".stripMargin,
    "graph_triangles" ->
      s"""WITH ${Similarity.knnCoreSql},
         |und AS (SELECT DISTINCT LEAST(qid, nid) AS a,
         |    GREATEST(qid, nid) AS b FROM knn),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM und e1
         |  JOIN und e2 ON e1.b = e2.a
         |  JOIN und e3 ON e1.a = e3.a AND e2.b = e3.b),
         |n AS (SELECT x AS node FROM tri
         |      UNION ALL SELECT y FROM tri
         |      UNION ALL SELECT z FROM tri)
         |SELECT node, COUNT(*) AS n_triangles FROM n
         |GROUP BY node ORDER BY node""".stripMargin,
    // CC = 2T / deg(deg-1) in exact milli over the same knn graph;
    // deg<2 NULL-gates, graph mean over gated nodes rides along.
    "graph_clustering_coeff" ->
      s"""WITH ${Similarity.knnCoreSql},
         |und AS (SELECT DISTINCT LEAST(qid, nid) AS a,
         |    GREATEST(qid, nid) AS b FROM knn WHERE qid <> nid),
         |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS node FROM und UNION ALL SELECT b FROM und)
         |  GROUP BY node),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM und e1
         |  JOIN und e2 ON e1.b = e2.a
         |  JOIN und e3 ON e1.a = e3.a AND e2.b = e3.b),
         |tc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
         |  FROM (SELECT x AS node FROM tri
         |        UNION ALL SELECT y FROM tri
         |        UNION ALL SELECT z FROM tri) GROUP BY node),
         |cc AS (SELECT d.node, d.deg,
         |    CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
         |    CASE WHEN d.deg >= 2 THEN
         |      (2000 * COALESCE(t.n_triangles, 0)) // (d.deg * (d.deg - 1))
         |    END AS cc_milli
         |  FROM deg d LEFT JOIN tc t ON t.node = d.node),
         |av AS (SELECT CAST(SUM(cc_milli) // COUNT(*) AS BIGINT)
         |    AS avg_cc_milli FROM cc WHERE deg >= 2)
         |SELECT node, deg, n_triangles, cc_milli, avg_cc_milli
         |FROM cc CROSS JOIN av ORDER BY node""".stripMargin,
    "graph_kcore" ->
      s"""WITH tr AS (SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e0 AS (SELECT DISTINCT LEAST(src, dst) AS a,
         |    GREATEST(src, dst) AS b FROM tr WHERE src <> dst),
         |$kcoreIterSql
         |SELECT node, COUNT(*) AS core_deg FROM (
         |  SELECT a AS node FROM e$KcoreRounds
         |  UNION ALL SELECT b FROM e$KcoreRounds)
         |GROUP BY node ORDER BY node""".stripMargin,
    "graph_modularity" ->
      s"""WITH ${Similarity.knnCoreSql},
         |und AS (SELECT DISTINCT LEAST(qid, nid) AS a,
         |    GREATEST(qid, nid) AS b FROM knn WHERE qid <> nid),
         |adj AS (SELECT a AS node, b AS nb FROM und
         |        UNION ALL SELECT b AS node, a AS nb FROM und),
         |l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),
         |$lpaIterSql,
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
         |dg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM adj GROUP BY node),
         |ds AS (SELECT l.lbl AS community, COUNT(*) AS n_nodes,
         |    CAST(SUM(dg.deg) AS BIGINT) AS deg_sum
         |  FROM l2 l JOIN dg ON l.node = dg.node GROUP BY 1),
         |ie AS (SELECT la.lbl AS community,
         |    CAST(COUNT(*) AS BIGINT) AS intra_edges
         |  FROM und JOIN l2 la ON und.a = la.node
         |  JOIN l2 lb ON und.b = lb.node
         |  WHERE la.lbl = lb.lbl GROUP BY 1)
         |SELECT ds.community, ds.n_nodes,
         |  COALESCE(ie.intra_edges, CAST(0 AS BIGINT)) AS intra_edges,
         |  ds.deg_sum,
         |  CAST(4 * mm.m * COALESCE(ie.intra_edges, 0)
         |    - ds.deg_sum * ds.deg_sum AS BIGINT) AS contrib_num
         |FROM ds LEFT JOIN ie ON ds.community = ie.community, mm
         |ORDER BY 1""".stripMargin,
    // Mirrors graphConductanceOn: LPA labels over the same knn graph,
    // endpoint-explode volume/cut, min-side ppm DIV.
    "graph_conductance" ->
      s"""WITH ${Similarity.knnCoreSql},
         |und AS (SELECT DISTINCT LEAST(qid, nid) AS a,
         |    GREATEST(qid, nid) AS b FROM knn WHERE qid <> nid),
         |adj AS (SELECT a AS node, b AS nb FROM und
         |        UNION ALL SELECT b AS node, a AS nb FROM und),
         |l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),
         |$lpaIterSql,
         |lb AS (SELECT node, lbl AS c FROM l2),
         |e2 AS (SELECT und.a, und.b, la.c AS cla, lc.c AS clb
         |  FROM und JOIN lb la ON und.a = la.node
         |  JOIN lb lc ON und.b = lc.node),
         |tot AS (SELECT CAST(COUNT(*) * 2 AS BIGINT) AS vol_total FROM e2),
         |vol AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS vol FROM (
         |    SELECT cla AS c FROM e2 UNION ALL SELECT clb FROM e2)
         |  GROUP BY 1),
         |ct AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cut FROM (
         |    SELECT cla AS c FROM e2 WHERE cla <> clb
         |    UNION ALL SELECT clb FROM e2 WHERE cla <> clb)
         |  GROUP BY 1),
         |nn AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_nodes
         |  FROM lb GROUP BY 1)
         |SELECT nn.c AS community, n_nodes,
         |  CAST(COALESCE(vol.vol, 0) AS BIGINT) AS vol,
         |  CAST(COALESCE(ct.cut, 0) AS BIGINT) AS cut,
         |  CAST(CASE WHEN LEAST(COALESCE(vol.vol, 0),
         |      vol_total - COALESCE(vol.vol, 0)) > 0
         |    THEN COALESCE(ct.cut, 0) * 1000000
         |      // LEAST(COALESCE(vol.vol, 0),
         |           vol_total - COALESCE(vol.vol, 0))
         |  END AS BIGINT) AS phi_ppm
         |FROM nn LEFT JOIN vol ON nn.c = vol.c
         |LEFT JOIN ct ON nn.c = ct.c
         |CROSS JOIN tot
         |ORDER BY community""".stripMargin,
    "graph_communities" ->
      s"""WITH ${Similarity.knnCoreSql},
         |und AS (SELECT DISTINCT LEAST(qid, nid) AS a,
         |    GREATEST(qid, nid) AS b FROM knn WHERE qid <> nid),
         |adj AS (SELECT a AS node, b AS nb FROM und
         |        UNION ALL SELECT b AS node, a AS nb FROM und),
         |l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),
         |$lpaIterSql
         |SELECT node, lbl AS community FROM l2
         |ORDER BY node""".stripMargin,
    "graph_neighbor_jaccard" ->
      s"""WITH ${Similarity.knnCoreSql},
         |und AS (SELECT DISTINCT LEAST(qid, nid) AS a,
         |    GREATEST(qid, nid) AS b FROM knn WHERE qid <> nid),
         |adj AS (SELECT a AS node, b AS nb FROM und
         |        UNION ALL SELECT b AS node, a AS nb FROM und),
         |dg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM adj GROUP BY node),
         |cm AS (SELECT x.node AS u, y.node AS v,
         |    CAST(COUNT(*) AS BIGINT) AS com
         |  FROM adj x JOIN adj y ON x.nb = y.nb AND x.node < y.node
         |  GROUP BY x.node, y.node)
         |SELECT u, v,
         |  CAST(com AS DOUBLE) / (du.deg + dv.deg - com) AS jac
         |FROM cm JOIN dg du ON u = du.node JOIN dg dv ON v = dv.node
         |WHERE CAST(com AS DOUBLE) / (du.deg + dv.deg - com) >= 0.25
         |ORDER BY u, v""".stripMargin,
    "graph_adamic_adar" ->
      s"""WITH ${Similarity.knnCoreSql},
         |und AS (SELECT DISTINCT LEAST(qid, nid) AS a,
         |    GREATEST(qid, nid) AS b FROM knn WHERE qid <> nid),
         |adj AS (SELECT a AS node, b AS nb FROM und
         |        UNION ALL SELECT b AS node, a AS nb FROM und),
         |dg AS (SELECT node AS nb,
         |    CAST(FLOOR(1000000.0 / ln(CAST(COUNT(*) AS DOUBLE)) + 0.5)
         |      AS BIGINT) AS w_micro
         |  FROM adj GROUP BY node HAVING COUNT(*) >= 2)
         |SELECT x.node AS u, y.node AS v,
         |  CAST(COUNT(*) AS BIGINT) AS n_common,
         |  CAST(SUM(w_micro) AS BIGINT) AS aa_micro
         |FROM adj x JOIN adj y ON x.nb = y.nb AND x.node < y.node
         |JOIN dg ON dg.nb = x.nb
         |GROUP BY x.node, y.node
         |ORDER BY u, v""".stripMargin,
    "graph_bfs" ->
      s"""WITH e AS (SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |eb AS (SELECT src, dst FROM e
         |       UNION ALL SELECT dst AS src, src AS dst FROM e),
         |d0 AS (SELECT MIN(src) AS node, CAST(0 AS BIGINT) AS dist FROM eb),
         |$bfsIterSql
         |SELECT node, dist FROM d4 ORDER BY node""".stripMargin,
    "graph_pagerank" ->
      s"""WITH e AS (SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |eb AS (SELECT src, dst FROM e
         |       UNION ALL SELECT dst AS src, src AS dst FROM e),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM eb GROUP BY src),
         |r0 AS (SELECT src AS node, CAST(1000000000 AS BIGINT) AS r FROM deg),
         |$prIterSql
         |SELECT node, r AS rank_scaled FROM r3 ORDER BY node""".stripMargin,
    // Mirrors graphLabelSpreadOn: clamped seeds, three unrolled
    // degree-averaged milli rounds, (x desc, label asc) argmax.
    "graph_label_spread" -> {
      def round(k: Int): String =
        s"""x$k AS MATERIALIZED (SELECT * FROM x0 UNION ALL
           |  SELECT y.node, y.label, CAST(y.sx // d.deg AS BIGINT) AS x
           |  FROM (SELECT eb.dst AS node, p.label, SUM(p.x) AS sx
           |        FROM eb JOIN x${k - 1} p ON eb.src = p.node
           |        GROUP BY 1, 2) y
           |  JOIN deg d ON y.node = d.node
           |  WHERE y.node NOT IN (SELECT node FROM sd))""".stripMargin
      s"""WITH e AS (SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |eb AS MATERIALIZED (SELECT src, dst FROM e
         |       UNION ALL SELECT dst AS src, src AS dst FROM e),
         |deg AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM eb GROUP BY 1),
         |nat AS (SELECT n_nationkey,
         |    CAST(n_regionkey AS BIGINT) AS region FROM nation),
         |cr AS (SELECT CAST(c_custkey AS BIGINT) AS node, region
         |  FROM customer JOIN nat ON c_nationkey = n_nationkey),
         |sr AS (SELECT CAST(s_suppkey + 1000000 AS BIGINT) AS node,
         |    region FROM supplier JOIN nat ON s_nationkey = n_nationkey),
         |sd AS MATERIALIZED (SELECT node, region AS label FROM cr
         |  WHERE node % 4 = 0),
         |x0 AS (SELECT node, label, CAST(1000 AS BIGINT) AS x FROM sd),
         |${round(1)},
         |${round(2)},
         |${round(3)},
         |pr AS (SELECT node, label AS pred_label, x AS conf_milli
         |  FROM x3 WHERE node NOT IN (SELECT node FROM sd)
         |  QUALIFY row_number() OVER (PARTITION BY node
         |    ORDER BY x DESC, label ASC) = 1),
         |tr AS (SELECT node, region FROM cr
         |  UNION ALL SELECT node, region FROM sr)
         |SELECT pr.node, pred_label, conf_milli, region AS true_region,
         |  pred_label = region AS correct
         |FROM pr JOIN tr ON pr.node = tr.node ORDER BY pr.node""".stripMargin
    },
    "graph_katz" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS src,
        |    l_suppkey + 1000000 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |eb AS MATERIALIZED (SELECT src, dst FROM e
        |       UNION ALL SELECT dst AS src, src AS dst FROM e),
        |dm AS (SELECT MAX(d) AS dmax FROM (
        |    SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM eb GROUP BY src)),
        |p AS (SELECT MIN(CAST(1 AS BIGINT) << CAST(i AS INT)) AS p
        |  FROM UNNEST(range(1, 63)) AS r(i), dm
        |  WHERE (CAST(1 AS BIGINT) << CAST(i AS INT)) > dmax),
        |x0 AS (SELECT DISTINCT src AS node,
        |    CAST(1000000000 AS BIGINT) AS x FROM eb),
        |x1 AS MATERIALIZED (SELECT dst AS node,
        |    CAST(SUM(x) // p AS BIGINT) AS x
        |  FROM eb JOIN x0 ON src = node CROSS JOIN p GROUP BY dst, p),
        |x2 AS MATERIALIZED (SELECT dst AS node,
        |    CAST(SUM(x) // p AS BIGINT) AS x
        |  FROM eb JOIN x1 ON src = node CROSS JOIN p GROUP BY dst, p),
        |x3 AS (SELECT dst AS node, CAST(SUM(x) // p AS BIGINT) AS x
        |  FROM eb JOIN x2 ON src = node CROSS JOIN p GROUP BY dst, p)
        |SELECT node, CAST(SUM(x) AS BIGINT) AS katz_scaled
        |FROM (SELECT * FROM x1 UNION ALL SELECT * FROM x2
        |      UNION ALL SELECT * FROM x3)
        |GROUP BY node ORDER BY node""".stripMargin,
    "graph_harmonic" ->
      s"""WITH e AS (SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |eb AS (SELECT src, dst FROM e
         |       UNION ALL SELECT dst AS src, src AS dst FROM e),
         |h0 AS (SELECT DISTINCT src AS seed, src AS node,
         |    CAST(0 AS BIGINT) AS dist FROM eb WHERE src < 10),
         |$harmIterSql
         |SELECT seed, CAST(COUNT(*) AS BIGINT) AS n_reached,
         |  CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_micro,
         |  CAST(MAX(dist) AS BIGINT) AS max_dist
         |FROM h4 WHERE node <> seed GROUP BY seed
         |ORDER BY seed""".stripMargin,
    // Replays Brandes forward sigma + backward dependency with the
    // identical per-term floor quantization.
    "graph_betweenness" ->
      s"""WITH e AS (SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |eb AS (SELECT src, dst FROM e
         |       UNION ALL SELECT dst AS src, src AS dst FROM e),
         |r0 AS MATERIALIZED (SELECT DISTINCT src AS seed, src AS node,
         |    CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS sigma
         |  FROM eb WHERE src < 10),
         |$btwFwdSql,
         |dag AS MATERIALIZED (SELECT u.seed, u.node AS u,
         |    u.dist AS du, u.sigma AS su, v.node AS v, v.sigma AS sv
         |  FROM r4 u JOIN eb ON eb.src = u.node
         |  JOIN r4 v ON v.seed = u.seed AND v.node = eb.dst
         |    AND v.dist = u.dist + 1),
         |d4 AS MATERIALIZED (SELECT seed, node,
         |    CAST(0 AS BIGINT) AS delta FROM r4 WHERE dist = 4),
         |$btwBwdSql,
         |alld AS (SELECT * FROM d4 UNION ALL SELECT * FROM d3
         |  UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d1)
         |SELECT node, CAST(SUM(delta) AS BIGINT) AS bc_micro,
         |  CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_seeds_pos
         |FROM alld
         |WHERE NOT EXISTS (SELECT 1 FROM r0
         |  WHERE r0.node = alld.node)
         |GROUP BY node ORDER BY node""".stripMargin,
    "graph_ppr" ->
      s"""WITH e AS (SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |eb AS (SELECT src, dst FROM e
         |       UNION ALL SELECT dst AS src, src AS dst FROM e),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM eb GROUP BY src),
         |sd AS (SELECT DISTINCT src AS node FROM eb WHERE src < 10),
         |sc AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS nn,
         |              (SELECT CAST(COUNT(*) AS BIGINT) FROM sd) AS ns),
         |base AS (SELECT d.src AS node, sd.node IS NOT NULL AS is_seed,
         |    CAST(CASE WHEN sd.node IS NOT NULL
         |      THEN 150000000 * nn // ns ELSE 0 END AS BIGINT) AS tele
         |  FROM deg d LEFT JOIN sd ON d.src = sd.node CROSS JOIN sc),
         |p0 AS (SELECT node, is_seed, tele, tele AS r FROM base),
         |$pprIterSql
         |SELECT node, is_seed, r AS rank_scaled FROM p3
         |ORDER BY node""".stripMargin,
    "graph_hits" ->
      """WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src,
        |    l_suppkey + 1000000 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |h0 AS MATERIALIZED (SELECT DISTINCT src AS node,
        |    CAST(1 AS BIGINT) AS h FROM e),
        |a1 AS MATERIALIZED (SELECT dst, CAST(SUM(h) AS BIGINT) AS a
        |  FROM e JOIN h0 ON src = node GROUP BY dst),
        |h1 AS MATERIALIZED (SELECT src AS node, CAST(SUM(a) AS BIGINT) AS h
        |  FROM e JOIN a1 USING (dst) GROUP BY src),
        |a2 AS MATERIALIZED (SELECT dst, CAST(SUM(h) AS BIGINT) AS a
        |  FROM e JOIN h1 ON src = node GROUP BY dst),
        |h2 AS MATERIALIZED (SELECT src AS node, CAST(SUM(a) AS BIGINT) AS h
        |  FROM e JOIN a2 USING (dst) GROUP BY src)
        |SELECT node, 'hub' AS role, h AS score FROM h2
        |UNION ALL
        |SELECT dst AS node, 'authority' AS role, a AS score FROM a2
        |ORDER BY node""".stripMargin,
    "graph_assortativity" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS src,
        |    l_suppkey + 1000000 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM e0
        |  UNION ALL SELECT dst, src FROM e0),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM e GROUP BY src),
        |xy AS (SELECT dx.deg AS x, dy.deg AS y
        |  FROM e JOIN deg dx ON e.src = dx.src
        |  JOIN deg dy ON e.dst = dy.src),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sx2 FROM xy),
        |n AS (SELECT m, sx, sxy, sx2,
        |    CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx AS num,
        |    CAST(m AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx AS den
        |  FROM a)
        |SELECT m, sx, sxy, sx2,
        |  CASE WHEN den > 0 THEN CAST(CASE WHEN num < 0
        |    THEN -((-num) * 1000 // den)
        |    ELSE num * 1000 // den END AS BIGINT) END AS r_milli
        |FROM n""".stripMargin,
    "dedup_clusters" -> dedupClustersOracle,
    // Mirrors corpusSoftDedup: same cluster chain, corpus spine LEFT
    // join, singleton weight 10^6.
    "corpus_soft_dedup" ->
      s"""${Dedup.minhashCoreSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (SELECT da, db
         |  FROM ix JOIN sig sa ON da = sa.doc_id
         |  JOIN sig sb ON db = sb.doc_id
         |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8),
         |$ccCoreSql
         |SELECT d.doc_id,
         |  COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
         |  COALESCE(s.n_members, CAST(1 AS BIGINT)) AS cluster_size,
         |  CAST(1000000 // COALESCE(s.n_members, 1) AS BIGINT)
         |    AS weight_ppm
         |FROM documents d
         |LEFT JOIN lbl l ON l.node = d.doc_id
         |LEFT JOIN sz s ON s.cluster_id = l.cluster_id
         |ORDER BY d.doc_id""".stripMargin,
    // identical result contract to dedup_clusters — the oracle is the
    // algorithm-independent reachability closure
    "dedup_clusters_altstar" -> dedupClustersOracle,
    // Mirrors dedupStageFunnelOn: url canon, sha256 over survivors,
    // per-component surviving-extras; 3-row marginal report.
    "dedup_stage_funnel" ->
      s"""${Dedup.minhashCoreSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (SELECT da, db
         |  FROM ix JOIN sig sa ON da = sa.doc_id
         |  JOIN sig sb ON db = sb.doc_id
         |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8),
         |$ccCoreSql,
         |uu AS (SELECT doc_id,
         |  (CASE WHEN doc_id % 3 = 0 THEN 'http://' ELSE 'https://' END) ||
         |  (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END) ||
         |  source || '.example.com/' || lang || '/item-' || (doc_id % 25) ||
         |  (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END) || '?' ||
         |  (CASE WHEN doc_id % 5 = 0 THEN 'utm_source=feed&' ELSE '' END) ||
         |  'ref=item' || (doc_id % 25) AS url
         |  FROM documents),
         |cu AS (SELECT doc_id,
         |  replace(replace(
         |    regexp_replace(regexp_replace(url, '^https?://', ''),
         |      '^www\\.', ''),
         |    'utm_source=feed&', ''), '/?', '?') AS curl
         |  FROM uu),
         |s1 AS (SELECT MIN(doc_id) AS doc_id FROM cu GROUP BY curl),
         |s2 AS (SELECT MIN(d.doc_id) AS doc_id
         |  FROM documents d JOIN s1 USING (doc_id)
         |  GROUP BY sha256(d.text)),
         |r3 AS (SELECT COALESCE(SUM(cnt - 1), 0) AS r FROM (
         |    SELECT l.cluster_id, COUNT(*) AS cnt
         |    FROM s2 JOIN lbl l ON s2.doc_id = l.node GROUP BY 1)),
         |cns AS (SELECT (SELECT COUNT(*) FROM documents) AS n0,
         |    (SELECT COUNT(*) FROM s1) AS n1,
         |    (SELECT COUNT(*) FROM s2) AS n2, r FROM r3),
         |rws AS (
         |  SELECT 1 AS stage_id, 'url' AS stage, n0 AS n_in,
         |    n0 - n1 AS n_removed, n1 AS n_out, n0 FROM cns
         |  UNION ALL SELECT 2, 'exact', n1, n1 - n2, n2, n0 FROM cns
         |  UNION ALL SELECT 3, 'near', n2, r, n2 - r, n0 FROM cns)
         |SELECT CAST(stage_id AS BIGINT) AS stage_id, stage,
         |  CAST(n_in AS BIGINT) AS n_in,
         |  CAST(n_removed AS BIGINT) AS n_removed,
         |  CAST(n_out AS BIGINT) AS n_out,
         |  CAST(n_removed * 1000000 // n_in AS BIGINT) AS removed_ppm,
         |  CAST((n0 - n_out) * 1000000 // n0 AS BIGINT)
         |    AS cum_removed_ppm
         |FROM rws ORDER BY stage_id""".stripMargin,
    "dedup_apply" ->
      s"""${Dedup.minhashCoreSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (SELECT da, db
         |  FROM ix JOIN sig sa ON da = sa.doc_id JOIN sig sb ON db = sb.doc_id
         |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8),
         |$ccCoreSql
         |SELECT d.doc_id, d.lang, d.source,
         |  CAST(CASE WHEN l.node IS NULL THEN 1 ELSE s.n_members END
         |    AS BIGINT) AS n_merged,
         |  CASE WHEN l.node IS NULL THEN 'unique' ELSE 'keeper' END AS status
         |FROM documents d
         |LEFT JOIN lbl l ON d.doc_id = l.node
         |LEFT JOIN sz s ON l.cluster_id = s.cluster_id
         |WHERE l.node IS NULL OR l.node = l.cluster_id
         |ORDER BY d.doc_id""".stripMargin,
    "graph_degrees" ->
      s"""WITH ${Similarity.knnCoreSql},
         |und AS (SELECT DISTINCT LEAST(qid, nid) AS a,
         |    GREATEST(qid, nid) AS b FROM knn),
         |n AS (SELECT a AS node FROM und UNION ALL SELECT b FROM und),
         |dg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM n GROUP BY node)
         |SELECT deg, COUNT(*) AS n_nodes FROM dg
         |GROUP BY deg ORDER BY deg""".stripMargin,
    "dedup_semantic_clustered" ->
      s"""WITH RECURSIVE ${Similarity.kmeansCoreSql},
         |en AS (SELECT e.vec_id, e.embedding,
         |    sqrt(${Similarity.sqlDot("e.embedding", "e.embedding")}) AS nrm,
         |    a2.cell
         |  FROM embeddings e JOIN a2 ON e.vec_id = a2.vec_id),
         |pairs AS (SELECT l.vec_id AS da, r.vec_id AS db
         |  FROM en l JOIN en r
         |    ON l.cell = r.cell AND l.vec_id < r.vec_id
         |  WHERE round(${Similarity.sqlDot("l.embedding", "r.embedding")}
         |    / (l.nrm * r.nrm), 4) >= 0.45),
         |${ccTailSql("vec_id")}""".stripMargin,
    "dedup_semantic" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding,
         |  sqrt(${Similarity.sqlDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |pairs AS (SELECT l.vec_id AS da, r.vec_id AS db
         |  FROM e l JOIN e r ON l.vec_id < r.vec_id
         |  WHERE round(${Similarity.sqlDot("l.embedding", "r.embedding")}
         |    / (l.nrm * r.nrm), 4) >= 0.45),
         |${ccTailSql("vec_id")}""".stripMargin,
    // Mirrors dedupSemanticSweepOn via the all-pairs cosine relation
    // with the cut riding the recursion state (the
    // cluster_linkage_ladder oracle shape); census rules identical.
    "dedup_semantic_sweep" ->
      s"""WITH RECURSIVE e0 AS (SELECT vec_id, embedding,
         |  sqrt(${Similarity.sqlDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |cuts AS (SELECT UNNEST([4000, 4500, 5000, 5500])::BIGINT AS thr),
         |p AS (SELECT l.vec_id AS da, r.vec_id AS db,
         |    CAST(floor(round(${Similarity.sqlDot("l.embedding",
        "r.embedding")}
         |      / (l.nrm * r.nrm), 4) * 10000 + 0.5) AS BIGINT) AS c4
         |  FROM e0 l JOIN e0 r ON l.vec_id < r.vec_id
         |  WHERE round(${Similarity.sqlDot("l.embedding", "r.embedding")}
         |    / (l.nrm * r.nrm), 4) >= 0.40),
         |pe AS (SELECT c.thr, p.da AS a, p.db AS b
         |    FROM p JOIN cuts c ON p.c4 >= c.thr
         |  UNION ALL SELECT c.thr, p.db, p.da
         |    FROM p JOIN cuts c ON p.c4 >= c.thr),
         |rr(thr, node, reach) AS (
         |  SELECT c.thr, e0.vec_id, e0.vec_id FROM cuts c CROSS JOIN e0
         |  UNION
         |  SELECT pe.thr, pe.b, rr.reach FROM rr
         |  JOIN pe ON pe.thr = rr.thr AND pe.a = rr.node),
         |lbl AS (SELECT thr, node, MIN(reach) AS l FROM rr GROUP BY 1, 2),
         |sz AS (SELECT thr, l, CAST(COUNT(*) AS BIGINT) AS sz FROM lbl
         |  GROUP BY 1, 2),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points
         |  FROM embeddings),
         |np AS (SELECT c.thr, CAST(COUNT(p.da) AS BIGINT) AS n_pairs
         |  FROM cuts c LEFT JOIN p ON p.c4 >= c.thr GROUP BY 1),
         |cen AS (SELECT thr,
         |    CAST(COUNT(CASE WHEN sz >= 2 THEN 1 END) AS BIGINT)
         |      AS n_clusters,
         |    CAST(COALESCE(SUM(CASE WHEN sz >= 2 THEN sz END), 0)
         |      AS BIGINT) AS n_clustered,
         |    CAST(MAX(sz) AS BIGINT) AS max_cluster_size
         |  FROM sz GROUP BY 1)
         |SELECT c.thr AS thr_e4, n.n_points, np.n_pairs, c.n_clusters,
         |  c.n_clustered, n.n_points - c.n_clustered AS n_singletons,
         |  c.max_cluster_size,
         |  CAST(c.n_clustered * 1000000 // n.n_points AS BIGINT)
         |    AS pct_clustered_ppm
         |FROM cen c JOIN np USING (thr) CROSS JOIN n
         |ORDER BY thr_e4""".stripMargin,
  )
}
