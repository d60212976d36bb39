package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Minimum spanning forest by Borůvka's algorithm — the canonical
  * O(log n)-round distributed MST (each round every component grabs
  * its cheapest outgoing edge, components merge, the component count
  * at least halves). The catalog instance runs on the nation-level
  * trade graph (25 nodes, ≤300 weighted edges collapsed from the
  * full lineitem⋈orders fact join), but the implementation is the
  * generic edge-relation form: at 100 TB the per-round work is two
  * component-keyed equi-joins plus one groupBy-min — all map-side
  * combinable — and the merge step contracts the (bounded, halving)
  * component-id graph with the existing alternating-star CC.
  *
  * Weights are EXACT integers made globally DISTINCT by packing the
  * endpoint pair into the low bits (w = cents·1024 + a·25 + b, one
  * row per unordered pair so the packing is injective); with
  * distinct weights the MST is unique, which is what lets a
  * declarative oracle exist at all: by the cycle property, an edge
  * is in the MST iff its endpoints are NOT connected by strictly
  * lighter edges — the DuckDB oracle states exactly that with a
  * recursive reachability CTE, no Borůvka replay.
  */
object Spanning {

  /** Generic Borůvka over an undirected weighted edge relation
    * `(src, dst, w)` with DISTINCT w (caller packs tie-breaks into
    * the weight; duplicate pairs must be pre-collapsed). Returns the
    * spanning-forest edge rows `(src, dst, w)`.
    *
    * Round shape: label endpoints with their current component, drop
    * intra-component edges, take each component's minimum edge
    * (min over struct(w, src, dst) — deterministic because w is
    * distinct), then contract the selected edges by running CC over
    * the component-id merge graph (nodes = component ids, a relation
    * that at least halves every round). Selected edges accumulate
    * into the forest; convergence = no cross-component edge left.
    * Round count is ⌈log₂(largest component)⌉ ≤ maxRounds; like
    * [[Clusters.connectedComponentsOn]] this throws rather than
    * return a partial forest. */
  def minimumSpanningForestOn(edges0: DataFrame,
      maxRounds: Int = 16): DataFrame = {
    val edges = edges0.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val spark = edges.sparkSession
    import spark.implicits._
    var comp = edges.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct().withColumn("c", col("node"))
      .localCheckpoint(true)
    var forest = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    var iter = 0
    var crossLeft = 1L
    try {
      while (crossLeft > 0 && iter < maxRounds) {
        val cs = comp.select(col("node").as("src"), col("c").as("cs"))
        val cd = comp.select(col("node").as("dst"), col("c").as("cd"))
        val cross = edges.join(cs, "src").join(cd, "dst")
          .filter(col("cs") =!= col("cd"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        crossLeft = cross.count()
        if (crossLeft > 0) {
          // each component's minimum incident edge, both orientations
          val picked = cross
            .select(explode(array(col("cs"), col("cd"))).as("c"),
              struct(col("w"), col("src"), col("dst")).as("e"))
            .groupBy("c").agg(min(col("e")).as("m"))
            .select(col("m.src").as("src"), col("m.dst").as("dst"),
              col("m.w").as("w"))
            .distinct() // mutual-min pairs pick the same edge twice
            .localCheckpoint(true)
          forest = forest.union(picked).localCheckpoint(true)
          // contract: CC over the merge graph of component ids
          val merge = picked
            .join(cs, "src").join(cd, "dst").select("cs", "cd")
          val relabel = Clusters.connectedComponentsOn(merge)
            .select(col("node").as("oc"), col("lbl").as("nc"))
          // plain equi-join: the relabel relation is one row per
          // pre-merge component — small here, but at graph scale AQE
          // should pick the strategy, not a hardcoded broadcast
          comp = comp.join(relabel, col("c") === col("oc"), "left")
            .select(col("node"), coalesce(col("nc"), col("c")).as("c"))
            .localCheckpoint(true)
        }
        cross.unpersist()
        iter += 1
      }
    } finally edges.unpersist()
    if (crossLeft > 0)
      throw new IllegalStateException(
        s"Boruvka did not converge within $maxRounds rounds")
    forest
  }

  /** Nation-to-nation trade edges: total lineitem cents between the
    * customer's and the supplier's nation (unordered pair, self
    * edges dropped), weight = cents·1024 + a·25 + b so all weights
    * are distinct (one row per pair; a,b < 25 ⇒ packing injective).
    * One fact join pipeline collapsed to ≤ 300 rows before any graph
    * work — the graph algebra never touches fact-table cardinality. */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
          .as("cents"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey"))
          .cast("long").as("a"),
        greatest(col("c_nationkey"), col("s_nationkey"))
          .cast("long").as("b"),
        col("cents"))
      .groupBy("a", "b").agg(sum(col("cents")).as("cents"))
      .select(col("a").as("src"), col("b").as("dst"), col("cents"),
        (col("cents") * 1024 + col("a") * 25 + col("b")).as("w"))

  /** Catalog entry: the unique MST of the nation trade graph, with
    * the packed weight unpacked back to exact cents. */
  def graphMst(s: SparkSession, dir: String): DataFrame = {
    val e = tradeEdges(s, dir).localCheckpoint(true)
    minimumSpanningForestOn(e.select("src", "dst", "w"))
      .join(e.select(col("src"), col("dst"), col("cents")),
        Seq("src", "dst"))
      .select("src", "dst", "cents")
      .orderBy("src", "dst")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_mst" -> graphMst,
  )

  val oracles: Map[String, String] = Map(
    // Cycle property on distinct weights: edge ∈ MST ⇔ its endpoints
    // are not connected using only strictly lighter edges. The
    // recursive CTE computes, per edge (keyed by its unique weight),
    // the set of nodes reachable from src through lighter edges; the
    // edge survives iff dst is never reached.
    "graph_mst" ->
      """WITH RECURSIVE
        |e AS (SELECT src, dst, cents,
        |    cents * 1024 + src * 25 + dst AS w
        |  FROM (SELECT least(c_nationkey, s_nationkey) AS src,
        |      greatest(c_nationkey, s_nationkey) AS dst,
        |      CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |        AS BIGINT) AS cents
        |    FROM lineitem
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    WHERE c_nationkey <> s_nationkey
        |    GROUP BY 1, 2)),
        |adj AS (SELECT src AS u, dst AS v, w FROM e
        |  UNION ALL SELECT dst, src, w FROM e),
        |r(eid, node) AS (
        |  SELECT w, src FROM e
        |  UNION
        |  SELECT r.eid, adj.v FROM r JOIN adj
        |    ON adj.u = r.node AND adj.w < r.eid)
        |SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
        |  cents
        |FROM e
        |WHERE NOT EXISTS (SELECT 1 FROM r
        |  WHERE r.eid = e.w AND r.node = e.dst)
        |ORDER BY src, dst""".stripMargin,
  )
}
