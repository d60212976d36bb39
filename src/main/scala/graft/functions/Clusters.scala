package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Cluster assignment over any (doc_id-ish, doc_id-ish) pair frame:
    * (doc_id, cluster_id, n_members, is_keeper), keeper = min id. */
  def clustersOn(pairs: DataFrame): DataFrame = {
    val cc = connectedComponentsOn(pairs)
    val sizes = cc.groupBy("lbl").agg(count(lit(1)).as("n_members"))
    cc.join(sizes, "lbl")
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
        col("n_members"), (col("node") === col("lbl")).as("is_keeper"))
      .orderBy("cluster_id", "doc_id")
  }

  /** Catalog form: components of the MinHash-verified near-dup pairs
    * (jac >= 0.8), i.e. the full Dedup rung chain
    * shingle -> minhash -> band -> verify -> cluster. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    clustersOn(Dedup.dedupMinhash(s, dir).select("da", "db"))

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
      Dedup.dedupEmbeddingOn(Tables.embeddings(s, dir), threshold = 0.45)
        .select("da", "db"))
      .withColumnRenamed("doc_id", "vec_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> dedupClusters,
    "dedup_semantic" -> dedupSemantic,
  )

  /** Recursive reachability closure + cluster stats over a `pairs`
    * CTE (da, db) — the shared oracle tail; fine at oracle corpus
    * scale (component sizes are tiny), where the engine side runs the
    * label-propagation loop instead. `idCol` names the output id. */
  private def ccTailSql(idCol: String): String =
    s"""pe AS (SELECT da AS a, db AS b FROM pairs
       |       UNION SELECT db AS a, da AS b FROM pairs),
       |nodes AS (SELECT DISTINCT a AS node FROM pe),
       |rr(node, reach) AS (
       |  SELECT node, node AS reach FROM nodes
       |  UNION
       |  SELECT pe.b AS node, rr.reach FROM rr JOIN pe ON pe.a = rr.node),
       |lbl AS (SELECT node, MIN(reach) AS cluster_id FROM rr GROUP BY node),
       |sz AS (SELECT cluster_id, COUNT(*) AS n_members FROM lbl GROUP BY cluster_id)
       |SELECT l.node AS $idCol, l.cluster_id, s.n_members,
       |  l.node = l.cluster_id AS is_keeper
       |FROM lbl l JOIN sz s ON l.cluster_id = s.cluster_id
       |ORDER BY l.cluster_id, $idCol""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_clusters" ->
      s"""${Dedup.minhashCoreSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (SELECT da, db
         |  FROM ix JOIN sig sa ON da = sa.doc_id JOIN sig sb ON db = sb.doc_id
         |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8),
         |${ccTailSql("doc_id")}""".stripMargin,
    "dedup_semantic" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding,
         |  sqrt(${Similarity.sqlDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |pairs AS (SELECT l.vec_id AS da, r.vec_id AS db
         |  FROM e l JOIN e r ON l.vec_id < r.vec_id
         |  WHERE round(${Similarity.sqlDot("l.embedding", "r.embedding")}
         |    / (l.nrm * r.nrm), 4) >= 0.45),
         |${ccTailSql("vec_id")}""".stripMargin,
  )
}
