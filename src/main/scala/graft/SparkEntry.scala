package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator catalog: one entry per
  * implemented operator from SURVEY.md §2, each with a DuckDB oracle
  * in `oracleSql` when SQL-expressible. Implementations live in the
  * per-area modules (operators/, functions/, streaming/, pipeline/);
  * this object only aggregates them.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (pipeline.Flagship.queries, pipeline.Flagship.oracles),
    (pipeline.Reference.queries, pipeline.Reference.oracles),
    (sources.Sources.queries, sources.Sources.oracles),
    (multimodal.Multimodal.queries, multimodal.Multimodal.oracles),
    (operators.Relational.queries, operators.Relational.oracles),
    (operators.Aggregates.queries, operators.Aggregates.oracles),
    (operators.Joins.queries, operators.Joins.oracles),
    (operators.Windows.queries, operators.Windows.oracles),
    (operators.SortsSets.queries, operators.SortsSets.oracles),
    (operators.Analytics.queries, operators.Analytics.oracles),
    (operators.Events.queries, operators.Events.oracles),
    (operators.Inference.queries, operators.Inference.oracles),
    (operators.Planning.queries, operators.Planning.oracles),
    (operators.Layout.queries, operators.Layout.oracles),
    (functions.Scalars.queries, functions.Scalars.oracles),
    (functions.Text.queries, functions.Text.oracles),
    (functions.Lm.queries, functions.Lm.oracles),
    (functions.Privacy.queries, functions.Privacy.oracles),
    (functions.Sketches.queries, functions.Sketches.oracles),
    (functions.Corpus.queries, functions.Corpus.oracles),
    (functions.Signals.queries, functions.Signals.oracles),
    (functions.Dedup.queries, functions.Dedup.oracles),
    (functions.Clusters.queries, functions.Clusters.oracles),
    (functions.Spanning.queries, functions.Spanning.oracles),
    (functions.Fuzzy.queries, functions.Fuzzy.oracles),
    (functions.Chunks.queries, functions.Chunks.oracles),
    (functions.Curation.queries, functions.Curation.oracles),
    (functions.Similarity.queries, functions.Similarity.oracles),
    (streaming.Streaming.queries, streaming.Streaming.oracles),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    pipeline.Flagship.pipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)

  /** Bounds-mode oracle contract (ORACLES.md) for the two sketch ops
    * whose outputs are sketch-state-dependent and therefore can NEVER
    * hash-match a DuckDB replay — by design, not omission. Each entry
    * is a JSON object: `oracle_sql` computes the EXACT aggregate for
    * the same grouping; `join_on` keys the per-row compare; `bounds`
    * are SQL predicates over `s` (spark output) and `o` (oracle) that
    * every joined row must satisfy. The bounds come from the sketches'
    * published guarantees, not tuning: HLL++ standard error is
    * 1.04/sqrt(m) (15% ~ 3 sigma at Spark's default relativeSD 0.05);
    * GK rank error <= n/accuracy (2% value error at accuracy=1000 on
    * these distributions — the bound RobustnessSpec asserts at two
    * sfs). Dumped by Verify as oracle_bounds.json; tools/check.py
    * evaluates it.
    *
    * Round 8: both ops ALSO ship a standard hash-checked oracleSql via
    * the checked-column convention (exact aggregate + in-bound flags
    * computed in-query from the sketch estimates; an out-of-bound
    * sketch flips a flag and hash-mismatches), so the driver's
    * row/schema/hash gate covers them with no bounds-mode adoption
    * needed. The bounds entries below are kept in sync with the new
    * output columns as the richer, self-describing contract. */
  val oracleBounds: Map[String, String] = Map(
    "agg_approx_distinct" ->
      """{"mode": "bounds",
        |"oracle_sql": "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users FROM events GROUP BY event_type",
        |"join_on": ["event_type"],
        |"bounds": [
        |  "s.approx_in_bound",
        |  "s.exact_users = o.exact_users"]}""".stripMargin,
    "agg_approx_quantile" ->
      """{"mode": "bounds",
        |"oracle_sql": "WITH c AS (SELECT l_returnflag, floor(l_extendedprice * 100 + 0.5) AS cents FROM lineitem) SELECT l_returnflag, quantile_cont(cents, 0.5) AS exact_p50, quantile_cont(cents, 0.95) AS exact_p95, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY l_returnflag",
        |"join_on": ["l_returnflag"],
        |"bounds": [
        |  "s.p50_in_bound", "s.p95_in_bound",
        |  "s.exact_p50 = o.exact_p50", "s.exact_p95 = o.exact_p95",
        |  "s.n = o.n"]}""".stripMargin)
}
