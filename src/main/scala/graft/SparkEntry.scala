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
    (operators.Layout.queries, operators.Layout.oracles),
    (functions.Scalars.queries, functions.Scalars.oracles),
    (functions.Text.queries, functions.Text.oracles),
    (functions.Corpus.queries, functions.Corpus.oracles),
    (functions.Signals.queries, functions.Signals.oracles),
    (functions.Dedup.queries, functions.Dedup.oracles),
    (functions.Clusters.queries, functions.Clusters.oracles),
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
}
