package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projections, filters, predicates — SURVEY.md §2.2.
  *
  * All pure Catalyst expressions: predicates push into the parquet scan
  * (PushedFilters) and unused columns are pruned (ReadSchema), so these
  * stay scan-bound at any scale. No UDFs.
  */
object Relational {

  /** P1 (preprocess_dataset.py:98,101): IN-list predicate.
    * `df[df['action_label'].isin([71..78])]` → Column.isin. */
  def filterIsin(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")

  /** P2 (preprocess_dataset.py:26,59,73): suffix predicate
    * (`endswith('.mp4')` analog on part names). */
  def filterEndswith(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_name").endsWith("widget"))
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey")

  /** P3/P4 (preprocess_dataset.py:103-113): dict-CASE value remap;
    * unmapped values pass through (pandas `replace` semantics). */
  def projectCaseMap(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        when(col("event_type") === "click", "engage")
          .when(col("event_type") === "view", "engage")
          .when(col("event_type") === "purchase", "convert")
          .otherwise(col("event_type")).as("action"))
      .orderBy("event_id")

  /** P5/F7 (preprocess_dataset.py:44-49,84,95): path-string algebra —
    * split / element pick / concat. */
  def projectStrings(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        concat_ws("/", lower(col("c_mktsegment")),
          split(col("c_name"), "#").getItem(1)).as("path"),
        substring_index(col("c_name"), "#", 1).as("stem"))
      .orderBy("c_custkey")

  /** P7/E4 (raw_to_samples.py:313): resume-from-index as a key
    * predicate (OFFSET has no stable order in a distributed engine;
    * the pushed-down range predicate is the faithful form). */
  def filterOffset(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") >= 1000)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_isin" -> filterIsin,
    "filter_endswith" -> filterEndswith,
    "project_case_map" -> projectCaseMap,
    "project_strings" -> projectStrings,
    "filter_offset" -> filterOffset,
  )

  val oracles: Map[String, String] = Map(
    "filter_isin" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type IN ('click','purchase') ORDER BY event_id""".stripMargin,
    "filter_endswith" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE p_name LIKE '%widget' ORDER BY p_partkey""".stripMargin,
    "project_case_map" ->
      """SELECT event_id,
        |  CASE WHEN event_type='click' THEN 'engage'
        |       WHEN event_type='view' THEN 'engage'
        |       WHEN event_type='purchase' THEN 'convert'
        |       ELSE event_type END AS action
        |FROM events ORDER BY event_id""".stripMargin,
    "project_strings" ->
      """SELECT c_custkey,
        |  lower(c_mktsegment) || '/' || split_part(c_name,'#',2) AS path,
        |  split_part(c_name,'#',1) AS stem
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "filter_offset" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey >= 1000 ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
