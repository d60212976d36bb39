package graft.pipeline

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship end-to-end pipeline — SURVEY.md §7 slice 0.
  *
  * Mirrors EP3's shape (raw_to_samples.py:310-396) on the events
  * table: scan → tumbling 2-minute segmentation (:336-341) → per
  * (subject, segment) aggregation (:156-164) → frequency HAVING
  * (:147-153, purchases/events > 0.3) → semi-join qualifying subjects
  * (:209) → per-subject analytic max (:59-90) → sorted output.
  *
  * One lazy Catalyst plan end-to-end — the reference's three
  * filesystem-staged loops become ONE scan and two shuffles: the
  * tumbling aggregation, then a single per-user window pass that
  * computes the qualifying ratio AND the analytic max together.
  * (Round 1 spelled the HAVING as a self-semi-join; Catalyst pushed
  * the semi join below the probe-side aggregate, which re-scanned and
  * re-aggregated events — the window spelling halves the I/O, the
  * decisive term at 100 TB. The semi-join shape itself stays covered
  * by join_semi / sql_subqueries.)
  */
object Flagship {

  def pipeline(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // Tumbling 2-minute "segments" per user (T1 / raw_to_samples:336).
    val win = ev
      .groupBy(col("user_id"), window(col("ts"), "2 minutes").as("win"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchase"),
        Exact.sumD(col("value")).as("win_value"))
      .select(col("user_id"), col("win.start").as("win_start"),
        col("n_events"), col("n_purchase"), col("win_value"))
    // Frequency HAVING over each user's whole history (A3 analog) and
    // the analytic max (W2) in ONE window pass: all three aggregates
    // share the user_id partition spec, so Spark plans a single
    // exchange + Window exec computing them together.
    val uw = Window.partitionBy("user_id")
    win
      .withColumn("p", sum(col("n_purchase")).over(uw))
      .withColumn("e", sum(col("n_events")).over(uw))
      .withColumn("max_win_value", max(col("win_value")).over(uw))
      .filter(col("p").cast("double") / col("e") > 0.3)
      .drop("p", "e")
      .orderBy("user_id", "win_start")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "flagship_pipeline" -> pipeline,
  )

  val oracles: Map[String, String] = Map(
    "flagship_pipeline" ->
      """WITH w AS (
        |  SELECT user_id, time_bucket(INTERVAL 2 MINUTES, ts) AS win_start,
        |    COUNT(*) AS n_events,
        |    CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS win_value
        |  FROM events GROUP BY 1, 2),
        |q AS (
        |  SELECT user_id FROM w GROUP BY user_id
        |  HAVING CAST(SUM(n_purchase) AS DOUBLE) / SUM(n_events) > 0.3)
        |SELECT w.user_id, w.win_start, w.n_events, w.n_purchase, w.win_value,
        |  MAX(w.win_value) OVER (PARTITION BY w.user_id) AS max_win_value
        |FROM w WHERE EXISTS (SELECT 1 FROM q WHERE q.user_id = w.user_id)
        |ORDER BY user_id, win_start""".stripMargin,
  )
}
