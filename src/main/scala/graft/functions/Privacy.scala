package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy auditing for release-bound datasets — the k-anonymity /
  * l-diversity checks (Sweeney 2002; Machanavajjhala et al. 2007) a
  * pipeline runs before publishing user-derived training data or
  * aggregate statistics.
  *
  * Everything is windows and hash aggregates keyed by the
  * quasi-identifier — the natural Spark shape: at 100 TB the QI
  * window is a keyed shuffle like any groupBy, and the generalization
  * ladder costs one extra window over the SAME shuffle key prefix
  * (nation, segment, coarser bucket), never a global pass. All
  * arithmetic is integer (counts, floor-bucketed balances), so the
  * DuckDB oracle replays bit-for-bit.
  *
  * Reference tie-in: none (the reference pipeline publishes bbox
  * crops, not user tables) — this family belongs to the
  * training-data-pipeline extension surface, beside text_pii_mask
  * (Text.scala), which redacts VALUES inside free text while these
  * operators audit the STRUCTURE of a release.
  */
object Privacy {

  /** Anonymity threshold: a QI group under K rows is re-identifiable
    * (Sweeney's k). 5 is the classic census value. */
  val K = 5

  /** L16a: k-anonymity audit with one generalization-ladder step —
    * Samarati's lattice move, locally recoded:
    *
    *  - level 0: QI = (segment, balance bucketed to 100s). Groups
    *    with >= K rows publish as-is.
    *  - level 1: rows whose level-0 group is small re-bucket the
    *    balance to 1000s; if the MERGED small-row group reaches K it
    *    publishes at the coarser bucket.
    *  - level 2: still-small groups are suppressed ('*' bucket —
    *    counted, never published).
    *
    * Output: one row per published group with its generalization
    * level, row count, and the l-diversity of the nation attribute
    * (distinct nations inside the group — Machanavajjhala's l: a
    * k-anonymous group that is all one nation still leaks nation).
    *
    * Both "counts" are window functions over QI keys — two shuffles
    * total, no self-joins; the suppression decision rides along with
    * every row, so the final relation is one hash aggregate. */
  def privacyKanonOn(rows: DataFrame, k: Int = K): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val b = rows.select(
      col("c_mktsegment").as("segment"),
      col("c_nationkey").as("nation"),
      floor(col("c_acctbal") / 100).cast("long").as("b0"),
      floor(col("c_acctbal") / 1000).cast("long").as("b1"))
    val w0 = Window.partitionBy("segment", "b0")
    val w1 = Window.partitionBy("segment", "b1")
    val leveled = b
      .withColumn("n0", count(lit(1)).over(w0))
      // level-1 candidates are only the rows FAILING level 0 (local
      // recoding): count the failing rows inside the coarser bucket
      .withColumn("n1",
        sum(when(col("n0") < k, 1L).otherwise(0L)).over(w1))
      .withColumn("level",
        when(col("n0") >= k, 0)
          .when(col("n1") >= k, 1)
          .otherwise(2))
      .withColumn("bucket",
        when(col("level") === 0, concat(lit("h"), col("b0")))
          .when(col("level") === 1, concat(lit("k"), col("b1")))
          .otherwise(lit("*")))
    leveled.groupBy("segment", "bucket", "level")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("nation")).as("l_div"))
      .orderBy("segment", "bucket")
  }

  def privacyKanon(s: SparkSession, dir: String): DataFrame =
    privacyKanonOn(Tables.customer(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "privacy_kanon" -> privacyKanon,
  )

  val oracles: Map[String, String] = Map(
    "privacy_kanon" ->
      s"""WITH b AS (SELECT c_mktsegment AS segment, c_nationkey AS nation,
         |    CAST(floor(c_acctbal / 100) AS BIGINT) AS b0,
         |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS b1
         |  FROM customer),
         |l0 AS (SELECT segment, nation, b0, b1,
         |    COUNT(*) OVER (PARTITION BY segment, b0) AS n0
         |  FROM b),
         |lv AS (SELECT segment, nation, b0, b1, n0,
         |    SUM(CASE WHEN n0 < $K THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY segment, b1) AS n1
         |  FROM l0),
         |lab AS (SELECT segment, nation,
         |    CASE WHEN n0 >= $K THEN 0 WHEN n1 >= $K THEN 1 ELSE 2 END AS level,
         |    CASE WHEN n0 >= $K THEN 'h' || b0
         |         WHEN n1 >= $K THEN 'k' || b1 ELSE '*' END AS bucket
         |  FROM lv)
         |SELECT segment, bucket, CAST(level AS INT) AS level,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(DISTINCT nation) AS BIGINT) AS l_div
         |FROM lab GROUP BY 1, 2, 3 ORDER BY segment, bucket""".stripMargin,
  )
}
