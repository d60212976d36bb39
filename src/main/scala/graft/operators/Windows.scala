package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window functions — SURVEY.md §2.5.
  *
  * Partitioned windows (W2-W4) scale: each partition's frames are
  * evaluated independently after a shuffle on the partition key. The
  * one deliberate exception is W1's dense global id, which forces a
  * single-partition sort — kept faithful to the reference (sequential
  * id continuation) but isolated here; at 100 TB one would switch to
  * monotonically_increasing_id when density isn't required (SURVEY.md
  * §4 "What needs custom work" #5).
  */
object Windows {

  /** W1 (preprocessed_to_raw.py:39-46): sequential unique id
    * continuation from an existing max (start=1000). */
  def windowRowNumber(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"))
      .withColumn("file_index",
        row_number().over(Window.orderBy("c_name")) + lit(999L))
      .orderBy("c_custkey")

  /** W1 at scale: dense sequential ids WITHOUT the single-partition
    * window — the textbook distributed spelling:
    *
    *  1. range-repartition on the order key (each partition owns a
    *     contiguous key range, all partitions number in parallel);
    *  2. row_number per PARTITION (window keyed by partition id — no
    *     global collapse);
    *  3. per-partition row counts form a tiny running-offset relation
    *     (one row per partition) that broadcasts back;
    *  4. id = partition offset + local row number.
    *
    * Values are IDENTICAL to `row_number() OVER (ORDER BY k)` — the
    * oracle is the plain global form — but the plan's only global
    * exchange is the range partitioning, which is how every sort
    * already distributes. This is what replaces `windowRowNumber`'s
    * quarantined single-partition form when density is required at
    * 100 TB (`monotonically_increasing_id` when it is not).
    *
    * The order key must be a TOTAL order: a tie group straddling a
    * range-partition boundary would get renumbered relative to the
    * global window (observed at sf0.1, where c_name alone has
    * duplicates) — so callers pass enough columns to break every tie
    * (the catalog form appends the primary key). */
  def denseIdsOn(df: DataFrame, orderCols: Seq[String], parts: Int = 8,
      base: Long = 0L): DataFrame = {
    // drop to the RDD for the zip: zipWithIndex IS the per-partition
    // two-pass (count partitions, then offset each row) — and at the
    // RDD layer the range partitioner is instantiated ONCE in the
    // lineage, so the count job and the map job see identical
    // boundaries. The pure-DataFrame spelling (window per partition id
    // + an offset self-aggregate) references its exchange from two
    // subtrees: if exchange reuse doesn't fire, the range boundaries
    // RESAMPLE per subtree (seeded by RDD id) and rows near a boundary
    // silently duplicate or skip ids.
    val sorted = df.repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "dense_id", org.apache.spark.sql.types.LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L + base))
    }
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** Catalog form of [[denseIdsOn]]: same values as
    * `window_row_number` (base 999), scaled plan. */
  def windowDenseIdsScaled(s: SparkSession, dir: String): DataFrame =
    denseIdsOn(
      Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
      Seq("c_name", "c_custkey"), parts = 8, base = 999L)
      .select(col("c_custkey"), col("c_name"),
        col("dense_id").as("file_index"))
      .orderBy("c_custkey")

  /** W2 (raw_to_samples.py:59-90): group-max broadcast back to every
    * row — the bbox "resize to group max" analytic. */
  def windowAnalyticMax(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        max(col("l_quantity")).over(w).as("max_qty_in_order"),
        (max(col("l_quantity")).over(w) - col("l_quantity"))
          .as("gap_to_max"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** W4a: rank / dense_rank of customers inside their nation by
    * account balance (custkey tie-break for a total order). */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, dir)
      .select(
        col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).cast("long").as("bal_rank"),
        dense_rank().over(w).cast("long").as("bal_dense_rank"))
      .filter(col("bal_rank") <= 5)
      .orderBy("c_nationkey", "bal_rank")
  }

  /** W4b: lag + running sum per customer over order history (exact
    * decimal running sum, one double cast at the end). */
  def windowLagSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W4c: distribution-bucket window functions — ntile / percent_rank
    * / cume_dist per priority class. The (o_totalprice, o_orderkey)
    * order is total, so every bucket assignment is deterministic;
    * percent_rank and cume_dist are exact integer ratios, so the
    * double division is bit-identical across engines. */
  def windowNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** W4d: centered moving average — a bounded ROWS frame (2 preceding
    * .. 2 following) per customer's order history. The sum runs
    * through DECIMAL and divides by the frame's row count once, so
    * the double is a single exact-over-exact division in both
    * engines. */
  def windowMovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(-2, 2)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        (sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double") /
          count(lit(1)).over(w)).as("moving_avg"),
        count(lit(1)).over(w).as("frame_n"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W4e: running COUNT(DISTINCT) over an ordered window — the window
    * aggregate Spark (and most engines) refuse to evaluate directly.
    * The distributed spelling is the first-occurrence-marker identity:
    *
    *   count_distinct(x) over (rows unbounded preceding)
    *     == sum(is_first_occurrence(x)) over the same frame
    *
    * where `is_first_occurrence` is `row_number() = 1` over a window
    * keyed by (partition, x) — a SECOND partitioned window, not a
    * per-row set. Both windows shuffle on bounded keys ((cust, supp)
    * then cust), every frame is a plain running sum, and nothing
    * materializes a distinct-set per row — which is why this form
    * survives 100 TB while a naive collect_set-over-window OOMs on
    * the first hot customer. Demonstrated as "distinct suppliers a
    * customer has bought from, as of each lineitem in order-date
    * order". The synthetic lineitem duplicates full rows, so the
    * running frame is RANGE (peers included): tied rows all read the
    * end-of-tie-group value, and the marker may land on any physical
    * duplicate without changing the output multiset. */
  def windowCountDistinctOn(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val rows = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("o_orderdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_suppkey"))
    // (orderkey, linenumber) is NOT unique in the synthetic lineitem;
    // suppkey joins the order key so ties are only between rows that
    // are identical in EVERY output column — the output multiset is
    // then engine-independent even though the within-tie order isn't
    val ord = Seq(col("o_orderdate").asc, col("l_orderkey").asc,
      col("l_linenumber").asc, col("l_suppkey").asc)
    val firstW = Window.partitionBy("o_custkey", "l_suppkey").orderBy(ord: _*)
    // RANGE frame, not ROWS: duplicate rows are PEERS, so each sees
    // the sum over its whole tie group — the running value cannot
    // depend on which physical duplicate carried the marker
    val runW = Window.partitionBy("o_custkey").orderBy(ord: _*)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .withColumn("first_seen",
        when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .withColumn("n_distinct_supp", sum(col("first_seen")).over(runW))
      .orderBy("o_custkey", "o_orderdate", "l_orderkey", "l_linenumber")
  }

  def windowCountDistinct(s: SparkSession, dir: String): DataFrame =
    windowCountDistinctOn(
      Tables.orders(s, dir).filter(col("o_custkey") % 10 === 0),
      Tables.lineitem(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_count_distinct" -> windowCountDistinct,
    "window_ntile" -> windowNtile,
    "window_moving_avg" -> windowMovingAvg,
    "window_row_number" -> windowRowNumber,
    "window_dense_ids_scaled" -> windowDenseIdsScaled,
    "window_analytic_max" -> windowAnalyticMax,
    "window_rank" -> windowRank,
    "window_lag_sum" -> windowLagSum,
  )

  val oracles: Map[String, String] = Map(
    "window_count_distinct" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, l_orderkey, l_linenumber, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_custkey % 10 = 0),
        |m AS (SELECT *,
        |  CASE WHEN row_number() OVER (
        |      PARTITION BY o_custkey, l_suppkey
        |      ORDER BY o_orderdate, l_orderkey, l_linenumber, l_suppkey) = 1
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS first_seen
        |  FROM r)
        |SELECT o_custkey, o_orderdate, l_orderkey, l_linenumber, l_suppkey,
        |  first_seen,
        |  CAST(SUM(first_seen) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, l_orderkey, l_linenumber, l_suppkey
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_distinct_supp
        |FROM m
        |ORDER BY o_custkey, o_orderdate, l_orderkey, l_linenumber""".stripMargin,
    "window_moving_avg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS moving_avg,
        |  COUNT(*) OVER w AS frame_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_ntile" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "window_row_number" ->
      """SELECT c_custkey, c_name,
        |  row_number() OVER (ORDER BY c_name) + 999 AS file_index
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // the scaled spelling produces byte-identical values to the global
    // row_number — the oracle IS the global form (tie-broken by the
    // primary key, the total order the op requires)
    "window_dense_ids_scaled" ->
      """SELECT c_custkey, c_name,
        |  row_number() OVER (ORDER BY c_name, c_custkey) + 999 AS file_index
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "window_analytic_max" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  MAX(l_quantity) OVER (PARTITION BY l_orderkey) AS max_qty_in_order,
        |  MAX(l_quantity) OVER (PARTITION BY l_orderkey) - l_quantity AS gap_to_max
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "window_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  rank() OVER w AS bal_rank, dense_rank() OVER w AS bal_dense_rank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
        |QUALIFY bal_rank <= 5
        |ORDER BY c_nationkey, bal_rank""".stripMargin,
    "window_lag_sum" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
  )
}
