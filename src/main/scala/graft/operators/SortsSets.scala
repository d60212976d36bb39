package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k / set ops — SURVEY.md §2.6.
  *
  * sort_topk compiles to TakeOrderedAndProject (per-partition heap +
  * driver merge of k rows) — O(n) not O(n log n), and no global sort
  * shuffle; that's the operator to reach for at 100 TB, never a full
  * orderBy().limit().collect-style pipeline.
  */
object SortsSets {

  /** O1 (raw_to_samples.py:126): total-order sort. */
  def sortOrderby(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select("p_partkey", "p_name", "p_type", "p_retailprice")
      .orderBy(col("p_type").asc, col("p_name").asc, col("p_partkey").asc)

  /** O3 (raw_to_samples.py:129,236,262): head-of-group pick — first
    * event per user in id order (deterministic, not limit(1)).
    * Written in the idiomatic row_number spelling; with the engine
    * enabled, RewriteRowNumberTopK turns it into the bounded-heap
    * TopKPerKey operator (k=1) — no per-partition sort. */
  def sortLimit(s: SparkSession, dir: String): DataFrame = {
    graft.plans.Graft.enable(s)
    val w = Window.partitionBy("user_id").orderBy(col("event_id").asc)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy("user_id")
  }

  /** O4a: top-k by aggregate — top 10 customers by total spend
    * (spend desc, key asc tie-break → deterministic). */
  def sortTopk(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(Exact.sumD(col("o_totalprice")).as("total_spend"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spend").desc, col("o_custkey").asc)
      .limit(10)

  /** O2 (preprocessed_to_raw.py:51): union/append of two catalogs. */
  def setUnion(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), lit("urgent").as("bucket"))
    val pricey = o.filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), lit("pricey").as("bucket"))
    urgent.unionByName(pricey).orderBy("o_orderkey", "bucket")
  }

  /** O4b: INTERSECT (distinct) — nations present on both the customer
    * and supplier side. */
  def setIntersect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      .intersect(
        Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** O4c: EXCEPT (distinct) — customers with open orders and no
    * finished ones. */
  def setExcept(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** O4e: bag-semantics set ops — INTERSECT ALL / EXCEPT ALL keep
    * multiplicities (count-min per key), unlike the distinct forms
    * above. Spark plans both as aggregate+join on (value, count) — no
    * row-level materialization of the multiset. */
  def setBagOps(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val a = li.filter(col("l_returnflag") === "R")
      .select(col("l_suppkey").as("k"))
    val b = li.filter(col("l_linestatus") === "F")
      .select(col("l_suppkey").as("k"))
    a.intersectAll(b).groupBy("k").agg(count(lit(1)).as("n_inter"))
      .join(
        a.exceptAll(b).groupBy("k").agg(count(lit(1)).as("n_except")),
        Seq("k"), "full_outer")
      .na.fill(0L, Seq("n_inter", "n_except"))
      .orderBy("k")
  }

  /** O4d: grouped top-k through the custom bounded-heap operator
    * (graft.plans.TopKPerKey) — top 3 orders per customer by price.
    * Same result as the Window(row_number)+Filter spelling, pinned by
    * TopKSpec; O(n log k) instead of a full per-partition sort. */
  def topkPerKey(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    graft.plans.TopK.of(o, Seq("o_custkey"), "o_totalprice",
        desc = true, k = 3, tiebreak = Seq("o_orderkey"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topk_per_key" -> topkPerKey,
    "sort_orderby" -> sortOrderby,
    "sort_limit" -> sortLimit,
    "sort_topk" -> sortTopk,
    "set_union" -> setUnion,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "set_bag_ops" -> setBagOps,
  )

  val oracles: Map[String, String] = Map(
    "set_bag_ops" ->
      """WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'),
        |b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'F'),
        |ia AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_inter
        |       FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k),
        |ea AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_except
        |       FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k)
        |SELECT COALESCE(ia.k, ea.k) AS k,
        |  COALESCE(n_inter, 0) AS n_inter,
        |  COALESCE(n_except, 0) AS n_except
        |FROM ia FULL OUTER JOIN ea ON ia.k = ea.k
        |ORDER BY k""".stripMargin,
    "topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "sort_orderby" ->
      """SELECT p_partkey, p_name, p_type, p_retailprice FROM part
        |ORDER BY p_type ASC, p_name ASC, p_partkey ASC""".stripMargin,
    "sort_limit" ->
      """SELECT user_id, event_id, event_type FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id ASC) = 1
        |ORDER BY user_id""".stripMargin,
    "sort_topk" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY total_spend DESC, o_custkey ASC LIMIT 10""".stripMargin,
    "set_union" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, 'urgent' AS bucket FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderkey, 'pricey' AS bucket FROM orders
        |  WHERE o_totalprice > 400000.0)
        |ORDER BY o_orderkey, bucket""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
  )
}
