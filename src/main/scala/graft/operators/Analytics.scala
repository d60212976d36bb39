package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Analytic extensions beyond the reference's surface: grouping sets,
  * distribution window functions, pivot, moment statistics, regex and
  * conditional scalar functions. All follow the engine's determinism
  * conventions (integer/decimal arithmetic, one double division at the
  * end, total-order output).
  */
object Analytics {

  /** Typed row for [[typedPipeline]]. */
  case class LineSlim(l_orderkey: Long, l_quantity: Double,
      l_returnflag: String)

  /** A8+: GROUPING SETS with grouping_id disambiguation. */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  COUNT(*) AS n_orders
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
        |""".stripMargin)
  }

  /** W4c: distribution window functions — ntile / percent_rank /
    * cume_dist over a total per-partition order (all rank-derived
    * integer ratios: bit-deterministic). */
  def windowDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("c_nationkey", "c_custkey")
  }

  /** A10: pivot — event counts per user fanned to one column per
    * event_type (fixed column list, as a distributed pivot should at
    * scale: never values-discovery over 100 TB). */
  def aggPivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type",
        Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** A11: moment statistics via explicit exact sums (sum, sum of
    * squares in DECIMAL) so variance/stddev are reproducible — the
    * built-in stddev's streaming update order is engine-specific. */
  def aggStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("s1"),
        sum((col("l_quantity") * col("l_quantity"))).as("s2"))
      .select(col("l_returnflag"), col("n"), col("s1"),
        ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
          .as("variance"),
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
          .as("stddev"))
      .orderBy("l_returnflag")

  /** F13: regex extract/replace/match (patterns in the common
    * Java/RE2 subset). */
  def fnRegex(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        regexp_extract(col("source"), "src([0-9]+)", 1).as("src_num"),
        regexp_replace(col("lang"), "[aeiou]", "_").as("lang_masked"),
        col("source").rlike("^src1[0-9]$").as("is_teen_src"))
      .orderBy("doc_id")

  /** SQL frontend, TPC-H Q4 shape ("Order Priority Checking"): order
    * counts per priority for one quarter, kept only when a correlated
    * EXISTS finds a returned line (stands in for the commit-vs-receipt
    * lateness test; the slim schema has no commit/receipt dates) —
    * decorrelates to a left-semi join. */
  def sqlQ4(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM v_orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM v_lineitem l
        |    WHERE l.l_orderkey = o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** SQL frontend, TPC-H Q6 shape ("Forecasting Revenue Change"): the
    * fully-pushed-down scan-and-sum — every predicate reaches the
    * parquet scan, the aggregate is one partial+final pair over zero
    * joins. Money in DECIMAL end-to-end. */
  def sqlQ6(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM v_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin)
  }

  /** SQL frontend, TPC-H Q13 shape ("Customer Distribution"): the
    * order-count histogram over customers — a LEFT JOIN with an
    * extra join-condition filter (so no-order customers keep their
    * zero bucket), then two levels of aggregation. */
  def sqlQ13(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM v_customer LEFT JOIN v_orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  /** SQL frontend, TPC-H Q19 shape ("Discounted Revenue"): revenue
    * under a disjunction of (brand, size-range, quantity-range)
    * triples — the OR-of-ANDs filter that exercises predicate
    * simplification across a fact-dim join (the shared p_partkey =
    * l_partkey conjunct must still push into the join; the residual
    * OR evaluates post-join). */
  def sqlQ19(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.part(s, dir).createOrReplaceTempView("v_part")
    s.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 1 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
        |       AND l_quantity BETWEEN 10 AND 40)""".stripMargin)
  }

  /** SQL frontend: correlated LATERAL subquery — top-1 order per
    * customer with ORDER BY + LIMIT inside the lateral body, the
    * modern spelling of top-k-per-key in pure SQL (Spark 4
    * decorrelates it to the same window/join machinery topk_per_key
    * uses; DuckDB runs the identical text). Customers with no orders
    * drop (inner lateral). */
  def sqlLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM v_customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM v_orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |ORDER BY c_custkey""".stripMargin)
  }

  /** SQL frontend: WITH RECURSIVE — a gap-free daily calendar spine
    * generated by recursion (the classic SQL idiom; ts_gapfill builds
    * the same spine with sequence()+explode), left-joined to daily
    * order counts for one quarter. Both engines run the identical
    * recursive text; the recursion depth is bounded by the date range,
    * never the data volume. */
  def sqlRecursive(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """WITH RECURSIVE days(d) AS (
        |  SELECT TIMESTAMP '1995-01-01 00:00:00'
        |  UNION ALL SELECT d + INTERVAL '1' DAY FROM days
        |  WHERE d < TIMESTAMP '1995-03-31 00:00:00')
        |SELECT CAST(d.d AS DATE) AS day, COUNT(o.o_orderkey) AS n_orders
        |FROM days d LEFT JOIN v_orders o
        |  ON date_trunc('day', o.o_orderdate) = d.d
        |GROUP BY d.d ORDER BY day""".stripMargin)
  }

  /** F17: URL algebra — the host / path / query-parameter extraction
    * every crawl-derived corpus pipeline runs before domain-level
    * filtering ([[graft.functions.Corpus]] sample_domain_cap consumes
    * exactly this host). URLs are constructed deterministically from
    * the catalog columns (the testdata has no URL column), then parsed
    * back with `parse_url` — a codegen'd built-in, never a UDF. The
    * oracle mirrors with anchored regexes, which also pins that the
    * parse is RFC-shaped rather than substring-lucky. */
  def fnUrl(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.com/"),
          col("lang"), lit("/doc-"), col("doc_id"),
          lit("?ref=crawl&page="), pmod(col("doc_id"), lit(7)))
          .as("url"))
      .select(col("doc_id"), col("url"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("page")).as("page"))
      .orderBy("doc_id")

  /** F14: conditional scalar functions — coalesce / nullif / least /
    * greatest over the error-prone columns. */
  def fnConditional(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        coalesce(nullif(col("event_type"), lit("error")), lit("recovered"))
          .as("etype"),
        least(col("value"), lit(100.0)).as("capped"),
        greatest(col("user_id") % 7, col("event_id") % 5).as("gmax"))
      .orderBy("event_id")

  /** A12: typed Aggregator (Dataset tier) — argmax: the event id
    * carrying each user's maximum value, ties to the smaller id. */
  def aggTypedArgmax(s: SparkSession, dir: String): DataFrame = {
    val argmax = udaf(new graft.plans.ArgMax)
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(argmax(col("value"), col("event_id")).as("top_event_id"),
        max(col("value")).as("max_value"))
      .orderBy("user_id")
  }

  /** A13: exact percentiles with linear interpolation (Spark
    * `percentile` == DuckDB `quantile_cont` on the (n-1)*p rank
    * definition; quantity is integer-valued so interpolated halves are
    * exact in double). */
  def aggPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** F15: string functions — reverse / position / repeat / replace. */
  def fnString(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        reverse(lower(col("c_mktsegment"))).as("rev_seg"),
        instr(col("c_name"), "#").as("hash_pos"),
        repeat(lit("ab"), (col("c_nationkey") % 3) + 1).as("rep"),
        regexp_replace(col("c_name"), "Customer#", "C-").as("short_name"))
      .orderBy("c_custkey")

  /** F16: array set algebra over token arrays (sorted-canonical string
    * output — raw array columns don't hash-compare portably). */
  def fnArraySet(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        array_join(array_sort(array_distinct(slice(col("toks"), 1, 10))), ",")
          .as("first10_sorted"),
        array_contains(col("toks"), "the").as("has_the"),
        size(col("toks")).as("n_toks"))
      .orderBy("doc_id")

  /** W4d: RANGE window frame — per customer, total spend over orders
    * within the previous 90 days (value-based frame on an integer day
    * axis; rowsBetween is windowLagSum). */
  def windowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("d"))
      .rangeBetween(-90, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("d"))
      .withColumn("spend_90d",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double"))
      .orderBy("o_custkey", "d", "o_orderkey")
  }

  /** W4e: first/last/nth value over an explicit running frame. */
  def windowValueFns(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("latest_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** F17: ANSI null semantics — count(col) vs count(*), null-safe
    * equality, sum over an all-null group. */
  def fnNullHandling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"),
        nullif(col("event_type"), lit("error")).as("et"),
        when(col("event_type") === "error", lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_all"),
        count(col("et")).as("n_nonnull"),
        Exact.sumD(col("v")).as("sum_ok"),
        sum(when(col("et").isNull, 1L).otherwise(0L)).as("n_errors"),
        count(when(col("et") <=> lit(null), 1)).as("n_nullsafe"))
      .orderBy("user_id")

  /** A14: unpivot/melt — the pivot's inverse (wide per-status counts
    * back to long form). */
  def aggUnpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("open"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("finished"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("pending"))
    wide.unpivot(Array(col("o_orderpriority")),
        Array(col("open"), col("finished"), col("pending")),
        "status", "n_orders")
      .orderBy("o_orderpriority", "status")
  }

  /** SQL frontend parity: the TPC-H Q3 shape submitted as SQL text
    * through spark.sql over registered views — same Catalyst pipeline
    * as the DataFrame API, same exact-decimal conventions. */
  def sqlQ3(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  o_orderpriority
        |FROM v_customer
        |JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin)
  }

  /** SQL frontend, TPC-H Q5 shape: the 6-way star — fact lineitem
    * against customer/orders/supplier/nation/region dims with the
    * c_nationkey = s_nationkey "local supplier" twist — submitted as
    * SQL text. The dims broadcast; Catalyst reorders the join tree and
    * pushes the region/date filters below the joins. */
  def sqlQ5(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.supplier(s, dir).createOrReplaceTempView("v_supplier")
    Tables.nation(s, dir).createOrReplaceTempView("v_nation")
    Tables.region(s, dir).createOrReplaceTempView("v_region")
    s.sql(
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM v_customer
        |JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |JOIN v_supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN v_nation ON s_nationkey = n_nationkey
        |JOIN v_region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)
  }

  /** SQL frontend, TPC-H Q18 shape: large-volume orders — an IN
    * subquery whose inner query is itself a group-having over the
    * fact table, then re-aggregation of the survivors. Catalyst plans
    * the IN as a left-semi join on the aggregated subquery. */
  def sqlQ18(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM v_customer
        |JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM v_lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin)
  }

  /** SQL frontend, TPC-H Q20 shape: two levels of nested IN — parts by
    * name prefix, inside a grouped-HAVING over lineitem (standing in
    * for partsupp's availqty check), inside the supplier filter.
    * Exercises nested subquery decorrelation into a semi-join chain. */
  def sqlQ20(s: SparkSession, dir: String): DataFrame = {
    Tables.supplier(s, dir).createOrReplaceTempView("v_supplier")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.part(s, dir).createOrReplaceTempView("v_part")
    s.sql(
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM v_supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM v_lineitem
        |  WHERE l_partkey IN (
        |    SELECT p_partkey FROM v_part WHERE p_name LIKE 'b%')
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** SQL frontend, TPC-H Q21 shape: suppliers who are the SOLE
    * returned-flag supplier on a multi-supplier finished order — a
    * correlated EXISTS (some other supplier on the order) plus a
    * correlated NOT EXISTS (no other supplier also returned), the
    * hardest decorrelation shape in the TPC-H suite: Catalyst plans
    * the pair as a left-semi then left-anti join against the same
    * fact table, both shuffle-keyed on the order key. (The testdata
    * lineitem has no receipt/commit dates, so l_returnflag = 'R'
    * stands in for "delivered late" with identical query structure —
    * TPC-H Q21, "Suppliers Who Kept Orders Waiting".) */
  def sqlQ21(s: SparkSession, dir: String): DataFrame = {
    Tables.supplier(s, dir).createOrReplaceTempView("v_supplier")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM v_supplier
        |JOIN v_lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN v_orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM v_lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM v_lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin)
  }

  /** SQL frontend, TPC-H Q10 shape ("Returned Item Reporting"): top
    * customers by revenue lost to returns in one half-year — a
    * fact-dims join under a selective flag + date filter, grouped per
    * customer, top 20 by revenue. Revenue stays DECIMAL until one
    * final double cast; the revenue tie breaks by c_custkey so the
    * LIMIT is a total order (TakeOrderedAndProject, never a global
    * sort). */
  def sqlQ10(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.nation(s, dir).createOrReplaceTempView("v_nation")
    s.sql(
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM v_customer
        |JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |JOIN v_nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin)
  }

  /** SQL frontend, TPC-H Q16 shape ("Parts/Supplier Relationship"):
    * distinct-supplier counts per (brand, type, size) combination,
    * excluding one brand and a NOT-IN supplier subquery
    * (below-average balance stands in for the complaints filter; the
    * slim schema has no partsupp, so lineitem provides the
    * part-supplier pairs). The average threshold is spelled as the
    * exact cross-multiplied DECIMAL comparison bal*n < sum so both
    * engines decide the boundary in exact arithmetic. The exclusion is
    * a NOT EXISTS (not NOT IN): identical on non-null keys, but NOT IN
    * has three-valued-logic semantics — one NULL key in the subquery
    * empties the whole result — so the anti-join spelling is the
    * fixture-proof form. */
  def sqlQ16(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("v_part")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.supplier(s, dir).createOrReplaceTempView("v_supplier")
    s.sql(
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM v_part JOIN v_lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 2, 3, 4, 5, 10, 20, 30)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM v_supplier s
        |    WHERE s.s_suppkey = l_suppkey
        |      AND CAST(s.s_acctbal AS DECIMAL(18,2))
        |        * (SELECT COUNT(*) FROM v_supplier)
        |      < (SELECT SUM(CAST(s_acctbal AS DECIMAL(18,2)))
        |         FROM v_supplier))
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
  }

  /** SQL frontend, TPC-H Q22 shape ("Global Sales Opportunity"):
    * above-average-balance customers with no recent orders, bucketed
    * by country code — a scalar-subquery threshold plus a correlated
    * NOT EXISTS (anti join), aggregated per code. The slim schema has
    * no phone column, so nationkey % 10 stands in for the country
    * code and "dormant" means no order since 1999; the average
    * threshold uses the same exact cross-multiplied DECIMAL
    * comparison as [[sqlQ16]]. */
  def sqlQ22(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode,
        |  COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM v_customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,2))
        |    * (SELECT COUNT(*) FROM v_customer WHERE c_acctbal > 0)
        |  > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |     FROM v_customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM v_orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_nationkey % 10
        |ORDER BY cntrycode""".stripMargin)
  }

  /** SQL frontend, TPC-H Q7 shape ("Volume Shipping"): cross-border
    * revenue flow by ship year, in both directions — the classic
    * two-role dimension pattern (nation joined twice, as supplier's
    * and customer's) with a directed pair filter. Nations are grouped
    * into two trade blocs by nationkey parity so the filter keeps
    * volume at every test sf (a single nation pair is empty at
    * sf0.001). Catalyst broadcasts both nation sides; the fact scan
    * keeps the ship-date range pushed down. Money through
    * DECIMAL(18,2) with one double cast at the end (graft.Exact
    * convention). */
  def sqlQ7(s: SparkSession, dir: String): DataFrame = {
    Tables.supplier(s, dir).createOrReplaceTempView("v_supplier")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.nation(s, dir).createOrReplaceTempView("v_nation")
    s.sql(
      """SELECT CASE WHEN n1.n_nationkey % 2 = 0 THEN 'BLOC_EVEN'
        |    ELSE 'BLOC_ODD' END AS supp_bloc,
        |  CASE WHEN n2.n_nationkey % 2 = 0 THEN 'BLOC_EVEN'
        |    ELSE 'BLOC_ODD' END AS cust_bloc,
        |  CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM v_supplier
        |JOIN v_lineitem ON s_suppkey = l_suppkey
        |JOIN v_orders ON o_orderkey = l_orderkey
        |JOIN v_customer ON c_custkey = o_custkey
        |JOIN v_nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN v_nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_nationkey % 2 <> n2.n_nationkey % 2
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin)
  }

  /** SQL frontend, TPC-H Q14 shape ("Promotion Effect"): the share of
    * one month's revenue attributable to promo parts — a conditional
    * aggregate over a date-pruned fact-dim join, reduced to a single
    * row. Both sums stay DECIMAL until the one percentage division. */
  def sqlQ14(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.part(s, dir).createOrReplaceTempView("v_part")
    s.sql(
      """SELECT (CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END)
        |    * 20000000000 AS DECIMAL(38,0))
        |   + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))))
        |    * 10000 AS DECIMAL(38,0)))
        |  div (2 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))))
        |    * 10000 AS DECIMAL(38,0)))
        |  / 10000.0 AS promo_revenue_pct
        |FROM v_lineitem JOIN v_part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin)
  }

  /** SQL frontend, TPC-H Q17 shape ("Small-Quantity-Order Revenue"):
    * lineitems of one brand whose quantity is below 20% of that
    * part's average — a correlated scalar subquery over the same fact
    * table. Catalyst decorrelates it into a per-part aggregate joined
    * back (RewriteCorrelatedScalarSubquery); at scale both sides
    * shuffle on partkey, the brand filter prunes the probe side
    * first. */
  def sqlQ17(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.part(s, dir).createOrReplaceTempView("v_part")
    s.sql(
      """SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    / 7.0 AS DOUBLE), 2) AS avg_yearly
        |FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (
        |    SELECT 0.2 * AVG(CAST(l_quantity AS DECIMAL(18,2)))
        |    FROM v_lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }

  /** SQL frontend, TPC-H Q2 shape ("Minimum Cost Supplier"): for each
    * qualifying part, the suppliers offering it at that part's MINIMUM
    * cost — a correlated scalar-min subquery whose inner relation
    * repeats the outer's join+filter chain. The slim schema has no
    * partsupp, so supply cost = MIN(l_extendedprice) per (part,
    * supplier) over lineitem, and the region restriction is the
    * nationkey-parity bloc (the Q7 lesson: single-region supplier sets
    * go empty at sf0.001 with 10 suppliers). Catalyst decorrelates the
    * min into a per-part aggregate joined back; cost stays DECIMAL
    * through the equality and casts to double only in the output. */
  def sqlQ2(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("v_part")
    Tables.supplier(s, dir).createOrReplaceTempView("v_supplier")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.nation(s, dir).createOrReplaceTempView("v_nation")
    s.sql(
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
        |  FROM v_lineitem JOIN v_supplier ON s_suppkey = l_suppkey
        |  WHERE s_nationkey % 2 = 0
        |  GROUP BY l_partkey, l_suppkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, s_suppkey,
        |  CAST(supplycost AS DOUBLE) AS supplycost
        |FROM v_part
        |JOIN cost ON p_partkey = l_partkey
        |JOIN v_supplier ON s_suppkey = l_suppkey
        |JOIN v_nation ON s_nationkey = n_nationkey
        |WHERE p_size <= 10 AND p_type = 'PROMO'
        |  AND supplycost = (SELECT MIN(c2.supplycost) FROM cost c2
        |                    WHERE c2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, p_partkey, s_suppkey
        |LIMIT 100""".stripMargin)
  }

  /** SQL frontend, TPC-H Q8 shape ("National Market Share"): one
    * bloc's share of a market's promo-part revenue per year — the
    * conditional-sum-over-sum ratio with nation joined in BOTH roles
    * (customer's nation picks the market region, supplier's nation
    * picks the bloc). Both sums stay DECIMAL and the 4-decimal
    * half-away rounding happens in exact 128-bit integer arithmetic
    * — round(num/den, 4) on the double quotient of two exact
    * decimals is the ts_gapfill ulp-tie hazard (the sql_q14 ratio
    * recipe, hardened). */
  def sqlQ8(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("v_part")
    Tables.supplier(s, dir).createOrReplaceTempView("v_supplier")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.nation(s, dir).createOrReplaceTempView("v_nation")
    Tables.region(s, dir).createOrReplaceTempView("v_region")
    s.sql(
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |  (CAST(SUM(CASE WHEN n2.n_nationkey % 2 = 0
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END)
        |      * 200000000 AS DECIMAL(38,0))
        |   + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2))))
        |      * 10000 AS DECIMAL(38,0)))
        |   div (2 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2))))
        |      * 10000 AS DECIMAL(38,0)))
        |   / 10000.0 AS mkt_share
        |FROM v_lineitem
        |JOIN v_part ON p_partkey = l_partkey AND p_type = 'PROMO'
        |JOIN v_supplier ON s_suppkey = l_suppkey
        |JOIN v_orders ON o_orderkey = l_orderkey
        |JOIN v_customer ON c_custkey = o_custkey
        |JOIN v_nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN v_region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |JOIN v_nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY YEAR(o_orderdate)
        |ORDER BY o_year""".stripMargin)
  }

  /** SQL frontend, TPC-H Q9 shape ("Product Type Profit"): profit by
    * supplier nation and order year over parts matching a name
    * pattern; the slim schema's p_retailprice stands in for
    * ps_supplycost, so profit = revenue - retailprice*quantity, all
    * DECIMAL until one final double cast. The LIKE filter pushes into
    * the part scan; nation/supplier broadcast. */
  def sqlQ9(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("v_part")
    Tables.supplier(s, dir).createOrReplaceTempView("v_supplier")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.nation(s, dir).createOrReplaceTempView("v_nation")
    s.sql(
      """SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
        |FROM v_lineitem
        |JOIN v_part ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
        |JOIN v_supplier ON s_suppkey = l_suppkey
        |JOIN v_nation ON s_nationkey = n_nationkey
        |JOIN v_orders ON o_orderkey = l_orderkey
        |GROUP BY n_name, YEAR(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin)
  }

  /** SQL frontend, TPC-H Q11 shape ("Important Stock Identification"):
    * parts whose one-bloc inventory value exceeds 1.5x the average
    * part's — a grouped aggregate filtered against scalar subqueries
    * over ITS OWN relation (the view-reused-three-ways shape). The
    * threshold is the exact cross-multiplied integer comparison
    * value*n*2 > 3*total (the sql_q16/q22 convention): no float
    * boundary, identical BIGINT/DECIMAL decisions in both engines.
    * (TPC-H's fixed 0.0001 fraction is corpus-size-relative — a
    * scale-invariant above-average multiple keeps the result non-empty
    * at every test sf.) */
  def sqlQ11(s: SparkSession, dir: String): DataFrame = {
    Tables.supplier(s, dir).createOrReplaceTempView("v_supplier")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """WITH val AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS value
        |  FROM v_lineitem JOIN v_supplier ON s_suppkey = l_suppkey
        |  WHERE s_nationkey % 2 = 0
        |  GROUP BY l_partkey)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS value
        |FROM val
        |WHERE value * (SELECT COUNT(*) FROM val) * 2
        |    > 3 * (SELECT SUM(value) FROM val)
        |ORDER BY value DESC, l_partkey""".stripMargin)
  }

  /** SQL frontend, TPC-H Q12 shape ("Shipping Modes and Order
    * Priority"): per line status (the schema's stand-in for shipmode),
    * how many high- vs low-priority orders shipped late in one year —
    * the two-way conditional count over a fact-dim join, with
    * "shipped after the order date" standing in for the
    * commit < receipt lateness predicate. */
  def sqlQ12(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM v_orders JOIN v_lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin)
  }

  /** SQL frontend, TPC-H Q15 shape ("Top Supplier"): the revenue view
    * consumed twice — once joined against supplier, once reduced to a
    * scalar MAX the outer query filters on. Revenue stays DECIMAL
    * through the equality (exact tie semantics: every supplier at the
    * max survives), cast to double only in the output. */
  def sqlQ15(s: SparkSession, dir: String): DataFrame = {
    Tables.supplier(s, dir).createOrReplaceTempView("v_supplier")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
        |  FROM v_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE)
        |    AS total_revenue
        |FROM v_supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** SQL subquery surface: a correlated scalar subquery (per-customer
    * order count) and a correlated EXISTS filter in one statement —
    * the shapes Catalyst decorrelates into aggregates + joins
    * (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery), a
    * lifecycle feature the DataFrame API spells as explicit joins. */
  def sqlSubqueries(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT c_custkey, c_name,
        |  (SELECT COUNT(*) FROM v_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM v_customer c
        |WHERE EXISTS (SELECT 1 FROM v_orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Typed Dataset[T] pipeline — compile-time field checks through
    * case-class Encoders, ending back in a DataFrame for the contract.
    * (Dataset where type safety helps, DataFrame at the boundary —
    * SURVEY.md §1.2 stance.) */
  def typedPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .as[Analytics.LineSlim]
    ds.filter(_.l_quantity > 30.0)
      .map(l => (l.l_returnflag, l.l_quantity))
      .groupByKey(_._1)
      .mapGroups((flag, it) => {
        var n = 0L; var sum = 0.0
        it.foreach { case (_, q) => n += 1; sum += q } // integral doubles: exact
        (flag, n, sum)
      })
      .toDF("l_returnflag", "n_big", "sum_qty")
      .orderBy("l_returnflag")
  }

  /** A15: Pearson correlation from exact integer moment sums (the
    * built-in corr's streaming update is order-dependent; n*Sxy etc.
    * stay exact integers in double range, one sqrt+division at the
    * end). */
  def aggCorr(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sx"),
        sum(col("l_linenumber").cast("double")).as("sy"),
        sum(col("l_quantity") * col("l_linenumber")).as("sxy"),
        sum(col("l_quantity") * col("l_quantity")).as("sxx"),
        sum(col("l_linenumber").cast("double") * col("l_linenumber"))
          .as("syy"))
      .select(col("l_returnflag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))))
          .as("corr_qty_line"))
      .orderBy("l_returnflag")

  /** A16: least-squares regression from exact integer moment sums —
    * per-group slope/intercept of price-vs-quantity in ppm, the
    * trend-line profiling step next to [[aggCorr]]'s correlation. x =
    * whole-unit quantity, y = whole-dollar price (explicit floor, not
    * a bare cast — DuckDB rounds casts): all five moments are BIGINT
    * sums, and the closed forms run through DECIMAL(38,0) so
    * n*Sxy never overflows; one integral DIV at the end. Both engines
    * replay the identical integers (DuckDB reaches the same values in
    * HUGEINT). Bound: exact while n*Sxy < 10^38 — effectively any
    * per-group shard. */
  def aggRegression(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        floor(col("l_quantity")).cast("long").as("x"),
        floor(col("l_extendedprice")).cast("long").as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
        expr("""CAST((CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)
               |  * 1000000 DIV
               |  (CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)
               |  AS BIGINT)""".stripMargin).as("slope_ppm"))
      .select(col("l_returnflag"), col("n"), col("slope_ppm"),
        expr("CAST((sy * 1000000 - slope_ppm * sx) DIV n AS BIGINT)")
          .as("intercept_ppm"))
      .orderBy("l_returnflag")

  /** Robust anomaly detection via median absolute deviation: an event
    * is anomalous when its deviation from the per-type median exceeds
    * 3 robust standard deviations (MAD x 1.4826, the normal-
    * consistency constant) — the outlier filter that, unlike
    * mean/stddev z-scores, is not itself dragged by the outliers it
    * hunts. Two grouped medians (per-type median, then median of
    * absolute deviations) with the tiny per-type model joined back
    * broadcast. The default EXACT median shuffles each type's full
    * value set to one reducer — fine for bounded type cardinality and
    * required for the bit-exact oracle; `approxAccuracy = Some(acc)`
    * swaps BOTH medians for the percentile_approx Greenwald-Khanna
    * sketch (mergeable, map-side combined — no per-group value
    * buffering), the 100 TB operating mode. RobustnessSpec bounds the
    * approx model against the exact one at two scale factors. */
  /** The per-type robust location/scale model behind [[anomalyMadOn]]
    * — (event_type, med) and (event_type, mad) relations, exact by
    * default, Greenwald-Khanna sketched when `approxAccuracy` is set.
    * Exposed so the approx/exact error bound is testable directly. */
  def madModelOn(events: DataFrame,
      approxAccuracy: Option[Int] = None): (DataFrame, DataFrame) = {
    def med(c: Column): Column = approxAccuracy match {
      case Some(acc) => percentile_approx(c, lit(0.5), lit(acc))
      case None => median(c)
    }
    val m = events.groupBy("event_type").agg(med(col("value")).as("med"))
    val mad = events.join(broadcast(m), "event_type")
      .select(col("event_type"), abs(col("value") - col("med")).as("adev"))
      .groupBy("event_type").agg(med(col("adev")).as("mad"))
    (m, mad)
  }

  def anomalyMadOn(events: DataFrame,
      approxAccuracy: Option[Int] = None): DataFrame = {
    val (med, mad) = madModelOn(events, approxAccuracy)
    val dev = events
      .join(broadcast(med), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        abs(col("value") - col("med")).as("adev"))
    dev
      .join(broadcast(mad), "event_type")
      // mad = 0 (over half the group equals its median) is a
      // degenerate scale: every deviation would flag and rz divides
      // by zero — such groups are skipped, matching robust-stats
      // practice of requiring a positive scale estimate
      .filter(col("mad") > 0 && col("adev") > lit(4.4478) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("adev") / (lit(1.4826) * col("mad")), 4).as("rz"))
      .orderBy("event_id")
  }

  def anomalyMad(s: SparkSession, dir: String): DataFrame =
    anomalyMadOn(Tables.events(s, dir))

  /** L19y: daily-VOLUME anomaly audit — the first alert every
    * production pipeline wires (did a source silently stop sending?
    * did a retry storm double a day?): per (event_type, day) row
    * counts on a ZERO-FILLED calendar spine (a missing day is the
    * single most important anomaly, and the naive rollup-only shape
    * cannot see it — no row, no alert), then the [[madModelOn]]
    * robust location/scale applied to the count series: 'missing' for
    * zero-count days, 'volume' when |n − med| > 3·1.4826·MAD (the
    * anomaly_mad gate on counts instead of values, same degenerate
    * mad=0 guard), 'ok' otherwise. Medians run on the day-bounded
    * per-type relation; the spine is |types|×|days|; the model joins
    * broadcast. Emitting every day (not only flags) keeps the audit
    * self-describing — absence of alerts is itself evidence. */
  def dqVolumeAnomalyOn(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("d"))
    val filled = spine.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"))
      .localCheckpoint(true) // model + readout passes
    val m = filled.groupBy("event_type").agg(median(col("n")).as("med"))
    val mad = filled.join(broadcast(m), "event_type")
      .select(col("event_type"), abs(col("n") - col("med")).as("adev"))
      .groupBy("event_type").agg(median(col("adev")).as("mad"))
    filled.join(broadcast(m), "event_type")
      .join(broadcast(mad), "event_type")
      .select(col("event_type"), col("d"), col("n"), col("med"), col("mad"),
        when(col("n") === 0L, "missing")
          .when(col("mad") > 0 &&
            abs(col("n") - col("med")) > lit(4.4478) * col("mad"), "volume")
          .otherwise("ok").as("flag"))
      .orderBy("event_type", "d")
  }

  def dqVolumeAnomaly(s: SparkSession, dir: String): DataFrame =
    dqVolumeAnomalyOn(Tables.events(s, dir))

  /** Interval-union coverage per key — the sweep-line "merge
    * overlapping intervals" aggregate (distinct covered days, merged
    * segment count, raw-vs-covered overlap factor). The classic form
    * of de-overlapping reservations / outages / in-transit windows
    * before summing durations: naive SUM(length) double-counts
    * whenever intervals overlap. Intervals here are each lineitem's
    * in-transit window [shipdate, shipdate + quantity-derived transit
    * days] per supplier (transit = quantity mod 7 + 1, deterministic
    * from the row).
    *
    * The sweep is ONE supplier-keyed window pass (the SCD2 shape):
    * sorted by (start, end), each row's newly-covered days are
    * e - max(s-1, running-max-end-so-far) clamped at 0, so the sum IS
    * |union| without materializing day atoms (no explode — a 90-day
    * interval costs one row, not 90). Segment starts are gap events
    * (s > pmax + 1 in day units, adjacency merges). Tie order within
    * equal starts shifts per-row contributions but never the per-key
    * sums, so the aggregate is deterministic. Scale: one shuffle on
    * the supplier key; day arithmetic is all BIGINT; the final ppm
    * ratio is one non-negative DIV. */
  def aggIntervalUnionOn(lineitem: DataFrame): DataFrame = {
    val w = Window.partitionBy("l_suppkey").orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    lineitem
      .select(col("l_suppkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1992-01-01')" +
          " AS BIGINT)").as("s"),
        expr("CAST(l_quantity AS BIGINT) % 7 + 1").as("transit"))
      .withColumn("e", col("s") + col("transit"))
      .withColumn("pmax", max(col("e")).over(w))
      .withColumn("contrib", greatest(lit(0L),
        col("e") - greatest(col("s") - 1,
          coalesce(col("pmax"), col("s") - 1))))
      .withColumn("new_seg",
        when(col("pmax").isNull || col("s") > col("pmax") + 1, 1L)
          .otherwise(0L))
      .groupBy("l_suppkey")
      .agg(sum(col("contrib")).as("covered_days"),
        sum(col("new_seg")).as("n_segments"),
        sum(col("e") - col("s") + 1).as("raw_days"),
        min(col("s")).as("first_day"), max(col("e")).as("last_day"))
      .withColumn("overlap_ppm",
        expr("raw_days * 1000000 DIV covered_days"))
      .orderBy("l_suppkey")
  }

  def aggIntervalUnion(s: SparkSession, dir: String): DataFrame =
    aggIntervalUnionOn(Tables.lineitem(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_interval_union" -> aggIntervalUnion,
    "anomaly_mad" -> anomalyMad,
    "dq_volume_anomaly" -> dqVolumeAnomaly,
    "agg_corr" -> aggCorr,
    "agg_regression" -> aggRegression,
    "typed_pipeline" -> typedPipeline,
    "sql_q3" -> sqlQ3,
    "sql_q5" -> sqlQ5,
    "sql_q7" -> sqlQ7,
    "sql_q10" -> sqlQ10,
    "sql_q16" -> sqlQ16,
    "sql_q22" -> sqlQ22,
    "sql_q14" -> sqlQ14,
    "sql_q17" -> sqlQ17,
    "sql_q18" -> sqlQ18,
    "sql_q2" -> sqlQ2,
    "sql_q8" -> sqlQ8,
    "sql_q9" -> sqlQ9,
    "sql_q11" -> sqlQ11,
    "sql_q12" -> sqlQ12,
    "sql_q15" -> sqlQ15,
    "sql_q20" -> sqlQ20,
    "sql_q21" -> sqlQ21,
    "sql_subqueries" -> sqlSubqueries,
    "window_range_frame" -> windowRangeFrame,
    "window_value_fns" -> windowValueFns,
    "fn_null_handling" -> fnNullHandling,
    "agg_unpivot" -> aggUnpivot,
    "agg_percentile" -> aggPercentile,
    "fn_string" -> fnString,
    "fn_array_set" -> fnArraySet,
    "agg_typed_argmax" -> aggTypedArgmax,
    "agg_grouping_sets" -> aggGroupingSets,
    "window_dist" -> windowDist,
    "agg_pivot" -> aggPivot,
    "agg_stats" -> aggStats,
    "fn_regex" -> fnRegex,
    "fn_url" -> fnUrl,
    "sql_lateral" -> sqlLateral,
    "sql_q4" -> sqlQ4,
    "sql_q6" -> sqlQ6,
    "sql_q13" -> sqlQ13,
    "sql_q19" -> sqlQ19,
    "sql_recursive" -> sqlRecursive,
    "fn_conditional" -> fnConditional,
  )

  val oracles: Map[String, String] = Map(
    // Mirrors aggIntervalUnionOn: same day grid, same running-max
    // sweep; per-row contributions are tie-order-local but the
    // per-supplier sums are invariant, so the compare is exact.
    "agg_interval_union" ->
      """WITH iv AS (SELECT l_suppkey,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01'
        |      AS BIGINT) AS s,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01'
        |      AS BIGINT) + CAST(l_quantity AS BIGINT) % 7 + 1 AS e
        |  FROM lineitem),
        |sw AS (SELECT l_suppkey, s, e,
        |    MAX(e) OVER (PARTITION BY l_suppkey ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |agg AS (SELECT l_suppkey,
        |    CAST(SUM(GREATEST(0, e - GREATEST(s - 1,
        |      COALESCE(pmax, s - 1)))) AS BIGINT) AS covered_days,
        |    CAST(SUM(CASE WHEN pmax IS NULL OR s > pmax + 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_segments,
        |    CAST(SUM(e - s + 1) AS BIGINT) AS raw_days,
        |    MIN(s) AS first_day, MAX(e) AS last_day
        |  FROM sw GROUP BY l_suppkey)
        |SELECT l_suppkey, covered_days, n_segments, raw_days,
        |  first_day, last_day,
        |  raw_days * 1000000 // covered_days AS overlap_ppm
        |FROM agg ORDER BY l_suppkey""".stripMargin,
    // Mirrors dqVolumeAnomalyOn: zero-filled calendar spine, count
    // median/MAD, the 3*1.4826 gate on counts.
    "dq_volume_anomaly" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |sp AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
        |spine AS (SELECT ty.event_type, sp.d0 + CAST(r.i AS INT) AS d
        |  FROM (SELECT DISTINCT event_type FROM daily) ty, sp,
        |    UNNEST(range(0, CAST(sp.d1 - sp.d0 AS BIGINT) + 1)) r(i)),
        |filled AS (SELECT spine.event_type, spine.d,
        |    COALESCE(daily.n, 0) AS n
        |  FROM spine LEFT JOIN daily
        |    ON spine.event_type = daily.event_type AND spine.d = daily.d),
        |m AS (SELECT event_type, median(n) AS med
        |  FROM filled GROUP BY 1),
        |md AS (SELECT f.event_type, median(abs(f.n - m.med)) AS mad
        |  FROM filled f JOIN m USING (event_type) GROUP BY 1)
        |SELECT f.event_type, f.d, CAST(f.n AS BIGINT) AS n, m.med, md.mad,
        |  CASE WHEN f.n = 0 THEN 'missing'
        |       WHEN md.mad > 0 AND abs(f.n - m.med) > 4.4478 * md.mad
        |         THEN 'volume'
        |       ELSE 'ok' END AS flag
        |FROM filled f JOIN m USING (event_type) JOIN md USING (event_type)
        |ORDER BY f.event_type, f.d""".stripMargin,
    "anomaly_mad" ->
      """WITH med AS (SELECT event_type, median(value) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (SELECT e.event_id, e.event_type, e.value,
        |    abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, median(adev) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_id, d.event_type, d.value,
        |  round(d.adev / (1.4826 * m.mad), 4) AS rz
        |FROM dev d JOIN mad m USING (event_type)
        |WHERE m.mad > 0 AND d.adev > 4.4478 * m.mad
        |ORDER BY d.event_id""".stripMargin,
    "sql_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "sql_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "sql_q20" ->
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (
        |    SELECT p_partkey FROM part WHERE p_name LIKE 'b%')
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
        |ORDER BY s_suppkey""".stripMargin,
    "sql_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "sql_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 2, 3, 4, 5, 10, 20, 30)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM supplier s
        |    WHERE s.s_suppkey = l_suppkey
        |      AND CAST(s.s_acctbal AS DECIMAL(18,2))
        |        * (SELECT COUNT(*) FROM supplier)
        |      < (SELECT SUM(CAST(s_acctbal AS DECIMAL(18,2)))
        |         FROM supplier))
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "sql_q22" ->
      """SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode,
        |  COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,2))
        |    * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
        |  > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |     FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_nationkey % 10
        |ORDER BY cntrycode""".stripMargin,
    "sql_q7" ->
      """SELECT CASE WHEN n1.n_nationkey % 2 = 0 THEN 'BLOC_EVEN'
        |    ELSE 'BLOC_ODD' END AS supp_bloc,
        |  CASE WHEN n2.n_nationkey % 2 = 0 THEN 'BLOC_EVEN'
        |    ELSE 'BLOC_ODD' END AS cust_bloc,
        |  CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM supplier
        |JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_nationkey % 2 <> n2.n_nationkey % 2
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "sql_q2" ->
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
        |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |  WHERE s_nationkey % 2 = 0
        |  GROUP BY l_partkey, l_suppkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, s_suppkey,
        |  CAST(supplycost AS DOUBLE) AS supplycost
        |FROM part
        |JOIN cost ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_size <= 10 AND p_type = 'PROMO'
        |  AND supplycost = (SELECT MIN(c2.supplycost) FROM cost c2
        |                    WHERE c2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, p_partkey, s_suppkey
        |LIMIT 100""".stripMargin,
    "sql_q8" ->
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |  (CAST(SUM(CASE WHEN n2.n_nationkey % 2 = 0
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END)
        |      * 200000000 AS HUGEINT)
        |   + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2))))
        |      * 10000 AS HUGEINT))
        |   // (2 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2))))
        |      * 10000 AS HUGEINT))
        |   / 10000.0 AS mkt_share
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY YEAR(o_orderdate)
        |ORDER BY o_year""".stripMargin,
    "sql_q9" ->
      """SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY n_name, YEAR(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin,
    "sql_q11" ->
      """WITH val AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS value
        |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |  WHERE s_nationkey % 2 = 0
        |  GROUP BY l_partkey)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS value
        |FROM val
        |WHERE value * (SELECT COUNT(*) FROM val) * 2
        |    > 3 * (SELECT SUM(value) FROM val)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "sql_q12" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "sql_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE)
        |    AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "sql_q14" ->
      """SELECT (CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END)
        |    * 20000000000 AS HUGEINT)
        |   + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))))
        |    * 10000 AS HUGEINT))
        |  // (2 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))))
        |    * 10000 AS HUGEINT))
        |  / 10000.0 AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin,
    "sql_q17" ->
      """SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    / 7.0 AS DOUBLE), 2) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (
        |    SELECT 0.2 * AVG(CAST(l_quantity AS DECIMAL(18,2)))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "sql_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "sql_subqueries" ->
      """SELECT c_custkey, c_name,
        |  (SELECT COUNT(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,
    "agg_regression" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
        |  FROM (SELECT l_returnflag,
        |      CAST(floor(l_quantity) AS BIGINT) AS x,
        |      CAST(floor(l_extendedprice) AS BIGINT) AS y
        |    FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
        |    AS BIGINT) AS slope_ppm,
        |  CAST((sy * 1000000
        |      - ((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)) * sx)
        |    // n AS BIGINT) AS intercept_ppm
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "agg_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(l_quantity) AS sx,
        |    SUM(CAST(l_linenumber AS DOUBLE)) AS sy,
        |    SUM(l_quantity * l_linenumber) AS sxy,
        |    SUM(l_quantity * l_quantity) AS sxx,
        |    SUM(CAST(l_linenumber AS DOUBLE) * l_linenumber) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_line
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "typed_pipeline" ->
      """SELECT l_returnflag, COUNT(*) AS n_big, SUM(l_quantity) AS sum_qty
        |FROM lineitem WHERE l_quantity > 30.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "sql_q3" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin,
    "window_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1995-01-01', o_orderdate)
        |    RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_90d
        |FROM orders
        |ORDER BY o_custkey, d, o_orderkey""".stripMargin,
    "window_value_fns" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS latest_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "fn_null_handling" ->
      """WITH t AS (
        |  SELECT user_id, NULLIF(event_type, 'error') AS et,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_all, COUNT(et) AS n_nonnull,
        |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_ok,
        |  CAST(SUM(CASE WHEN et IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        |  COUNT(CASE WHEN et IS NOT DISTINCT FROM NULL THEN 1 END) AS n_nullsafe
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_unpivot" ->
      """WITH wide AS (
        |  SELECT o_orderpriority,
        |    SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS open,
        |    SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS finished,
        |    SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS pending
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, status, CAST(n_orders AS BIGINT) AS n_orders
        |FROM wide UNPIVOT (n_orders FOR status IN (open, finished, pending))
        |ORDER BY o_orderpriority, status""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.9) AS p90,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "fn_string" ->
      """SELECT c_custkey,
        |  reverse(lower(c_mktsegment)) AS rev_seg,
        |  CAST(strpos(c_name, '#') AS INT) AS hash_pos,
        |  repeat('ab', (c_nationkey % 3) + 1) AS rep,
        |  replace(c_name, 'Customer#', 'C-') AS short_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_array_set" ->
      """SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(string_split(text,' ')[1:10])), ',') AS first10_sorted,
        |  list_contains(string_split(text,' '), 'the') AS has_the,
        |  CAST(len(string_split(text,' ')) AS INT) AS n_toks
        |FROM documents ORDER BY doc_id""".stripMargin,
    "agg_typed_argmax" ->
      """SELECT user_id, event_id AS top_event_id, value AS max_value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY value DESC, event_id ASC) = 1
        |ORDER BY user_id""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin,
    "window_dist" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "agg_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS s1,
        |  (SUM(l_quantity*l_quantity) - SUM(l_quantity)*SUM(l_quantity)/COUNT(*)) / (COUNT(*)-1) AS variance,
        |  sqrt((SUM(l_quantity*l_quantity) - SUM(l_quantity)*SUM(l_quantity)/COUNT(*)) / (COUNT(*)-1)) AS stddev
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "sql_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "sql_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "sql_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "sql_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 1 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
        |       AND l_quantity BETWEEN 10 AND 40)""".stripMargin,
    "sql_lateral" ->
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |ORDER BY c_custkey""".stripMargin,
    "sql_recursive" ->
      """WITH RECURSIVE days(d) AS (
        |  SELECT TIMESTAMP '1995-01-01 00:00:00'
        |  UNION ALL SELECT d + INTERVAL '1' DAY FROM days
        |  WHERE d < TIMESTAMP '1995-03-31 00:00:00')
        |SELECT CAST(d.d AS DATE) AS day, COUNT(o.o_orderkey) AS n_orders
        |FROM days d LEFT JOIN orders o
        |  ON date_trunc('day', o.o_orderdate) = d.d
        |GROUP BY d.d ORDER BY day""".stripMargin,
    "fn_url" ->
      """WITH u AS (SELECT doc_id,
        |    'https://' || source || '.example.com/' || lang || '/doc-'
        |      || doc_id || '?ref=crawl&page=' || (doc_id % 7) AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
        |  regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page
        |FROM u ORDER BY doc_id""".stripMargin,
    "fn_regex" ->
      """SELECT doc_id,
        |  regexp_extract(source, 'src([0-9]+)', 1) AS src_num,
        |  regexp_replace(lang, '[aeiou]', '_', 'g') AS lang_masked,
        |  regexp_matches(source, '^src1[0-9]$') AS is_teen_src
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_conditional" ->
      """SELECT event_id,
        |  COALESCE(NULLIF(event_type, 'error'), 'recovered') AS etype,
        |  LEAST(value, 100.0) AS capped,
        |  GREATEST(user_id % 7, event_id % 5) AS gmax
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
