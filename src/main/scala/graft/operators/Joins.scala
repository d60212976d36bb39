package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Joins — SURVEY.md §2.3.
  *
  * Strategy selection is deliberate per join: dimension tables
  * (region/nation/band dims) are explicitly `broadcast()` so the fact
  * side never shuffles; fact-to-fact joins (lineitem x orders) shuffle
  * on the join key and land on sort-merge/shuffled-hash, which scales
  * horizontally with executors. Semi/anti joins ship only the key
  * column of the right side.
  */
object Joins {

  /** J1 (preprocess_dataset.py:103-113): tiny-dim lookup as an explicit
    * broadcast join — customer x nation x region, rolled up by region. */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_customers"),
        Exact.sumD(col("c_acctbal")).as("total_acctbal"))
      .orderBy("r_name")

  /** J2 (raw_to_samples.py:159,202-206): large-large equi-join —
    * lineitem x orders on the order key (shuffle join; both sides
    * partition on l_orderkey/o_orderkey). */
  def joinInner(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
      .orderBy("o_orderstatus")

  /** J3 (raw_to_samples.py:209,212-216): semi-join — customers having
    * at least one 2000 order; only o_custkey crosses the wire. */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir)
          .filter(year(col("o_orderdate")) === 2000)
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** J5 (preprocess_dataset.py:55-56): anti-join — the skip-if-exists
    * dedup against the sink, as NOT EXISTS (customers with no URGENT
    * order; unfiltered orders cover every customer at sf>=0.01). */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** J6: multi-way star join (lineitem x orders x customer x nation x
    * region) — revenue by nation for one year. Fact-fact legs shuffle;
    * dim legs broadcast. */
  def joinMultiway(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
          .filter(year(col("o_orderdate")) === 1997),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")

  /** J7 (raw_to_samples.py:336-341 segment-containment analog): range
    * join — quantity bands x lineitem, point-in-interval. The band dim
    * is broadcast so the non-equi predicate is evaluated map-side
    * (BroadcastNestedLoopJoin) — no shuffle of the fact table. */
  def joinRange(s: SparkSession, dir: String): DataFrame = {
    val bands = s.createDataFrame(Seq(
      ("b0_tiny", 0.0, 10.0),
      ("b1_small", 10.0, 20.0),
      ("b2_mid", 20.0, 35.0),
      ("b3_large", 35.0, 50.0),
      ("b4_huge", 50.0, 1e9))).toDF("band", "lo", "hi")
    Tables.lineitem(s, dir)
      .join(broadcast(bands),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy("band")
  }

  /** J8 (engine-added; the reference's nearest analog is matching each
    * frame to its segment state): AS-OF join — for every purchase, the
    * user's most recent click at-or-before it. Composed as
    * union + ignore-nulls running last over one per-user window (the
    * scalable form: one shuffle on user_id, no range cross-join).
    * Time axis = unix_micros(ts): integer microseconds in BOTH engines
    * (DuckDB epoch_us truncates ns the same way), so ordering is
    * bit-deterministic. */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"), col("event_id"))
    val tagged = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), lit(0).as("m"), col("event_id").as("id"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"), lit(1).as("m"), col("event_id").as("id")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus").asc, col("m").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("click_id",
        last(when(col("m") === 0, col("id")), ignoreNulls = true).over(w))
      .withColumn("click_tus",
        last(when(col("m") === 0, col("tus")), ignoreNulls = true).over(w))
      .filter(col("m") === 1 && col("click_id").isNotNull)
      .select(col("user_id"), col("id").as("purchase_id"),
        col("click_id"), (col("tus") - col("click_tus")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** J8b: FORWARD as-of with a tolerance — for every purchase, the
    * user's next click at-or-after it, but only within 30 minutes
    * (the direction+tolerance pair every practical as-of API exposes;
    * pandas merge_asof(direction='forward', tolerance=...)'s shape).
    * Same one-shuffle union+window form as [[joinAsof]], iterated in
    * DESCENDING time so the running last is the nearest following
    * click; clicks at the exact purchase timestamp count (at-or-after,
    * mirroring the backward variant's at-or-before). */
  def joinAsofForward(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tolUs = 30L * 60 * 1000000
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"), col("event_id"))
    val tagged = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), lit(0).as("m"), col("event_id").as("id"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"), lit(1).as("m"), col("event_id").as("id")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus").desc, col("m").asc, col("id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("click_id",
        last(when(col("m") === 0, col("id")), ignoreNulls = true).over(w))
      .withColumn("click_tus",
        last(when(col("m") === 0, col("tus")), ignoreNulls = true).over(w))
      .filter(col("m") === 1 && col("click_id").isNotNull &&
        col("click_tus") - col("tus") <= tolUs)
      .select(col("user_id"), col("id").as("purchase_id"),
        col("click_id"), (col("click_tus") - col("tus")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** J8c: NEAREST as-of — the third direction every practical as-of
    * API exposes (pandas merge_asof(direction='nearest')): for every
    * purchase, the user's closest click in EITHER direction, ties to
    * the earlier (backward) side. Composed from the two directional
    * passes over ONE tagged relation: both windows share the user_id
    * hash partitioning (one shuffle — the second window only re-sorts
    * within partitions), then a per-row argmin picks the smaller gap.
    * Backward ties at equal timestamp resolve to the LATEST click id
    * (the running last in ascending id order), forward ties to the
    * earliest — both mirrored in the oracle's tie-break ordering. */
  def joinAsofNearest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"), col("event_id"))
    val tagged = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), lit(0).as("m"), col("event_id").as("id"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"), lit(1).as("m"), col("event_id").as("id")))
    val wb = Window.partitionBy("user_id")
      .orderBy(col("tus").asc, col("m").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("user_id")
      .orderBy(col("tus").desc, col("m").asc, col("id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val takeBack = col("f_id").isNull || (col("b_id").isNotNull &&
      (col("tus") - col("b_tus")) <= (col("f_tus") - col("tus")))
    tagged
      .withColumn("b_id",
        last(when(col("m") === 0, col("id")), ignoreNulls = true).over(wb))
      .withColumn("b_tus",
        last(when(col("m") === 0, col("tus")), ignoreNulls = true).over(wb))
      .withColumn("f_id",
        last(when(col("m") === 0, col("id")), ignoreNulls = true).over(wf))
      .withColumn("f_tus",
        last(when(col("m") === 0, col("tus")), ignoreNulls = true).over(wf))
      .filter(col("m") === 1 &&
        (col("b_id").isNotNull || col("f_id").isNotNull))
      .select(col("user_id"), col("id").as("purchase_id"),
        when(takeBack, col("b_id")).otherwise(col("f_id")).as("click_id"),
        when(takeBack, col("tus") - col("b_tus"))
          .otherwise(col("f_tus") - col("tus")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** Skew-mitigation pattern: the join key (event_type, 5 hot values
    * over the whole fact table) is salted 8 ways — the fact side gets
    * salt = pmod(event_id, 8), the dim side is replicated per salt, and
    * the join key becomes (event_type, salt), spreading each hot key
    * over 8 reducers. (With a dim this small Spark would broadcast and
    * sidestep skew anyway — the query pins the technique for the
    * shuffle-join case at scale, where AQE skew handling or salting is
    * the difference between one straggler and even reducers.) */
  def joinSalted(s: SparkSession, dir: String): DataFrame = {
    val SALTS = 8
    val dim = s.createDataFrame(Seq(
      ("click", "engage"), ("view", "engage"), ("purchase", "convert"),
      ("signup", "convert"), ("error", "ops"))).toDF("event_type", "category")
    val saltedDim = dim.crossJoin(
      s.range(SALTS).select(col("id").cast("int").as("salt")))
    val fact = Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(SALTS)).cast("int"))
    fact.join(saltedDim, Seq("event_type", "salt"))
      .groupBy("category")
      .agg(count(lit(1)).as("n_events"),
        graft.Exact.sumD(col("value")).as("total_value"))
      .orderBy("category")
  }

  /** J7b: the bucketed range join — the 100 TB path for
    * point-in-interval when neither side broadcasts ("A Scalable and
    * Generic Approach to Range Joins", VLDB 2022): quantize points to
    * fixed-width buckets, replicate each interval into every bucket it
    * overlaps, equi-join on the bucket, then verify the exact
    * predicate. Same output as join_range (BNLJ form), different
    * physical shape: shuffle on bucket instead of a nested loop. */
  def joinRangeBucketed(s: SparkSession, dir: String): DataFrame = {
    val width = 5.0
    val bands = s.createDataFrame(Seq(
      ("b0_tiny", 0.0, 10.0),
      ("b1_small", 10.0, 20.0),
      ("b2_mid", 20.0, 35.0),
      ("b3_large", 35.0, 50.0),
      ("b4_huge", 50.0, 60.0))).toDF("band", "lo", "hi")
    // replicate each band to every width-5 bucket it overlaps
    val bandBuckets = bands.select(col("band"), col("lo"), col("hi"),
      explode(sequence(
        floor(col("lo") / width).cast("long"),
        floor((col("hi") - 0.001) / width).cast("long"))).as("bucket"))
    val pts = Tables.lineitem(s, dir)
      .select(col("l_quantity"),
        floor(col("l_quantity") / width).cast("long").as("bucket"))
    pts.join(bandBuckets, "bucket")
      .filter(col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy("band")
  }

  /** J13: Bloom-pruned join — the runtime-filter pattern (Spark's
    * `spark.sql.optimizer.runtimeFilter.bloomFilter` injects exactly
    * this shape) spelled declaratively so the plan is visible and
    * engine-portable. Build side: the filtered dim's keys are hashed
    * by k=3 affine functions mod M=65536; the distinct set-bit
    * positions (≤ 3·|dim| rows, tiny) stand in for the bit array.
    * Probe side: the fact table computes the same 3 positions and
    * must survive three broadcast LEFT SEMI joins — bloom-positive
    * rows only then reach the exact join, which removes the false
    * positives. At 100 TB the win is that the fact table is pruned
    * map-side BEFORE any shuffle or join build: only
    * |fact ∩ bloom-positive| rows ever carry the wide payload
    * columns. The oracle is the plain exact join — the bloom stage is
    * lossless by construction (no false negatives), so the hash gate
    * doubles as the completeness proof, same trick as
    * dedup_prefix_filter. */
  def joinBloom(s: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    val M = 65536L
    def pos(key: org.apache.spark.sql.Column, j: Int) =
      pmod(pmod(key, lit(P)) * lit(2L * j + 3) + lit(97L * j + 31), lit(P)) % lit(M)
    val dim = Tables.part(s, dir).filter(col("p_size") >= 45)
      .select(col("p_partkey"), col("p_brand"))
    val bits = (0 until 3)
      .map(j => dim.select(pos(col("p_partkey"), j).as("bitpos")))
      .reduce(_ union _).distinct()
    val probed = (0 until 3).foldLeft(
      Tables.lineitem(s, dir)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")) {
      (df, j) =>
        df.join(broadcast(bits), pos(col("l_partkey"), j) === col("bitpos"),
          "left_semi")
    }
    probed.join(broadcast(dim), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("sum_qty"),
        Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
      .orderBy("p_brand")
  }

  /** J9: LEFT OUTER — every customer with its order count (0 kept). */
  def joinLeftOuter(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        Exact.sumD(coalesce(col("o_totalprice"), lit(0.0)))
          .as("total_spend"))
      .orderBy("c_custkey")

  /** J10: FULL OUTER — customer-side vs supplier-side nation presence
    * (unmatched keys survive from both sides). */
  def joinFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
    val su = Tables.supplier(s, dir).groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(su, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy("nationkey")
  }

  /** J11: explicit CROSS — region x order status grid (tiny x tiny;
    * anything larger crosses through broadcast/bucketed paths). */
  def joinCross(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).select("r_name")
      .crossJoin(Tables.orders(s, dir)
        .select("o_orderstatus").distinct())
      .orderBy("r_name", "o_orderstatus")

  /** J12: CDC-style MERGE/upsert — a change batch (updates to existing
    * keys + brand-new keys) merged into a base table: matched rows take
    * the source values, source-only rows insert, target-only rows
    * carry through. Spelled as one FULL OUTER equi-join + coalesce
    * (Spark has no MERGE INTO against plain parquet; this is the
    * engine form of it, and the shape Delta/Iceberg MERGE lowers to).
    * One shuffle on the merge key; at 100 TB the change batch is
    * typically small relative to base, so AQE turns the join broadcast
    * -- either way no cross product, no skew (keys unique both sides).
    * The change batch is derived deterministically from the base table
    * (every 7th key updated with +10.00 on the price, every 13th key
    * re-keyed past the keyspace as an insert). */
  def mergeUpsertOn(base: DataFrame, changes: DataFrame): DataFrame =
    base.as("t")
      .join(changes.as("s"), col("t.o_orderkey") === col("s.u_orderkey"),
        "full_outer")
      .select(
        coalesce(col("s.u_orderkey"), col("t.o_orderkey")).as("o_orderkey"),
        coalesce(col("s.u_totalprice"), col("t.o_totalprice"))
          .as("o_totalprice"),
        coalesce(col("s.u_status"), col("t.o_orderstatus"))
          .as("o_orderstatus"),
        when(col("t.o_orderkey").isNull, "insert")
          .when(col("s.u_orderkey").isNull, "keep")
          .otherwise("update").as("merge_op"))
      .orderBy("o_orderkey")

  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    val updates = base.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("u_orderkey"),
        (col("o_totalprice") + 10.0).as("u_totalprice"),
        lit("U").as("u_status"))
    val inserts = base.filter(col("o_orderkey") % 13 === 0)
      .select((col("o_orderkey") + 100000000L).as("u_orderkey"),
        col("o_totalprice").as("u_totalprice"),
        lit("N").as("u_status"))
    mergeUpsertOn(base, updates.union(inserts))
  }

  /** J7c: two-sided interval OVERLAP join — all (a, b) pairs whose
    * intervals intersect, with NO equi-key at all (the harder sibling
    * of [[joinRangeBucketed]]'s point-in-interval: both sides are
    * intervals). Same bin-replication scheme — each interval
    * replicates into every `width`-day bucket it touches and the join
    * key is the bucket — plus the FIRST-SHARED-BIN trick that makes
    * the output exactly-once without a distinct: an overlapping pair
    * co-occurs in every bucket the overlap region touches, but is
    * EMITTED only in the bucket of the overlap's start,
    * g = max(alo, blo) div width (div is monotone, so that equals
    * greatest of the per-side start buckets). No dedup shuffle, no
    * cross product; replication factor is interval_len/width + 1
    * (~1.3 here), and skew is bounded by how many intervals touch one
    * bucket — width tunes that against replication. Day arithmetic is
    * all BIGINT from one datediff; starts are non-negative so `div`
    * floors identically in both engines. */
  def joinIntervalOverlapOn(a: DataFrame, b: DataFrame,
      width: Long = 64): DataFrame = {
    val ar = a.withColumn("g",
      explode(sequence(expr(s"alo div $width"), expr(s"ahi div $width"))))
    val br = b.withColumn("g",
      explode(sequence(expr(s"blo div $width"), expr(s"bhi div $width"))))
    ar.join(br, Seq("g"))
      .filter(col("alo") <= col("bhi") && col("blo") <= col("ahi") &&
        col("g") === greatest(expr(s"alo div $width"),
          expr(s"blo div $width")))
      .withColumn("overlap_days",
        least(col("ahi"), col("bhi")) - greatest(col("alo"), col("blo")) + 1)
      .drop("g")
  }

  /** Catalog wrapper: sampled lineitem ship windows (length derived
    * from quantity, 3..17 days) against sampled order prep windows
    * (20 days). */
  def joinIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val epoch = lit("1992-01-01").cast("date")
    val a = Tables.lineitem(s, dir).filter(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey").as("akey"), col("l_linenumber").as("aline"),
        datediff(col("l_shipdate"), epoch).cast("long").as("alo"),
        (datediff(col("l_shipdate"), epoch).cast("long") +
          col("l_quantity").cast("long") % 15 + 3).as("ahi"))
    val b = Tables.orders(s, dir).filter(col("o_orderkey") % 89 === 0)
      .select(col("o_orderkey").as("bkey"),
        datediff(col("o_orderdate"), epoch).cast("long").as("blo"),
        (datediff(col("o_orderdate"), epoch).cast("long") + 20).as("bhi"))
    joinIntervalOverlapOn(a, b)
      .select("akey", "aline", "bkey", "overlap_days")
      .orderBy("akey", "aline", "bkey")
  }

  /** J8: referential-integrity audit across the whole star schema —
    * the cross-table completion of `quality_audit`'s single-table
    * constraints (the Deequ `isContainedIn`/foreign-key shape). Each
    * FK check counts child rows whose key has no parent: the child is
    * FIRST collapsed to (key, row_count) — so the join input shrinks
    * from |child| rows to |distinct keys| — then left-joined to the
    * parent's distinct key set and the misses' counts are summed.
    * Strict mode: a NULL child key can never match and therefore
    * counts as an orphan (documented; SQL's FK semantics would skip
    * it — flip with a filter). Scale: every parent key set here is
    * dimension-sized (broadcast); the one big parent (orders) joins
    * key-to-key after the collapse, so the shuffle carries one row
    * per distinct orderkey, not per lineitem. The seven checks are
    * independent single-pass aggregates unioned into the report. */
  def dqReferentialOn(
      checks: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(checks.nonEmpty, "need at least one FK check")
    checks.map { case (name, child, childKey, parent, parentKey) =>
      val keys = child.groupBy(col(childKey).as("k"))
        .agg(count(lit(1)).as("cnt"))
      val pk = parent.select(col(parentKey).as("k")).distinct()
        .withColumn("hit", lit(1))
      keys.join(pk, Seq("k"), "left")
        .agg(sum(col("cnt")).as("n_child_rows"),
          coalesce(sum(when(col("hit").isNull, col("cnt"))), lit(0L))
            .as("n_orphans"))
        .select(lit(name).as("fk_name"), col("n_child_rows"),
          col("n_orphans"), (col("n_orphans") === 0).as("passed"))
    }.reduce(_ unionByName _).orderBy("fk_name")
  }

  /** Catalog wrapper: the seven FK edges of the TPC-H-ish star. */
  def dqReferential(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val na = Tables.nation(s, dir)
    dqReferentialOn(Seq(
      ("lineitem_orders", li, "l_orderkey", Tables.orders(s, dir), "o_orderkey"),
      ("lineitem_part", li, "l_partkey", Tables.part(s, dir), "p_partkey"),
      ("lineitem_supplier", li, "l_suppkey", Tables.supplier(s, dir), "s_suppkey"),
      ("orders_customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"),
      ("customer_nation", Tables.customer(s, dir), "c_nationkey", na, "n_nationkey"),
      ("supplier_nation", Tables.supplier(s, dir), "s_nationkey", na, "n_nationkey"),
      ("nation_region", na, "n_regionkey", Tables.region(s, dir), "r_regionkey")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_referential" -> dqReferential,
    "join_interval_overlap" -> joinIntervalOverlap,
    "merge_upsert" -> mergeUpsert,
    "join_asof" -> joinAsof,
    "join_asof_forward" -> joinAsofForward,
    "join_asof_nearest" -> joinAsofNearest,
    "join_salted" -> joinSalted,
    "join_bloom" -> joinBloom,
    "join_range_bucketed" -> joinRangeBucketed,
    "join_left_outer" -> joinLeftOuter,
    "join_full_outer" -> joinFullOuter,
    "join_cross" -> joinCross,
    "join_broadcast" -> joinBroadcast,
    "join_inner" -> joinInner,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "join_multiway" -> joinMultiway,
    "join_range" -> joinRange,
  )

  private def fkOracle(name: String, child: String, ck: String,
      parent: String, pk: String): String =
    s"""SELECT '$name' AS fk_name,
       |  CAST(SUM(cnt) AS BIGINT) AS n_child_rows,
       |  CAST(COALESCE(SUM(CASE WHEN p.k IS NULL THEN cnt END), 0)
       |    AS BIGINT) AS n_orphans,
       |  COALESCE(SUM(CASE WHEN p.k IS NULL THEN cnt END), 0) = 0 AS passed
       |FROM (SELECT $ck AS k, COUNT(*) AS cnt FROM $child GROUP BY 1) c
       |LEFT JOIN (SELECT DISTINCT $pk AS k FROM $parent) p ON c.k = p.k"""
      .stripMargin

  val oracles: Map[String, String] = Map(
    "dq_referential" -> (Seq(
      fkOracle("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      fkOracle("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      fkOracle("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      fkOracle("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      fkOracle("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      fkOracle("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      fkOracle("nation_region", "nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fk_name")),
    "join_interval_overlap" ->
      """WITH a AS (SELECT l_orderkey AS akey, l_linenumber AS aline,
        |    CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
        |      AS BIGINT) AS alo,
        |    CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
        |      AS BIGINT) + CAST(l_quantity AS BIGINT) % 15 + 3 AS ahi
        |  FROM lineitem WHERE l_orderkey % 97 = 0),
        |b AS (SELECT o_orderkey AS bkey,
        |    CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS blo,
        |    CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) + 20 AS bhi
        |  FROM orders WHERE o_orderkey % 89 = 0)
        |SELECT akey, aline, bkey,
        |  LEAST(ahi, bhi) - GREATEST(alo, blo) + 1 AS overlap_days
        |FROM a JOIN b ON alo <= bhi AND blo <= ahi
        |ORDER BY akey, aline, bkey""".stripMargin,
    "merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
        |chg AS (
        |  SELECT o_orderkey AS u_orderkey, o_totalprice + 10.0 AS u_totalprice,
        |    'U' AS u_status FROM base WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000 AS u_orderkey,
        |    o_totalprice AS u_totalprice, 'N' AS u_status
        |  FROM base WHERE o_orderkey % 13 = 0)
        |SELECT COALESCE(u_orderkey, o_orderkey) AS o_orderkey,
        |  COALESCE(u_totalprice, o_totalprice) AS o_totalprice,
        |  COALESCE(u_status, o_orderstatus) AS o_orderstatus,
        |  CASE WHEN o_orderkey IS NULL THEN 'insert'
        |       WHEN u_orderkey IS NULL THEN 'keep'
        |       ELSE 'update' END AS merge_op
        |FROM base FULL OUTER JOIN chg ON o_orderkey = u_orderkey
        |ORDER BY COALESCE(u_orderkey, o_orderkey)""".stripMargin,
    "join_bloom" ->
      """SELECT p_brand, COUNT(*) AS n_lines, SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size >= 45
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """WITH c AS (SELECT c_nationkey, COUNT(*) AS n_customers
        |  FROM customer GROUP BY c_nationkey),
        |s AS (SELECT s_nationkey, COUNT(*) AS n_suppliers
        |  FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
        |  COALESCE(n_customers, 0) AS n_customers,
        |  COALESCE(n_suppliers, 0) AS n_suppliers
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "join_cross" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "join_range_bucketed" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('b0_tiny', 0.0, 10.0), ('b1_small', 10.0, 20.0),
        |  ('b2_mid', 20.0, 35.0), ('b3_large', 35.0, 50.0),
        |  ('b4_huge', 50.0, 60.0))
        |SELECT band, COUNT(*) AS n_lines, SUM(l_quantity) AS sum_qty
        |FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "join_salted" ->
      """WITH dim(event_type, category) AS (VALUES
        |  ('click','engage'), ('view','engage'), ('purchase','convert'),
        |  ('signup','convert'), ('error','ops'))
        |SELECT category, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN dim USING (event_type)
        |GROUP BY category ORDER BY category""".stripMargin,
    "join_asof_nearest" ->
      """WITH c AS (SELECT user_id, event_id AS click_id,
        |    epoch_us(ts) AS ctus
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id,
        |    epoch_us(ts) AS ptus
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT p.user_id AS user_id, purchase_id, click_id,
        |    abs(ptus - ctus) AS gap,
        |    CASE WHEN ctus <= ptus THEN 0 ELSE 1 END AS dirn
        |  FROM p JOIN c ON p.user_id = c.user_id)
        |SELECT user_id, purchase_id, click_id, gap AS gap_us
        |FROM j QUALIFY row_number() OVER (PARTITION BY purchase_id
        |  ORDER BY gap, dirn,
        |    CASE WHEN dirn = 0 THEN -click_id ELSE click_id END) = 1
        |ORDER BY purchase_id""".stripMargin,
    "join_asof" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(ts) AS tus, 0 AS m, event_id AS id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts) AS tus, 1 AS m, event_id AS id
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT user_id, tus, m, id,
        |    last_value(CASE WHEN m = 0 THEN id END IGNORE NULLS) OVER win AS click_id,
        |    last_value(CASE WHEN m = 0 THEN tus END IGNORE NULLS) OVER win AS click_tus
        |  FROM t
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tus ASC, m ASC, id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, id AS purchase_id, click_id, tus - click_tus AS gap_us
        |FROM w WHERE m = 1 AND click_id IS NOT NULL
        |ORDER BY purchase_id""".stripMargin,
    "join_asof_forward" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(ts) AS tus, 0 AS m, event_id AS id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts) AS tus, 1 AS m, event_id AS id
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT user_id, tus, m, id,
        |    last_value(CASE WHEN m = 0 THEN id END IGNORE NULLS) OVER win AS click_id,
        |    last_value(CASE WHEN m = 0 THEN tus END IGNORE NULLS) OVER win AS click_tus
        |  FROM t
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tus DESC, m ASC, id DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, id AS purchase_id, click_id,
        |  click_tus - tus AS gap_us
        |FROM w WHERE m = 1 AND click_id IS NOT NULL
        |  AND click_tus - tus <= 1800000000
        |ORDER BY purchase_id""".stripMargin,
    "join_broadcast" ->
      """SELECT r_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_inner" ->
      """SELECT o_orderstatus, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND year(o_orderdate) = 2000)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_multiway" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey AND year(o_orderdate) = 1997
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_range" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('b0_tiny', 0.0, 10.0), ('b1_small', 10.0, 20.0),
        |  ('b2_mid', 20.0, 35.0), ('b3_large', 35.0, 50.0),
        |  ('b4_huge', 50.0, 1e9))
        |SELECT band, COUNT(*) AS n_lines, SUM(l_quantity) AS sum_qty
        |FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY band ORDER BY band""".stripMargin,
  )
}
