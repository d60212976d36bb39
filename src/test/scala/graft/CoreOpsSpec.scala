package graft

import org.apache.spark.sql.functions._

/** Per-operator unit tests over inline reference-shaped fixtures
  * (FIXTURES.md §B) — hand-computed expectations. */
class CoreOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("P3 case-map remap leaves unmapped values untouched (preprocess_dataset.py:103-113)") {
    // pandas replace semantics: 71 and 74 have no mapping -> pass through
    val df = Seq(71, 72, 73, 74).toDF("action_label")
      .select(
        when(col("action_label") === 72, "play")
          .when(col("action_label") === 73, "eat")
          .otherwise(col("action_label").cast("string")).as("action"))
    assert(df.as[String].collect().toSeq == Seq("71", "play", "eat", "74"))
  }

  test("A3 frequency HAVING at/below/above the 0.3 threshold (raw_to_samples.py:147-153)") {
    // sub 1: 2/5 = 0.4 > 0.3 keep; sub 2: 1/5 = 0.2 drop; sub 3: 3/10 = 0.3 NOT > 0.3 drop
    val rows = Seq.fill(2)((1, 16)) ++ Seq.fill(3)((1, 0)) ++
      Seq.fill(1)((2, 16)) ++ Seq.fill(4)((2, 0)) ++
      Seq.fill(3)((3, 16)) ++ Seq.fill(7)((3, 0))
    val kept = rows.toDF("sub_id", "cls")
      .groupBy("sub_id")
      .agg(avg(when(col("cls") === 16, 1.0).otherwise(0.0)).as("freq"))
      .filter(col("freq") > 0.3)
      .select("sub_id").as[Int].collect().toSeq
    assert(kept == Seq(1))
  }

  test("A4 full-coverage HAVING count == scalar (raw_to_samples.py:212-216)") {
    val rows = Seq((1, 0), (1, 1), (1, 2), (2, 0), (2, 1))
    val full = rows.toDF("sub_id", "frame")
      .groupBy("sub_id").agg(count(lit(1)).as("n"))
      .filter(col("n") === 3)
      .select("sub_id").as[Int].collect().toSeq
    assert(full == Seq(1))
  }

  test("A1 group-to-list preserves frame order via sort_array (raw_to_samples.py:156-164)") {
    val rows = Seq((1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 1, "x"))
    val got = rows.toDF("sub_id", "frame", "item")
      .groupBy("sub_id")
      .agg(transform(
        sort_array(collect_list(struct(col("frame"), col("item")))),
        x => x.getField("item")).as("items"))
      .orderBy("sub_id")
      .select("items").as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a", "b", "c"), Seq("x")))
  }

  test("A5 max-id scalar is 0 on an empty catalog (preprocessed_to_raw.py:21-29)") {
    val empty = Seq.empty[Long].toDF("file_index")
    val next = empty.agg(coalesce(max(col("file_index")) + 1, lit(0L)))
      .as[Long].head()
    assert(next == 0L)
    val nonEmpty = Seq(4L, 9L, 7L).toDF("file_index")
      .agg(coalesce(max(col("file_index")) + 1, lit(0L))).as[Long].head()
    assert(nonEmpty == 10L)
  }

  test("W2 analytic max >= every member of its partition") {
    val df = Tables.lineitem(spark, sf)
    val viol = operators.Windows.windowAnalyticMax(spark, sf)
      .filter(col("max_qty_in_order") < col("l_quantity")).count()
    assert(viol == 0 && df.count() > 0)
  }

  test("O2 union preserves the row multiset (preprocessed_to_raw.py:51)") {
    val a = Seq(1, 2, 2).toDF("x")
    val b = Seq(2, 3).toDF("x")
    val u = a.unionByName(b).groupBy("x").count()
      .as[(Int, Long)].collect().toMap
    assert(u == Map(1 -> 1L, 2 -> 3L, 3 -> 1L))
  }

  test("J5 anti-join = skip-if-exists (preprocess_dataset.py:55-56)") {
    val todo = Seq("a", "b", "c").toDF("path")
    val done = Seq("b").toDF("path")
    val left = todo.join(done, Seq("path"), "left_anti")
      .orderBy("path").as[String].collect().toSeq
    assert(left == Seq("a", "c"))
  }

  test("J13 bloom prune is lossless: join_bloom == the plain exact join") {
    // the bloom stage admits false positives but never false
    // negatives; the exact join removes the former, so the output
    // must equal the un-pruned join bit-for-bit
    val got = operators.Joins.joinBloom(spark, sf).collect().toSeq
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_size") >= 45),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("sum_qty"),
        Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
      .orderBy("p_brand").collect().toSeq
    assert(got == plain)
  }

  test("zval: Morton interleave is a bijection on the 8-bit x 8-bit grid") {
    val grid = spark.range(256).select(col("id").as("x"))
      .crossJoin(spark.range(256).select(col("id").as("y")))
    val z = grid.select(operators.Layout.zval(col("x"), col("y")).as("z"))
    assert(z.distinct().count() == 65536L)
    val mm = z.agg(min("z"), max("z")).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 65535L)
  }

  test("J7 range join buckets every lineitem exactly once") {
    val n = Tables.lineitem(spark, sf).count()
    val bucketed = operators.Joins.joinRange(spark, sf)
      .agg(sum(col("n_lines"))).as[Long].head()
    assert(bucketed == n)
  }

  test("J7c interval overlap: equals the brute-force non-equi join, exactly once " +
    "(first-shared-bin dedup), including pairs spanning bucket boundaries") {
    // hand fixture around a width-64 bucket edge: [60, 70] spans two
    // buckets and overlaps both b-intervals; [0, 5] overlaps neither
    val a = Seq((1L, 60L, 70L), (2L, 0L, 5L), (3L, 100L, 300L))
      .toDF("aid", "alo", "ahi")
    val b = Seq((10L, 64L, 80L), (11L, 50L, 63L), (12L, 299L, 310L))
      .toDF("bid", "blo", "bhi")
    val got = operators.Joins.joinIntervalOverlapOn(a, b)
      .select("aid", "bid", "overlap_days")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L, 7L), (1L, 11L, 4L), (3L, 12L, 2L)))
    // catalog form == brute force on the same interval frames
    val n = operators.Joins.joinIntervalOverlap(spark, sf).count()
    val epoch = lit("1992-01-01").cast("date")
    val af = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 97 === 0)
      .select(datediff(col("l_shipdate"), epoch).cast("long").as("alo"),
        (datediff(col("l_shipdate"), epoch).cast("long") +
          col("l_quantity").cast("long") % 15 + 3).as("ahi"))
    val bf = Tables.orders(spark, sf).filter(col("o_orderkey") % 89 === 0)
      .select(datediff(col("o_orderdate"), epoch).cast("long").as("blo"),
        (datediff(col("o_orderdate"), epoch).cast("long") + 20).as("bhi"))
    val brute = af.crossJoin(bf)
      .filter(col("alo") <= col("bhi") && col("blo") <= col("ahi")).count()
    assert(n == brute, s"bucketed $n vs brute $brute")
  }

  test("W1 id continuation starts at the existing max + 1 (preprocessed_to_raw.py:39-46)") {
    val out = pipeline.Reference.refIdContinuation(spark, sf)
    val existingMax = out.filter(col("dataset") === "existing")
      .agg(max("file_index")).as[Long].head()
    val newMin = out.filter(col("dataset") === "incoming")
      .agg(min("file_index")).as[Long].head()
    assert(newMin == existingMax + 1)
    // dense ids, no collisions
    assert(out.select("file_index").distinct().count() == out.count())
  }

  test("A14 collect_set dedups, sorts, and counts distinct per group") {
    val rows = Seq((1, "b"), (1, "a"), (1, "b"), (2, "x"), (2, "x"))
    val got = rows.toDF("user_id", "event_type")
      .groupBy("user_id")
      .agg(
        array_join(sort_array(collect_set(col("event_type"))), ",")
          .as("distinct_actions"),
        countDistinct(col("event_type")).as("n_distinct"))
      .orderBy("user_id")
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a,b", 2L), (2, "x", 1L)))
    // catalog form agrees with a direct distinct-count per group
    val out = operators.Aggregates.aggCollectSet(spark, sf)
    val direct = Tables.events(spark, sf)
      .groupBy("user_id").agg(countDistinct(col("event_type")).as("d"))
    val viol = out.join(direct, "user_id")
      .filter(col("n_distinct") =!= col("d")).count()
    assert(viol == 0 && out.count() > 0)
  }

  test("layout_compaction: next-fit by start offset, byte conservation") {
    import spark.implicits._
    // file start offsets 0 / 3000 / 5000 against budget 4000:
    // packs {f0, f1}, {f2} — a file PACKS where it STARTS (next-fit),
    // so a pack may overflow the budget by at most one file
    val plan = operators.Layout.layoutCompaction(spark, sf)
    val manifest = Tables.documents(spark, sf)
      .groupBy("lang", "source").count()
    assert(plan.agg(sum(col("n_files"))).as[Long].head() == manifest.count())
    assert(plan.agg(sum(col("n_docs"))).as[Long].head() ==
      Tables.documents(spark, sf).count())
    val totalBytes = Tables.documents(spark, sf)
      .agg(sum(col("n_chars"))).as[Long].head()
    assert(plan.agg(sum(col("total_bytes"))).as[Long].head() == totalBytes)
    // a file packs where its START offset lands, so ids can skip past
    // an oversized file but never go negative, and the plan cannot
    // have more packs than files; the budget must actually split at
    // least one language (otherwise the op is vacuous at this sf)
    assert(plan.filter(col("pack_id") < 0).count() == 0)
    val sizes = plan.groupBy("lang").agg(count(lit(1)).as("packs"),
      sum(col("n_files")).as("files"))
    assert(sizes.filter(col("packs") > col("files")).count() == 0)
    assert(plan.filter(col("pack_id") > 0).count() > 0)
  }
  test("window_count_distinct: running marker sum equals exact distinct counts") {
    import spark.implicits._
    val out = operators.Windows.windowCountDistinct(spark, sf).cache()
    // final running value per customer == exact COUNT(DISTINCT supplier)
    val fin = out.groupBy("o_custkey")
      .agg(max(col("n_distinct_supp")).as("running_final"))
    val exact = out.groupBy("o_custkey")
      .agg(countDistinct(col("l_suppkey")).as("exact"))
    assert(fin.join(exact, "o_custkey")
      .filter(col("running_final") =!= col("exact")).count() == 0)
    // markers partition the rows: sum(first_seen) == distinct pairs
    val pairs = out.select("o_custkey", "l_suppkey").distinct().count()
    assert(out.agg(sum(col("first_seen"))).as[Long].head() == pairs)
    // the running count never decreases along the order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy("o_orderdate", "l_orderkey", "l_linenumber", "l_suppkey")
    assert(out.withColumn("prev", lag(col("n_distinct_supp"), 1).over(w))
      .filter(col("prev").isNotNull && col("n_distinct_supp") < col("prev"))
      .count() == 0)
    out.unpersist()
  }

  test("A11 winsorize: hand fences clamp exactly one row per side; " +
      "row count and order stats preserved") {
    import spark.implicits._
    // 21 values: 100..2000 cents + a 1000.00 outlier; p05 fence =
    // 2nd smallest (200), p95 = 20th (2000)
    val li = ((1 to 20).map(i => (i.toLong, i, "A", i * 1.0)) :+
      (21L, 21, "A", 1000.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    val r = operators.Aggregates.aggWinsorizeOn(li).head()
    assert(r.getAs[Long]("n") == 21L)
    assert(r.getAs[Long]("lo_cents") == 200L)
    assert(r.getAs[Long]("hi_cents") == 2000L)
    assert(r.getAs[Long]("n_clamped_low") == 1L)
    assert(r.getAs[Long]("n_clamped_high") == 1L)
    assert(r.getAs[Long]("sum_raw_cents") == 121000L)
    assert(r.getAs[Long]("sum_winsorized_cents") == 23100L)
    // corpus: clamping never increases the spread-driven sum gap sign
    val c = operators.Aggregates.aggWinsorize(spark, sf)
    assert(c.filter(col("lo_cents") > col("hi_cents")).count() == 0)
    assert(c.filter(col("n_clamped_low") + col("n_clamped_high") >
      col("n")).count() == 0)
  }

  test("dq_referential: orphan and NULL child keys are counted per row; " +
      "the corpus star has intact FKs") {
    import spark.implicits._
    // child rows: two hit parent 10, one orphan key 99 (twice), one NULL
    val child = Seq(Some(10L), Some(10L), Some(99L), Some(99L), None)
      .toDF("ck")
    val parent = Seq(10L, 20L).toDF("pk")
    val r = operators.Joins.dqReferentialOn(
      Seq(("t", child, "ck", parent, "pk"))).head()
    assert(r.getAs[Long]("n_child_rows") == 5L)
    assert(r.getAs[Long]("n_orphans") == 3L) // 2x key-99 + the NULL
    assert(!r.getAs[Boolean]("passed"))
    // the driver corpus: all seven FK edges intact, row counts real
    val c = operators.Joins.dqReferential(spark, sf).cache()
    assert(c.count() == 7)
    assert(c.filter(!col("passed")).count() == 0)
    val liRows = Tables.lineitem(spark, sf).count()
    assert(c.filter(col("fk_name") === "lineitem_orders")
      .head().getAs[Long]("n_child_rows") == liRows)
    c.unpersist()
  }

  test("cdc_snapshot_diff: insert/update/unchanged classified from one " +
      "aggregate; ties break by event_id") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: state a at t1, b at t2 -> update
      (1L, 1L, "a", ts("2024-01-05 10:00:00")),
      (2L, 1L, "b", ts("2024-01-15 10:00:00")),
      // u2: only post-t1 activity -> insert
      (3L, 2L, "c", ts("2024-01-12 10:00:00")),
      // u3: same state both cuts -> unchanged
      (4L, 3L, "d", ts("2024-01-06 10:00:00")),
      // u4: two events at the SAME ts before t1; event_id 6 wins
      (5L, 4L, "x", ts("2024-01-07 09:00:00")),
      (6L, 4L, "y", ts("2024-01-07 09:00:00")),
      // post-t2 noise must be invisible
      (7L, 1L, "z", ts("2024-01-25 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = operators.Events.cdcSnapshotDiffOn(ev,
        lit("2024-01-10").cast("timestamp"), lit("2024-01-20").cast("timestamp"))
      .as[(Long, Option[String], String, String)].collect().toSeq
    assert(got == Seq(
      (1L, Some("a"), "b", "update"),
      (2L, None, "c", "insert"),
      (3L, Some("d"), "d", "unchanged"),
      (4L, Some("y"), "y", "unchanged")))
  }
}
