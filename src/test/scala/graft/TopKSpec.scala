package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Custom grouped top-k operator (graft.plans.TopKPerKey). */
class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  test("ties resolve by the tiebreak column, k truncates per group") {
    val df = Seq(
      (1, 10, 5.0), (1, 11, 5.0), (1, 12, 7.0), (1, 13, 1.0),
      (2, 20, 2.0)).toDF("key", "id", "score")
    val got = plans.TopK.of(df, Seq("key"), "score",
        desc = true, k = 2, tiebreak = Seq("id"))
      .orderBy("key", "id")
      .as[(Int, Int, Double)].collect().toSeq
    // key 1: 7.0 (id 12) then the 5.0 tie broken by id -> 10; key 2: all
    assert(got == Seq((1, 10, 5.0), (1, 12, 7.0), (2, 20, 2.0)))
  }

  test("equals the Window(row_number)+Filter spelling on the corpus") {
    val o = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val custom = plans.TopK.of(o, Seq("o_custkey"), "o_totalprice",
        desc = true, k = 3, tiebreak = Seq("o_orderkey"))
      .collect().map(_.toString).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toString).toSet
    assert(custom == windowed && custom.nonEmpty)
  }

  test("optimizer rule rewrites the row_number()+filter spelling to TopKPerKey") {
    plans.Graft.enable(spark)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val q = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey ["), p)
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "), p)
    // same rows as the un-rewritten window spelling
    val sNoRule = spark.newSession()
    val expect = Tables.orders(sNoRule, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toString).toSet
    assert(q.collect().map(_.toString).toSet == expect && expect.nonEmpty)
  }

  test("rewrite does NOT fire when the rank column is still referenced") {
    plans.Graft.enable(spark)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val q = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn")) // rn survives -> no rewrite
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("TopKPerKey ["), p)
  }

  test("plans partial heap -> exchange -> spillable sort -> final scan") {
    val o = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val p = plans.TopK.of(o, Seq("o_custkey"), "o_totalprice",
      desc = true, k = 3).queryExecution.executedPlan.toString
    // physical node prints without the Exec suffix (TreeNode.nodeName)
    assert(p.contains("TopKPerKey ["), p)
    assert(p.contains("TopKPerKeyPartial ["), p)
    assert(p.contains("hashpartitioning(o_custkey"), p)
    // the final pass is deliberately sort-based (O(1) memory, Spark's
    // SortExec spills): its input is already cut to <= k rows per
    // (input partition, key) by the map-side heap pass, and the sort
    // cannot OOM at high key cardinality the way per-key heaps can.
    // The sort sits AFTER the exchange (local, not global).
    assert(p.contains("Sort ["), p)
  }

  test("partial-pass key budget: tiny cap still yields exact top-k") {
    val o = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val expect = plans.TopK.of(o, Seq("o_custkey"), "o_totalprice",
      desc = true, k = 3, tiebreak = Seq("o_orderkey"))
      .collect().map(_.toString).toSet
    spark.conf.set("spark.graft.topk.maxKeysPerPartition", "2")
    try {
      // with only 2 tracked keys/partition almost everything passes
      // through unfiltered — the final pass must still produce the
      // exact same per-key top-k
      val got = plans.TopK.of(o, Seq("o_custkey"), "o_totalprice",
        desc = true, k = 3, tiebreak = Seq("o_orderkey"))
        .collect().map(_.toString).toSet
      assert(got == expect && expect.nonEmpty)
    } finally spark.conf.unset("spark.graft.topk.maxKeysPerPartition")
  }
}
