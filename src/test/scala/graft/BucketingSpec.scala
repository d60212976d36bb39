package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned co-located joins — the storage-side
  * shuffle elimination for repeated large-large joins at scale
  * (SURVEY.md "Partitioning & shuffle"). Both sides bucketed 8 ways on
  * the join key: the join plans with ZERO Exchange operators. */
class BucketingSpec extends SparkSpecBase {

  test("bucketed fact-fact join plans without any shuffle exchange") {
    // explicit external-table paths: warehouse.dir is a static conf
    val wh = Files.createTempDirectory("graft_wh").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.sources.bucketing.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    s.sql("DROP TABLE IF EXISTS orders_b")
    s.sql("DROP TABLE IF EXISTS lineitem_b")
    Tables.orders(s, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").mode("overwrite")
      .saveAsTable("orders_b")
    Tables.lineitem(s, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").mode("overwrite")
      .saveAsTable("lineitem_b")
    val joined = s.table("lineitem_b")
      .join(s.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    // and it still computes the right thing
    val expect = Tables.lineitem(s, sf)
      .join(Tables.orders(s, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(_.toString).toSet
    assert(joined.collect().map(_.toString).toSet == expect)
  }
}
