package graft

import org.apache.spark.sql.functions._

/** Custom aggregates: typed Aggregator and TypedImperativeAggregate. */
class CustomAggSpec extends SparkSpecBase {
  import spark.implicits._

  test("MinHashAgg one-pass signature == K separate min() aggregates") {
    val hs = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(
        functions.Dedup.shingles("text")).as("sh"))
      .select(col("doc_id"), functions.Text.polyHash(col("sh")).as("hs"))
    val onePass = hs.groupBy("doc_id")
      .agg(plans.MinHashAgg.minhash(col("hs"), 8).as("sig"))
    val kMins = hs.groupBy("doc_id").agg(
      min((col("hs") * 3 + 31) % functions.Text.P).as("x0"),
      (1 until 8).map(i =>
        min((col("hs") * (2 * i + 3) + (97 * i + 31)) % functions.Text.P)
          .as(s"x$i")): _*)
    val joined = onePass.join(kMins, "doc_id")
    val bad = joined.filter(
      (0 until 8).map(i => element_at(col("sig"), i + 1) =!= col(s"x$i"))
        .reduce(_ || _)).count()
    assert(bad == 0 && joined.count() > 0)
  }

  test("ArgMax aggregator: max-value payload, ties to smaller id") {
    val argmax = udaf(new plans.ArgMax)
    val df = Seq(
      (1L, 5.0, 100L), (1L, 5.0, 50L), (1L, 3.0, 10L),
      (2L, 1.0, 7L)).toDF("k", "v", "id")
    val got = df.groupBy("k").agg(argmax(col("v"), col("id")).as("top"))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 50L), (2L, 7L)))
  }

  test("ArgMax over the corpus == window argmax") {
    val argmax = udaf(new plans.ArgMax)
    val viaAgg = Tables.events(spark, sf).groupBy("user_id")
      .agg(argmax(col("value"), col("event_id")).as("top"))
      .as[(Long, Long)].collect().toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id").asc)
    val viaWindow = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)].collect().toMap
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }
}
