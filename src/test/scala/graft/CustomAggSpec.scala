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

  test("SimHash64Agg one-pass signature == 64 explicit SUM columns") {
    import graft.functions.{Dedup, Text}
    val tokCnt = Dedup.tokenCountsOf(Tables.documents(spark, sf))
    val viaAgg = Dedup.simhash64SigOf(tokCnt)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the column formulation the aggregate replaced
    val P = Text.P
    val sumCols = (0 until 64).map { j =>
      val bit = expr(s"((h * ${2 * j + 3} + ${97 * j + 31}) % $P) & 1")
      sum(when(bit === 1, col("cnt")).otherwise(-col("cnt"))).as(s"s$j")
    }
    val sums = tokCnt.groupBy("doc_id").agg(sumCols.head, sumCols.tail: _*)
    val viaCols = sums.select(col("doc_id") +: (0 until 4).map(b =>
        (16 * b until 16 * (b + 1)).map(j =>
          when(col(s"s$j") >= 0, lit(1L << (j - 16 * b))).otherwise(lit(0L)))
          .reduce(_ + _).as(s"h$b")): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(viaAgg == viaCols && viaAgg.nonEmpty)
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

  test("MisraGries 2-pass heavy hitters == exact, capacity << distinct") {
    // 5 hot keys (1000 occurrences each) hidden in ~2000 cold keys
    // (1-3 each); capacity 16 forces constant decrement pressure and
    // merge-side trims — the regime the MG bound has to survive.
    val hot = spark.range(5)
      .select(concat(lit("hot_"), col("id")).as("token"),
        lit(1000L).as("m"))
    val cold = spark.range(2000)
      .select(concat(lit("cold_"), col("id")).as("token"),
        (col("id") % 3 + 1).as("m"))
    val tokens = hot.union(cold)
      .select(col("token"), explode(sequence(lit(1L), col("m"))))
      .select("token")
    val exact = tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
    val n = tokens.count()
    val expect = exact.filter(col("cnt") * 16 > n)
      .orderBy("token")
      .as[(String, Long)].collect().toSeq
    assert(expect.map(_._1) == Seq("hot_0", "hot_1", "hot_2", "hot_3", "hot_4"))
    for (parts <- Seq(1, 13)) {
      val got = functions.Text
        .heavyHitterTokensOn(tokens.repartition(parts), 16)
        .as[(String, Long)].collect().toSeq
      assert(got == expect, s"parts=$parts")
    }
  }

  test("MisraGries sketch: every true heavy hitter is a candidate") {
    val tokens = spark.range(3)
      .select(concat(lit("h"), col("id")).as("token"), lit(500L).as("m"))
      .union(spark.range(900)
        .select(concat(lit("c"), col("id")).as("token"), lit(2L).as("m")))
      .select(col("token"), explode(sequence(lit(1L), col("m"))))
      .select("token").repartition(7)
    val row = tokens
      .agg(plans.MisraGriesAgg.sketch(col("token"), 8).as("s"))
      .select(col("s.cands").as("cands"), col("s.total").as("total"))
      .as[(Seq[String], Long)].head()
    assert(row._2 == 3 * 500L + 900 * 2L)
    assert(row._1.size <= 8)
    assert(Set("h0", "h1", "h2").subsetOf(row._1.toSet))
  }

  test("Count-Min: estimate bounds exact from above; the tiny grid " +
    "actually collides; total mass is conserved per hash row") {
    val cm = functions.Text.textCountmin(spark, sf)
      .select("tok", "n_exact", "n_est").as[(String, Long, Long)].collect()
    assert(cm.nonEmpty)
    // CMS one-sided error: never an underestimate
    assert(cm.forall { case (_, exact, est) => est >= exact })
    // W=16 against a larger vocabulary must collide somewhere — if
    // every estimate were exact the sketch path would be untested
    assert(cm.exists { case (_, exact, est) => est > exact })
    // each estimate is bounded by exact + total colliding mass
    val total = cm.map(_._2).sum
    assert(cm.forall { case (_, exact, est) => est <= total })
  }

  test("KmvAgg: k smallest distinct across any partitioning, short sets pass through") {
    import spark.implicits._
    // 100 values with duplicates, shuffled deterministically
    val vals = ((1L to 50L) ++ (1L to 50L) ++ (30L to 79L))
      .map(v => (v * 7919) % 1009)
    val expected = vals.distinct.sorted.take(8)
    for (parts <- Seq(1, 3, 7)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(plans.KmvAgg.kmv(col("h"), 8).as("sk"))
        .select(explode(col("sk"))).as[Long].collect().toSeq
      assert(got == expected, s"parts=$parts")
    }
    // fewer distinct values than k: the whole distinct set, ascending
    val small = Seq(5L, 3L, 5L, 9L).toDF("h")
      .agg(plans.KmvAgg.kmv(col("h"), 8).as("sk"))
      .select(explode(col("sk"))).as[Long].collect().toSeq
    assert(small == Seq(3L, 5L, 9L))
  }
}
