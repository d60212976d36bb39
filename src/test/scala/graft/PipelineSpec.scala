package graft

import org.apache.spark.sql.functions._

/** Composite pipelines + driver-contract invariants. */
class PipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("segmentation drops the incomplete trailing segment (raw_to_samples.py:340-341)") {
    // 12 frames, 5 per segment -> segments 0,1 survive; trailing 2 dropped
    val ev = (0 until 12).map(i => (1L, i.toLong)).toDF("user_id", "event_id")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val segs = ev
      .select(col("user_id"), col("event_id"),
        ((row_number().over(w) - 1) / 5).cast("long").as("segment"))
      .groupBy("user_id", "segment").agg(count(lit(1)).as("n"))
      .filter(col("n") === 5)
      .select("segment").as[Long].collect().toSeq.sorted
    assert(segs == Seq(0L, 1L))
    // shorter than one segment -> zero segments
    val tiny = (0 until 3).map(i => (1L, i.toLong)).toDF("user_id", "event_id")
    val none = tiny
      .select(col("user_id"), col("event_id"),
        ((row_number().over(w) - 1) / 5).cast("long").as("segment"))
      .groupBy("user_id", "segment").agg(count(lit(1)).as("n"))
      .filter(col("n") === 5).count()
    assert(none == 0)
  }

  test("error channel: success + error rows exactly cover the input (raw_to_samples.py:357-374)") {
    val out = pipeline.Reference.refErrorChannel(spark, sf)
    val n = Tables.events(spark, sf).count()
    assert(out.count() == n)
    assert(out.filter(col("status") === "success").filter(col("error").isNotNull).count() == 0)
    assert(out.filter(col("status") === "error").filter(col("error").isNull).count() == 0)
    assert(out.select("event_id").distinct().count() == n)
  }

  test("surrogate detector is deterministic and 1-3 detections per frame (M1)") {
    val d = new multimodal.Multimodal.SurrogateDetector
    assert(d.detect(10L) == d.detect(10L))
    (0L to 50L).foreach { f =>
      val dets = d.detect(f)
      assert(dets.nonEmpty && dets.size <= 3)
      dets.foreach { b =>
        assert(b.x2 > b.x1 && b.y2 > b.y1 && b.frame_id == f)
      }
    }
  }

  test("flagship entry returns rows at sf0.001 (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("contract: every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("contract: every query runs at sf0.001 and returns rows") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        if (n == 0) Some(name) else None
    }
    // join_anti legitimately returns 0 at sf0.001 (every customer has
    // an urgent order in the tiny sample) — allow listed exceptions.
    val allowedEmpty = Set("join_anti")
    assert((empty.toSet -- allowedEmpty).isEmpty,
      s"queries with empty results: $empty")
  }

  test("corpus_clean invariants: survivors pass quality AND are dedup keepers") {
    import org.apache.spark.sql.functions._
    val out = functions.Text.corpusClean(spark, sf)
    val docs = Tables.documents(spark, sf)
    val n = out.count()
    assert(n > 0 && n <= docs.count())
    // every survivor passed the quality gate on its masked text
    val masked = functions.Text.textPiiMaskOn(docs)
      .select(col("doc_id"), col("masked").as("text"))
    val keepIds = functions.Text.textQualityOn(masked)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val outIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(outIds.subsetOf(keepIds) && outIds.nonEmpty)
    // a keeper represents at least itself
    assert(out.filter(col("n_variants") < 1).count() == 0)
  }
}
