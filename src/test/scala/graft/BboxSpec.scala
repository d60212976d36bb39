package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Bbox recenter/clamp (raw_to_samples.py:24-52) — wall cases and
  * generated properties (SURVEY.md §5.3; plain ScalaCheck Gen with a
  * fixed seed — the scalatestplus bridge isn't in the offline cache). */
class BboxSpec extends SparkSpecBase {

  /** Deterministic sample stream from a Gen. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val W = 640; private val H = 480

  /** Scala mirror of the Spark/oracle expression in
    * functions.Scalars.fnMathBbox (target 128x96). */
  def resize(x1: Long, y1: Long, x2: Long, y2: Long,
      tw: Long = 128, th: Long = 96): (Long, Long, Long, Long) = {
    val cx = (x1 + x2) / 2.0; val cy = (y1 + y2) / 2.0
    val rx1 = math.max(0L, math.ceil(cx - tw / 2.0).toLong)
    val ry1 = math.max(0L, math.ceil(cy - th / 2.0).toLong)
    val rx2 = math.min(W.toLong, rx1 + tw)
    val ry2 = math.min(H.toLong, ry1 + th)
    (math.max(0L, rx2 - tw), math.max(0L, ry2 - th), rx2, ry2)
  }

  test("clamp pins the box at each of the four walls (raw_to_samples.py:39-50)") {
    assert(resize(0, 200, 30, 240) == (0L, 172L, 128L, 268L)) // left wall
    assert(resize(600, 200, 639, 240) == (512L, 172L, 640L, 268L)) // right wall
    assert(resize(300, 0, 340, 20) == (256L, 0L, 384L, 96L)) // top wall
    assert(resize(300, 460, 340, 479) == (256L, 384L, 384L, 480L)) // bottom wall
    assert(resize(300, 200, 340, 240) == (256L, 172L, 384L, 268L)) // interior
  }

  test("property: result stays within [0,W]x[0,H] and keeps the target size") {
    val coord = for {
      x1 <- Gen.choose(0L, W - 1L); dx <- Gen.choose(1L, 100L)
      y1 <- Gen.choose(0L, H - 1L); dy <- Gen.choose(1L, 100L)
    } yield (x1, y1, math.min(W.toLong, x1 + dx), math.min(H.toLong, y1 + dy))
    samples(coord, 500).foreach { case (x1, y1, x2, y2) =>
      val (bx1, by1, bx2, by2) = resize(x1, y1, x2, y2)
      assert(bx1 >= 0 && by1 >= 0 && bx2 <= W && by2 <= H)
      assert(bx2 - bx1 == 128 && by2 - by1 == 96)
    }
  }

  test("Spark column transform agrees with the Scala mirror on generated boxes") {
    import spark.implicits._
    val coord = for {
      x1 <- Gen.choose(0L, W - 1L); dx <- Gen.choose(1L, 100L)
      y1 <- Gen.choose(0L, H - 1L); dy <- Gen.choose(1L, 100L)
    } yield (x1, y1, math.min(W.toLong, x1 + dx), math.min(H.toLong, y1 + dy))
    val boxes = samples(coord, 300).zipWithIndex
      .map { case ((x1, y1, x2, y2), i) => (i.toLong, x1, y1, x2, y2) }
    val df = boxes.toDF("id", "x1", "y1", "x2", "y2")
    val got = functions.Scalars
      .resizeBbox(df, W, H, lit(128), lit(96))
      .orderBy("id")
      .select("bx1", "by1", "bx2", "by2")
      .as[(Long, Long, Long, Long)].collect()
    got.zip(boxes).foreach { case (r, (_, x1, y1, x2, y2)) =>
      assert(r == resize(x1, y1, x2, y2))
    }
  }

  test("W2+F1 composite: every resized box has its group's padded max size (raw_to_samples.py:59-90)") {
    val out = pipeline.Reference.refBboxPipeline(spark, sf)
    val bad = out.filter(
      !(col("bx2") - col("bx1") === least(col("tw"), lit(640)) ||
        col("bx1") === 0 || col("bx2") === 640)).count()
    // size == tw unless tw > frame width (then clamped at both walls)
    assert(bad == 0)
  }
}
