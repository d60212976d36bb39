package graft

import org.apache.spark.sql.functions._

/** The pluggable decode boundary: a real codec-backed detector /
  * transcoder is a config swap away (class name in
  * spark.graft.media.*), and the default surrogate binding keeps the
  * oracle-tested behavior. */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("detector binding is swappable via spark.graft.media.detector") {
    val key = multimodal.Multimodal.DetectorConfKey
    spark.conf.set(key, classOf[FixedDetector].getName)
    try {
      val out = multimodal.Multimodal.udfInference(spark, sf)
      // the fixed impl emits exactly one sentinel detection per frame
      assert(out.groupBy("frame_id").count()
        .filter(col("count") =!= 1).count() == 0)
      assert(out.select("cls").distinct().as[Long].collect().toSeq == Seq(999L))
    } finally spark.conf.unset(key)
    // default binding restored: surrogate emits 1-3 detections and
    // never class 999
    val dflt = multimodal.Multimodal.udfInference(spark, sf)
    assert(dflt.filter(col("cls") === 999).count() == 0)
    assert(dflt.groupBy("frame_id").count()
      .filter(col("count") > 1).count() > 0)
  }

  test("transcoder binding is swappable via spark.graft.media.transcoder") {
    val key = multimodal.Multimodal.TranscoderConfKey
    spark.conf.set(key, classOf[UpperTagTranscoder].getName)
    try {
      val out = multimodal.Multimodal.udfTranscode(spark, sf)
      assert(out.filter(!col("transcoded").startsWith("WEBM:")).count() == 0)
    } finally spark.conf.unset(key)
    val dflt = multimodal.Multimodal.udfTranscode(spark, sf)
    assert(dflt.filter(!col("transcoded").startsWith("mp4:")).count() == 0)
  }
  test("L5d caption alignment: every even/odd pair scored once, flag matches threshold") {
    import spark.implicits._
    val out = multimodal.Multimodal.mmCaptionAlign(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.count() == n / 2)
    assert(out.select("pair_id").distinct().count() == n / 2)
    // cosine of same-space embeddings stays in [-1, 1] (round 4)
    assert(out.filter(col("cos") < -1.0001 || col("cos") > 1.0001).count() == 0)
    // kept is exactly the threshold predicate over the rounded score
    assert(out.filter(
      (col("cos") >= 0.25).cast("int") =!= col("kept")).count() == 0)
    // threshold actually separates at this sf: both classes non-empty
    assert(out.filter(col("kept") === 1).count() > 0)
    assert(out.filter(col("kept") === 0).count() > 0)
    out.unpersist()
  }
}

/** Test-only detector standing in for a real codec-backed impl. */
class FixedDetector extends multimodal.Multimodal.FrameDetector {
  def detect(f: Long): Seq[multimodal.Multimodal.Detection] =
    Seq(multimodal.Multimodal.Detection(f, 0, 0L, 999L, 0L, 0L, 1L, 1L))
}

/** Test-only transcoder with a different container tag. */
class UpperTagTranscoder extends multimodal.Multimodal.Transcoder {
  def transcode(bytes: Array[Byte]): String =
    if (bytes == null) null else "WEBM:" + bytes.length
}
