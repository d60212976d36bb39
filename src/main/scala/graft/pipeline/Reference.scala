package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-faithful composite pipelines — SURVEY.md §7 step 3.
  *
  * Each query reproduces one of the reference's multi-operator shapes
  * end-to-end (not just the individual operators, which §2 covers
  * one-by-one elsewhere).
  */
object Reference {

  /** EP2 (preprocessed_to_raw.py:8-52): id-continuation append — read
    * an existing catalog, find max id + 1 (A5, :26-29), enumerate the
    * new batch from there (W1, :39-46), union (O2, :51).
    *
    * The scalar max crosses via a broadcast cross-join (never a
    * driver-side collect); the dense enumeration is the one deliberate
    * single-partition window, isolated here as in the reference. */
  def refIdContinuation(s: SparkSession, dir: String): DataFrame = {
    val existing = Tables.orders(s, dir)
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey").as("file_index"),
        concat(lit("raw/"), col("o_orderkey")).as("file_path"),
        lit("existing").as("dataset"))
    val nextId = existing.agg(
      coalesce(max(col("file_index")) + 1, lit(0L)).as("next_id"))
    val newBatch = Tables.customer(s, dir)
      .filter(col("c_custkey") < 50)
      .select(col("c_name"))
      .crossJoin(broadcast(nextId))
      .withColumn("file_index",
        row_number().over(Window.orderBy("c_name")) + col("next_id") - 1)
      .select(col("file_index"),
        concat(lit("new/"), col("c_name")).as("file_path"),
        lit("incoming").as("dataset"))
    existing.unionByName(newBatch).orderBy("file_index")
  }

  /** E1 (raw_to_samples.py:357-374): error-channel split — a fallible
    * per-row op yields success rows and error rows as one relation
    * with an `error` column (the reference's success_data /
    * exceptions_data pair, :385-393), instead of a try/except loop.
    * Failure surrogate: k % 97 == 0 "decode failure". */
  def refErrorChannel(s: SparkSession, dir: String): DataFrame = {
    // Fused form of the two-channel split: one scan, one JSON parse,
    // no union — each branch of the original union re-scanned events
    // and re-parsed props (measured 2x the whole query's cost at
    // sf0.1; at 100 TB the double scan is the difference between one
    // pass and two). Catalyst cannot merge union branches itself, so
    // the fusion is done at authoring time; output is identical.
    val parsed = Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k0"))
    val isErr = col("k0") % 97 === 0
    parsed
      .filter(col("k0").isNotNull) // both original channels drop null k
      .select(col("event_id"),
        when(isErr, lit("error")).otherwise(lit("success")).as("status"),
        when(!isErr, col("k0")).as("k"),
        when(isErr, concat(lit("decode failed: k="), col("k0")))
          .as("error"))
      .orderBy("event_id")
  }

  /** EP3 segmentation (raw_to_samples.py:330-341): tumbling fixed-size
    * segments over each subject's ordered frames, dropping the
    * incomplete trailing segment (:340-341). Frames analog: each
    * user's events in id order, 5 frames per segment. */
  def refSegments(s: SparkSession, dir: String): DataFrame = {
    val perSeg = 5
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        ((row_number().over(w) - 1) / perSeg).cast("long").as("segment"))
      .groupBy("user_id", "segment")
      .agg(count(lit(1)).as("n_frames"),
        min(col("event_id")).as("first_frame"),
        max(col("event_id")).as("last_frame"))
      .filter(col("n_frames") === perSeg) // drop incomplete tail
      .orderBy("user_id", "segment")
  }

  /** W2+F1 composite (raw_to_samples.py:59-90): per-subject max bbox
    * size (+10 pad, :63-72) broadcast back over the window, then each
    * bbox recentered to that size and clamped to the frame (:24-52).
    * Subjects = l_suppkey, frames = lineitem rows, integer math. */
  def refBboxPipeline(s: SparkSession, dir: String): DataFrame = {
    val W = 640; val H = 480
    val w = Window.partitionBy("sub_id")
    val base2 = Tables.lineitem(s, dir).select(
      col("l_suppkey").as("sub_id"),
      col("l_orderkey"), col("l_linenumber"),
      (col("l_quantity").cast("int") * 11 % 600).as("x1"),
      (col("l_linenumber") * 53 % 440).as("y1"),
      ((col("l_quantity").cast("int") * 11 % 600)
        + (col("l_orderkey") % 80) + 20).as("x2"),
      ((col("l_linenumber") * 53 % 440)
        + (col("l_partkey") % 60) + 20).as("y2"))
    val withMax = base2
      .withColumn("tw", max(col("x2") - col("x1")).over(w) + 10)
      .withColumn("th", max(col("y2") - col("y1")).over(w) + 10)
    graft.functions.Scalars.resizeBbox(withMax, W, H, col("tw"), col("th"))
      .select("sub_id", "l_orderkey", "l_linenumber", "tw", "th",
        "bx1", "by1", "bx2", "by2")
      .orderBy("sub_id", "l_orderkey", "l_linenumber")
  }

  /** EP1 (preprocess_dataset.py:93-132 `a2d_preprocess`): schema'd CSV
    * scan (:99-100) → IN-list filter (:101) → dict remap (:103-113) →
    * the path→action dict relation that feeds EP2 (JSON sink shape,
    * :132). Nation keys stand in for the action-label vocabulary. */
  def refPreprocess(s: SparkSession, dir: String): DataFrame = {
    val base = graft.sources.Sources.ensureStaged(s, dir)
    s.read.schema(graft.sources.Sources.customerCsvSchema)
      .option("header", "true").csv(s"$base/customer_csv")
      .filter(col("c_nationkey").isin(1, 3, 5, 7))
      .select(
        concat(lit("videos/"), col("c_custkey"), lit(".mp4")).as("path"),
        when(col("c_nationkey") === 1, "play")
          .when(col("c_nationkey") === 3, "eat")
          .when(col("c_nationkey") === 5, "run")
          .otherwise("walk").as("action"))
      .orderBy("path")
  }

  /** Per-frame subject transpose (raw_to_samples.py:222-230): the
    * tracking dict {sub_id: [bbox...]} transposed to one row per frame
    * listing its subjects — surrogate detections in, frame-ordered
    * canonical subject list out (map semantics emitted as a sorted CSV
    * string: map column hash-compare is not portable). */
  def refTranspose(s: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.inferenceDet(s, dir)
      .groupBy("frame_id")
      .agg(count(lit(1)).as("n_subjects"),
        array_join(
          transform(sort_array(collect_list(col("sub_id"))),
            _.cast("string")), ",").as("subjects"))
      .orderBy("frame_id")

  /** EP3 end-to-end (raw_to_samples.py:310-396) as ONE lazy plan —
    * the reference's whole stage 3: frames → tumbling segments (:336)
    * → per-frame detections (M1 surrogate, :276) → class-frequency
    * filter (:147-153, "dog" = cls < 7, ratio > 0.3) → coverage HAVING
    * (:212-216; >= 8 distinct frames — the surrogate emits 1-3
    * detections/frame, so the reference's strict equality would be
    * degenerate) → per-subject window-max padded bbox (:59-72) →
    * success rows with formatted sample paths (:364-369) unioned with
    * an error channel for segments yielding no subjects (:372-374).
    * Videos = frame_id div 100, segments = 20-frame tumbles. */
  def refEp3Full(s: SparkSession, dir: String): DataFrame = {
    val det = graft.multimodal.Multimodal.inferenceDet(s, dir)
      .withColumn("video", (col("frame_id") / 100).cast("long"))
      .withColumn("segment", ((col("frame_id") % 100) / 20).cast("long"))
    val perSub = det.groupBy("video", "segment", "sub_id")
      .agg(
        count(lit(1)).as("n_det"),
        countDistinct(col("frame_id")).as("n_frames"),
        (sum(when(col("cls") < 7, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("dog_freq"),
        (max(col("x2") - col("x1")) + 10).as("tw"),
        (max(col("y2") - col("y1")) + 10).as("th"))
    // True single-pass success+error emission — no union, ONE consumer
    // of perSub, so the scan -> inference -> aggregation subtree
    // appears exactly once in the plan. (Two union branches over a
    // shared relation never share work here: column pruning gives each
    // branch a different aggregate, so ReuseExchange can't fire and
    // the inference subtree runs per branch — measured as a duplicate
    // events scan.) Per segment, a window marks each subject's
    // qualification and counts qualifiers; qualifying rows become
    // success rows, and for segments with NO qualifiers the rank-1 row
    // is kept as the one error row with its payload nulled.
    val seg = Window.partitionBy("video", "segment")
    val ok = col("dog_freq") > 0.3 && col("n_frames") >= 8
    perSub
      .withColumn("qualifies", ok)
      .withColumn("n_qual",
        sum(when(col("qualifies"), 1L).otherwise(0L)).over(seg))
      .withColumn("rn", row_number().over(seg.orderBy("sub_id")))
      .filter(col("qualifies") || (col("n_qual") === 0 && col("rn") === 1))
      .select(
        col("video"), col("segment"),
        when(col("qualifies"), col("sub_id")).as("sub_id"),
        when(col("qualifies"), lit("success")).otherwise(lit("error"))
          .as("status"),
        when(col("qualifies"),
          concat(lit("samples/v"), lpad(col("video").cast("string"), 3, "0"),
            lit("/seg"), lpad(col("segment").cast("string"), 2, "0"),
            lit("/sub"), col("sub_id"), lit(".mp4"))).as("sample_path"),
        when(col("qualifies"), col("n_det")).as("n_det"),
        when(col("qualifies"), col("n_frames")).as("n_frames"),
        when(col("qualifies"), col("dog_freq")).as("dog_freq"),
        when(col("qualifies"), col("tw")).as("tw"),
        when(col("qualifies"), col("th")).as("th"))
      .orderBy(col("video"), col("segment"),
        col("sub_id").asc_nulls_first)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ref_ep3_full" -> refEp3Full,
    "ref_preprocess" -> refPreprocess,
    "ref_transpose" -> refTranspose,
    "ref_id_continuation" -> refIdContinuation,
    "ref_error_channel" -> refErrorChannel,
    "ref_segments" -> refSegments,
    "ref_bbox_pipeline" -> refBboxPipeline,
  )

  val oracles: Map[String, String] = Map(
    "ref_ep3_full" ->
      """WITH det AS (
        |  SELECT f AS frame_id, f // 100 AS video, (f % 100) // 20 AS segment,
        |    (f*7 + i) % 5 AS sub_id, (f*13 + i) % 20 AS cls,
        |    (f*11 + i*29) % 600 AS x1, (f*17 + i*37) % 440 AS y1,
        |    (f*11 + i*29) % 600 + f % 80 + 20 AS x2,
        |    (f*17 + i*37) % 440 + f % 60 + 20 AS y2
        |  FROM (SELECT event_id AS f FROM events WHERE event_id < 1000),
        |    UNNEST(range(0, f % 3 + 1)) AS r(i)),
        |per_sub AS (
        |  SELECT video, segment, sub_id,
        |    COUNT(*) AS n_det,
        |    COUNT(DISTINCT frame_id) AS n_frames,
        |    CAST(SUM(CASE WHEN cls < 7 THEN 1 ELSE 0 END) AS DOUBLE)
        |      / COUNT(*) AS dog_freq,
        |    MAX(x2 - x1) + 10 AS tw, MAX(y2 - y1) + 10 AS th
        |  FROM det GROUP BY video, segment, sub_id),
        |qualifying AS (
        |  SELECT * FROM per_sub WHERE dog_freq > 0.3 AND n_frames >= 8),
        |success AS (
        |  SELECT video, segment, sub_id, 'success' AS status,
        |    'samples/v' || lpad(CAST(video AS VARCHAR), 3, '0') ||
        |    '/seg' || lpad(CAST(segment AS VARCHAR), 2, '0') ||
        |    '/sub' || sub_id || '.mp4' AS sample_path,
        |    n_det, n_frames, dog_freq, tw, th
        |  FROM qualifying),
        |errors AS (
        |  SELECT s.video, s.segment, CAST(NULL AS BIGINT) AS sub_id,
        |    'error' AS status, CAST(NULL AS VARCHAR) AS sample_path,
        |    CAST(NULL AS BIGINT) AS n_det, CAST(NULL AS BIGINT) AS n_frames,
        |    CAST(NULL AS DOUBLE) AS dog_freq,
        |    CAST(NULL AS BIGINT) AS tw, CAST(NULL AS BIGINT) AS th
        |  FROM (SELECT DISTINCT video, segment FROM det) s
        |  WHERE NOT EXISTS (SELECT 1 FROM qualifying q
        |    WHERE q.video = s.video AND q.segment = s.segment))
        |SELECT * FROM (SELECT * FROM success UNION ALL SELECT * FROM errors)
        |ORDER BY video, segment, sub_id NULLS FIRST""".stripMargin,
    "ref_preprocess" ->
      """SELECT 'videos/' || c_custkey || '.mp4' AS path,
        |  CASE WHEN c_nationkey = 1 THEN 'play'
        |       WHEN c_nationkey = 3 THEN 'eat'
        |       WHEN c_nationkey = 5 THEN 'run'
        |       ELSE 'walk' END AS action
        |FROM read_csv('/tmp/graft_export/_root_testdata_sf0.01/customer_csv/*.csv', header = true)
        |WHERE c_nationkey IN (1, 3, 5, 7)
        |ORDER BY path""".stripMargin,
    "ref_transpose" ->
      """WITH det AS (
        |  SELECT f AS frame_id, (f*7 + i) % 5 AS sub_id
        |  FROM (SELECT event_id AS f FROM events WHERE event_id < 1000),
        |    UNNEST(range(0, f % 3 + 1)) AS r(i))
        |SELECT frame_id, COUNT(*) AS n_subjects,
        |  string_agg(CAST(sub_id AS VARCHAR), ',' ORDER BY sub_id) AS subjects
        |FROM det GROUP BY frame_id ORDER BY frame_id""".stripMargin,
    "ref_id_continuation" ->
      """WITH existing AS (
        |  SELECT o_orderkey AS file_index, 'raw/' || o_orderkey AS file_path,
        |    'existing' AS dataset
        |  FROM orders WHERE o_orderkey < 100),
        |nid AS (SELECT COALESCE(MAX(file_index) + 1, 0) AS next_id FROM existing),
        |newb AS (
        |  SELECT row_number() OVER (ORDER BY c_name) + next_id - 1 AS file_index,
        |    'new/' || c_name AS file_path, 'incoming' AS dataset
        |  FROM customer, nid WHERE c_custkey < 50)
        |SELECT * FROM (SELECT * FROM existing UNION ALL SELECT * FROM newb)
        |ORDER BY file_index""".stripMargin,
    "ref_error_channel" ->
      """WITH parsed AS (
        |  SELECT event_id, CAST(props->>'k' AS INTEGER) AS k FROM events)
        |SELECT event_id, 'success' AS status, k, CAST(NULL AS VARCHAR) AS error
        |FROM parsed WHERE k % 97 <> 0
        |UNION ALL
        |SELECT event_id, 'error' AS status, CAST(NULL AS INTEGER) AS k,
        |  'decode failed: k=' || k AS error
        |FROM parsed WHERE k % 97 = 0
        |ORDER BY event_id""".stripMargin,
    "ref_segments" ->
      """WITH f AS (
        |  SELECT user_id, event_id,
        |    CAST((row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1)
        |      // 5 AS BIGINT) AS segment
        |  FROM events)
        |SELECT user_id, segment, COUNT(*) AS n_frames,
        |  MIN(event_id) AS first_frame, MAX(event_id) AS last_frame
        |FROM f GROUP BY user_id, segment
        |HAVING COUNT(*) = 5
        |ORDER BY user_id, segment""".stripMargin,
    "ref_bbox_pipeline" ->
      """WITH b AS (
        |  SELECT l_suppkey AS sub_id, l_orderkey, l_linenumber,
        |    (CAST(l_quantity AS INT) * 11) % 600 AS x1,
        |    (l_linenumber * 53) % 440 AS y1,
        |    (CAST(l_quantity AS INT) * 11) % 600 + (l_orderkey % 80) + 20 AS x2,
        |    (l_linenumber * 53) % 440 + (l_partkey % 60) + 20 AS y2
        |  FROM lineitem),
        |m AS (
        |  SELECT *, MAX(x2 - x1) OVER (PARTITION BY sub_id) + 10 AS tw,
        |            MAX(y2 - y1) OVER (PARTITION BY sub_id) + 10 AS th
        |  FROM b),
        |r AS (
        |  SELECT sub_id, l_orderkey, l_linenumber, tw, th,
        |    GREATEST(0, CEIL((x1 + x2) / 2.0 - tw / 2.0)) AS rx1,
        |    GREATEST(0, CEIL((y1 + y2) / 2.0 - th / 2.0)) AS ry1
        |  FROM m),
        |c AS (
        |  SELECT sub_id, l_orderkey, l_linenumber, tw, th,
        |    LEAST(640, rx1 + tw) AS rx2, LEAST(480, ry1 + th) AS ry2
        |  FROM r)
        |SELECT sub_id, l_orderkey, l_linenumber, tw, th,
        |  CAST(GREATEST(0, rx2 - tw) AS BIGINT) AS bx1,
        |  CAST(GREATEST(0, ry2 - th) AS BIGINT) AS by1,
        |  CAST(rx2 AS BIGINT) AS bx2, CAST(ry2 AS BIGINT) AS by2
        |FROM c ORDER BY sub_id, l_orderkey, l_linenumber""".stripMargin,
  )
}
