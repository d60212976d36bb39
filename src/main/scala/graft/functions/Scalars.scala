package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}

/** Scalar functions — SURVEY.md §2.7. All codegen'd built-ins, no UDFs.
  *
  * Integer-valued math throughout (exact in double on any engine); the
  * one rounding op goes through DECIMAL so the tie-break is defined.
  */
object Scalars {

  /** F1/F2 (raw_to_samples.py:24-52): the recenter/ceil/clamp
    * transform — mirrors the reference: center (:20-21), ceil to
    * target size (:33-36), clamp to [0,W]x[0,H] preserving size
    * (:39-50). Reusable over any frame
    * with x1/y1/x2/y2 columns (target size tw x th, frame W x H) —
    * shared by fnMathBbox, Reference.refBboxPipeline, and the specs. */
  def resizeBbox(df: DataFrame, W: Int, H: Int,
      tw: org.apache.spark.sql.Column,
      th: org.apache.spark.sql.Column): DataFrame = {
    val cx = (col("x1") + col("x2")) / 2.0
    val cy = (col("y1") + col("y2")) / 2.0
    // ceil(center - half) then clamp right/bottom, then pull back the
    // left/top edge so the box keeps its target size at the walls.
    val rx1 = greatest(lit(0), ceil(cx - tw / 2.0))
    val ry1 = greatest(lit(0), ceil(cy - th / 2.0))
    val rx2 = least(lit(W), rx1 + tw)
    val ry2 = least(lit(H), ry1 + th)
    df.withColumn("bx1", greatest(lit(0), rx2 - tw).cast("long"))
      .withColumn("by1", greatest(lit(0), ry2 - th).cast("long"))
      .withColumn("bx2", rx2.cast("long"))
      .withColumn("by2", ry2.cast("long"))
  }

  /** F1 over the corpus: bboxes synthesized deterministically from
    * lineitem integer columns, then resized/clamped. */
  def fnMathBbox(s: SparkSession, dir: String): DataFrame = {
    val W = 640; val H = 480; val TW = 128; val TH = 96
    val base = Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_quantity").cast(IntegerType) * 11 % 600).as("x1"),
      ((col("l_linenumber") * 53) % 440).as("y1"),
      ((col("l_quantity").cast(IntegerType) * 11 % 600)
        + (col("l_orderkey") % 80) + 20).as("x2"),
      ((col("l_linenumber") * 53 % 440)
        + (col("l_partkey") % 60) + 20).as("y2"))
    resizeBbox(base, W, H, lit(TW), lit(TH))
      .select("l_orderkey", "l_linenumber", "bx1", "by1", "bx2", "by2")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** F5 (raw_to_samples.py:303-307): casts + rounding. floor/ceil are
    * bit-deterministic; ROUND goes through DECIMAL(18,2) so half-way
    * ties are exact, not float-boundary-dependent. */
  def fnCastRound(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).as("p_floor"),
        ceil(col("l_extendedprice")).as("p_ceil"),
        round(col("l_extendedprice").cast(DecimalType(18, 2)), 1)
          .cast("double").as("p_round1"),
        col("l_quantity").cast(IntegerType).as("qty_int"))
      .orderBy("l_orderkey", "l_linenumber")

  /** F6 (preprocessed_to_raw.py:40; raw_to_samples.py:254,366):
    * zero-padded id formatting, `{:06}` / `{:03}` via lpad. */
  def fnFormatString(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        lpad(col("o_orderkey").cast("string"), 6, "0").as("file_id"),
        concat(lit("sample-"),
          lpad((col("o_orderkey") % 100).cast("string"), 3, "0"),
          lit(".mp4")).as("sample_name"))
      .orderBy("o_orderkey")

  /** F11 (preprocess_dataset.py:77-79; preprocessed_to_raw.py:33-34):
    * JSON decode — parse events.props. */
  def fnJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .orderBy("event_id")

  /** F12 (engine-added; reference's only time math is fps-derived
    * seconds, raw_to_samples.py:330): calendar functions over
    * o_orderdate (millisecond-precision — safe to emit, unlike
    * events.ts whose ns payload Spark truncates). */
  def fnDatetime(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"),
          lit("1995-01-01").cast("date")).as("days_since"))
      .orderBy("o_orderkey")

  /** F9 (raw_to_samples.py:68,189-191): array indexing/length over the
    * embeddings vectors (float32 passthrough — identical bits in both
    * engines as long as we never re-accumulate). */
  def fnArrayOps(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(
        col("vec_id"),
        element_at(col("embedding"), 1).as("e1"),
        element_at(col("embedding"), 2).as("e2"),
        element_at(col("embedding"), -1).as("e_last"),
        size(col("embedding")).as("dim"))
      .orderBy("vec_id")

  /** F10 (raw_to_samples.py:159,225-229): zip/explode — posexplode of
    * tokenized text (bounded to doc_id<20 to keep the oracle cheap). */
  def fnMapExplode(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "token")
      .orderBy("doc_id", "pos")

  /** F18: higher-order array lambdas — transform / filter / exists /
    * forall / aggregate over token arrays (the Catalyst lambda surface
    * itself; the hot-path hashing versions are native expressions). */
  def fnHigherOrder(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        size(filter(col("toks"), t => length(t) > 4)).as("n_long"),
        exists(col("toks"), t => t === "the").as("has_the"),
        forall(col("toks"), t => length(t) > 1).as("all_multichar"),
        aggregate(transform(col("toks"), t => length(t)), lit(0),
          (acc, n) => acc + n).as("total_chars"))
      .orderBy("doc_id")

  /** F19: struct build/extract — nested metadata shaping (flattened
    * scalar outputs; raw struct columns don't hash-compare portably). */
  def fnStructOps(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        struct(col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio")).as("meta"))
      .select(col("o_orderkey"),
        col("meta.st").as("status"),
        upper(col("meta").getField("prio")).as("prio_uc"))
      .orderBy("o_orderkey")

  /** O2b: union by name with missing columns filled as null (schema
    * evolution across catalog generations). */
  def setUnionByname(s: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.orders(s, dir).filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val v2 = Tables.orders(s, dir)
      .filter(col("o_orderkey") >= 100 && col("o_orderkey") < 200)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"))
    v1.unionByName(v2, allowMissingColumns = true)
      .orderBy("o_orderkey")
  }

  /** F14: malformed-input tolerance — the dirty-web-data path every
    * training pipeline needs: a deterministic fraction of the JSON
    * column is truncated (simulating crawl corruption), and the parse
    * degrades to NULL + a corrupt flag instead of failing the job
    * (Spark's get_json_object returns NULL on malformed input; the
    * oracle guards with json_valid). */
  def fnJsonCorrupt(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        when(col("event_id") % 7 === 0,
          expr("substring(props, 1, greatest(length(props) - 1, 0))"))
          .otherwise(col("props")).as("raw"))
      .select(col("event_id"),
        get_json_object(col("raw"), "$.k").cast("int").as("k"),
        // corrupt from the CASTED value, not the raw extraction: the
        // oracle's TRY_CAST(... AS INTEGER) IS NULL also flags a
        // JSON-valid row whose k is non-numeric, so deriving from the
        // pre-cast string would diverge on such a row
        get_json_object(col("raw"), "$.k").cast("int").isNull.as("corrupt"))
      .orderBy("event_id")

  /** F17: MapType surface — build a per-user event_type->count map
    * (entries pre-sorted so construction is deterministic), then
    * exercise lookup, size, keys, and a higher-order fold over the
    * values. Output columns are all scalars, so the oracle reproduces
    * the VALUES with plain SQL — map internals never cross the
    * compare boundary. */
  def fnMapOps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("event_type"), col("cnt")))))
        .as("m"))
      .select(col("user_id"),
        size(col("m")).as("n_types"),
        element_at(col("m"), "click").as("clicks"),
        array_join(map_keys(col("m")), ",").as("keys"),
        aggregate(map_values(col("m")), lit(0L), _ + _).as("total"))
      .orderBy("user_id")

  /** F16: edit distance — Levenshtein between each document's prefix
    * and the next document's (fuzzy-matching primitive; bounded to a
    * 40-char prefix because the full DP is O(len^2) per pair and the
    * point is the operator, not a quadratic scan). */
  def fnEditDistance(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // neighbor = next doc within the same language partition: keeps
    // the window partitioned (a global ORDER BY window is the
    // single-partition trap the engine otherwise avoids)
    val w = Window.partitionBy("lang").orderBy("doc_id")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 1, 40).as("prefix"))
      .withColumn("next_prefix", lead(col("prefix"), 1).over(w))
      .filter(col("next_prefix").isNotNull)
      .select(col("doc_id"),
        levenshtein(col("prefix"), col("next_prefix")).as("edit_dist"),
        (levenshtein(col("prefix"), col("next_prefix")).cast("double") /
          greatest(length(col("prefix")), length(col("next_prefix"))))
          .as("rel_dist"))
      .orderBy("doc_id")
  }

  /** F15: binary codec family — base64 / md5 / hex over the UTF-8
    * bytes of a text column, plus an encode->decode round-trip check
    * (the content-addressing and wire-format tools a payload pipeline
    * leans on). */
  def fnCodec(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        // Spark's base64 is MIME-chunked (CRLF every 76 chars);
        // strip the breaks to the canonical unchunked form
        regexp_replace(base64(encode(col("text"), "UTF-8")),
          "[\\r\\n]", "").as("b64"),
        md5(encode(col("text"), "UTF-8")).as("md5_hex"),
        upper(hex(encode(substring(col("text"), 1, 4), "UTF-8"))).as("hex4"),
        (decode(unbase64(base64(encode(col("text"), "UTF-8"))), "UTF-8")
          === col("text")).as("roundtrip"))
      .orderBy("doc_id")

  /** F13: bitwise scalar family — AND / OR / XOR / shifts / popcount,
    * all over BIGINT keys so both engines compute in 64-bit. */
  def fnBitwise(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(col("l_partkey")).as("k_and"),
        col("l_orderkey").bitwiseOR(col("l_partkey")).as("k_or"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("k_xor"),
        shiftleft(col("l_linenumber").cast("long"), 3).as("line_shl"),
        shiftright(col("l_orderkey"), 2).as("key_shr"),
        bit_count(col("l_partkey")).as("part_bits"))
      // (l_orderkey, l_linenumber) is NOT unique in this corpus and
      // the payload depends on l_partkey — k_xor completes the order
      .orderBy("l_orderkey", "l_linenumber", "k_xor")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_edit_distance" -> fnEditDistance,
    "fn_codec" -> fnCodec,
    "fn_json_corrupt" -> fnJsonCorrupt,
    "fn_bitwise" -> fnBitwise,
    "fn_higher_order" -> fnHigherOrder,
    "fn_struct_ops" -> fnStructOps,
    "set_union_byname" -> setUnionByname,
    "fn_math_bbox" -> fnMathBbox,
    "fn_cast_round" -> fnCastRound,
    "fn_format_string" -> fnFormatString,
    "fn_json" -> fnJson,
    "fn_datetime" -> fnDatetime,
    "fn_array_ops" -> fnArrayOps,
    "fn_map_explode" -> fnMapExplode,
    "fn_map_ops" -> fnMapOps,
  )

  val oracles: Map[String, String] = Map(
    "fn_map_ops" ->
      """WITH c AS (
        |  SELECT user_id, event_type, COUNT(*) AS cnt
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  CAST(COUNT(*) AS INT) AS n_types,
        |  CAST(MAX(CASE WHEN event_type = 'click' THEN cnt END) AS BIGINT)
        |    AS clicks,
        |  string_agg(event_type, ',' ORDER BY event_type) AS keys,
        |  CAST(SUM(cnt) AS BIGINT) AS total
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,
    "fn_edit_distance" ->
      """WITH p AS (
        |  SELECT doc_id, substring(text, 1, 40) AS prefix,
        |    lead(substring(text, 1, 40))
        |      OVER (PARTITION BY lang ORDER BY doc_id) AS next_prefix
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(levenshtein(prefix, next_prefix) AS INT) AS edit_dist,
        |  CAST(levenshtein(prefix, next_prefix) AS DOUBLE) /
        |    NULLIF(greatest(length(prefix), length(next_prefix)), 0) AS rel_dist
        |FROM p WHERE next_prefix IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "fn_codec" ->
      """SELECT doc_id,
        |  base64(CAST(text AS BLOB)) AS b64,
        |  md5(text) AS md5_hex,
        |  upper(hex(CAST(substring(text, 1, 4) AS BLOB))) AS hex4,
        |  CAST(from_base64(base64(CAST(text AS BLOB))) AS VARCHAR) = text
        |    AS roundtrip
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_json_corrupt" ->
      """WITH m AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 7 = 0
        |         THEN substring(props, 1, greatest(length(props) - 1, 0))
        |         ELSE props END AS raw
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN json_valid(raw)
        |       THEN TRY_CAST(raw->>'k' AS INTEGER) END AS k,
        |  (CASE WHEN json_valid(raw)
        |        THEN TRY_CAST(raw->>'k' AS INTEGER) END) IS NULL AS corrupt
        |FROM m ORDER BY event_id""".stripMargin,
    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey & l_partkey AS k_and,
        |  l_orderkey | l_partkey AS k_or,
        |  xor(l_orderkey, l_partkey) AS k_xor,
        |  CAST(l_linenumber AS BIGINT) << 3 AS line_shl,
        |  l_orderkey >> 2 AS key_shr,
        |  CAST(bit_count(l_partkey) AS INT) AS part_bits
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, k_xor""".stripMargin,
    "fn_higher_order" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '), t -> length(t) > 4)) AS INT) AS n_long,
        |  list_has_any(string_split(text,' '), ['the']) AS has_the,
        |  len(list_filter(string_split(text,' '), t -> length(t) <= 1)) = 0 AS all_multichar,
        |  CAST(list_reduce(list_concat([0],
        |    list_transform(string_split(text,' '), t -> CAST(length(t) AS INT))),
        |    (a, b) -> a + b) AS INT) AS total_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_struct_ops" ->
      """SELECT o_orderkey,
        |  struct_extract({'st': o_orderstatus, 'prio': o_orderpriority}, 'st') AS status,
        |  upper(struct_extract({'st': o_orderstatus, 'prio': o_orderpriority}, 'prio')) AS prio_uc
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "set_union_byname" ->
      """SELECT o_orderkey, o_orderstatus, CAST(NULL AS VARCHAR) AS o_orderpriority
        |FROM orders WHERE o_orderkey < 100
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_orderpriority
        |FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 200
        |ORDER BY o_orderkey""".stripMargin,
    "fn_math_bbox" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber,
        |    (CAST(l_quantity AS INT) * 11) % 600 AS x1,
        |    (l_linenumber * 53) % 440 AS y1,
        |    (CAST(l_quantity AS INT) * 11) % 600 + (l_orderkey % 80) + 20 AS x2,
        |    (l_linenumber * 53) % 440 + (l_partkey % 60) + 20 AS y2
        |  FROM lineitem),
        |r AS (
        |  SELECT l_orderkey, l_linenumber,
        |    GREATEST(0, CEIL((x1+x2)/2.0 - 64)) AS rx1,
        |    GREATEST(0, CEIL((y1+y2)/2.0 - 48)) AS ry1
        |  FROM b),
        |c AS (
        |  SELECT l_orderkey, l_linenumber,
        |    LEAST(640, rx1 + 128) AS rx2, LEAST(480, ry1 + 96) AS ry2
        |  FROM r)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(GREATEST(0, rx2 - 128) AS BIGINT) AS bx1,
        |  CAST(GREATEST(0, ry2 - 96) AS BIGINT) AS by1,
        |  CAST(rx2 AS BIGINT) AS bx2, CAST(ry2 AS BIGINT) AS by2
        |FROM c ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_cast_round" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS p_floor,
        |  CAST(CEIL(l_extendedprice) AS BIGINT) AS p_ceil,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS p_round1,
        |  CAST(l_quantity AS INT) AS qty_int
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_format_string" ->
      """SELECT o_orderkey,
        |  lpad(CAST(o_orderkey AS VARCHAR), 6, '0') AS file_id,
        |  'sample-' || lpad(CAST(o_orderkey % 100 AS VARCHAR), 3, '0') || '.mp4' AS sample_name
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_json" ->
      """SELECT event_id, CAST(props->>'k' AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_array_ops" ->
      """SELECT vec_id, embedding[1] AS e1, embedding[2] AS e2,
        |  embedding[-1] AS e_last, CAST(len(embedding) AS INT) AS dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "fn_map_explode" ->
      """SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |      FROM documents WHERE doc_id < 20),
        |     UNNEST(range(1, len(toks)+1)) AS r(i)
        |ORDER BY doc_id, pos""".stripMargin,
  )
}
