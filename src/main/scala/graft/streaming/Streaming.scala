package graft.streaming

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming surface — SURVEY.md §2.10.
  *
  * The reference is batch-only; its tumbling 2-second segments
  * (raw_to_samples.py:336-341) are the batch shadow of streaming
  * tumbling windows. Each op here is written as a pure transform over
  * an input DataFrame so the SAME function runs under
  * `spark.read.parquet` (batch, DuckDB-oracled below) and
  * `spark.readStream` (with a watermark added) — that equivalence is
  * exercised in StreamingSpec with a file/Memory stream.
  */
object Streaming {

  /** T1: tumbling window aggregate (2-minute buckets per event_type).
    * Output only the bucket start — never the raw ns-precision ts
    * (Spark truncates to micros; flooring to the bucket is safe). */
  def tumbling(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "2 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Exact.sumD(col("value")).as("total_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))

  def streamTumbling(s: SparkSession, dir: String): DataFrame =
    tumbling(Tables.events(s, dir)).orderBy("win_start", "event_type")

  /** T2: sliding window aggregate — 10-minute windows every 5 minutes
    * (each event lands in exactly two windows). */
  def sliding(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "10 minutes", "5 minutes").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Exact.sumD(col("value")).as("total_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))

  def streamSliding(s: SparkSession, dir: String): DataFrame =
    sliding(Tables.events(s, dir)).orderBy("win_start", "event_type")

  /** T3: session window — per-user sessions with a 30-minute gap.
    * Session boundaries depend on ts differences only (> 1s apart in
    * the data), so micro vs nano truncation cannot flip a boundary.
    * Output session bounds truncated to the second for oracle parity. */
  def session(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        Exact.sumD(col("value")).as("session_value"))
      .select(col("user_id"),
        date_trunc("second", col("session_window.start"))
          .as("session_start"),
        col("n_events"), col("session_value"))

  def streamSession(s: SparkSession, dir: String): DataFrame =
    session(Tables.events(s, dir)).orderBy("user_id", "session_start")

  /** T4: late-data discard — the batch mirror of a watermark: drop
    * rows older than (global max ts - tolerance), like the reference
    * drops its incomplete trailing segment (raw_to_samples.py:340-341).
    * The scalar max is computed in a 1-row subplan and broadcast into
    * the filter, not collected to the driver. */
  def lateDataFilter(ev: DataFrame, toleranceSec: Int): DataFrame = {
    val maxTs = ev.agg(max(col("ts")).as("max_ts"))
    ev.crossJoin(broadcast(maxTs))
      .filter(col("ts") >= col("max_ts") - expr(s"INTERVAL $toleranceSec SECONDS"))
      .drop("max_ts")
  }

  def streamLateFilter(s: SparkSession, dir: String): DataFrame =
    lateDataFilter(Tables.events(s, dir), 3 * 24 * 3600)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")

  /** T6 (stream-stream join): every (click, purchase) pair of the same
    * user with the purchase inside 10 minutes after the click. The
    * same transform runs as a batch equi+range join (SMJ on user_id)
    * and as a watermarked stream-stream inner join (StreamingSpec);
    * event-time columns stay timestamps so the streaming state store
    * can bound retention from the range condition. */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.alias("c").join(purchases.alias("p"),
      col("c.user_id") === col("p.user_id") &&
        col("p.ts") >= col("c.ts") &&
        col("p.ts") <= col("c.ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("c.user_id").as("user_id"),
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"))

  def streamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    intervalJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  /** T6b (stream-stream LEFT OUTER): every click, with its in-window
    * purchase when one exists and NULL otherwise — the outer-join
    * flavor where, under readStream, the watermark decides when an
    * unmatched left row can be emitted as null-padded (state cannot
    * wait forever). Batch shadow below; the streaming flavor needs
    * watermarks on BOTH sides plus the event-time range condition. */
  def intervalJoinLeft(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.alias("c").join(purchases.alias("p"),
      col("c.user_id") === col("p.user_id") &&
        col("p.ts") >= col("c.ts") &&
        col("p.ts") <= col("c.ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("c.user_id").as("user_id"),
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"))

  def streamIntervalJoinLeft(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    intervalJoinLeft(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy(col("user_id"), col("click_id"),
        col("purchase_id").asc_nulls_first)
  }

  /** T9: stream-static enrichment join — the canonical streaming
    * dimension lookup (Spark's stream-static join: the static side is
    * a batch relation planned as a broadcast per micro-batch, no
    * state store, no watermark needed on the dim): each event joins
    * its user's segment from the customer dimension, unmatched users
    * land in the '(none)' bucket (LEFT join — a missing dim row must
    * not drop fact rows), then a per-segment rollup. Written as a
    * pure transform so the same function runs under read and
    * readStream; StreamingSpec proves the equivalence with a memory
    * stream in complete mode. At 100 TB the dim side stays broadcast
    * when it fits (the hint below) and the rollup is a k-row
    * map-side-combined aggregate — the fact stream is never
    * shuffled by the join. */
  def staticEnrich(ev: DataFrame, dim: DataFrame): DataFrame =
    ev.join(
        broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
        ev("user_id") === col("c_custkey"), "left")
      .select(coalesce(col("c_mktsegment"), lit("(none)")).as("segment"),
        col("value"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_events"),
        Exact.sumD(col("value")).as("total_value"))

  def streamStaticJoin(s: SparkSession, dir: String): DataFrame =
    staticEnrich(Tables.events(s, dir), Tables.customer(s, dir))
      .orderBy("segment")

  /** T7: streaming dedup — first-arrival key dedup, the streaming
    * spelling of exact dedup (dropDuplicatesWithinWatermark bounds the
    * key state by event time; StreamingSpec runs that flavor). Only
    * the surviving KEY SET is emitted: which physical row survives is
    * arrival-order-dependent in both engines, the key set is not. */
  def dedupKeys(ev: DataFrame): DataFrame =
    ev.dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"))

  def streamDedup(s: SparkSession, dir: String): DataFrame =
    dedupKeys(Tables.events(s, dir)).orderBy("user_id", "event_type")

  /** T8: custom sessionization over KeyValueGroupedDataset — the
    * arbitrary-stateful-op surface (SURVEY §2.10). Batch spelling:
    * flatMapGroups walks each user's events in (ts, event_id) order
    * and cuts a new session when the gap exceeds 30 minutes; the
    * streaming spelling is flatMapGroupsWithState (same walk, state =
    * open session; StreamingSpec pins a mapGroupsWithState variant).
    * All comparisons are on unix_micros (== DuckDB epoch_us exactly);
    * outputs are ids/counts only — no raw timestamps (ns vs us). */
  /** The session walk itself, shared by the batch flatMapGroups
    * spelling and the streaming flatMapGroupsWithState spelling
    * (StreamingSpec): rows are (user_id, event_id, unix_micros),
    * output is (user_id, session_idx, n_events, first_event,
    * last_event). Group fits in memory at corpus scale (events per
    * user); the streaming flavor bounds it by watermark + timeout. */
  private[graft] def sessionWalk(uid: Long,
      it: Iterator[(Long, Long, Long)]): Iterator[(Long, Long, Long, Long, Long)] = {
    val gapUs = 30L * 60 * 1000000
    val rows = it.toArray.sortBy(r => (r._3, r._2))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    var idx = -1L; var prev = Long.MinValue
    var n = 0L; var first = Long.MaxValue; var last = Long.MinValue
    rows.foreach { case (_, eid, t) =>
      if (idx < 0L || t - prev > gapUs) {
        if (idx >= 0L) out += ((uid, idx, n, first, last))
        idx += 1; n = 0; first = Long.MaxValue; last = Long.MinValue
      }
      n += 1
      if (eid < first) first = eid
      if (eid > last) last = eid
      prev = t
    }
    if (idx >= 0L) out += ((uid, idx, n, first, last))
    out.iterator
  }

  def streamUserSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups(sessionWalk _)
      .toDF("user_id", "session_idx", "n_events", "first_event",
        "last_event")
      .orderBy("user_id", "session_idx")
  }

  /** Sequential-pattern walk shared by the batch flatMapGroups
    * spelling below and a streaming flatMapGroupsWithState variant
    * (state = the (s, p, bad) triple; watermark + timeout bound it):
    * same contract as [[graft.operators.Events.eventPatternMatchOn]]
    * — first signup, first purchase in (s, s+7d], no error STRICTLY
    * between — decided by three passes over the time-sorted group so
    * the boundary pins (right-closed window, strict negation, equal-
    * timestamp events never count as "between") are explicit rather
    * than walk-order accidents. */
  private[graft] def patternWalk(uid: Long,
      it: Iterator[(Long, String, Long)]): Iterator[(Long, Long, Long, Long)] = {
    val win = 604800000000L
    val rows = it.toArray.sortBy(r => (r._3, r._1))
    val s = rows.collectFirst { case (_, "signup", t) => t }
    val p = s.flatMap(sv => rows.collectFirst {
      case (_, "purchase", t) if t > sv && t <= sv + win => t })
    val bad = (s, p) match {
      case (Some(sv), Some(pv)) =>
        rows.exists { case (_, et, t) => et == "error" && t > sv && t < pv }
      case _ => true
    }
    if (!bad) Iterator((uid, s.get, p.get, (p.get - s.get) / 60000000L))
    else Iterator.empty
  }

  /** T9: the CEP pattern in the typed Dataset tier — groupByKey +
    * flatMapGroups over (user_id, event_type, unix_micros), the
    * execution shape that becomes flatMapGroupsWithState under
    * readStream. Same oracle as event_pattern_match: three
    * implementations (declarative windows, imperative group walk,
    * DuckDB SQL), one answer. */
  def streamPatternMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("user_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._4)
      .flatMapGroups((uid: Long, it: Iterator[(Long, String, Long, Long)]) =>
        patternWalk(uid, it.map(r => (r._1, r._2, r._3))))
      .toDF("user_id", "ts_signup_us", "ts_purchase_us", "lag_min")
      .orderBy("user_id")
  }

  /** T6: Count-Min grid per tumbling window — the sketch-in-streaming
    * composition: per 2-minute window, fold the event-type stream
    * into the D x W counter grid ([[graft.functions.Text.cmsCells]],
    * same hash family as the batch sketch). The streaming state per
    * window is EXACTLY D*W counters no matter the event rate — the
    * bounded-state property that lets a watermarked stream keep
    * frequency estimates forever where per-key counts grow with
    * cardinality. Output is the grid itself (the mergeable sketch a
    * downstream reader probes); batch/stream equivalence follows
    * from the aggregate being a plain windowed count
    * (StreamingSpec's tumbling machinery, same shape). */
  def countminGrid(ev: DataFrame): DataFrame =
    ev.select(window(col("ts"), "2 minutes").as("win"),
        graft.functions.Text.cmsCells(col("event_type")).as("x"))
      .groupBy(col("win.start").as("win_start"),
        col("x.d").as("d"), col("x.bkt").as("bkt"))
      .agg(count(lit(1)).as("bc"))

  def streamCountmin(s: SparkSession, dir: String): DataFrame =
    countminGrid(Tables.events(s, dir)).orderBy("win_start", "d", "bkt")

  /** T12: windowed distinct-user ESTIMATION with bounded state — the
    * HLL register grid ([[graft.functions.Sketches]] geometry, same
    * pinned hash) per 2-minute tumbling window: streaming state per
    * window is EXACTLY m = 256 register minima whatever the event
    * rate, the property that lets a watermarked stream keep
    * cardinality estimates forever where a windowed count-distinct's
    * state grows with cardinality. The aggregate is a plain windowed
    * MIN — streamable under a watermark like any windowed count
    * (StreamingSpec pins batch == readStream on this grid); the
    * estimate finishes from the ≤ 256-row grid per window
    * (sink-side under foreachBatch — the stream_topk finisher
    * position; inline in batch). The exact per-window distinct rides
    * as the eval column, the pass the sketch replaces. */
  def hllGrid(ev: DataFrame): DataFrame =
    ev.select(window(col("ts"), "2 minutes").as("win"),
        expr(s"(user_id * 2654435761 + 12345) % " +
          s"${graft.functions.Sketches.P}").as("h"))
      .groupBy(col("win.start").as("win_start"),
        expr(s"h % ${graft.functions.Sketches.HllM}").as("bucket"))
      .agg(min(expr(s"h DIV ${graft.functions.Sketches.HllM}")).as("wmin"))

  def streamHll(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val exact = ev.select(window(col("ts"), "2 minutes").as("win"),
        col("user_id")).distinct()
      .groupBy(col("win.start").as("win_start"))
      .agg(count(lit(1)).as("exact_users"))
    graft.functions.Sketches.hllFinish(hllGrid(ev), Seq("win_start"))
      .join(exact, Seq("win_start"))
      .withColumn("err", col("est") - col("exact_users"))
      .select("win_start", "n_hit", "v_empty", "s_scaled", "est_raw",
        "est", "exact_users", "err")
      .orderBy("win_start")
  }

  /** T9: CDC log replay — materialize the LATEST state of every
    * entity from a change log carrying upserts and tombstones
    * (Debezium/Delta CDF semantics: last writer wins by change time,
    * a trailing delete removes the key). The synthetic log reads
    * every event as a change on its user_id — 'error' rows are
    * tombstones, anything else upserts the cents value.
    *
    * Batch spelling (below): one change-time-descending row_number
    * per key over the SAME partitioning that carries the per-key
    * change count — one shuffle total — then keep rank-1 rows that
    * are not tombstones. Streaming spelling: the per-key "latest
    * (ts, op, value)" is exactly a mapGroupsWithState fold (the
    * foreachBatch CDC test in StreamingSpec pins the sequential-
    * micro-batch == one-batch-merge equivalence this relies on).
    * Keys whose last change is a delete appear in NEITHER output —
    * that asymmetry (vs merge_upsert's keep-everything full outer)
    * is what makes tombstones tombstones. */
  def cdcReplay(ev: DataFrame): DataFrame = {
    val log = ev.select(col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_id"),
      when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
        .as("op"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val wk = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("tus").desc, col("event_id").desc)
    log
      .withColumn("rn", row_number().over(w))
      .withColumn("n_changes", count(lit(1)).over(wk))
      .filter(col("rn") === 1 && col("op") === "U")
      .select(col("user_id"), col("cents").as("latest_cents"),
        col("n_changes"))
  }

  def streamCdcReplay(s: SparkSession, dir: String): DataFrame =
    cdcReplay(Tables.events(s, dir)).orderBy("user_id")

  /** T10a: the streamable half of windowed top-k — a plain tumbling
    * count aggregate (complete/update modes both legal). */
  def windowCounts(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "2 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** T10b: the rank finisher — row_number per window, NOT streamable
    * as a continuous operator (Spark rejects non-time windows on a
    * streaming aggregate), so under readStream it runs inside
    * foreachBatch / on the sink table per micro-batch — the standard
    * "aggregate in the engine, rank at the sink" split every
    * streaming leaderboard uses (StreamingSpec pins the parity). The
    * rank window partitions by win_start over a per-window relation
    * bounded by |event types| — never a global sort. */
  def rankTopk(counts: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("win_start")
      .orderBy(col("n_events").desc, col("event_type").asc)
    counts.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** T10: per-window top-k leaderboard (batch spelling of the
    * streaming pair above). */
  def streamTopk(s: SparkSession, dir: String): DataFrame =
    rankTopk(windowCounts(Tables.events(s, dir)))
      .orderBy("win_start", "rnk")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_topk" -> streamTopk,
    "stream_cdc_replay" -> streamCdcReplay,
    "stream_countmin" -> streamCountmin,
    "stream_hll" -> streamHll,
    "stream_dedup" -> streamDedup,
    "stream_user_sessions" -> streamUserSessions,
    "stream_pattern_match" -> streamPatternMatch,
    "stream_interval_join" -> streamIntervalJoin,
    "stream_interval_join_left" -> streamIntervalJoinLeft,
    "stream_tumbling" -> streamTumbling,
    "stream_sliding" -> streamSliding,
    "stream_session" -> streamSession,
    "stream_late_filter" -> streamLateFilter,
    "stream_static_join" -> streamStaticJoin,
  )

  val oracles: Map[String, String] = Map(
    // Mirrors staticEnrich: LEFT dim lookup, '(none)' bucket, exact
    // DECIMAL(18,2) value sum (the Exact.sumD contract).
    "stream_static_join" ->
      """SELECT COALESCE(c_mktsegment, '(none)') AS segment,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_value
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin,
    "stream_cdc_replay" ->
      """WITH log AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |rk AS (SELECT user_id, op, cents,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY tus DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        |  FROM log)
        |SELECT user_id, cents AS latest_cents, n_changes
        |FROM rk WHERE rn = 1 AND op = 'U' ORDER BY user_id""".stripMargin,
    // Mirrors streamHll: same pinned hash/geometry as sketch_hll,
    // per-window register minima + the shared estimate finisher.
    "stream_hll" ->
      s"""WITH h AS (SELECT time_bucket(INTERVAL 2 MINUTES, ts)
         |      AS win_start, user_id,
         |    (user_id * 2654435761 + 12345) % ${graft.functions.Sketches.P}
         |      AS h
         |  FROM events),
         |mn AS (SELECT win_start,
         |    h % ${graft.functions.Sketches.HllM} AS bucket,
         |    MIN(h // ${graft.functions.Sketches.HllM}) AS wmin
         |  FROM h GROUP BY 1, 2),
         |ms AS (SELECT win_start, bucket, MAX(i) AS msb
         |  FROM mn LEFT JOIN range(0, 22) r(i)
         |    ON (CAST(1 AS BIGINT) << CAST(i AS INT)) <= wmin
         |  GROUP BY 1, 2),
         |rh AS (SELECT win_start, COALESCE(22 - msb, 23) AS rho FROM ms),
         |per AS (SELECT win_start, CAST(COUNT(*) AS BIGINT) AS n_hit,
         |    CAST(SUM(CAST(1 AS BIGINT) << CAST(23 - rho AS INT))
         |      AS BIGINT) AS s_hit
         |  FROM rh GROUP BY 1),
         |c AS (SELECT win_start, n_hit,
         |    CAST(256 - n_hit AS BIGINT) AS v_empty,
         |    CAST(s_hit + (256 - n_hit) * (CAST(1 AS BIGINT) << 23)
         |      AS BIGINT) AS s_scaled FROM per),
         |e AS (SELECT *, CAST(CAST(718272 AS HUGEINT) * 65536 * 8388608
         |    // (CAST(s_scaled AS HUGEINT) * 1000000) AS BIGINT)
         |      AS est_raw FROM c),
         |f AS (SELECT *, CASE WHEN est_raw <= 640 AND v_empty > 0
         |    THEN CAST(floor(256.0 * ln(256.0 / v_empty)) AS BIGINT)
         |    ELSE est_raw END AS est FROM e),
         |x AS (SELECT time_bucket(INTERVAL 2 MINUTES, ts) AS win_start,
         |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
         |  FROM events GROUP BY 1)
         |SELECT f.win_start, n_hit, v_empty, s_scaled, est_raw, est,
         |  exact_users, CAST(est - exact_users AS BIGINT) AS err
         |FROM f JOIN x ON f.win_start = x.win_start
         |ORDER BY f.win_start""".stripMargin,
    "stream_countmin" ->
      """WITH ec AS (SELECT time_bucket(INTERVAL 2 MINUTES, ts)
        |      AS win_start,
        |    list_reduce(
        |      list_concat([CAST(0 AS BIGINT)],
        |        list_transform(string_split(event_type,''),
        |          ch -> CAST(unicode(ch) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007) AS h
        |  FROM events),
        |cells AS (SELECT win_start, d,
        |    ((h * (2*d + 3) + (97*d + 31)) % 1000000007) % 16 AS bkt
        |  FROM ec, UNNEST([0, 1, 2]) AS r(d))
        |SELECT win_start, d, bkt, COUNT(*) AS bc
        |FROM cells GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "stream_interval_join_left" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        |  p.event_id AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        |  AND epoch_us(p.ts) >= epoch_us(c.ts)
        |  AND epoch_us(p.ts) <= epoch_us(c.ts) + 600000000
        |ORDER BY user_id, click_id, purchase_id NULLS FIRST""".stripMargin,
    "stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    // same contract as the declarative event_pattern_match oracle —
    // the group-walk implementation must land on the identical rows
    "stream_pattern_match" ->
      """WITH ue AS (SELECT user_id, event_type, epoch_us(ts) AS tus
        |  FROM events),
        |sg AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN tus END) AS s
        |  FROM ue GROUP BY 1),
        |pu AS (SELECT ue.user_id,
        |    MIN(CASE WHEN event_type = 'purchase' AND tus > sg.s
        |      AND tus <= sg.s + 604800000000 THEN tus END) AS p
        |  FROM ue JOIN sg ON ue.user_id = sg.user_id GROUP BY 1),
        |bd AS (SELECT ue.user_id,
        |    MAX(CASE WHEN event_type = 'error' AND tus > sg.s
        |      AND tus < pu.p THEN 1 ELSE 0 END) AS bad
        |  FROM ue JOIN sg ON ue.user_id = sg.user_id
        |    JOIN pu ON ue.user_id = pu.user_id GROUP BY 1)
        |SELECT sg.user_id, CAST(sg.s AS BIGINT) AS ts_signup_us,
        |  CAST(pu.p AS BIGINT) AS ts_purchase_us,
        |  CAST((pu.p - sg.s) // 60000000 AS BIGINT) AS lag_min
        |FROM sg JOIN pu ON sg.user_id = pu.user_id
        |  JOIN bd ON sg.user_id = bd.user_id
        |WHERE sg.s IS NOT NULL AND pu.p IS NOT NULL AND bd.bad = 0
        |ORDER BY sg.user_id""".stripMargin,
    "stream_user_sessions" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, event_id,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_idx
        |  FROM o)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "stream_interval_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTES
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    "stream_topk" ->
      """WITH wc AS (SELECT time_bucket(INTERVAL 2 MINUTES, ts)
        |    AS win_start, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT win_start, event_type, n_events,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY win_start
        |      ORDER BY n_events DESC, event_type ASC) AS INT) AS rnk
        |  FROM wc)
        |SELECT win_start, event_type, n_events, rnk
        |FROM rk WHERE rnk <= 3
        |ORDER BY win_start, rnk""".stripMargin,
    "stream_tumbling" ->
      """SELECT time_bucket(INTERVAL 2 MINUTES, ts) AS win_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_sliding" ->
      """WITH b AS (SELECT time_bucket(INTERVAL 5 MINUTES, ts) AS bkt, event_type, value FROM events),
        |w AS (
        |  SELECT bkt AS win_start, event_type, value FROM b
        |  UNION ALL
        |  SELECT bkt - INTERVAL 5 MINUTES AS win_start, event_type, value FROM b)
        |SELECT win_start, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_session" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTES
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM o)
        |SELECT user_id,
        |  date_trunc('second', MIN(ts)) AS session_start,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM g GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "stream_late_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 3 DAYS
        |ORDER BY event_id""".stripMargin,
  )
}
