package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair mining for alignment training and the SCD2
  * point-in-time join — two curation-side operators a training-data
  * platform runs between raw corpus and trainer.
  */
object Curation {

  /** DPO/RLHF preference-pair mining: within each source, pair the
    * top-k highest-quality documents (quality = type-token ratio in
    * exact ppm — swap in any scorer) against the bottom-k, emitting
    * (chosen, rejected) rows with their margin. Rank ties pin to the
    * smaller doc_id on BOTH ends; pairs require a strictly positive
    * margin and distinct docs (a group whose top and bottom coincide
    * yields nothing). k = 2 → ≤ k² pairs per group. Scale: two
    * rank-then-filter windows partitioned by source (the
    * WindowGroupLimit shape), then a per-source k×k join — output is
    * groups·k², never corpus-squared. */
  def corpusDpoPairsOn(docs: DataFrame, topK: Int = 2): DataFrame = {
    val t = split(col("text"), " ")
    val scored = docs
      .select(col("doc_id"), col("source"), size(t).as("n"),
        size(array_distinct(t)).as("nd"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("source"),
        expr("CAST(nd * 1000000 DIV n AS BIGINT)").as("ttr_ppm"))
      .localCheckpoint(true) // both rank windows read it
    val top = scored.withColumn("rk", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("ttr_ppm").desc, col("doc_id").asc)))
      .filter(col("rk") <= topK)
      .select(col("source"), col("doc_id").as("chosen_doc"),
        col("ttr_ppm").as("chosen_ttr"))
    val bottom = scored.withColumn("rk", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("ttr_ppm").asc, col("doc_id").asc)))
      .filter(col("rk") <= topK)
      .select(col("source"), col("doc_id").as("rejected_doc"),
        col("ttr_ppm").as("rejected_ttr"))
    top.join(bottom, "source")
      .filter(col("chosen_doc") =!= col("rejected_doc") &&
        col("chosen_ttr") > col("rejected_ttr"))
      .select(col("source"), col("chosen_doc"), col("rejected_doc"),
        col("chosen_ttr"), col("rejected_ttr"),
        (col("chosen_ttr") - col("rejected_ttr")).as("margin_ppm"))
      .orderBy("source", "chosen_doc", "rejected_doc")
  }

  def corpusDpoPairs(s: SparkSession, dir: String): DataFrame =
    corpusDpoPairsOn(Tables.documents(s, dir))

  /** SCD2 point-in-time join, tie-safe: build type-2 version
    * intervals of each user's spend TIER (cumulative purchase cents
    * DIV 100k) and join every event back to the version valid at its
    * instant. Interval keys are LEXICOGRAPHIC (ts, event_id) structs,
    * not bare timestamps — two events in the same microsecond still
    * order deterministically, so version validity is well-defined
    * under ties (the pin most PIT implementations silently lack).
    * Intervals are right-open: the event that crosses a tier
    * threshold belongs to the NEW version. Everything — running sum,
    * change detection, lead boundary, and the interval probe — is
    * partitioned by user_id: one exchange, no global window, and the
    * non-equi interval condition runs inside the user-keyed join.
    * The oracle verifies the MACHINERY against the direct spelling
    * (inclusive running sum DIV threshold per event) — two different
    * constructions, one answer. */
  def joinScd2PitOn(events: DataFrame,
      tierCents: Long = 100000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val base = events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tus"),
        when(col("event_type") === "purchase",
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .otherwise(0L).as("cents"))
      .withColumn("cum", sum(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tier", expr(s"cum DIV $tierCents"))
      .localCheckpoint(true) // versions and facts both read it
    val versions = base
      .withColumn("prev_tier", lag(col("tier"), 1).over(w))
      .filter(col("prev_tier").isNull || col("prev_tier") =!= col("tier"))
      .withColumn("from_k", struct(col("tus"), col("event_id")))
      .withColumn("to_k", lead(struct(col("tus"), col("event_id")), 1)
        .over(w))
      .select(col("user_id"), col("tier").as("pit_tier"),
        col("from_k"), col("to_k"))
    base
      .select(col("event_id"), col("user_id"),
        struct(col("tus"), col("event_id")).as("k"))
      .join(versions, Seq("user_id"))
      .filter(col("k") >= col("from_k") &&
        (col("to_k").isNull || col("k") < col("to_k")))
      .select(col("event_id"), col("user_id"), col("pit_tier").as("tier"))
      .orderBy("event_id")
  }

  def joinScd2Pit(s: SparkSession, dir: String): DataFrame =
    joinScd2PitOn(Tables.events(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_dpo_pairs" -> corpusDpoPairs,
    "join_scd2_pit" -> joinScd2Pit,
  )

  val oracles: Map[String, String] = Map(
    "corpus_dpo_pairs" ->
      """WITH s AS (SELECT doc_id, source,
        |    CAST(len(list_distinct(string_split(text, ' '))) * 1000000
        |      // len(string_split(text, ' ')) AS BIGINT) AS ttr_ppm
        |  FROM documents WHERE len(string_split(text, ' ')) > 0),
        |top AS (SELECT source, doc_id AS chosen_doc,
        |    ttr_ppm AS chosen_ttr
        |  FROM s QUALIFY row_number() OVER (PARTITION BY source
        |    ORDER BY ttr_ppm DESC, doc_id ASC) <= 2),
        |bot AS (SELECT source, doc_id AS rejected_doc,
        |    ttr_ppm AS rejected_ttr
        |  FROM s QUALIFY row_number() OVER (PARTITION BY source
        |    ORDER BY ttr_ppm ASC, doc_id ASC) <= 2)
        |SELECT top.source, chosen_doc, rejected_doc, chosen_ttr,
        |  rejected_ttr, chosen_ttr - rejected_ttr AS margin_ppm
        |FROM top JOIN bot ON top.source = bot.source
        |WHERE chosen_doc <> rejected_doc AND chosen_ttr > rejected_ttr
        |ORDER BY top.source, chosen_doc, rejected_doc""".stripMargin,
    // Direct spelling: the tier AT each event is the inclusive
    // running purchase-cents sum DIV the threshold — no intervals.
    // Agreement proves the SCD2 interval construction + PIT probe.
    "join_scd2_pit" ->
      """WITH b AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END AS cents
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(SUM(cents) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    // 100000 AS BIGINT) AS tier
        |FROM b ORDER BY event_id""".stripMargin,
  )
}
