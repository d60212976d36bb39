package graft.functions

import graft.{Guards, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate string matching and phrase extraction: an edit-
  * distance-1 fuzzy join made shuffle-joinable by deletion-
  * neighborhood blocking (the FastSS family: Bocek et al. 2007,
  * "Fast Similarity Search in Large Dictionaries"), and RAKE keyword
  * extraction (Rose et al. 2010, "Automatic Keyword Extraction from
  * Individual Documents") — the stopword-delimited phrase scorer
  * that needs no training pass.
  */
object Fuzzy {

  /** `{s} ∪ single-character deletions of s` — two strings are
    * within edit distance 1 ONLY IF their variant sets intersect
    * (equal → share s; substitution → share the deletion at the
    * substituted position; insert/delete → the shorter string IS a
    * deletion of the longer). The converse does not hold (e.g. "ab"
    * vs "ba" share "a" at distance 2), so candidates are re-verified
    * with the exact levenshtein — blocking is a recall-complete
    * prefilter, never the decision. */
  private[functions] def variants(s: Column): Column = array_union(
    array(s),
    expr(s"transform(sequence(0, length(${s.toString}) - 1), " +
      s"i -> concat(substr(${s.toString}, 1, i), " +
      s"substr(${s.toString}, i + 2, length(${s.toString}))))"))

  /** Edit-distance-≤1 join of a probe list against the distinct
    * p_type vocabulary. The naive spelling is a cartesian
    * levenshtein scan — O(|probes|·|vocab|) and never pushable; the
    * scale path explodes both sides into deletion variants
    * (length+1 rows per string) and EQUI-joins on the variant, so
    * Spark shuffles on a real key and the exact distance runs only
    * on the few colliding candidates. At 100 TB vocabularies this is
    * the difference between a broadcast-nested-loop and a hash join
    * whose build side is (length+1)× the probe list. Probes are a
    * pinned literal (typo per edit kind: deletion, substitution,
    * suffix-drop, insertion, an exact hit, and a no-match control). */
  def joinFuzzyOn(dict: DataFrame, probes: Seq[String]): DataFrame = {
    val s = dict.sparkSession
    import s.implicits._
    val d = dict.select(col(dict.columns.head).as("term")).distinct()
      .select(col("term"), explode(variants(col("term"))).as("v"))
    val p = probes.toDF("probe")
      .select(col("probe"), explode(variants(col("probe"))).as("v"))
    d.join(broadcast(p), "v")
      .select("probe", "term").distinct()
      .filter(levenshtein(col("probe"), col("term")) <= 1)
      .select(col("probe"), col("term"),
        levenshtein(col("probe"), col("term")).cast("long").as("dist"))
      .orderBy("probe", "term")
  }

  val FuzzyProbes: Seq[String] =
    Seq("ECONMY", "STANDRD", "LARG", "MEDIAM", "SMALLS", "PROMO", "TURBO")

  def joinFuzzy(s: SparkSession, dir: String): DataFrame =
    joinFuzzyOn(Tables.part(s, dir).select("p_type"), FuzzyProbes)

  /** RAKE stopword list — pinned literal shared with the oracle (the
    * corpus's function words; RAKE's quality is set by this list, so
    * it is part of the operator contract, not a tunable). */
  val RakeStop: Seq[String] = Seq("a", "the", "and", "of", "to", "in",
    "is", "on", "for", "with", "as", "at", "by", "an")

  /** RAKE keywords: split each document into candidate phrases at
    * stopword boundaries, score each word by degree/frequency over
    * the whole corpus (degree = Σ length of phrases containing the
    * word, counted with multiplicity), score each phrase as the sum
    * of its word scores, and keep the top 3 phrases per document.
    *
    * All integer: word score in ppm (degree·1e6 DIV freq, both
    * non-negative), phrase score an exact sum. Phrase identity is
    * reconstructed order-preservingly (sort_array over (pos, tok)
    * structs — the agg_collect_list discipline). Scale: the phrase-id
    * window partitions by doc_id (per-doc token counts are bounded);
    * the corpus-wide word-score relation is vocabulary-sized and
    * broadcast back over the phrase-word rows; ranking collapses via
    * the partial-top-k window (rank-then-filter → WindowGroupLimit,
    * the text_keywords plan pin). */
  def textRakeOn(docs: DataFrame, topK: Int = 3): DataFrame = {
    val tok = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("tok"))
      .withColumn("isstop", col("tok").isInCollection(RakeStop))
    val pid = tok.withColumn("pid",
        sum(when(col("isstop"), 1L).otherwise(0L)).over(
          Window.partitionBy("doc_id").orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(!col("isstop"))
    val pw = pid.withColumn("plen",
        count(lit(1)).over(Window.partitionBy("doc_id", "pid")))
      .localCheckpoint(true) // feeds the word-score agg and the join
    val ws = pw.groupBy("tok")
      .agg(expr("CAST(sum(plen) * 1000000 DIV count(1) AS BIGINT)")
        .as("wscore"))
    val ps = pw.join(broadcast(ws), "tok")
      .groupBy("doc_id", "pid")
      .agg(
        array_join(expr("transform(array_sort(collect_list(" +
          "struct(pos, tok))), x -> x.tok)"), " ").as("phrase"),
        sum(col("wscore")).as("score_ppm"))
    ps.withColumn("rk",
        row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("score_ppm").desc, col("phrase").asc))
          .cast("long"))
      .filter(col("rk") <= topK)
      .select("doc_id", "phrase", "score_ppm", "rk")
      .orderBy("doc_id", "rk")
  }

  def textRake(s: SparkSession, dir: String): DataFrame =
    textRakeOn(Tables.documents(s, dir))

  /** Suffix-stripping stemmer — the Porter step-1 core as a PINNED
    * first-match CASE ladder (sses→ss, ies→i, ss kept, plural -s,
    * -ing, -ed with minimum-stem-length guards), spelled with
    * endswith/substr only so both engines run the identical rules
    * with no regex-engine variance. The catalog row is the stemmed
    * vocabulary: per stem, how many surface forms collapsed into it
    * and the total occurrences — the vocabulary-compression readout
    * a tokenizer-budget analysis starts from. One scan, one
    * vocabulary-keyed aggregate. */
  def stemOf(c: Column): Column = expr(
    s"""CASE
       | WHEN ${c.toString} LIKE '%sses'
       |   THEN substr(${c.toString}, 1, length(${c.toString}) - 2)
       | WHEN ${c.toString} LIKE '%ies'
       |   THEN concat(substr(${c.toString}, 1, length(${c.toString}) - 3), 'i')
       | WHEN ${c.toString} LIKE '%ss' THEN ${c.toString}
       | WHEN ${c.toString} LIKE '%s' AND length(${c.toString}) > 3
       |   THEN substr(${c.toString}, 1, length(${c.toString}) - 1)
       | WHEN ${c.toString} LIKE '%ing' AND length(${c.toString}) > 5
       |   THEN substr(${c.toString}, 1, length(${c.toString}) - 3)
       | WHEN ${c.toString} LIKE '%ed' AND length(${c.toString}) > 4
       |   THEN substr(${c.toString}, 1, length(${c.toString}) - 2)
       | ELSE ${c.toString} END""".stripMargin)

  def textStemOn(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("tok"), stemOf(col("tok")).as("stem"))
      .groupBy("stem")
      .agg(countDistinct(col("tok")).as("n_forms"),
        count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("stem").asc)

  def textStem(s: SparkSession, dir: String): DataFrame =
    textStemOn(Tables.documents(s, dir))

  /** Zipf rank-frequency audit over the corpus vocabulary: rank·count
    * should be roughly constant under Zipf's law, so each of the top
    * 50 tokens reports its exact rank·count product and its ppm ratio
    * to the rank-1 product — the whole audit in integers (the
    * log-log-regression exponent fit is the float sibling this
    * deliberately avoids). The rank window runs on the COLLAPSED
    * vocabulary relation (the house bounded-domain window), and the
    * top-50 cut is rank-then-filter. */
  def textZipfAuditOn(docs: DataFrame, topK: Int = 50): DataFrame = {
    val vocab = docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val ranked = Guards.requireBounded(vocab, 1L << 24,
        "text_zipf_audit vocabulary")
      .withColumn("rank",
        row_number().over(Window.partitionBy(Guards.one)
          .orderBy(col("cnt").desc, col("tok").asc))
          .cast("long"))
      .filter(col("rank") <= topK)
      .withColumn("rc_product", col("rank") * col("cnt"))
    val c1 = ranked.filter(col("rank") === 1)
      .select(col("rc_product").as("c1"))
    ranked.crossJoin(broadcast(c1))
      .select(col("rank"), col("tok"), col("cnt"), col("rc_product"),
        expr("CAST(rc_product * 1000000 DIV c1 AS BIGINT)")
          .as("ratio_ppm"))
      .orderBy("rank")
  }

  def textZipfAudit(s: SparkSession, dir: String): DataFrame =
    textZipfAuditOn(Tables.documents(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_fuzzy" -> joinFuzzy,
    "text_rake" -> textRake,
    "text_stem" -> textStem,
    "text_zipf_audit" -> textZipfAudit,
  )

  private def probesSql: String =
    FuzzyProbes.map(p => s"('$p')").mkString(", ")
  private def stopSql: String =
    RakeStop.map(w => s"('$w')").mkString(", ")

  val oracles: Map[String, String] = Map(
    // The oracle states the SEMANTICS (exact levenshtein over the
    // cross product) — the engine's deletion-variant blocking must
    // reproduce it exactly, which is the recall-completeness claim.
    "join_fuzzy" ->
      s"""WITH probes(probe) AS (VALUES $probesSql),
        |dict AS (SELECT DISTINCT p_type AS term FROM part)
        |SELECT probe, term,
        |  CAST(levenshtein(probe, term) AS BIGINT) AS dist
        |FROM probes JOIN dict ON levenshtein(probe, term) <= 1
        |ORDER BY probe, term""".stripMargin,
    "text_stem" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |s AS (SELECT tok, CASE
        |    WHEN tok LIKE '%sses' THEN substr(tok, 1, length(tok) - 2)
        |    WHEN tok LIKE '%ies'
        |      THEN concat(substr(tok, 1, length(tok) - 3), 'i')
        |    WHEN tok LIKE '%ss' THEN tok
        |    WHEN tok LIKE '%s' AND length(tok) > 3
        |      THEN substr(tok, 1, length(tok) - 1)
        |    WHEN tok LIKE '%ing' AND length(tok) > 5
        |      THEN substr(tok, 1, length(tok) - 3)
        |    WHEN tok LIKE '%ed' AND length(tok) > 4
        |      THEN substr(tok, 1, length(tok) - 2)
        |    ELSE tok END AS stem
        |  FROM t WHERE length(tok) > 0)
        |SELECT stem, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_forms,
        |  CAST(COUNT(*) AS BIGINT) AS n_occ
        |FROM s GROUP BY stem ORDER BY n_occ DESC, stem ASC""".stripMargin,
    "text_zipf_audit" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM t WHERE length(tok) > 0 GROUP BY tok),
        |r AS (SELECT tok, cnt,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC)
        |      AS BIGINT) AS rank
        |  FROM v QUALIFY rank <= 50),
        |rc AS (SELECT rank, tok, cnt, rank * cnt AS rc_product FROM r),
        |c1 AS (SELECT rc_product AS c1 FROM rc WHERE rank = 1)
        |SELECT rank, tok, cnt, rc_product,
        |  CAST(rc_product * 1000000 // c1 AS BIGINT) AS ratio_ppm
        |FROM rc CROSS JOIN c1 ORDER BY rank""".stripMargin,
    "text_rake" ->
      s"""WITH stop(sw) AS (VALUES $stopSql),
        |base AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, t[CAST(i AS INT)] AS tok,
        |    CAST(i AS BIGINT) AS pos
        |  FROM base, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) r),
        |m AS (SELECT doc_id, tok, pos,
        |    (tok IN (SELECT sw FROM stop)) AS isstop FROM tok),
        |ph AS (SELECT doc_id, tok, pos, pid FROM (
        |    SELECT doc_id, tok, pos, isstop,
        |      SUM(CASE WHEN isstop THEN 1 ELSE 0 END) OVER (
        |        PARTITION BY doc_id ORDER BY pos) AS pid
        |    FROM m) WHERE NOT isstop),
        |pw AS (SELECT doc_id, pid, tok, pos,
        |    CAST(COUNT(*) OVER (PARTITION BY doc_id, pid) AS BIGINT)
        |      AS plen
        |  FROM ph),
        |ws AS (SELECT tok,
        |    CAST(SUM(plen) * 1000000 // COUNT(*) AS BIGINT) AS wscore
        |  FROM pw GROUP BY tok),
        |ps AS (SELECT p.doc_id, p.pid,
        |    string_agg(p.tok, ' ' ORDER BY p.pos) AS phrase,
        |    CAST(SUM(ws.wscore) AS BIGINT) AS score_ppm
        |  FROM pw p JOIN ws ON p.tok = ws.tok GROUP BY 1, 2),
        |rk AS (SELECT doc_id, phrase, score_ppm,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score_ppm DESC, phrase ASC) AS rk
        |  FROM ps)
        |SELECT doc_id, phrase, score_ppm, CAST(rk AS BIGINT) AS rk
        |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
  )
}
