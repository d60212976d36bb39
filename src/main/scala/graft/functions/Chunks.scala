package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking and boundary-overlap dedup — the
  * storage-side dedup family (rsync/LBFS/FastCDC lineage) re-expressed
  * at token granularity for text corpora, plus Weight-of-Evidence
  * style risk binning. All exact-integer per the house rules; chunk
  * identity is the exact chunk TEXT (the polynomial fingerprint rides
  * along as the compact reference, never as the grouping key, so a
  * 30-bit hash collision cannot merge distinct chunks).
  */
object Chunks {

  /** Token-level content-defined chunking (the FastCDC idea at token
    * granularity): a token ends a chunk when its content hash lands
    * in the boundary class (polyHash(tok) % 8 == 0) — boundaries
    * depend only on CONTENT, so an insertion early in a document
    * shifts chunk positions but not chunk identities, which is what
    * makes CDC dedup robust where fixed-width blocking is not.
    * Chunk id = running boundary count EXCLUSIVE of the current
    * token (cut after the boundary token), a per-doc window. The
    * catalog row reports every chunk text occurring in ≥2 documents
    * with occurrence/document counts — the cross-corpus duplicated-
    * span inventory. Scale: one scan; the windows partition by
    * doc_id; the chunk aggregate shuffles on chunk text (content-
    * distributed key). */
  def dedupCdcChunksOn(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("tok"))
      .withColumn("b",
        when(Text.polyHash(col("tok")) % 8 === 0, 1L).otherwise(0L))
    val chunks = tok
      .withColumn("cs", sum(col("b")).over(
        Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("chunk_id", col("cs") - col("b"))
      .groupBy("doc_id", "chunk_id")
      .agg(
        array_join(expr("transform(array_sort(collect_list(" +
          "struct(pos, tok))), x -> x.tok)"), " ").as("chunk_text"),
        count(lit(1)).as("tok_len"))
    chunks.groupBy("chunk_text")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper_doc"),
        max(col("tok_len")).as("tok_len"))
      .filter(col("n_docs") >= 2)
      .select(Text.polyHash(col("chunk_text")).as("fingerprint"),
        col("n_occ"), col("n_docs"), col("keeper_doc"), col("tok_len"))
      .orderBy(col("n_occ").desc, col("fingerprint").asc,
        col("keeper_doc").asc)
  }

  def dedupCdcChunks(s: SparkSession, dir: String): DataFrame =
    dedupCdcChunksOn(Tables.documents(s, dir))

  /** Cross-document boundary overlap: pairs where one document's
    * LAST k tokens equal another's FIRST k tokens — the signature of
    * concatenation/split artifacts in a scraped corpus (a page split
    * mid-paragraph shows up as suffix-of-A == prefix-of-B). The
    * k-token boundary strings are the equi-join keys (space-joined
    * token slices — unambiguous because tokens contain no spaces),
    * so the detector is a plain hash join, not a similarity scan.
    * k = 8. */
  def dedupBoundaryOverlapOn(docs: DataFrame, k: Int = 8): DataFrame = {
    val t = split(col("text"), " ")
    val d = docs
      .select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"),
        array_join(slice(col("t"), 1, k), " ").as("pref"),
        array_join(slice(col("t"), -k, k), " ").as("suff"))
      .localCheckpoint(true) // both sides of the boundary join
    d.select(col("doc_id").as("doc_a"), col("suff").as("boundary"))
      .join(d.select(col("doc_id").as("doc_b"), col("pref").as("boundary")),
        "boundary")
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b", "boundary")
      .orderBy("doc_a", "doc_b")
  }

  /** Catalog instance runs k = 3: the synthetic corpus has no real
    * concatenation artifacts (random word soup — an 8-token boundary
    * collision has probability ~30⁻⁸), so the catalog pins the
    * operator on the chance 3-token collisions instead; production
    * calls use the k = 8 default where a hit is real signal. */
  def dedupBoundaryOverlap(s: SparkSession, dir: String): DataFrame =
    dedupBoundaryOverlapOn(Tables.documents(s, dir), k = 3)

  /** Weight-of-Evidence style risk binning of order value against
    * the order-failed label (o_orderstatus = 'F'): 10 equal-width
    * bins over the broadcast (min, max) — fixed-width rather than
    * deciles because global-quantile binning needs a total-order
    * window while width binning is one map pass off a 1-row
    * aggregate (the scale-safe spelling; sketch_quantile is the
    * decile path when needed). Per bin: counts, exact bad-rate ppm,
    * and the odds ratio vs the global odds in ppm — the monotone
    * core of WoE without the ln whose libm rounding differs across
    * engines (ORACLES.md float rule; rank by or_ppm and you rank by
    * WoE). Zero-denominator bins yield NULL. */
  def featureWoeBinsOn(orders: DataFrame): DataFrame = {
    val base = orders.select(
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"),
        (col("o_orderstatus") === "F").cast("long").as("bad"))
      .localCheckpoint(true) // bounds + binning read it
    val bounds = base.agg(min(col("cents")).as("minc"),
      max(col("cents")).as("maxc"), sum(col("bad")).as("tb"),
      (count(lit(1)) - sum(col("bad"))).as("tg"))
    base.crossJoin(broadcast(bounds))
      .select(
        least(expr("(cents - minc) * 10 DIV (maxc - minc + 1)"), lit(9L))
          .as("bin"),
        col("bad"), col("tb"), col("tg"))
      .groupBy("bin", "tb", "tg")
      .agg(count(lit(1)).as("n"), sum(col("bad")).as("n_bad"),
        (count(lit(1)) - sum(col("bad"))).as("n_good"))
      .select(col("bin"), col("n"), col("n_bad"), col("n_good"),
        expr("CAST(n_bad * 1000000 DIV n AS BIGINT)").as("bad_rate_ppm"),
        expr("""CASE WHEN n_good > 0 AND tb > 0 THEN
               |  CAST(CAST(n_bad AS DECIMAL(38,0)) * tg * 1000000
               |    DIV (CAST(n_good AS DECIMAL(38,0)) * tb) AS BIGINT)
               |END""".stripMargin).as("odds_ratio_ppm"))
      .orderBy("bin")
  }

  def featureWoeBins(s: SparkSession, dir: String): DataFrame =
    featureWoeBinsOn(Tables.orders(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_cdc_chunks" -> dedupCdcChunks,
    "dedup_boundary_overlap" -> dedupBoundaryOverlap,
    "feature_woe_bins" -> featureWoeBins,
  )

  private val polyHashSql =
    """list_reduce(list_concat([CAST(0 AS BIGINT)],
      |      list_transform(string_split(%s, ''),
      |        c -> CAST(unicode(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) %% 1000000007)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_cdc_chunks" ->
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, t[CAST(i AS INT)] AS tok,
        |    CAST(i AS BIGINT) AS pos
        |  FROM base, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) r),
        |tb AS (SELECT doc_id, tok, pos,
        |    CASE WHEN ${polyHashSql.format("tok")} % 8 = 0
        |      THEN 1 ELSE 0 END AS b
        |  FROM tok),
        |ck AS (SELECT doc_id, tok, pos,
        |    SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) - b AS chunk_id
        |  FROM tb),
        |ch AS (SELECT doc_id, chunk_id,
        |    string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
        |    CAST(COUNT(*) AS BIGINT) AS tok_len
        |  FROM ck GROUP BY 1, 2),
        |ag AS (SELECT chunk_text, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |    MIN(doc_id) AS keeper_doc, MAX(tok_len) AS tok_len
        |  FROM ch GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2)
        |SELECT CAST(${polyHashSql.format("chunk_text")} AS BIGINT)
        |    AS fingerprint,
        |  n_occ, n_docs, keeper_doc, tok_len
        |FROM ag
        |ORDER BY n_occ DESC, fingerprint ASC, keeper_doc ASC""".stripMargin,
    "dedup_boundary_overlap" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    array_to_string(t[1:3], ' ') AS pref,
        |    array_to_string(t[len(t)-2:len(t)], ' ') AS suff
        |  FROM d WHERE len(t) >= 3)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  a.suff AS boundary
        |FROM f a JOIN f b ON a.suff = b.pref
        |WHERE a.doc_id <> b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,
    "feature_woe_bins" ->
      """WITH base AS (SELECT
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
        |      AS BIGINT) AS bad
        |  FROM orders),
        |b AS (SELECT MIN(cents) AS minc, MAX(cents) AS maxc,
        |    CAST(SUM(bad) AS BIGINT) AS tb,
        |    CAST(COUNT(*) - SUM(bad) AS BIGINT) AS tg
        |  FROM base),
        |binned AS (SELECT
        |    least((cents - minc) * 10 // (maxc - minc + 1), 9) AS bin,
        |    bad, tb, tg
        |  FROM base CROSS JOIN b),
        |g AS (SELECT bin, tb, tg, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(bad) AS BIGINT) AS n_bad,
        |    CAST(COUNT(*) - SUM(bad) AS BIGINT) AS n_good
        |  FROM binned GROUP BY 1, 2, 3)
        |SELECT CAST(bin AS BIGINT) AS bin, n, n_bad, n_good,
        |  CAST(n_bad * 1000000 // n AS BIGINT) AS bad_rate_ppm,
        |  CASE WHEN n_good > 0 AND tb > 0 THEN
        |    CAST(CAST(n_bad AS HUGEINT) * tg * 1000000
        |      // (CAST(n_good AS HUGEINT) * tb) AS BIGINT)
        |  END AS odds_ratio_ppm
        |FROM g ORDER BY bin""".stripMargin,
  )
}
