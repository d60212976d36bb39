package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-side half of scan performance.
  *
  * At 100 TB the scan cost of every query in this catalog is decided
  * before the query runs, by how rows were laid out into files: data
  * skipping (parquet footer min/max, Delta/Iceberg file stats) can
  * only prune a file whose value ranges are NARROW. These operators
  * compute the layout assignment itself (Morton/Z-order interleave —
  * the ORDER BY of a Delta `OPTIMIZE ZORDER BY` rewrite) and measure
  * its effect (files touched by a predicate under each layout), all
  * in exact integer arithmetic so the DuckDB oracle replays the
  * values bit-for-bit.
  *
  * Everything is a plain aggregate over a map-side projection: the
  * layout assignment is per-row arithmetic (no shuffle), the stats
  * are one hash agg keyed by file id (bounded by the file count, not
  * the row count).
  */
object Layout {

  /** Rows per z-run mapped into one target file (64 codes ≈ 64 files
    * over the 12-bit z space of the quantized lineitem dims). */
  val ZFileWidth = 64L

  /** Morton/Z-order interleave of two 8-bit codes: bit i of `x` lands
    * at position 2i, bit i of `y` at 2i+1. Unrolled shift-and-mask —
    * stays inside whole-stage codegen (pure integer ops, no UDF). */
  def zval(x: Column, y: Column): Column =
    (0 until 8).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  // quantized 2-D point per lineitem row: qx = whole-unit quantity
  // (1..50), qy = discount in integer percent (0..10). floor() is
  // spelled explicitly — a bare CAST(double AS BIGINT) truncates in
  // Spark but rounds half-even in DuckDB.
  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      floor(col("l_quantity")).cast("long").as("qx"),
      floor(col("l_discount") * 100 + lit(0.5)).cast("long").as("qy"))

  /** L21a: Z-order layout assignment — every row gets its Morton code
    * over (quantity, discount%) and a target file id (contiguous
    * z-runs of [[ZFileWidth]] codes); output is the per-file stats
    * relation a lakehouse manifest would record (row count, min/max
    * of both dims). The tight per-file min/max ranges ARE the point:
    * they are what lets a scan skip files for predicates on EITHER
    * dimension. */
  def layoutZorder(s: SparkSession, dir: String): DataFrame =
    quantized(s, dir)
      .withColumn("z", zval(col("qx"), col("qy")))
      .select(col("qx"), col("qy"), expr(s"z div $ZFileWidth").as("file_id"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("qx").as("min_q"), max("qx").as("max_q"),
        min("qy").as("min_d"), max("qy").as("max_d"))
      .orderBy("file_id")

  /** L21b: data-skipping effectiveness — the measurement that
    * justifies [[layoutZorder]]: build per-file min/max stats under
    * two layouts (z-order vs single-column clustering by quantity),
    * then count how many files three canonical predicates touch
    * (a quantity range, a discount range, and the 2-D box). A file is
    * touched when its [min,max] interval overlaps the predicate —
    * exactly the footer-stats pruning rule. Single-column layout
    * prunes the quantity query and nothing else; z-order prunes
    * both dimensions. Output is one row per layout. */
  def layoutSkipping(s: SparkSession, dir: String): DataFrame = {
    val pts = quantized(s, dir)
    def stats(assigned: DataFrame, layout: String): DataFrame =
      assigned.groupBy("file_id")
        .agg(min("qx").as("min_q"), max("qx").as("max_q"),
          min("qy").as("min_d"), max("qy").as("max_d"))
        .select(lit(layout).as("layout"), col("min_q"), col("max_q"),
          col("min_d"), col("max_d"))
    val zed = stats(
      pts.withColumn("z", zval(col("qx"), col("qy")))
        .select(col("qx"), col("qy"),
          expr(s"z div $ZFileWidth").as("file_id")),
      "zorder")
    val single = stats(pts.withColumn("file_id", col("qx")), "single")
    val touchedQ = col("min_q") <= 20 && col("max_q") >= 10
    val touchedD = col("min_d") <= 4 && col("max_d") >= 2
    zed.unionByName(single)
      .groupBy("layout")
      .agg(count(lit(1)).as("n_files"),
        count(when(touchedQ, 1)).as("files_q_range"),
        count(when(touchedD, 1)).as("files_d_range"),
        count(when(touchedQ && touchedD, 1)).as("files_box"))
      .orderBy("layout")
  }

  // DuckDB mirror of [[zval]] over columns named qx/qy
  /** Byte budget per compacted output file (small against every sf so
    * multiple packs form per language at every scale). */
  val CompactBudget = 4000L

  /** L21c: small-file compaction planning — the maintenance pass
    * every long-lived table needs: a streaming or per-batch writer
    * leaves many small files, and scan cost (task scheduling, footer
    * reads, open/close overhead) grows with file COUNT, not bytes.
    * The planner runs over the file MANIFEST (one row per file — a
    * relation bounded by file count, millions of rows for a 100 TB
    * table, never the data itself), groups adjacent files of the
    * same partition (here: language) into merge groups by cumulative
    * byte budget — the [[graft.functions.Corpus.textPackSequencesOn]]
    * running-sum next-fit, applied to files instead of sequences —
    * and emits one row per planned output file. The per-partition
    * window shards by partition key; executing the plan is then one
    * `coalesce`-style rewrite per group. The manifest here is derived
    * from the documents table ((lang, source) = one written file,
    * bytes = its content size) since the catalog has no real table
    * service; the planner itself never looks at the data. */
  def layoutCompaction(s: SparkSession, dir: String): DataFrame = {
    val manifest = Tables.documents(s, dir)
      .groupBy("lang", "source")
      .agg(sum(col("n_chars")).as("bytes"), count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("source")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    manifest
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("pack_id", expr(s"(cum - bytes) div $CompactBudget"))
      .groupBy("lang", "pack_id")
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("total_bytes"),
        sum(col("n_docs")).as("n_docs"))
      .orderBy("lang", "pack_id")
  }

  /** L21d: Hilbert-curve layout — [[layoutZorder]]'s sibling with the
    * space-filling curve real lakehouse engines moved to (Delta's
    * `OPTIMIZE ... BY HILBERT`, Iceberg's hilbert ordering): unlike
    * Morton's interleave, consecutive Hilbert codes are ALWAYS
    * Manhattan-adjacent cells (no "z-jumps" across the plane), so
    * contiguous code runs map to tighter min/max boxes — directly
    * smaller files-touched counts under box predicates. Same output
    * schema as layout_zorder: one manifest row per target file with
    * the stats a scan would prune on.
    *
    * The index is the standard iterative xy2d walk (8 bit-levels over
    * the 256×256 space, quadrant bit + rotate/reflect), fully
    * UNROLLED into per-level integer column updates — stays inside
    * whole-stage codegen, no UDF, and the DuckDB oracle replays the
    * identical 8 rounds as CTEs. HilbertSpec proves the defining
    * adjacency invariant over the complete 256×256 grid (every
    * consecutive code pair is Manhattan distance 1 — the property
    * Morton lacks and the reason the min/max boxes tighten). */
  def hilbertOn(pts: DataFrame): DataFrame = {
    var out = pts
      .withColumn("hx", col("qx")).withColumn("hy", col("qy"))
      .withColumn("hd", lit(0L))
    for (k <- 7 to 0 by -1) {
      val s = 1L << k
      out = out
        .withColumn("rx",
          when(col("hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("ry",
          when(col("hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("hd", col("hd") +
          lit(s * s) * (lit(3L) * col("rx")).bitwiseXOR(col("ry")))
        .withColumn("nx",
          when(col("ry") === 0,
            when(col("rx") === 1, lit(s - 1) - col("hy"))
              .otherwise(col("hy"))).otherwise(col("hx")))
        .withColumn("ny",
          when(col("ry") === 0,
            when(col("rx") === 1, lit(s - 1) - col("hx"))
              .otherwise(col("hx"))).otherwise(col("hy")))
        .withColumn("hx", col("nx")).withColumn("hy", col("ny"))
    }
    out.select(col("qx"), col("qy"), col("hd"))
  }

  def layoutHilbert(s: SparkSession, dir: String): DataFrame =
    hilbertOn(quantized(s, dir))
      .select(col("qx"), col("qy"), expr(s"hd div $ZFileWidth").as("file_id"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("qx").as("min_q"), max("qx").as("max_q"),
        min("qy").as("min_d"), max("qy").as("max_d"))
      .orderBy("file_id")

  private val zSql: String = (0 until 8).map { i =>
    s"((qx >> $i) & 1) * ${1L << (2 * i)} + ((qy >> $i) & 1) * ${1L << (2 * i + 1)}"
  }.mkString(" + ")

  private val qSql: String =
    """SELECT CAST(floor(l_quantity) AS BIGINT) AS qx,
      |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS qy
      |  FROM lineitem""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> layoutZorder,
    "layout_hilbert" -> layoutHilbert,
    "layout_skipping" -> layoutSkipping,
    "layout_compaction" -> layoutCompaction,
  )

  // DuckDB mirror of one [[hilbertOn]] bit-level: quadrant bits from
  // the CURRENT hx/hy, code increment, rotate/reflect for the next
  private def hilbertRoundSql(k: Int, prev: String): String = {
    val s = 1L << k
    s"""r$k AS (SELECT qx, qy, hd, hx, hy,
       |    CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
       |    CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
       |  FROM $prev),
       |h$k AS (SELECT qx, qy,
       |    hd + ${s * s} * xor(3 * rx, ry) AS hd,
       |    CASE WHEN ry = 0 THEN
       |      (CASE WHEN rx = 1 THEN ${s - 1} - hy ELSE hy END)
       |      ELSE hx END AS hx,
       |    CASE WHEN ry = 0 THEN
       |      (CASE WHEN rx = 1 THEN ${s - 1} - hx ELSE hx END)
       |      ELSE hy END AS hy
       |  FROM r$k)""".stripMargin
  }

  private val hilbertChainSql: String = {
    val base = "h8 AS (SELECT qx, qy, qx AS hx, qy AS hy,\n" +
      "    CAST(0 AS BIGINT) AS hd FROM q)"
    val rounds = (7 to 0 by -1)
      .map(k => hilbertRoundSql(k, s"h${k + 1}")).mkString(",\n")
    s"$base,\n$rounds"
  }

  val oracles: Map[String, String] = Map(
    "layout_compaction" ->
      s"""WITH m AS (SELECT lang, source,
         |    CAST(SUM(n_chars) AS BIGINT) AS bytes,
         |    COUNT(*) AS n_docs
         |  FROM documents GROUP BY lang, source),
         |c AS (SELECT lang, source, bytes, n_docs,
         |    CAST(SUM(bytes) OVER (PARTITION BY lang ORDER BY source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM m)
         |SELECT lang,
         |  CAST((cum - bytes) // $CompactBudget AS BIGINT) AS pack_id,
         |  COUNT(*) AS n_files, CAST(SUM(bytes) AS BIGINT) AS total_bytes,
         |  CAST(SUM(n_docs) AS BIGINT) AS n_docs
         |FROM c GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin,
    "layout_hilbert" ->
      s"""WITH q AS ($qSql),
         |$hilbertChainSql,
         |z AS (SELECT qx, qy, hd // $ZFileWidth AS file_id FROM h0)
         |SELECT CAST(file_id AS BIGINT) AS file_id, COUNT(*) AS n_rows,
         |  MIN(qx) AS min_q, MAX(qx) AS max_q,
         |  MIN(qy) AS min_d, MAX(qy) AS max_d
         |FROM z GROUP BY file_id ORDER BY file_id""".stripMargin,
    "layout_zorder" ->
      s"""WITH q AS ($qSql),
         |z AS (SELECT qx, qy,
         |    CAST(($zSql) // $ZFileWidth AS BIGINT) AS file_id
         |  FROM q)
         |SELECT file_id, COUNT(*) AS n_rows,
         |  MIN(qx) AS min_q, MAX(qx) AS max_q,
         |  MIN(qy) AS min_d, MAX(qy) AS max_d
         |FROM z GROUP BY file_id ORDER BY file_id""".stripMargin,
    "layout_skipping" ->
      s"""WITH q AS ($qSql),
         |zs AS (SELECT 'zorder' AS layout,
         |    MIN(qx) AS min_q, MAX(qx) AS max_q,
         |    MIN(qy) AS min_d, MAX(qy) AS max_d
         |  FROM (SELECT qx, qy,
         |      CAST(($zSql) // $ZFileWidth AS BIGINT) AS file_id FROM q)
         |  GROUP BY file_id),
         |ss AS (SELECT 'single' AS layout,
         |    MIN(qx) AS min_q, MAX(qx) AS max_q,
         |    MIN(qy) AS min_d, MAX(qy) AS max_d
         |  FROM q GROUP BY qx),
         |u AS (SELECT * FROM zs UNION ALL SELECT * FROM ss)
         |SELECT layout, COUNT(*) AS n_files,
         |  COUNT(CASE WHEN min_q <= 20 AND max_q >= 10 THEN 1 END)
         |    AS files_q_range,
         |  COUNT(CASE WHEN min_d <= 4 AND max_d >= 2 THEN 1 END)
         |    AS files_d_range,
         |  COUNT(CASE WHEN min_q <= 20 AND max_q >= 10
         |    AND min_d <= 4 AND max_d >= 2 THEN 1 END) AS files_box
         |FROM u GROUP BY layout ORDER BY layout""".stripMargin,
  )
}
