package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File sources & sinks — SURVEY.md §2.1.
  *
  * The engine's persistent inputs are parquet (S12); these ops cover
  * the reference's other formats: directory listings with extension
  * filters (S1, preprocess_dataset.py:10-31), schema'd CSV (S2/S3,
  * :99-100), and the JSON key->value dict handoff (S4/S5,
  * preprocessed_to_raw.py:33-34). CSV/JSON fixtures are exported once
  * per scale factor into a deterministic staging dir, then read back
  * through the real csv/json readers — the same round-trip the
  * reference does between its pipeline stages, and exactly what the
  * DuckDB oracle reads.
  */
object Sources {

  /** Staging dir for exported CSV/JSON fixtures of one sf corpus. */
  def stageDir(dir: String): String =
    "/tmp/graft_export/" + dir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Export customer as a single headered CSV + the path->action JSON
    * dict, once (idempotent overwrite; coalesce(1) so DuckDB can read
    * one file). Driver-scale corpora are small; real deployments keep
    * data in parquet and never funnel through one file. */
  def ensureStaged(s: SparkSession, dir: String): String = {
    val base = stageDir(dir)
    val done = new java.io.File(s"$base/_staged")
    if (!done.exists()) {
      Tables.customer(s, dir)
        .orderBy("c_custkey")
        .coalesce(1)
        .write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(s"$base/customer_csv")
      // S5-shaped dict: one JSON object per row (path -> action).
      Tables.documents(s, dir)
        .select(col("doc_id"), concat(lit("docs/"), col("doc_id"), lit(".txt"))
          .as("path"), col("lang").as("action"))
        .orderBy("doc_id")
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).json(s"$base/path_action_json")
      done.getParentFile.mkdirs()
      done.createNewFile()
    }
    base
  }

  /** Stage the two-generation parquet layout for S13: v1 files carry
    * (doc_id, lang), v2 files add n_chars — the add-a-column schema
    * evolution every long-lived lake table goes through. Separate
    * marker from [[ensureStaged]] so corpora staged by earlier
    * sessions pick up the new fixture. */
  def ensureStagedEvolution(s: SparkSession, dir: String): String = {
    val base = stageDir(dir)
    val done = new java.io.File(s"$base/_staged_evo")
    if (!done.exists()) {
      val docs = Tables.documents(s, dir)
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "lang")
        .orderBy("doc_id").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$base/evo_v1")
      docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$base/evo_v2")
      done.getParentFile.mkdirs()
      done.createNewFile()
    }
    base
  }

  /** S13: schema-evolution scan — one read over BOTH parquet
    * generations with `mergeSchema`, the Spark reader's footer-union:
    * v1 rows surface n_chars as NULL, v2 rows carry it, and the
    * merged schema is the union without rewriting a single old file.
    * (At lake scale this is exactly how a 100 TB table absorbs a new
    * column; the alternative — backfill-rewriting every historical
    * file — is the anti-pattern this op exists to avoid.) */
  def scanSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStagedEvolution(s, dir)
    s.read.option("mergeSchema", "true")
      .parquet(s"$base/evo_v1", s"$base/evo_v2")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  val customerCsvSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  /** S2/S3: CSV scan with an explicit schema (schema supplied at read
    * time like preprocess_dataset.py:99-100 — never inferred). */
  def scanCsvSchema(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStaged(s, dir)
    s.read.schema(customerCsvSchema)
      .option("header", "true")
      .csv(s"$base/customer_csv")
      .filter(col("c_acctbal") > 0)
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** S4: JSON source of the path->action dict handoff. */
  def scanJsonMap(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStaged(s, dir)
    s.read.schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("path", StringType),
        StructField("action", StringType))))
      .json(s"$base/path_action_json")
      .orderBy("doc_id")
  }

  /** S1: directory scan + extension filter (os.listdir + suffix check,
    * preprocess_dataset.py:25-26) via the binaryFile source — listing
    * and metadata only; content is never deserialized because the
    * column is pruned. */
  def scanFilterPaths(s: SparkSession, dir: String): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(dir)
      .select(element_at(split(col("path"), "/"), -1).as("file_name"),
        col("length").as("n_bytes"))
      .orderBy("file_name")

  /** S8: binary-content source — the reference's video-byte reads
    * (raw_to_samples.py:173-196,241-258) as a `binaryFile` scan WITH
    * the content column materialized: per-file byte length plus the
    * 4-byte magic header (the container-format probe, :302-307's
    * metadata analog). Unlike scan_filter_paths, the content column is
    * NOT pruned — this is the path real decode UDFs hang off. */
  def scanBinary(s: SparkSession, dir: String): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(dir)
      .select(element_at(split(col("path"), "/"), -1).as("file_name"),
        length(col("content")).cast("long").as("n_bytes"),
        upper(hex(substring(col("content"), 1, 4))).as("magic"))
      .orderBy("file_name")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_csv_schema" -> scanCsvSchema,
    "scan_json_map" -> scanJsonMap,
    "scan_filter_paths" -> scanFilterPaths,
    "scan_binary" -> scanBinary,
    "scan_schema_evolution" -> scanSchemaEvolution,
  )

  // Oracle SQL is a static string but the staged path depends on the
  // sf dir — the driver's t2 correctness gate always runs at sf0.01
  // (TESTDATA.md:17-18), so the oracles are pinned to that corpus.
  // Verify stages the files before the driver's DuckDB pass reads
  // them (same machine, same /tmp).
  private val gateSf = "/root/testdata/sf0.01"
  private val gateBase = stageDir(gateSf)

  val oracles: Map[String, String] = Map(
    "scan_csv_schema" ->
      s"""SELECT c_custkey, c_name, c_acctbal
         |FROM read_csv('$gateBase/customer_csv/*.csv', header = true)
         |WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin,
    "scan_json_map" ->
      s"""SELECT doc_id, path, action
         |FROM read_json('$gateBase/path_action_json/*.json')
         |ORDER BY doc_id""".stripMargin,
    "scan_filter_paths" ->
      s"""SELECT string_split(filename, '/')[-1] AS file_name,
         |  size AS n_bytes
         |FROM read_blob('$gateSf/*.parquet')
         |ORDER BY file_name""".stripMargin,
    "scan_binary" ->
      s"""SELECT string_split(filename, '/')[-1] AS file_name,
         |  CAST(octet_length(content) AS BIGINT) AS n_bytes,
         |  upper(substring(hex(content), 1, 8)) AS magic
         |FROM read_blob('$gateSf/*.parquet')
         |ORDER BY file_name""".stripMargin,
    "scan_schema_evolution" ->
      s"""SELECT doc_id, lang, n_chars
         |FROM read_parquet(
         |  ['$gateBase/evo_v1/*.parquet', '$gateBase/evo_v2/*.parquet'],
         |  union_by_name = true)
         |ORDER BY doc_id""".stripMargin,
  )
}
