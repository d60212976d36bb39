package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet corpus (TESTDATA.md).
  *
  * Columnar parquet scans — Catalyst pushes predicates and prunes
  * columns into these reads, so every query should start here rather
  * than caching or collecting (SURVEY.md §1 "Orientation & schema
  * system"). Schemas are fixed by the driver (FIXTURES.md §A); we read
  * them as-written rather than coercing, and assert them in tests.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = load(s, dir, "lineitem")

  /** Schema-adaptive events loader. The driver has shipped `events.ts`
    * in two parquet encodings across corpus regenerations:
    *
    *   - INT64 TIMESTAMP(NANOS), which Spark 4 refuses to read natively
    *     (PARQUET_TYPE_ILLEGAL). We read it as long nanos via the legacy
    *     SQLConf and floor-divide to a microsecond timestamp. `div` is
    *     integral division: ns values (~1.7e18) would lose precision
    *     through a double `/`; truncation is floor for positive epochs,
    *     matching how every query buckets ts downward.
    *   - plain timestamp[us] (isAdjustedToUTC=false), which Spark reads
    *     as TIMESTAMP_NTZ. Queries and the DuckDB oracle both treat ts
    *     as wall-clock; the session tz is pinned to UTC everywhere
    *     (Verify/Bench/specs), so casting NTZ → TIMESTAMP is value-
    *     preserving and gives every downstream query the one ts type
    *     they were written against.
    *
    * Dispatch on the type Spark actually inferred, so either corpus
    * shape loads — and a third shape fails loudly here, in one place,
    * instead of as 60 scattered analysis errors. */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet type $other; " +
        "expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")
}
