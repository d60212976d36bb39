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

  /** events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 refuses
    * to read natively (PARQUET_TYPE_ILLEGAL). Read it as long nanos via
    * the legacy conf (an SQLConf — safe to set at runtime in whatever
    * session the driver built) and floor-divide to a microsecond
    * timestamp. `div` is integral division: ns values (~1.7e18) would
    * lose precision through a double `/`. Truncation is floor for
    * positive epochs, matching how every query buckets ts downward. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")
}
