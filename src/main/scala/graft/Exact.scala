package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers for oracle parity.
  *
  * The driver hash-compares our parquet output against DuckDB
  * (BASELINE.md "Correctness gate"). Floating-point sums are
  * order-dependent, and Spark's partial/final aggregation sums in a
  * different order than DuckDB's single pass — so every money/value
  * aggregate goes through exact DECIMAL arithmetic and is converted to
  * DOUBLE only once, at the end (one correctly-rounded conversion is
  * engine-independent). The matching oracle SQL uses the same
  * CAST(... AS DECIMAL(18,2)) formulation.
  */
object Exact {
  /** 2-decimal money/value column as exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a 2-decimal double column, back to double.
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  def sumD(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact average: decimal sum / count in double (one rounded div).
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x). */
  def avgD(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c)

  /** Exact revenue term: price*(1-disc) in decimal. Decimal(18,2) *
    * decimal(18,2) stays exact (scale 4); sum exact; one double cast.
    * Oracle: CAST(SUM(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS
    * DECIMAL(18,2)))) AS DOUBLE). */
  def sumRevenue(price: Column, discount: Column): Column =
    sum(dec2(price) * (lit(1).cast(DecimalType(18, 2)) - dec2(discount)))
      .cast("double")
}
