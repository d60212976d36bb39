package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The checked bounded-window contract (round-8 verdict ask #6).
  *
  * Several operators deliberately run a GLOBAL window over a relation
  * whose cardinality is bounded by construction — a vocabulary, a
  * calendar span, a bucket count, a top-k post-limit — never by the
  * corpus. Spelled as `Window.orderBy(...)` those windows are correct
  * but (a) drown the logs in WindowExec's "No Partition Defined"
  * warning and (b) leave the bound as a comment nothing enforces.
  *
  * [[Guards.one]] + [[Guards.requireBounded]] make the contract
  * explicit and CHECKED: the window partitions by a constant (same
  * execution — one hash partition — but the deliberateness is now in
  * the plan, not a warning), and the input carries an in-plan
  * cardinality assertion that rides the SAME single-partition
  * exchange (a full-frame count over the constant key plus an
  * assert_true filter — no extra scan, no extra action, no driver
  * round trip). Exceeding the documented bound fails the query with
  * the operator's name instead of silently degrading.
  *
  * Deliberately NOT used by the two documented corpus-sized
  * single-partition fidelity ops (window_row_number,
  * ref_id_continuation): there the warning is informative — those
  * windows really do move the whole input to one partition, which is
  * the documented trade (window_dense_ids_scaled is the scale form).
  */
object Guards {

  /** Constant partition key marking a DELIBERATE single-partition
    * window: identical execution to an empty partition spec, minus
    * the per-batch WindowExec warning. */
  def one: Column = lit(0)

  /** Asserts `df` stays within its documented cardinality bound,
    * inside the dataflow. The count window shares the single
    * partition the consuming window needs anyway; the assert filter
    * keeps every row (assert_true yields NULL on success) and throws
    * past the bound, so the check cannot be optimized away and costs
    * no extra pass. */
  def requireBounded(df: DataFrame, maxRows: Long, what: String)
      : DataFrame = {
    val w = Window.partitionBy(one)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn("__graft_bound_n", count(lit(1)).over(w))
      .where(coalesce(
        assert_true(col("__graft_bound_n") <= maxRows,
          lit(s"$what: bounded-window contract violated " +
            s"(> $maxRows rows reached a deliberate " +
            "single-partition window)")),
        lit(true)))
      .drop("__graft_bound_n")
  }
}
