package graft

import java.nio.file.Files
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline bookkeeping (SURVEY §2.9): the reference tracks
  * success/error counters in driver lists (raw_to_samples.py:385-396);
  * the engine-side equivalents are observed metrics (no second pass
  * over the data) and lineage checkpoints (bounded plan growth for
  * iterative jobs). */
class BookkeepingSpec extends SparkSpecBase {

  test("observe: success/error counters come from the SAME pass as the result") {
    val obs = Observation("error_channel_stats")
    val out = pipeline.Reference.refErrorChannel(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count(when(col("status") === "error", 1)).as("n_errors"),
        count(when(col("status") === "success", 1)).as("n_success"))
    val n = out.count() // one action: result + metrics together
    val m = obs.get
    assert(m("n_rows") == n)
    assert(m("n_errors").asInstanceOf[Long] +
      m("n_success").asInstanceOf[Long] == n)
    assert(m("n_errors").asInstanceOf[Long] > 0)
  }

  test("checkpoint truncates lineage: downstream plan no longer embeds the scan") {
    spark.sparkContext.setCheckpointDir(
      Files.createTempDirectory("graft_ckpt_lineage").toString)
    val base = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val cp = base.checkpoint()
    // the checkpointed frame's plan is a materialized RDD scan, not
    // the original aggregate-over-parquet lineage — the tool that
    // keeps iterative pipelines (e.g. repeated dedup rounds) from
    // growing an unbounded plan at 100 TB
    val plan = cp.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Aggregate") && !plan.contains("parquet"), plan)
    // and the data is intact
    assert(cp.count() == base.count())
  }
}
