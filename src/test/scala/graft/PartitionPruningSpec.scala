package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Partitioned layout + partition pruning: at 100 TB, a filter on the
  * partition column must prune directories at planning time, not read
  * and discard (the storage analog of predicate pushdown). */
class PartitionPruningSpec extends SparkSpecBase {

  test("filter on the partition column becomes a PartitionFilter (no data read from other partitions)") {
    val d = Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf)
      .write.mode(SaveMode.Overwrite).partitionBy("event_type").parquet(d)
    val q = spark.read.parquet(d)
      .filter(col("event_type") === "purchase")
      .select("event_id", "value")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // and the result matches the unpartitioned read
    val expect = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(q.count() == expect && expect > 0)
  }
}
