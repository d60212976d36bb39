package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints explain("formatted") for the named
  * queries (or a default set of representative shapes). Usage:
  *   runMain graft.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q1_agg", "join_multiway", "flagship_pipeline", "topk_per_key",
      "dedup_minhash", "dedup_simhash64", "sim_ann_lsh",
      "stream_user_sessions", "corpus_clean", "ref_ep3_full")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
