package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness (Bench's loop for a subset, with a
  * per-query repeat to separate plan/codegen cost from data cost).
  * Usage: runMain graft.Time <sfDir> <query...>  [env REPS=n]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val reps = sys.env.getOrElse("REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach { n =>
      (if (n == "events") Tables.events(spark, sfDir)
       else Tables.load(spark, sfDir, n)).count()
    }
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $n%-24s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
