package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (Test/fork := true
  * gives the suite its own JVM; suites share this lazy session). */
object TestSpark {
  lazy val spark: SparkSession = {
    // local[4, 2] = 4 threads, maxFailures 2 — one task retry, the
    // production shape (cluster default is 4; bare local's 1 is the
    // special case). RobustnessSpec's retry-determinism test kills
    // every first attempt and relies on this.
    val s = SparkSession.builder()
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf
}
