package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GuardsSpec extends SparkSpecBase {
  import spark.implicits._

  test("requireBounded is the identity under the bound and keeps the " +
    "consuming window's results byte-identical") {
    val df = (1L to 40L).toDF("v")
    val guarded = Guards.requireBounded(df, 64, "spec")
    assert(guarded.columns.toSeq == Seq("v"))
    val w = Window.partitionBy(Guards.one).orderBy("v")
    val a = guarded.withColumn("rn", row_number().over(w))
      .as[(Long, Int)].collect().toSeq.sortBy(_._1)
    val b = df.withColumn("rn", row_number().over(Window.orderBy("v")))
      .as[(Long, Int)].collect().toSeq.sortBy(_._1)
    assert(a == b)
  }

  test("requireBounded throws past the bound, naming the operator") {
    val df = (1L to 100L).toDF("v")
    val e = intercept[Exception] {
      Guards.requireBounded(df, 64, "spec_op").count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("spec_op")), e.getMessage)
  }

  test("the guard cannot be pruned away: a downstream projection of " +
    "one column still trips it") {
    val df = (1L to 100L).toDF("v").withColumn("u", col("v") * 2)
    val e = intercept[Exception] {
      Guards.requireBounded(df, 10, "pruned_op").select("u").count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("pruned_op")), e.getMessage)
  }
}
