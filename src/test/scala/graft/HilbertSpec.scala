package graft

import org.apache.spark.sql.functions._

/** layout_hilbert: the defining curve invariants, proved exhaustively
  * over the full 256x256 space the operator indexes. */
class HilbertSpec extends SparkSpecBase {
  import spark.implicits._

  test("hilbert index is a bijection onto 0..65535 and consecutive codes are Manhattan-adjacent") {
    val grid = spark.range(65536)
      .select(expr("id div 256").as("qx"), (col("id") % 256).as("qy"))
    val cells = operators.Layout.hilbertOn(grid)
      .select("hd", "qx", "qy").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(cells.length == 65536)
    assert(cells.head._1 == 0L && cells.last._1 == 65535L)
    assert(cells.map(_._1).distinct.length == 65536) // bijection
    cells.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._1 == a._1 + 1)
        val manhattan = math.abs(b._2 - a._2) + math.abs(b._3 - a._3)
        assert(manhattan == 1L, s"jump at d=${a._1}")
      case _ =>
    }
  }

  test("hilbert files: same manifest schema as zorder, all rows assigned exactly once") {
    val h = operators.Layout.layoutHilbert(spark, sf).cache()
    val z = operators.Layout.layoutZorder(spark, sf)
    assert(h.columns.toSeq == z.columns.toSeq)
    val rowsH = h.agg(sum("n_rows")).as[Long].head()
    val rowsZ = z.agg(sum("n_rows")).as[Long].head()
    assert(rowsH == rowsZ) // every lineitem row lands in one file
    h.unpersist()
  }
}
