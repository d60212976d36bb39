package graft
object ListQ {
  def main(args: Array[String]): Unit = {
    val qs = SparkEntry.queries.keys.toSeq.sorted
    println("NQUERIES " + qs.size)
    println("NORACLES " + SparkEntry.oracleSql.size)
    println(qs.map(q => s"`$q`").mkString(" "))
    val noOracle = qs.filterNot(SparkEntry.oracleSql.contains)
    println("NO_ORACLE " + noOracle.mkString(" "))
  }
}
