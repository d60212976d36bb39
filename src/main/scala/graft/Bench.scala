package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the given
  * scale factor and prints one JSON line.
  *
  * Two timings per query:
  *   - count: `df.count()` — the cross-round-comparable metric (r1/r2
  *     benched this). Under column pruning a pure projection times as
  *     a scan, which flatters map-only queries.
  *   - noop:  `df.write.format("noop")` — full materialization of
  *     every output column through the whole plan (sorts included),
  *     the honest end-to-end cost.
  * Reps run as round-robin PASSES over the whole catalog (pass 1 all
  * queries, then pass 2, ...), min per query: back-to-back reps of one
  * query land in the same host CPU-steal window, so their min carries
  * the same noise — minutes-apart passes decorrelate it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // bench contract is local[32]; SPARK_GRAFT_CPUS still overrides
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen and the parquet footers once so the first
    // timed query doesn't absorb session startup (~5s of JIT).
    // events goes through its loader (ts-encoding adaptation).
    // Per-table try/catch: one broken loader must cost only its own
    // queries (they fail in `timed` and count toward n_failed), never
    // the whole bench JVM — r5's bench died here on a corpus reshape.
    Tables.names.foreach { n =>
      try {
        (if (n == "events") Tables.events(spark, sfDir)
         else Tables.load(spark, sfDir, n)).count()
      } catch {
        case e: Exception =>
          System.err.println(s"warmup: table $n failed: ${e.getMessage}")
      }
    }
    // Per-query warmup at the smallest scale factor: a first execution
    // pays Janino compilation + JIT of that query's generated code
    // (measured 2-6x its steady-state time), which says nothing about
    // data throughput at the benched scale. Warming each plan shape on
    // the sf0.001 corpus first leaves the timed run measuring the
    // engine, not the compiler. Opt out: SPARK_GRAFT_WARM_DIR=none.
    val warmDir = sys.env.get("SPARK_GRAFT_WARM_DIR").orElse {
      val guess = sfDir.replaceAll("sf[0-9.]+/*$", "sf0.001")
      if (guess != sfDir && new java.io.File(guess).isDirectory) Some(guess)
      else None
    }.filter(_ != "none")
    // optional args restrict the run to named queries (local
    // re-timing); the driver's no-arg invocation is unchanged
    val only = args.toSet
    val catalog = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.isEmpty || only(n) }
      .sortBy(_._1)
    warmDir.foreach { wd =>
      catalog.foreach { case (name, fn) =>
        try fn(spark, wd).count() catch {
          case e: Throwable =>
            System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
        }
      }
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // timed(name)(action): elapsed seconds, or None if the action threw
    // (a broken query must read as a FAILURE, not an implausibly fast
    // error-path timing — the throwable goes to stderr)
    def timed(name: String, what: String)(action: => Unit): Option[Double] = {
      val t0 = System.nanoTime()
      try { action; Some((System.nanoTime() - t0) / 1e9) }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name ($what) FAILED: $e")
          None
      }
    }
    val counts = collection.mutable.Map[String, Double]()
    val noops = collection.mutable.Map[String, Double]()
    // ALL count passes complete before any noop pass: interleaving the
    // two metrics polluted the count timings (~+40% on unchanged
    // queries — the noop materializations churn page cache and heap
    // between a query's count reps)
    for (_ <- 1 to reps; (name, fn) <- catalog) {
      timed(name, "count")(fn(spark, sfDir).count()).foreach { t =>
        counts(name) = math.min(counts.getOrElse(name, t), t)
      }
    }
    for (_ <- 1 to reps; (name, fn) <- catalog) {
      timed(name, "noop")(
        fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        .foreach { t => noops(name) = math.min(noops.getOrElse(name, t), t) }
    }
    // a query is FAILED on a metric only if every rep of that metric
    // threw (its sentinel stays -1 in the map); a transient single-rep
    // failure keeps the surviving rep's timing and is visible only on
    // stderr. failed lists "name:metric" so a consumer can locate it.
    val failed = catalog.flatMap { case (name, _) =>
      (if (counts.contains(name)) Nil else Seq(s"$name:count")) ++
        (if (noops.contains(name)) Nil else Seq(s"$name:noop"))
    }
    val results = catalog.map { case (name, _) =>
      name -> (counts.getOrElse(name, -1.0), noops.getOrElse(name, -1.0))
    }
    def totalOf(sel: ((String, (Double, Double))) => Double): Double =
      results.map(sel).filter(_ >= 0).sum
    val total = totalOf(_._2._1)
    val totalNoop = totalOf(_._2._2)
    def fmt(v: Double): String = f"$v%.3f"
    // Full per-query timings go to a repo file; stdout gets ONE compact
    // JSON line. The driver captures only the final ~2000 chars of
    // output, so a 100-entry map (~2.3 KB) gets truncated mid-line and
    // fails to parse (round-1 BENCH had parsed:null). Keep the printed
    // line under ~1500 chars: slowest queries first, rest summarized.
    val failedJson = failed.map(f => s""""$f"""").mkString("[", ",", "]")
    val fullJson = results.map { case (k, (c, n)) => s""""$k":{"count":$c,"noop":$n}""" }
      .mkString(
        s"""{"metric":"total","value":$total,"unit":"sec","total_noop":$totalNoop,""" +
          s""""n_failed":${failed.size},"failed":$failedJson,"queries":{""",
        ",", s"""},"sf":"$sfDir"}""")
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      new java.io.File("BENCH_FULL.json").getAbsolutePath)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
        (fullJson + "\n").getBytes("UTF-8"))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write $fullPath: ${e.getMessage}")
    }
    val budget = 1400
    val header = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","total_noop":${fmt(totalNoop)},"n_queries":${results.size},"n_failed":${failed.size},"full":"BENCH_FULL.json","sf":"$sfDir","queries":{"""
    val sb = new StringBuilder(header)
    var first = true
    results.sortBy { case (_, (c, _)) => -c }.foreach { case (k, (c, _)) =>
      val entry = (if (first) "" else ",") + s""""$k":${fmt(c)}"""
      if (sb.length + entry.length < budget) { sb.append(entry); first = false }
    }
    sb.append("}}")
    println(sb.toString)
    spark.stop()
  }
}
