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
    // The deliberately-single-partition windows carry an IN-PLAN
    // cardinality assertion (graft.Guards.requireBounded) — the
    // advisory WindowExec "No Partition Defined" warning adds nothing
    // for them and used to drown this main's log tail (hundreds of
    // lines). Catalyst's EliminateWindowPartitions strips the constant
    // partition key that would otherwise mark the intent in the plan,
    // so the logger is the remaining lever; the checked bound, not the
    // log line, is the contract now.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
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

    // a query is FAILED on a metric only if every rep of that metric
    // threw (no entry in the map); a transient single-rep failure
    // keeps the surviving rep's timing and is visible only on stderr.
    // failed lists "name:metric" so a consumer can locate it.
    def failedNow: Seq[String] = catalog.flatMap { case (name, _) =>
      (if (counts.contains(name)) Nil else Seq(s"$name:count")) ++
        (if (noops.contains(name)) Nil else Seq(s"$name:noop"))
    }
    def fmt(v: Double): String = f"$v%.3f"
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      new java.io.File("BENCH_FULL.json").getAbsolutePath)

    // Emit the CURRENT state: rewrite the full per-query file and print
    // one SHORT self-contained summary line. Called after every
    // completed pass, not just at the end — the catalog is large enough
    // (~271 queries x 2 metrics x 2 reps ~ half an hour) that an
    // external timeout killing the JVM mid-run must still leave (a) a
    // parseable BENCH_FULL.json on disk and (b) a complete summary line
    // in the tail of stdout. Each line carries full totals, so whichever
    // line survives last is valid on its own. The line stays under ~700
    // chars (top-8 slowest only): the driver keeps the final ~2000
    // chars of output, and r1-r5's ~1500-char line + sbt footer
    // overflowed that window every single round (parsed:null) — the
    // full map lives in BENCH_FULL.json, not stdout.
    def emit(pass: Int): Unit = {
      val results = catalog.map { case (name, _) =>
        name -> (counts.getOrElse(name, -1.0), noops.getOrElse(name, -1.0))
      }
      def totalOf(sel: ((String, (Double, Double))) => Double): Double =
        results.map(sel).filter(_ >= 0).sum
      val total = totalOf(_._2._1)
      val totalNoop = totalOf(_._2._2)
      val failed = failedNow
      val failedJson = failed.map(f => s""""$f"""").mkString("[", ",", "]")
      val fullJson = results
        .map { case (k, (c, n)) => s""""$k":{"count":$c,"noop":$n}""" }
        .mkString(
          s"""{"metric":"total","value":$total,"unit":"sec","total_noop":$totalNoop,""" +
            s""""n_failed":${failed.size},"failed":$failedJson,"pass":$pass,"queries":{""",
          ",", s"""},"sf":"$sfDir"}""")
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
          (fullJson + "\n").getBytes("UTF-8"))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] could not write $fullPath: ${e.getMessage}")
      }
      val top = results.sortBy { case (_, (c, _)) => -c }.take(8)
        .map { case (k, (c, _)) => s""""$k":${fmt(c)}""" }.mkString(",")
      println(
        s"""{"metric":"total","value":${fmt(total)},"unit":"sec","total_noop":${fmt(totalNoop)},""" +
          s""""n_queries":${results.size},"n_failed":${failed.size},"pass":$pass,""" +
          s""""full":"BENCH_FULL.json","sf":"$sfDir","queries":{$top}}""")
    }

    // Pass order: a full count pass, then a full noop pass, then emit —
    // repeat. Within a pass one metric never interleaves with the other
    // (noop materializations churn page cache/heap and polluted count
    // timings ~+40% when adjacent); the min for each metric still gets
    // a clean first pass right after warmup, so cross-pass pollution
    // can only make the min PESSIMISTIC, never flattering.
    for (rep <- 1 to reps) {
      for ((name, fn) <- catalog) {
        timed(name, "count")(fn(spark, sfDir).count()).foreach { t =>
          counts(name) = math.min(counts.getOrElse(name, t), t)
        }
      }
      for ((name, fn) <- catalog) {
        timed(name, "noop")(
          fn(spark, sfDir).write.format("noop").mode("overwrite").save())
          .foreach { t => noops(name) = math.min(noops.getOrElse(name, t), t) }
      }
      emit(rep)
    }
    spark.stop()
  }
}
