package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.10): the SAME transform
  * functions run under readStream — batch result == streaming result
  * (file source, memory sink, complete mode). */
class StreamingSpec extends SparkSpecBase {

  private lazy val streamDir: String = {
    // readStream.parquet wants a directory of same-schema files; give
    // events.parquet its own dir.
    val d = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  /** events under readStream, with the same ts-encoding adaptation the
    * batch loader applies (Tables.events): readStream needs an explicit
    * schema, so probe the file's batch schema once and mirror whichever
    * encoding (INT64 nanos vs timestamp[us]) this corpus shipped. */
  private def eventsStream = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(streamDir).schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val raw = spark.readStream.schema(schema).parquet(streamDir)
    tsType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  private def runToSet(streamingDf: org.apache.spark.sql.DataFrame,
      name: String): Set[String] = {
    val q = streamingDf.writeStream
      .outputMode("complete").format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      spark.table(name).collect().map(_.toString).toSet
    } finally q.stop()
  }

  test("T1 tumbling windows: streaming (complete mode) == batch") {
    val streamed = runToSet(
      streaming.Streaming.tumbling(
        eventsStream.withWatermark("ts", "10 minutes")), "t1_out")
    val batch = streaming.Streaming.tumbling(Tables.events(spark, sf))
      .collect().map(_.toString).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("T2 sliding windows: streaming (complete mode) == batch") {
    val streamed = runToSet(
      streaming.Streaming.sliding(
        eventsStream.withWatermark("ts", "10 minutes")), "t2_out")
    val batch = streaming.Streaming.sliding(Tables.events(spark, sf))
      .collect().map(_.toString).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("T3 session windows: streaming (complete mode) == batch") {
    val streamed = runToSet(
      streaming.Streaming.session(
        eventsStream.withWatermark("ts", "10 minutes")), "t3_out")
    val batch = streaming.Streaming.session(Tables.events(spark, sf))
      .collect().map(_.toString).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("T9 stream-static enrichment join: streaming (complete) == batch; " +
    "unmatched users land in the (none) bucket") {
    val dim = Tables.customer(spark, sf)
    val streamed = runToSet(
      streaming.Streaming.staticEnrich(eventsStream, dim), "t9_out")
    val batch = streaming.Streaming.staticEnrich(
        Tables.events(spark, sf), dim)
      .collect().map(_.toString).toSet
    assert(streamed == batch && batch.nonEmpty)
    // the LEFT semantics: a fact row with no dim match must survive
    import spark.implicits._
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        999999L, "view", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val none = streaming.Streaming.staticEnrich(ev, dim).collect()
    assert(none.length === 1 && none(0).getString(0) === "(none)")
    assert(none(0).getLong(1) === 1L && none(0).getDouble(2) === 2.0)
  }

  test("custom state: flatMapGroupsWithState running per-user counts == batch groupBy") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ds = eventsStream.select(col("user_id"), col("event_id"))
      .as[(Long, Long)]
    val counted = ds.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          Iterator((uid, n))
      }.toDF("user_id", "n")
    val q = counted.writeStream.outputMode("append")
      .format("memory").queryName("state_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("state_out")
        .groupBy("user_id").agg(max("n").as("n")) // last emitted state
        .as[(Long, Long)].collect().toMap
      val batch = Tables.events(spark, sf).groupBy("user_id")
        .count().as[(Long, Long)].collect().toMap
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("T7 streaming dedup: dropDuplicatesWithinWatermark keys == batch distinct") {
    val dd = eventsStream.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    val q = dd.writeStream.outputMode("append")
      .format("memory").queryName("t7_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("t7_out").collect().map(_.toString).toSet
      val batch = streaming.Streaming.dedupKeys(Tables.events(spark, sf))
        .collect().map(_.toString).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("T8 sessionization: flatMapGroupsWithState == batch flatMapGroups walk") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ds = eventsStream
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .as[(Long, Long, Long)]
    // single AvailableNow-style batch: each group sees all its rows in
    // one invocation, so the stateful walk equals the batch walk; with
    // multiple micro-batches the buffered state would carry rows across
    val sess = ds.groupByKey(_._1)
      .flatMapGroupsWithState[Array[(Long, Long, Long)], (Long, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long)],
         state: GroupState[Array[(Long, Long, Long)]]) =>
          val buffered = state.getOption.getOrElse(Array.empty) ++ it
          state.update(buffered)
          streaming.Streaming.sessionWalk(uid, buffered.iterator)
      }.toDF("user_id", "session_idx", "n_events", "first_event", "last_event")
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("t8_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("t8_out").collect().map(_.toString).toSet
      val batch = streaming.Streaming.streamUserSessions(spark, sf)
        .collect().map(_.toString).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("T6 stream-stream interval join (watermarked, append) == batch join") {
    val clicks = eventsStream.filter(col("event_type") === "click")
      .withWatermark("ts", "1 hour")
    val purchases = eventsStream.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
    val q = streaming.Streaming.intervalJoin(clicks, purchases)
      .writeStream.outputMode("append").format("memory")
      .queryName("t6_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("t6_out").collect().map(_.toString).toSet
      val ev = Tables.events(spark, sf)
      val batch = streaming.Streaming.intervalJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
        .collect().map(_.toString).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("T6b stream-stream LEFT OUTER join: matches == batch; null-padding watermark-bounded") {
    val clicks = eventsStream.filter(col("event_type") === "click")
      .withWatermark("ts", "1 hour")
    val purchases = eventsStream.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
    val q = streaming.Streaming.intervalJoinLeft(clicks, purchases)
      .writeStream.outputMode("append").format("memory")
      .queryName("t6b_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("t6b_out").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      val ev = Tables.events(spark, sf)
      val batch = streaming.Streaming.intervalJoinLeft(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      // matched pairs must agree exactly
      val sm = streamed.filter(_._3 >= 0); val bm = batch.filter(_._3 >= 0)
      assert(sm == bm && bm.nonEmpty)
      // null-padded rows: the stream may hold back clicks still inside
      // the watermark (state can't give up on them yet) — what it did
      // emit must be a subset of the batch's unmatched clicks
      assert(streamed.filter(_._3 < 0).subsetOf(batch.filter(_._3 < 0)))
    } finally q.stop()
  }

  test("foreachBatch sink: micro-batches land as parquet equal to the batch input") {
    val outDir = Files.createTempDirectory("graft_fb").toString + "/out"
    val q = eventsStream.select("event_id", "user_id", "event_type")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    try {
      q.processAllAvailable()
      val written = spark.read.parquet(outDir)
      assert(written.count() == Tables.events(spark, sf).count())
      assert(written.select("event_id").distinct().count() == written.count())
    } finally q.stop()
  }

  test("foreachBatch idempotent upsert: batch-id partition overwrite " +
    "survives replaying a micro-batch without duplicates") {
    // the streaming CDC-apply pattern: each micro-batch lands in its
    // own batch_id partition with dynamic partition overwrite, so a
    // replayed batch (restart after commit-to-sink but before
    // commit-to-checkpoint) overwrites itself instead of appending —
    // exactly-once output from an at-least-once sink call
    val outDir = Files.createTempDirectory("graft_fbu").toString + "/out"
    def applyBatch(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      batch.withColumn("batch_id", lit(id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(outDir)
    val q = eventsStream.select("event_id", "user_id", "event_type")
      .writeStream.foreachBatch(applyBatch _).start()
    val (n0, replayed) = try {
      q.processAllAvailable()
      val once = spark.read.parquet(outDir)
      val n = once.count()
      // simulate the replay: re-apply batch 0's content as batch 0
      applyBatch(spark.read.parquet(outDir)
        .filter(col("batch_id") === 0L)
        .drop("batch_id"), 0L)
      (n, spark.read.parquet(outDir))
    } finally q.stop()
    assert(n0 == Tables.events(spark, sf).count())
    assert(replayed.count() == n0) // replay did not duplicate
    assert(replayed.select("event_id").distinct().count() == n0)
  }

  test("library text ops run under readStream: mask+quality == batch") {
    // the corpus-clean pipeline's map-only stages (PII mask, quality
    // scoring + keep filter) are stateless DataFrame transforms, so
    // the SAME library functions run under a documents file stream in
    // append mode with no watermark needed
    val d = Files.createTempDirectory("graft_docs_stream")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = Tables.documents(spark, sf).schema
    val docsStream = spark.readStream.schema(schema).parquet(d.toString)
    val cleaned = functions.Text.textQualityOn(
        functions.Text.textPiiMaskOn(docsStream)
          .select(col("doc_id"), col("masked").as("text")))
      .filter(col("keep")).select("doc_id", "n_tokens")
    val q = cleaned.writeStream.outputMode("append")
      .format("memory").queryName("txt_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("txt_out").collect().map(_.toString).toSet
      val batch = functions.Text.textQualityOn(
          functions.Text.textPiiMaskOn(Tables.documents(spark, sf))
            .select(col("doc_id"), col("masked").as("text")))
        .filter(col("keep")).select("doc_id", "n_tokens")
        .collect().map(_.toString).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("MG sketch aggregate runs under readStream: candidates cover exact HH") {
    // the Misra-Gries TypedImperativeAggregate is mergeable, so it is
    // legal as a streaming complete-mode global aggregate — the
    // incremental micro-batch merges are the same merge() the batch
    // shuffle uses. The candidate SET is arrival-order dependent, so
    // the invariant proven here is the one the 2-pass operator relies
    // on: candidates cover every exact heavy hitter, total is exact.
    val d = Files.createTempDirectory("graft_hh_stream")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = Tables.documents(spark, sf).schema
    val docsStream = spark.readStream.schema(schema).parquet(d.toString)
    val sketch = docsStream
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(plans.MisraGriesAgg.sketch(col("token"), 200).as("s"))
      .select(col("s.cands").as("cands"), col("s.total").as("total"))
    val q = sketch.writeStream.outputMode("complete")
      .format("memory").queryName("hh_sketch_out").start()
    try {
      q.processAllAvailable()
      val row = spark.table("hh_sketch_out").collect().head
      val cands = row.getSeq[String](0).toSet
      val total = row.getLong(1)
      val toks = Tables.documents(spark, sf)
        .select(explode(split(col("text"), " ")).as("token"))
      assert(total == toks.count())
      val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 200 > total)
        .select("token").collect().map(_.getString(0)).toSet
      assert(exact.nonEmpty && exact.subsetOf(cands))
    } finally q.stop()
  }

  test("stream-static join: batch-trained MAD model scores a stream == batch") {
    // the lambda shape: the per-type robust model (median + MAD)
    // trains in batch, then joins against a live event stream — a
    // stream-static equi-join, stateless and watermark-free, so the
    // SAME scoring expressions run on both paths
    val d = Files.createTempDirectory("graft_anom_stream")
    val schema = Tables.events(spark, sf).schema
    val batchEvents = Tables.events(spark, sf)
    val model = batchEvents.groupBy("event_type")
      .agg(median(col("value")).as("med"))
    // write the stream source as parquet WITHOUT the ns timestamp
    // (readStream re-infers nanos otherwise); scoring needs no ts
    batchEvents.drop("ts").write.parquet(d.resolve("src").toString)
    val evStream = spark.readStream
      .schema(batchEvents.drop("ts").schema)
      .parquet(d.resolve("src").toString)
    def score(ev: org.apache.spark.sql.DataFrame) = ev
      .join(model, "event_type")
      .select(col("event_id"), abs(col("value") - col("med")).as("adev"))
    val q = score(evStream).writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("anom_out")
        .collect().map(_.toString).toSet
      val batch = score(batchEvents.drop("ts"))
        .collect().map(_.toString).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("checkpoint restart: file sink resumes exactly-once across query restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft_ckpt")
    val srcDir = base.resolve("src").toString
    val outDir = base.resolve("out").toString
    val cpDir = base.resolve("cp").toString
    new java.io.File(srcDir).mkdirs()
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$srcDir/batch1.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .select("event_id", "user_id", "event_type")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", cpDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val n1 = Tables.events(spark, sf).count()
    run()
    assert(spark.read.parquet(outDir).count() == n1)
    // second source file arrives with shifted ids; restart from the
    // same checkpoint -> only the new file is processed (no dupes)
    // the file stream source lists flat files, so stage the new batch
    // in a temp dir and move its part file in as one parquet file
    val tmp2 = base.resolve("stage2").toString
    spark.read.schema(schema).parquet(s"$srcDir/batch1.parquet")
      .withColumn("event_id", col("event_id") + 1000000L)
      .coalesce(1).write.parquet(tmp2)
    val part = new java.io.File(tmp2).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(s"$srcDir/batch2.parquet"))
    run()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 2 * n1)
    assert(out.select("event_id").distinct().count() == 2 * n1)
  }

  test("process-kill recovery: hard-killed stream resumes from checkpoint exactly-once") {
    // phase 1 runs in a SEPARATE JVM that Runtime.halt()s itself after
    // two committed micro-batches (no shutdown hooks, no graceful
    // stop) — the real crash a checkpoint must survive, which an
    // in-process stop() cannot simulate
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft_recovery").toFile
    val (inDir, ckDir, outDir) =
      (s"$work/in", s"$work/ck", s"$work/out")
    new java.io.File(inDir).mkdirs()
    val nFiles = 10; val rowsPerFile = 100
    (0 until nFiles).foreach { f =>
      val rows = (0 until rowsPerFile)
        .map(r => s"${f * rowsPerFile + r},${f * rowsPerFile + r}")
      Files.write(java.nio.file.Paths.get(s"$inDir/f$f.csv"),
        rows.mkString("\n").getBytes("UTF-8"))
    }
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq("java", "-Xmx2g") ++ addOpens ++ Seq(
      "-cp", sys.props("java.class.path"),
      "graft.streaming.RecoveryJob", "crash", inDir, ckDir, outDir)
    val log = new java.io.File(work, "crash.log")
    val proc = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(log)
      .start()
    val done = proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) proc.destroyForcibly()
    val logTail = new String(
      Files.readAllBytes(log.toPath), "UTF-8").takeRight(500)
    assert(done, s"crash phase did not terminate: $logTail")
    assert(proc.exitValue() == 137, s"exit ${proc.exitValue()}: $logTail")
    // committed output at the kill: some batches, not all (the sink
    // metadata log hides any torn in-flight files from readers)
    val partial = spark.read.parquet(outDir).count()
    assert(partial > 0 && partial < nFiles.toLong * rowsPerFile,
      s"crash not mid-stream: $partial rows committed")
    // phase 2: resume from the SAME checkpoint in this JVM, drain the
    // remaining files, and require exactly-once totals
    val q = streaming.RecoveryJob.start(spark, inDir, ckDir, outDir,
      availableNow = true)
    try q.awaitTermination(120000) finally q.stop()
    val out = spark.read.parquet(outDir)
    assert(out.count() == nFiles.toLong * rowsPerFile)
    assert(out.select("id").distinct().count() == nFiles.toLong * rowsPerFile)
    assert(out.filter(col("v2") =!= col("v") * 2).count() == 0)
  }

  test("T6 foreachBatch CDC: sequential micro-batch merges == one batch merge") {
    import scala.jdk.CollectionConverters._
    // the streaming half of merge_upsert: a change feed arrives in
    // micro-batches and foreachBatch folds each into the base state
    // with the SAME mergeUpsertOn the batch catalog query uses —
    // the Delta/Iceberg MERGE streaming-sink pattern on plain parquet
    val base = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    val updates = base.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("u_orderkey"),
        (col("o_totalprice") + 10.0).as("u_totalprice"),
        lit("U").as("u_status"))
    val inserts = base.filter(col("o_orderkey") % 13 === 0)
      .select((col("o_orderkey") + 100000000L).as("u_orderkey"),
        col("o_totalprice").as("u_totalprice"), lit("N").as("u_status"))
    val work = Files.createTempDirectory("graft_cdc")
    val feed = work.resolve("feed"); Files.createDirectory(feed)
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = work.resolve(name + "_tmp")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).iterator.asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(part, feed.resolve(name + ".parquet"))
    }
    drop(updates, "b0"); drop(inserts, "b1")
    base.write.parquet(work.resolve("state0").toString)
    var cur = work.resolve("state0").toString
    var step = 0
    val q = spark.readStream.schema(updates.schema)
      .option("maxFilesPerTrigger", "1").parquet(feed.toString)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val next = work.resolve(s"state${step + 1}").toString
          operators.Joins.mergeUpsertOn(spark.read.parquet(cur), batch)
            .select("o_orderkey", "o_totalprice", "o_orderstatus")
            .write.parquet(next)
          cur = next; step += 1
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(step == 2, s"expected 2 micro-batches, got $step")
    val streamed = spark.read.parquet(cur)
      .collect().map(_.toString).toSet
    val oneShot = operators.Joins
      .mergeUpsertOn(base, updates.unionByName(inserts))
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .collect().map(_.toString).toSet
    assert(streamed == oneShot && oneShot.nonEmpty)
  }

  test("T5 streaming dedup by key emits one row per event_id") {
    val q = eventsStream.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("t5_out").start()
    try {
      q.processAllAvailable()
      val n = spark.table("t5_out").count()
      assert(n == Tables.events(spark, sf).count())
    } finally q.stop()
  }

  test("T6 Count-Min grid per window: streaming == batch, and each " +
    "window's grid row sums to its event count per hash row") {
    val streamed = runToSet(
      streaming.Streaming.countminGrid(
        eventsStream.withWatermark("ts", "10 minutes")), "t6_out")
    val batch = streaming.Streaming.countminGrid(Tables.events(spark, sf))
    assert(streamed == batch.collect().map(_.toString).toSet)
    // mass conservation: for every (window, hash row) the bucket
    // counts sum to the window's event count — the sketch loses rank,
    // never mass
    val winCounts = streaming.Streaming
      .tumbling(Tables.events(spark, sf))
      .groupBy("win_start").agg(sum("n_events").as("n"))
    val gridSums = batch.groupBy("win_start", "d")
      .agg(sum("bc").as("mass"))
    val bad = gridSums.join(winCounts, "win_start")
      .filter(col("mass") =!= col("n")).count()
    assert(bad == 0)
  }

  test("T12 HLL register grid per window: streaming == batch, and the " +
    "finished estimates stay inside the published error envelope") {
    val streamed = runToSet(
      streaming.Streaming.hllGrid(
        eventsStream.withWatermark("ts", "10 minutes")), "t12_out")
    val batch = streaming.Streaming.hllGrid(Tables.events(spark, sf))
    assert(streamed == batch.collect().map(_.toString).toSet)
    // sink-side finisher over the grid: estimates vs exact per window
    val fin = streaming.Streaming.streamHll(spark, sf).collect()
    assert(fin.nonEmpty)
    fin.foreach { r =>
      val exact = r.getAs[Long]("exact_users")
      assert(math.abs(r.getAs[Long]("err")) <=
        math.max(10L, exact * 25 / 100),
        s"win ${r.get(0)}: est=${r.getAs[Long]("est")} exact=$exact")
    }
  }

  test("T9 CDC replay: last writer wins by change time, trailing tombstone deletes the key") {
    import spark.implicits._
    val t0 = 1700000000000L
    val mk = (eid: Long, uid: Long, typ: String, tsOff: Long, v: Double) =>
      (eid, new java.sql.Timestamp(t0 + tsOff * 1000), uid, typ, v, "{}")
    val log = Seq(
      // user 1: U(10.00), U(20.00), D  -> deleted
      mk(1, 1L, "view", 10, 10.0), mk(2, 1L, "click", 20, 20.0),
      mk(3, 1L, "error", 30, 0.0),
      // user 2: U(5.00), D, U(30.00)   -> survives at 30.00
      mk(4, 2L, "view", 10, 5.0), mk(5, 2L, "error", 20, 0.0),
      mk(6, 2L, "purchase", 30, 30.0),
      // user 3: out-of-order arrival — the LATER ts wins even though
      // it appears first in the log
      mk(7, 3L, "view", 50, 77.0), mk(8, 3L, "view", 10, 1.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = streaming.Streaming.cdcReplay(log)
      .select("user_id", "latest_cents", "n_changes")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((2L, 3000L, 3L), (3L, 7700L, 2L)))
  }

  test("T10 windowed top-k: streaming counts + sink-side rank == batch " +
      "leaderboard") {
    // the aggregate streams in complete mode; the rank finisher runs
    // on the sink table (the foreachBatch position)
    val q = streaming.Streaming.windowCounts(
        eventsStream.withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("t10_counts").start()
    val streamed = try {
      q.processAllAvailable()
      streaming.Streaming.rankTopk(spark.table("t10_counts"))
        .collect().map(_.toString).toSet
    } finally q.stop()
    val batch = streaming.Streaming.streamTopk(spark, sf)
      .collect().map(_.toString).toSet
    assert(streamed == batch && batch.nonEmpty)
    // leaderboard shape: ranks 1..<=3 per window, counts nonincreasing
    val rows = streaming.Streaming.streamTopk(spark, sf)
      .select("win_start", "rnk", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    rows.values.foreach { g =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to byRank.length))
      assert(byRank.length <= 3)
      assert(byRank.map(_._3).sliding(2).forall(p =>
        p.length < 2 || p(0) >= p(1)))
    }
  }

  test("T9 pattern match: imperative group walk == declarative window spelling") {
    val walk = streaming.Streaming.streamPatternMatch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val decl = operators.Events.eventPatternMatch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(walk === decl)
    assert(walk.nonEmpty)
  }

  test("real-bytes codec path under readStream: encode -> AVI decode " +
    "stats over a streaming id source == the batch relation " +
    "(mapPartitions is streaming-legal end to end)") {
    import org.apache.spark.sql.Encoders
    val docDir = {
      val d = Files.createTempDirectory("graft_stream_docs")
      Files.copy(Paths.get(s"$sf/documents.parquet"),
        d.resolve("documents.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      d.toString
    }
    val docSchema = spark.read.parquet(docDir).schema
    val ids = spark.readStream.schema(docSchema).parquet(docDir)
      .select(col("doc_id")).as[Long](Encoders.scalaLong)
    val q = multimodal.Multimodal.mmDecodeVideoOn(ids)
      .writeStream.outputMode("append").format("memory")
      .queryName("mm_stream_out").start()
    val streamed = try {
      q.processAllAvailable()
      spark.table("mm_stream_out").collect().map(_.toString).toSet
    } finally q.stop()
    val batch = multimodal.Multimodal
      .mmDecodeVideoOn(Tables.documents(spark, sf)
        .select(col("doc_id")).as[Long](Encoders.scalaLong))
      .collect().map(_.toString).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("real-bytes MP4 path under readStream: box-tree probe and " +
    "index-resolved sample extraction over a streaming id source == " +
    "the batch relations") {
    import org.apache.spark.sql.Encoders
    val docDir = {
      val d = Files.createTempDirectory("graft_stream_mp4")
      Files.copy(Paths.get(s"$sf/documents.parquet"),
        d.resolve("documents.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      d.toString
    }
    val docSchema = spark.read.parquet(docDir).schema
    def streamIds = spark.readStream.schema(docSchema).parquet(docDir)
      .select(col("doc_id")).as[Long](Encoders.scalaLong)
    def batchIds = Tables.documents(spark, sf)
      .select(col("doc_id")).as[Long](Encoders.scalaLong)
    for ((name, core) <- Seq[(String,
        org.apache.spark.sql.Dataset[Long] =>
          org.apache.spark.sql.DataFrame)](
        "probe" -> multimodal.Multimodal.mmMp4ProbeOn,
        "extract" -> multimodal.Multimodal.mmMp4ExtractOn,
        "decode_frames" -> multimodal.Multimodal.mmMp4DecodeFramesOn,
        "decode_av" -> multimodal.Multimodal.mmMp4DecodeAvOn,
        "png" -> multimodal.Multimodal.mmDecodePngOn,
        "gif" -> multimodal.Multimodal.mmDecodeGifOn)) {
      val q = core(streamIds)
        .writeStream.outputMode("append").format("memory")
        .queryName(s"mp4_stream_$name").start()
      val streamed = try {
        q.processAllAvailable()
        spark.table(s"mp4_stream_$name").collect()
          .map(_.toString).toSet
      } finally q.stop()
      val batch = core(batchIds).collect().map(_.toString).toSet
      assert(streamed == batch && batch.nonEmpty, name)
    }
  }

  test("mixed-format sniff-dispatch under readStream: magic-byte " +
    "detection + eight real decoders over a streaming id source == " +
    "the batch relation, and the JPEG, M-JPEG, G.711 and TIFF decode " +
    "cores hold the same contract") {
    import org.apache.spark.sql.Encoders
    val docDir = {
      val d = Files.createTempDirectory("graft_stream_sniff")
      Files.copy(Paths.get(s"$sf/documents.parquet"),
        d.resolve("documents.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      d.toString
    }
    val docSchema = spark.read.parquet(docDir).schema
    def streamIds = spark.readStream.schema(docSchema).parquet(docDir)
      .select(col("doc_id")).as[Long](Encoders.scalaLong)
    def batchIds = Tables.documents(spark, sf)
      .select(col("doc_id")).as[Long](Encoders.scalaLong)
    for ((name, core) <- Seq[(String,
        org.apache.spark.sql.Dataset[Long] =>
          org.apache.spark.sql.DataFrame)](
        "sniff" -> multimodal.Multimodal.mmSniffDecodeOn,
        "jpeg" -> multimodal.Multimodal.mmDecodeJpegOn,
        "jpeg_prog" -> multimodal.Multimodal.mmDecodeJpegProgOn,
        "jpeg_prog_sa" -> multimodal.Multimodal.mmDecodeJpegProgSaOn,
        "mjpeg" -> multimodal.Multimodal.mmDecodeMjpegOn,
        "g711" -> multimodal.Multimodal.mmDecodeG711On,
        "tiff" -> multimodal.Multimodal.mmDecodeTiffOn)) {
      val q = core(streamIds)
        .writeStream.outputMode("append").format("memory")
        .queryName(s"sniff_stream_$name").start()
      val streamed = try {
        q.processAllAvailable()
        spark.table(s"sniff_stream_$name").collect()
          .map(_.toString).toSet
      } finally q.stop()
      val batch = core(batchIds).collect().map(_.toString).toSet
      assert(streamed == batch && batch.nonEmpty, name)
    }
  }

  test("quarantine error channel under foreachBatch: the reference's " +
    "per-file try/except catalog in streaming spelling — ok rows and " +
    "quarantined rows land in SEPARATE sinks per micro-batch, and " +
    "their union == the batch relation") {
    import org.apache.spark.sql.Encoders
    val docDir = {
      val d = Files.createTempDirectory("graft_stream_quar")
      Files.copy(Paths.get(s"$sf/documents.parquet"),
        d.resolve("documents.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      d.toString
    }
    val okDir = Files.createTempDirectory("graft_quar_ok").toString + "/ok"
    val errDir = Files.createTempDirectory("graft_quar_err").toString + "/err"
    val docSchema = spark.read.parquet(docDir).schema
    val ids = spark.readStream.schema(docSchema).parquet(docDir)
      .select(col("doc_id")).as[Long](Encoders.scalaLong)
    val q = multimodal.Multimodal.mmDecodeQuarantineOn(ids)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the reference writes success_df and error_df separately
        // (raw_to_samples.py:385-396); same split, streaming form
        batch.persist()
        batch.filter(col("status") === "ok")
          .write.mode("append").parquet(okDir)
        batch.filter(col("status") =!= "ok")
          .write.mode("append").parquet(errDir)
        batch.unpersist()
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val ok = spark.read.parquet(okDir)
    val err = spark.read.parquet(errDir)
    val streamedUnion = ok.unionByName(err).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val batchRel = multimodal.Multimodal
      .mmDecodeQuarantine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(streamedUnion == batchRel && batchRel.nonEmpty)
    assert(err.count() > 0, "no quarantined rows at this sf")
    assert(ok.count() > 0)
  }
}
