package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Crash-recovery harness for the streaming file sink (SURVEY §9.8):
  * a file-source -> transform -> parquet-sink stream that can be told
  * to HARD-KILL its own JVM (Runtime.halt — no shutdown hooks, no
  * graceful stop) after a couple of committed micro-batches, and on a
  * later run resume from the same checkpoint.
  *
  * Exactly-once comes from the two Spark logs the crash cannot tear:
  * the checkpoint's offset/commit log (which input files each batch
  * owns) and the sink's _spark_metadata log (which output files are
  * committed). A batch in flight at the kill leaves only orphan files
  * that readers ignore; the restart re-runs it from its recorded
  * offsets and commits once.
  *
  * Usage: runMain graft.streaming.RecoveryJob <crash|finish> <in> <checkpoint> <out>
  */
object RecoveryJob {

  /** Builds the stream against an existing session; shared by the
    * crash process and the in-test resume. */
  def start(spark: SparkSession, inDir: String, ckDir: String,
      outDir: String, availableNow: Boolean) = {
    val in = spark.readStream
      .schema("id LONG, v LONG")
      .option("maxFilesPerTrigger", "1")
      .csv(inDir)
    val out = in.select(col("id"), col("v"), (col("v") * 2).as("v2"))
    val w = out.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
    // crash mode throttles to ~1 batch/sec: progress events arrive on
    // the async listener bus, and an unthrottled stream could commit
    // every remaining batch before the halt fires, leaving the "killed
    // MID-stream" assertion nothing to assert
    (if (availableNow) w.trigger(Trigger.AvailableNow())
     else w.trigger(Trigger.ProcessingTime("1 second"))).start()
  }

  def main(args: Array[String]): Unit = {
    val Array(mode, inDir, ckDir, outDir) = args.take(4)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (mode == "crash") {
      spark.streams.addListener(new StreamingQueryListener {
        private var committed = 0
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = {
          if (e.progress.numInputRows > 0) {
            committed += 1
            // after the 2nd data batch commits: a hard kill with more
            // input still pending — the state a lost executor/driver
            // leaves behind at 100 TB
            if (committed >= 2) Runtime.getRuntime.halt(137)
          }
        }
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
      start(spark, inDir, ckDir, outDir, availableNow = false)
      // halt() fires first on any healthy run; reaching the timeout
      // means the crash never happened — exit distinctly
      Thread.sleep(120000)
      sys.exit(3)
    } else {
      val q = start(spark, inDir, ckDir, outDir, availableNow = true)
      q.awaitTermination()
      spark.stop()
    }
  }
}
