package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Sink round-trips — SURVEY.md §2.1 S5-S11 (the reference's CSV/JSON/
  * text/partitioned outputs, re-read and compared). */
class SinksSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sink").toString

  test("S12 range-partitioned sorted parquet: file zone maps are disjoint") {
    // the 100 TB data-layout story: repartitionByRange + sort-within
    // clusters a sort key so every output file covers a disjoint key
    // range — parquet min/max stats then let a key-range scan skip
    // whole files. Verified here by reading each file's actual
    // key range back and checking pairwise disjointness.
    val out = tmp() + "/orders_ranged"
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode(SaveMode.Overwrite).parquet(out)
    val ranges = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min("o_orderkey"), max("o_orderkey")).head
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping file ranges: $hi >= $lo")
    }
  }

  test("S6 headered CSV sink round-trips (to_csv(index=False) analog)") {
    val d = tmp()
    val src = Tables.nation(spark, sf)
    src.write.mode(SaveMode.Overwrite).option("header", "true").csv(d)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(d)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("ORC sink/source round-trips with predicate pushdown (columnar alternative)") {
    // beyond the reference's formats: Spark ships the ORC datasource
    // in-box, so a library user gets the second columnar format for
    // free — verify the roundtrip AND that filters reach the ORC scan
    val d = tmp()
    val src = Tables.orders(spark, sf)
    src.write.mode(SaveMode.Overwrite).orc(d)
    val back = spark.read.orc(d)
    assert(back.count() == src.count())
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      src.orderBy("o_orderkey").collect().toSeq)
    val filtered = back.filter(org.apache.spark.sql.functions
      .col("o_totalprice") > 100000.0)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan"), p)
    assert(filtered.count() ==
      src.filter("o_totalprice > 100000.0").count())
  }

  test("S5 JSON dict sink round-trips (json.dump analog)") {
    val d = tmp()
    val src = Seq(("a/b.mp4", "play"), ("c/d.mp4", "eat"))
      .toDF("path", "action")
    src.write.mode(SaveMode.Overwrite).json(d)
    val back = spark.read.schema(src.schema).json(d)
    assert(back.orderBy("path").collect().toSeq ==
      src.orderBy("path").collect().toSeq)
  }

  test("S9 partitioned sink lays out frames/<sub_id>/ (raw_to_samples.py:111-121)") {
    val d = tmp()
    Seq((1, "f0"), (1, "f1"), (2, "f0")).toDF("sub_id", "frame")
      .write.mode(SaveMode.Overwrite).partitionBy("sub_id").parquet(d)
    val dirs = new java.io.File(d).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("sub_id=1", "sub_id=2"))
    val back = spark.read.parquet(d)
    assert(back.count() == 3 &&
      back.select("sub_id").distinct().count() == 2)
  }

  test("S7 append-mode text sink accumulates error lines (raw_to_samples.py:291-299)") {
    val d = tmp() + "/log"
    Seq("err one").toDF("value").write.mode(SaveMode.Append).text(d)
    Seq("err two").toDF("value").write.mode(SaveMode.Append).text(d)
    val lines = spark.read.text(d).as[String].collect().toSet
    assert(lines == Set("err one", "err two"))
  }

  test("S11 overwrite mode refreshes the dir (rmtree+mkdirs analog)") {
    val d = tmp() + "/out"
    Seq(1, 2, 3).toDF("x").write.mode(SaveMode.Overwrite).parquet(d)
    Seq(9).toDF("x").write.mode(SaveMode.Overwrite).parquet(d)
    assert(spark.read.parquet(d).as[Int].collect().toSeq == Seq(9))
  }

  test("S2 staged CSV export reads back with the declared schema") {
    val base = sources.Sources.ensureStaged(spark, sf)
    val df = spark.read.schema(sources.Sources.customerCsvSchema)
      .option("header", "true").csv(s"$base/customer_csv")
    assert(df.schema == sources.Sources.customerCsvSchema)
    assert(df.count() == Tables.customer(spark, sf).count())
  }

  test("S13 schema evolution: v1 rows surface the added column as " +
      "NULL, v2 rows carry the true value, nothing is lost") {
    val docs = Tables.documents(spark, sf).cache()
    val merged = sources.Sources.scanSchemaEvolution(spark, sf).cache()
    assert(merged.count() == docs.count())
    // every even (v1-generation) doc: NULL n_chars; odd: exact value
    assert(merged.filter(col("doc_id") % 2 === 0)
      .filter(col("n_chars").isNotNull).count() == 0)
    val mismatch = merged.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("n_chars").as("got"))
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .filter(col("got") =!= col("n_chars") || col("got").isNull)
    assert(mismatch.count() == 0)
    merged.unpersist(); docs.unpersist()
  }

  test("S10 video encode sink writes REAL RIFF/AVI bytes per video " +
    "via foreachPartition (raw_to_samples.py:125-144 VideoWriter " +
    "analog); files re-parse with the real decoder") {
    import multimodal.Codecs
    val dir = java.nio.file.Files.createTempDirectory("avi_sink")
    val out = dir.toString
    // executor-side encode + write: the sink shape the reference's
    // create_video_from_frames uses, expressed as foreachPartition
    spark.range(1, 6).select(col("id").as("doc_id"))
      .repartition(2)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          val id = r.getLong(0)
          val w = 4 + (id % 3).toInt; val h = 3
          val frames = (0 until 2).map(f => Array.tabulate(w * h * 3)(i =>
            ((id * 11 + f * 7 + i) % 256).toByte))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, f"sample$id%06d.avi"),
            multimodal.Codecs.aviEncode(w, h, 5, frames))
        }
      }
    val files = new java.io.File(out).listFiles().sortBy(_.getName)
    assert(files.map(_.getName).toSeq ==
      (1L to 5L).map(i => f"sample$i%06d.avi"))
    val dec = new Codecs.AviDecoder()
    files.zip(1L to 5L).foreach { case (fl, id) =>
      val v = dec.decode(java.nio.file.Files.readAllBytes(fl.toPath))
      val w = 4 + (id % 3).toInt
      assert(v.width == w && v.height == 3 && v.fps == 5 &&
        v.frames.length == 2)
      assert(v.frames(1).toSeq == Array.tabulate(w * 3 * 3)(i =>
        ((id * 11 + 7 + i) % 256).toByte).toSeq, s"doc $id")
    }
    files.foreach(_.delete())
  }
}
