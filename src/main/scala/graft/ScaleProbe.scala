package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe: times the data-bound operators on k x
  * copies of the documents corpus (k = 1, 2, 4) and prints the growth
  * ratio per doubling. Near 2 means linear — the shape that survives
  * a 1000-executor cluster; near 4 means quadratic — the shape that
  * does not.
  *
  * Copies are content-PERTURBED (every token prefixed with the copy
  * index via a global regex), so no cross-copy near-duplicates exist
  * and the planted dup structure stays constant per copy — a naive
  * self-union would make every row a near-dup of k-1 others and
  * measure an adversarial corpus no real pipeline has.
  *
  * Usage: runMain graft.ScaleProbe [sfDir [op ...]]
  * (env REPS=n, default 2; trailing args restrict to named ops)
  */
object ScaleProbe {

  def corpusTimes(s: SparkSession, dir: String, k: Int): DataFrame = {
    val base = Tables.documents(s, dir)
    (0 until k)
      .map { c =>
        base.select(
          (col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
          (if (c == 0) col("text")
           else regexp_replace(col("text"), "([a-z0-9]+)", s"c$c$$1"))
            .as("text"),
          col("lang"))
      }
      .reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the probed ops, over an arbitrary (doc_id, text, lang) corpus
    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "dedup_exact" -> functions.Dedup.dedupExactOn,
      "dedup_minhash" -> (d =>
        functions.Dedup.dedupMinhashOn(
          functions.Dedup.shingleHashesOf(d).localCheckpoint(true))),
      "dedup_ngram" -> (d =>
        functions.Dedup.dedupNgramOn(
          functions.Dedup.shingleHashesOf(d).localCheckpoint(true))),
      "dedup_simhash64" -> (d =>
        functions.Dedup.dedupSimhash64On(
          functions.Dedup.simhash64SigOf(functions.Dedup.tokenCountsOf(d)))),
      "corpus_clean" -> functions.Text.corpusCleanOn,
      "text_quality" -> functions.Text.textQualityOn,
      "text_repetition" -> functions.Text.textRepetitionOn,
      "text_chunk" -> (d => functions.Text.textChunkOn(d)),
      "text_lm_score" -> (d => functions.Text.textLmScoreOn(d)),
      // pair ops reference the shingle relation several times: honor
      // Dedup's persist-before-use contract (localCheckpoint: measured
      // work, then GC-able) so the probe times the op, not re-shingling
      "dedup_clusters" -> (d =>
        functions.Clusters.clustersOn(
          functions.Dedup.dedupMinhashOn(
            functions.Dedup.shingleHashesOf(d).localCheckpoint(true))
            .select("da", "db"))),
      "dedup_incremental" -> (d =>
        functions.Dedup.dedupIncrementalOn(
          functions.Dedup.shingleHashesOf(d).localCheckpoint(true),
          c => c % 5 === 0)),
      "dedup_substring" -> (d => functions.Dedup.dedupSubstringOn(d)),
      "sample_domain_cap" -> (d =>
        functions.Corpus.sampleDomainCapOn(
          // perturbed copies keep (doc_id, text, lang); derive a
          // source from the language so every copy caps per domain
          d.withColumn("source", col("lang")))),
      // perturbed copies multiply the vocabulary k x as well as the
      // stream — exactly the regime the MG sketch caps: its shuffle
      // stays k-slot-sized however the vocabulary grows
      "text_heavy_hitters" -> (d => functions.Text.heavyHittersOn(d)),
      // BPE: induction + apply both work the word-frequency table;
      // perturbed copies grow the vocabulary k x, so this probes the
      // vocabulary-pass claim directly
      "text_bpe_encode" -> (d => functions.Text.textBpeEncodeOn(d)),
      "corpus_quality_bins" -> (d =>
        functions.Corpus.corpusQualityBinsOn(
          d.withColumn("n_chars", length(col("text")).cast("long")))),
      "dedup_url" -> (d =>
        functions.Dedup.dedupUrlOn(d.select(col("doc_id"),
          concat(col("lang"), lit(".example.com/d/"),
            pmod(col("doc_id"), lit(25))).as("url")))),
      // a deliberately hubby fan graph (one hub wired to every doc,
      // rim path closing a triangle per consecutive id pair): the
      // hub's degree grows k x, so the naive a<b orientation would
      // make its wedge set grow k^2 — the degree-ordered orientation
      // keeps this near-linear per doubling
      "graph_triangles" -> (d => {
        val ids = d.select(col("doc_id").cast("long").as("i"))
          .filter(col("i") > 0)
        val hub = ids.select(lit(0L).as("a"), col("i").as("b"))
        val rim = ids.select(col("i").as("a"), (col("i") + 1L).as("b"))
        functions.Clusters.triangleCountOn(hub.unionByName(rim))
      }),
      // perturbed copies grow the vocabulary k x; the CMS shuffle must
      // stay D*W-sized regardless (the bounded-state claim)
      "text_countmin" -> (d => functions.Text.textCountminOn(d)),
      // SNM candidates are (w-1)*n by construction — the probe pins
      // the linear-candidate claim against a doubling corpus
      "dedup_sorted_neighborhood" -> (d =>
        functions.Dedup.dedupSortedNeighborhoodOn(
          functions.Dedup.shingleHashesOf(d).localCheckpoint(true))),
      // perturbed copies keep shingle spaces disjoint, so posting-list
      // df stays constant and the inverted-index pair work must grow
      // linearly with corpus size — the df-cap claim measured
      "sim_sparse_cosine" -> (d => functions.Similarity.simSparseCosineOn(d)),
      "dedup_substring_apply" -> (d =>
        functions.Dedup.dedupSubstringApplyOn(d)),
      // the bucket models stay <= 4096 rows however the corpus grows;
      // both passes are map-side — growth per doubling must be ~2
      "corpus_dsir" -> (d => functions.Corpus.corpusDsirOn(
        d.filter(col("doc_id") % 40 =!= 7), d.filter(col("doc_id") % 40 === 7))),
      "profile_drift" -> (d => {
        val v = d.withColumn("v", length(col("text")).cast("long"))
        functions.Corpus.profileDriftOn(
          v.filter(col("doc_id") % 2 === 0), v.filter(col("doc_id") % 2 === 1),
          "v")
      }),
      // digit-run names chain within each perturbed copy; blocking is
      // (w-1)*n candidates and CC rounds stay diameter-bounded
      "er_pipeline" -> (d => functions.Clusters.erResolveOn(
        d.select(col("doc_id").as("rid"),
          format_string("rec#%09d", col("doc_id")).as("name"),
          col("lang").as("grp"),
          length(col("text")).cast("double").as("bal")))),
      // word scores are vocabulary-keyed (grows k x under perturbed
      // copies) and phrase windows are per-doc — both linear claims
      "text_rake" -> (d => functions.Fuzzy.textRakeOn(d)),
      // chunk aggregation shuffles on chunk text; perturbed copies
      // keep chunk spaces disjoint so duplicated-chunk groups stay
      // per-copy — growth must be ~2 per doubling
      "dedup_cdc_chunks" -> (d => functions.Chunks.dedupCdcChunksOn(d)),
      // boundary keys are disjoint across perturbed copies, so the
      // equi-join candidate set cannot grow quadratically
      "dedup_boundary_overlap" -> (d =>
        functions.Chunks.dedupBoundaryOverlapOn(d, k = 3)),
      // the exact pass must stay candidate-bounded as the corpus
      // doubles — the grid-prune claim measured
      "corpus_skyline" -> (d =>
        operators.Inference.corpusSkylineOn(d)),
      // two rank windows partitioned by source (derived per copy) +
      // a groups*k^2 join — linear in corpus, constant per group
      "corpus_dpo_pairs" -> (d => functions.Curation.corpusDpoPairsOn(
        d.withColumn("source", col("lang")))),
      // the real-codec family: encode -> parse -> stat is ONE
      // map-only pass over the id scan with per-partition decoder
      // init and no shuffle — growth per doubling must be ~2 (the
      // shape that lets 100 TB of containers decode embarrassingly
      // parallel). PNG adds real DEFLATE both ways; MP4 adds the
      // box-walk + index-seek path.
      "mm_decode_png" -> (d => multimodal.Multimodal.mmDecodePngOn(
        d.select(col("doc_id"))
          .as[Long](org.apache.spark.sql.Encoders.scalaLong))),
      "mm_decode_video" -> (d => multimodal.Multimodal.mmDecodeVideoOn(
        d.select(col("doc_id"))
          .as[Long](org.apache.spark.sql.Encoders.scalaLong))),
      "mm_mp4_decode_frames" -> (d =>
        multimodal.Multimodal.mmMp4DecodeFramesOn(
          d.select(col("doc_id"))
            .as[Long](org.apache.spark.sql.Encoders.scalaLong))),
      "mm_mp4_decode_av" -> (d =>
        multimodal.Multimodal.mmMp4DecodeAvOn(
          d.select(col("doc_id"))
            .as[Long](org.apache.spark.sql.Encoders.scalaLong))),
      "mm_decode_gif" -> (d =>
        multimodal.Multimodal.mmDecodeGifOn(
          d.select(col("doc_id"))
            .as[Long](org.apache.spark.sql.Encoders.scalaLong))),
      "mm_decode_jpeg" -> (d =>
        multimodal.Multimodal.mmDecodeJpegOn(
          d.select(col("doc_id"))
            .as[Long](org.apache.spark.sql.Encoders.scalaLong))),
      "mm_decode_mjpeg" -> (d =>
        multimodal.Multimodal.mmDecodeMjpegOn(
          d.select(col("doc_id"))
            .as[Long](org.apache.spark.sql.Encoders.scalaLong))),
    )

    // embedding-corpus probe: perturbed copies (one coordinate nudged
    // per copy) keep vectors distinct so no cross-copy near-dups
    def embTimes(k: Int): DataFrame = {
      val base = Tables.embeddings(spark, sfDir)
      (0 until k).map { c =>
        base.select(
          (col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
          (if (c == 0) col("embedding")
           else expr(s"transform(embedding, (x, i) -> CAST(x + CASE " +
             s"WHEN i = ${c % 64} THEN ${0.001 * c} ELSE 0.0 END AS FLOAT))"))
            .as("embedding"))
      }.reduce(_ unionByName _)
    }
    val embOps: Seq[(String, DataFrame => DataFrame)] = Seq(
      // the covariance rollup keys on (i,j) — a CONSTANT 2080-cell
      // space however the corpus grows; growth must be ~2
      "sim_pca_power" -> (e => functions.Similarity.simPcaPowerOn(e)),
      // one pass + broadcast scalars, map-only draw — ~2
      "sample_coreset" -> (e => functions.Similarity.sampleCoresetOn(e)),
      // per-vector rollup against broadcast 64-row loadings — ~2
      "sim_whiten_abtt" -> (e => functions.Similarity.simWhitenAbttOn(e,
        functions.Similarity.simPcaPowerOn(e).localCheckpoint(true))),
    )

    // density-grid probe (round-8 verdict ask #7): copies OFFSET in
    // the first coordinate by half a unit (12.5x the largest eps), so
    // a corpus doubling covers MORE AREA AT CONSTANT DENSITY — the
    // regime the MR-DBSCAN candidate bound licenses. Candidate pairs
    // (the `out=` column) and wall time must both grow ~2x per
    // doubling at BOTH cell sizes; a density increase at fixed area
    // is a parameter change (eps vs point spacing), not a scale
    // change, and is what the r^2 growth note at gridPairsBuild
    // documents.
    def embGridTimes(k: Int): DataFrame = {
      val base = Tables.embeddings(spark, sfDir)
      (0 until k).map { c =>
        base.select(
          (col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
          (if (c == 0) col("embedding")
           else expr(s"transform(embedding, (x, i) -> CAST(x + CASE " +
             s"WHEN i = 0 THEN ${0.5 * c} ELSE 0.0 END AS FLOAT))"))
            .as("embedding"))
      }.reduce(_ unionByName _)
    }
    val gridOps: Seq[(String, DataFrame => DataFrame)] = Seq(
      "grid_pairs_eps5e3" ->
        (e => functions.Clusters.gridPairsBuild(e, 5000L)),
      "grid_pairs_eps4e4" ->
        (e => functions.Clusters.gridPairsBuild(e, 40000L)),
      "cluster_dbscan" -> (e => functions.Clusters.clusterDbscanOn(e)),
      "cluster_linkage" ->
        (e => functions.Clusters.clusterLinkageLadderOn(e)),
      "anomaly_lof" -> (e => functions.Clusters.anomalyLofOn(e)),
    )

    val only = args.drop(1).toSet
    val picked = ops.filter { case (n, _) => only.isEmpty || only(n) }
    val pickedEmb = embOps.filter { case (n, _) => only.isEmpty || only(n) }
    val pickedGrid = gridOps.filter { case (n, _) => only.isEmpty || only(n) }
    val ks = Seq(1, 2, 4)
    val times = collection.mutable.Map[(String, Int), Double]()
    for (k <- ks; (gen, list) <- Seq(
        (corpusTimes(spark, sfDir, _: Int), picked),
        (embTimes _, pickedEmb), (embGridTimes _, pickedGrid));
        (name, fn) <- list) {
      val c = gen(k)
      var outRows = 0L
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        outRows = fn(c).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      times((name, k)) = t
      println(f"PROBE $name%-18s k=$k%-2d rows=${c.count()}%-7d " +
        f"out=$outRows%-8d ${t}%.2f s")
    }

    // --- Concurrent-fan probes (round-9 verdict ask #5) ---
    // The round-8 fans (linkage rungs, sweep cuts) are driver-latency
    // wins at sf0.1. Probe them at 2x/4x corpus with the pair inputs
    // built and checkpointed OUTSIDE the timer (so the ratio measures
    // the fan of CC censuses, not pair generation), and time the SAME
    // censuses as one concurrent fan vs |cuts| sequential single-cut
    // calls — the "does the fan still win when rungs go data-bound"
    // crossover measured directly at each k.
    val fanNames = collection.mutable.ArrayBuffer[String]()
    def probeFan(name: String, k: Int, fn: () => Long): Unit = {
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.min
      times((name, k)) = t
      if (!fanNames.contains(name)) fanNames += name
      println(f"PROBE $name%-18s k=$k%-2d $t%.2f s")
    }
    if (only.isEmpty || only("fans")) {
      for (k <- ks) {
        val e = embTimes(k).localCheckpoint(true)
        val pairs = functions.Dedup.dedupEmbeddingOn(e, 0.4)
          .localCheckpoint(true)
        val np = e.agg(count(lit(1)).as("n_points"))
        val cuts = Seq(4000L, 4500L, 5000L, 5500L)
        probeFan("sweep_fan", k, () => functions.Clusters
          .dedupSemanticSweepOn(pairs, np, cuts).count())
        probeFan("sweep_seq", k, () => cuts.map(c => functions.Clusters
          .dedupSemanticSweepOn(pairs, np, Seq(c)).count()).sum)
        val gp = functions.Clusters
          .gridPairsBuild(embGridTimes(k), 40000L).localCheckpoint(true)
        val rungs = Seq(5000L, 10000L, 20000L, 40000L)
        probeFan("ladder_fan", k, () => functions.Clusters
          .clusterLinkageLadderOnPairs(gp, rungs).count())
        probeFan("ladder_seq", k, () => rungs.map(r => functions.Clusters
          .clusterLinkageLadderOnPairs(gp, Seq(r)).count()).sum)
      }
    }

    // --- Per-format codec throughput (round-9 verdict ask #8) ---
    // The 1x-4x corpus probe is overhead-dominated at sf-sized
    // containers; THIS probe builds containers big enough that codec
    // CPU dominates (256x256 rasters, 8x128x128 clips) and reports
    // bytes/s per format — the first number a 100 TB ingest design
    // review asks. Encode-only and encode+decode passes are timed
    // separately so decode throughput is the difference.
    if (only.isEmpty || only("codec_bytes")) {
      import org.apache.spark.sql.Encoders
      val nDocs = sys.env.getOrElse("CODEC_DOCS", "2000").toInt
      // CODEC_RASTER scales the still edge (clips use half) — at 512
      // codec CPU dominates scheduling overhead end to end, which is
      // the regime the thread-scaling column is meaningful in
      val rw = sys.env.getOrElse("CODEC_RASTER", "256").toInt
      val cw = rw / 2
      val ids = spark.range(nDocs)
        .select(col("id")).as[Long](Encoders.scalaLong)
      def bigRaster(id: Long, w: Int, h: Int): Array[Byte] =
        Array.tabulate(w * h * 3)(i => ((i * 7 + id * 13) % 256).toByte)
      def bigGray(id: Long, w: Int, h: Int): Array[Byte] =
        Array.tabulate(w * h)(i => ((i * 7 + id * 13) % 256).toByte)
      val codecs: Seq[(String, Long => Array[Byte],
          () => Array[Byte] => Long)] = Seq(
        ("bmp", id => multimodal.Codecs.bmpEncode(rw, rw,
            bigRaster(id, rw, rw)),
          () => { val d = new multimodal.Codecs.BmpDecoder()
            b => d.decode(b).rgb.length.toLong }),
        ("png", id => multimodal.Codecs.pngEncode(rw, rw,
            bigRaster(id, rw, rw)),
          () => { val d = new multimodal.Codecs.PngDecoder()
            b => d.decode(b).rgb.length.toLong }),
        ("gif", id => multimodal.Codecs.gifEncode(rw, rw,
            bigGray(id, rw, rw)),
          () => { val d = new multimodal.Codecs.GifLzwDecoder()
            b => d.decode(b).rgb.length.toLong }),
        ("jpeg", id => multimodal.Jpeg.encodeGray(rw, rw,
            bigGray(id, rw, rw)),
          () => { val d = new multimodal.Jpeg.JpegDecoder()
            b => d.decode(b).rgb.length.toLong }),
        ("tiff", id => multimodal.Codecs.tiffEncode(rw, rw,
            bigRaster(id, rw, rw), packbits = true),
          () => { val d = new multimodal.Codecs.TiffDecoder()
            b => d.decode(b).rgb.length.toLong }),
        ("tiff_lzw", id => multimodal.Codecs.tiffEncodeLzw(rw, rw,
            bigRaster(id, rw, rw)),
          () => { val d = new multimodal.Codecs.TiffDecoder()
            b => d.decode(b).rgb.length.toLong }),
        ("wav", id => multimodal.Codecs.wavEncode(8000,
            Array.tabulate(200000)(i => ((i * 31 + id) % 4096).toShort)),
          () => { val d = new multimodal.Codecs.WavDecoder()
            b => d.decode(b).samples.length.toLong }),
        ("avi", id => multimodal.Codecs.aviEncode(cw, cw, 10,
            (0 until 8).map(f => bigRaster(id + f, cw, cw))),
          () => { val d = new multimodal.Codecs.AviDecoder()
            b => d.decode(b).frames.length.toLong }),
        ("mjpeg", id => multimodal.Jpeg.aviEncodeMjpeg(cw, cw, 10,
            (0 until 8).map(f => multimodal.Jpeg.encodeGray(cw, cw,
              bigGray(id + f, cw, cw)))),
          () => { val d = new multimodal.Jpeg.MjpegAviDecoder()
            b => d.decode(b).frames.length.toLong }),
        ("mp4", id => multimodal.Codecs.mp4EncodeVideo(600, 60, cw, cw,
            (0 until 8).map(f => bigRaster(id + f, cw, cw)),
            moovLast = id % 2 == 0),
          () => { val d = new multimodal.Codecs.Mp4VideoDecoder()
            b => d.decode(b).frames.length.toLong }),
      )
      // raster (decoded-payload) sizes are fixed by the builders:
      // rw x rw x 3 for stills, 8 x cw x cw x 3 for clips, 400 KB PCM
      val rasterBytes: Map[String, Long] = Map(
        "bmp" -> rw.toLong * rw * 3, "png" -> rw.toLong * rw * 3,
        "gif" -> rw.toLong * rw * 3, "jpeg" -> rw.toLong * rw * 3,
        "tiff" -> rw.toLong * rw * 3, "tiff_lzw" -> rw.toLong * rw * 3,
        "wav" -> 400000L, "avi" -> 8L * cw * cw * 3,
        "mjpeg" -> 8L * cw * cw * 3, "mp4" -> 8L * cw * cw * 3)
      for ((fmt, build, mkDec) <- codecs) {
        // single-core decode throughput: pre-built containers, a
        // driver-side decode loop, best of 3 — the per-core number a
        // design review multiplies by the fleet's cores
        val k = 50
        val pre = (0 until k).map(i => build(i.toLong)).toArray
        val preBytes = pre.map(_.length.toLong).sum
        val dec0 = mkDec()
        pre.foreach(dec0) // JIT warm
        val tCore = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          pre.foreach(dec0)
          (System.nanoTime() - t0) / 1e9
        }.min
        // single-core ENCODE+DECODE (the same work unit the
        // distributed pass runs per row) — the honest denominator
        // for the thread-scaling ratio below
        val tCoreEncDec = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          var i = 0
          while (i < k) { dec0(build(i.toLong)); i += 1 }
          (System.nanoTime() - t0) / 1e9
        }.min
        // distributed encode+decode pass (the catalog ops' shape):
        // parallel lower bound over container bytes
        val bytes = ids.mapPartitions(it =>
          it.map(id => build(id).length.toLong))(Encoders.scalaLong)
          .reduce(_ + _)
        val t0 = System.nanoTime()
        ids.mapPartitions { it =>
          val dec = mkDec()
          it.map(id => dec(build(id)))
        }(Encoders.scalaLong).reduce(_ + _)
        val tFull = (System.nanoTime() - t0) / 1e9
        val coreMB = preBytes / 1e6 / tCore
        val coreRasterMB = k * rasterBytes(fmt) / 1e6 / tCore
        val coreEncDecMB = preBytes / 1e6 / tCoreEncDec
        val clusterMB = bytes / 1e6 / tFull
        println(f"PROBE codec_bytes $fmt%-6s n=$nDocs raster=$rw " +
          f"container=${bytes / 1e6}%.0fMB " +
          f"core_dec_MBps=$coreMB%.0f " +
          f"core_raster_MBps=$coreRasterMB%.0f " +
          f"core_encdec_MBps=$coreEncDecMB%.0f " +
          f"cluster_encdec_MBps=$clusterMB%.0f " +
          f"thread_scale=${clusterMB / coreEncDecMB}%.1f")
      }
    }

    println(f"\n${"op"}%-18s ${"k=1"}%8s ${"k=2"}%8s ${"k=4"}%8s  x per doubling")
    ((picked ++ pickedEmb ++ pickedGrid).map(_._1) ++ fanNames)
      .foreach { name =>
        val (t1, t2, t4) =
          (times((name, 1)), times((name, 2)), times((name, 4)))
        val g = math.sqrt(t4 / t1) // geometric mean growth per doubling
        println(f"RATIO $name%-18s $t1%8.2f $t2%8.2f $t4%8.2f  ${g}%.2f")
      }
    spark.stop()
  }
}
