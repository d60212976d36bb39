package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan quality gates — the properties that make these shapes
  * survive a 100x scale-up. If an optimizer upgrade or a refactor
  * regresses one of these (a lost pushdown, a broadcast that became a
  * shuffle, a sort that swallowed a top-k), this spec fails before the
  * bench does. */
class PlanSpec extends SparkSpecBase {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter_offset pushes its range predicate into the parquet scan") {
    val p = plan(operators.Relational.filterOffset(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), GreaterThanOrEqual(l_orderkey,1000)]"), p)
  }

  test("column pruning: q1_agg reads only the columns it needs") {
    val p = plan(operators.Aggregates.q1Agg(spark, sf))
    assert(p.contains("ReadSchema"), p)
    // the 16-column lineitem scan must not materialize unused columns
    assert(!p.contains("l_comment") && !p.contains("l_partkey"), p)
  }

  test("join_broadcast and join_multiway use BroadcastHashJoin for dims") {
    assert(plan(operators.Joins.joinBroadcast(spark, sf))
      .contains("BroadcastHashJoin"))
    val mw = plan(operators.Joins.joinMultiway(spark, sf))
    assert(mw.contains("BroadcastHashJoin"), mw)
  }

  test("join_semi plans a semi join (only keys cross the wire)") {
    val p = plan(operators.Joins.joinSemi(spark, sf))
    assert(p.contains("LeftSemi"), p)
  }

  test("sort_topk compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan(operators.SortsSets.sortTopk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("join_range broadcasts the interval dim (BroadcastNestedLoopJoin)") {
    val p = plan(operators.Joins.joinRange(spark, sf))
    assert(p.contains("BroadcastNestedLoop"), p)
  }

  test("flagship pipeline: no cartesian product, window agg present") {
    val p = plan(pipeline.Flagship.pipeline(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q1_agg splits into partial (map-side) and final aggregation") {
    // the property that bounds shuffle volume at scale: one partial
    // row per (partition, group) crosses the exchange, not raw rows
    val p = plan(operators.Aggregates.q1Agg(spark, sf))
    assert(p.contains("partial_sum"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("stream_user_sessions: one group exchange + one output-order exchange") {
    val p = plan(streaming.Streaming.streamUserSessions(spark, sf))
    // the session walk itself must add no shuffle beyond its
    // group-by-key; the second exchange is only the deterministic
    // output ordering
    assert("Exchange".r.findAllIn(p).size == 2, p)
    assert(p.contains("MapGroups"), p)
  }

  test("sql_q5 star join: every dim broadcast, fact never shuffles for a join") {
    val p = plan(operators.Analytics.sqlQ5(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 5, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("sql_q18 plans the IN-subquery as a semi join on the aggregated inner") {
    val p = plan(operators.Analytics.sqlQ18(spark, sf))
    assert(p.contains("LeftSemi"), p)
  }

  test("sql_subqueries decorrelates EXISTS into a semi join") {
    val p = plan(operators.Analytics.sqlSubqueries(spark, sf))
    assert(p.contains("LeftSemi"), p)
    // no per-row subquery execution survives in the physical plan
    assert(!p.contains("Subquery"), p)
  }

  test("dedup_simhash64: signature subtree cached, equi-joins only") {
    val p = plan(functions.Dedup.dedupSimhash64(spark, sf))
    // r12: the signature relation itself is checkpointed (one
    // MinHash-style ObjectHashAggregate build, four reads), so the
    // plan's leaves are the materialized signature RDD — the cached
    // token relation now lives inside the checkpoint build instead of
    // appearing as an InMemoryTableScan leaf of every branch
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("ObjectHashAggregate"), p) // sig never rebuilt
    // banding + verification are hash equi-joins, never a cross join
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    // the automatic counterpart to join_salted's manual salting: with
    // cluster-default thresholds scaled to corpus size, AQE detects
    // the oversized event_type partition at runtime and splits it
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of rows share one hot key — the shape salting/AQE exist
      // for. The input is spread over several map tasks first: AQE
      // splits a skewed reduce partition at MAPPER boundaries, so a
      // single-file (single-mapper) input is unsplittable no matter
      // how skewed (exactly the situation at cluster scale, where
      // inputs always have many mappers).
      val skewed = Tables.events(spark, sf)
        .repartition(8)
        .select(col("event_id"),
          when(col("event_id") % 10 === 0,
            concat(lit("t"), col("event_id") % 5))
            .otherwise(lit("hot")).as("k"))
      // dim as a literal relation: an aggregate between the shuffle
      // and the join would break the Sort-over-Shuffle pattern the
      // skew rule rewrites
      import spark.implicits._
      val dim = (("hot", 3) +: (0 until 5).map(i => (s"t$i", 2)))
        .toDF("k", "w")
      val j = skewed.join(dim, "k")
      j.collect() // AQE decides at runtime; read the SAME execution's final plan
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter injects on the probe side of a selective shuffle join") {
    // the 100 TB lever: a selective dim filter becomes a bloom filter
    // evaluated inside the fact scan, discarding rows BEFORE the
    // shuffle. Size thresholds are tuned for clusters, so lower them
    // to demonstrate the rewrite at corpus scale; broadcast is
    // disabled because broadcast joins already prune at the probe.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val fact = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val p = plan(fact.join(dim, col("l_orderkey") === col("o_orderkey")))
      assert(p.contains("might_contain"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("text_decontaminate: one corpus pass, benchmark broadcast, no cross join") {
    val p = plan(functions.Corpus.textDecontaminate(spark, sf))
    // corpus shingles scanned once, benchmark shingles once
    assert("Scan parquet".r.findAllIn(p).size == 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("new TPC-H battery (q2/q8/q9/q11/q12/q15): equi-joins only, " +
    "q2's correlated min decorrelated") {
    val fns: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "q2" -> operators.Analytics.sqlQ2(spark, sf),
      "q8" -> operators.Analytics.sqlQ8(spark, sf),
      "q9" -> operators.Analytics.sqlQ9(spark, sf),
      "q11" -> operators.Analytics.sqlQ11(spark, sf),
      "q12" -> operators.Analytics.sqlQ12(spark, sf),
      "q15" -> operators.Analytics.sqlQ15(spark, sf))
    fns.foreach { case (n, df) =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$n: $p")
    }
    // the correlated per-part MIN becomes an aggregate joined back,
    // not a per-row subquery execution
    assert(!plan(operators.Analytics.sqlQ2(spark, sf))
      .contains("Subquery"), "q2 not decorrelated")
  }

  test("dedup_semantic_clustered: cell equi-join pairs, no all-pairs plan") {
    // the SemDeDup scale claim: pair generation is a hash equi-join on
    // the k-means cell id — never a cartesian/nested-loop all-pairs
    // product, and the (small) cell relation is not broadcast-joined
    // against itself as a nested loop
    val p = plan(functions.Clusters.semanticPairsClusteredOn(
      Tables.embeddings(spark, sf)))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("join_bloom: three broadcast semi probes prune map-side, no cartesian") {
    // the bloom stage must be broadcast semi joins (fact side never
    // shuffles to be pruned) and the exact join a broadcast hash join
    val p = plan(operators.Joins.joinBloom(spark, sf))
    assert("LeftSemi".r.findAllIn(p).size >= 3, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("profile_skew: heavy-key top-k is TakeOrderedAndProject, window bounded by k") {
    val p = plan(functions.Corpus.profileSkew(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("layout ops: pure map arithmetic + bounded aggs, no joins at all") {
    val pz = plan(operators.Layout.layoutZorder(spark, sf))
    assert(!pz.contains("Join"), pz)
    val ps = plan(operators.Layout.layoutSkipping(spark, sf))
    assert(!ps.contains("Join"), ps)
  }

  test("dedup_embedding_lsh: bucket equi-joins only, never a cross product") {
    val p = plan(functions.Dedup.dedupEmbeddingLsh(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("window_dense_ids_scaled: dense ids without a single-partition window") {
    // windowRowNumber's quarantined weakness, solved: the data-bearing
    // exchanges are range partitioning; the only SinglePartition hop
    // is the per-PARTITION offset relation (one row per partition —
    // trivially small at any scale)
    val df = operators.Windows.windowDenseIdsScaled(spark, sf)
    val p = plan(df)
    // no single-partition collapse anywhere: the id assignment is an
    // RDD zipWithIndex over range-partitioned sorted partitions, and
    // the only exchange left in this plan is the output sort
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Window"), p)
    // and the values equal the quarantined global form exactly
    import spark.implicits._
    val scaled = df.select("c_custkey", "file_index")
      .as[(Long, Long)].collect().sorted
    val global = operators.Windows.windowRowNumber(spark, sf)
      .select("c_custkey", "file_index")
      .as[(Long, Long)].collect().sorted
    assert(scaled.sameElements(global) && scaled.nonEmpty)
    // the total-order assumption the op documents: the order key is
    // unique in this corpus
    val docs = Tables.customer(spark, sf)
    assert(docs.select("c_name").distinct().count() == docs.count())
  }

  test("dedup_embedding: the corpus is never broadcast (grid route + shuffle hash join)") {
    // the round-2 spelling broadcast the whole embeddings side — dead
    // at Spark's 8 GB broadcast ceiling. The block-pair shape keeps
    // the corpus in shuffle land: its only BroadcastExchange is the
    // G^2 block-pair grid (a few hundred ints).
    // the library form carries the grid join shape...
    val p = plan(functions.Dedup.dedupEmbeddingOn(
      Tables.embeddings(spark, sf)))
    // the pair join is keyed by the FULL (gi, gj) cell — G^2-way
    // parallelism, not G
    assert(p.contains("ShuffledHashJoin [gi"), p)
    // both sides broadcast only the literal grid (LocalTableScan);
    // every BroadcastExchange in the plan is one of those
    val nBroadcast = "BroadcastExchange".r.findAllIn(p).size
    assert(nBroadcast == "LocalTableScan".r.findAllIn(p).size, p)
    assert(nBroadcast <= 2, p)
    // ...and the catalog form is a pure filter over the memoized
    // checkpointed pair relation: no join, no broadcast at all
    val pc = plan(functions.Dedup.dedupEmbedding(spark, sf))
    assert(pc.contains("Scan ExistingRDD"), pc)
    assert(!pc.contains("BroadcastExchange") && !pc.contains("Join"), pc)
  }

  test("text map-only family: one scan, no shuffle beyond the output sort") {
    // Round-2 bench showed these 3-7x slower than round 1, but the
    // plans never changed: steady-state re-timing (REPS>=4) puts each
    // back at round-1 cost; the inflation was the bench's back-to-back
    // reps landing in the same CPU-steal window (fixed in Bench by
    // round-robin passes). This pin is the plan-level evidence: each
    // query is a single parquet scan + projections, and the ONLY
    // exchange is the range partitioning for the deterministic output
    // order — i.e. embarrassingly parallel at any scale.
    val mapOnly = Seq[(String, DataFrame)](
      "text_tokens" -> functions.Text.textTokens(spark, sf),
      "text_quality" -> functions.Text.textQuality(spark, sf),
      "text_langid" -> functions.Text.textLangid(spark, sf),
      "text_fingerprint" -> functions.Text.textFingerprint(spark, sf),
      "text_split_assign" -> functions.Text.textSplitAssign(spark, sf),
      "text_pii_mask" -> functions.Text.textPiiMask(spark, sf))
    mapOnly.foreach { case (name, df) =>
      val p = plan(df)
      assert("Scan parquet".r.findAllIn(p).size == 1, s"$name: $p")
      assert("Exchange".r.findAllIn(p).size <= 1, s"$name: $p")
      assert(!p.contains("Join") && !p.contains("HashAggregate"),
        s"$name: $p")
    }
  }

  test("text_chunk is map-only: one scan, no join/agg, only the output sort") {
    val p = plan(functions.Text.textChunk(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
  }

  test("merge_upsert: one full-outer equi-join, no cartesian product") {
    val p = plan(operators.Joins.mergeUpsert(spark, sf))
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"), p)
  }

  test("text_lm_score: model joins are hash joins, vocab broadcast, no cartesian") {
    val p = plan(functions.Text.textLmScore(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_incremental prunes candidates inside the join pipeline, " +
    "not at the root") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val opt = functions.Dedup.dedupIncremental(spark, sf)
      .queryExecution.optimizedPlan
    // the batch-membership predicate must sit on the band join (either
    // as a Filter directly over it or folded into a join condition),
    // i.e. old x old candidates die before the verification joins
    val inPipeline = opt.collect {
      case f: Filter if f.condition.sql.contains("% 5") &&
        f.child.isInstanceOf[Join] => f: Any
      case j: Join if j.condition.exists(_.sql.contains("% 5")) => j: Any
    }
    assert(inPipeline.nonEmpty, opt.toString)
  }

  test("dedup_clusters output reads materialized labels, not a re-derivation " +
    "of the whole pair pipeline") {
    val p = plan(functions.Clusters.dedupClusters(spark, sf))
    // converged labels are localCheckpoint-materialized: the output
    // plan starts from the checkpointed RDD (constant size however
    // many rounds ran) and never rescans the corpus
    assert(p.contains("ExistingRDD") || p.contains("LogicalRDD"), p)
    assert(!p.contains("Scan parquet"), p)
  }

  test("sim_knn_join: corpus never broadcast, grid-cell shuffle join, " +
    "no cross-join plan") {
    val p = plan(functions.Similarity.simKnnJoin(spark, sf))
    // the pair join must be the (gi, gj)-keyed shuffle hash join (the
    // only broadcasts in the plan are the tiny grid relation sides)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("Cartesian") && !p.contains("NestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("dedup_substring: dup grams broadcast back, no cartesian, one span sort") {
    val p = plan(functions.Dedup.dedupSubstring(spark, sf))
    // two gram passes (documented: persist/checkpoint between them at
    // 100 TB); the duplicated-gram relation is tiny -> broadcast join
    assert("Scan parquet".r.findAllIn(p).size == 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"), p)
  }

  test("sim_sparse_cosine: postings materialized once, hash joins only, no all-pairs") {
    val p = plan(functions.Similarity.simSparseCosine(spark, sf))
    // the four consumers (pair sides + two norm lookups) must read the
    // checkpointed postings, not re-run the shingle scan per branch
    assert(p.contains("ExistingRDD"), p)
    assert(!p.contains("Scan parquet"), p)
    // inverted-index join: every join is keyed (hs or doc id) — a
    // cartesian/nested-loop node would mean an all-pairs fallback
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"), p)
    // pair aggregation is partial+final (map-side combine on doc pairs)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("dedup_substring_apply: doc-keyed rewrite, no cartesian, no global sort before agg") {
    val p = plan(functions.Dedup.dedupSubstringApply(spark, sf))
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"), p)
    // the span find's orderBy must be eliminated under the join
    // (EliminateSorts): exactly the final dump sort survives
    assert("Sort \\[doc_id".r.findAllIn(p).size <= 2, p)
  }

  test("corpus_dsir: bucket model broadcast back, top-N is TakeOrdered, no window") {
    val p = plan(functions.Corpus.corpusDsir(spark, sf))
    // scoring joins the bucket-bounded model as a broadcast; the final
    // cut must be TakeOrderedAndProject, never a global-order window
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
    // the only non-equi joins are the broadcast-of-scalar totals (the
    // sanctioned 1-row cross pattern); a cartesian product would mean
    // the model stopped being bucket-keyed
    assert(!p.contains("Cartesian"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
  }

  test("sim_ann_pq: codes and distance tables broadcast, no raw-vector join at query time") {
    val p = plan(functions.Similarity.simAnnPq(spark, sf))
    // ADC scan side: codes join the broadcast distance table — the
    // original embedding relation must not appear in the probe join
    // (it is only read inside the checkpointed training subtrees)
    assert(p.contains("ExistingRDD"), p)
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"), p)
  }

  test("feat_pca_scatter: map-only outer products, means broadcast, no row-keyed join") {
    val p = plan(functions.Signals.featPcaScatter(spark, sf))
    // per-row explode + partial agg: the only join is the 1-row means
    // broadcast; a vec_id-keyed self-join would shuffle row data
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("Cartesian"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(p.contains("Generate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("join_interval_overlap: bucket equi-join, no cartesian, no distinct for dedup") {
    val p = plan(operators.Joins.joinIntervalOverlap(spark, sf))
    // the non-equi overlap predicate rides on the bucket equi-join;
    // exactly-once comes from the first-shared-bin filter, never a
    // dedup aggregate
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"), p)
    assert(!p.toLowerCase.contains("distinct"), p)
    assert(p.contains("Generate"), p)
  }

  test("sim_maxsim: query side broadcast, one corpus probe pass, bounded aggs") {
    val p = plan(functions.Similarity.simMaxsim(spark, sf))
    // the multi-vector query broadcasts (BNLJ with broadcast build is
    // the sanctioned probe shape, cf. sim_topk); the corpus is never
    // the build side and never cartesian-joined against itself
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Cartesian") && !p.contains("SortMergeJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("profile_drift: bin-keyed tiny relations only, no row-keyed shuffle join") {
    val p = plan(functions.Corpus.profileDrift(spark, sf))
    assert(!p.contains("Cartesian"), p)
    // only the 1-row totals ride a broadcast nested loop
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Window"), p)
  }

  test("er_pipeline: rank-window blocking keeps every join equi-keyed; " +
    "levenshtein runs map-side on candidates, never a name cross-join") {
    val p = plan(functions.Clusters.erPairsOn(
      Tables.customer(spark, sf).select(col("c_custkey").as("rid"),
        col("c_name").as("name"), col("c_nationkey").as("grp"))))
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"), p)
    assert(p.contains("levenshtein"), p)
  }

  test("graph_projection: rank cut collapses to WindowGroupLimit, wedge join equi-keyed") {
    val p = plan(functions.Clusters.graphProjection(spark, sf))
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"), p)
  }

  test("quality_audit: every constraint in ONE scan, partial+final agg, no Expand") {
    val p = plan(functions.Corpus.qualityAudit(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join") && !p.contains("Expand"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("sample_domain_cap: rank limit pushed map-side (partial WindowGroupLimit " +
    "before the source exchange)") {
    val p = plan(functions.Corpus.sampleDomainCap(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    // Spark's rank-limit pushdown plans the cap as partial+final
    // WindowGroupLimit: a mega-domain ships at most cap rows per input
    // partition into the window shuffle — the two-phase shape the
    // scaladoc's 100 TB note describes, enforced by the optimizer
    assert("WindowGroupLimit".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Join"), p)
  }

  test("scd2_intervals: both windows share ONE user_id shuffle") {
    val p = plan(operators.Events.scd2Intervals(spark, sf))
    // lag-filter and lead-intervals use the same (user_id; ts,
    // event_id) spec, so the planner must fuse them onto a single
    // hash exchange — the only other exchange is the output ordering
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1, p)
  }

  test("event_funnel: one corpus scan, partial-aggregated user rollup") {
    val p = plan(operators.Events.eventFunnel(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_min"), p) // first-touch mins combine map-side
    assert(!p.contains("Join"), p)
  }

  test("event_retention / ts_gapfill / graph_triangles: equi-joins only, " +
    "no cross product") {
    Seq(operators.Events.eventRetention(spark, sf),
      operators.Events.tsGapfill(spark, sf),
      functions.Clusters.graphTriangles(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("Cartesian"), p)
    }
    // retention reads the fact table exactly once (cohort is a window
    // min, not a groupBy+self-join that would re-execute the scan)
    val r = plan(operators.Events.eventRetention(spark, sf))
    assert("Scan parquet".r.findAllIn(r).size == 1, r)
    // gap-fill's three consumers (daily/span/types) all read the
    // pre-materialized daily aggregate — zero parquet rescans; the
    // spine cross join rides the broadcast 1-row span
    val g = plan(operators.Events.tsGapfill(spark, sf))
    assert("Scan parquet".r.findAllIn(g).size == 0, g)
    assert(!g.contains("CartesianProduct"), g)
    assert(g.contains("Window"), g)
  }

  test("text_tfidf: single corpus scan (df via window over tf, not a self-join rescan)") {
    val p = plan(functions.Text.textTfidf(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 2, p) // corpus + broadcast N
    assert(p.contains("Window"), p)
  }

  test("text_keywords: rank-then-filter optimizes to WindowGroupLimit " +
    "(partial top-3 per doc before the shuffle)") {
    val p = plan(functions.Text.textKeywords(spark, sf))
    assert(p.contains("WindowGroupLimit"), p)
    // correctness of the cut: every doc contributes at most 3 rows,
    // ranks are 1..k, and scores never increase within a doc
    import spark.implicits._
    val k = functions.Text.textKeywords(spark, sf)
      .select("doc_id", "rk", "tfidf").as[(Long, Int, Double)].collect()
    val perDoc = k.groupBy(_._1)
    assert(perDoc.values.forall(_.length <= 3))
    assert(perDoc.values.forall(rows =>
      rows.sortBy(_._2).map(_._3).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true
      }))
  }

  test("approx quantiles stay within 2% of exact percentiles on the corpus") {
    import spark.implicits._
    val q = operators.Aggregates.aggApproxQuantileRaw(spark, sf)
      .select(col("l_returnflag"),
        col("approx_p50").cast("double"), col("approx_p95").cast("double"),
        col("exact_p50"), col("exact_p95"))
      .as[(String, Double, Double, Double, Double)].collect()
    assert(q.nonEmpty)
    q.foreach { case (k, a50, a95, p50, p95) =>
      assert(math.abs(a50 - p50) <= 0.02 * p50, s"$k p50: $a50 vs $p50")
      assert(math.abs(a95 - p95) <= 0.02 * p95, s"$k p95: $a95 vs $p95")
    }
    // the catalog (hash-checked) form must report every flag true
    val flags = operators.Aggregates.aggApproxQuantile(spark, sf)
      .select("p50_in_bound", "p95_in_bound").as[(Boolean, Boolean)]
      .collect()
    assert(flags.nonEmpty && flags.forall(f => f._1 && f._2))
  }

  test("approx_count_distinct stays within 15% of exact on the corpus") {
    import spark.implicits._
    val rows = operators.Aggregates.aggApproxDistinctRaw(spark, sf)
      .select("approx_users", "exact_users").as[(Long, Long)].collect()
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.15).toLong),
        s"approx=$approx exact=$exact")
    }
  }

  test("text_heavy_hitters: sketch shuffles k slots; recount joins broadcast") {
    val p = plan(functions.Text.heavyHitters(spark, sf))
    // pass 1: the MG sketch is a partial+final ObjectHashAggregate —
    // the shuffle carries one k-slot sketch per partition, never the
    // vocabulary
    assert(p.contains("graft_misra_gries"), p)
    assert(p.contains("ObjectHashAggregate"), p)
    // pass 2: candidates come back as a broadcast; the recount's join
    // must not shuffle the token stream
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("align_bitext: grid route, no cross join, corpus never broadcast") {
    val p = plan(functions.Similarity.alignBitext(spark, sf))
    // the source-target pair join is keyed by the full (gi, gj) cell
    assert(p.contains("ShuffledHashJoin [gi"), p)
    assert(!p.contains("CartesianProduct"), p)
    // only the literal grid broadcasts (LocalTableScan sources) —
    // <= because the planner may reuse one grid broadcast for both
    // sides; a corpus-side broadcast would exceed the grid count
    val nBroadcast = "BroadcastExchange".r.findAllIn(p).size
    assert(nBroadcast <= "LocalTableScan".r.findAllIn(p).size, p)
    assert(nBroadcast >= 1, p)
  }

  test("feat_project is a pure scan: ZERO exchanges of any kind") {
    // the LIBRARY form — the catalog wrapper's orderBy is the dump
    // contract, not part of the operator
    val p = plan(functions.Signals.featProjectOn(
      Tables.embeddings(spark, sf)))
    assert(!p.contains("Exchange"), p)
  }

  test("agg_histogram_eqdepth bins without a window (no global NTILE)") {
    val p = plan(operators.Aggregates.aggHistogramEqdepth(spark, sf))
    assert(!p.contains("WindowExec"), p)
    // the 1-row bounds relation reaches the scan as a broadcast
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
  }

  test("sorted-neighborhood candidates: equi-join on rank, no " +
    "cartesian, no quadratic self-join") {
    val p = plan(functions.Dedup.dedupSortedNeighborhood(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("graph_neighbor_jaccard: wedge equi-join only, never all pairs") {
    val p = plan(functions.Clusters.graphNeighborJaccard(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("text_countmin: the sketch aggregate is partial (map-side " +
    "combine) so only the D*W grid crosses the shuffle") {
    val cms = functions.Text.textCountminOn(
      Tables.documents(spark, sf)).queryExecution.executedPlan.toString
    // partial + final pairs: the cell aggregate must show both modes
    assert("HashAggregate".r.findAllIn(cms).size >= 4, cms)
    assert(!cms.contains("CartesianProduct"), cms)
  }

  test("event_paths: depth cap becomes WindowGroupLimit before the " +
    "path shuffle") {
    val p = plan(operators.Events.eventPaths(spark, sf))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("sim_ann_ivf_multiprobe: probe relation broadcasts, cell equi-join, " +
    "no cartesian") {
    val p = plan(functions.Similarity.simAnnIvfMultiprobe(spark, sf))
    // the (query x NPROBE) probe side is the broadcast build; the
    // corpus joins it on the cell equi-key — never a cross product
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("mm_phash_dedup: banding candidates come from an equi-join, the " +
    "verify join is (pair, bit)-keyed — no cartesian anywhere") {
    val p = plan(multimodal.Multimodal.mmPhashDedup(spark, sf))
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoopJoin"), p)
    // signature banding and hamming verification are hash equi-joins
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin)".r
      .findAllIn(p).nonEmpty, p)
  }

  test("sim_rerank_mmr: greedy rounds operate on checkpointed pool-sized " +
    "relations — the corpus probe scan appears ONCE, not once per round") {
    val df = functions.Similarity.simRerankMmr(spark, sf)
    val p = plan(df)
    // after the pool/sims localCheckpoints, the final plan must not
    // re-derive the embeddings parquet scan per greedy round: at most
    // one residual scan of the embeddings table may survive
    assert("embeddings" .r.findAllIn(p.toLowerCase).size <= 1, p)
    assert(!p.contains("Cartesian"), p)
  }

  // ---- round-7 shapes ----

  test("sim_ann_graph: the final stage is one beam-partitioned window " +
    "over the checkpointed beam — rounds materialize, nothing re-derives") {
    // the per-round joins live BEHIND localCheckpoints (each round
    // materializes so the plan stays constant-size); what must hold
    // at the root is: no cartesian, a qid-partitioned rank window,
    // and a checkpoint scan (LogicalRDD) as the source
    val p = plan(functions.Similarity.simAnnGraph(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    // and ONE round's expansion shape, un-checkpointed: both the
    // edge expansion and the scoring joins are equi-joins
    val e = Tables.embeddings(spark, sf).limit(50)
    val edges = functions.Similarity.simKnnJoinOn(e, k = 2)
      .select("qid", "nid")
    val pr = plan(functions.Similarity
      .simAnnGraphOn(e, edges, rounds = 1, beam = 8, seeds = 4, k = 3))
    assert(!pr.contains("CartesianProduct"), pr)
  }

  test("lm_kneser_ney: continuation lookups are LEFT equi-joins; only " +
    "the 1-row bigram-type total crosses as a broadcast") {
    val p = plan(functions.Lm.lmKneserNey(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("event_mannwhitney / event_ks: the cents-domain prefix sweep is " +
    "bucketed — the only single-partition exchange is the final scalar " +
    "reduce (partial agg child), never a sort or window") {
    for (df <- Seq(operators.Events.eventMannwhitney(spark, sf),
        operators.Events.eventKs(spark, sf))) {
      val p = plan(df)
      val lines = p.split("\n")
      lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
        .foreach { case (_, i) =>
          assert(i + 1 < lines.length && lines(i + 1).contains("partial_"),
            s"SinglePartition exchange not a scalar reduce at line $i:\n$p")
        }
      assert(!p.contains("Cartesian"), p)
      // every window is partitioned (bk / sbk) — no global sort
      lines.filter(_.trim.startsWith("Window ")).foreach { l =>
        assert(l.contains("bk#"), s"unpartitioned window: $l")
      }
    }
  }

  test("lm_ngram_backoff: count lookups are equi-joins; only the 1-row N " +
    "relation crosses as a broadcast") {
    // the catalog wrapper returns the memoized localCheckpoint (a
    // bare scan) — pin the plan of the underlying builder instead
    val p = plan(functions.Lm.lmNgramBackoffOn(
      Tables.documents(spark, sf).withColumn("bucket",
        functions.Text.polyHash(col("text")) % 100),
      col("bucket") < 80))
    // five count-table lookups, all hash equi-joins
    assert(!p.contains("Cartesian"), p)
    // the single BNLJ-able relation is the broadcast 1-row token total
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin)".r
      .findAllIn(p).nonEmpty, p)
  }

  test("dedup_paragraph: chunking is map-only (no shuffle before the " +
    "hash-keyed first-occurrence window)") {
    val p = plan(functions.Dedup.dedupParagraph(spark, sf))
    // one window over h, one per-doc aggregate: exactly the exchanges
    // keyed by real data — and no join anywhere (election is a window)
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("sketch_theta: the KMV aggregate is partial (map-side sketch " +
    "buffers), merged — never a distinct-shuffle of raw hashes") {
    val p = plan(functions.Sketches.sketchTheta(spark, sf))
    assert(p.contains("graft_kmv"), p)
    // partial + final aggregate pair for the sketch build
    assert("partial_graft_kmv|partial".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("Cartesian"), p)
  }

  test("sim_hard_negatives: label filter rides the broadcast probe join, " +
    "before the per-query top-k window") {
    val p = plan(functions.Similarity.simHardNegatives(spark, sf))
    // broadcast nested loop IS the probe scan (disequality predicate);
    // the top-k is a window with running WindowGroupLimit, not a sort+limit
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit") || p.contains("Window"), p)
  }

  test("privacy_kanon: both ladder levels share the segment-prefixed " +
    "shuffle keys; no join anywhere") {
    val p = plan(functions.Privacy.privacyKanon(spark, sf))
    assert(!p.contains("Join"), p)
    assert("Window".r.findAllIn(p).size >= 1, p)
  }

  test("event_markov_stationary: every power-iteration round joins the " +
    "checkpointed 25-row matrix — no fact re-scan per round") {
    val p = plan(operators.Events.eventMarkovStationary(spark, sf))
    // after localCheckpoints only the emp-share branch may scan events
    assert("events\\.parquet".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("Cartesian"), p)
  }

  test("mm_scene_cuts: lag, cut flag and running segment id share ONE " +
    "doc-keyed window partitioning") {
    val p = plan(multimodal.Multimodal.mmSceneCuts(spark, sf))
    // both window functions hang off the same hashpartitioning(doc_id)
    assert("hashpartitioning\\(doc_id".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("Join"), p)
  }

  test("layout_hilbert: the 8 unrolled bit-levels are map-side — only " +
    "the stats aggregate and the output sort exchange") {
    val p = plan(operators.Layout.layoutHilbert(spark, sf))
    assert(!p.contains("Join") && !p.contains("Window"), p)
    // map-only curve math: file-keyed agg + output range sort, nothing else
    assert("Exchange".r.findAllIn(p).size == 2, p)
    assert(p.contains("partial_count"), p) // map-side combine survives
  }

  test("stream_cdc_replay: rank and change count share one user_id " +
    "shuffle — a single exchange in the whole plan") {
    val p = plan(streaming.Streaming.streamCdcReplay(spark, sf))
    // one hashpartitioning(user_id) exchange + the output sort
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("Join"), p)
  }

  test("sample_kcenter: rounds run on checkpointed relations — the " +
    "embeddings scan does not multiply with k") {
    val p = plan(functions.Similarity.sampleKcenter(spark, sf))
    assert("embeddings".r.findAllIn(p.toLowerCase).size <= 1, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("join_fuzzy: deletion-variant blocking is an equi-join — no " +
    "cartesian levenshtein scan in the plan") {
    val p = plan(functions.Fuzzy.joinFuzzy(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("text_rake: top-3 rank collapses to WindowGroupLimit; word " +
    "scores broadcast back over the phrase rows") {
    val p = plan(functions.Fuzzy.textRake(spark, sf))
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("feature_target_encode: group sums and prior join as broadcasts, " +
    "one orders scan in the encode pass") {
    val p = plan(operators.Inference.featureTargetEncode(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("event_pattern_match: three chained windows share ONE user_id " +
    "exchange — no per-window reshuffle") {
    val p = plan(operators.Events.eventPatternMatch(spark, sf))
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("event_psm_att: nearest-join is the documented broadcast " +
    "nested-loop over the COLLAPSED score relation") {
    val p = plan(operators.Inference.eventPsmAtt(spark, sf))
    assert(p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("join_scd2_pit: versions and facts share the user_id exchange; " +
    "the interval probe is user-keyed, never a cross join") {
    val p = plan(functions.Curation.joinScd2Pit(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("corpus_skyline: the exact dominance pass is a broadcast " +
    "nested-loop ANTI join over checkpointed candidates only") {
    // the grid-prune stage sits behind the candidate localCheckpoint;
    // the visible plan is exactly the candidate-vs-candidate anti join
    val p = plan(operators.Inference.corpusSkyline(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, LeftAnti"), p)
  }

  test("event_concurrency: the sweep is the two-phase prefix sum — " +
    "no single-partition exchange anywhere in the plan") {
    val p = plan(operators.Planning.eventConcurrency(spark, sf))
    assert(!p.contains("Exchange SinglePartition"), p)
    // local sweep runs under the (d, h) bucket key
    assert(p.contains("hashpartitioning(d"), p)
  }

  test("ts_xcorr: the lag fan-out is a broadcast over the calendar-" +
    "bounded series — no cartesian product, no shuffle of the spine " +
    "per lag") {
    val p = plan(operators.Planning.tsXcorr(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("event_power: after the user rollup everything is single-row " +
    "broadcast algebra — no cartesian product") {
    val p = plan(operators.Planning.eventPower(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("graph_random_walk: every step is (node, rank) equi-join " +
    "algebra — no nested-loop or cartesian expansion of adjacency") {
    val p = plan(functions.Clusters.graphRandomWalk(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("graph_node2vec_walk: classify is a LEFT equi-join on " +
    "(prev, dst) and the draw is window algebra — no nested-loop " +
    "or cartesian step") {
    val p = plan(functions.Clusters.graphNode2vecWalk(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("corpus_token_budget: single-partition exchanges are only the " +
    "score histogram and the 1-row budget total; the in-bin take is " +
    "keyed by score") {
    // both allowed single-partition spans are bounded relations: the
    // <=1001-row ttr histogram and the scalar sum(toks) reduction
    val p = plan(functions.Corpus.corpusTokenBudget(spark, sf))
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 2, p)
    assert(p.contains("hashpartitioning(ttr_milli"), p)
  }

  test("mm_audio_vad: the speech filter runs before the hangover " +
    "window's doc_id exchange — only voiced frames shuffle — and " +
    "the whole op is one window pass plus one rollup") {
    val p = plan(multimodal.Multimodal.mmAudioVad(spark, sf))
    assert(p.contains("hashpartitioning(doc_id"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    // two Window operators max (lag's [-1,-1] frame and the running
    // sum can't share one WindowExec) but they share the exchange
    assert("(?m)^.*Window \\[".r.findAllIn(p).size <= 2, p)
    // the energy threshold is evaluated pre-shuffle: the >= 40 filter
    // sits BELOW (deeper than) the doc_id exchange in the plan text
    val ex = p.indexOf("Exchange hashpartitioning(doc_id")
    val fi = p.indexOf(">= 40")
    assert(ex >= 0 && fi > ex, p)
  }

  test("quality_threshold_sweep: suffix counts ride the bucketed " +
    "prefix sweep — the only single-partition hops are the 1-row " +
    "totals broadcast and the bounded super-bucket relations") {
    val p = plan(functions.Text.qualityThresholdSweep(spark, sf))
    // distinct-score relation is bucketed by the sweep keys, never
    // globally sorted on one partition
    assert(p.contains("hashpartitioning(bk") ||
      p.contains("hashpartitioning(cents"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("privacy_dp_quantile: both sweeps ride the bucketed prefix — " +
    "the only single-partition hops are bounded (1-row totals and " +
    "the super-bucket relations), draw and totals broadcast") {
    val p = plan(functions.Privacy.privacyDpQuantile(spark, sf))
    assert(p.contains("hashpartitioning(bk") ||
      p.contains("hashpartitioning(cents"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("graph_betweenness: forward sigma rounds and the shortest-path " +
    "DAG are equi-joins — no cartesian or nested-loop step anywhere") {
    val p = plan(functions.Clusters.graphBetweenness(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("corpus_pipeline_full: the capstone's funnel joins are all " +
    "equi-joins on doc_id and the stage relations arrive as memoized " +
    "checkpoint scans — no cartesian beyond the sanctioned 1-row " +
    "broadcast, no single-partition exchange") {
    val p = plan(functions.Corpus.corpusPipelineFull(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // every nested-loop join is a sanctioned 1-row broadcast cross:
    // the capstone's own wsum/nf_total scalar plus the weight
    // broadcasts nested inside the printed logreg cache lineage
    assert(p.split("BroadcastNestedLoopJoin").length ==
      p.split("BroadcastNestedLoopJoin BuildRight, Cross").length, p)
    // the funnel itself joins on doc_id/lang — equi-join shuffles
    assert(p.contains("SortMergeJoin [doc_id") ||
      p.contains("ShuffledHashJoin [doc_id"), p)
    // the clean/near stage relations ride checkpointed scans, so the
    // pii-mask + quality + sha256 chain appears ZERO times in the
    // executed plan (it ran once at build time)
    assert(!p.contains("sha2"), p)
  }

  test("mm_pipeline_full: ONE decode pass feeds the whole funnel — " +
    "no cartesian, no join at all (the stages chain through windows " +
    "over the decoded relation), exactly two window operators " +
    "(dedup identity + pack prefix-sum), and the quarantined rows' " +
    "status-keyed salt appears in the dedup partition key") {
    val p = plan(multimodal.Multimodal.mmPipelineFull(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("BroadcastHashJoin"), p)
    // the decode mapPartitions appears exactly once: the stages read
    // ONE pass, never re-derive it
    assert(p.split("MapPartitions").length - 1 == 1, p)
    assert(p.split("Window").length - 1 == 2, p)
    // the anti-skew salt: quarantined rows window per doc_id
    assert(p.contains("CASE WHEN (status"), p)
  }

  test("ref_pipeline_e2e: ONE decode/transcode/EP3 pass feeds the " +
    "whole capstone — no join anywhere (the EP2 catalog merge is the " +
    "one deliberate global window over slim catalog columns), the " +
    "decode mapPartitions appears exactly once, one window, one " +
    "generate (the sample explode)") {
    val p = plan(multimodal.Multimodal.refPipelineE2e(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("BroadcastHashJoin")
      && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.split("MapPartitions").length - 1 == 1, p)
    assert(p.split("Window").length - 1 == 1, p)
    assert(p.split("Generate").length - 1 == 1, p)
  }

  test("quality_ece: one scan into a <=10-row rollup; the ECE scalar " +
    "rides a broadcast, not a cartesian product") {
    val p = plan(functions.Text.qualityEce(spark, sf))
    assert(p.contains("hashpartitioning(bin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("graph_cc_incremental: both CC passes and the contraction are " +
    "equi-joins off checkpointed relations — no cartesian") {
    val p = plan(functions.Clusters.graphCcIncremental(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("cluster_linkage_ladder: the rung census rides the ONE " +
    "checkpointed stencil edge relation — no cartesian beyond the " +
    "broadcast 1-row n_points scalar") {
    val p = plan(functions.Clusters.clusterLinkageLadder(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("anomaly_lof: no cartesian anywhere — the neighbor join is " +
    "cell-keyed behind its checkpoint, every downstream pass is a " +
    "qid/nid equi-join on the checkpointed eps-edge relation") {
    val p = plan(functions.Clusters.anomalyLof(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("cluster_dbscan: no cartesian anywhere — the neighbor join is " +
    "cell-keyed behind its checkpoint and the final spine joins are " +
    "vec_id equi-joins") {
    val p = plan(functions.Clusters.clusterDbscan(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("vec_id"), p)
  }

  test("ts_holt: the daily rollup is pre-materialized (zero parquet " +
    "rescans); the spine cross join rides the broadcast 1-row span; " +
    "the fold is a type-keyed sort_array(collect_list) — no " +
    "cartesian, no row-count-scaled window") {
    val p = plan(operators.Events.tsHolt(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(p).size == 0, p) // daily pre-materialized
    assert(p.contains("collect_list"), p)
  }

  test("event_seq_patterns: occurrence relation pre-materialized " +
    "(zero parquet rescans), user-keyed equi-joins only, the n_users " +
    "scalar rides a broadcast — no cartesian blow-up") {
    val p = plan(operators.Events.eventSeqPatterns(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(p).size == 0, p)
    assert(p.contains("user_id"), p)
  }

  test("event_shapley: the user-keyed rollup is materialized behind " +
    "the lattice checkpoint; downstream the lattice algebra rides " +
    "broadcasts only — no cartesian, no row-keyed exchange") {
    val p = plan(operators.Events.eventShapley(spark, sf))
    // both term sides + exposure read the checkpointed <=2^n lattice
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("hashpartitioning(user_id"), p)
  }

  test("dq_rules: the seven row rules fold into ONE lineitem scan " +
    "(one more for the fk probe — exactly two scans total); the " +
    "rule fan-out is a broadcast crossJoin, never an exchange of " +
    "the fact") {
    val p = plan(operators.Planning.dqRules(spark, sf))
    assert("Scan parquet .*lineitem".r.findAllIn(p).size == 2, p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("graph_truss: the fixpoint readout rides the checkpointed " +
    "edge relation — node/edge-keyed equi-joins only, no cartesian, " +
    "no parquet rescans") {
    val p = plan(functions.Clusters.graphTruss(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert("Scan parquet".r.findAllIn(p).size == 0, p)
  }

  test("event_stickiness: both rollups are day-keyed off the " +
    "checkpointed incidence; the 30x expansion explodes the " +
    "collapsed relation, not raw events — no cartesian") {
    val p = plan(operators.Planning.eventStickiness(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert("Scan parquet".r.findAllIn(p).size == 0, p)
    assert(p.toLowerCase.contains("explode"), p)
  }

  test("event_market_basket: singles and the user total cross as " +
    "broadcasts; the pair join is user-keyed off the checkpointed " +
    "incidence — no cartesian") {
    val p = plan(operators.Planning.eventMarketBasket(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert("Scan parquet".r.findAllIn(p).size == 0, p)
  }

  test("cluster_purity_eval and stream_static_join: dim/label sides " +
    "broadcast, fact side never exchanged by the join") {
    val pe = plan(functions.Similarity.clusterPurityEval(spark, sf))
    assert(!pe.contains("CartesianProduct"), pe)
    val sj = plan(streaming.Streaming.streamStaticJoin(spark, sf))
    assert(sj.contains("BroadcastHashJoin"), sj)
    assert(!sj.contains("SortMergeJoin"), sj)
  }
}
