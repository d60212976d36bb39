package graft

import org.apache.spark.sql.types._

/** Corpus-shape canary (FIXTURES.md §A): loads all ten driver tables
  * from sf0.001 and asserts the engine-side schema contract in ONE
  * named place. The driver regenerates /root/testdata between rounds
  * and has already changed an on-disk encoding once (events.ts:
  * INT64 nanos → timestamp[us], round 5) — when that happens again,
  * this suite fails with the table and column spelled out instead of
  * 49 scattered AnalysisExceptions.
  *
  * `Tables.events` must normalize EITHER accepted ts encoding to
  * TimestampType; both paths are covered — the current corpus's shape
  * here, the ns-long shape against a staged fixture.
  */
class CorpusCanarySpec extends SparkSpecBase {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  // TIMESTAMP vs TIMESTAMP_NTZ both work for the date columns (session
  // tz pinned UTC everywhere; DuckDB reads both as naive) — the corpus
  // has already shipped each. Fold them together so the canary fails
  // only on drift that would actually break queries.
  private def norm(dt: DataType): DataType = dt match {
    case TimestampNTZType => TimestampType
    case ArrayType(e, _)  => ArrayType(norm(e))
    case other            => other
  }

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"canary: $table matches the FIXTURES.md §A contract") {
      val schema = Tables.load(spark, sf, table).schema
      val got = schema.fields.map(f => f.name -> norm(f.dataType)).toSeq
      val want = cols.map { case (n, t) => n -> norm(t) }
      assert(got == want,
        s"\nDRIVER CORPUS RESHAPED: $table schema drifted from " +
          s"FIXTURES.md §A.\n  expected: $want\n  got:      $got")
      assert(Tables.load(spark, sf, table).count() > 0)
    }
  }

  test("canary: events normalizes to TimestampType through Tables.events") {
    val ev = Tables.events(spark, sf)
    val got = ev.schema.fields.map(f => f.name -> f.dataType).toSeq
    val want = Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType)
    assert(got == want,
      s"\nDRIVER CORPUS RESHAPED: events (post-loader) drifted." +
        s"\n  expected: $want\n  got:      $got")
    assert(ev.count() > 0)
    // The raw on-disk encoding must be one of the two accepted shapes
    // (third shapes throw in Tables.events with a pointed message).
    val raw = Tables.load(spark, sf, "events").schema("ts").dataType
    assert(raw == LongType || raw == TimestampNTZType || raw == TimestampType,
      s"events.ts raw parquet type $raw is a NEW encoding — extend Tables.events")
    // Sanity: values landed in the documented 2024-01 window, not 1970
    // (a silently-wrong unit conversion shifts epochs by 1000x).
    import org.apache.spark.sql.functions._
    val yr = ev.agg(min(year(col("ts"))), max(year(col("ts"))))
      .head(); assert(yr.getInt(0) >= 2000 && yr.getInt(1) <= 2100,
      s"events.ts decoded outside a plausible epoch: $yr — unit bug")
  }

  test("canary: legacy INT64-nanos events fixture still loads (both paths covered)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_ns_events")
    // Stage a tiny events.parquet in the OLD encoding: physical INT64
    // nanos column named ts (read back as LongType under nanosAsLong —
    // a plain long column exercises the same LongType loader branch).
    val micros = Tables.events(spark, sf).limit(50)
      .withColumn("ts", unix_micros(col("ts")) * lit(1000L)) // ns long
    micros.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val back = Tables.events(spark, dir.toString)
    assert(back.schema("ts").dataType == TimestampType)
    val expectedTs = Tables.events(spark, sf).limit(50)
      .select("event_id", "ts").collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val roundTrip = back.select("event_id", "ts").collect()
    assert(roundTrip.forall(r => expectedTs(r.getLong(0)) == r.getTimestamp(1)),
      "ns-long loader branch changed ts values")
  }
}
