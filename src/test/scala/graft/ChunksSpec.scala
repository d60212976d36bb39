package graft

import graft.functions.Chunks

/** Fixtures for content-defined chunking, boundary-overlap dedup, and
  * WoE binning (functions/Chunks.scala). Boundary-class tokens were
  * chosen by evaluating the polyhash: "aa" lands in the cut class
  * (polyHash % 8 == 0), "foo"/"bar"/"baz"/"qux"/"stop" do not. */
class ChunksSpec extends SparkSpecBase {
  import spark.implicits._

  test("cdc chunks: cut after boundary token, shared chunk counted across docs") {
    val docs = Seq(
      (1L, "foo bar aa baz qux"),  // chunks: [foo bar aa], [baz qux]
      (2L, "baz qux"))             // chunk:  [baz qux]
      .toDF("doc_id", "text")
    val r = Chunks.dedupCdcChunksOn(docs).collect()
    assert(r.length === 1) // only "baz qux" crosses documents
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4)) === ((2L, 2L, 1L, 2L)))
  }

  test("cdc chunks: a prefix insertion does NOT shift later chunk identities") {
    val docs = Seq(
      (1L, "foo bar aa baz qux"),
      (2L, "baz qux"),
      (3L, "stop foo bar aa baz qux")) // prepended token, same tail chunk
      .toDF("doc_id", "text")
    val r = Chunks.dedupCdcChunksOn(docs).collect()
    assert(r.length === 1)
    assert((r(0).getLong(1), r(0).getLong(2)) === ((3L, 3L)))
  }

  test("boundary overlap: suffix-of-A == prefix-of-B pairs, self excluded") {
    val docs = Seq(
      (1L, "a0 p q r s t u v w"),       // last 8 = p q r s t u v w
      (2L, "p q r s t u v w y z"),      // first 8 = p q r s t u v w
      (3L, "c c c c c c c c"))          // suffix == own prefix -> excluded
      .toDF("doc_id", "text")
    val r = Chunks.dedupBoundaryOverlapOn(docs, k = 8)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq === Seq((1L, 2L)))
  }

  test("woe bins: equal-width binning, exact bad rates and odds ratios") {
    val orders = (Seq.fill(5)(("F", 1.0)) ++ Seq.fill(5)(("O", 1.0)) ++
      Seq.fill(1)(("F", 100.0)) ++ Seq.fill(9)(("O", 100.0)))
      .zipWithIndex
      .map { case ((st, pr), i) => (i.toLong, st, pr) }
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val r = Chunks.featureWoeBinsOn(orders)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(4), x.getLong(5)))
    assert(r.length === 2)
    // bin 0: 10 rows, 5 bad -> rate 500000; OR = 5*14e6/(5*6)
    assert(r(0) === ((0L, 10L, 5L, 500000L, 2333333L)))
    // bin 9: 10 rows, 1 bad -> rate 100000; OR = 1*14e6/(9*6)
    assert(r(1) === ((9L, 10L, 1L, 100000L, 259259L)))
  }

  test("woe bins: all-good corpus yields NULL odds ratios, zero rates") {
    val orders = Seq((1L, "O", 10.0), (2L, "O", 20.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val r = Chunks.featureWoeBinsOn(orders).collect()
    assert(r.forall(_.getLong(4) === 0L))
    assert(r.forall(_.isNullAt(5)))
  }
}
