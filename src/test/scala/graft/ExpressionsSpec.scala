package graft

import org.apache.spark.sql.functions._

/** Native codegen expressions (graft.plans) must produce the exact
  * values of the higher-order formulations they replaced — same fold
  * order, same modulus — on the real corpus. */
class ExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("PolyHash == aggregate/split fold on every document") {
    val diff = Tables.documents(spark, sf)
      .select(
        functions.Text.polyHash(col("text")).as("native"),
        functions.Text.polyHashFold(col("text")).as("fold"))
      .filter(col("native") =!= col("fold")).count()
    assert(diff == 0)
  }

  test("DotProduct == aggregate/zip_with fold on every embedding pair sample") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val pairs = e.as("l").join(e.as("r"),
      col("l.vec_id") < col("r.vec_id"))
    val diff = pairs.select(
        functions.Similarity.dot(col("l.embedding"), col("r.embedding")).as("native"),
        functions.Similarity.dotFold(col("l.embedding"), col("r.embedding")).as("fold"))
      .filter(col("native") =!= col("fold")).count()
    assert(diff == 0)
  }

  test("SQL registration: graft_poly_hash / graft_dot callable from spark.sql") {
    plans.GraftFunctions.register(spark)
    val h = spark.sql("SELECT graft_poly_hash('ab') AS h").as[Long].head()
    assert(h == 3105L) // (0*31+97)*31+98
    val d = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(d == 11.0)
  }

  test("SQL aggregates: graft_minhash / graft_simhash64 == API forms") {
    plans.GraftFunctions.register(spark)
    functions.Dedup.tokenCountsOf(Tables.documents(spark, sf))
      .createOrReplaceTempView("v_tok")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash64(h, cnt) AS sig FROM v_tok GROUP BY doc_id")
      .select(col("doc_id"), col("sig")(0), col("sig")(1), col("sig")(2), col("sig")(3))
      .collect().map(_.toString).toSet
    val viaApi = functions.Dedup.simhash64SigOf(
        functions.Dedup.tokenCountsOf(Tables.documents(spark, sf)))
      .collect().map(_.toString).toSet
    assert(viaSql == viaApi && viaApi.nonEmpty)
    val mh = spark.sql(
      "SELECT graft_minhash(h, 8) AS sig FROM v_tok").head.getSeq[Long](0)
    assert(mh.length == 8 && mh.forall(_ >= 0))
  }

  test("PolyHash iterates code points, not UTF-16 units (non-BMP parity)") {
    // U+1F415 DOG is a surrogate pair in UTF-16; DuckDB's
    // unicode(string_split(...)) folds over the single code point
    // 128021, so the Spark side must too — one fold step, not two
    val dog = new String(Character.toChars(0x1F415))
    assert(plans.PolyHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(dog))
      == 128021L % 1000000007L)
    // mixed string: 'a' then the dog — (0*31+97)*31+128021 mod P
    val mixed = "a" + dog
    assert(plans.PolyHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(mixed))
      == (97L * 31 + 128021L) % 1000000007L)
  }

  test("PolyHash participates in whole-stage codegen (no fallback)") {
    val plan = Tables.documents(spark, sf)
      .select(functions.Text.polyHash(col("text")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_poly_hash.*"), plan)
  }

  test("Shingles == array_distinct/transform formulation on every document") {
    val t = "split(text, ' ')"
    val oldForm = expr(
      s"""CASE WHEN size($t) >= 3 THEN
         |  array_distinct(transform(
         |    sequence(0, size($t) - 3),
         |    i -> concat_ws(' ', element_at($t, i + 1),
         |                        element_at($t, i + 2),
         |                        element_at($t, i + 3))))
         |ELSE array() END""".stripMargin)
    val diff = Tables.documents(spark, sf)
      .select(functions.Dedup.shingles("text").as("nat"), oldForm.as("old"))
      .filter(col("nat") =!= col("old")).count()
    assert(diff == 0)
  }

  test("Shingles participates in whole-stage codegen (no fallback)") {
    val plan = Tables.documents(spark, sf)
      .select(functions.Dedup.shingles("text"))
      .queryExecution.executedPlan.toString
    // null-coalesce wrapper sits outside the call in the plan string
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[.*graft_shingles.*"), plan)
  }

  test("DotProduct participates in whole-stage codegen (no fallback)") {
    val plan = Tables.embeddings(spark, sf)
      .select(functions.Similarity.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_dot.*"), plan)
  }
}
