package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions — SURVEY.md §4 "custom work" 2/3.
  *
  * The pure-built-in formulations of these two kernels (higher-order
  * `aggregate` over `zip_with` / `split`) are semantically right but
  * evaluate their lambdas interpreted, outside whole-stage codegen —
  * measured at sf0.1 they dominate the bench (dedup_embedding 26s,
  * dedup_ngram 12s). These replacements generate tight Java loops and
  * compute the exact same values (same fold order, same modulus), so
  * the DuckDB oracles are unchanged.
  */

/** Polynomial rolling hash over a string's code points:
  * fold(acc*31 + codepoint) mod 1e9+7 — identical to the DuckDB
  * list_reduce over unicode(string_split(text,'')) for ALL text:
  * DuckDB's unicode() yields code points, so the Spark side iterates
  * code points too (not UTF-16 units) or emoji/CJK-extension chars
  * would diverge. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val P: Long = 1000000007L

  /** Shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Left-to-right dot product of two double arrays (same accumulation
  * order as aggregate(zip_with(...)) and the oracle's list_reduce). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Distinct n-gram shingles of a token array, first-occurrence order —
  * the native form of
  * array_distinct(transform(sequence(...), i -> concat_ws(' ', ...)))
  * whose lambdas evaluate interpreted (outside codegen) in the dedup
  * staging path. Yields fewer than n tokens -> empty array, matching
  * the CASE guard of the column formulation; values are identical
  * (same join separator, same first-occurrence distinct), so the
  * DuckDB oracles are unchanged. */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    Shingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Shingles.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val SEP = UTF8String.fromString(" ")

  def shingle(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(SEP, parts: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Column-level entry points + SQL registration. */
object GraftFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  def poly_hash(c: Column): Column = Bridge.toColumn(PolyHash(Bridge.toExpr(c)))

  /** Distinct n-gram shingles of a token-array column. Coalesced to
    * an empty array on null input — the contract of the CASE-guarded
    * column formulation this replaces (a bare null-intolerant
    * expression would return NULL for a null doc). */
  def shingles(c: Column, n: Int = 3): Column =
    org.apache.spark.sql.functions.coalesce(
      Bridge.toColumn(Shingles(Bridge.toExpr(c), n)),
      org.apache.spark.sql.functions.array())

  /** Accepts float or double arrays; floats widen losslessly. */
  def dot(a: Column, b: Column): Column =
    Bridge.toColumn(DotProduct(
      Bridge.toExpr(a.cast(ArrayType(DoubleType))),
      Bridge.toExpr(b.cast(ArrayType(DoubleType)))))

  /** Register as SQL functions in a session: scalar graft_poly_hash(s)
    * / graft_dot(a, b), and aggregate graft_minhash(h, k) /
    * graft_simhash64(h, cnt) — the analyzer wraps raw
    * AggregateFunctions returned from the registry itself. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val reg = spark.sessionState.functionRegistry
    // idempotent per session: re-registering emits a "replaced a
    // previously registered function" warning per function per call
    // site (Verify/Bench invoke many queries in one session), so
    // skip when the full set is already present
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(
          "graft_shingles"))) return
    reg.createOrReplaceTempFunction(
      "graft_poly_hash", exprs => PolyHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => MinHashAgg(exprs(0), exprs(1) match {
        case Literal(k: Int, _) => k
        case other => other.eval().toString.toInt // foldable literal
      }), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_simhash64",
      exprs => SimHash64Agg(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_shingles",
      exprs => Shingles(exprs(0), exprs.lift(1) match {
        case Some(Literal(n: Int, _)) => n
        case Some(other) => other.eval().toString.toInt
        case None => 3
      }), "scala_udf")
  }
}
