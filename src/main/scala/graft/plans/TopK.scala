package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Grouped top-k as a first-class operator — SURVEY.md §4 ladder (c):
  * a whole-operator semantic Spark lacks, implemented as
  * LogicalPlan + SparkStrategy + physical exec.
  *
  * Spark's only native spelling of "top k rows per key" is
  * Window(row_number) + Filter(rn <= k): every partition is fully
  * sorted (O(n log n)) and materialized before the filter drops almost
  * everything. This operator keeps a bounded heap per key —
  * O(n log k) with memory k rows per key, the difference between a
  * straggling sort and a streaming pass when k << group size at
  * 100 TB. (The same idea Spark applies to GLOBAL top-k via
  * TakeOrderedAndProject, which PlanSpec pins for sort_topk.)
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Grouped top-k, planned TWICE per logical node — a `partial` pass
  * runs map-side before the exchange (top-k is a merge-able monoid,
  * like partial aggregation), so at most k rows per (input partition,
  * key) cross the wire; the final pass runs after the hash exchange
  * and produces the global per-key top-k.
  *
  * Memory safety at high key cardinality (k x distinct-keys heaps
  * cannot be allowed to OOM an executor):
  *  - partial pass: bounded-heap reduction, but the heap map tracks at
  *    most `spark.graft.topk.maxKeysPerPartition` keys (default 1M);
  *    rows of further keys PASS THROUGH unfiltered — always correct,
  *    since the partial pass is only a shuffle-volume reducer.
  *  - final pass: no heaps at all — requires the child sorted by
  *    (keys, order), which Spark satisfies with a spillable SortExec,
  *    then a single streaming scan emits the first k rows per key in
  *    O(1) memory. Input to this sort is already cut to
  *    <= k x inputPartitions rows per key by the partial pass. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** Final pass: all surviving rows of one key must meet in one
    * partition (the planner inserts or reuses the hash exchange).
    * Partial pass: runs wherever the child's rows already are. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  /** Final pass consumes a grouped, rank-ordered stream; the planner
    * plants a (spillable) sort if the child isn't already ordered. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(SortOrder(_, Ascending)) ++ order)

  /** Top-k filtering preserves the child's partitioning — downstream
    * operators keyed on the same columns reuse the exchange. */
  override def outputPartitioning =
    child.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else keys.map(SortOrder(_, Ascending)) ++ order

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    if (partial) {
      val maxKeys = conf.getConfString(
        "spark.graft.topk.maxKeysPerPartition", "1000000").toInt
      child.execute().mapPartitions { it =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val cmp = RowOrdering.create(sortOrder, childOutput)
        // max-heap wrt the requested order: the ordering-greatest
        // (i.e. worst-ranked) row sits on top and is evicted first.
        val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        val heapOrd: Ordering[InternalRow] =
          (a: InternalRow, b: InternalRow) => cmp.compare(a, b)
        def copyRow(r: InternalRow): InternalRow = r match {
          case u: UnsafeRow => u.copy()
          case other => other.copy() // non-codegen children emit generic rows
        }
        val passthrough = it.flatMap { row =>
          val key = keyProj(row)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None if heaps.size < maxKeys =>
              val h = mutable.PriorityQueue.empty(heapOrd)
              heaps.put(key.copy(), h)
              h
            case None => null // over budget: emit unfiltered, final pass filters
          }
          if (heap == null) Iterator.single(row)
          else {
            if (heap.size < limit) heap.enqueue(copyRow(row))
            else if (cmp.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(copyRow(row))
            }
            Iterator.empty
          }
        }
        // ++ evaluates its right side only after the input is drained
        passthrough ++ heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
      }
    } else {
      child.execute().mapPartitions { it =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        var curKey: UnsafeRow = null
        var rank = 0
        it.flatMap { row =>
          val key = keyProj(row)
          if (curKey == null || curKey != key) { curKey = key.copy(); rank = 0 }
          rank += 1
          if (rank <= limit) Iterator.single(row) else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"
}

object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // partial (map-side) pass, then exchange, then final pass
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Builder-time registration (SparkSession.builder.withExtensions /
  * spark.sql.extensions=graft.plans.GraftExtensions); [[TopK.of]]
  * also injects at runtime so driver-built sessions work unchanged. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => GraftStrategy)
    e.injectOptimizerRule(_ => RewriteRowNumberTopK)
  }
}

object TopK {

  /** Top `k` rows per key group under (orderCol, tiebreak asc) —
    * descending on orderCol when `desc`. Keys/order are resolved
    * against `df` so the custom node enters analysis already bound. */
  def of(df: DataFrame, keyCols: Seq[String], orderCol: String,
      desc: Boolean, k: Int, tiebreak: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GraftStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategy
    }
    val keys = keyCols.map(c => Bridge.toExpr(df.col(c)))
    val dir = if (desc) Descending else Ascending
    val order =
      SortOrder(Bridge.toExpr(df.col(orderCol)), dir) +:
        tiebreak.map(c => SortOrder(Bridge.toExpr(df.col(c)), Ascending))
    Bridge.ofRows(spark,
      TopKPerKey(keys, order, k, df.queryExecution.analyzed))
  }
}
