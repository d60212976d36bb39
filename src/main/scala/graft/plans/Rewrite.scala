package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, ExprId, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule — SURVEY.md §4 ladder (c), the `Rule[LogicalPlan]`
  * tier: rewrites the idiomatic grouped-top-k spelling
  *
  *   df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *     .filter($"rn" <= k).drop("rn")
  *
  * into the bounded-heap [[TopKPerKey]] operator, automatically. Fires
  * only when: row_number is the window's sole expression, the filter
  * bound is a positive literal, and nothing above the filter
  * references the rank column (the custom exec doesn't emit it).
  * Registered via [[Graft.enable]] (runtime) or [[GraftExtensions]]
  * (builder-time).
  */
object RewriteRowNumberTopK extends Rule[LogicalPlan] {

  private def extractK(cond: Expression, rn: ExprId): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
          if a.exprId == rn => Some(k)
      case LessThan(a: AttributeReference, IntegerLiteral(k))
          if a.exprId == rn => Some(k - 1)
      case EqualTo(a: AttributeReference, IntegerLiteral(1))
          if a.exprId == rn => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(plist, Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(part, order, _)), _)), _, _, child, _))) =>
      extractK(cond, al.exprId) match {
        case Some(k) if k > 0 && order.nonEmpty && part.nonEmpty &&
            plist.forall(_.references.forall(_.exprId != al.exprId)) =>
          Project(plist, TopKPerKey(part, order, k, child))
        case _ => p
      }
  }
}

/** One-call engine activation on any session (incl. driver-built):
  * planner strategy + optimizer rule + SQL function registration. */
object Graft {
  def enable(s: SparkSession): Unit = {
    if (!s.experimental.extraStrategies.contains(GraftStrategy)) {
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ GraftStrategy
    }
    if (!s.experimental.extraOptimizations.contains(RewriteRowNumberTopK)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ RewriteRowNumberTopK
    }
    GraftFunctions.register(s)
  }
}
