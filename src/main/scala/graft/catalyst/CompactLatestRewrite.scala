package graft.catalyst

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the feed-compaction window pattern
  *
  * {{{ Filter(rn = 1, Window(row_number over (partition BY k ORDER BY o DESC) AS rn, child)) }}}
  *
  * into a hash aggregate
  *
  * {{{ Aggregate(k, max_by(struct(child.*), o)) }}}
  *
  * The window form sorts every partition's full history; the aggregate form
  * is a partial+final `max_by` — map-side combine keeps only one row per
  * key per task, so at 100 TB the shuffle carries |keys| rows instead of
  * |events| (SURVEY.md §4's `ReplaceWindowWithMaxBy` stretch goal).
  *
  * Fires only when the pattern is exact: a single row_number window
  * expression, a non-empty partition spec, ONE descending order key, and a
  * `rn = 1` (or `rn <= 1`) filter. Ties in the order key: `row_number` picks
  * an arbitrary peer (nondeterministic already), `max_by` likewise — the
  * rewrite preserves the determinism contract the query had. Opt-in via
  * `spark.sql.extensions=graft.catalyst.GraftExtensions` or
  * `spark.experimental.extraOptimizations`.
  */
object CompactLatestRewrite extends Rule[LogicalPlan] {

  private def isKeepFirst(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, spec), _)),
          partitionSpec, Seq(SortOrder(orderKey, Descending, _, _)), child, _))
        if partitionSpec.nonEmpty && orderKey.deterministic &&
          spec.partitionSpec == partitionSpec &&
          isKeepFirst(cond, alias.toAttribute) &&
          partitionSpec.forall(_.isInstanceOf[Attribute]) =>
      val groupAttrs = partitionSpec.map(_.asInstanceOf[Attribute])
      val payload = child.output.filterNot(a => groupAttrs.exists(_.semanticEquals(a)))
      val latest = Alias(
        MaxBy(CreateStruct(payload), orderKey).toAggregateExpression(), "_latest")()
      val agg = Aggregate(groupAttrs, groupAttrs :+ latest, child)
      // restore the original output schema AND attribute ids so parents
      // (including the usual drop("rn") projection) still resolve
      val restored: Seq[NamedExpression] = child.output.map { a =>
        if (groupAttrs.exists(_.semanticEquals(a))) a
        else {
          val idx = payload.indexWhere(_.semanticEquals(a))
          Alias(GetStructField(latest.toAttribute, idx, Some(a.name)), a.name)(exprId = a.exprId)
        }
      } :+ Alias(Literal(1, IntegerType), alias.name)(exprId = alias.exprId)
      Project(restored, agg)
  }
}
