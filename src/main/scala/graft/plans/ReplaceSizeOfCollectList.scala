package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Size}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, CollectSet, Count}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `size(collect_list(x))` → `cast(count(x) as int)`
  * and `size(collect_set(x))` → `cast(count(distinct x) as int)`.
  *
  * A common anti-pattern in grouped-values pipelines (the cogroup
  * shape, SURVEY §2.3) counts a group by materializing the whole value
  * list/set first — an ObjectHashAggregate carrying every element
  * through the shuffle just to take its length. collect_list/set and
  * count all skip nulls, so the rewrites are exact; the cast preserves
  * `size`'s Int type. Registered via [[GraftExtensions]].
  */
object ReplaceSizeOfCollectList extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ae @ AggregateExpression(CollectList(child, _, _), _, false, None, _), _) =>
      Cast(ae.copy(aggregateFunction = Count(child)), IntegerType)
    case Size(ae @ AggregateExpression(CollectSet(child, _, _), _, false, None, _), _) =>
      Cast(ae.copy(aggregateFunction = Count(child), isDistinct = true), IntegerType)
  }
}
