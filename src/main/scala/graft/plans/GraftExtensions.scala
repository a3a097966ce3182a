package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Rewrites every single-column `count(DISTINCT x)` to HyperLogLog++
  * (`approx_count_distinct(x)`) when
  * `spark.graft.approxDistinct.enabled=true` (default off — exact
  * semantics unless a session opts in).
  *
  * Why a rule and not a code change: an exact distinct count over a
  * high-cardinality key is the one aggregate that CANNOT partial-
  * aggregate away — every distinct value crosses the shuffle. The HLL
  * sketch partial-aggregates to a few KB per group, turning the
  * profile queries' worst exchange into a constant-size one. Behind a
  * session flag, a 100 TB profiling session flips the switch; CI and
  * oracles keep exact counts. Multi-column distincts and
  * DISTINCT-with-filter are left untouched (no HLL equivalent with
  * identical NULL-tuple semantics).
  *
  * Installed by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val FlagKey = "spark.graft.approxDistinct.enabled"
  val RsdKey = "spark.graft.approxDistinct.rsd"

  private def enabled: Boolean =
    SQLConf.get.getConfString(FlagKey, "false").toBoolean

  private def rsd: Double =
    SQLConf.get.getConfString(RsdKey, "0.05").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child, rsd),
              isDistinct = false)
        }
    }
}
