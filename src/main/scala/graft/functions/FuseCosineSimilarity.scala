package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule that recognizes the composed cosine-similarity
  * pattern — `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` where `dot`
  * is the `aggregate(zip_with(x, y, *), 0.0, +)` fold — and rewrites it
  * to the fused native [[CosineSimilarity]] expression.
  *
  * Why a rule and not just the function: user SQL and third-party
  * pipelines write the composed form (it is the only way to express a
  * dot product with built-ins), and each composed evaluation runs THREE
  * interpreted higher-order folds plus a zipped intermediate array per
  * row. The fused expression computes bit-identical values (parity
  * spec'd in `CosineSimilaritySpec`) in one codegen'd loop, so the
  * rewrite is a pure performance substitution — same results, no
  * opt-in needed once the rule is installed (via [[GraftExtensions]] or
  * `spark.experimental.extraOptimizations`).
  *
  * Matching is deliberately conservative: the fold zero must be the
  * literal 0.0, the lambda bodies must be exactly `x*y` / `acc+v` over
  * the lambda's own variables (either operand order — both ops
  * commute on doubles), the finish lambda must be the identity, and
  * the three dots must be over semantically-equal children. Anything
  * else is left untouched.
  */
object FuseCosineSimilarity extends Rule[LogicalPlan] {

  /** Both operands are exactly the lambda's two variables, in either
    * order.
    */
  private def isVarPair(x: Expression, y: Expression,
      args: Seq[NamedExpression]): Boolean =
    args.length == 2 &&
      ((x.semanticEquals(args(0)) && y.semanticEquals(args(1))) ||
        (x.semanticEquals(args(1)) && y.semanticEquals(args(0))))

  /** The composed `aggregate(zip_with(x, y, *), 0.0, +)` dot product. */
  private object Dot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(x, y, LambdaFunction(Multiply(mx, my, _), margs, _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(ax, ay, _), aargs, _),
          LambdaFunction(fBody, fArgs, _))
          if zero == 0.0 && isVarPair(mx, my, margs) &&
            isVarPair(ax, ay, aargs) &&
            fArgs.length == 1 && fBody.semanticEquals(fArgs.head) =>
        Some((x, y))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(Dot(a, b),
          Multiply(Sqrt(Dot(a2, a3)), Sqrt(Dot(b2, b3)), _), _)
          if a2.semanticEquals(a3) && b2.semanticEquals(b3) &&
            ((a2.semanticEquals(a) && b2.semanticEquals(b)) ||
              (a2.semanticEquals(b) && b2.semanticEquals(a))) =>
        CosineSimilarity(a, b)
    }
}
