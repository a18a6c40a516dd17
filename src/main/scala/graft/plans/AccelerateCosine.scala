package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.expressions.CosineSimilarity

/** Optimizer rule: rewrite the declarative higher-order-function cosine
  * formula — `aggregate(zip_with(a,b,(x,y)->dbl(x)*dbl(y)),0.0,+) /
  * (sqrt(dot(a,a)) * sqrt(dot(b,b)))` — into the codegen'd
  * [[CosineSimilarity]] expression. Users write the portable HOF
  * formulation; plans run the fused loop. Semantics are unchanged for
  * every input (the native expression is bit-identical by construction,
  * ExpressionSpec), so the rewrite is unconditionally safe.
  *
  * Installed per session via `spark.experimental.extraOptimizations`
  * or cluster-wide with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object AccelerateCosine extends Rule[LogicalPlan] {

  /** Matches the exact dot-product fold shape produced by
    * SimOps.dot / its SQL equivalent: a zip_with multiply of
    * double-cast elements folded with + from a 0.0 start. */
  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            zw @ ZipWith(_, _, LambdaFunction(Multiply(xc: Cast, yc: Cast, _), _, _)),
            Literal(zero, DoubleType),
            LambdaFunction(_: Add, _, _),
            LambdaFunction(_: NamedLambdaVariable, _, _))
          if zero == 0.0 &&
            xc.dataType == DoubleType && yc.dataType == DoubleType =>
        Some((zw.left, zw.right))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
            DotFold(a, b),
            Multiply(Sqrt(DotFold(a2, a3)), Sqrt(DotFold(b2, b3)), _), _)
          if a.semanticEquals(a2) && a.semanticEquals(a3) &&
            b.semanticEquals(b2) && b.semanticEquals(b3) =>
        CosineSimilarity(a, b)
    }
}

/** Cluster-wide installation hook:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => AccelerateCosine)
}
