package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.expressions.CosineSimilarity

/** Optimizer rule: rewrite the declarative higher-order-function cosine
  * formula — `aggregate(zip_with(a,b,(x,y)->dbl(x)*dbl(y)),0.0,+) /
  * (sqrt(dot(a,a)) * sqrt(dot(b,b)))` — into the codegen'd
  * [[CosineSimilarity]] expression. Users write the portable HOF
  * formulation; plans run the fused loop. The rewrite only fires when
  * both operands are `array<float>` — [[CosineSimilarity]] reads via
  * `ArrayData.getFloat`, so on any other element type (where the HOF
  * form's Cast-to-double is still valid) the rewrite would reinterpret
  * bytes; for float arrays the native expression is bit-identical by
  * construction (ExpressionSpec), so the guarded rewrite is safe.
  *
  * Installed per session via `spark.experimental.extraOptimizations`
  * or cluster-wide with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object AccelerateCosine extends Rule[LogicalPlan] {

  /** Matches the exact dot-product fold shape produced by
    * SimOps.dot / its SQL equivalent: a zip_with multiply of the two
    * double-cast LAMBDA VARIABLES (one from each input, in order)
    * folded with + of the accumulator and element variables from a 0.0
    * start. Operand identity is checked by exprId — a structural-only
    * match would rewrite e.g. `(x, y) -> dbl(x) * dbl(x)` (sum of
    * squares) into a dot product. */
  private object DotFold {
    private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }

    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            zw @ ZipWith(_, _,
              LambdaFunction(Multiply(
                Cast(xv, DoubleType, _, _), Cast(yv, DoubleType, _, _), _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(al, ar, _),
              Seq(ma: NamedLambdaVariable, mx: NamedLambdaVariable), _),
            LambdaFunction(fv: NamedLambdaVariable,
              Seq(fa: NamedLambdaVariable), _))
          if zero == 0.0 &&
            isVar(xv, zx) && isVar(yv, zy) &&
            ((isVar(al, ma) && isVar(ar, mx)) || (isVar(al, mx) && isVar(ar, ma))) &&
            fv.exprId == fa.exprId =>
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
            b.semanticEquals(b2) && b.semanticEquals(b3) &&
            isFloatArray(a) && isFloatArray(b) =>
        CosineSimilarity(a, b)
    }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Cluster-wide installation hook:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => AccelerateCosine)
}
