package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.CosineSimExpr

/** Optimizer rule: recognizes the declarative cosine-similarity pattern
  *
  * {{{ aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)
  *     / (sqrt(aggregate(zip_with(a, a, ...))) * sqrt(aggregate(zip_with(b, b, ...)))) }}}
  *
  * over float arrays and replaces it with the fused codegen'd
  * [[CosineSimExpr]]. The rewrite is semantics-preserving bit-for-bit: the
  * fused loop performs the same IEEE operation sequence per accumulator
  * (asserted in PlanSpec), it just skips the per-row array allocations —
  * so user-written declarative cosine gets native speed without changing
  * their code. Registered via [[graft.GraftExtensions]]
  * (`injectOptimizerRule`).
  */
case class CosineRewrite(unused: Any = null) extends Rule[LogicalPlan] {

  /** Matches the dot-product-with-double-accumulation aggregate and
    * extracts the two zipped arrays. */
  private object DotAgg {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(_: Cast, _: Cast, _), _, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
          LambdaFunction(_: NamedLambdaVariable, _, _)) => Some((a, b))
      case _ => None
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotAgg(a, b),
        Multiply(Sqrt(DotAgg(a2, a3)), Sqrt(DotAgg(b2, b3)), _), _)
        if isFloatArray(a) && isFloatArray(b) &&
          a.semanticEquals(a2) && a.semanticEquals(a3) &&
          b.semanticEquals(b2) && b.semanticEquals(b3) =>
      CosineSimExpr(a, b)
  }
}
