package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rewrite: the composable dot-product HOF pattern
  *
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)`
  *
  * becomes the codegen [[DotProduct]] in strict mode. SQL/DataFrame users
  * who write the natural HOF formulation get the tight primitive loop
  * (no intermediate array, no per-element lambda dispatch) without
  * changing their query.
  *
  * Soundness: only fires when both inputs are `array<double>` — on float
  * arrays the HOF multiplies in float precision while DotProduct widens
  * first, which can differ in ULPs. Strict mode reproduces the HOF's
  * edge cases exactly: mismatched lengths → NULL, null element → NULL.
  * Equal-length non-null double arrays are bit-identical (sequential
  * left-to-right summation in both).
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** finish lambda is the identity: (acc) -> acc */
  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc1: NamedLambdaVariable, e1: NamedLambdaVariable, _),
              Seq(acc2: NamedLambdaVariable, e2: NamedLambdaVariable), _),
            finish: LambdaFunction)
          if x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
            acc1.exprId == acc2.exprId && e1.exprId == e2.exprId &&
            isIdentity(finish) && isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b, strict = true)
    }
}
