package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the idiomatic-but-interpreted lambda dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
  *
  * into the whole-stage-codegen'd [[DotProduct]] (`graft_dot`). Spark's
  * higher-order array functions never enter codegen — every element
  * pays an interpreted lambda call — so users writing the natural form
  * silently lose an order of magnitude on vector workloads. With this
  * rule they keep writing the natural form and get the native loop.
  *
  * Soundness: [[DotProduct]] returns null on length mismatch AND on
  * any null element, exactly like the lambda form (zip_with pads the
  * shorter side with null, and a null element's product poisons the
  * sum either way); equal-length all-non-null folds are sequential in
  * both forms, so results are bit-identical. When the static element
  * type has containsNull=false the generated loop carries no
  * per-element check. The match is deliberately strict — double
  * element type, literal 0.0 zero, pure x*y and acc+v lambdas (either
  * operand order), identity finish — anything else is left untouched.
  */
class RewriteLambdaDot extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** `f` is exactly `lhs op rhs` over the two lambda variables, in
    * either order. */
  private def isPair(f: Expression, a: NamedLambdaVariable, b: NamedLambdaVariable,
                     l: Expression, r: Expression): Boolean =
    (l, r) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg @ ArrayAggregate(
        ZipWith(left, right,
          LambdaFunction(Multiply(ml, mr, _), Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
      if zero == 0.0 &&
        isDoubleArray(left) && isDoubleArray(right) &&
        isPair(agg, zx, zy, ml, mr) &&
        isPair(agg, acc, v, al, ar) &&
        fin.exprId == facc.exprId =>
      DotProduct(left, right)
  }
}
