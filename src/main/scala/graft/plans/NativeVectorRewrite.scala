package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, ArrayTransform, ZipWith, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.expressions.{DotProduct, L2Norm}

/** Optimizer rule: rewrite the interpreted higher-order-function forms
  * of dot product and L2 norm into the native codegen'd expressions.
  *
  *   aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)
  *     ==> vec_dot(a, b)            ([[graft.expressions.DotProduct]])
  *   sqrt(aggregate(transform(a, x -> x*x), 0.0, (acc,v) -> acc+v))
  *     ==> vec_norm(a)              ([[graft.expressions.L2Norm]])
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * (see [[graft.GraftExtensions]]), so ANY query written against the
  * engine in the natural `functions._` style — including ad-hoc user
  * SQL/DataFrames — gets the fused primitive loop without knowing the
  * native functions exist.
  *
  * The rewrite is unconditionally semantics-preserving: the native
  * expressions implement EXACTLY the HOF forms' null contract (null
  * array → null, any null element → null, unequal lengths → null — the
  * `zip_with` null-pad case) and the identical left-to-right double
  * accumulation, so results are bit-exact on every input. The only
  * structural guard is the element type (arrays of doubles).
  */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** (acc, v) -> acc + v over doubles, vars referenced in order. */
  private def isSumLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
        Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _) =>
      acc.exprId == a1.exprId && v.exprId == a2.exprId
    case _ => false
  }

  /** finish lambda is identity: acc -> acc. */
  private def isIdentityLambda(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  private def isZeroLiteral(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // dot: aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _)),
            zero, merge, finish)
          if x.exprId == p1.exprId && y.exprId == p2.exprId &&
            isZeroLiteral(zero) && isSumLambda(merge) &&
            isIdentityLambda(finish) &&
            isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)

      // norm: sqrt(aggregate(transform(a, x -> x*x), 0.0, (acc,v) -> acc+v))
      case Sqrt(ArrayAggregate(
            ArrayTransform(a,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(p: NamedLambdaVariable), _)),
            zero, merge, finish))
          if x.exprId == p.exprId && y.exprId == p.exprId &&
            isZeroLiteral(zero) && isSumLambda(merge) &&
            isIdentityLambda(finish) && isDoubleArray(a) =>
        L2Norm(a)
    }
}
