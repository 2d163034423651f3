package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The `functions._` compositions in [[graft.functions.VectorFunctions]]
  * (aggregate / zip_with / transform) are correct but run INTERPRETED —
  * Catalyst higher-order functions don't participate in whole-stage
  * codegen and allocate per element. In pair-scoring joins (kNN, ANN
  * verify, quantization fidelity) the dot product IS the inner loop, so
  * it gets the real treatment: a typed expression with `doGenCode`
  * emitting a primitive `double` loop over the unsafe array data — no
  * boxing, no lambda dispatch, fused into the surrounding codegen stage.
  *
  * Accumulation is left-to-right in doubles, bit-identical to the HOF
  * forms (`aggregate(..., 0.0, _+_)` / the unrolled `reduce(_ + _)`),
  * so swapping implementations can never change oracle-checked output.
  *
  * Null contract — EXACTLY the HOF forms': null array → null; any null
  * element → null (`aggregate` turns a null product into a null
  * accumulator); unequal lengths → null (`zip_with` null-pads the
  * shorter side). This total equivalence is what lets
  * [[graft.plans.NativeVectorRewrite]] rewrite unconditionally.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // explicit check instead of ImplicitCastInputTypes (private[sql] in
  // Spark 4): inputs must already be array<double> — the engine's call
  // sites cast embeddings once at scan, which is also the cheaper plan
  // (one cast per row, not one per expression use)
  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExpressions.isDoubleArray(left.dataType) &&
        VectorExpressions.isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $s += $a.getDouble($i) * $b.getDouble($i);
          }
          if (!${ev.isNull}) ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** ‖a‖₂ as a codegen'd primitive loop — companion to [[DotProduct]];
  * same accumulation order as the HOF form (left-to-right Σx², then
  * sqrt), same null contract.
  */
case class L2Norm(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExpressions.isDoubleArray(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
        int $n = $a.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
          double $v = $a.getDouble($i);
          $s += $v * $v;
        }
        if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($s);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

object VectorExpressions {

  private[expressions] def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** (name, info, builder) triples in the SparkSessionExtensions
    * injectFunction shape.
    */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("vec_dot",
        new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
        (children: Seq[Expression]) => DotProduct(children(0), children(1))),
      ("vec_norm",
        new ExpressionInfo(classOf[L2Norm].getName, "vec_norm"),
        (children: Seq[Expression]) => L2Norm(children.head)))
}
