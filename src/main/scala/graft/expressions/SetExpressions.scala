package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |a ∩ b| for two SORTED-ascending distinct `array<bigint>` columns —
  * the verify step of every set-similarity join (Jaccard needs only the
  * intersection SIZE, yet `size(array_intersect(a, b))` builds a hash
  * set AND materializes the intersection array per candidate pair,
  * interpreted). This is the codegen'd two-pointer merge instead:
  * O(|a|+|b|), zero allocation, fused into the join stage.
  *
  * Contract: both inputs sorted ascending with distinct elements
  * (`array_sort(array_distinct(...))` — the gram pipeline's shape);
  * unsorted input silently undercounts, so callers own the sort. Null
  * arrays yield null; elements are non-null by construction (hashes).
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // containsNull arrays are rejected STATICALLY: the merge reads
    // elements via getLong, which would silently decode a null element
    // as 0L — an explicit analysis error beats a wrong count.
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, containsNull) => !containsNull
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>) with " +
        "non-nullable elements, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "set_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $nx = $a.numElements();
        int $ny = $b.numElements();
        int $i = 0; int $j = 0; int $c = 0;
        while ($i < $nx && $j < $ny) {
          long $xv = $a.getLong($i);
          long $yv = $b.getLong($j);
          if ($xv == $yv) { $c++; $i++; $j++; }
          else if ($xv < $yv) { $i++; } else { $j++; }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}

object SetExpressions {
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(("set_intersect_count",
      new ExpressionInfo(classOf[IntersectCountSorted].getName, null,
        "set_intersect_count",
        // DESCRIBE FUNCTION surfaces the sorted-ascending contract that
        // the two-pointer merge relies on — unsorted input undercounts.
        "_FUNC_(a, b) - |a ∩ b| for two array<bigint> inputs that are " +
          "SORTED ASCENDING with DISTINCT, NON-NULL elements (e.g. " +
          "array_sort(array_distinct(x))). Unsorted input silently " +
          "undercounts: callers own the sort.",
        "", "", "", "array_funcs", "", "", ""),
      (children: Seq[Expression]) =>
        IntersectCountSorted(children(0), children(1))))
}
