package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native centroid-assignment expressions for the k-means / IVF-PQ /
  * graph-ANN hot path (r17, guide §"eliminate non-codegen expressions").
  *
  * The previous implementation folded a `typedlit` centroid array with
  * Catalyst higher-order functions (`aggregate(zip_with(...))` per
  * centroid) — HOFs are CodegenFallback AND allocate + dispatch a
  * lambda PER ELEMENT, so one corpus pass over C centroids × dim
  * components paid C·dim interpreted closure calls per row (the PQ
  * artifact build runs ~14 such passes). These expressions do the same
  * arithmetic as ONE flat JIT-compiled loop over primitive arrays: per
  * row a single expression-node dispatch, zero boxing inside the loop.
  * r18: both expressions additionally emit that loop straight into
  * WHOLE-STAGE CODEGEN (`doGenCode`) — the r17 versions were
  * CodegenFallback, which broke the codegen span at the hottest map
  * stage (one virtual eval dispatch per row plus the fallback's
  * row-conversion overhead); eval() remains as the interpreted path
  * and the two are line-for-line the same algorithm.
  *
  * EXACT-equivalence contract (the [[DotProduct]] discipline — swapping
  * implementations can never change oracle-checked output):
  *  - centroids iterate in the given (cid-ascending) order with a
  *    STRICT comparison, so ties keep the lowest cid — identical to the
  *    fold's `when(d < acc.dist)` / `when(cos > acc.c1)` chains;
  *  - integer distances use the same wrapping Long arithmetic
  *    ((x−y)·(x−y) summed left-to-right), cosines the same
  *    left-to-right double dot then one divide by (nrm·cnrm);
  *  - a null / wrong-length / null-element input array reproduces the
  *    fold's behavior exactly: every per-centroid score is null there,
  *    every `when` is false, and the INITIAL accumulator comes back —
  *    (Long.MaxValue, −1) for [[NearestCentroid]], (−∞, −1, −∞, −1)
  *    for [[Top2CentroidCos]] — so the expressions are non-nullable
  *    structs, never null.
  */
case class NearestCentroid(child: Expression,
                           cents: Seq[(Long, Seq[Long])])
    extends UnaryExpression {

  require(cents.nonEmpty, "NearestCentroid needs at least one centroid")
  // a mixed-dim centroid list would silently return the initial
  // accumulator for every row (numElements == dim never matches) —
  // fail loudly at construction instead (r17 advice)
  require(cents.forall(_._2.length == cents.head._2.length),
    "NearestCentroid centroids must all share one dimensionality")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val cids: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val mat: Array[Array[Long]] =
    cents.map(_._2.toArray).toArray
  @transient private lazy val dim: Int = mat(0).length

  override def eval(input: InternalRow): Any = {
    var best = Long.MaxValue
    var bestCid = -1L
    val qv = child.eval(input)
    if (qv != null) {
      val q = qv.asInstanceOf[ArrayData]
      if (q.numElements() == dim && !hasNullElement(q)) {
        val qa = q.toLongArray()
        var c = 0
        while (c < mat.length) {
          val cv = mat(c)
          var d = 0L
          var i = 0
          while (i < dim) { val x = qa(i) - cv(i); d += x * x; i += 1 }
          if (d < best) { best = d; bestCid = cids(c) }
          c += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](best, bestCid))
  }

  private def hasNullElement(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  /** r18: the same flat loop emitted INTO whole-stage codegen — the
    * r17 expression was CodegenFallback, which broke the
    * WholeStageCodegen span at the hottest map stage of the PQ/IVF
    * builds (one virtual eval dispatch + an InternalRow boxing round
    * trip per row). Arithmetic, iteration order, tie-break and the
    * null→initial-accumulator edge are line-for-line the eval() above,
    * so interpreted and compiled paths can never disagree (spec-pinned).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val matRef = ctx.addReferenceObj("nearestCentroidMat", mat, "long[][]")
    val cidsRef = ctx.addReferenceObj("nearestCentroidIds", cids, "long[]")
    val rowCls = classOf[GenericInternalRow].getName
    val best = ctx.freshName("best")
    val bestCid = ctx.freshName("bestCid")
    val arr = ctx.freshName("arr")
    val qa = ctx.freshName("qa")
    val ok = ctx.freshName("ok")
    val c = ctx.freshName("c")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val dd = ctx.freshName("dd")
    val x = ctx.freshName("x")
    val cv = ctx.freshName("cv")
    ev.copy(code = code"""
      ${childGen.code}
      long $best = Long.MAX_VALUE;
      long $bestCid = -1L;
      if (!${childGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
        if ($arr.numElements() == $dim) {
          boolean $ok = true;
          for (int $i = 0; $i < $dim; $i++) {
            if ($arr.isNullAt($i)) { $ok = false; break; }
          }
          if ($ok) {
            long[] $qa = $arr.toLongArray();
            for (int $c = 0; $c < ${mat.length}; $c++) {
              long[] $cv = $matRef[$c];
              long $dd = 0L;
              for (int $j = 0; $j < $dim; $j++) {
                long $x = $qa[$j] - $cv[$j];
                $dd += $x * $x;
              }
              if ($dd < $best) { $best = $dd; $bestCid = $cidsRef[$c]; }
            }
          }
        }
      }
      InternalRow ${ev.value} = new $rowCls(new Object[] {
        java.lang.Long.valueOf($best), java.lang.Long.valueOf($bestCid) });
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** The graph-ANN entry layer's per-row top-2-cells pick ((cos, cid)
  * desc-strict ordering) as one flat loop — see the class doc above
  * for the equivalence contract. `cents` carries (cid, components,
  * norm); `children` are (emb: array<double>, nrm: double).
  */
case class Top2CentroidCos(emb: Expression, nrm: Expression,
                           cents: Seq[(Long, Seq[Double], Double)])
    extends Expression {

  require(cents.nonEmpty, "Top2CentroidCos needs at least one centroid")
  // same loud-failure contract as NearestCentroid (r17 advice)
  require(cents.forall(_._2.length == cents.head._2.length),
    "Top2CentroidCos centroids must all share one dimensionality")

  override def children: Seq[Expression] = Seq(emb, nrm)

  override def checkInputDataTypes(): TypeCheckResult =
    (emb.dataType, nrm.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("c1", DoubleType, nullable = false),
    StructField("cid1", LongType, nullable = false),
    StructField("c2", DoubleType, nullable = false),
    StructField("cid2", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "top2_centroid_cos"

  @transient private lazy val cids: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val mat: Array[Array[Double]] =
    cents.map(_._2.toArray).toArray
  @transient private lazy val nrms: Array[Double] = cents.map(_._3).toArray
  @transient private lazy val dim: Int = mat(0).length

  override def eval(input: InternalRow): Any = {
    var c1 = Double.NegativeInfinity
    var cid1 = -1L
    var c2 = Double.NegativeInfinity
    var cid2 = -1L
    val ev = emb.eval(input)
    val nv = nrm.eval(input)
    if (ev != null && nv != null) {
      val e = ev.asInstanceOf[ArrayData]
      if (e.numElements() == dim && !hasNullElement(e)) {
        val ea = e.toDoubleArray()
        val n = nv.asInstanceOf[Double]
        var c = 0
        while (c < mat.length) {
          val cv = mat(c)
          var dot = 0.0
          var i = 0
          while (i < dim) { dot += ea(i) * cv(i); i += 1 }
          val cos = dot / (n * nrms(c))
          // same branch order as the fold's when/when/otherwise: a NaN
          // cos fails both comparisons and leaves the accumulator alone
          if (cos > c1) {
            c2 = c1; cid2 = cid1; c1 = cos; cid1 = cids(c)
          } else if (cos > c2) {
            c2 = cos; cid2 = cids(c)
          }
          c += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](c1, cid1, c2, cid2))
  }

  private def hasNullElement(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  /** r18: whole-stage-codegen emission of the same flat loop — see
    * [[NearestCentroid.doGenCode]]; the branch order (strict `>`
    * against c1 then c2, NaN falls through) is line-for-line eval().
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val embGen = emb.genCode(ctx)
    val nrmGen = nrm.genCode(ctx)
    val matRef = ctx.addReferenceObj("top2CentroidMat", mat, "double[][]")
    val cidsRef = ctx.addReferenceObj("top2CentroidIds", cids, "long[]")
    val nrmsRef = ctx.addReferenceObj("top2CentroidNrms", nrms, "double[]")
    val rowCls = classOf[GenericInternalRow].getName
    val c1 = ctx.freshName("c1")
    val cid1 = ctx.freshName("cid1")
    val c2 = ctx.freshName("c2")
    val cid2 = ctx.freshName("cid2")
    val arr = ctx.freshName("arr")
    val ea = ctx.freshName("ea")
    val nv = ctx.freshName("nv")
    val ok = ctx.freshName("ok")
    val c = ctx.freshName("c")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val dot = ctx.freshName("dot")
    val cos = ctx.freshName("cos")
    val cv = ctx.freshName("cv")
    ev.copy(code = code"""
      ${embGen.code}
      ${nrmGen.code}
      double $c1 = Double.NEGATIVE_INFINITY;
      long $cid1 = -1L;
      double $c2 = Double.NEGATIVE_INFINITY;
      long $cid2 = -1L;
      if (!${embGen.isNull} && !${nrmGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $arr = ${embGen.value};
        if ($arr.numElements() == $dim) {
          boolean $ok = true;
          for (int $i = 0; $i < $dim; $i++) {
            if ($arr.isNullAt($i)) { $ok = false; break; }
          }
          if ($ok) {
            double[] $ea = $arr.toDoubleArray();
            double $nv = ${nrmGen.value};
            for (int $c = 0; $c < ${mat.length}; $c++) {
              double[] $cv = $matRef[$c];
              double $dot = 0.0;
              for (int $j = 0; $j < $dim; $j++) {
                $dot += $ea[$j] * $cv[$j];
              }
              double $cos = $dot / ($nv * $nrmsRef[$c]);
              if ($cos > $c1) {
                $c2 = $c1; $cid2 = $cid1; $c1 = $cos; $cid1 = $cidsRef[$c];
              } else if ($cos > $c2) {
                $c2 = $cos; $cid2 = $cidsRef[$c];
              }
            }
          }
        }
      }
      InternalRow ${ev.value} = new $rowCls(new Object[] {
        java.lang.Double.valueOf($c1), java.lang.Long.valueOf($cid1),
        java.lang.Double.valueOf($c2), java.lang.Long.valueOf($cid2) });
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Top2CentroidCos =
    copy(emb = newChildren(0), nrm = newChildren(1))
}
