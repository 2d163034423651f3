package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-Minimum-Values distinct-count sketch as a custom Catalyst
  * aggregate — the bounded-memory mergeable estimator for COUNT
  * DISTINCT over an unbounded key domain (Bar-Yossef et al. 2002).
  *
  * `count(DISTINCT x)` is exact but its reducer state is ∝ the number
  * of distinct keys per group — at 100 TB that is the thing being
  * measured, so it cannot be held. Spark's built-in
  * `approx_count_distinct` (HyperLogLog++) solves this but its
  * estimate is engine-defined and cannot be oracle-compared. KMV is
  * the sketch whose state IS a pure set function of the input: the k
  * smallest distinct hash values. That makes it
  *  - O(k) state per partial, mergeable in any order/shape (union,
  *    keep k smallest) — map-side partial aggregation is safe at any
  *    parallelism;
  *  - DETERMINISTIC and engine-portable: fed a deterministic hash
  *    (the 56-bit md5 convention), the sketch — and therefore the
  *    estimate (k−1)·M div h_k — is bit-identical to a SQL twin that
  *    takes the k-th smallest distinct hash via a ranking window
  *    (see q146), so the driver can hash-compare what HLL could only
  *    ever rows-check.
  *
  * Estimator: with n distinct uniform hashes in [0, M), the k-th
  * smallest h_k ≈ k·M/(n+1) ⟹ n̂ = (k−1)·M/h_k (the unbiased form).
  * If fewer than k distinct values were seen the sketch holds ALL of
  * them and the exact count is `size(result)`.
  *
  * eval returns array<bigint>: the ≤ k minimum distinct hash values,
  * ascending (so `element_at(r, size(r))` is h_k when size = k).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint (hash) column, got ${child.dataType.simpleString}")
    else if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be >= 2, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], v: Long): Unit = {
    // keep only the k smallest distinct values: admit v iff the set is
    // not yet full or v beats the current maximum (set semantics make
    // duplicate arrivals no-ops — the reason the sketch is a pure
    // function of the distinct input, independent of row order/counts)
    if (buf.size < k) buf += v
    else if (v < buf.last && !buf.contains(v)) { buf += v; buf -= buf.last }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(add(b1, _))
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray[Long].map(v => v: Any))

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvAgg {

  private def litInt(e: Expression): Int = e match {
    case IntegerLiteral(v) => v
    // only in-range bigint literals convert — a silent .toInt would
    // truncate e.g. 4294967298 to k=2
    case Literal(v: Long, LongType) if v.isValidInt => v.toInt
    case other => throw new IllegalArgumentException(
      s"kmv_sketch k must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(("kmv_sketch",
      new ExpressionInfo(classOf[KmvAgg].getName, null, "kmv_sketch",
        "_FUNC_(hash, k) - aggregate: K-Minimum-Values distinct-count " +
          "sketch over a bigint hash column with O(k) state; returns " +
          "array<bigint> of the <= k smallest distinct hashes, " +
          "ascending. Estimate distinct as (k-1)*M div h_k when full, " +
          "size(result) otherwise.",
        "", "", "", "agg_funcs", "", "", ""),
      (children: Seq[Expression]) =>
        KmvAgg(children(0), litInt(children(1)))))

  /** Column builder (the Scala-side twin of the SQL function). */
  def kmv(hash: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      KmvAgg(org.apache.spark.sql.GraftBridge.expression(hash), k)
        .toAggregateExpression())
}
