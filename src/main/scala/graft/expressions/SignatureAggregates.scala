package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral, Literal, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Near-dup signature computation as CUSTOM CATALYST AGGREGATES.
  *
  * The pure-`functions._` forms (NearDup.simhashAggs / minhashAggs)
  * express one signature as 56 / 32 separate aggregate columns — one
  * SUM or MIN expression per bit/permutation. That works, but the
  * aggregation buffer then carries 56/32 independent slots per group,
  * every update evaluates 56/32 expression trees, and the grouped
  * output needs a second projection to recombine the columns into the
  * signature value.
  *
  * These [[TypedImperativeAggregate]]s hold the WHOLE signature in one
  * primitive-array buffer and update it in a single fused JVM loop per
  * input row — the idiomatic Spark shape for a multi-slot sketch
  * aggregate (same family as Spark's own HyperLogLog++ / CountMinSketch
  * aggregates). Both are algebraic: `merge` is elementwise (+ / min),
  * so map-side partial aggregation applies at any scale.
  *
  * Value contracts (pinned by NearDupSpec, on null-free input — both
  * aggregates SKIP null hashes per standard SQL aggregate semantics,
  * whereas the column forms vote -1 / hash the null; every call site
  * explodes a non-null array, so nulls cannot reach either form):
  *  - [[SimHashAgg]] == the 56-column bit-vote form: bit j of the
  *    result is set iff strictly more input hashes have bit j set than
  *    clear (Σ±1 > 0).
  *  - [[MinHashAgg]] == the k-column form `min(xxhash64(i, h))` for
  *    i in 0..k-1 — including the exact xxhash64 seed-chaining of the
  *    two-argument call (seed 42, hash the int permutation index, then
  *    the gram hash), so signatures are bit-identical to the HOF/agg
  *    forms used elsewhere.
  */
case class SimHashAgg(
    child: Expression,
    bits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint token-hash column, got ${child.dataType.simpleString}")
    else if (bits < 1 || bits > 64)
      TypeCheckResult.TypeCheckFailure(s"$prettyName bits must be in [1, 64], got $bits")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < bits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var r = 0L
    var j = 0
    while (j < bits) { if (buf(j) > 0) r |= (1L << j); j += 1 }
    r
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * bits)
    var j = 0
    while (j < bits) { bb.putInt(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](bits)
    var j = 0
    while (j < bits) { buf(j) = bb.getInt(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

case class MinHashAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  // xxhash64(i, gram) with Spark's default seed 42 chains the seed
  // through the arguments left-to-right; the per-permutation prefix
  // (seed 42 + the int index) is input-independent, so it is
  // precomputed once per operator instance, not per row.
  @transient private lazy val seeds: Array[Long] = {
    val a = new Array[Long](k)
    var i = 0
    while (i < k) { a(i) = XxHash64Function.hash(i, IntegerType, 42L); i += 1 }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint gram-hash column, got ${child.dataType.simpleString}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val hi = XxHash64Function.hash(h, LongType, seeds(i))
        if (hi < buf(i)) buf(i) = hi
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    var i = 0
    while (i < k) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](k)
    var i = 0
    while (i < k) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object SignatureAggregates {

  private def litInt(e: Expression, what: String): Int = e match {
    case IntegerLiteral(v) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("simhash_agg",
        new ExpressionInfo(classOf[SimHashAgg].getName, null, "simhash_agg",
          "_FUNC_(token_hash, bits) - aggregate: SimHash signature of a " +
            "group of bigint token hashes; bit j of the result is set " +
            "iff more inputs have bit j set than clear. `bits` is a " +
            "constant in [1, 64].",
          "", "", "", "agg_funcs", "", "", ""),
        (children: Seq[Expression]) =>
          SimHashAgg(children(0), litInt(children(1), "simhash_agg bits"))),
      ("minhash_agg",
        new ExpressionInfo(classOf[MinHashAgg].getName, null, "minhash_agg",
          "_FUNC_(gram_hash, k) - aggregate: k-permutation MinHash " +
            "signature (array<bigint>) of a group of bigint gram " +
            "hashes; element i equals min(xxhash64(i, h)) over the " +
            "group. `k` is a constant positive integer.",
          "", "", "", "agg_funcs", "", "", ""),
        (children: Seq[Expression]) =>
          MinHashAgg(children(0), litInt(children(1), "minhash_agg k"))))
}
