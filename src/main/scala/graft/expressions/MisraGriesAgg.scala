package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a custom Catalyst aggregate —
  * the bounded-memory candidate generator for frequent items over an
  * UNBOUNDED key domain. The vocabulary-keyed aggregates elsewhere
  * (q34/q63) are exact but their reducer state is ∝ |vocabulary|; at
  * web scale the vocabulary is itself corpus-sized, and the scale-safe
  * pattern is two passes: (1) this sketch — O(capacity) state per
  * partial, one merge — yields ≤ `capacity` candidates GUARANTEED to
  * include every key with true frequency > N/(capacity+1); (2) an
  * exact count of only those candidates (broadcast semi-join, reducer
  * state ∝ capacity). See q88.
  *
  * Classic per-row update (Misra-Gries 1982): increment a tracked key,
  * start tracking an untracked key while capacity remains, else
  * decrement ALL counters and drop zeros. Merge (Agarwal et al. 2013,
  * mergeable summaries): sum counters keywise, then subtract the
  * (capacity+1)-th largest counter from every entry and drop ≤ 0 —
  * the result carries the same ε = 1/(capacity+1) error guarantee, so
  * map-side partial aggregation is safe at any parallelism.
  *
  * eval returns map<string, bigint> of candidate → LOWER-BOUND count
  * (true count is within N·ε above the bound; candidates are a
  * superset of the guaranteed-frequent keys, never a false negative).
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.simpleString}")
    else if (capacity < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName capacity must be positive, got $capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None => // decrement-all, drop zeros (the MG eviction step)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything —
      // the mergeable-summaries reduction that preserves ε
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace((_, c) => c - sub)
      b1.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray.sortBy(_._1) // deterministic map order
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(entries.map(e => e._2: Any)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { val k = in.readUTF(); buf.update(k, in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {

  private def litInt(e: Expression): Int = e match {
    case IntegerLiteral(v) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"misra_gries capacity must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(("misra_gries",
      new ExpressionInfo(classOf[MisraGriesAgg].getName, null, "misra_gries",
        "_FUNC_(key, capacity) - aggregate: Misra-Gries heavy-hitters " +
          "sketch over a string column with O(capacity) state; returns " +
          "map<string,bigint> of candidate -> lower-bound count. Every " +
          "key with true frequency > N/(capacity+1) is guaranteed " +
          "present; counts under-report by at most N/(capacity+1).",
        "", "", "", "agg_funcs", "", "", ""),
      (children: Seq[Expression]) =>
        MisraGriesAgg(children(0), litInt(children(1)))))

  /** Column builder (the Scala-side twin of the SQL function). */
  def misraGries(key: org.apache.spark.sql.Column, capacity: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      MisraGriesAgg(
        org.apache.spark.sql.GraftBridge.expression(key), capacity)
        .toAggregateExpression())
}
