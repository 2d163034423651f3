package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, StructType, TimestampType}

import graft.operators.VersionedTable

/** The graft catalog's `bucket` function — the V2 FunctionCatalog half
  * of STORAGE-PARTITIONED JOINS. When a bucketed graft scan reports
  * `KeyGroupedPartitioning(bucket(n, col))`, Spark resolves the
  * transform against the relation's catalog by loading THIS function
  * and binding it to `(numBuckets INT, key)`; two scans whose bound
  * functions share a `canonicalName` (and bucket count) are
  * co-partitioned, and `EnsureRequirements` plans their join with NO
  * shuffle on either side (`spark.sql.sources.v2.bucketing.enabled` —
  * the Iceberg SPJ contract, re-derived here from the public
  * `FunctionCatalog`/`SupportsReportPartitioning` API).
  *
  * Semantics are [[VersionedTable.bucketId]] — pmod(murmur3(key, seed
  * 42), n), the exact partition index `repartition(n, col)` computed
  * at write time — so when Spark DOES evaluate the function (the
  * one-side-shuffle SPJ of `...bucketing.shuffle.enabled`, which hash-
  * partitions the unbucketed side to MATCH the bucketed layout), rows
  * land in the bucket their file neighbors came from. Murmur3 of
  * int/long/string are different hash functions, so `canonicalName`
  * carries the key type: joining an int-keyed table to a long-keyed
  * one must NOT claim co-partitioning.
  */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets, col) — pmod(murmur3(col, seed 42), numBuckets); " +
      "the graft hash-bucket layout function (int/long/string keys)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"bucket takes (numBuckets, key, ...), got ${inputType.length} args")
    require(inputType(0).dataType == IntegerType,
      s"bucket's first argument is the INT bucket count, got " +
        s"${inputType(0).dataType.catalogString}")
    val keyTypes = inputType.drop(1).map(_.dataType).toSeq
    keyTypes.foreach {
      case IntegerType | LongType | StringType =>
      case other => throw new UnsupportedOperationException(
        s"bucket supports int/long/string keys, got ${other.catalogString}")
    }
    new GraftBoundBucket(keyTypes)
  }
}

/** `bucket` bound to concrete key types (one or several — the
  * multi-key co-location layout hashes the tuple). Stateless and
  * serializable — it ships into tasks when Spark evaluates the
  * transform.
  */
final class GraftBoundBucket(keyTypes: Seq[DataType])
    extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] =
    (IntegerType +: keyTypes).toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def isResultNullable: Boolean = false

  /** Type-qualified: murmur3(int) ≠ murmur3(long) ≠ murmur3(string),
    * so only same-key-type scans may claim the same function; the
    * arity rides in the type list.
    */
  override def canonicalName(): String =
    s"graft.bucket(${keyTypes.map(_.catalogString).mkString(",")})"

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // the chained-seed fold `functions.hash(c1, c2, ...)` computes
    // (Murmur3Hash children left-to-right, initial seed 42); a null
    // key leaves the running seed untouched — the same partition
    // index the write's HashPartitioning assigned nulls
    var h = 42L
    keyTypes.indices.foreach { i =>
      if (!input.isNullAt(i + 1)) {
        val v: Any = keyTypes(i) match {
          case IntegerType => input.getInt(i + 1)
          case LongType => input.getLong(i + 1)
          case StringType => input.getUTF8String(i + 1)
        }
        h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(v, keyTypes(i), h)
      }
    }
    val hi = h.toInt
    ((hi % n) + n) % n
  }
}

/** The catalog's `days` function — the date-partition-transform half
  * of SPJ: a day-partitioned graft scan reports
  * `KeyGroupedPartitioning(days(ts))`, Spark resolves the transform
  * against THIS function, and two tables day-partitioned on their join
  * timestamp join with no shuffle on either side. Semantics are
  * [[VersionedTable.epochDay]] — UTC epoch day via floorDiv(micros,
  * 86 400 000 000), the Iceberg `days` transform (the engine pins the
  * session to UTC, so there is no zone ambiguity).
  */
object GraftDaysFunction extends UnboundFunction {

  override def name(): String = "days"

  override def description(): String =
    "days(ts) — UTC epoch day (floorDiv(unix_micros, 86400000000)); " +
      "the graft day-partition layout function"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"days takes (timestamp), got ${inputType.length} args")
    inputType(0).dataType match {
      case TimestampType => GraftBoundDays
      case other => throw new UnsupportedOperationException(
        s"days supports timestamp keys, got ${other.catalogString}")
    }
  }
}

/** `days` bound to timestamp-micros. Stateless and serializable.
  * Nullable result with an explicit null guard (r14 advice): committed
  * day-partitioned data is non-null by the collectStats contract, but
  * Spark may still evaluate `days(null)` on the OTHER side of a
  * one-side-shuffle SPJ (pushPartValues hash-partitioning an
  * unpartitioned frame to match the layout) — `getLong(0)` on a null
  * slot returns an arbitrary value, so propagate SQL null instead.
  */
object GraftBoundDays extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(TimestampType)
  override def resultType(): DataType = DateType
  override def name(): String = "days"
  override def isResultNullable: Boolean = true
  override def canonicalName(): String = "graft.days(timestamp)"
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0)) null
    else VersionedTable.epochDay(input.getLong(0))
}

/** The catalog's `hours`/`months` functions (r15 — the rest of the
  * Iceberg time-transform family): hour-partitioned hot event tables
  * and month-partitioned archives get the same zero-shuffle SPJ the
  * `days` leg proved, through the same resolution path. Semantics are
  * [[VersionedTable.epochHour]] / [[VersionedTable.epochMonth]] — the
  * single definitions the write layout and stats verifier share.
  */
final class GraftTimeFunction(gran: String) extends UnboundFunction {
  override def name(): String = gran
  override def description(): String =
    s"$gran(ts) — UTC epoch ${gran.stripSuffix("s")} index; the graft " +
      "time-partition layout function"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"$gran takes (timestamp), got ${inputType.length} args")
    inputType(0).dataType match {
      case TimestampType => new GraftBoundTime(gran)
      case other => throw new UnsupportedOperationException(
        s"$gran supports timestamp keys, got ${other.catalogString}")
    }
  }
}

final class GraftBoundTime(gran: String) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(TimestampType)
  override def resultType(): DataType = IntegerType
  override def name(): String = gran
  override def isResultNullable: Boolean = true
  override def canonicalName(): String = s"graft.$gran(timestamp)"
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0)) null
    else VersionedTable.timePeriod(gran, input.getLong(0))
}

/** The catalog's `truncate` function (r16 — the last member of the
  * Iceberg transform family): a truncate-partitioned graft scan
  * reports `KeyGroupedPartitioning(truncate(w, col))`, Spark resolves
  * the transform against THIS function, and two prefix-partitioned
  * tables joining on the key shuffle NEITHER side. Semantics are
  * [[VersionedTable.truncLong]] (floor to a multiple of w) /
  * [[VersionedTable.truncStr]] (first w code points) — the single
  * definitions the write layout and stats verifier share.
  */
object GraftTruncateFunction extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(width, col) — long/int keys floor to a multiple of " +
      "width; string keys keep their first width code points; the " +
      "graft prefix-partition layout function"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"truncate takes (width, key), got ${inputType.length} args")
    require(inputType(0).dataType == IntegerType,
      s"truncate's first argument is the INT width, got " +
        s"${inputType(0).dataType.catalogString}")
    inputType(1).dataType match {
      case IntegerType | LongType | StringType =>
        new GraftBoundTruncate(inputType(1).dataType)
      case other => throw new UnsupportedOperationException(
        s"truncate supports int/long/string keys, got ${other.catalogString}")
    }
  }
}

/** `truncate` bound to a concrete key type. Long/int keys return LONG
  * (one canonical prefix domain for both integral widths — the write
  * layout casts to long before flooring, so the function must agree);
  * string keys return STRING. Null keys propagate SQL null (the
  * [[GraftBoundDays]] rule — the one-side-shuffle SPJ may evaluate
  * this over an unpartitioned frame).
  */
final class GraftBoundTruncate(keyType: DataType)
    extends ScalarFunction[Any] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType =
    if (keyType == StringType) StringType else LongType
  override def name(): String = "truncate"
  override def isResultNullable: Boolean = true
  override def canonicalName(): String =
    s"graft.truncate(${keyType.catalogString})"
  override def produceResult(input: InternalRow): Any = {
    if (input.isNullAt(1)) return null
    val w = input.getInt(0)
    // per-row arg, so the friendly check lives here (bind can't see the
    // value): truncate(0, k) would otherwise surface as a raw BigInt
    // modulus error, truncate(-1, s) as StringIndexOutOfBounds
    require(w >= 1, s"truncate width must be >= 1, got $w")
    keyType match {
      case StringType =>
        org.apache.spark.unsafe.types.UTF8String.fromString(
          VersionedTable.truncStr(input.getUTF8String(1).toString, w))
      case IntegerType => VersionedTable.truncLong(input.getInt(1).toLong, w)
      case _ => VersionedTable.truncLong(input.getLong(1), w)
    }
  }
}

/** The WIDTH-PINNED truncate family (`truncate_<w>(col)`) — what the
  * scan actually REPORTS for SPJ. Spark's KeyGroupedPartitioning
  * requires every partition expression to have exactly ONE leaf, and
  * its attribute-matching checks every leaf against the join keys — a
  * literal width argument fails both. `bucket` dodges this because
  * Spark special-cases BucketTransform (numBuckets travels out-of-band
  * in TransformExpression); the generic ApplyTransform path has no
  * such slot, so the width rides in the function NAME instead — one
  * single-leaf transform per width, resolved on demand by
  * [[GraftCatalog.loadFunction]] (`truncate_100`, `truncate_5`, ...),
  * exactly the shape the days/hours family already proves out.
  * Same-width scans share a `canonicalName` and co-partition; scans of
  * DIFFERENT widths never falsely claim compatibility (distinct
  * names). Semantics are the generic [[GraftTruncateFunction]]'s.
  */
final class GraftTruncateWidthFunction(w: Int) extends UnboundFunction {
  require(w >= 1, s"truncate width must be >= 1, got $w")
  override def name(): String = s"truncate_$w"
  override def description(): String =
    s"truncate_$w(col) — truncate(col) at pinned width $w; the graft " +
      "prefix-partition layout function SPJ resolves"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"truncate_$w takes (key), got ${inputType.length} args")
    inputType(0).dataType match {
      case IntegerType | LongType | StringType =>
        new GraftBoundTruncateW(inputType(0).dataType, w)
      case other => throw new UnsupportedOperationException(
        s"truncate_$w supports int/long/string keys, got " +
          other.catalogString)
    }
  }
}

final class GraftBoundTruncateW(keyType: DataType, w: Int)
    extends ScalarFunction[Any] {
  override def inputTypes(): Array[DataType] = Array(keyType)
  override def resultType(): DataType =
    if (keyType == StringType) StringType else LongType
  override def name(): String = s"truncate_$w"
  override def isResultNullable: Boolean = true
  override def canonicalName(): String =
    s"graft.truncate_$w(${keyType.catalogString})"
  override def produceResult(input: InternalRow): Any = {
    if (input.isNullAt(0)) return null
    keyType match {
      case StringType =>
        org.apache.spark.unsafe.types.UTF8String.fromString(
          VersionedTable.truncStr(input.getUTF8String(0).toString, w))
      case IntegerType => VersionedTable.truncLong(input.getInt(0).toLong, w)
      case _ => VersionedTable.truncLong(input.getLong(0), w)
    }
  }
}
