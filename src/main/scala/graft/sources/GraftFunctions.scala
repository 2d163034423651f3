package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

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
    require(inputType.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.length} args")
    require(inputType(0).dataType == IntegerType,
      s"bucket's first argument is the INT bucket count, got " +
        s"${inputType(0).dataType.catalogString}")
    val keyType = inputType(1).dataType
    keyType match {
      case IntegerType | LongType | StringType =>
      case other => throw new UnsupportedOperationException(
        s"bucket supports int/long/string keys, got ${other.catalogString}")
    }
    new GraftBoundBucket(keyType)
  }
}

/** `bucket` bound to a concrete key type. Stateless and serializable —
  * it ships into tasks when Spark evaluates the transform.
  */
final class GraftBoundBucket(keyType: DataType)
    extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def isResultNullable: Boolean = false

  /** Type-qualified: murmur3(int) ≠ murmur3(long) ≠ murmur3(string),
    * so only same-key-type scans may claim the same function.
    */
  override def canonicalName(): String =
    s"graft.bucket(${keyType.catalogString})"

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    if (input.isNullAt(1)) {
      // a null key leaves the murmur3 seed untouched — the same
      // partition index the write's HashPartitioning assigned nulls
      ((42 % n) + n) % n
    } else {
      val v: Any = keyType match {
        case IntegerType => input.getInt(1)
        case LongType => input.getLong(1)
        case StringType => input.getUTF8String(1)
      }
      VersionedTable.bucketId(v, keyType, n)
    }
  }
}
