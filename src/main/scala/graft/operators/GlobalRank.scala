package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale-safe exact global ranking / ntile.
  *
  * `Window.orderBy(...)` with no partition funnels the whole table
  * through ONE task — the classic 100 TB scale-killer. This operator
  * computes the identical ranks with bounded per-task work:
  *
  *  1. `repartitionByRange` on the sort key (each partition holds a
  *     contiguous key range),
  *  2. local sort + `monotonically_increasing_id` (encodes
  *     partition-id << 33 | local-index, so local order is recoverable
  *     without another shuffle),
  *  3. per-partition row counts → cumulative offsets (a ~#partitions-row
  *     aggregate, broadcast back),
  *  4. global rank = offset(partition) + local index + 1.
  *
  * The ranked frame is persisted so the offsets aggregate and the final
  * output observe the SAME range partitioning (repartitionByRange
  * samples its boundaries per evaluation; two evaluations could
  * disagree). The cached blocks live until the caller drops them —
  * long-lived sessions composing this operator should
  * `spark.catalog.clearCache()` (as Verify/Bench do per query) or
  * unpersist after consuming the result.
  *
  * Cluster-failure hazard (same class ConnectedComponents documents):
  * consistency between the offsets aggregate and the final join relies
  * on the persisted `sorted` frame never being recomputed. Executor
  * loss drops MEMORY_AND_DISK blocks, and a recompute re-runs
  * `monotonically_increasing_id` — if any upstream is non-deterministic
  * the ids (hence ranks) could silently shift. The escape hatch is
  * [[Reliable]]: set `spark.graft.reliableCheckpoints=true` plus a
  * checkpoint dir and the sorted frame goes through a reliable
  * `checkpoint()` instead, making recomputation impossible.
  *
  * Results are bit-identical to `row_number() OVER (ORDER BY ...)` /
  * `NTILE(k) OVER (ORDER BY ...)` when the sort key is a total order
  * (include a unique tiebreak column).
  */
object GlobalRank {

  private val LocalIdxBits = 33
  private val LocalIdxMask = (1L << LocalIdxBits) - 1

  /** Adds `rankCol` = exact 1-based global rank by `sortCols` (must be a
    * total order) and `__n` = total row count, without a global
    * single-partition sort.
    */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column], rankCol: String,
                     numPartitions: Int = 32): DataFrame = {
    val sorted = Reliable.barrier(df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id()))(
      _.persist(StorageLevel.MEMORY_AND_DISK))
    val pid = shiftrightunsigned(col("__mid"), LocalIdxBits).as("__pid")
    // tiny: one row per partition; the single-partition window is over
    // #partitions rows, not the data.
    val offsets = sorted.groupBy(pid).agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid"), col("__offset"), col("__n"))
    sorted
      .withColumn("__pid", shiftrightunsigned(col("__mid"), LocalIdxBits))
      .join(broadcast(offsets), "__pid")
      .withColumn(rankCol,
        col("__offset") + col("__mid").bitwiseAND(LocalIdxMask) + 1)
      .drop("__pid", "__mid", "__offset")
  }

  /** Adds `rankCol` (exact 1-based global rank by `sortCols`) AND
    * `cumCol` (exact running sum of `value` in that order) plus
    * `totalCol` (the grand total) — the global cumulative-distribution
    * primitive (coverage curves, Lorenz/Zipf tables) with NO global
    * single-partition window. Same two-phase shape as
    * [[withGlobalRank]]: the offsets aggregate additionally carries
    * per-partition value sums; the within-partition running sum is a
    * window PARTITIONED by the range-partition id, so each window task
    * sees one partition's rows, never the table. `value` should be
    * integral (long) — the running sum is then exact and
    * order-independent across engines.
    */
  def withGlobalCumSum(df: DataFrame, sortCols: Seq[Column], value: Column,
                       rankCol: String, cumCol: String, totalCol: String,
                       numPartitions: Int = 32): DataFrame = {
    val sorted = Reliable.barrier(df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__v", value)
      .withColumn("__mid", monotonically_increasing_id()))(
      _.persist(StorageLevel.MEMORY_AND_DISK))
    val pid = shiftrightunsigned(col("__mid"), LocalIdxBits)
    // one row per partition; both windows run over #partitions rows
    val offsets = sorted.groupBy(pid.as("__pid"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__v")).as("__psum"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("__voffset",
        coalesce(sum(col("__psum")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn(totalCol, sum(col("__psum")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid"), col("__offset"), col("__voffset"), col(totalCol))
    sorted
      .withColumn("__pid", shiftrightunsigned(col("__mid"), LocalIdxBits))
      .withColumn("__lcum", sum(col("__v")).over(
        Window.partitionBy(col("__pid")).orderBy(col("__mid"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(offsets), "__pid")
      .withColumn(rankCol,
        col("__offset") + col("__mid").bitwiseAND(LocalIdxMask) + 1)
      .withColumn(cumCol, col("__voffset") + col("__lcum"))
      .drop("__pid", "__mid", "__v", "__lcum", "__offset", "__voffset")
  }

  /** Adds `strictCol` = exact running MAX of `value` over all
    * STRICTLY-preceding rows in the global `sortCols` order (null for
    * the global first row) — the prefix-dominance primitive (skyline /
    * pareto-frontier queries, staircase envelopes) with NO global
    * single-partition window. Two-phase like [[withGlobalCumSum]]: the
    * offsets aggregate carries per-partition maxes, the broadcast side
    * turns them into a strict prefix max across partitions, and the
    * within-partition strict prefix max is a window PARTITIONED by the
    * range-partition id with frame (unboundedPreceding, -1).
    * `greatest` merges the two (it ignores nulls unless both are null,
    * which is exactly the wanted identity element).
    */
  def withGlobalStrictCumMax(df: DataFrame, sortCols: Seq[Column],
                             value: Column, strictCol: String,
                             numPartitions: Int = 32): DataFrame = {
    val sorted = Reliable.barrier(df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__v", value)
      .withColumn("__mid", monotonically_increasing_id()))(
      _.persist(StorageLevel.MEMORY_AND_DISK))
    val pid = shiftrightunsigned(col("__mid"), LocalIdxBits)
    // one row per partition; the window runs over #partitions rows
    val offsets = sorted.groupBy(pid.as("__pid"))
      .agg(max(col("__v")).as("__pmax"))
      .withColumn("__moffset", max(col("__pmax")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pid"), col("__moffset"))
    sorted
      .withColumn("__pid", shiftrightunsigned(col("__mid"), LocalIdxBits))
      .withColumn("__lmax", max(col("__v")).over(
        Window.partitionBy(col("__pid")).orderBy(col("__mid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .join(broadcast(offsets), "__pid")
      .withColumn(strictCol, greatest(col("__lmax"), col("__moffset")))
      .drop("__pid", "__mid", "__v", "__lmax", "__moffset")
  }

  /** Exact NTILE(k) over a global order, two-phase. Same bucket
    * assignment as the SQL window function: with N rows, the first
    * `N % k` buckets get `ceil(N/k)` rows, the rest `floor(N/k)`.
    */
  def ntile(df: DataFrame, k: Int, sortCols: Seq[Column], bucketCol: String,
            numPartitions: Int = 32): DataFrame = {
    val ranked = withGlobalRank(df, sortCols, "__rank", numPartitions)
    val q = floor(col("__n") / k) // floor(long/int double div) -> long
    val big = col("__n") % k // buckets with q+1 rows
    val cutoff = big * (q + 1) // ranks <= cutoff are in big buckets
    ranked
      .withColumn(bucketCol,
        when(col("__rank") <= cutoff,
          (floor((col("__rank") - 1) / (q + 1)) + 1).cast("int"))
        .otherwise(
          (big + floor((col("__rank") - cutoff - 1) / q) + 1).cast("int")))
      .drop("__rank", "__n")
  }
}
