package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting: a groupBy whose key distribution is
  * dominated by a few hot keys (one vendor, one user, one null bucket)
  * sends each hot key's entire volume through one reducer. Salting
  * splits every key into `n` sub-keys for a partial aggregate, then
  * merges the partials — two shuffles, each balanced, versus one
  * skewed. Use for algebraic aggregates (sum/count/min/max); AQE's
  * skew handling covers joins, this covers aggregation.
  */
object Salt {

  /** Salted two-phase sum/count aggregation. `aggs` must be algebraic
    * pairs (name -> column to sum). The salt is a constant-width hash
    * of (key, per-row uniquifier) — NOT a hash of the whole row, whose
    * cost grows with row width for a value that only needs to spread
    * rows. `monotonically_increasing_id` (partition id in the high
    * bits, row position in the low) uniquifies fully IDENTICAL
    * duplicate rows of a hot key (a common skew shape, e.g. replayed
    * events) so they still fan out across salt buckets. The salt never
    * reaches the final merged aggregate — phase 2 re-merges purely by
    * `key` — so the RESULT is salt- and partitioning-independent.
    *
    * Cluster-failure hazard (same class GlobalRank documents): the
    * salt assignment itself depends on physical partitioning, so a
    * map-task recompute after executor loss can re-salt rows into
    * different (key, __salt) partials than some reducers already
    * fetched. A cluster deployment with flaky executors should
    * materialize the salted frame via reliable `checkpoint()` (see
    * [[graft.operators.Reliable]]) before the partial aggregate.
    */
  def sumsBySaltedKey(df: DataFrame, key: String, n: Int,
                      sums: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(n)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sums.map { case (name, c) => sum(c).as(name) }.toSeq: _*)
    partial.groupBy(col(key))
      .agg(sum(col("__cnt")).as("n"),
        sums.keys.map(name => sum(col(name)).as(name)).toSeq: _*)
  }
}
