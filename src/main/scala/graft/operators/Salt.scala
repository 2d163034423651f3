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
    * pairs (name -> column to sum). Deterministic: the salt derives
    * from a hash of the row's columns, not rand() — the same input
    * produces the same partials. A per-partition uniquifier is mixed
    * into the hash so fully IDENTICAL duplicate rows of a hot key (a
    * common skew shape, e.g. replayed events) still spread across salt
    * buckets instead of collapsing the mitigation back to one reducer;
    * spark_partition_id only varies the salt, never the final merged
    * aggregate, so results stay partitioning-independent.
    */
  def sumsBySaltedKey(df: DataFrame, key: String, n: Int,
                      sums: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(
        (df.columns.map(col) :+ spark_partition_id().cast("long")).toSeq: _*)),
        lit(n)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sums.map { case (name, c) => sum(c).as(name) }.toSeq: _*)
    partial.groupBy(col(key))
      .agg(sum(col("__cnt")).as("n"),
        sums.keys.map(name => sum(col(name)).as(name)).toSeq: _*)
  }
}
