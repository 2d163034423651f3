package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key top-k that survives low key cardinality.
  *
  * `row_number().over(Window.partitionBy(key))` funnels every row of a
  * key through one task — with few keys (e.g. 3 query vectors against
  * the whole corpus) that is a single-task sort of the table. Two-phase
  * instead:
  *
  *  1. rank within (key, input-partition) and keep k survivors per
  *     partition — the shuffle key (key, __pid) spreads across all
  *     tasks, so no skew;
  *  2. rank the ≤ k·P survivors per key — bounded input, safe window.
  *
  * Identical output to the single window (both phases use the same
  * total order; phase 1 can never drop a global top-k row).
  */
object TopK {
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
             rankCol: String = "rank"): DataFrame = {
    val local = Window
      .partitionBy((keys.map(col) :+ col("__pid")): _*).orderBy(order: _*)
    val global = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(local))
      .filter(col("__lrn") <= k)
      .withColumn(rankCol, row_number().over(global))
      .filter(col(rankCol) <= k)
      .drop("__pid", "__lrn")
  }

  /** Exact GLOBAL top-k (no key). `perKey` with a constant key is NOT
    * this: Catalyst folds the literal partition expression away and the
    * phase-2 window runs partitionless — every survivor (k·P rows; at
    * 100k tasks and k=20 that's 2M rows) through ONE task, which the
    * registry-wide plan sweep rightly flags. Here phase 1 prunes to k
    * survivors per input partition as before, and phase 2 ranks them
    * through [[GlobalRank]]'s two-phase offsets shape — bounded
    * per-task work everywhere, no partitionless window in the plan.
    * `order` must be a total order (include a unique tiebreak), which
    * also makes the result identical to `row_number() OVER (ORDER BY
    * order)` filtered to k.
    */
  def global(df: DataFrame, order: Seq[Column], k: Int,
             rankCol: String = "rank"): DataFrame = {
    val local = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val survivors = df.withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(local))
      .filter(col("__lrn") <= k)
      .drop("__pid", "__lrn")
    GlobalRank.withGlobalRank(survivors, order, rankCol)
      .filter(col(rankCol) <= k)
      .drop("__n")
  }
}
