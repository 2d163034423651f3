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
    * registry-wide plan sweep rightly flags. Here the top-k itself is
    * Spark's native `ORDER BY ... LIMIT k` shape — planned as
    * TakeOrderedAndProject: each task keeps its own top-k heap, one
    * bounded merge of P·k rows, never a full sort — and the rank is a
    * local id over the k surviving rows (one partition of k rows by
    * construction, not a data funnel). No window operator in the plan
    * at all.
    *
    * `order` must be a total order (include a unique tiebreak) — the
    * result is then identical to `row_number() OVER (ORDER BY order)`
    * filtered to k. `k` must be a genuine top-k (small — Spark falls
    * back to a global sort past `topKSortFallbackThreshold`); to rank
    * EVERY row, use [[GlobalRank.withGlobalRank]] instead.
    */
  def global(df: DataFrame, order: Seq[Column], k: Int,
             rankCol: String = "rank"): DataFrame =
    df.orderBy(order: _*).limit(k)
      .coalesce(1).sortWithinPartitions(order: _*)
      .withColumn(rankCol, (monotonically_increasing_id() + 1).cast("int"))
}
