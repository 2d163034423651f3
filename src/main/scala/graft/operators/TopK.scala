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
}
