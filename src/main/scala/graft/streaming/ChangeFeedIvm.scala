package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.VersionedTable

/** Incremental view maintenance driven by the LIVE change feed — the
  * closing of the CDC loop: a grouped-aggregate materialized view
  * (`bucket → (n_rows, value sum)`) maintained from
  * `readStream.format("graft").option("readChangeFeed", "true")`,
  * never recomputed from the base table after bootstrap.
  *
  * Each micro-batch folds its change rows into per-bucket DELTAS
  * (`insert` → +1/+new, `delete` → −1/−old, `update` → new−old; the
  * linear-algebra view maintenance every SUM/COUNT view admits), then
  * publishes state ⊕ deltas as one commit of the VIEW's own
  * VersionedTable — so the view has time travel, a change feed, and
  * manifest aggregates of its own, and consumers read it like any
  * other graft table.
  *
  * Exactly-once: batch boundaries replay from the stream checkpoint,
  * and every state row carries `last_batch` (the batch id that
  * produced the snapshot) — a retried `foreachBatch` sees
  * `max(last_batch) >= id` and skips, so the delta can never
  * double-apply (the commit is atomic; the guard rides the committed
  * state itself, not a side marker).
  *
  * Scale shape: per batch, work ∝ change rows + |view| (the state
  * replace) — the base table is NEVER rescanned. At 100 TB the view
  * is bucket-sized (thousands of rows), so maintenance cost tracks
  * the ingest rate, exactly the IVM promise. Groups whose row count
  * reaches zero drop from the view (the SUM/COUNT-view deletion
  * rule).
  *
  * Reference: the view-maintenance construction is the classic
  * delta-rule formulation (self-maintainable SUM/COUNT views);
  * the graft specifics are the change-feed source (q166) and the
  * versioned state commit.
  */
object ChangeFeedIvm {

  /** Drain all pending commits of `tableBase`'s change feed into the
    * materialized view at `viewBase` (AvailableNow — the batch-job
    * form; a `trigger(ProcessingTime)` variant is the same call shape
    * minus the awaitTermination).
    *
    * @param bucketOf bucket expression over the change row's KEY
    *                 column (the view's group key)
    * @param valueCol base name of the maintained value column — the
    *                 feed carries it as `<valueCol>_old`/`<valueCol>_new`
    */
  def runAvailableNow(s: SparkSession, tableBase: String, viewBase: String,
                      cdcKey: String, bucketOf: Column => Column,
                      valueCol: String): Unit = {
    val q = s.readStream.format("graft")
      .option("readChangeFeed", "true").option("cdcKey", cdcKey)
      .load(tableBase)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$viewBase/_ckpt")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(s, viewBase, batch, id, cdcKey, bucketOf, valueCol)
      }
      .start()
    q.awaitTermination()
  }

  /** Fold one change-feed micro-batch into the view state — exposed
    * for the spec's idempotency case (calling it twice with the same
    * `id` must be a no-op).
    */
  def applyBatch(s: SparkSession, viewBase: String, batch: DataFrame,
                 id: Long, cdcKey: String, bucketOf: Column => Column,
                 valueCol: String): Unit = {
    val cur: Option[DataFrame] = VersionedTable.latestVersion(viewBase)
      .map(v => VersionedTable.readVersion(s, viewBase, v))
    // the retry guard: state rows carry the producing batch id
    if (cur.exists(c => c.agg(max(col("last_batch"))).head() match {
      case r if !r.isNullAt(0) => r.getLong(0) >= id
      case _ => false
    })) return
    val newC = col(s"${valueCol}_new")
    val oldC = col(s"${valueCol}_old")
    val deltas = batch.groupBy(bucketOf(col(cdcKey)).as("bucket"))
      .agg(
        sum(when(col("change_type") === "insert", 1L)
          .when(col("change_type") === "delete", -1L)
          .otherwise(0L)).as("n_rows"),
        sum(coalesce(newC, lit(0L)) - coalesce(oldC, lit(0L)))
          .as("value_sum"))
    val folded = cur match {
      case None => deltas
      case Some(c) => c.select(col("bucket"), col("n_rows"),
          col("value_sum"))
        .unionByName(deltas)
        .groupBy(col("bucket"))
        .agg(sum(col("n_rows")).as("n_rows"),
          sum(col("value_sum")).as("value_sum"))
    }
    VersionedTable.commitReplace(s, viewBase,
      folded.filter(col("n_rows") =!= 0L)
        .withColumn("last_batch", lit(id)),
      statsCols = Seq("bucket"))
    ()
  }
}
