package graft.sources

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.VersionedTable

/** The graft format as a native STREAMING SINK —
  * `df.writeStream.format("graft").option("path", base)` — closing the
  * format's streaming loop (the source side is [[GraftStreamSource]]).
  *
  * Exactly-once: Structured Streaming guarantees at-least-once
  * delivery to a V1 sink — after a crash, the engine REPLAYS the last
  * unacknowledged micro-batch. The sink turns that into exactly-once
  * the way Delta's does: every commit is stamped with a writer
  * transaction `(appId, batchId)` in the commit-log marker, and
  * `addBatch` first asks [[VersionedTable.lastCommittedTxn]] whether
  * this (or a later) batch already committed — a replayed batch is a
  * driver-plane no-op, never a duplicate append. The stamp and the
  * manifest publish are ONE atomic create-exclusive marker write, so
  * there is no window where data landed but the stamp didn't.
  *
  * `appId` defaults to the query's checkpoint location (the identity
  * that survives restarts — same checkpoint ⟹ same stream), with a
  * `txnAppId` option override for writers that move checkpoints.
  *
  * Output modes: Append ⟹ [[VersionedTable.commitAppend]] (one
  * O(delta) commit per micro-batch); Complete ⟹
  * [[VersionedTable.commitReplace]] (the aggregate-refresh shape —
  * each batch's full result replaces the table). Update mode is
  * rejected: upserts need a key, which is [[graft.streaming
  * .UpsertPipeline]]'s merge-commit job, not a mode flag.
  *
  * Scale: each micro-batch writes only its own files plus one marker —
  * the manifest delta discipline means a year of micro-batches on a
  * 100 TB table never rewrites the file list; zone-map/bloom stats
  * ride the same `statsCols`/`bloomCols` options the batch writer
  * takes, so downstream reads prune streaming-written data identically.
  */
class GraftSink(spark: SparkSession, base: String, appId: String,
                mode: OutputMode, statsCols: Seq[String],
                bloomCols: Seq[String],
                autoCompact: Option[(Long, Int)] = None) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (VersionedTable.lastCommittedTxn(base, appId).exists(_ >= batchId))
      return // replayed micro-batch: its commit already published
    val batch = GraftBridge.batchOf(data)
    val txn = Some(appId -> batchId)
    if (mode == OutputMode.Complete())
      VersionedTable.commitReplace(spark, base, batch, statsCols,
        bloomCols = bloomCols, txn = txn)
    else
      VersionedTable.commitAppend(spark, base, batch, statsCols,
        bloomCols = bloomCols, txn = txn)
    // AUTO-COMPACTION (the Delta autoOptimize shape): once the
    // small-file debt passes the trigger count, fold it with one
    // incremental compactSmall — O(small files), inline with the
    // stream, so a long-running sink never needs an external
    // maintenance job to stay readable. The compaction commit is NOT
    // txn-stamped (it moves no rows); a crash between the batch
    // commit and the compaction just defers folding to a later batch.
    autoCompact.foreach { case (smallBytes, trigger) =>
      val v = VersionedTable.latestVersion(base).get
      val smallN = VersionedTable.entries(base, v).count { e =>
        java.nio.file.Files.size(
          java.nio.file.Paths.get(base, e.path)) < smallBytes
      }
      if (smallN >= trigger)
        VersionedTable.compactSmall(spark, base, smallBytes,
          targetBytes = math.max(smallBytes * trigger, smallBytes))
    }
    ()
  }

  override def toString: String = s"GraftSink[$base]"
}
