package graft.sources

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.{StructField, StructType}

import graft.operators.VersionedTable

/** The graft table format as a STRUCTURED STREAMING source — the
  * commit log itself is the stream: `spark.readStream.format("graft")
  * .load(base)` tails the table, one offset per committed version
  * (the Delta-source shape; Delta's own `DeltaSource` is this same V1
  * `Source` API). Micro-batch planning is pure commit-log metadata:
  *
  *   - offset = the latest committed version (a `LongOffset`, so the
  *     sink's checkpoint records "consumed through version v" — restart
  *     resumes from the log position, exactly once);
  *   - the DEFAULT start is Delta's: the first batch is the full
  *     snapshot at the stream's first-seen version, subsequent batches
  *     are the per-commit tail — a consumer attaching to a compacted /
  *     merged table starts from its current state, not from a replay
  *     that would double-count rewritten rows;
  *   - `startingVersion` (a version number, or `latest` for
  *     only-new-commits) switches to the per-commit replay start;
  *   - a tail batch for commits `(start, end]` reads ONLY the files
  *     those commits ADDED (`VersionedTable.commitDelta` — a pure
  *     append's added files ARE its inserted rows), so batch cost is
  *     ∝ the delta, never ∝ the table: the q158 change-feed argument,
  *     now feeding a live query;
  *   - a commit that REMOVED files (delete / merge / compaction /
  *     replace) cannot stream as appends: the source fails loudly by
  *     default, or skips the commit whole under
  *     `skipChangeCommits=true` (Delta's option and caveat verbatim —
  *     rewritten rows are NOT re-emitted).
  *
  * Schema is pinned at stream start (the declared schema of the
  * resolved version): later evolved-in columns are ignored, files
  * predating an ADD COLUMN null-fill — each batch reads through the
  * same StructType, so the query's resolved plan never drifts.
  *
  * Retention contract: tailing needs the range's commit markers and
  * data files to still exist — vacuum retention must cover consumer
  * lag (the same precondition Delta's CDF read documents; a vacuumed
  * marker fails the batch loudly via `commitDelta`'s require).
  */
class GraftStreamSource(spark: SparkSession, base: String,
                        sourceSchema: StructType, snapshotStart: Boolean,
                        fromVersion: Long, skipChangeCommits: Boolean)
    extends Source with SupportsTriggerAvailableNow {

  private val readSchema =
    StructType(sourceSchema.fields.map(_.copy(nullable = true)))

  override def schema: StructType = sourceSchema

  private def ver(o: OffsetV2): Long = o.json.trim.toLong

  private def currentLatest(): Option[Long] =
    VersionedTable.latestVersion(base)
      .filter(v => snapshotStart || v >= fromVersion)

  override def getOffset: Option[Offset] = currentLatest().map(LongOffset(_))

  // ----- Trigger.AvailableNow, first-class (the FileStreamSource /
  // Delta-source admission-control contract): the drain is bounded to
  // the versions committed when the trigger fired, so a run terminates
  // even while writers keep committing — no wrapper, no single-batch
  // fallback warning.
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = currentLatest()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val capped = currentLatest().map(l =>
      availableNowCap.fold(l)(math.min(l, _)))
    capped.map(LongOffset(_)).orNull
  }

  override def reportLatestOffset(): OffsetV2 =
    currentLatest().map(LongOffset(_)).orNull

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = ver(end)
    val paths = start match {
      case None if snapshotStart =>
        // first batch: the full snapshot at the stream's start version
        VersionedTable.entries(base, endV).map(_.path)
      case _ =>
        val lo = start.map(ver(_) + 1L).getOrElse(fromVersion)
        (lo to endV).flatMap { v =>
          val (op, adds, removes) = VersionedTable.commitDelta(base, v)
          if (removes.isEmpty) adds.map(_.path)
          else if (skipChangeCommits) Seq.empty
          else throw new IllegalStateException(
            s"graft stream over $base hit change commit v$v (op=$op): a " +
              "commit that removes files cannot stream as appends — set " +
              "skipChangeCommits=true to skip rewrite commits (their " +
              "re-written rows will NOT be re-emitted)")
        }
    }
    if (paths.isEmpty) GraftBridge.streamingEmpty(spark, readSchema)
    else GraftBridge.streamingScan(spark, paths.map(p => s"$base/$p"),
      readSchema)
  }

  override def stop(): Unit = ()
}
