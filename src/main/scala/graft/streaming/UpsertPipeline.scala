package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC upsert (SCD1 / MERGE INTO discipline) over a keyed
  * stream: every micro-batch is reduced to a per-key argmax delta
  * (latest row by `ordCols`, the q21 max-of-struct pattern) and merged
  * into a versioned current-state table by the same argmax over
  * state ∪ delta. The merge is associative, so micro-batch arrival
  * order cannot change the final state; each batch writes a NEW
  * versioned dir (read-current/write-next/swap — what a plain-parquet
  * state table needs; on Delta/Iceberg the closure is one MERGE INTO).
  *
  * Scale: per-batch work is one key-grouped reduce; the state table is
  * dimension-sized (one row per key), so the merge union reads state +
  * delta, never the stream's history. Registered as q129.
  */
object UpsertPipeline {

  /** Drains `inDir` (one micro-batch per file via maxFilesPerTrigger=1)
    * and returns (final state DataFrame, number of micro-batches run).
    * `keyCol` identifies the entity; `ordCols` order its versions
    * (last wins; must be a total order per key for determinism).
    */
  def runAvailableNow(s: SparkSession, inDir: String, base: String,
                      schema: org.apache.spark.sql.types.StructType,
                      keyCol: String, ordCols: Seq[String]): (DataFrame, Long) = {
    val valCols = schema.fieldNames.filterNot(_ == keyCol)
    // the per-key latest-row reduce shared with the versioned-table
    // MERGE closure (q138) — one definition of "latest wins"
    def argmax(df: DataFrame): DataFrame =
      graft.operators.VersionedTable.argmaxLatest(df, keyCol, ordCols)
    // The streaming checkpoint at $base/ckpt persists batch offsets, so
    // a rerun against the same base skips already-committed batches —
    // the current-state pointer must be recovered from disk (highest
    // committed state_* dir), not assumed empty, or the drain would
    // silently return stale/empty state after a restart.
    val committed = Option(new java.io.File(base).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("state_") &&
        f.getName.stripPrefix("state_").forall(_.isDigit))
    val latest = new java.util.concurrent.atomic.AtomicReference[String](
      if (committed.isEmpty) null
      else committed.maxBy(_.getName.stripPrefix("state_").toLong).getAbsolutePath)
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = argmax(batch)
        val merged = Option(latest.get) match {
          case Some(prev) => argmax(delta.unionByName(s.read.parquet(prev)))
          case None => delta
        }
        val next = s"$base/state_$batchId"
        merged.write.mode("overwrite").parquet(next)
        latest.set(next)
        batches.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    // zero micro-batches (a drain with no pending files) is a
    // legitimate outcome: return an empty state frame in the output
    // shape (key first, then value columns) instead of dereferencing
    // a never-set state pointer
    val state = Option(latest.get) match {
      case Some(p) => s.read.parquet(p)
      case None => s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          schema(keyCol) +: valCols.map(schema(_))))
    }
    (state, batches.get)
  }
}
