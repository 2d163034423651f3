package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.ImageSource
import graft.receipts.{Enrichment, ExpenseAnalyzer, ReceiptPipeline}

/** T1-T4 — the reference's `anarcpt watch` mode rebuilt on Structured
  * Streaming (`watcher.py:26-54,121-157`, wired `main.py:79-132`).
  *
  * Reference shape: watchdog dir-observer → regex filter → stability
  * gate → hash/rename → analyze → bounded queue → batch DB insert, at
  * most once, state lost on crash. Rebuild: one streaming query — file
  * source (lists only completed files: S5's stability gate is free) →
  * hash → watermarked cross-batch dedup → enrichment seam →
  * flatten/pivot → `foreachBatch` batch insert (T2: micro-batch = queue
  * flush), checkpointed so recovery is exactly-once per sink (T3 —
  * documented upgrade over the reference's at-most-once). The
  * `Trigger.AvailableNow` variant is the Lambda/batch-over-new-objects
  * mode (T4, `aws_lambda_fn.py:4-17`).
  */
object WatchPipeline {

  /** binaryFile's fixed schema (streaming sources need it declared). */
  val binaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** S3/S4 — the watched directory as an unbounded stream with the
    * reference's filename filter (`watcher.py:58`).
    */
  def rawScans(spark: SparkSession, rawDir: String): DataFrame =
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", ImageSource.PathGlob)
      .schema(binaryFileSchema)
      .load(rawDir)

  /** Stage 1 (T1): content-address every scan and collapse re-scans —
    * J2's rename-to-hash as a watermarked streaming dedup with bounded
    * state (re-scans arriving within the watermark window are dropped;
    * the parquet/JDBC sink's key makes later dups idempotent).
    */
  def contentAddressed(raw: DataFrame): DataFrame =
    ImageSource.withHash(raw)
      .withWatermark("modificationTime", "1 hour")
      .dropDuplicatesWithinWatermark("img_hash")

  /** Stage 2 (T1) + T2/T3: analyze each micro-batch through the
    * enrichment seam and batch-append summaries to the sink. One
    * checkpointed query end-to-end; `sink` defaults to parquet append
    * (the engine's K1 shape — swap in `Sinks.jdbc` for DB parity).
    */
  def start(spark: SparkSession, rawDir: String, checkpointDir: String,
            analyzer: ExpenseAnalyzer, sink: DataFrame => Unit,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    contentAddressed(rawScans(spark, rawDir))
      .writeStream
      .queryName("graft_watch")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val responses = Enrichment.parse(Enrichment.analyze(batch, analyzer))
        sink(ReceiptPipeline.summarize(ReceiptPipeline.flattenSummary(responses)))
      }
      .start()

  /** T4 — event-driven batch-over-new-objects variant: drain everything
    * new (per the checkpoint) and stop.
    */
  def runAvailableNow(spark: SparkSession, rawDir: String, outDir: String,
                      checkpointDir: String,
                      analyzer: ExpenseAnalyzer =
                        new graft.receipts.FixtureAnalyzer()): Unit = {
    val q = start(spark, rawDir, checkpointDir, analyzer,
      batch => batch.write.mode("append").parquet(outDir),
      Trigger.AvailableNow())
    q.awaitTermination()
  }
}
