package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.SyntheticImages
import graft.streaming.WatchPipeline

/** The T1-T4 watch pipeline registered as a driver-checkable query:
  * synthetic scans → AvailableNow streaming run (hash → watermarked
  * dedup → enrichment seam → pivot → parquet batch append) → read the
  * sink back. Rows-only (streaming fixture path); WatchPipelineSpec
  * pins exactly-once and dedup semantics.
  */
object StreamingQueries {

  val all: Seq[Q] = Seq(
    Q("q48_watch_pipeline",
      (s, _) => {
        val scans = SyntheticImages.fixtureDir()
        val base = Files.createTempDirectory("graft_watch_q").toString
        WatchPipeline.runAvailableNow(s, scans, s"$base/out", s"$base/ckpt")
        s.read.parquet(s"$base/out")
          // key-sorted JSON: complex cells crash the driver's row-sort
          .withColumn("other_data",
            to_json(array_sort(map_entries(col("other_data")))))
          .drop("receipt_date") // fixture-constant; timestamp formatting noise
          .drop("batch_id") // sink partitioning detail
          .orderBy(col("img_id"))
      },
      None, bench = false))
}
