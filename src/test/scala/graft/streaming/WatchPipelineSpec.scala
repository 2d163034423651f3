package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.functions.SyntheticImages
import graft.receipts.FixtureAnalyzer

/** T1-T4 semantics: end-to-end AvailableNow run, checkpointed
  * exactly-once across restarts (T3), and cross-batch content dedup.
  */
class WatchPipelineSpec extends SparkSuite {

  private def freshDirs(): (Path, String, String, String) = {
    val base = Files.createTempDirectory("graft_watch_spec")
    val raw = base.resolve("raw")
    Files.createDirectories(raw)
    (raw, base.resolve("out").toString, base.resolve("ckpt").toString,
      base.toString)
  }

  private def scan(raw: Path, name: String, seed: Long): Unit =
    Files.write(raw.resolve(name),
      SyntheticImages.encode(SyntheticImages.blockImage(seed), "png"))

  test("watch pipeline: hash, dedup, enrich, batch-append (T1/T2/T4)") {
    val (raw, out, ckpt, _) = freshDirs()
    scan(raw, "Scan_001.png", 1)
    scan(raw, "Scan_002.png", 2)
    scan(raw, "Scan_003.png", 1) // re-scan of 001: same content address
    Files.write(raw.resolve("notes.txt"), "not an image".getBytes)

    WatchPipeline.runAvailableNow(spark, raw.toString, out, ckpt,
      new FixtureAnalyzer())
    val result = spark.read.parquet(out)
    assert(result.count() === 2) // glob dropped .txt, dedup collapsed re-scan
    assert(result.select("img_id").distinct().count() === 2)
    // enrichment seam filled the pivoted summary from the fixture
    assert(result.select("vendor_name").distinct().head().getString(0).nonEmpty)
  }

  test("parquet batch sink is idempotent per batchId (replay-safe T3)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_sink").toString
    val sink = WatchPipeline.parquetBatchSink(out)
    val batch = Seq(("img_a", 1), ("img_b", 2)).toDF("img_id", "v")
    sink(batch, 7L)
    sink(batch, 7L) // crash-replay of the same micro-batch
    assert(spark.read.parquet(out).count() === 2) // overwrote, not appended
    sink(batch, 8L) // a genuinely new batch appends
    assert(spark.read.parquet(out).count() === 4)
  }

  test("checkpoint recovery is exactly-once; dedup state survives (T3)") {
    val (raw, out, ckpt, _) = freshDirs()
    scan(raw, "Scan_001.png", 1)
    scan(raw, "Scan_002.png", 2)
    WatchPipeline.runAvailableNow(spark, raw.toString, out, ckpt,
      new FixtureAnalyzer())
    assert(spark.read.parquet(out).count() === 2)

    // restart: one genuinely new scan + one re-scan of a prior batch's
    // content. The old files must not reprocess (checkpoint) and the
    // re-scan must be dropped by the watermarked dedup state.
    scan(raw, "Scan_003.png", 3)
    scan(raw, "Scan_004.png", 1)
    WatchPipeline.runAvailableNow(spark, raw.toString, out, ckpt,
      new FixtureAnalyzer())
    val result = spark.read.parquet(out)
    assert(result.count() === 3, "expected exactly one new summary")
    assert(result.select("img_id").distinct().count() === 3)
  }
}
