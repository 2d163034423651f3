package graft.receipts

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** U2 — the external-enrichment seam (reference: boto3
  * `textract.analyze_expense`, `anarcptlib.py:113,121,128-131`). The
  * remote ML call is I/O, not compute, so it lives behind an interface:
  * `open()` runs once per partition (the client-per-worker shape —
  * connection reuse, no per-row setup) and returns the per-image call.
  * Tests and the offline pipeline plug in [[FixtureAnalyzer]]; a real
  * deployment would supply an implementation that holds an HTTP client.
  */
trait ExpenseAnalyzer extends Serializable {
  /** Per-partition initialization; returns (imgId, imageBytes) → raw
    * analyze_expense response JSON.
    */
  def open(): (String, Array[Byte]) => String
}

/** Deterministic offline implementation: replays a captured
  * analyze_expense response (the reference's own dev fixture — the only
  * real responses that exist) for every image.
  */
final class FixtureAnalyzer(path: String = "/root/reference/output1.json")
    extends ExpenseAnalyzer {
  def open(): (String, Array[Byte]) => String = {
    val json = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    (_, _) => json
  }
}

object Enrichment {

  /** (img_id, content) → (img_id, response). mapPartitions, not a UDF:
    * the analyzer opens one "client" per partition and streams rows
    * through it.
    */
  def analyze(images: DataFrame, analyzer: ExpenseAnalyzer): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("img_id"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val client = analyzer.open()
        it.map { case (id, bytes) => (id, client(id, bytes)) }
      }
      .toDF("img_id", "response")
  }

  /** Parse raw response JSON into the `readResponses` shape (S6 parity)
    * so the batch pipeline's flatten/pivot runs unchanged downstream.
    */
  def parse(responses: DataFrame): DataFrame =
    responses
      .select(col("img_id"),
        from_json(col("response"), TextractSchema.response).as("r"))
      .select(col("img_id"), col("r.*"))
}
