package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.receipts.ReceiptPipeline

/** The receipt pipeline registered as driver-checkable queries. These
  * run over the reference's captured Textract fixture (the only real
  * receipt data that exists — SURVEY.md §5), independent of the sfDir
  * argument, and carry no DuckDB oracle (nested-JSON pivot semantics are
  * asserted by the golden ScalaTests instead) → the driver records the
  * weaker rows-only check for them.
  */
object Receipts {

  /** Strict-JSON analyze_expense fixture (read-only reference data). */
  val FixturePath = "/root/reference/output1.json"

  val all: Seq[Q] = Seq(
    Q("receipt_p1_flatten",
      (s, _) => ReceiptPipeline
        .flattenSummary(ReceiptPipeline.readResponses(s, FixturePath))
        .drop("doc_pos", "field_pos"),
      None, bench = false),

    Q("receipt_a1_summary",
      (s, _) => ReceiptPipeline
        .summaries(ReceiptPipeline.readResponses(s, FixturePath))
        .toDF()
        // map ordering is unspecified in parquet; emit key-sorted entries
        // serialized to JSON — complex-typed cells crash the driver's
        // row-sort (unhashable ndarray), so registered outputs are scalar
        .withColumn("other_data",
          to_json(array_sort(map_entries(col("other_data"))))),
      None, bench = false),

    Q("receipt_a3_line_items",
      (s, _) => ReceiptPipeline
        .items(ReceiptPipeline.readResponses(s, FixturePath)).toDF(),
      None, bench = false),

    Q("receipt_s7_csv_items",
      (s, _) => {
        val responses = ReceiptPipeline.readResponses(s, FixturePath)
        ReceiptPipeline.itemsViaCsv(ReceiptPipeline.renderItemsCsv(responses))
      },
      None, bench = false),

    Q("receipt_j1_joined",
      (s, _) => ReceiptPipeline
        .joined(ReceiptPipeline.readResponses(s, FixturePath))
        .withColumn("other_data",
          to_json(array_sort(map_entries(col("other_data"))))),
      None, bench = false))
}
