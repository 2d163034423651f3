package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.receipts.ReceiptPipeline

/** The receipt pipeline registered as driver-checkable queries over the
  * reference's captured Textract fixture (the only real receipt data
  * that exists — SURVEY.md §5), independent of the sfDir argument.
  *
  * Each entry carries a DuckDB oracle that recomputes the same result
  * from the raw fixture via `read_json_auto` + unnest — the nested
  * flatten (P1), the last-match pivots (A1), the line-item extraction
  * (A3, and S7's CSV-parity twin which must equal it exactly), and the
  * summary↔items join (J1). Independent ground truth for the same
  * pipeline lives in the reference's own expected outputs
  * (`output-7e7.json`/`output-7ff.json`), pinned by ReceiptPipelineSpec.
  *
  * Output shaping follows the driver contract (Q.scala): money as
  * floor-scaled bigints on BOTH sides, timestamps as strings, map
  * columns as key-sorted JSON text, a total ORDER BY on position keys
  * (explicit NULLS FIRST in the SQL — DuckDB defaults NULLS LAST where
  * Spark's ascending sort puts them first).
  */
object Receipts {

  /** Strict-JSON analyze_expense fixture (read-only reference data). */
  val FixturePath = "/root/reference/output1.json"

  /** Shared CTEs: response → positioned SummaryFields rows (P1's
    * posexplode twin — generate_subscripts zips with unnest, 1-based).
    * `private[queries]`: q48's watch-pipeline oracle reuses the
    * summary twin (the sink state is this summary keyed by the
    * fixture's distinct blobs).
    */
  private[queries] val FlatCtes = s"""
    resp AS (SELECT * FROM read_json_auto('$FixturePath')),
    docs AS (
      SELECT 'output1' AS img_id,
             CAST(generate_subscripts(ExpenseDocuments, 1) - 1 AS INT) AS doc_pos,
             unnest(ExpenseDocuments) AS ed
      FROM resp),
    flat AS (
      SELECT img_id, doc_pos,
             CAST(generate_subscripts(ed.SummaryFields, 1) - 1 AS INT) AS field_pos,
             unnest(ed.SummaryFields) AS sf
      FROM docs)"""

  /** F2 cleanValue twin: strip '$' (all occurrences), trim. */
  private def cleanSql(c: String) =
    s"trim(regexp_replace($c, '\\$$', '', 'g'))"

  /** F1 moneyVal twin: reference regex anchored at start, no match → 0,
    * commas stripped, overflow → NULL; scaled to cents (the driver's
    * no-raw-DECIMAL output contract).
    */
  private def moneyE2Sql(c: String) = {
    val pat = "'^[£$€]?([,\\d]+.?\\d*)'"
    s"""CAST(coalesce(
         CASE WHEN regexp_extract($c, $pat, 1) = '' THEN CAST(0 AS DECIMAL(6,2))
              ELSE TRY_CAST(replace(regexp_extract($c, $pat, 1), ',', '')
                            AS DECIMAL(6,2)) END,
         CAST(0 AS DECIMAL(6,2))) * 100 AS BIGINT)"""
  }

  /** F4 fuzzyDate twin over the same format list, rendered as text. */
  private def dateSql(c: String) =
    s"""strftime(try_strptime(trim($c),
         ['%b %d,%Y %H:%M','%b %d,%Y','%b %d, %Y %H:%M','%b %d, %Y',
          '%d %b %Y %H:%M','%d %b %Y','%b %d %Y %H:%M','%b %d %Y',
          '%m/%d/%Y %H:%M','%m/%d/%Y','%m/%d/%y',
          '%Y-%m-%d %H:%M:%S','%Y-%m-%d %H:%M','%Y-%m-%d']),
       '%Y-%m-%d %H:%M:%S')"""

  /** A1 lastMatch twin: latest-in-document-order non-null cleaned value
    * where the type predicate holds.
    */
  private def lastMatchSql(cond: String) =
    s"""arg_max(${cleanSql("sf.ValueDetection.Text")},
                doc_pos * 1000000 + field_pos)
         FILTER (WHERE ($cond) AND sf.ValueDetection.Text IS NOT NULL)"""

  /** A1 CTEs on top of [[FlatCtes]]: per-receipt pivot + OTHER map. */
  private[queries] val SummaryCtes = s"""
    lastv AS (
      SELECT img_id,
        ${lastMatchSql("sf.Type.Text = 'VENDOR_NAME'")} AS vendor_raw,
        ${lastMatchSql("sf.Type.Text = 'RECEIVER_ADDRESS'")} AS receiver_address,
        ${lastMatchSql("sf.Type.Text = 'INVOICE_RECEIPT_DATE'")} AS date_raw,
        ${lastMatchSql("sf.Type.Text = 'SUBTOTAL'")} AS sub_total_raw,
        ${lastMatchSql("sf.Type.Text = 'TOTAL' OR sf.LabelDetection.Text = 'Total'")} AS total_raw,
        ${lastMatchSql("sf.Type.Text = 'TAX'")} AS tax_raw
      FROM flat GROUP BY img_id),
    others AS (
      -- duplicate labels last-wins (the reference's dict overwrite)
      SELECT img_id, sf.LabelDetection.Text AS k,
             arg_max(sf.ValueDetection.Text, doc_pos * 1000000 + field_pos) AS v
      FROM flat
      WHERE sf.Type.Text = 'OTHER' AND sf.ValueDetection.Text IS NOT NULL
        AND sf.ValueDetection.Text <> '' AND sf.LabelDetection.Text IS NOT NULL
      GROUP BY img_id, sf.LabelDetection.Text),
    od AS (
      SELECT img_id, to_json(list_sort(list({key: k, value: v}))) AS other_data
      FROM others GROUP BY img_id),
    summary AS (
      SELECT l.img_id,
        coalesce(l.vendor_raw, 'Unknown') AS vendor_name,
        l.receiver_address,
        ${dateSql("l.date_raw")} AS receipt_date,
        ${moneyE2Sql("l.total_raw")} AS total_e2,
        ${moneyE2Sql("l.sub_total_raw")} AS sub_total_e2,
        ${moneyE2Sql("l.tax_raw")} AS tax_e2,
        'US Dollars' AS currency,
        coalesce(od.other_data, '[]') AS other_data
      FROM lastv l LEFT JOIN od USING (img_id))"""

  /** A3 CTEs on top of [[FlatCtes]]'s docs: positioned line items with
    * F5/F1/F6 cleaning (S7's CSV round-trip must yield the same rows).
    */
  private val ItemCtes = {
    def fieldOf(tag: String) =
      s"list_filter(item.LineItemExpenseFields, f -> f.Type.Text = '$tag')[1]" +
        ".ValueDetection.Text"
    def strip(c: String) =
      s"trim(regexp_replace($c, '\\([A-Z]+\\)', '', 'g'))"
    s"""
    grps AS (
      SELECT img_id, doc_pos,
             CAST(generate_subscripts(ed.LineItemGroups, 1) - 1 AS INT) AS grp_pos,
             unnest(ed.LineItemGroups) AS grp
      FROM docs),
    litems AS (
      SELECT img_id, doc_pos, grp_pos,
             CAST(generate_subscripts(grp.LineItems, 1) - 1 AS INT) AS item_pos,
             unnest(grp.LineItems) AS item
      FROM grps),
    cleaned AS (
      SELECT img_id, doc_pos, grp_pos, item_pos,
        coalesce(${strip(fieldOf("ITEM"))}, 'Unknown') AS item_name,
        ${moneyE2Sql(strip(fieldOf("PRICE")))} AS price_e2,
        coalesce(TRY_CAST(${strip(fieldOf("QUANTITY"))} AS INT), 1) AS quantity
      FROM litems)"""
  }

  private val ItemsSql = s"""
    WITH $FlatCtes, $ItemCtes
    SELECT img_id, doc_pos, grp_pos, item_pos, item_name, price_e2, quantity
    FROM cleaned
    ORDER BY img_id, doc_pos, grp_pos, item_pos"""

  /** Spark-side shaping shared by a3 and s7 (same columns, same order —
    * the identity contract between the direct and CSV paths is thereby
    * driver-checked against ONE oracle).
    */
  private def shapeItems(items: org.apache.spark.sql.DataFrame) =
    items.select(
      col("img_id"), col("doc_pos"), col("grp_pos"), col("item_pos"),
      col("item_name"),
      (col("price") * 100).cast("bigint").as("price_e2"),
      col("quantity"))
      .orderBy("img_id", "doc_pos", "grp_pos", "item_pos")

  /** Spark-side summary shaping (driver output contract). */
  private def shapeSummary(df: org.apache.spark.sql.DataFrame) =
    df.select(
      col("img_id"), col("vendor_name"), col("receiver_address"),
      date_format(col("receipt_date"), "yyyy-MM-dd HH:mm:ss").as("receipt_date"),
      (col("total") * 100).cast("bigint").as("total_e2"),
      (col("sub_total") * 100).cast("bigint").as("sub_total_e2"),
      (col("tax_amount") * 100).cast("bigint").as("tax_e2"),
      col("currency"),
      // map ordering is unspecified in parquet; emit key-sorted entries
      // serialized to JSON — complex-typed cells crash the driver's
      // row-sort (unhashable ndarray), so registered outputs are scalar
      to_json(array_sort(map_entries(col("other_data")))).as("other_data"))

  val all: Seq[Q] = Seq(
    Q("receipt_p1_flatten",
      (s, _) => ReceiptPipeline
        .flattenSummary(ReceiptPipeline.readResponses(s, FixturePath))
        .orderBy("img_id", "doc_pos", "field_pos"),
      Some(s"""
        WITH $FlatCtes
        SELECT img_id, doc_pos, field_pos,
               sf.Type.Text AS TypeText,
               sf.Type.Confidence AS TypeConfidence,
               sf.LabelDetection.Text AS LabelText,
               sf.LabelDetection.Confidence AS LabelConfidence,
               sf.ValueDetection.Text AS ValueText,
               sf.ValueDetection.Confidence AS ValueConfidence
        FROM flat ORDER BY img_id, doc_pos, field_pos"""),
      bench = false),

    Q("receipt_a1_summary",
      (s, _) => shapeSummary(ReceiptPipeline
        .summaries(ReceiptPipeline.readResponses(s, FixturePath))
        .toDF())
        .orderBy("img_id"),
      Some(s"""
        WITH $FlatCtes, $SummaryCtes
        SELECT * FROM summary ORDER BY img_id"""),
      bench = false),

    Q("receipt_a3_line_items",
      (s, _) => shapeItems(ReceiptPipeline
        .lineItems(ReceiptPipeline.readResponses(s, FixturePath))),
      Some(ItemsSql), bench = false),

    Q("receipt_s7_csv_items",
      (s, _) => {
        val responses = ReceiptPipeline.readResponses(s, FixturePath)
        shapeItems(ReceiptPipeline
          .itemsViaCsv(ReceiptPipeline.renderItemsCsv(responses)))
      },
      Some(ItemsSql), bench = false),

    Q("receipt_j1_joined",
      (s, _) => {
        val responses = ReceiptPipeline.readResponses(s, FixturePath)
        val sums = shapeSummary(ReceiptPipeline
          .summarize(ReceiptPipeline.flattenSummary(responses)))
        sums.join(
            shapeItems(ReceiptPipeline.lineItems(responses)), Seq("img_id"), "left")
          .orderBy(col("img_id"), col("doc_pos"), col("grp_pos"), col("item_pos"))
      },
      Some(s"""
        WITH $FlatCtes, $SummaryCtes, $ItemCtes
        SELECT s.*, c.doc_pos, c.grp_pos, c.item_pos,
               c.item_name, c.price_e2, c.quantity
        FROM summary s LEFT JOIN cleaned c USING (img_id)
        ORDER BY s.img_id, c.doc_pos NULLS FIRST, c.grp_pos NULLS FIRST,
                 c.item_pos NULLS FIRST"""),
      bench = false))
}
