package graft.receipts

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Golden-fixture tests (SURVEY.md §5): the strict-JSON fixture
  * `/root/reference/output1.json` is the captured analyze_expense
  * response for the CVS receipt, and `/root/reference/output-7ff.json`
  * is the reference's own recorded output of the P1 flatten for it —
  * the expectations below are transcribed from that golden file.
  * The FARMERS MARKET expectations come from `output-7e7.json`.
  */
class ReceiptPipelineSpec extends SparkSuite {

  private lazy val responses =
    ReceiptPipeline.readResponses(spark, "/root/reference/output1.json")

  // (TypeText, LabelText, ValueText) rows of output-7ff.json, in document order.
  private val goldenFlat: Seq[(String, Option[String], String)] = Seq(
    ("VENDOR_NAME", None, "CVS pharmacy R"),
    ("OTHER", Some("CHANGE"), ".00"),
    ("OTHER", Some("TRAN TYPE SALE"), "A0000000031010"),
    ("OTHER", Some("APPROVED# 005234"), "REF# 181327"),
    ("OTHER", Some("CHARGE"), "16.76"),
    ("OTHER", Some("************6957"), "CH"),
    ("OTHER", Some("NO SIGNATURE REQUIRED"), "CVM: 5E0000"),
    ("OTHER", Some("TC: 38FEOF858207E942"), "TERMINAL# 05042654"),
    ("OTHER", Some("TSI(9B):"), "6800"),
    ("OTHER", Some("Health Care Eligible Total"), "16.76"),
    ("OTHER", Some("7294 9880"), "432 73"),
    ("TOTAL", Some("TOTAL"), "16.76"),
    ("SUBTOTAL", Some("SUBTOTAL"), "15.28"),
    ("TAX", Some("MO 9.679% TAX"), "1.48"))

  test("P1 flatten reproduces the reference's golden projection (output-7ff)") {
    val flat = ReceiptPipeline.flattenSummary(responses)
      .orderBy("doc_pos", "field_pos")
      .select("TypeText", "LabelText", "ValueText")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getString(2)))
      .toSeq
    assert(flat === goldenFlat)
  }

  test("P1 carries confidences (spot-checked against output-7ff)") {
    val first = ReceiptPipeline.flattenSummary(responses)
      .orderBy("doc_pos", "field_pos").limit(1)
      .select("TypeConfidence", "ValueConfidence").head()
    assert(math.abs(first.getDouble(0) - 97.81664276123047) < 1e-9)
    assert(math.abs(first.getDouble(1) - 93.3287353515625) < 1e-9)
  }

  test("A1 pivot produces the CVS ReceiptSummary") {
    val s = ReceiptPipeline.summaries(responses).collect()
    assert(s.length === 1)
    val r = s.head
    assert(r.img_id === "output1")
    assert(r.vendor_name === "CVS pharmacy R")
    assert(r.receiver_address === None)
    assert(r.receipt_date === None) // no INVOICE_RECEIPT_DATE in this receipt
    assert(r.total === BigDecimal("16.76"))
    assert(r.sub_total === BigDecimal("15.28"))
    assert(r.tax_amount === BigDecimal("1.48"))
    assert(r.currency === "US Dollars")
    assert(r.other_data.size === 10)
    assert(r.other_data("CHARGE") === "16.76")
    assert(r.other_data("Health Care Eligible Total") === "16.76")
    assert(!r.other_data.contains("TOTAL")) // recognized fields stay out of the map
  }

  test("A3 line items: ITEM/PRICE/QUANTITY extraction with F1/F5/F6 cleaning") {
    val items = ReceiptPipeline.items(responses).collect().sortBy(_.item_name)
    assert(items.length === 2)
    // price "8.29T" → 8.29 (money regex); quantity "F 1" → default 1 (F6)
    assert(items(0).item_name === "CVS H/C PATCH SM")
    assert(items(0).price === BigDecimal("6.99"))
    assert(items(0).quantity === 1)
    assert(items(1).item_name === "CVS H/C PATCH XL")
    assert(items(1).price === BigDecimal("8.29"))
    assert(items(1).quantity === 1)
  }

  test("J1 join and denormalized array-column variant agree") {
    val j = ReceiptPipeline.joined(responses)
    assert(j.count() === 2) // 1 summary × 2 line items
    val d = ReceiptPipeline.denormalized(responses)
    val row = d.select(size(col("line_items"))).head()
    assert(row.getInt(0) === 2)
  }

  test("A1 pivot on the FARMERS MARKET flat rows (output-7e7 expectations)") {
    // Reconstructed P1 output for the 7e7 receipt: the recognized rows
    // verbatim from the golden file plus its 21 distinct OTHER rows
    // (modeled here by three representatives — map size asserted at 3).
    import spark.implicits._
    val flat = Seq(
      ("7e7", 0, 0, "VENDOR_NAME", null, "FARMERS MARKET"),
      ("7e7", 0, 1, "TOTAL", "AMOUNT :", "$44.77"),
      ("7e7", 0, 2, "INVOICE_RECEIPT_DATE", "DATE/TIME :", "FEB 19,2022 16:48"),
      ("7e7", 0, 3, "INVOICE_RECEIPT_ID", "Inv#", ":00395012"),
      ("7e7", 0, 4, "SUBTOTAL", "SUB TOTAL", "$44.77"),
      ("7e7", 0, 5, "OTHER", "AID :", "A0000000031010"),
      ("7e7", 0, 6, "OTHER", "RESULT :", "00 APPROVED 000"),
      ("7e7", 0, 7, "OTHER", "Item count", "17"),
      // duplicate label: later value must win (dict-overwrite parity)
      ("7e7", 0, 8, "OTHER", "AID :", "OVERWRITTEN"))
      .toDF("img_id", "doc_pos", "field_pos", "TypeText", "LabelText", "ValueText")
      .withColumn("TypeConfidence", lit(90.0))
      .withColumn("LabelConfidence", lit(90.0))
      .withColumn("ValueConfidence", lit(90.0))
    val r = ReceiptPipeline.summarize(flat).collect().head
    assert(r.getAs[String]("vendor_name") === "FARMERS MARKET")
    assert(r.getAs[java.math.BigDecimal]("total").toPlainString === "44.77")
    assert(r.getAs[java.math.BigDecimal]("sub_total").toPlainString === "44.77")
    assert(r.getAs[java.sql.Timestamp]("receipt_date").toString === "2022-02-19 16:48:00.0")
    assert(r.getAs[String]("currency") === "US Dollars")
    val other = r.getAs[Map[String, String]]("other_data")
    assert(other.size === 3)
    assert(other("AID :") === "OVERWRITTEN")
    // INVOICE_RECEIPT_ID is unrecognized-but-not-OTHER: ignored entirely
    assert(!other.contains("Inv#"))
  }

  test("TOTAL dual-predicate (A2): LabelText == 'Total' also matches") {
    import spark.implicits._
    val flat = Seq(
      ("x", 0, 0, "OTHER", "Total", "$9.99"))
      .toDF("img_id", "doc_pos", "field_pos", "TypeText", "LabelText", "ValueText")
      .withColumn("TypeConfidence", lit(1.0))
      .withColumn("LabelConfidence", lit(1.0))
      .withColumn("ValueConfidence", lit(1.0))
    val r = ReceiptPipeline.summarize(flat).collect().head
    assert(r.getAs[java.math.BigDecimal]("total").toPlainString === "9.99")
  }

  test("S7 CSV render/re-parse path equals the direct nested extraction") {
    val direct = ReceiptPipeline.lineItems(responses)
    val viaCsv = ReceiptPipeline.itemsViaCsv(
      ReceiptPipeline.renderItemsCsv(responses))
    assert(viaCsv.exceptAll(direct).isEmpty && direct.exceptAll(viaCsv).isEmpty)
    assert(direct.count() > 0)
  }

  test("S7 from_csv applies P2/F5/F6: empty rows dropped, tags stripped, defaults") {
    import spark.implicits._
    val rows = Seq(
      ("x", 0, 0, 0, "\"Choc Bar (ITEM)\",\"$2.50 (PRICE)\",\"3\""),
      ("x", 0, 0, 1, "  "), // P2: blank line dropped
      ("x", 0, 0, 2, "\"Milk, 2% (ITEM)\",\"1.99\",\"\"")) // comma in name; qty default
      .toDF("img_id", "doc_pos", "grp_pos", "item_pos", "line")
    val parsed = ReceiptPipeline.itemsViaCsv(rows)
      .orderBy("item_pos").collect()
    assert(parsed.length === 2)
    assert(parsed(0).getAs[String]("item_name") === "Choc Bar")
    assert(parsed(0).getAs[java.math.BigDecimal]("price").toPlainString === "2.50")
    assert(parsed(0).getAs[Int]("quantity") === 3)
    assert(parsed(1).getAs[String]("item_name") === "Milk, 2%")
    assert(parsed(1).getAs[Int]("quantity") === 1)
  }
}
