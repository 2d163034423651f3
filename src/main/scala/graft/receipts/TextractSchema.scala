package graft.receipts

import org.apache.spark.sql.types._

/** Declared Spark schema for the AWS Textract `analyze_expense` response
  * (shape observed in the reference fixtures
  * `/root/reference/output1.json`, documented in FIXTURES.md §A.1).
  *
  * Declaring the full nested schema — instead of schema inference — keeps
  * reads single-pass and lets Catalyst's nested-schema pruning drop the
  * Geometry subtrees (BoundingBox + Polygon are ~80% of the bytes) as
  * soon as a query only projects Text/Confidence, which is the pruning
  * win called out in SURVEY.md §4.
  */
object TextractSchema {

  /** Geometry: BoundingBox + Polygon (parsed then discarded by every
    * downstream operator — reference `anarcptlib.py:20-25` projects only
    * Text/Confidence).
    */
  val geometry: StructType = StructType(Seq(
    StructField("BoundingBox", StructType(Seq(
      StructField("Height", DoubleType),
      StructField("Left", DoubleType),
      StructField("Top", DoubleType),
      StructField("Width", DoubleType)))),
    StructField("Polygon", ArrayType(StructType(Seq(
      StructField("X", DoubleType),
      StructField("Y", DoubleType)))))))

  /** One detected text span: text + model confidence + geometry. */
  val detection: StructType = StructType(Seq(
    StructField("Text", StringType),
    StructField("Confidence", DoubleType),
    StructField("Geometry", geometry)))

  /** One expense field: Type tag + optional label detection + value
    * detection (reference `anarcptlib.py:20-25`; same struct is reused
    * for SummaryFields and LineItemExpenseFields).
    */
  val expenseField: StructType = StructType(Seq(
    StructField("PageNumber", IntegerType),
    StructField("Type", StructType(Seq(
      StructField("Text", StringType),
      StructField("Confidence", DoubleType)))),
    StructField("LabelDetection", detection),
    StructField("ValueDetection", detection)))

  /** Full analyze_expense response document. */
  val response: StructType = StructType(Seq(
    StructField("DocumentMetadata", StructType(Seq(
      StructField("Pages", IntegerType)))),
    StructField("ExpenseDocuments", ArrayType(StructType(Seq(
      StructField("ExpenseIndex", IntegerType),
      StructField("SummaryFields", ArrayType(expenseField)),
      StructField("LineItemGroups", ArrayType(StructType(Seq(
        StructField("LineItemGroupIndex", IntegerType),
        StructField("LineItems", ArrayType(StructType(Seq(
          StructField("LineItemExpenseFields", ArrayType(expenseField))))))))))))))))
}
