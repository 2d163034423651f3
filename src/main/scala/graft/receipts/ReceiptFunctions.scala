package graft.receipts

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression rebuilds of the reference's scalar transforms
  * (SURVEY.md §2.3, F1-F7). All are `org.apache.spark.sql.functions`
  * compositions — whole-stage-codegen'd, no UDFs in the hot path.
  */
object ReceiptFunctions {

  /** F1 — money extraction (reference `anarcptlib.py:26,35-41`).
    * Reference regex: `([£$€])?(?P<amount>[,\d]+.?\d*)`, anchored at the
    * start (`re.match`), no match → 0. The unescaped `.` is kept for
    * parity (it matches any single char, exactly as the reference's).
    *
    * Documented divergence (SURVEY.md §2.9): the reference passes
    * comma-grouped amounts straight into `Decimal(...)`, which raises
    * and voids the whole receipt; here commas are stripped so `1,234.50`
    * parses. Overflow beyond DECIMAL(6,2) yields NULL (try_cast), not a
    * crash.
    */
  val MoneyPattern = "^[£$€]?([,\\d]+.?\\d*)"

  def moneyVal(c: Column): Column = {
    val amount = regexp_extract(c, MoneyPattern, 1)
    when(amount === "", lit(0).cast("decimal(6,2)"))
      .otherwise(regexp_replace(amount, ",", "").try_cast("decimal(6,2)"))
  }

  /** F2 — currency-symbol strip + trim (reference `anarcptlib.py:51`). */
  def cleanValue(c: Column): Column =
    trim(regexp_replace(c, "\\$", ""))

  /** F3 — currency detection (reference `anarcptlib.py:53-54`): any `$`
    * in a value marks the receipt "US Dollars"; the model default is
    * also "US Dollars" (`models.py:16`), so the expression is total.
    */
  def currencyOf(anyDollar: Column): Column =
    when(anyDollar, lit("US Dollars")).otherwise(lit("US Dollars"))

  /** F4 — fuzzy date parse (reference `anarcptlib.py:60-61` uses
    * dateutil). JVM parity is a format-list coalesce over the observed
    * receipt date shapes (fixture `output-7e7.json` has `FEB 19,2022
    * 16:48`); upper-case month names are normalized first since
    * DateTimeFormatter month patterns are case-sensitive. Unparseable →
    * NULL (documented divergence: no dateutil heuristics).
    */
  def fuzzyDate(c: Column): Column = {
    val norm = initcap(lower(trim(c)))
    coalesce(
      try_to_timestamp(norm, lit("MMM d,yyyy HH:mm")),
      try_to_timestamp(norm, lit("MMM d,yyyy")),
      try_to_timestamp(norm, lit("MMM d, yyyy HH:mm")),
      try_to_timestamp(norm, lit("MMM d, yyyy")),
      // dateutil-breadth widening (r2 advice): day-first and no-comma
      // month-name shapes — "19 Feb 2022", "Feb 19 2022 16:48"
      try_to_timestamp(norm, lit("d MMM yyyy HH:mm")),
      try_to_timestamp(norm, lit("d MMM yyyy")),
      try_to_timestamp(norm, lit("MMM d yyyy HH:mm")),
      try_to_timestamp(norm, lit("MMM d yyyy")),
      try_to_timestamp(trim(c), lit("M/d/yyyy HH:mm")),
      try_to_timestamp(trim(c), lit("M/d/yyyy")),
      try_to_timestamp(trim(c), lit("M/d/yy")),
      try_to_timestamp(trim(c), lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(trim(c), lit("yyyy-MM-dd HH:mm")),
      try_to_timestamp(trim(c), lit("yyyy-MM-dd")),
      try_to_timestamp(trim(c)))
  }

  /** F5 — field-type tag removal (reference `anarcptlib.py:89`):
    * strips `(PRICE)`-style annotations, then trims.
    */
  def stripFieldTag(c: Column): Column =
    trim(regexp_replace(c, "\\([A-Z]+\\)", ""))

  /** F6 — quantity parse with default (reference `anarcptlib.py:99-101`):
    * parseable int → value, else 1. (The reference `int(...)` raises on
    * junk like `F 1` and aborts the whole receipt's line items — §2.9;
    * here try_cast degrades to the declared default instead.)
    */
  def quantityOrDefault(c: Column): Column =
    coalesce(stripFieldTag(c).try_cast("int"), lit(1))
}
