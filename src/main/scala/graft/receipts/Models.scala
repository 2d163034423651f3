package graft.receipts

import java.sql.Timestamp

/** Typed output records mirroring the reference's declared tables
  * (`/root/reference/anarcpt/models.py:7-31`), minus the autoincrement
  * surrogate pks — `img_id` (the perceptual-hash content address) is the
  * real join key (SURVEY.md §1.3).
  *
  * Money is DECIMAL(6,2) (`condecimal(max_digits=6, decimal_places=2)`,
  * `models.py:13-15,28`); `other_data` is the schemaless label→value
  * overflow map (`models.py:17`); `receipt_date` is nullable-when-absent
  * (documented divergence from the reference's nondeterministic
  * `datetime.today()` default, `models.py:12`).
  */
final case class ReceiptSummary(
    img_id: String,
    vendor_name: String,
    receiver_address: Option[String],
    receipt_date: Option[Timestamp],
    total: BigDecimal,
    sub_total: BigDecimal,
    tax_amount: BigDecimal,
    currency: String,
    other_data: Map[String, String])

final case class ReceiptLineItem(
    img_id: String,
    item_name: String,
    price: BigDecimal,
    quantity: Int)
