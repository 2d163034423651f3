package graft.receipts

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSuite

/** Unit + property tests for the scalar transforms (SURVEY.md §5 item 2:
  * money parser F1, quantity default F6, date F4, tag strip F5).
  * Property cases are drawn from scalacheck Gens with a fixed seed and
  * evaluated in one Spark pass (no per-case job overhead).
  */
class ReceiptFunctionsSpec extends SparkSuite {

  /** Deterministic sample of n values from a Gen. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def eval(c: Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  private def money(s: String): Option[BigDecimal] =
    Option(eval(ReceiptFunctions.moneyVal(lit(s))))
      .map(d => BigDecimal(d.asInstanceOf[java.math.BigDecimal]))

  test("F1 money: fixture-observed shapes") {
    assert(money("$44.77") === Some(BigDecimal("44.77")))   // output-7e7
    assert(money("16.76") === Some(BigDecimal("16.76")))    // output-7ff
    assert(money("1.48") === Some(BigDecimal("1.48")))
    assert(money("8.29T") === Some(BigDecimal("8.29")))     // lineitem suffix
    assert(money("£12.50") === Some(BigDecimal("12.50")))
    assert(money("€7") === Some(BigDecimal("7.00")))
    assert(money(".00") === Some(BigDecimal("0.00")))       // no leading digit → no match → 0
    assert(money("no price here") === Some(BigDecimal("0.00")))
    assert(money("") === Some(BigDecimal("0.00")))
    // documented divergence from the reference (which crashes): commas parse
    assert(money("1,234.50") === Some(BigDecimal("1234.50")))
    // DECIMAL(6,2) overflow → NULL, not crash (SURVEY.md §7.4)
    assert(money("123456.78") === None)
  }

  test("F1 money: any plain d+.dd amount round-trips (property)") {
    val amounts = for {
      whole <- Gen.choose(0, 9999)
      cents <- Gen.choose(0, 99)
      sym <- Gen.oneOf("", "$", "£", "€")
    } yield (sym, whole, cents)
    import spark.implicits._
    val cases = samples(amounts, 200)
      .map { case (sym, whole, cents) => (f"$sym$whole%d.$cents%02d", f"$whole%d.$cents%02d") }
    val bad = cases.toDF("raw", "expected")
      .withColumn("got", ReceiptFunctions.moneyVal(col("raw")).cast("string"))
      .filter(col("got") =!= col("expected"))
      .collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(",")}")
  }

  test("F4 fuzzy date: fixture format and common shapes") {
    def date(s: String): Option[String] =
      Option(eval(ReceiptFunctions.fuzzyDate(lit(s)))).map(_.toString)
    assert(date("FEB 19,2022 16:48") === Some("2022-02-19 16:48:00.0")) // output-7e7
    assert(date("Feb 19, 2022") === Some("2022-02-19 00:00:00.0"))
    assert(date("2/19/2022") === Some("2022-02-19 00:00:00.0"))
    assert(date("2022-02-19 16:48") === Some("2022-02-19 16:48:00.0"))
    // r2-advice widening: day-first and no-comma month-name families
    assert(date("19 Feb 2022") === Some("2022-02-19 00:00:00.0"))
    assert(date("19 FEB 2022 16:48") === Some("2022-02-19 16:48:00.0"))
    assert(date("Feb 19 2022") === Some("2022-02-19 00:00:00.0"))
    assert(date("FEB 19 2022 16:48") === Some("2022-02-19 16:48:00.0"))
    assert(date("not a date") === None)
  }

  test("F5 tag strip + F2 clean") {
    assert(eval(ReceiptFunctions.stripFieldTag(lit("8.29T (PRICE)"))) === "8.29T")
    assert(eval(ReceiptFunctions.stripFieldTag(lit("CVS H/C PATCH XL (ITEM)"))) === "CVS H/C PATCH XL")
    assert(eval(ReceiptFunctions.cleanValue(lit(" $44.77 "))) === "44.77")
  }

  test("F6 quantity: int-or-1 semantics") {
    def qty(s: String): Int =
      eval(ReceiptFunctions.quantityOrDefault(lit(s))).asInstanceOf[Int]
    assert(qty("3") === 3)
    assert(qty("F 1") === 1)   // the reference's crash case (§2.9) → default
    assert(qty("") === 1)
    assert(qty("2 (QUANTITY)") === 2)
    samples(Gen.choose(0, 1000), 50).foreach { n => assert(qty(n.toString) === n) }
  }
}
