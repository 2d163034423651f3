package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Semantic pin for q81: the three interchange formats must agree with
  * each other and with the source even on CSV-hostile values (embedded
  * commas and quotes — the writer must quote, the reader must unquote).
  * Embedded newlines are deliberately out of contract: splittable CSV
  * at scale means multiLine=false, and the shaped projection q81 writes
  * contains no newline-bearing columns.
  */
class FormatRoundtripSpec extends SparkSuite {

  import spark.implicits._

  test("q81: identical fingerprints across orc/csv/json on quote-hostile data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q81spec").toString
    Seq(
      (1L, "Customer#1", 0, 10.50, "a,b segment"),
      (2L, "quote \" inside", 1, -3.25, "plain"),
      (3L, "comma, and \"both\"", 2, 0.00, "a,b segment"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = SinkQueries.all.find(_.name == "q81_format_roundtrip").get
      .run(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val expected = (3L, 1050L - 325L + 0L, 2L, 1L, 3L)
    assert(rows.keySet === Set("csv", "json", "orc"))
    rows.foreach { case (fmt, got) =>
      assert(got === expected, s"format $fmt diverged")
    }
  }
}
