package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SaltSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("salted two-phase aggregation equals the direct groupBy") {
    val e = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("value").cast("decimal(18,2)").as("v"))
    val salted = Salt.sumsBySaltedKey(e, "event_type", 8,
      Map("total" -> col("v")))
    val direct = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
    // and the partial stage really fans the hot keys out
    val partials = e.withColumn("__salt",
        pmod(xxhash64(struct(e.columns.map(col).toSeq: _*)), lit(8)))
      .groupBy("event_type", "__salt").count().count()
    assert(partials > e.select("event_type").distinct().count())
  }
}
