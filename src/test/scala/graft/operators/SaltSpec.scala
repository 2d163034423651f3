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
    // and the partial stage really fans the hot keys out (mirror the
    // operator's constant-width salt: key + per-row uniquifier)
    val partials = e.withColumn("__salt",
        pmod(xxhash64(col("event_type"), monotonically_increasing_id()),
          lit(8)))
      .groupBy("event_type", "__salt").count().count()
    assert(partials > e.select("event_type").distinct().count())
  }

  test("identical duplicate rows of one hot key spread across salts") {
    import spark.implicits._
    // 10k byte-identical rows of a single key: a whole-row hash would
    // collapse them onto ONE salt bucket; the uniquifier must not.
    val hot = Seq.fill(10000)(("hot", 1L)).toDF("k", "v")
      .repartition(8)
    val salted = hot.withColumn("__salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8)))
    assert(salted.select("__salt").distinct().count() == 8)
    // and the operator still merges to the exact total
    val out = Salt.sumsBySaltedKey(hot, "k", 8, Map("total" -> col("v")))
      .collect()
    assert(out.length == 1 && out(0).getAs[Long]("total") == 10000L)
  }
}
