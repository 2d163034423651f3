package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TextQueriesSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("stratified sample hits the target fractions and is deterministic") {
    val sampled = graft.SparkEntry.queries("q56_stratified_sample")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = graft.Tables.documents(spark, dir)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-en strata kept whole; en downsampled to ~30% (hash-threshold
    // keep is Bernoulli-like, so tolerance; a pure row function, so the
    // realized value is stable run-to-run and across partitionings)
    for (l <- Seq("de", "fr", "es", "zh"))
      assert(sampled(l) == full(l), s"stratum $l should be kept whole")
    val enFrac = sampled("en").toDouble / full("en")
    assert(enFrac > 0.15 && enFrac < 0.45, s"en fraction off: $enFrac")
    val again = graft.SparkEntry.queries("q56_stratified_sample")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === sampled)
  }
}
