package graft.queries

import graft.SparkSuite

/** q150 regression guard: an independent Scala recomputation of the
  * full histogram-sketch arithmetic (no Spark expressions shared with
  * the query), including the covering-bucket rule whose absence was
  * the bring-up bug (a bare MIN over every bucket past the target
  * picks sparse-late-bucket garbage via negative interpolation).
  */
class QuantileSketchSpec extends SparkSuite {

  private def refSketch(values: Seq[Long], p: Int): (Long, Long) = {
    val mn = values.min
    val mx = values.max
    val width = mx - mn + 1
    val n = values.size.toLong
    val t = (n * p + 99) / 100
    // exact: first value whose cumulative count reaches t
    val sorted = values.sorted
    val exact = sorted((t - 1).toInt)
    // sketch: 64-bucket counts, covering bucket, integer interpolation
    val counts = values.groupBy(v => (v - mn) * 64 / width)
      .map { case (b, vs) => b -> vs.size.toLong }
    var cum = 0L
    var est = 0L
    for (b <- counts.keys.toSeq.sorted) {
      val cnt = counts(b)
      val before = cum
      cum += cnt
      if (cum >= t && before < t)
        est = mn + b * width / 64 + (t - before) * (width / 64) / cnt
    }
    (exact, est)
  }

  test("q150 == independent covering-bucket recompute at sf0.001") {
    val rows = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v")
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSeq }
    val got = graft.SparkEntry.queries("q150_quantile_sketch")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet == rows.keySet && got.nonEmpty)
    for ((et, vs) <- rows) {
      val (e50, s50) = refSketch(vs, 50)
      val (e99, s99) = refSketch(vs, 99)
      assert(got(et) == ((e50, s50, e99, s99)), s"$et: ${got(et)}")
    }
  }

  test("covering-bucket rule survives an extreme outlier (the bug shape)") {
    // bulk at 100..199, one outlier at 1,000,000: without the covering
    // guard the p50 'estimate' lands far below the minimum
    val vs = (0 until 1000).map(i => 100L + i % 100) :+ 1000000L
    val (e50, s50) = refSketch(vs, 50)
    val width = (vs.max - vs.min + 1) / 64
    assert(math.abs(s50 - e50) <= width, s"p50 est $s50 vs exact $e50")
    assert(s50 >= vs.min, "estimate must never undershoot the minimum")
  }
}
