package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.functions.VectorFunctions

/** Semantics pins for registered queries that carry no DuckDB oracle
  * (the driver only row-counts them).
  */
class RowsOnlySpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("q30: HLL approx distinct within the configured 2% rsd (5% bound)") {
    // raw numeric bound on the sketch itself (the registered output
    // carries only the tolerance flag — sketch values are engine-local)
    val rows = graft.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"HLL error too large: approx=$approx exact=$exact")
    }
    // and the registered flag must report the same verdict
    val flags = graft.SparkEntry.queries("q30_approx_distinct")(spark, dir)
      .collect().map(_.getAs[Int]("approx_within_5pct"))
    assert(flags.nonEmpty && flags.forall(_ == 1))
  }

  test("q43: embedding near-dup pairs are real, ranked, and exactly scored") {
    val out = graft.SparkEntry.queries("q43_embedding_neardup")(spark, dir)
      .collect()
    assert(out.length === 20)
    val scores = out.map(_.getAs[Long]("score_e2"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing in rank order")
    val pairs = out.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.distinct.length === 20)
    assert(pairs.forall { case (a, b) => a < b })
    // re-score each returned pair independently with exact cosine
    import spark.implicits._
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct.toSeq
    val vecs = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    out.foreach { r =>
      val expected = math.floor(
        cos(vecs(r.getAs[Long]("vec_a")), vecs(r.getAs[Long]("vec_b"))) * 100).toLong
      // local summation order differs from the engine's fold, so allow
      // a 1-unit boundary slip at the floor
      assert(math.abs(r.getAs[Long]("score_e2") - expected) <= 1)
    }
  }
}
