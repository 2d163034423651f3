package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Pins the q143 k-means contract: the floor(sum/count) centroid mean
  * (the Spark-div-vs-DuckDB-// trap), Lloyd convergence under the
  * integer quantization, and full-assignment/determinism invariants
  * at sf0.001.
  */
class KMeansSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def quantized = Tables.embeddings(spark, dir)
    .select(col("vec_id"), expr(KMeans.quantizeExpr("embedding")).as("q"))

  private def init(k: Int) = quantized
    .orderBy(expr("((vec_id % 1000003) * 2654435761) % 1000003"), col("vec_id"))
    .limit(k)
    .select(col("vec_id").as("cid"), col("q").as("cq"))

  test("centroid mean FLOORS negative sums (not truncate-toward-zero)") {
    // members [-10], [-1], [0]: sum -11, count 3 → floor(-11/3) = -4;
    // a truncating integer division would give -3 and inertia 62
    import spark.implicits._
    val vecs = Seq((1L, Seq(-10L)), (2L, Seq(-1L)), (3L, Seq(0L)))
      .toDF("vec_id", "q")
    val c0 = Seq((0L, Seq(0L))).toDF("cid", "cq")
    val inertia = KMeans.run(vecs, c0, iters = 1)
      .agg(sum(col("dist"))).head().getLong(0)
    // centroid -4: (-10+4)² + (-1+4)² + (0+4)² = 36 + 9 + 16
    assert(inertia === 61L, "floor(-11/3) must be -4 (DuckDB //), not -3 (Spark div)")
  }

  test("every vector is assigned exactly once, to at most k clusters") {
    val out = KMeans.run(quantized, init(8), iters = 3)
    val n = quantized.count()
    assert(out.count() === n)
    assert(out.select(col("vec_id")).distinct().count() === n)
    assert(out.select(col("cid")).distinct().count() <= 8)
  }

  test("Lloyd sweeps do not increase inertia (1% floor-loss slack)") {
    def inertia(iters: Int): Long =
      KMeans.run(quantized, init(8), iters)
        .agg(sum(col("dist"))).head().getLong(0)
    val i1 = inertia(1)
    val i3 = inertia(3)
    assert(i3 <= i1 + i1 / 100,
      s"inertia after 3 sweeps ($i3) must not exceed after 1 ($i1) + slack")
  }

  test("deterministic across runs") {
    def rows = KMeans.run(quantized, init(8), iters = 2)
      .orderBy(col("vec_id")).collect().toSeq
    assert(rows === rows)
  }
}
