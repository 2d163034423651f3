package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class VectorFunctionsSpec extends SparkSuite {

  private def randomVecs(n: Int, dim: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong,
      Array.fill(dim)(rnd.nextGaussian()),
      Array.fill(dim)(rnd.nextGaussian())))
      .toDF("id", "a", "b")
  }

  test("dotUnrolled is bit-identical to the fold-based dot") {
    // the oracle matches rely on this: the unrolled codegen form must
    // reproduce the higher-order fold exactly, not approximately
    val df = randomVecs(200, 64, seed = 7)
      .select(col("id"),
        VectorFunctions.dot(col("a"), col("b")).as("fold"),
        VectorFunctions.dotUnrolled(col("a"), col("b"), 64).as("unrolled"))
    val diff = df.filter(col("fold") =!= col("unrolled")).count()
    assert(diff === 0)
  }

  test("norm and cosine laws") {
    val df = randomVecs(200, 64, seed = 11)
      .select(
        VectorFunctions.norm(col("a")).as("na"),
        VectorFunctions.cosine(col("a"), col("b")).as("cab"),
        VectorFunctions.cosine(col("a"), col("a")).as("caa"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) > 0)
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-12)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12) // cos(a,a) = 1
    }
  }

  test("normalize produces unit vectors reusable as plain dot products") {
    val df = randomVecs(50, 64, seed = 13)
      .select(col("a"), col("b"),
        VectorFunctions.normalize(col("a")).as("ua"),
        VectorFunctions.normalize(col("b")).as("ub"))
      .select(
        VectorFunctions.norm(col("ua")).as("unorm"),
        (VectorFunctions.dot(col("ua"), col("ub"))
          - VectorFunctions.cosine(col("a"), col("b"))).as("delta"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1)) < 1e-12)
    }
  }
}
