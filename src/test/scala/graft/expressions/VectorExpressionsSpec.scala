package graft.expressions

import org.apache.spark.sql.functions._
import graft.{GraftExtensions, SparkSuite}
import graft.functions.VectorFunctions

/** Native vec_dot / vec_norm: bit-equality against the HOF forms (the
  * oracle-checked queries swap freely between them), SQL registration,
  * and correctness under both codegen and interpreted evaluation.
  */
class VectorExpressionsSpec extends SparkSuite {

  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(-0.5, 4.0, 0.25)),
    (2L, Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0)),
    (3L, Array(1e-9, -1e9, 3.14), Array(2.0, 1e-9, -1.0)))
    .toDF("id", "a", "b")

  test("vec_dot/vec_norm match the HOF forms bit-exactly") {
    val rows = vecs.select(
      VectorFunctions.dotNative(col("a"), col("b")).as("nd"),
      VectorFunctions.dot(col("a"), col("b")).as("hd"),
      VectorFunctions.dotUnrolled(col("a"), col("b"), 3).as("ud"),
      VectorFunctions.normNative(col("a")).as("nn"),
      VectorFunctions.norm(col("a")).as("hn"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(2)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(4)))
    }
  }

  test("values survive interpreted (NO_CODEGEN) evaluation identically") {
    val get = () => vecs.select(
      VectorFunctions.dotNative(col("a"), col("b")).as("d"),
      VectorFunctions.normNative(col("a")).as("n"))
      .orderBy(col("d")).collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val withCodegen = get()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(get() === withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("SQL surface: vec_dot/vec_norm registered as functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
      "vec_norm(array(3.0D, 4.0D)) AS n").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
  }

  test("set_intersect_count matches size(array_intersect) on sorted-distinct input") {
    val df = Seq(
      (1L, Array(1L, 3L, 5L, 9L), Array(2L, 3L, 9L, 11L)),
      (2L, Array.empty[Long], Array(1L, 2L)),
      (3L, Array(-5L, 0L, 7L), Array(-5L, 0L, 7L)))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"),
      graft.functions.ColumnOps.setIntersectCountSorted(col("a"), col("b")).as("c"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .orderBy(col("id")).collect()
    rows.foreach(r => assert(r.getInt(1) === r.getInt(2)))
    // SQL registration path
    GraftExtensions.register(spark)
    assert(spark.sql(
      "SELECT set_intersect_count(array(1L,2L,3L), array(2L,3L,4L)) AS c")
      .head().getInt(0) === 2)
  }

  test("register installs the HOF->native rewrite rule, idempotently") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    val rules = spark.experimental.extraOptimizations
      .count(_ eq graft.plans.NativeVectorRewrite)
    assert(rules === 1,
      s"expected exactly one NativeVectorRewrite, got $rules")
  }

  test("set_intersect_count rejects nullable-element arrays at analysis time") {
    // getLong would silently decode a null element as 0L — the contract
    // is an explicit analysis error, not a wrong count
    val df = spark.range(1).select(
      array(lit(1L), lit(null).cast("bigint")).as("a"),
      array(lit(1L), lit(2L)).as("b"))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(
        graft.functions.ColumnOps.setIntersectCountSorted(col("a"), col("b")))
        .collect()
    }
    assert(err.getMessage.contains("non-nullable"))
  }

  test("null contract matches the HOF forms: null array / unequal lengths -> null") {
    val df = Seq(
      (1L, Array(1.0, 2.0), Array(3.0, 4.0, 99.0)),
      (2L, null.asInstanceOf[Array[Double]], Array(1.0)),
      (3L, Array(1.0, 2.0), Array(3.0, 4.0)))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"),
      VectorFunctions.dotNative(col("a"), col("b")).as("d"),
      VectorFunctions.dot(col("a"), col("b")).as("hof"))
      .orderBy(col("id")).collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2)) // zip_with null-pad
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2)) // null array
    assert(rows(2).getDouble(1) === 11.0)
    assert(rows(2).getDouble(2) === 11.0)
  }
}
