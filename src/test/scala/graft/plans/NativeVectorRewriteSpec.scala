package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.expressions.{DotProduct, L2Norm}
import graft.functions.VectorFunctions

/** The injected optimizer rule rewrites HOF dot/norm into the native
  * expressions — plan-asserted, with values checked unchanged. The
  * rewrite is UNCONDITIONAL (nullable element arrays rewrite too): the
  * native expressions reproduce the HOF null contract exactly, and the
  * second test pins that nullable-input behavior on purpose.
  */
class NativeVectorRewriteSpec extends SparkSuite {

  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(-0.5, 4.0, 0.25)),
    (2L, Array(0.25, -1.5, 8.0), Array(1.0, 1.0, 1.0)))
    .toDF("id", "a", "b")

  // parquet-backed (a LocalRelation would be constant-folded before the
  // rule's effect is observable in the optimized plan)
  private def stored = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"), "graft_nvr_vecs")
    if (!dir.isDirectory) vecs.write.mode("overwrite").parquet(dir.toString)
    spark.read.parquet(dir.toString)
  }

  test("HOF dot/norm rewrite to native expressions, values unchanged") {
    val expected = stored.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.norm(col("a")).as("n"))
      .orderBy(col("d")).collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq

    spark.experimental.extraOptimizations = Seq(NativeVectorRewrite)
    try {
      val df = stored.select(
        VectorFunctions.dot(col("a"), col("b")).as("d"),
        VectorFunctions.norm(col("a")).as("n"))
      val opt = df.queryExecution.optimizedPlan
      assert(opt.expressions.exists(_.exists(_.isInstanceOf[DotProduct])),
        s"no DotProduct in optimized plan:\n$opt")
      assert(opt.expressions.exists(_.exists(_.isInstanceOf[L2Norm])),
        s"no L2Norm in optimized plan:\n$opt")
      assert(df.orderBy(col("d")).collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).toSeq === expected)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewrite preserves HOF null semantics: null element and unequal lengths") {
    // the native expressions implement the HOF null contract exactly
    // (null element -> null; zip_with null-pad on unequal lengths ->
    // null), so the rewrite fires on nullable input AND agrees row-wise
    def queries = Seq(
      // null element in a
      vecs.select(VectorFunctions.dot(
        array(col("a").getItem(0), when(col("id") === 1L, col("a").getItem(1))),
        array(col("b").getItem(0), col("b").getItem(1))).as("d")),
      // unequal lengths
      vecs.select(VectorFunctions.dot(
        array(col("a").getItem(0)),
        array(col("b").getItem(0), col("b").getItem(1))).as("d")),
      // norm with a null element
      vecs.select(VectorFunctions.norm(
        array(col("a").getItem(0), when(col("id") === 1L, col("a").getItem(1)))).as("d")))
    def results = queries.map(_.orderBy(col("d").asc_nulls_first).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq)
    val hof = results
    spark.experimental.extraOptimizations = Seq(NativeVectorRewrite)
    try assert(results === hof)
    finally spark.experimental.extraOptimizations = Nil
  }
}
