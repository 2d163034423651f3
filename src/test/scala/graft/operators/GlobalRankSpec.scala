package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSuite

class GlobalRankSpec extends SparkSuite {

  private def df(n: Int) = {
    import spark.implicits._
    // shuffled values so range partitioning has real work to do
    (1 to n).map(i => ((i * 7919) % n, i)).toDF("v", "id")
      .repartition(5)
  }

  private def windowNtile(n: Int, k: Int) = {
    val w = Window.orderBy(col("v"), col("id"))
    df(n).withColumn("bucket", ntile(k).over(w))
      .select(col("id"), col("bucket"))
  }

  test("two-phase ntile matches the window NTILE for N % k != 0") {
    for (n <- Seq(10, 17, 101); k <- Seq(3, 4, 7)) {
      val twoPhase = GlobalRank.ntile(df(n), k, Seq(col("v"), col("id")),
          "bucket", numPartitions = 4)
        .select(col("id"), col("bucket"))
      val expected = windowNtile(n, k)
      assert(twoPhase.exceptAll(expected).isEmpty &&
             expected.exceptAll(twoPhase).isEmpty,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("two-phase ntile handles N < k (each row its own bucket)") {
    val r = GlobalRank.ntile(df(3), 7, Seq(col("v"), col("id")), "bucket",
        numPartitions = 4)
      .select(col("id"), col("bucket"))
    assert(r.exceptAll(windowNtile(3, 7)).isEmpty)
  }

  test("withGlobalCumSum equals the global running-sum window (rank, cum, total)") {
    val vals = df(101).withColumn("w", (col("id") % 13 + 1).cast("long"))
    val got = GlobalRank.withGlobalCumSum(vals,
        Seq(col("v"), col("id")), col("w"), "r", "cum", "total",
        numPartitions = 4)
      .select(col("id"), col("r"), col("cum"), col("total"))
    val w = Window.orderBy(col("v"), col("id"))
    val expected = vals
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("w")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total", sum(col("w")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("id"), col("r"), col("cum"), col("total"))
    assert(got.exceptAll(expected).isEmpty &&
           expected.exceptAll(got).isEmpty)
  }

  test("withGlobalStrictCumMax equals the strict-prefix max window") {
    val vals = df(101).withColumn("w", ((col("id") * 31) % 17).cast("long"))
    val got = GlobalRank.withGlobalStrictCumMax(vals,
        Seq(col("v"), col("id")), col("w"), "sm", numPartitions = 4)
      .select(col("id"), col("sm"))
    val w = Window.orderBy(col("v"), col("id"))
    val expected = vals
      .withColumn("sm", max(col("w")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("id"), col("sm"))
    assert(got.exceptAll(expected).isEmpty &&
           expected.exceptAll(got).isEmpty)
    // the global first row has no strict predecessor
    assert(got.filter(col("sm").isNull).count() == 1)
  }

  test("withGlobalRank equals row_number over the global order") {
    val ranked = GlobalRank.withGlobalRank(df(101),
        Seq(col("v"), col("id")), "r", numPartitions = 4)
      .select(col("id"), col("r"))
    val w = Window.orderBy(col("v"), col("id"))
    val expected = df(101).withColumn("r", row_number().over(w).cast("long"))
      .select(col("id"), col("r"))
    assert(ranked.exceptAll(expected).isEmpty &&
           expected.exceptAll(ranked).isEmpty)
  }
}
