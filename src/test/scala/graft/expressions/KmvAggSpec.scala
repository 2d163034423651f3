package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Contracts of the K-Minimum-Values sketch: it is a pure SET function
  * of the input (row order, duplication, and partitioning cannot change
  * it), exact below k, and its estimator lands within the theoretical
  * error band — plus the q146 arithmetic twin on real data.
  */
class KmvAggSpec extends SparkSuite {

  import spark.implicits._

  private def sketch(data: Seq[Long], k: Int, parts: Int): Seq[Long] =
    data.toDF("h").repartition(parts)
      .agg(KmvAgg.kmv(col("h"), k).as("sk"))
      .head().getSeq[Long](0)

  test("pure set function: duplication, order, and partitioning are invisible") {
    val base = (1L to 500L).map(i => i * 7919L % 100003L).distinct
    val ref = sketch(base, 32, 1)
    assert(ref.length == 32 && ref == ref.sorted, "ascending, size k")
    // heavy duplication + reversal + different partial/merge shapes
    val dup = (base ++ base.reverse ++ base.take(50) ++ base).reverse
    for (parts <- Seq(1, 3, 11))
      assert(sketch(dup, 32, parts) == ref, s"parts=$parts diverged")
    // the sketch IS the k smallest distinct values
    assert(ref == base.distinct.sorted.take(32))
  }

  test("below k the sketch is the full distinct set (exact cardinality)") {
    val tiny = Seq(5L, 3L, 5L, 9L, 3L, 1L)
    assert(sketch(tiny, 64, 2) == Seq(1L, 3L, 5L, 9L))
  }

  test("estimator within the KMV error band on known cardinalities") {
    val M = 72057594037927936L // 2^56
    // n distinct 56-bit md5 hashes (the q146 convention), n >> k
    for (n <- Seq(500, 2000)) {
      val hashes = (1 to n).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"kmv:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 14)
        java.lang.Long.parseLong(hex, 16)
      }
      val k = 64
      val sk = sketch(hashes, k, 5)
      val est = (k - 1L) * M / sk.last
      // standard error ~ n/sqrt(k-2) ⟹ 4 sigma ≈ n/2 at k=64
      assert(math.abs(est - n) < n / 2.0, s"n=$n est=$est out of band")
    }
  }

  test("union closure: merging per-group sketches == sketching the union (q151)") {
    val df = (1L to 4000L)
      .map(i => (i % 7, i * 6364136223846793005L % 100003L))
      .toDF("g", "h")
    val perGroup = df.groupBy("g").agg(KmvAgg.kmv(col("h"), 32).as("sk"))
    val rollup = perGroup.select(explode(col("sk")).as("h"))
      .agg(KmvAgg.kmv(col("h"), 32).as("sk")).head().getSeq[Long](0)
    val direct = df.agg(KmvAgg.kmv(col("h"), 32).as("sk"))
      .head().getSeq[Long](0)
    assert(rollup == direct, "rollup must equal the full-data sketch")
  }

  test("q146: estimate vs exact audit holds on events at sf0.001") {
    val rows = graft.SparkEntry.queries("q146_kmv_distinct")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct")
      val est = r.getAs[Long]("est_distinct")
      val err = r.getAs[Long]("err_e4")
      assert(err == math.abs(est - exact) * 10000L / exact)
      // audit contract: estimate within 50% of truth (4-sigma at k=64)
      assert(err < 5000L, s"${r.getString(0)}: err_e4=$err")
    }
  }
}
