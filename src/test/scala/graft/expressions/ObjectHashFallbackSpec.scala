package graft.expressions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.functions._

import graft.{Sessions, SparkSuite}
import graft.text.NearDup

/** Pins the r6→r7 bench fix: the signature aggregates (MinHashAgg /
  * SimHashAgg) plan as ObjectHashAggregateExec, which abandons hashing
  * and SORTS the remainder of every partition once it sees more than
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * keys (Spark default: 128). A per-doc groupBy guarantees thousands of
  * keys per partition, so with the default EVERY partition sorted its
  * whole exploded-gram stream — cheap in isolation, catastrophic under
  * late-session memory pressure (r6 driver bench: q41 69.3 s vs 10.0 s
  * isolated). [[Sessions.ObjectHashFallbackThreshold]] pins the
  * threshold above any sane groups-per-partition count; these tests
  * assert (via the operator's own `numTasksFallBacked` metric) that the
  * pinned session hashes all the way, and that the metric WOULD detect
  * a fallback at the Spark default — so the zero in the first assert is
  * meaningful.
  */
class ObjectHashFallbackSpec extends SparkSuite {

  // 600 distinct doc keys forced into ONE upstream partition — far past
  // Spark's default threshold of 128, far under the pinned one.
  private def perDocRows =
    spark.range(120000)
      .select((col("id") % 600).as("doc_id"), xxhash64(col("id")).as("gram"))
      .repartition(1)

  // every TypedImperativeAggregate the engine groups per key
  private def perKeyAggs: Seq[(String, DataFrame)] = Seq(
    "minhash_agg" -> perDocRows.groupBy(col("doc_id"))
      .agg(NearDup.minhashAggNative(col("gram"), 32).as("sig")),
    "simhash_agg" -> perDocRows.groupBy(col("doc_id"))
      .agg(NearDup.simhashAggNative(col("gram"), bits = 56).as("sh")),
    "misra_gries" -> perDocRows
      .withColumn("tok", (col("gram") % 97).cast("string"))
      .groupBy(col("doc_id"))
      .agg(MisraGriesAgg.misraGries(col("tok"), 32).as("mg")),
    "kmv_sketch" -> perDocRows.groupBy(col("doc_id"))
      .agg(KmvAgg.kmv(col("gram"), 32).as("sk")))

  private def perDocSignatures: DataFrame = perKeyAggs.head._2

  /** Executes `df` and sums `numTasksFallBacked` over its
    * ObjectHashAggregateExec nodes (AQE is disabled by the callers so
    * the executed plan is the literal tree).
    */
  private def fallbackTasks(df: DataFrame): Long = {
    df.collect()
    val nodes = df.queryExecution.executedPlan.collect {
      case o: ObjectHashAggregateExec => o
    }
    assert(nodes.nonEmpty,
      s"expected ObjectHashAggregateExec in\n${df.queryExecution.executedPlan}")
    nodes.map(_.metrics("numTasksFallBacked").value).sum
  }

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("pinned threshold: NO per-key custom aggregate sort-falls-back (minhash/simhash/misra-gries/kmv)") {
    withConf("spark.sql.adaptive.enabled", "false") {
      assert(spark.conf.get(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
        === Sessions.ObjectHashFallbackThreshold.toString,
        "suite session must carry the engine's pinned threshold")
      for ((name, df) <- perKeyAggs)
        assert(fallbackTasks(df) === 0L, s"$name fell back to sort")
    }
  }

  test("control: at Spark's default threshold the same plan falls back (metric detects it)") {
    withConf("spark.sql.adaptive.enabled", "false") {
      withConf("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128") {
        assert(fallbackTasks(perDocSignatures) > 0L)
      }
    }
  }
}
