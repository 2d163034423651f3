package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Runtime bloom-filter join reduction — the AQE-era complement to
  * static predicate pushdown: when one join side carries a selective
  * filter and the other is a large shuffle scan, Spark can build a
  * bloom filter over the filtered side's join keys at runtime and push
  * `might_contain` into the big side's scan, cutting the shuffled
  * volume before the join. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the ~matching slice,
  * WITHOUT hand-writing the q61-style broadcast semi-join.
  *
  * The feature is conf-gated; this spec pins that (a) the engine's
  * session can enable it, (b) the filter actually injects into this
  * engine's canonical fact⋈filtered-dim shape, and (c) results are
  * unchanged — with a negative control proving the plan delta comes
  * from the flag, not the data.
  */
class RuntimeFilterSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def factDimJoin() = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"))
    val hot = graft.Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 350000) // highly selective dim slice
      .select(col("o_orderkey"))
    li.join(hot, li("l_orderkey") === hot("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
  }

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom runtime filter injects under the flag and preserves results") {
    // force a shuffle join (broadcast off) so the reduction has a
    // shuffle to reduce; thresholds default-permissive at this scale
    val base = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    var off: Array[org.apache.spark.sql.Row] = null
    var on: Array[org.apache.spark.sql.Row] = null
    withConfs(base :+
      ("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false"): _*) {
      val df = factDimJoin()
      assert(!df.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "negative control: filter injected with the flag off")
      off = df.collect()
    }
    withConfs(base :+
      ("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true"): _*) {
      val df = factDimJoin()
      assert(df.queryExecution.optimizedPlan.toString.contains("might_contain"),
        s"expected a runtime bloom filter on the fact side:\n${df.queryExecution.optimizedPlan}")
      on = df.collect()
    }
    assert(off.map(_.toString).toSeq === on.map(_.toString).toSeq,
      "runtime filter changed results")
  }
}
