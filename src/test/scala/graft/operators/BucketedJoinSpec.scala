package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Bucketing as the co-located-join strategy: both fact tables written
  * bucketed on the join key join WITHOUT a shuffle — at 100 TB the
  * exchange, not the join, is the bottleneck, and pre-bucketing
  * amortizes it across every downstream join on that key.
  */
class BucketedJoinSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("join on the bucket key plans with no shuffle exchange") {
    val tmp = Files.createTempDirectory("graft_bucketed").toString
    val orders = graft.Tables.orders(spark, dir)
    val customer = graft.Tables.customer(spark, dir)
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$tmp/orders").saveAsTable("orders_bucketed")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$tmp/customer").saveAsTable("customer_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      // ShuffleExchangeExec prints as "Exchange hashpartitioning(...)"
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // positive control: the same join over plain parquet DOES shuffle
      // (otherwise the assertion above is vacuous)
      val unbucketed = orders.join(customer, col("o_custkey") === col("c_custkey"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      // same rows as the plain (shuffling) join
      assert(joined.count() === unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }

  test("q69 registered entry joins on the bucket key without an exchange") {
    // the aggregate downstream legitimately exchanges on c_mktsegment;
    // the bucketed join itself must never exchange on the JOIN key
    val q69 = graft.SparkEntry.queries("q69_bucketed_join")(spark, dir)
    val plan = q69.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"q69 should merge-join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_custkey")
      && !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"q69 must not shuffle on the bucketed join key:\n$plan")
  }
}
