package graft.queries

import graft.{SparkSuite, SparkEntry}

/** Plan pins for the flagship star join (q5, the driver's `entry`):
  * the claims SURVEY §8 makes about its 100 TB shape — every dimension
  * broadcast (the fact table is the only shuffled input) and no
  * sort-merge join anywhere — asserted against the actual physical
  * plan, so a regression in join strategy or broadcast sizing fails a
  * test instead of silently degrading the headline query.
  */
class FlagshipPlanSpec extends SparkSuite {

  test("q5: all three dims broadcast, no sort-merge join, agg pushed partial") {
    val df = SparkEntry.queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 3,
      s"expected 3 broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
    // partial aggregation before the exchange (map-side combine)
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"no map-side partial aggregation:\n$plan")
  }

  test("q1: shipdate filter pushed to the parquet scan, columns pruned") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
    // the scan hides under the AQE wrapper (not a child node) — unwrap
    val top = df.queryExecution.executedPlan
    val root = top.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
    }.getOrElse(top)
    val scan = root.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.metadata("PushedFilters").contains("LessThanOrEqual(l_shipdate"),
      s"filter not pushed: ${scan.metadata("PushedFilters")}")
    // the 16-column table is pruned to exactly the 6 referenced columns
    val read = scan.metadata("ReadSchema")
    val expected = Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate")
    expected.foreach(c => assert(read.contains(c), s"$c missing from $read"))
    assert(scan.requiredSchema.fields.length === expected.length,
      s"scan reads more columns than the query needs: $read")
  }
}
