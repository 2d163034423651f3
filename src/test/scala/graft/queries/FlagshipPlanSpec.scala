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
}
