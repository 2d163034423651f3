package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Registry-wide physical-plan invariant: NO benched query may plan an
  * unbounded CartesianProduct — the one join shape that cannot survive
  * any scale-up. Broadcast nested-loop joins against literal/dimension
  * frames (q36's 3-row query set, q54's band table) are fine and
  * planned as BroadcastNestedLoopJoin, which this does not flag.
  *
  * This is a sweep, not a per-query pin: any future registry entry
  * that accidentally drops a join condition (the classic cause — a
  * typo'd column name turning an equi-join into a cross) fails here
  * before it reaches the driver.
  */
class RegistryPlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("no benched query plans a CartesianProduct") {
    val offenders = SparkEntry.registry.filter(_.bench).flatMap { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded cartesian product in: ${offenders.mkString(", ")}")
  }
}
