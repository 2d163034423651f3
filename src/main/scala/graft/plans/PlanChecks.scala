package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.{WindowExecBase, WindowGroupLimitExec}

/** Physical-plan invariants shared by the registry-wide test sweep
  * (`RegistryPlanSpec`) and the scale harness (`ScaleBench`): the two
  * plan shapes that cannot survive a scale-up — an unbounded
  * CartesianProduct and a partitionless window over data — plus the
  * ObjectHashAggregate sort-fallback counter. One definition, so the
  * invariant the tests pin at sf0.001 is literally the one the scale
  * run re-checks on amplified data.
  */
object PlanChecks {

  /** Expression subqueries (scalar/IN) host their own physical plans
    * that neither `collect` nor `toString` descends into — sweep them
    * explicitly so an offender inside a subquery can't slip past.
    */
  def withSubqueryPlans(p: SparkPlan): Seq[SparkPlan] =
    p +: p.collect { case n => n }.flatMap(_.subqueries).flatMap(withSubqueryPlans)

  /** True if any (sub)plan contains an unbounded CartesianProduct.
    * BroadcastNestedLoopJoin against literal/dimension frames is fine
    * and not flagged.
    */
  def hasCartesianProduct(p: SparkPlan): Boolean =
    withSubqueryPlans(p).exists(_.toString.contains("CartesianProduct"))

  /** Partitionless windows whose input carries a real data column —
    * the whole-table-through-one-task shape. GlobalRank's offsets
    * frame (a #partitions-row aggregate, all columns "__"-prefixed) is
    * the only allowed partitionless window.
    */
  def partitionlessDataWindows(p: SparkPlan): Seq[Seq[String]] = {
    def go(p: SparkPlan): Seq[(SparkPlan, Seq[String])] =
      p.collect {
        case w: WindowExecBase if w.partitionSpec.isEmpty =>
          Seq(w -> w.child.output.map(_.name))
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
          Seq(w -> w.child.output.map(_.name))
        case a: AdaptiveSparkPlanExec => go(a.initialPlan)
        case m: InMemoryTableScanExec => go(m.relation.cachedPlan)
      }.flatten
    withSubqueryPlans(p).flatMap(go)
      .filterNot { case (_, cols) => cols.forall(_.startsWith("__")) }
      .map(_._2)
  }

  /** Sum of `numTasksFallBacked` over every ObjectHashAggregateExec in
    * an EXECUTED plan (descends AQE's final plan and cached relations).
    * Non-zero means some task abandoned hashing and sorted its
    * partition — the r6 bench blow-up shape.
    */
  def fallbackTasks(p: SparkPlan): Long = {
    def go(p: SparkPlan): Seq[ObjectHashAggregateExec] =
      p.collect {
        case o: ObjectHashAggregateExec => Seq(o)
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        // materialized AQE stages are leaf nodes wrapping their stage
        // plan — descend or miss every aggregate below an exchange
        case qs: QueryStageExec => go(qs.plan)
        case m: InMemoryTableScanExec => go(m.relation.cachedPlan)
      }.flatten
    go(p).map(_.metrics("numTasksFallBacked").value).sum
  }
}
