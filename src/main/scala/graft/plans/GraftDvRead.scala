package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, DeleteFromTable, LogicalPlan, MergeIntoTable, Project, Union, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.IntegerType

import graft.operators.VersionedTable
import graft.sources.GraftTable

/** Deletion vectors for the DSv2 READ path — the injected resolution
  * rule that keeps `SELECT ... FROM graft_table` exact after a
  * merge-on-read DELETE ([[VersionedTable.commitDeleteMoR]]).
  *
  * Spark's parquet scan machinery has no hook to drop per-file row
  * positions (Delta wraps its own scan for exactly this), so the rule
  * rewrites a resolved graft relation whose snapshot carries deletion
  * vectors into a UNION of two legs:
  *
  *   - the CLEAN leg: the SAME DSv2 relation restricted to entries
  *     without a vector ([[GraftTable.cleanOnly]]) — zone-map/bloom
  *     file skipping, parquet filter pushdown, column pruning and
  *     whole-stage codegen all untouched for the overwhelming
  *     majority of files;
  *   - the DV leg: the dv'd entries read through the library's
  *     position-filtering primitive ([[VersionedTable.readEntries]] —
  *     one broadcast hash LEFT ANTI join on (file, row_index) against
  *     the sidecar positions).
  *
  * The union's output keeps the original relation's attribute ids
  * (first child = the copied relation), so every parent reference
  * resolves unchanged. Scale: the dv leg costs ∝ dv'd files — by the
  * MoR contract the recently-point-deleted minority, re-absorbed into
  * clean files at the next compaction — while the clean leg stays the
  * plan a DV-less table produces; a table with no vectors is left
  * completely untouched (entry check is plan-time driver metadata).
  *
  * DML/write targets are exempt: their execution paths (DELETE's
  * `SupportsDelete`, UPDATE/MERGE's commands, the V1 write bridge)
  * already run DV-aware through `readEntries`, and rewriting the
  * relation under them would break target resolution.
  *
  * Injected as an OPTIMIZER rule (not resolution): it runs after
  * analysis — so a bare global `SELECT count(*)` is reliably
  * recognizable as resolved `Count(Literal(1))` — but still before
  * `V2ScanRelationPushDown`, so the relation is a
  * [[DataSourceV2Relation]] the union rewrite can replace. That
  * ordering lets count-only aggregates stay UN-rewritten when the
  * manifest can answer them ([[countOnlyExempt]]): the scan builder's
  * manifest COUNT pushdown is already DV-exact (live = physical −
  * vector count, [[graft.sources.GraftScanBuilder]]), and rewriting
  * first would bury the Aggregate under a Union and forfeit the
  * zero-task LocalScan answer.
  */
object GraftDvReadRewrite extends Rule[LogicalPlan] {

  /** Aggregate output that is provably `count(*)`-only: every
    * expression references no columns and every aggregate function is
    * a plain unfiltered non-distinct `Count(Literal(1))` (what
    * `count(*)` resolves to, and exactly what DSv2 translates to
    * `CountStar` for the manifest pushdown). Anything else — min/max,
    * count(col), FILTER clauses, distinct — must go through the DV
    * union, because a parquet-footer or raw-scan fallback would count
    * soft-deleted rows.
    */
  private def isCountOnly(aggs: Seq[NamedExpression]): Boolean =
    aggs.nonEmpty && aggs.forall { ne =>
      ne.references.isEmpty &&
        ne.collect { case ae: AggregateExpression => ae }.forall {
          case AggregateExpression(
              Count(Seq(Literal(1, IntegerType))), _, false, None, _) => true
          case _ => false
        }
    }

  /** Relations sitting DIRECTLY under a global count-only Aggregate
    * (at most an attribute-only Project between) whose manifest knows
    * every file's row count — the cases where skipping the rewrite is
    * safe because the manifest pushdown will answer, DV-subtracted.
    */
  private def countOnlyExempt(plan: LogicalPlan): Set[DataSourceV2Relation] =
    plan.collect {
      case Aggregate(Nil, aggs, child, _) if isCountOnly(aggs) =>
        val rel = child match {
          case r: DataSourceV2Relation => Some(r)
          case Project(es, r: DataSourceV2Relation)
              if es.forall(_.isInstanceOf[Attribute]) => Some(r)
          case _ => None
        }
        rel.filter(_.table match {
          case g: GraftTable => g.snapshotEntries.forall(_.rows >= 0L)
          case _ => false
        }).toSeq
    }.flatten.toSet

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val exempt = (plan.collect {
      case u: UpdateTable => u.table
      case m: MergeIntoTable => m.targetTable
      case d: DeleteFromTable => d.table
      case w: V2WriteCommand => w.table
    }.flatMap(_.collect { case r: DataSourceV2Relation => r }).toSet
      ++ countOnlyExempt(plan))
    plan.transform {
      case r: DataSourceV2Relation if !exempt.contains(r) =>
        r.table match {
          // COLUMN-MAPPED table (r12, re-planned r13): files live
          // under PHYSICAL names, so the relation is rewritten to a
          // physical-schema DSv2 relation (same entries, names the
          // files actually carry) under a Project that aliases each
          // physical attribute back to its logical name on the
          // original attribute ids. Predicates on logical columns
          // push through the aliases (replaceAlias) and reach the
          // scan as PHYSICAL-name filters — which is exactly what the
          // manifest stats tokens and the parquet row groups are
          // keyed by, so zone-map/bloom file skipping AND row-group
          // pushdown both survive a rename (the r12 leg forfeited
          // them by diverting to the library read). DV'd entries
          // split off through the same union-leg discipline as
          // unmapped tables. Idempotent: the physical table's schema
          // is mapping-metadata-free, so the rewritten relation never
          // matches this case again.
          case g: GraftTable
              if graft.operators.ColumnMapping.isMapped(g.tableSchema) &&
                g.snapshotVersion.isDefined =>
            import graft.operators.ColumnMapping
            val toPhys = ColumnMapping.toPhysical(g.tableSchema)
            val dvd = g.snapshotEntries.filter(_.dv.exists(_.count > 0L))
            val physTable = new GraftTable(g.base, g.snapshotVersion,
              ColumnMapping.stripMeta(
                ColumnMapping.physicalSchema(g.tableSchema)),
              g.acceptAnySchema, dvCleanOnly = dvd.nonEmpty)
            val physRel = DataSourceV2Relation.create(physTable, None, None)
            val physByName = physRel.output.map(a => a.name -> a).toMap
            val clean = Project(r.output.map { o =>
              org.apache.spark.sql.catalyst.expressions.Alias(
                physByName(toPhys.getOrElse(o.name, o.name)),
                o.name)(exprId = o.exprId)
            }, physRel)
            if (dvd.isEmpty) clean
            else {
              val s = SparkSession.active
              // logical-named by construction (readEntries aliases
              // physical→logical for mapped schemas); pre-optimized
              // for the same hint-folding reason as the dv leg below
              val dvPlan = VersionedTable.readEntries(s, g.base, dvd,
                Some(g.tableSchema)).queryExecution.optimizedPlan
              val byName = dvPlan.output.map(a => a.name -> a).toMap
              val aligned = Project(r.output.map(o => byName(o.name)), dvPlan)
              Union(Seq(clean, aligned))
            }
          case g: GraftTable if !g.dvCleanOnly =>
            val dvd = g.snapshotEntries.filter(_.dv.exists(_.count > 0L))
            if (dvd.isEmpty) r
            else {
              val s = SparkSession.active
              val clean = r.copy(table = g.cleanOnly)
              // optimizedPlan, not analyzed: this rule runs AFTER the
              // optimizer's hint-elimination batch, so an embedded
              // analyzed subtree would carry the dv anti-join's
              // broadcast() ResolvedHint into physical planning and
              // fail there; pre-optimizing the leg folds the hint into
              // the Join node (and costs only driver-plane work ∝ the
              // dv leg's plan size)
              val dvPlan = VersionedTable.readEntries(s, g.base, dvd,
                Some(g.tableSchema)).queryExecution.optimizedPlan
              val byName = dvPlan.output.map(a => a.name -> a).toMap
              val aligned = Project(r.output.map(o => byName(o.name)), dvPlan)
              Union(Seq(clean, aligned))
            }
          case _ => r
        }
    }
  }
}
