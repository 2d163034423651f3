package graft.plans

import org.apache.spark.sql.{GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit

import graft.operators.VersionedTable
import graft.sources.{GraftFilters, GraftTable}

/** SQL `UPDATE` on the graft format — the third DML leg (INSERT rides
  * the DSv2 write path, DELETE the `SupportsDelete` pushdown; UPDATE
  * has no capability-style hook short of the full
  * `SupportsRowLevelOperations` machinery, whose write leg demands a
  * native `BatchWrite`). The lakehouse-extension seam instead: an
  * injected RESOLUTION rule rewrites a resolved [[UpdateTable]] over a
  * graft relation into a [[GraftUpdateCommand]] before the analyzer's
  * row-level-operation check rejects it; the command routes into
  * [[VersionedTable.commitUpdate]] — the same copy-on-write, zone-map-
  * scoped rewrite DELETE uses, so `UPDATE t SET v = v + 1 WHERE k
  * BETWEEN a AND b` on a 100 TB table rewrites only the files whose
  * maps can hold a matching key. Non-graft tables are untouched (they
  * keep Spark's standard unsupported-operation error).
  */
object GraftDmlRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u: UpdateTable if u.resolved =>
        u.table.collectFirst {
          case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
            r.table.asInstanceOf[GraftTable]
        } match {
          case Some(t) =>
            // normalize while the condition is still RESOLVED: inline
            // With wrappers (BETWEEN resolves through one) and fold
            // the casts analysis wrapped literals in (k >= CAST(15 AS
            // BIGINT)) — both the footprint translation and the stored
            // predicate derive from this form
            val cond = u.condition.map(normalize)
            val ranges = cond.toSeq
              .flatMap(splitConjuncts)
              .flatMap(e => GraftBridge.translateFilter(e))
              .flatMap(f => GraftFilters.toRanges(f, t.tableSchema))
              .collect {
                case VersionedTable.LongRange(c, lo, hi) => (c, lo, hi)
              }
            GraftUpdateCommand(t.base,
              u.assignments.map(a =>
                (attrName(a.key), GraftExpr(stripAttrs(normalize(a.value))))),
              cond.map(e => GraftExpr(stripAttrs(e))), ranges)
          case None => u
        }
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def attrName(e: Expression): String = e match {
    case a: AttributeReference => a.name
    case other => throw new IllegalArgumentException(
      s"graft UPDATE supports plain column assignments, got $other")
  }

  /** Inline `With` common-subexpression wrappers (Spark 4 resolves
    * BETWEEN through one — their defs would call `dataType` on
    * stripped attributes during any later transform) and fold foldable
    * subtrees to plain literals (what the filter translation matches).
    * Runs on RESOLVED expressions only.
    */
  private def normalize(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CommonExpressionRef, Literal, RuntimeReplaceable, With}
    e.transformUp {
      // BETWEEN et al. resolve as RuntimeReplaceable; the optimizer
      // rule that expands them hasn't run at analysis time
      case r: RuntimeReplaceable => r.replacement
    }.transformUp {
      case w: With =>
        val byId = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case r: CommonExpressionRef => byId.getOrElse(r.id, r)
        }
    }.transformUp {
      case e if e.foldable => Literal.create(e.eval(), e.dataType)
    }
  }

  /** Strip the analyzer's attribute bindings so the expression can
    * re-resolve against the files the commit actually rewrites (the
    * update reads a FRESH frame of the touched files — the original
    * exprIds don't exist in that plan).
    */
  private def stripAttrs(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }
}

/** An expression as OPAQUE command data: the SET/WHERE trees are
  * deliberately unresolved (they re-resolve against the frame of
  * touched files at run time), so they must stay invisible to
  * `QueryPlan.expressions` — CheckAnalysis would otherwise reject the
  * command for carrying unresolved attributes. A non-Expression,
  * non-Iterable wrapper is exactly that seam.
  */
case class GraftExpr(e: Expression)

/** The eager execution node [[GraftDmlRewrite]] plans `UPDATE` into —
  * a V1-style runnable command (planned by Spark's own strategy, no
  * custom physical planning needed), whose body is one
  * [[VersionedTable.commitUpdate]]: condition translated BOTH to the
  * row predicate and (via the read path's filter translation) to the
  * zone-map footprint that scopes which files rewrite.
  */
case class GraftUpdateCommand(base: String,
                              sets: Seq[(String, GraftExpr)],
                              condition: Option[GraftExpr],
                              ranges: Seq[(String, Long, Long)])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val rowPred = condition.map(h => GraftBridge.column(h.e))
      .getOrElse(lit(true))
    // rewritten files keep the table's stats discipline (same rule as
    // the DELETE path): the union of columns any current file maps
    val statsCols = VersionedTable.latestVersion(base).toSeq
      .flatMap(v => VersionedTable.entries(base, v))
      .flatMap(_.stats.keys).distinct
    VersionedTable.commitUpdate(spark, base, rowPred,
      sets.map { case (c, h) => (c, GraftBridge.column(h.e)) },
      ranges, statsCols)
    Seq.empty
  }
}
