package graft.plans

import org.apache.spark.sql.{GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateStarAction, UpdateTable}
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
            val translated = cond.toSeq
              .flatMap(splitConjuncts)
              .flatMap(e => GraftBridge.translateFilter(e))
              .flatMap(f => GraftFilters.toRanges(f, t.tableSchema))
            GraftUpdateCommand(t.base,
              u.assignments.map(a =>
                (attrName(a.key), GraftExpr(stripAttrs(normalize(a.value))))),
              cond.map(e => GraftExpr(stripAttrs(e))),
              translated.collect {
                case VersionedTable.LongRange(c, lo, hi) => (c, lo, hi)
              },
              translated.collect { case p: VersionedTable.KeyProbe => p })
          case None => u
        }

      // Step 1: ACCEPT_ANY_SCHEMA makes the analyzer SKIP merge
      // reference resolution (NamedRelation.skipSchemaResolution) —
      // re-target the relation at a strict copy so Spark's own
      // ResolveReferences resolves the ON/SET/VALUES expressions on a
      // later iteration; step 2 below then rewrites the resolved merge.
      case m: MergeIntoTable if !m.resolved && m.targetTable.resolved &&
          m.sourceTable.resolved &&
          m.targetTable.exists {
            case r: DataSourceV2Relation => r.table match {
              case g: GraftTable => g.acceptAnySchema
              case _ => false
            }
            case _ => false
          } =>
        m.copy(targetTable = m.targetTable.transformUp {
          case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
              r.table.asInstanceOf[GraftTable].acceptAnySchema =>
            r.copy(table = r.table.asInstanceOf[GraftTable].strict)
        })

      // Step 2: the resolved merge becomes the runnable command.
      case m: MergeIntoTable if m.resolved =>
        m.targetTable.collectFirst {
          case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
            r.table.asInstanceOf[GraftTable]
        } match {
          case Some(t) => rewriteMerge(m, t)
          case None => m
        }
    }

  /** Translate a resolved [[MergeIntoTable]] over a graft target into
    * a [[GraftMergeCommand]]. The ON condition must be a conjunction
    * of target-column = source-expression equalities (the equi-key
    * shape every zone-map-scoped merge needs — Delta's merge is the
    * same join); matched clauses may UPDATE/DELETE, not-matched
    * clauses INSERT, each with optional conditions, first applicable
    * wins. Target references rewrite to `__t_<name>`, source to
    * `__s_<name>` — the joined frame's namespaces (collision-free by
    * construction). `WHEN NOT MATCHED BY SOURCE` and automatic schema
    * evolution are rejected loudly.
    */
  private def rewriteMerge(m: MergeIntoTable, t: GraftTable): LogicalPlan = {
    require(!m.withSchemaEvolution,
      "graft MERGE does not support WITH SCHEMA EVOLUTION")
    val tAttrs = m.targetTable.outputSet
    val sAttrs = m.sourceTable.outputSet
    val tCols = m.targetTable.output.map(_.name)
    def side(e: Expression): Expression = e.transform {
      case a: AttributeReference if tAttrs.contains(a) =>
        UnresolvedAttribute.quoted(s"__t_${a.name}")
      case a: AttributeReference if sAttrs.contains(a) =>
        UnresolvedAttribute.quoted(s"__s_${a.name}")
    }
    def sourceOnly(e: Expression): Expression = {
      e.foreach {
        case a: AttributeReference if tAttrs.contains(a) =>
          throw new IllegalArgumentException(
            s"NOT MATCHED clause references target column ${a.name}")
        case _ => ()
      }
      side(e)
    }
    def targetOnly(e: Expression): Expression = {
      e.foreach {
        case a: AttributeReference if sAttrs.contains(a) =>
          throw new IllegalArgumentException(
            s"NOT MATCHED BY SOURCE clause references source column " +
              s"${a.name}")
        case _ => ()
      }
      side(e)
    }
    // ON condition → (targetCol, sourceExpr) key pairs
    val keys = splitConjuncts(normalize(m.mergeCondition)).map {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(l, r) =>
        val (tSide, sSide) =
          if (l.references.subsetOf(tAttrs) &&
            r.references.subsetOf(sAttrs)) (l, r)
          else if (r.references.subsetOf(tAttrs) &&
            l.references.subsetOf(sAttrs)) (r, l)
          else throw new IllegalArgumentException(
            s"graft MERGE ON conjunct must compare a target column " +
              s"to a source expression, got $l = $r")
        tSide match {
          case a: AttributeReference => (a.name, GraftExpr(sourceOnly(sSide)))
          case other => throw new IllegalArgumentException(
            s"graft MERGE ON target side must be a plain column, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"graft MERGE ON condition must be equi-join conjuncts, got $other")
    }
    def assigns(as: Seq[Assignment]): Seq[(String, GraftExpr)] =
      as.map(a => (attrName(a.key), GraftExpr(side(normalize(a.value)))))
    def starSets: Seq[(String, GraftExpr)] = tCols.map(c =>
      (c, GraftExpr(UnresolvedAttribute.quoted(s"__s_$c"))))
    val matched: Seq[GraftMergeCommand.Matched] = m.matchedActions.map {
      case UpdateAction(c, as, _) => GraftMergeCommand.MatchedUpdate(
        c.map(e => GraftExpr(side(normalize(e)))), assigns(as))
      case UpdateStarAction(c) => GraftMergeCommand.MatchedUpdate(
        c.map(e => GraftExpr(side(normalize(e)))), starSets)
      case DeleteAction(c) => GraftMergeCommand.MatchedDelete(
        c.map(e => GraftExpr(side(normalize(e)))))
      case other: MergeAction => throw new IllegalArgumentException(
        s"unsupported WHEN MATCHED action: $other")
    }
    val inserts: Seq[GraftMergeCommand.Insert] = m.notMatchedActions.map {
      case InsertAction(c, as) => GraftMergeCommand.Insert(
        c.map(e => GraftExpr(sourceOnly(normalize(e)))),
        as.map(a => (attrName(a.key),
          GraftExpr(sourceOnly(normalize(a.value))))))
      case InsertStarAction(c) => GraftMergeCommand.Insert(
        c.map(e => GraftExpr(sourceOnly(normalize(e)))), starSets)
      case other: MergeAction => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED action: $other")
    }
    val bySource: Seq[GraftMergeCommand.Matched] =
      m.notMatchedBySourceActions.map {
        case UpdateAction(c, as, _) => GraftMergeCommand.MatchedUpdate(
          c.map(e => GraftExpr(targetOnly(normalize(e)))),
          as.map(a => (attrName(a.key),
            GraftExpr(targetOnly(normalize(a.value))))))
        case DeleteAction(c) => GraftMergeCommand.MatchedDelete(
          c.map(e => GraftExpr(targetOnly(normalize(e)))))
        case other: MergeAction => throw new IllegalArgumentException(
          s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
      }
    GraftMergeCommand(t.base, GraftMergeCommand.Plan(m.sourceTable),
      keys, matched, inserts, t.tableSchema, bySource)
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
                              ranges: Seq[(String, Long, Long)],
                              probes: Seq[VersionedTable.KeyProbe] = Nil)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val rowPred = condition.map(h => GraftBridge.column(h.e))
      .getOrElse(lit(true))
    // rewritten files keep the table's stats discipline (same rule as
    // the DELETE path): the union of columns any current file maps
    val (statsCols, bloomCols) = VersionedTable.statsDiscipline(base)
    VersionedTable.commitUpdate(spark, base, rowPred,
      sets.map { case (c, h) => (c, GraftBridge.column(h.e)) },
      ranges, statsCols, bloomCols = bloomCols, pruneProbes = probes)
    Seq.empty
  }
}

/** SQL `MERGE INTO` over a graft target, planned by [[GraftDmlRewrite]]
  * and executed by [[VersionedTable.commitMergeInto]] (footprint-scoped
  * copy-on-write: candidate files from source key extrema, touched
  * files from one semi-join, first-applicable-clause cascade,
  * cardinality check). The captured source plan re-executes at run
  * time — it is a resolved, self-contained query.
  */
case class GraftMergeCommand(base: String,
                             source: GraftMergeCommand.Plan,
                             keys: Seq[(String, GraftExpr)],
                             matched: Seq[GraftMergeCommand.Matched],
                             inserts: Seq[GraftMergeCommand.Insert],
                             targetSchema: org.apache.spark.sql.types
                               .StructType,
                             bySource: Seq[GraftMergeCommand.Matched] = Nil)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    import GraftMergeCommand._
    def toOp(ms: Seq[Matched]): Seq[VersionedTable.MergeMatched] =
      ms.map {
        case MatchedUpdate(c, sets) => VersionedTable.MergeUpdate(
          c.map(h => GraftBridge.column(h.e)),
          sets.map { case (n, h) => (n, GraftBridge.column(h.e)) })
        case MatchedDelete(c) => VersionedTable.MergeDelete(
          c.map(h => GraftBridge.column(h.e)))
      }
    val src = GraftBridge.ofRows(spark, source.plan)
    val (statsCols, bloomCols) = VersionedTable.statsDiscipline(base)
    VersionedTable.commitMergeInto(spark, base, src,
      keys.map { case (c, h) => (c, GraftBridge.column(h.e)) },
      toOp(matched),
      inserts.map { case Insert(c, sets) => VersionedTable.MergeInsert(
        c.map(h => GraftBridge.column(h.e)),
        sets.map { case (n, h) => (n, GraftBridge.column(h.e)) })
      },
      targetSchema, statsCols, bloomCols = bloomCols,
      bySource = toOp(bySource))
    Seq.empty
  }
}

object GraftMergeCommand {
  /** A resolved plan as OPAQUE command data (same reasoning as
    * [[GraftExpr]]: a bare LogicalPlan field would be walked by plan
    * traversals that must not see it).
    */
  case class Plan(plan: LogicalPlan)
  sealed trait Matched
  case class MatchedUpdate(cond: Option[GraftExpr],
                           sets: Seq[(String, GraftExpr)]) extends Matched
  case class MatchedDelete(cond: Option[GraftExpr]) extends Matched
  case class Insert(cond: Option[GraftExpr],
                    sets: Seq[(String, GraftExpr)])
}
