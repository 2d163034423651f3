package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.expressions.{SetExpressions, SignatureAggregates, VectorExpressions}

/** Engine extension point — the library's native expressions become SQL
  * functions in any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (Sessions.local sets
  * it; any external session can too). `register` is the programmatic
  * equivalent for sessions constructed without the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // HOF dot/norm -> native codegen'd expressions, for queries written
    // in the plain functions._ style (see NativeVectorRewrite scaladoc
    // for the rewrite contract)
    ext.injectOptimizerRule(_ => graft.plans.NativeVectorRewrite)
    // SQL UPDATE on graft tables -> the commit protocol's zone-map-
    // scoped copy-on-write rewrite (see GraftDmlRewrite scaladoc)
    ext.injectResolutionRule(_ => graft.plans.GraftDmlRewrite)
    // deletion-vector reads: a graft relation whose snapshot carries
    // DVs becomes union(clean DSv2 scan, position-filtered dv leg).
    // Optimizer-stage on purpose: after analysis (count(*) detectable)
    // but before V2ScanRelationPushDown (relation still rewritable) —
    // see GraftDvReadRewrite scaladoc
    ext.injectOptimizerRule(_ => graft.plans.GraftDvReadRewrite)
    // commit-log audit surfaces as table-valued functions:
    // graft_history(t), graft_changes(t, from, to, key)
    graft.plans.GraftTableFunctions.functions.foreach(ext.injectTableFunction)
  }
}

object GraftExtensions {
  private def all = VectorExpressions.functions ++ SetExpressions.functions ++
    SignatureAggregates.functions ++ graft.expressions.MisraGriesAgg.functions ++
    graft.expressions.KmvAgg.functions

  /** Idempotent per-session registration for sessions not built with
    * the extensions config (e.g. a shared test session). Registers the
    * SQL functions AND installs [[graft.plans.NativeVectorRewrite]]
    * (via `experimental.extraOptimizations`) so such sessions get the
    * same HOF→native rewrite as `spark.sql.extensions` sessions.
    */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(graft.plans.NativeVectorRewrite))
      spark.experimental.extraOptimizations = cur :+ graft.plans.NativeVectorRewrite
  }
}
