package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native expressions.
  *
  * Spark 4 made the conversion (`classic.ExpressionUtils`) private[sql];
  * extension libraries conventionally host a one-line shim inside the
  * package to build `Column`s over custom Catalyst expressions without
  * going through the (session-dependent) function registry. This is the
  * entire footprint inside Spark's namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Catalyst-expression → source-Filter translation for the graft
    * DSv2 file index (`DataSourceStrategy.translateFilter` is
    * protected[sql]; every lakehouse connector needs exactly this
    * call to turn the pushed data filters into prunable ranges).
    */
  def translateFilter(e: Expression): Option[sources.Filter] =
    execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)

  /** A batch of parquet files as a STREAMING-flagged DataFrame — the
    * `Source.getBatch` contract (MicroBatchExecution asserts
    * `isStreaming` on the returned plan). This is exactly how Spark's
    * own `FileStreamSource.getBatch` builds its batches: resolve a
    * parquet relation over the file list (no existence re-check — the
    * commit log is the authority) and wrap it in a streaming
    * `LogicalRelation`. `Dataset.ofRows` and the relation machinery
    * are private[sql], hence this lives in the shim.
    */
  def streamingScan(s: SparkSession, paths: Seq[String],
                    schema: types.StructType): DataFrame = {
    val cs = s.asInstanceOf[classic.SparkSession]
    val rel = new execution.datasources.DataSource(
      cs, className = "parquet", paths = paths,
      userSpecifiedSchema = Some(schema))
      .resolveRelation(checkFilesExist = false)
    classic.Dataset.ofRows(cs,
      execution.datasources.LogicalRelation(rel, isStreaming = true))
  }

  /** A zero-row streaming-flagged frame of `schema` (the empty-batch
    * case of [[streamingScan]]).
    */
  def streamingEmpty(s: SparkSession, schema: types.StructType): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession],
      catalyst.plans.logical.LocalRelation(
        catalyst.types.DataTypeUtils.toAttributes(schema),
        Nil, isStreaming = true))

  /** A streaming micro-batch's rows re-wrapped as a BATCH DataFrame —
    * the V1 `Sink.addBatch` contract hands over a streaming-incepted
    * frame whose logical plan cannot be re-executed through batch
    * writers (`df.write` rejects `isStreaming` plans). Executing the
    * incremental plan once (`queryExecution.toRdd`) and wrapping the
    * rows batch-side is exactly what Spark's own sinks do;
    * `internalCreateDataFrame` is private[sql], hence the shim.
    */
  def batchOf(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** A resolved logical plan as a DataFrame — the graft DML commands
    * re-execute the MERGE source plan they captured at analysis
    * (`Dataset.ofRows` is private[sql]).
    */
  def ofRows(s: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
