package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Opt-in reliable materialization for iterative / multi-read operators.
  *
  * GlobalRank, ConnectedComponents and Salt all materialize an
  * intermediate frame that is read more than once (offsets + final join;
  * per-round labels; salted partials) and whose REcomputation would be
  * inconsistent with reads that already happened — because the frame
  * contains partitioning-dependent values (`monotonically_increasing_id`,
  * `spark_partition_id`). On local mode and healthy clusters,
  * persist/localCheckpoint is correct and cheap. On a cluster with flaky
  * executors, lost blocks either fail the job (localCheckpoint) or
  * trigger a recompute that can silently shift those values (persist).
  *
  * This is the documented escape hatch: when
  * `spark.graft.reliableCheckpoints=true` AND a checkpoint directory is
  * configured (`SparkContext.setCheckpointDir`, pointing at replicated
  * storage on a real cluster), [[barrier]] writes the frame through a
  * reliable `checkpoint()` — recomputation becomes impossible, the
  * hazard is closed. Otherwise it applies the operator's local fallback
  * (persist or localCheckpoint) unchanged.
  *
  * Checkpoint files accumulate under the checkpoint dir for the session;
  * set `spark.cleaner.referenceTracking.cleanCheckpoints=true` to have
  * Spark GC them when the frames become unreachable.
  */
object Reliable {

  val Flag = "spark.graft.reliableCheckpoints"

  def enabled(spark: SparkSession): Boolean =
    spark.conf.get(Flag, "false").toBoolean &&
      spark.sparkContext.getCheckpointDir.isDefined

  /** Durable barrier when enabled, else the operator's local fallback
    * (e.g. `_.persist(...)` or `_.localCheckpoint()`).
    */
  def barrier(df: DataFrame)(fallback: DataFrame => DataFrame): DataFrame =
    if (enabled(df.sparkSession)) df.checkpoint() else fallback(df)
}
