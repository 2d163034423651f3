package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation (HashMin) —
  * the dedup-group step: near-duplicate PAIRS become duplicate GROUPS
  * via transitive closure. Each iteration is one join + one aggregate
  * (label = min(own, neighbors' labels)), converging in O(diameter)
  * rounds; the driver only checks a scalar convergence count per round
  * — the standard iterative-graph shape at any scale (GraphX's
  * ConnectedComponents is this same loop).
  */
object ConnectedComponents {

  /** edges: (src, dst) undirected pairs. Returns (id, component) where
    * component = min vertex id reachable from `id`.
    *
    * Fails loudly if not converged within `maxIter` (HashMin needs up
    * to graph-diameter rounds; silent partial labels would be silently
    * wrong dedup groups).
    */
  def labelPropagation(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val both = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint (not persist): each round's frame must TRUNCATE
    // lineage, or the logical plan grows by one join per round and
    // analysis cost explodes after ~20 rounds (observed on a
    // 30-vertex chain). A cluster deployment with flaky executors
    // would use reliable checkpoint() to a checkpoint dir instead.
    var labels = both.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label among self and neighbors
      val nbrMin = both
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("lbl", "nbr_lbl"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nbr_lbl")).as("nbr_min"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr_min"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val changed = updated.as("u")
        .join(labels.as("l"), col("u.id") === col("l.id"))
        .filter(col("u.lbl") =!= col("l.lbl")).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    both.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(graph diameter exceeds maxIter; raise it)")
    labels.select(col("id"), col("lbl").as("component"))
  }
}
