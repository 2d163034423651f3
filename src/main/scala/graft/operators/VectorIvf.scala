package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest neighbor — the
  * centroid-partitioned scale path, complementing sign-LSH: vectors are
  * assigned to their nearest of C coarse centroids (the inverted
  * lists); a query probes only its `nprobe` nearest lists. Candidate
  * generation is an equi-join on centroid id, so the 100 TB shape is a
  * bucketed shuffle, never a scan-per-query.
  *
  * Centroid assignment is a broadcast join against the tiny centroid
  * set + a per-vector rank (bounded: C rows per vector). A production
  * build would learn centroids with k-means; any fixed centroid set
  * gives correct (approximate) semantics, so the engine takes a
  * deterministic sample of the corpus as centroids.
  */
object VectorIvf {

  /** Rank each row's centroids by cosine; keep the best `keep`.
    * Input: df(id, emb, nrm), centroids(cid, cemb, cnrm).
    */
  def nearestCentroids(df: DataFrame, centroids: DataFrame,
                       keep: Int, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__ccos").desc, col("cid"))
    df.join(broadcast(centroids))
      .withColumn("__ccos",
        VectorFunctions.dotNative(col("emb"), col("cemb"))
          / (col("nrm") * col("cnrm")))
      .withColumn("__crn", row_number().over(w))
      .filter(col("__crn") <= keep)
      .drop("cemb", "cnrm", "__ccos", "__crn")
  }

  /** Each row's TWO nearest centroids WITH their rank — the routing
    * surface the standing graph index persists (`crank` 1 = primary;
    * q188's cells2 contract: a node's edge candidates are the
    * primary-cell members of its two cells). Same ordering and
    * tie-break as [[nearestCentroids]].
    */
  def nearestCentroids2(df: DataFrame, centroids: DataFrame,
                        idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__ccos").desc, col("cid"))
    df.join(broadcast(centroids))
      .withColumn("__ccos",
        VectorFunctions.dotNative(col("emb"), col("cemb"))
          / (col("nrm") * col("cnrm")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= 2)
      .select(col(idCol), col("crank"), col("cid"))
  }
}
