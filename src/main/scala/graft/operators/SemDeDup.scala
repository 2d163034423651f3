package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Semantic-dedup building blocks (the SemDeDup pattern, Abbas et al.
  * 2023): cluster the embedding space, then sweep for near-duplicate
  * pairs ONLY within a cluster. The clustering bounds the pair space —
  * the quadratic blowup is per-cluster, never corpus-wide — and the
  * corpus shuffles ONCE keyed by cluster.
  *
  * The remaining 100 TB hazard is cluster SKEW: the within-cluster
  * sweep hash-partitions by cluster id, so one hot cluster (real
  * corpora: boilerplate, templated spam) lands its whole O(n²) sweep
  * on one task. [[pairs]] closes that with a secondary split — any
  * cluster past `splitThreshold` members is sub-bucketed by sign-LSH
  * ([[VectorLsh.bucket]]) and swept within (cluster, sub-bucket) only,
  * capping per-task pair work near splitThreshold² regardless of how
  * the assignment skews. The split is the standard SemDeDup recall
  * trade: vectors at cosine ≥ t collide in a sub-bucket with
  * probability (1 - arccos(t)/π)^numPlanes per plane set — near-dups
  * (cos → 1) virtually always, unrelated vectors rarely — so an
  * oversized cluster's sweep keeps its near-duplicate pairs and sheds
  * the far-apart ones that a dedup threshold would discard anyway.
  * Clusters at or under the threshold are swept exactly (sub-bucket 0).
  */
object SemDeDup {

  /** Per-task sweep cap: a 4096-member group is ~8.4M pairs × one
    * 64-dim dot each — comfortably one task's work. Clusters only
    * split PAST this, so any corpus whose clusters already fit is
    * byte-identical to the exact sweep.
    */
  val DefaultSplitThreshold = 4096L

  /** Nearest-centroid assignment: O(N·C) map-side scores against the
    * broadcast centroid set, argmax by (cos, lower cid) — one aggregate
    * keyed by vec_id, no corpus self-join anywhere in this phase.
    *
    * `e` carries (vec_id, emb, nrm); `centroids` (cid, cemb, cnrm).
    * Returns (vec_id, cluster).
    */
  def assign(e: DataFrame, centroids: DataFrame): DataFrame =
    e.crossJoin(broadcast(centroids))
      .withColumn("cos",
        VectorFunctions.dotNative(col("emb"), col("cemb"))
          / (col("nrm") * col("cnrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"),
        struct(col("cos"), (-col("cid")).as("tb"))).as("cluster"))

  /** Members tagged with the sub-bucket their pair sweep runs in:
    * 0 for clusters within the threshold (exact sweep), the sign-LSH
    * bucket under `planes` for oversized ones. Exposed so the skew
    * spec can assert group sizes on the operator's actual grouping.
    */
  def subBucketed(member: DataFrame, splitThreshold: Long,
                  planes: Seq[Array[Double]]): DataFrame = {
    // cluster sizes: one tiny agg (rows = #clusters) joined back on the
    // same key the sweep shuffles on
    val sizes = member.groupBy(col("cluster")).agg(count(lit(1)).as("csz"))
    member.join(sizes, "cluster")
      .withColumn("sub",
        when(col("csz") <= splitThreshold, lit(0))
          .otherwise(VectorLsh.bucket(col("emb"), planes)))
      .drop("csz")
  }

  /** Within-cluster candidate pairs with exact cosine, oversized
    * clusters split (see object doc). `member` carries
    * (vec_id, emb, nrm, cluster); returns (cluster, vec_a, vec_b, cos)
    * with vec_a < vec_b, each pair once.
    */
  def pairs(member: DataFrame,
            splitThreshold: Long = DefaultSplitThreshold,
            numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = VectorLsh.hyperplanes(numTables = 1, numPlanes, dim).head
    val tagged = subBucketed(member, splitThreshold, planes)
    tagged.as("x")
      .join(tagged.as("y"),
        col("x.cluster") === col("y.cluster")
          && col("x.sub") === col("y.sub")
          && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.cluster").as("cluster"),
        col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        (VectorFunctions.dotNative(col("x.emb"), col("y.emb"))
          / (col("x.nrm") * col("y.nrm"))).as("cos"))
  }
}
