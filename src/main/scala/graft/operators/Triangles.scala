package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triangle counting on an undirected edge set via edge orientation +
  * wedge join + closure join — every join an equi-join on vertex ids.
  *
  * Orientation is the scale lever: each triangle {x,y,z} with
  * x <ₒ y <ₒ z under the chosen total order is generated exactly once
  * (wedge (x,y)⋈(y,z) at middle y, closed against (x,z)), and the
  * wedge volume is Σ_v indeg(v)·outdeg(v). Ordering vertices by
  * (degree, id) — every edge pointing low-degree → high-degree —
  * bounds per-vertex out-degree by graph arboricity (the
  * Chiba–Nishizeki / Schank–Wagner bound): a hub of degree d under id
  * order can sit mid-order and contribute ~(d/2)² wedges, while under
  * degree order all its star edges point INTO it and contribute none.
  * `TrianglesSpec` pins that separation on a star+clique fixture.
  *
  * Input contract: `e` has columns (pi, pj) with pi < pj, one row per
  * undirected edge (the shape `copurchaseEdges` produces).
  */
object Triangles {

  /** Edges re-oriented low-(degree, id) → high-(degree, id), plus the
    * unoriented degree table (v, deg) — callers reuse it (q125 derives
    * its 2-path denominator from it rather than rescanning edges).
    * The degree frame is vertex-bounded (catalog-sized here); AQE
    * broadcasts the two enrichment joins at runtime.
    */
  def orientByDegree(e: DataFrame): (DataFrame, DataFrame) = {
    val deg = e.select(col("pi").as("v"))
      .unionAll(e.select(col("pj").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val dd = e
      .join(deg.select(col("v").as("pi"), col("deg").as("di")), "pi")
      .join(deg.select(col("v").as("pj"), col("deg").as("dj")), "pj")
    // pi < pj already, so on equal degree the id tie-break keeps pi
    // first; swap only when pj is the strictly lower-degree endpoint
    val swap = col("dj") < col("di")
    val oriented = dd.select(
      when(swap, col("pj")).otherwise(col("pi")).as("src"),
      when(swap, col("pi")).otherwise(col("pj")).as("dst"))
    (oriented, deg)
  }

  /** Identity orientation (by vertex id) — the degenerate baseline the
    * spec compares against; input already satisfies pi < pj.
    */
  def orientById(e: DataFrame): DataFrame =
    e.select(col("pi").as("src"), col("pj").as("dst"))

  /** One-row triangle count of an oriented edge set: wedge equi-join on
    * the shared middle vertex, closure equi-join on (src, dst).
    */
  def countOriented(o: DataFrame): DataFrame = {
    val wedges = o.as("e1")
      .join(o.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e2.dst").as("c"))
    wedges
      .join(o.as("e3"),
        col("a") === col("e3.src") && col("c") === col("e3.dst"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Exact row count of the wedge join (Σ_v indeg·outdeg) WITHOUT
    * materializing it — the cost metric orientation minimizes; computed
    * from two vertex-bounded degree aggregates.
    */
  def orientedWedgeVolume(o: DataFrame): DataFrame = {
    val outd = o.groupBy(col("src").as("v")).agg(count(lit(1)).as("outdeg"))
    val ind = o.groupBy(col("dst").as("v")).agg(count(lit(1)).as("indeg"))
    outd.join(ind, "v")
      .agg(coalesce(sum(col("outdeg") * col("indeg")), lit(0L))
        .as("wedge_volume"))
  }
}
