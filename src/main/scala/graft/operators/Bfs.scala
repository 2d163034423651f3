package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distance over an undirected edge set — the
  * graph-TRAVERSAL primitive next to the fixpoint family
  * ([[ConnectedComponents]] = label fixpoint, [[PageRank]] = value
  * fixpoint): how far is every vertex from the nearest seed, in hops.
  * The workhorse behind reachability audits ("which items are within
  * 2 recommendation hops of a flagged product"), influence radius,
  * and landmark-distance features.
  *
  * Semantics are min-plus label propagation: hop₀ = 0 on seeds; each
  * sweep hopᵢ(v) = min(hopᵢ₋₁(v), 1 + min over neighbors u of
  * hopᵢ₋₁(u)). After L sweeps the frame holds EXACTLY the vertices at
  * distance ≤ L, each with its true distance (min over paths — pure
  * integer MIN aggregation, order-independent, so a SQL twin is
  * bit-identical; no floating anything).
  *
  * Scale shape (the PageRank discipline): the doubled edge list is
  * persisted once; each sweep is one vertex-keyed equi-join of the
  * reached frame onto edge sources + one dst-keyed MIN aggregate —
  * shuffle ∝ |E| per sweep worst-case, state ∝ reached vertices,
  * lineage truncated per round ([[Reliable.barrier]] upgrades to
  * reliable checkpoints under the deployment profile).
  *
  * Two implementations, one semantics (equivalence spec-pinned in
  * BfsSpec, and q147's generated SQL twin — which mirrors the
  * FULL-FRAME recurrence term for term — hash-gates whichever runs):
  *  - [[run]]: full-frame min-plus — every sweep joins the whole
  *    reached frame onto the topology; the reference shape.
  *  - [[runFrontier]] (r10, the production shape): only the NEW
  *    frontier — vertices first reached in the previous sweep — joins
  *    the topology; already-reached destinations drop via an
  *    anti-join. A vertex's first reaching IS its min distance
  *    (min-plus on unit weights), so results are identical while the
  *    edge fan-out per sweep shrinks from |reached|·avg-degree to
  *    |frontier|·avg-degree — the difference between re-expanding the
  *    whole BFS tree every sweep and expanding its new leaves, which
  *    at 100 TB-scale graphs is the difference between O(diam·|E|)
  *    and O(|E|) total edge traffic.
  */
object Bfs {

  /** (v, hop) for vertices within `iters` hops of `seeds`. `edges` is
    * one row per undirected edge (pi, pj), no self-loops; `seeds` is
    * a one-column frame (v) — rows not present in the graph are kept
    * at hop 0 (a seed is at distance 0 from itself regardless of
    * degree).
    */
  def run(edges: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val dir = edges
      .select(col("pi").as("src"), col("pj").as("dst"))
      .unionAll(edges.select(col("pj").as("src"), col("pi").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var hop = seeds.select(col("v"), lit(0L).as("hop"))
    (1 to iters).foreach { _ =>
      val next = dir
        .join(hop.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"), (col("hop") + lit(1L)).as("hop"))
        .unionAll(hop)
        .groupBy(col("v")).agg(min(col("hop")).as("hop"))
      hop = Reliable.barrier(next)(_.localCheckpoint())
    }
    dir.unpersist()
    hop
  }

  /** Frontier-delta BFS: identical results to [[run]] (spec-pinned),
    * sweep edge fan-out ∝ |frontier|·avg-degree. Per sweep: expand the
    * previous sweep's newly-reached vertices through the topology,
    * drop already-reached destinations (anti-join against the reached
    * frame — hash lookup ∝ reached, but NOT multiplied by degree), tag
    * survivors with the sweep number (a vertex's first reaching is its
    * min distance on unit weights). Each frontier is checkpointed; the
    * reached frame is a union of checkpointed frontiers, so no sweep
    * rematerializes the full reached set.
    */
  def runFrontier(edges: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val dir = edges
      .select(col("pi").as("src"), col("pj").as("dst"))
      .unionAll(edges.select(col("pj").as("src"), col("pi").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var hop = seeds.select(col("v"), lit(0L).as("hop"))
    var frontier = hop.select(col("v"))
    (1 to iters).foreach { i =>
      val fresh = dir
        .join(frontier.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v")).distinct()
        .join(hop, Seq("v"), "left_anti")
        .select(col("v"), lit(i.toLong).as("hop"))
      // per-sweep EAGER barrier, deliberately (r17 measured the lazy
      // persist-chain alternative 0.9 s SLOWER at sf0.1: each frontier
      // is referenced twice per later level — anti-join + final union —
      // so the un-materialized plan doubles per sweep and analysis +
      // AQE pay for 2^i copies; the eager checkpoint keeps every
      // sweep's plan flat)
      val nf = Reliable.barrier(fresh)(_.localCheckpoint())
      hop = hop.unionAll(nf)
      frontier = nf.select(col("v"))
    }
    dir.unpersist()
    hop
  }

  /** Oracle twin: the same sweeps as generated MIN-aggregate CTEs over
    * a directed-edge CTE `d(src, dst)` and a seed CTE `h0(v, hop)` —
    * the [[PageRank.oracleCtes]] unrolling pattern (SQL recursion
    * cannot aggregate in the recursive term). MATERIALIZED (r10):
    * each h CTE is referenced twice by its successor, and DuckDB's
    * inliner can otherwise re-expand the whole chain per reference —
    * measured 9× at sf0.1 and the difference between done and
    * disk-full at the 10×-amplified corpus.
    */
  def oracleCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""h$i AS MATERIALIZED (
         |          SELECT v, CAST(MIN(hop) AS BIGINT) AS hop FROM (
         |            SELECT d.dst AS v, p.hop + 1 AS hop
         |            FROM d JOIN h${i - 1} p ON p.v = d.src
         |            UNION ALL SELECT v, hop FROM h${i - 1}
         |          ) GROUP BY v
         |        )""".stripMargin
    }.mkString(", ")
}
