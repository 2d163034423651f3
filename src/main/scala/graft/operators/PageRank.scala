package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pregel-style PageRank over an undirected edge set, in EXACT integer
  * arithmetic so two engines cannot drift: ranks live in e6 units
  * (r₀ = 1 000 000 per vertex) and each sweep applies
  *
  *   r'(v) = 150000 + (85 · Σ_{u∼v} (r(u) div deg(u))) div 100
  *
  * — the damping-0.85 update with every division an integer floor
  * division and every sum an order-independent integer sum (floating
  * PageRank is accumulation-order-sensitive, which no cross-engine
  * oracle can hash-compare; the floor-per-term variant is a defined,
  * deterministic contract — documented divergence: ranks are ≤ the
  * real-valued iterate by at most #iters·(deg+1) e6-units of floor
  * loss, ordering is preserved for the separations that matter).
  *
  * Scale shape (the ConnectedComponents discipline): the doubled edge
  * list + degree enrichment is built ONCE and persisted; each sweep is
  * one vertex-keyed equi-join (rank onto edge sources) + one dst-keyed
  * integer-sum aggregate — shuffle volume ∝ |E| per sweep, state ∝
  * |V|, no all-pairs anywhere. Lineage is truncated every
  * [[BarrierEvery]] sweeps and once at the end (`localCheckpoint`; on
  * a cluster [[Reliable.barrier]] upgrades it to a reliable
  * checkpoint under the deployment profile) — each sweep references
  * the previous rank frame exactly once, so the un-barriered plan
  * grows linearly and the sweeps of one window ride a single job.
  */
object PageRank {

  /** Ranks after `iters` sweeps over undirected edges (pi, pj), as
    * (v, rank_e6). Input contract: one row per undirected edge, no
    * self-loops (the `copurchaseEdges` shape).
    */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val dir = edges
      .select(col("pi").as("src"), col("pj").as("dst"))
      .unionAll(edges.select(col("pj").as("src"), col("pi").as("dst")))
    val deg = dir.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) — the loop-invariant message topology
    val adj = dir.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var rank = deg.select(col("src").as("v"), lit(1000000L).as("r"))
    (1 to iters).foreach { i =>
      val next = adj
        .join(rank.withColumnRenamed("v", "src"), "src")
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        .select(col("dst").as("v"),
          (lit(150000L) + expr("85 * s div 100")).as("r"))
      // undirected doubling guarantees every vertex has in-edges, so
      // `next` covers all of V — no left join against the vertex set.
      // Barrier CADENCE (r17): each sweep references rank exactly once,
      // so the plan grows linearly (one join+agg per sweep) and a
      // per-sweep materialization buys nothing — every sweep is pure
      // integer arithmetic on deterministic inputs, so even a recompute
      // reproduces identical ranks. Materialize every BarrierEvery
      // sweeps (lineage/analysis bound for large iteration counts) and
      // once at the end; at iters=6 that turns 6 checkpoint jobs + 6
      // block writes into 1, with identical per-sweep shuffles riding
      // one job.
      rank =
        if (i % BarrierEvery == 0 && i < iters)
          Reliable.barrier(next)(_.localCheckpoint())
        else next
    }
    // final materialization BEFORE adj.unpersist — the returned frame
    // must never recompute its sweeps against a dropped topology cache
    val out = Reliable.barrier(rank)(_.localCheckpoint())
    adj.unpersist()
    out
  }

  /** Sweeps between lineage-truncation barriers — a plan-size bound for
    * long runs, not a correctness need (sweeps are deterministic).
    */
  private val BarrierEvery = 8

  /** The oracle twin: the same sweeps as a generated chain of
    * aggregate CTEs over a directed-edge CTE `d(src, dst)` (SQL
    * recursion cannot aggregate in the recursive term, so the fixed
    * iteration count is unrolled — one CTE per sweep, exactly the q43
    * generated-oracle pattern). Integer ops only, so the chain is
    * bit-identical to [[run]].
    */
  def oracleCtes(iters: Int): String = {
    val chain = (1 to iters).map { i =>
      s"""r$i AS (
         |          SELECT d.dst AS v,
         |                 CAST(150000 + (85 * SUM(p.r // dg.outdeg)) // 100
         |                      AS BIGINT) AS r
         |          FROM d JOIN dg USING (src) JOIN r${i - 1} p ON p.v = d.src
         |          GROUP BY d.dst
         |        )""".stripMargin
    }.mkString(", ")
    s"""dg AS (SELECT src, COUNT(*) AS outdeg FROM d GROUP BY src),
       |        r0 AS (SELECT src AS v, CAST(1000000 AS BIGINT) AS r FROM dg),
       |        $chain""".stripMargin
  }
}
