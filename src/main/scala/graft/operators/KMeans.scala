package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Lloyd's k-means over an embedding column, in EXACT integer
  * arithmetic so two engines cannot drift (the PageRank r141
  * contract applied to clustering): components are quantized to e6
  * units (`floor(x·10⁶)` as BIGINT — floor, not round: round-half
  * conventions differ across engines, floor does not), distances are
  * integer squared-L2 sums (order-independent), and the only division
  * in the loop — the centroid mean — is `floor(sum/count)` evaluated
  * in double on BOTH engines. That floor must NOT be an integer
  * division: component sums can be negative, and Spark's `div`
  * truncates toward zero while DuckDB's `//` floors, so they disagree
  * exactly there; floor(double) agrees everywhere and is exact
  * because |sum| < 2⁵³ (≤ corpus·10⁶·‖x‖∞). Documented divergence
  * from real-valued Lloyd: each centroid component carries ≤ 1
  * e6-unit of floor loss per sweep — a deterministic contract, not an
  * approximation to be compared loosely.
  *
  * Scale shape (the SemDeDup/IVF assignment argument): centroids are
  * a broadcast frame (k·dim longs), assignment is one map-side
  * argmin over a BroadcastNestedLoopJoin fan-out of k rows per
  * vector (O(N·k) work, no shuffle on the corpus side beyond the
  * vec_id-keyed argmin agg), and the update is a (cid, pos)-keyed
  * integer-sum aggregate whose reducer state is k·dim cells — both
  * sides of every sweep are bounded by parameters, never by N².
  * Per-sweep [[Reliable.barrier]] truncates the growing lineage
  * exactly as ConnectedComponents/PageRank do. Empty clusters drop
  * out of the next sweep on both engines identically (GROUP BY over
  * no members yields no row).
  *
  * Initial centroids are the first k vectors in the engine's
  * mod-prime Knuth-hash order (the q51/q126 convention) — a
  * deterministic well-spread pick whose arithmetic is portable SQL.
  */
object KMeans {

  /** e6 quantization of an array<float>/array<double> column. */
  def quantizeExpr(embCol: String): String =
    s"transform(cast($embCol as array<double>), x -> cast(floor(x * 1000000) as bigint))"

  /** Integer squared-L2 distance between two array<bigint> columns —
    * public: q154's IVF-PQ lookup tables score with the same exact
    * arithmetic the trainer assigns with.
    */
  def sqDistExpr(a: String, b: String): String = distExpr(a, b)

  /** Integer squared-L2 distance between two array<bigint> columns. */
  private def distExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), cast(0 as bigint), (acc, v) -> acc + v)"

  /** Assign each vector to its nearest centroid (ties → lowest cid):
    * input (vec_id, q) × centroids (cid, cq) → (vec_id, q, cid, dist).
    */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("dist", expr(distExpr("q", "cq")))
      .groupBy(col("vec_id"))
      // min, not first: q is functionally dependent on vec_id, so both
      // agree — min keeps the determinism self-evident under refactors
      .agg(min(struct(col("dist"), col("cid"))).as("m"),
        min(col("q")).as("q"))
      .select(col("vec_id"), col("q"),
        col("m.cid").as("cid"), col("m.dist").as("dist"))

  /** One Lloyd update: per-(cid, pos) integer sums → floored means →
    * rebuilt array<bigint> centroids.
    */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
      // |s| < 2^53, so the double division is exact and floor(double)
      // is the one negative-safe floor both engines share
      .withColumn("comp",
        floor(col("s").cast("double") / col("cnt")).cast("long"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, comp))), p -> p.comp)")
        .as("cq"))

  /** The trained centroid frame (cid, cq) after `iters` assign+update
    * sweeps — the CODEBOOK surface (q154 IVF-PQ trains one per
    * subspace), where [[run]] keeps the assignment surface. Same sweep
    * arithmetic, same per-sweep lineage barrier.
    */
  def trainCentroids(vecs: DataFrame, centroids0: DataFrame,
                     iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val v = vecs.persist(StorageLevel.MEMORY_AND_DISK)
    var cent = centroids0
    (1 to iters).foreach { _ =>
      val next = update(assign(v, cent))
      cent = Reliable.barrier(next)(_.localCheckpoint())
    }
    v.unpersist()
    cent
  }

  /** `iters` assign+update sweeps from `centroids0`, then one final
    * assignment against the trained centroids. Input vecs must carry
    * (vec_id, q: array<bigint>); returns (vec_id, cid, dist).
    */
  def run(vecs: DataFrame, centroids0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val v = vecs.persist(StorageLevel.MEMORY_AND_DISK)
    var cent = centroids0
    (1 to iters).foreach { _ =>
      val next = update(assign(v, cent))
      cent = Reliable.barrier(next)(_.localCheckpoint())
    }
    val out = assign(v, cent).select(col("vec_id"), col("cid"), col("dist"))
    v.unpersist()
    out
  }

  /** The oracle twin: the same sweeps as a generated chain of CTEs
    * over `e(vec_id, q)` — one assignment + one update CTE per sweep
    * (fixed iteration count unrolled, the q141 generated-oracle
    * pattern). Expects a `c0(cid, cq)` CTE in scope; leaves the final
    * assignment as `af`. Integer ops + the shared floor(double) mean,
    * so the chain is value-identical to [[run]]. A non-empty `prefix`
    * namespaces every CTE (base tables `{prefix}e` / `{prefix}c0`,
    * chain `{prefix}a0..{prefix}af`) so several chains — q154's one
    * codebook per PQ subspace — compose in one WITH clause.
    */
  def oracleCtes(iters: Int, dim: Int, prefix: String = ""): String = {
    val p = prefix
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs at every
    // reference, and the Lloyd chain is consumed multiply downstream
    // (per-subspace PQ legs, LUT + encode legs) — re-expansion
    // re-EXECUTES the whole upstream pipeline per reference, which is
    // what spilled the amplified residual-PQ twin past 80 GB (r12).
    // MATERIALIZED is a pure optimization fence; results are identical.
    def asg(name: String, cent: String): String =
      s"""$name AS MATERIALIZED (
         |          SELECT vec_id, q, cid, dist FROM (
         |            SELECT e.vec_id, e.q, c.cid,
         |                   CAST(list_sum(list_transform(range(1, ${dim + 1}),
         |                     j -> (e.q[j] - c.cq[j]) * (e.q[j] - c.cq[j])))
         |                     AS BIGINT) AS dist,
         |                   ROW_NUMBER() OVER (
         |                     PARTITION BY e.vec_id
         |                     ORDER BY list_sum(list_transform(range(1, ${dim + 1}),
         |                       j -> (e.q[j] - c.cq[j]) * (e.q[j] - c.cq[j]))),
         |                       c.cid) AS rn
         |            FROM ${p}e e CROSS JOIN $cent c
         |          ) WHERE rn = 1
         |        )""".stripMargin
    val sweeps = (1 to iters).map { i =>
      val u =
        s"""${p}u$i AS MATERIALIZED (
           |          SELECT cid, pos,
           |                 CAST(floor(CAST(SUM(q[pos]) AS DOUBLE) / COUNT(*))
           |                      AS BIGINT) AS comp
           |          FROM ${p}a${i - 1}
           |          CROSS JOIN (SELECT UNNEST(range(1, ${dim + 1})) AS pos)
           |          GROUP BY cid, pos
           |        )""".stripMargin
      val c =
        s"""${p}c$i AS MATERIALIZED (
           |          SELECT cid, list(comp ORDER BY pos) AS cq
           |          FROM ${p}u$i GROUP BY cid
           |        )""".stripMargin
      Seq(asg(s"${p}a${i - 1}", if (i == 1) s"${p}c0" else s"${p}c${i - 1}"),
        u, c)
    }
    (sweeps.flatten :+ asg(s"${p}af", s"${p}c$iters")).mkString(", ")
  }
}
