package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * Scale shape — the MLlib discipline (its `KMeans` holds centroids on
  * the driver between sweeps; r13 verdict, cold-constant item): the
  * CENTROIDS are the algorithm's PARAMETER PLANE — k·dim bigint cells,
  * bounded by knobs, never by N — so they live on the driver and enter
  * each sweep as one literal. Assignment is then a per-row argmin fold
  * over that literal (O(N·k·dim) map-side work, embarrassingly
  * parallel, ZERO shuffle — the r13 shape shuffled an N-row argmin
  * aggregate per sweep), and the update is ONE narrow job: a k-group
  * hash aggregate of per-component sums whose partial state is k·dim
  * cells per task, collected as k rows. One Spark job per sweep, no
  * lineage growth (each sweep's input plan is `vecs` + a literal), so
  * no checkpoint barrier either — at sf0.1 this removed ~10 shuffle
  * stages per artifact build (the r13 "cold constant"); at 100 TB it
  * removes a full-corpus shuffle per sweep. The driver-side collect is
  * parameter-plane by construction (k rows of dim sums — the same
  * bytes the old broadcast shipped). Empty clusters drop out of the
  * next sweep on both engines identically (no group ⟹ no centroid).
  *
  * Initial centroids are the first k vectors in the engine's
  * mod-prime Knuth-hash order (the q51/q126 convention) — a
  * deterministic well-spread pick whose arithmetic is portable SQL.
  */
object KMeans {

  /** Driver-side centroid set: (cid, components), kept sorted by cid so
    * the assignment fold's strict-< keeps the LOWEST cid on distance
    * ties — exactly `min(struct(dist, cid))`.
    */
  type Centroids = Seq[(Long, Seq[Long])]

  /** e6 quantization of an array<float>/array<double> column. */
  def quantizeExpr(embCol: String): String =
    s"transform(cast($embCol as array<double>), x -> cast(floor(x * 1000000) as bigint))"

  /** Integer squared-L2 distance between two array<bigint> columns —
    * public: q154's IVF-PQ lookup tables score with the same exact
    * arithmetic the trainer assigns with.
    */
  def sqDistExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), cast(0 as bigint), (acc, v) -> acc + v)"

  /** Driver-side twin of [[sqDistExpr]] — pure Long arithmetic, so it
    * is exactly the distributed value (integer ops cannot drift).
    */
  def sqDistLocal(a: Seq[Long], b: Seq[Long]): Long = {
    require(a.length == b.length, s"dim mismatch ${a.length} vs ${b.length}")
    var s = 0L
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Collect a (cid, cq) centroid frame to the driver, sorted by cid.
    * Parameter-plane: k rows of dim bigints.
    */
  def collectCentroids(df: DataFrame): Centroids =
    df.select(col("cid"), col("cq")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1).toSeq

  /** Driver-side centroids as a (cid, cq) local-relation frame — for
    * call sites that still want the DataFrame surface (oracle parity
    * helpers, specs).
    */
  def centroidFrame(s: SparkSession, c: Centroids): DataFrame = {
    import s.implicits._
    c.map { case (cid, cq) => (cid, cq) }.toDF("cid", "cq")
  }

  /** `struct(dist, cid)` of `q`'s nearest centroid. Strict `<` with
    * ascending-cid iteration keeps the lowest cid on ties, identical to
    * `min(struct(dist, cid))` over a fan-out. Map-side only.
    *
    * r17: runs as the native [[graft.expressions.NearestCentroid]]
    * flat-loop expression — the former `aggregate(zip_with(...))` fold
    * over a `typedlit` paid an interpreted lambda dispatch per centroid
    * COMPONENT per row (HOFs are CodegenFallback), which dominated the
    * PQ artifact's ~14 corpus passes; the expression's equivalence
    * contract (ordering, tie-break, wrapping Long arithmetic, the
    * null→initial-accumulator edge) is pinned in its scaladoc and
    * KMeansSpec.
    */
  def assignStruct(q: Column, c: Centroids): Column = {
    require(c.nonEmpty, "assignStruct needs at least one centroid")
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.NearestCentroid(
        org.apache.spark.sql.GraftBridge.expression(q), c))
  }

  /** Assign each vector to its nearest centroid (ties → lowest cid):
    * input (vec_id, q) × driver-side centroids → (vec_id, q, cid,
    * dist). No shuffle — see [[assignStruct]].
    */
  def assignLit(vecs: DataFrame, c: Centroids): DataFrame =
    vecs.withColumn("__m", assignStruct(col("q"), c))
      .select(col("vec_id"), col("q"),
        col("__m.cid").as("cid"), col("__m.dist").as("dist"))

  /** [[assignLit]] from a centroid FRAME (the legacy surface):
    * collects the frame first — parameter-plane, and free for the
    * local relations [[trainCentroids]] returns.
    */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    assignLit(vecs, collectCentroids(centroids))

  /** `iters` Lloyd sweeps, driver-hosted: each sweep is ONE narrow
    * Spark job (map-side argmin fold + k-group component-sum
    * aggregate, collected as k rows) and the floored mean runs on the
    * driver — `math.floor(sum.toDouble / cnt)` is the identical IEEE
    * op sequence to the `floor(cast(s as double) / cnt)` both engines
    * previously ran (|sum| < 2⁵³ keeps the double division exact).
    * Caller owns `vecs` persistence (it is scanned `iters` times).
    */
  def trainCentroidsDriver(vecs: DataFrame, c0: Centroids,
                           iters: Int): Centroids = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(c0.nonEmpty, "need at least one initial centroid")
    val dim = c0.head._2.length
    var cent = c0
    (1 to iters).foreach { _ =>
      val sums = assignLit(vecs, cent)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("cnt"),
          (1 to dim).map(i => sum(element_at(col("q"), i)).as(s"s$i")): _*)
        .collect()
      cent = sums.map { r =>
        val cnt = r.getLong(1)
        (r.getLong(0), (0 until dim).map(i =>
          math.floor(r.getLong(2 + i).toDouble / cnt).toLong))
      }.sortBy(_._1).toSeq
    }
    cent
  }

  /** The trained centroid frame (cid, cq) after `iters` assign+update
    * sweeps — the CODEBOOK surface (q154 IVF-PQ trains one per
    * subspace), where [[run]] keeps the assignment surface.
    */
  def trainCentroids(vecs: DataFrame, centroids0: DataFrame,
                     iters: Int): DataFrame = {
    val v = vecs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cent = trainCentroidsDriver(v, collectCentroids(centroids0), iters)
    v.unpersist()
    centroidFrame(vecs.sparkSession, cent)
  }

  /** `iters` assign+update sweeps from `centroids0`, then one final
    * assignment against the trained centroids. Input vecs must carry
    * (vec_id, q: array<bigint>); returns (vec_id, cid, dist).
    */
  def run(vecs: DataFrame, centroids0: DataFrame, iters: Int): DataFrame = {
    val v = vecs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cent = trainCentroidsDriver(v, collectCentroids(centroids0), iters)
    val out = assignLit(v, cent).select(col("vec_id"), col("cid"), col("dist"))
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
