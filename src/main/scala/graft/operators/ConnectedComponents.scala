package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation (HashMin) —
  * the dedup-group step: near-duplicate PAIRS become duplicate GROUPS
  * via transitive closure. Each iteration is ONE job: a join + an
  * aggregate (label = min(own, neighbors' labels)) materialized through
  * an eager localCheckpoint that also carries the per-row change flag,
  * so the convergence check reads the checkpointed blocks instead of
  * running a second join. Converges in O(diameter) rounds — the
  * standard iterative-graph shape at any scale (GraphX's
  * ConnectedComponents is this same loop).
  */
object ConnectedComponents {

  /** edges: (src, dst) undirected pairs. Returns (id, component) where
    * component = min vertex id reachable from `id`.
    *
    * Fails loudly if not converged within `maxIter` (HashMin needs up
    * to graph-diameter rounds; silent partial labels would be silently
    * wrong dedup groups).
    *
    * `labelPartitions` sizes the iterative frames: dedup-group graphs
    * are orders of magnitude smaller than the corpus (only near-dup
    * members appear), so the default keeps per-round task counts small;
    * a billion-vertex run would raise it toward the cluster's
    * parallelism.
    *
    * Memory discipline: each round's frame must TRUNCATE lineage
    * (localCheckpoint — persist alone would grow the logical plan by
    * one join per round and analysis cost explodes after ~20 rounds,
    * observed on a 30-vertex chain), and the PREVIOUS round's
    * checkpoint blocks are freed as soon as the new round lands —
    * `spark.catalog.clearCache()` never releases checkpoint blocks, so
    * without the sweep a long session leaks one labels frame per round.
    * A cluster deployment with flaky executors opts into reliable
    * checkpoint() per round via [[Reliable]]
    * (`spark.graft.reliableCheckpoints=true` + a checkpoint dir);
    * the block-freeing sweep then naturally no-ops (reliable
    * checkpoints are files, not persisted blocks — Spark GCs them
    * with `spark.cleaner.referenceTracking.cleanCheckpoints=true`).
    */
  def labelPropagation(edges: DataFrame, maxIter: Int = 50,
                       labelPartitions: Int = 8): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // Blocks owned by this call are identified by the checkpointed
    // frame's OWN LogicalRDD id — never by diffing the session-global
    // persistent-RDD registry, which would also capture (and later
    // wrongly free) a caller's lazily-persisted upstream frame whose
    // blocks first materialize inside our first job.
    def rddIds(df: DataFrame): Set[Int] =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      }.toSet
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    var owned = Set.empty[Int] // all blocks this call has created & not yet freed
    try {
      // Materialize the (often expensive) edge plan ONCE. The union below
      // references it twice and every round scans it again — without a
      // barrier the whole upstream pipeline (e.g. q57's set-similarity
      // join) would be recomputed per reference, per round.
      val e0 = Reliable.barrier(
        edges.select(col("src"), col("dst")))(_.localCheckpoint())
      val edgeIds = rddIds(e0)
      owned ++= edgeIds
      val both = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      var labels = Reliable.barrier(
        both.select(col("src").as("id")).distinct()
          .withColumn("lbl", col("id"))
          .withColumn("__changed", lit(false))
          .coalesce(labelPartitions))(_.localCheckpoint())
      var prevIds = rddIds(labels)
      owned ++= prevIds
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        // min label among self and neighbors, with the change flag folded
        // into the same checkpointed frame. The checkpoint is LAZY: the
        // convergence count below is the round's first action, so the
        // label computation and its materialization ride ONE job per
        // round instead of an eager checkpoint job + a count job.
        val nbrMin = both
          .join(labels.select(col("id").as("dst"), col("lbl").as("nbr_lbl")), "dst")
          .groupBy(col("src").as("id"))
          .agg(min(col("nbr_lbl")).as("nbr_min"))
        val updated = Reliable.barrier(labels.select(col("id"), col("lbl"))
          .join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("nbr_min"), col("lbl"))).as("lbl"),
            coalesce(col("nbr_min") < col("lbl"), lit(false)).as("__changed"))
          .coalesce(labelPartitions))(_.localCheckpoint(eager = false))
        val newIds = rddIds(updated)
        owned ++= newIds
        val changed = updated.filter(col("__changed")).count()
        free(prevIds) // last round's blocks are unreachable from any plan now
        owned --= prevIds
        prevIds = newIds
        labels = updated
        converged = changed == 0
        iter += 1
      }
      free(edgeIds)
      owned --= edgeIds
      if (!converged)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds " +
            "(graph diameter exceeds maxIter; raise it)")
      // the final labels' blocks stay persisted — the returned frame
      // reads them; the caller frees (or lets the session end) after use
      labels.select(col("id"), col("lbl").as("component"))
    } catch {
      case t: Throwable =>
        free(owned) // don't leak checkpoint blocks on a failed/abandoned run
        throw t
    }
  }

  /** Alternating large-star/small-star connected components (Kiveris
    * et al. 2014, "Connected Components in MapReduce and Beyond") —
    * the O(log n)-ROUND alternative to [[labelPropagation]]'s
    * O(diameter) HashMin, for high-diameter graphs (long chains,
    * lattices) where diameter ≫ log n:
    *
    *  - LARGE-STAR: every node u points each STRICTLY LARGER neighbor
    *    at m = min(N(u) ∪ {u}) — emit (v, m) for v ∈ N(u), v > u.
    *  - SMALL-STAR: every node u points each smaller-or-self neighbor
    *    at the local minimum — with N⁻(u) = {v ∈ N(u) : v < u},
    *    m = min(N⁻(u) ∪ {u}), emit (v, m) for v ∈ N⁻(u) ∪ {u}.
    *
    * Both operations preserve connectivity and never raise a node's
    * reachable minimum; alternating them contracts every component to
    * a star rooted at its minimum id in O(log n) rounds (the paper's
    * Theorem 3 — each round roughly halves the height of the pointer
    * forest, the same doubling argument as pointer jumping). Each
    * round is two u-partitioned window minima + ONE closing distinct
    * over the current edge set (r17 — the former groupBy+join per
    * phase paid a second edge shuffle and a join stage for the same
    * per-u minimum; r18 — the large-star intermediate needs no dedup
    * of its own, see the round body) — the same per-round shuffle
    * class as HashMin, but ~log n rounds instead of diameter.
    *
    * Convergence detection: the canonical edge set's (count, id-sum,
    * hash-sum) signature is compared between rounds — stable signature
    * = fixed point (the hash term makes a false positive
    * astronomically unlikely and the check free of a second join).
    * Returns (id, component) for every endpoint of `edges`, identical
    * to [[labelPropagation]] (spec-pinned on path/star/cycle/random
    * fixtures); fails loudly if not converged within `maxIter` rounds.
    */
  def alternatingStar(edges: DataFrame, maxIter: Int = 25): DataFrame =
    alternatingStarWithRounds(edges, maxIter)._1

  /** [[alternatingStar]] exposing the round count — the surface the
    * spec pins the O(log n) claim on (a 200-vertex path must converge
    * in far fewer than 200 rounds).
    */
  def alternatingStarWithRounds(edges: DataFrame,
                                maxIter: Int = 25): (DataFrame, Int) = {
    def canon(df: DataFrame): DataFrame =
      df.select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    // (count, xor of per-edge hashes): order-independent, overflow-free
    // (an ANSI sum of full-range hashes would overflow), and the edge
    // set is DISTINCT so xor cancellation cannot mask a change
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val vertices = Reliable.barrier(
      edges.select(col("src").as("id"))
        .unionAll(edges.select(col("dst").as("id")))
        .distinct())(_.localCheckpoint())
    var e = Reliable.barrier(canon(
      edges.select(col("src").as("u"), col("dst").as("v"))))(
      _.localCheckpoint())
    var s = sig(e)
    var iter = 0
    var converged = s._1 == 0L // an edgeless graph is already stars
    // per-u minima come from ONE window pass per star phase (r17):
    // m = min(N(u) ∪ {u}) = least(min(v) over partition(u), u) — the
    // former groupBy(u)+equi-join pair re-shuffled the edge set twice
    // per phase and planned a join stage; the window computes the same
    // minimum in the single partition-by-u exchange the aggregate
    // already paid. Large-star's output orientation needs no canon
    // least/greatest: m ≤ u < v gives m < v by construction; likewise
    // small-star emits (m, v) with m = min(N⁻(u)) ≤ v and (m, u) with
    // m < u, so only the self-loop filter + distinct remain.
    val wU = Window.partitionBy(col("u"))
    while (!converged && iter < maxIter) {
      val nbrs = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      // large-star: every strictly-larger neighbor re-points at
      // m = min(N(u) ∪ {u}); m ≤ u < v, so no self-loops arise.
      // NO distinct here (r18 — one exchange per round removed): the
      // v > u filter keeps exactly |e| rows (e is distinct and
      // low-oriented, so each edge survives in one direction), i.e.
      // dropping the dedup cannot GROW the frame — it only lets
      // coincident (m, v) rows through as duplicates, whose SUPPORT is
      // unchanged; the small-star window-min is duplicate-blind and
      // the round's closing distinct restores set semantics before the
      // signature reads it, so every round's edge SET — and therefore
      // the round count and the result — is value-identical.
      val ls = nbrs
        .withColumn("m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") > col("u"))
        .select(col("m").as("u"), col("v"))
      val nbrs2 = ls.unionAll(ls.select(col("v").as("u"), col("u").as("v")))
      // small-star: the smaller-or-self neighborhood points at its
      // minimum; on the v < u frame min(N⁻(u) ∪ {u}) = min(v) over u
      val neg = nbrs2.filter(col("v") < col("u"))
        .withColumn("m", min(col("v")).over(wU))
      val ss = neg.select(col("m").as("u"), col("v"))
        .unionAll(neg.select(col("m").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
      // LAZY checkpoint: the signature aggregate below is the round's
      // first action, so the round's stars and their materialization
      // ride one job instead of an eager checkpoint job + a sig job
      val next = Reliable.barrier(ss)(_.localCheckpoint(eager = false))
      val s2 = sig(next)
      converged = s2 == s
      s = s2
      e = next
      iter += 1
    }
    if (!converged && iter >= maxIter)
      throw new IllegalStateException(
        s"alternating-star did not converge in $maxIter rounds")
    // Star-forest validation: the signature check declares convergence
    // from a (count, xor-hash) fingerprint, so an (astronomically
    // unlikely) collision could terminate on a non-fixed-point edge
    // set. The fixed point is EXACTLY a star forest — every member
    // appears as `v` once, and no root (`u`) is itself a member — so
    // two tiny aggregates on the final (contracted, smallest-of-run)
    // edge set convert that silent-wrong mode into a loud failure.
    if (!e.isEmpty) {
      val card = e.agg(count(lit(1)), countDistinct(col("v"))).head()
      val rootIsMember =
        !e.select(col("u")).intersect(e.select(col("v"))).isEmpty
      if (card.getLong(0) != card.getLong(1) || rootIsMember)
        throw new IllegalStateException(
          "alternating-star signature collision: converged edge set is " +
            "not a star forest — labels would be wrong; rerun")
    }
    // fixed point = star forest rooted at component minima: members
    // carry (v → u); roots and isolated vertices label themselves
    val labels = vertices
      .join(e.select(col("v").as("id"), col("u").as("lbl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("component"))
    (labels, iter)
  }
}
