package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Bfs contracts: true hop distances on a known topology, multi-seed
  * minimum, horizon cutoff, unreachable exclusion, and seed rows
  * absent from the graph.
  */
class BfsSpec extends SparkSuite {

  import spark.implicits._

  private def hopsVia(
      f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
          Int) => org.apache.spark.sql.DataFrame)(
      edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int): Map[Long, Long] =
    f(edges.toDF("pi", "pj").repartition(3), seeds.toDF("v"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def hops(edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int): Map[Long, Long] = {
    val full = hopsVia(Bfs.run)(edges, seeds, iters)
    // frontier-delta must be indistinguishable from the full-frame
    // form on every fixture and horizon this suite exercises
    assert(hopsVia(Bfs.runFrontier)(edges, seeds, iters) == full,
      "runFrontier diverged from run")
    full
  }

  test("path graph distances, horizon, and unreachable component") {
    // 1-2-3-4-5 path, {8,9} island
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
    val h = hops(edges, Seq(1L), iters = 4)
    assert(h == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L),
      s"island must be absent, distances exact: $h")
    // horizon cutoff: 2 sweeps reach only distance <= 2
    val h2 = hops(edges, Seq(1L), iters = 2)
    assert(h2 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("multi-seed takes the nearest seed; off-graph seeds stay at 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // seeds at both ends: middle vertex 3 is 2 from either; vertex 42
    // is not in the graph but is still at distance 0 from itself
    val h = hops(edges, Seq(1L, 5L, 42L), iters = 4)
    assert(h == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L, 42L -> 0L))
  }

  test("shortcut edge wins over the long way around") {
    // cycle 1-2-3-4-1: vertex 3 is 2 hops away via either side
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val h = hops(edges, Seq(1L), iters = 4)
    assert(h == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("frontier-delta equals full-frame on a dense pseudo-random graph") {
    // deterministic mod-arithmetic graph: diamonds, cycles, multiple
    // shortest paths, and sweeps past the diameter (stable frontier
    // exhaustion) — the shapes where a frontier bookkeeping bug
    // (re-expanding reached vertices, or dropping a first reach that
    // arrives from two frontier vertices at once) would surface
    val edges = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 60), (i, (i * 11 + 5) % 60)))
      .filter { case (a, b) => a != b }.distinct
    val full = hopsVia(Bfs.run)(edges, Seq(0L, 30L), iters = 6)
    val delta = hopsVia(Bfs.runFrontier)(edges, Seq(0L, 30L), iters = 6)
    assert(delta == full)
    assert(full.nonEmpty && full.values.max <= 6)
  }
}
