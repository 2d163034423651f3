package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSuite {

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    PageRank.run(edges.toDF("pi", "pj"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("one sweep on a 3-leaf star matches the hand-computed integers") {
    // hub 0 — leaves 1,2,3. deg(hub)=3, deg(leaf)=1, all start at 1e6.
    // hub:  150000 + 85*(3 * (1000000 div 1)) div 100 = 2700000
    // leaf: 150000 + 85*(1000000 div 3) div 100
    //     = 150000 + 85*333333 div 100 = 150000 + 283333 = 433333
    val r = ranks(Seq((0L, 1L), (0L, 2L), (0L, 3L)), iters = 1)
    assert(r(0L) === 2700000L)
    assert(r(1L) === 433333L)
    assert(r(2L) === 433333L)
    assert(r(3L) === 433333L)
  }

  test("symmetry and centrality hold after several sweeps") {
    // path 1-2-3: ends are symmetric, middle is most central
    val r = ranks(Seq((1L, 2L), (2L, 3L)), iters = 6)
    assert(r(1L) === r(3L))
    assert(r(2L) > r(1L))
    // regular graphs are rank-uniform: every K3 vertex equal
    val k3 = ranks(Seq((1L, 2L), (2L, 3L), (1L, 3L)), iters = 6)
    assert(k3.values.toSet.size === 1)
  }

  test("oracle CTE chain unrolls the requested sweep count") {
    val ctes = PageRank.oracleCtes(3)
    assert(ctes.contains("r0 AS") && ctes.contains("r3 AS"))
    assert(!ctes.contains("r4 AS"))
    assert(ctes.contains("// dg.outdeg")) // integer division, not float
  }
}
