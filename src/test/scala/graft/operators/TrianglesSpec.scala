package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Degree orientation's arboricity bound, pinned on the graph shape
  * that breaks id orientation: a mid-id hub star plus a clique.
  *
  * Star: hub vertex id 500 joined to 200 leaves spread on BOTH sides
  * of it in id order (ids 0..99 and 1000..1099), so under id
  * orientation the hub has ~100 in-edges and ~100 out-edges →
  * ~100·100 = 10000 wedges, none of which close. Under degree
  * orientation every star edge points INTO the hub (leaf deg 1 < hub
  * deg 200) → zero hub wedges. Clique: K6 on ids 2000..2005 supplies
  * the triangles (C(6,3) = 20) so the count being compared is
  * non-trivial under both orientations.
  */
class TrianglesSpec extends SparkSuite {

  private lazy val edges = {
    val s = spark
    import s.implicits._
    val star = (0 until 100).map(i => (i.toLong, 500L)) ++
      (1000 until 1100).map(i => (500L, i.toLong))
    val clique = for {
      a <- 2000 to 2005; b <- 2000 to 2005 if a < b
    } yield (a.toLong, b.toLong)
    (star ++ clique).toDF("pi", "pj")
      .select(least($"pi", $"pj").as("pi"), greatest($"pi", $"pj").as("pj"))
  }

  test("triangle count is orientation-invariant: 20 on star+K6") {
    val (byDeg, _) = Triangles.orientByDegree(edges)
    val nDeg = Triangles.countOriented(byDeg).head().getLong(0)
    val nId = Triangles.countOriented(Triangles.orientById(edges)).head().getLong(0)
    assert(nDeg === 20L)
    assert(nId === 20L)
  }

  test("degree orientation collapses the hub's wedge volume") {
    val (byDeg, _) = Triangles.orientByDegree(edges)
    val volDeg = Triangles.orientedWedgeVolume(byDeg).head().getLong(0)
    val volId = Triangles.orientedWedgeVolume(Triangles.orientById(edges))
      .head().getLong(0)
    // id orientation: mid-id hub pairs its 100 in-edges with its 100
    // out-edges -> >= 10000 wedges; degree orientation: all star edges
    // point into the hub, wedges come only from the K6 (whose total
    // oriented wedge volume is C(6,2) choose middles = 20+... bounded
    // well under 100)
    assert(volId >= 10000L, s"fixture lost its skew: id-oriented volume $volId")
    assert(volDeg < 100L, s"degree-oriented volume $volDeg not arboricity-bounded")
    assert(volDeg <= volId)
  }

  test("degree table feeds the unoriented 2-path denominator") {
    val (_, deg) = Triangles.orientByDegree(edges)
    val hubDeg = deg.filter(col("v") === 500L).head().getLong(1)
    assert(hubDeg === 200L)
  }
}
