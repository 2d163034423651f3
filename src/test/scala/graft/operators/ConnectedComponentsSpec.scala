package graft.operators

import graft.SparkSuite

class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  private def components(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.labelPropagation(edges.toSeq.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, stars and singleton pairs resolve to min labels") {
    val got = components((1L, 2L), (2L, 3L), (3L, 4L), // chain -> 1
      (10L, 11L), (10L, 12L), (10L, 13L),              // star  -> 10
      (20L, 21L))                                      // pair  -> 20
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain converges (diameter ~ rounds) and low maxIter fails loudly") {
    val chain = (1L until 30L).map(i => (i, i + 1))
    val got = components(chain: _*)
    assert(got.values.toSet === Set(1L))
    intercept[IllegalStateException] {
      ConnectedComponents.labelPropagation(
        chain.toDF("src", "dst"), maxIter = 3)
    }
  }
}
