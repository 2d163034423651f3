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

  test("labelPropagation never frees a caller's persisted upstream frame") {
    // Regression: block cleanup must track the loop's OWN checkpoint ids.
    // A registry set-diff around the first job would also capture a
    // caller's lazily-persisted frame (whose cache first materializes
    // inside that job) and silently unpersist it on return — detected
    // here as a recompute (the accumulator counts upstream evaluations).
    import org.apache.spark.sql.functions.{col, udf}
    val evals = spark.sparkContext.longAccumulator("cc_upstream_evals")
    val bump = udf((x: Long) => { evals.add(1L); x })
    val upstream = spark.range(0, 10).select(bump(col("id")).as("v")).persist()
    try {
      val edges = upstream
        .select(col("v").as("src"), (col("v") + 100L).as("dst"))
      ConnectedComponents.labelPropagation(edges)
      val afterCc = evals.value // upstream materialized inside CC's first job
      assert(afterCc > 0L)
      upstream.count() // must be served from the still-live cache
      assert(evals.value === afterCc,
        "upstream frame was recomputed — labelPropagation freed its cache blocks")
    } finally upstream.unpersist()
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

  private def starComponents(edges: Seq[(Long, Long)],
                             maxIter: Int = 25): (Map[Long, Long], Int) = {
    val (df, rounds) = ConnectedComponents.alternatingStarWithRounds(
      edges.toDF("src", "dst").repartition(3), maxIter)
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("alternating-star equals HashMin on path/star/cycle/pair fixtures") {
    val fixtures = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),            // path
      Seq((10L, 11L), (10L, 12L), (10L, 13L)),                // star (min root)
      Seq((23L, 21L), (23L, 22L), (23L, 24L)),                // star (max hub)
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)),            // cycle
      Seq((20L, 21L)),                                        // pair
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (30L, 31L), (31L, 32L))) // forest
    fixtures.foreach { edges =>
      val hashMin = ConnectedComponents.labelPropagation(
        edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(starComponents(edges)._1 === hashMin, s"fixture $edges")
    }
  }

  test("alternating-star equals HashMin on a dense pseudo-random graph") {
    val edges = (0L until 80L).map(i => (i, (i * i + 7) % 80))
      .filter { case (a, b) => a != b }
    val hashMin = ConnectedComponents.labelPropagation(
      edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starComponents(edges)._1 === hashMin)
  }

  test("alternating-star converges in O(log n) rounds on a 200-path") {
    // the case HashMin is worst at: diameter 199, so labelPropagation
    // needs ~200 rounds; star contraction must land exponentially faster
    val path = (1L until 200L).map(i => (i, i + 1))
    val (got, rounds) = starComponents(path)
    assert(got.values.toSet === Set(1L) && got.size === 200)
    assert(rounds <= 12, s"expected O(log n) rounds, took $rounds")
    intercept[IllegalStateException] {
      ConnectedComponents.alternatingStar(
        path.toDF("src", "dst"), maxIter = 2)
    }
  }
}
