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
}
