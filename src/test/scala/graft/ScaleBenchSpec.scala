package graft

import org.apache.spark.sql.functions._

/** Pins the scale harness's amplification model at sf0.001 / R=3: the
  * "parallel universes" properties that make the R× runtime target
  * fair (disjoint id spaces, textually disjoint replicas, geometry-
  * preserving embedding permutation), plus the plan invariants on the
  * AMPLIFIED data for every scale-set query (base-data plans are
  * already swept registry-wide by RegistryPlanSpec).
  */
class ScaleBenchSpec extends SparkSuite {

  private val R = 3
  private val baseDir = "/root/testdata/sf0.001"
  private lazy val ampDir: String = {
    val out = TempDirs.scoped("graft-scale-spec")
    ScaleBench.amplify(spark, baseDir, out, R)
    out
  }

  test("amplified tables carry R x rows with disjoint id spaces") {
    for ((t, id) <- Seq("events" -> "event_id", "documents" -> "doc_id",
        "embeddings" -> "vec_id")) {
      val b = Tables.load(spark, baseDir, t).count()
      val amp = Tables.load(spark, ampDir, t)
      assert(amp.count() === R * b, s"$t row count")
      assert(amp.select(col(id)).distinct().count() === R * b, s"$t id space")
    }
    val bOrders = Tables.lineitem(spark, baseDir)
      .select(col("l_orderkey")).distinct().count()
    assert(Tables.lineitem(spark, ampDir)
      .select(col("l_orderkey")).distinct().count() === R * bOrders)
  }

  test("document replicas are textually disjoint (cipher, not copy)") {
    val b = Tables.documents(spark, baseDir)
    val amp = Tables.documents(spark, ampDir)
    val bDistinct = b.select(col("text")).distinct().count()
    assert(amp.select(col("text")).distinct().count() === R * bDistinct,
      "replica texts must not collide (naive copy would blow dup clusters up R x)")
    // cipher preserves per-document length, so length-profile queries
    // scale like the base corpus
    val bLen = b.agg(sum(length(col("text")))).head().getLong(0)
    assert(amp.agg(sum(length(col("text")))).head().getLong(0) === R * bLen)
  }

  test("embedding permutation preserves intra-replica geometry") {
    // circular shift is orthogonal: per-vector norm is invariant, so
    // the amplified norm total is exactly R x the base total
    def normSum(dir: String): Double =
      Tables.embeddings(spark, dir)
        .agg(sum(expr(
          "aggregate(embedding, cast(0.0 as double), (s, x) -> s + x * x)")))
        .head().getDouble(0)
    assert(math.abs(normSum(ampDir) - R * normSum(baseDir))
      <= 1e-6 * math.abs(R * normSum(baseDir)))
  }

  test("cipher stays injective past the rotation wrap (R=28)") {
    // a plain rotation has rep 26 == rep 0 on a digit-free corpus; the
    // affine cipher must keep all 28 replicas textually disjoint
    val out = TempDirs.scoped("graft-scale-spec28")
    ScaleBench.amplify(spark, baseDir, out, 28)
    val b = Tables.documents(spark, baseDir)
      .select(col("text")).distinct().count()
    assert(Tables.documents(spark, out)
      .select(col("text")).distinct().count() === 28 * b)
    intercept[IllegalArgumentException](
      ScaleBench.amplify(spark, out, out, 129))
  }

  test("embedding transform stays injective past the shift wrap (R=66)") {
    // a raw circular shift slices a negative length at rep >= dim
    // (=64) and a mod-only shift makes replicas dim apart identical;
    // the sign-flip composition must keep all 66 replicas distinct
    val out = TempDirs.scoped("graft-scale-spec66")
    ScaleBench.amplify(spark, baseDir, out, 66)
    val b = Tables.embeddings(spark, baseDir)
      .select(col("embedding")).distinct().count()
    assert(Tables.embeddings(spark, out)
      .select(col("embedding")).distinct().count() === 66 * b)
    // the rep-65 replica is still norm-preserving (orthogonal map)
    def normSum(dir: String, pred: org.apache.spark.sql.Column): Double =
      Tables.embeddings(spark, dir).filter(pred)
        .agg(sum(expr(
          "aggregate(embedding, cast(0.0 as double), (s, x) -> s + x * x)")))
        .head().getDouble(0)
    val base = normSum(baseDir, lit(true))
    val rep65 = normSum(out, col("vec_id") % 66 === 65)
    assert(math.abs(rep65 - base) <= 1e-6 * math.abs(base))
  }

  test("scale-set queries keep plan invariants on amplified data") {
    val qs = SparkEntry.registry.filter(q => ScaleBench.ScaleSet.contains(q.name))
    assert(qs.map(_.name).toSet === ScaleBench.ScaleSet.toSet,
      "every scale-set name must resolve to a registered query")
    val offenders = qs.flatMap { q =>
      val plan = q.run(spark, ampDir).queryExecution.executedPlan
      val cart =
        if (graft.plans.PlanChecks.hasCartesianProduct(plan))
          Seq(s"${q.name}: CartesianProduct") else Nil
      val wins = graft.plans.PlanChecks.partitionlessDataWindows(plan)
        .map(cols => s"${q.name}: partitionless window (${cols.mkString(",")})")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      cart ++ wins
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
