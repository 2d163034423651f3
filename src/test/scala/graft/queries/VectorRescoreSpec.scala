package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Re-scoring contract for the approximate-NN entries (VERDICT r3 #7):
  * q37/q51's candidate SETS are engine-specific (LSH/IVF recall < 1 by
  * design, so no full oracle exists), but every EMITTED
  * (query, neighbor, score) must be exactly right. Re-derive the
  * cosine for each emitted pair from the raw embeddings through an
  * independent path (interpreted HOF fold, not the native codegen'd
  * vec_dot the queries use) and assert the emitted floor(cos*100) and
  * the rank order reproduce bit-for-bit — catching scoring drift in
  * the native expressions or the TopK tail without constraining
  * recall. (Both paths fold left sequentially, so IEEE doubles agree
  * exactly, not approximately.)
  */
class VectorRescoreSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def rescore(name: String): Unit = {
    val res = graft.SparkEntry.queries(name)(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val rows = res
      .join(emb.select(col("vec_id").as("neighbor_id"), col("v").as("nv")),
        "neighbor_id")
      .join(emb.select(col("vec_id").as("query_id"), col("v").as("qv")),
        "query_id")
      .withColumn("cos",
        dot(col("nv"), col("qv"))
          / (sqrt(dot(col("nv"), col("nv"))) * sqrt(dot(col("qv"), col("qv")))))
      .select(col("query_id").cast("long"), col("rank").cast("long"),
        col("neighbor_id").cast("long"), col("score_e2").cast("long"),
        col("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))

    assert(rows.nonEmpty, s"$name emitted nothing to re-score")
    for ((q, rank, n, scoreE2, cos) <- rows)
      assert(math.floor(cos * 100).toLong == scoreE2,
        s"$name ($q,$n) emitted score_e2=$scoreE2 but exact cosine is $cos")
    // rank order within each query == exact (cos desc, neighbor_id) order
    for ((q, group) <- rows.groupBy(_._1)) {
      val byRank = group.sortBy(_._2).map(_._3).toSeq
      val byScore = group.sortBy(t => (-t._5, t._3)).map(_._3).toSeq
      assert(byRank == byScore,
        s"$name query $q rank order $byRank != exact-cosine order $byScore")
    }
  }

  test("q37 emitted scores and ranks equal exact re-scored cosine") {
    rescore("q37_ann_lsh")
  }

  test("q51 emitted scores and ranks equal exact re-scored cosine") {
    rescore("q51_ann_ivf")
  }

  test("q43 emitted pair scores and ranks equal exact re-scored cosine") {
    // same contract for the embedding near-dup top-20: candidate pairs
    // are LSH-specific, emitted (pair, score, rank) must be exact
    val res = graft.SparkEntry.queries("q43_embedding_neardup")(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val rows = res
      .join(emb.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .withColumn("cos",
        dot(col("va"), col("vb"))
          / (sqrt(dot(col("va"), col("va"))) * sqrt(dot(col("vb"), col("vb")))))
      .select(col("vec_a").cast("long"), col("vec_b").cast("long"),
        col("score_e2").cast("long"), col("rank").cast("long"), col("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty, "q43 emitted nothing to re-score")
    for ((a, b, scoreE2, _, cos) <- rows)
      assert(math.floor(cos * 100).toLong == scoreE2,
        s"q43 ($a,$b) emitted score_e2=$scoreE2 but exact cosine is $cos")
    val byRank = rows.sortBy(_._4).map(t => (t._1, t._2)).toSeq
    val byScore = rows.sortBy(t => (-t._5, t._1, t._2)).map(t => (t._1, t._2)).toSeq
    assert(byRank == byScore,
      s"q43 rank order $byRank != exact-cosine order $byScore")
  }
}
