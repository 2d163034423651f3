package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Semantic pins for q80 (SemDeDup). The DuckDB oracle proves
  * cross-engine parity at sf0.01; these prove the clustering and
  * ranking semantics against a driver-side brute force at sf0.001.
  */
class SemanticDedupSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q80: every reported pair lives in its members' argmax-cosine cluster") {
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val centroids = vecs.filter(_._1 < 8)
    def assign(v: Array[Double]): Long =
      // max cosine, ties to the LOWER centroid id — the registered contract
      centroids.toSeq.map { case (cid, c) => (cosine(v, c), -cid) }.max._2 * -1
    val out = graft.SparkEntry.queries("q80_semantic_dedup")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (cluster, a, b) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(assign(vecs(a)) === cluster, s"vec $a not in cluster $cluster")
      assert(assign(vecs(b)) === cluster, s"vec $b not in cluster $cluster")
      // emitted score is the floor-scaled exact cosine of the pair
      assert(r.getLong(4) === math.floor(cosine(vecs(a), vecs(b)) * 100).toLong)
    }
  }

  test("q80: per-cluster ranks are 1..k with non-increasing scores") {
    val rows = graft.SparkEntry.queries("q80_semantic_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (cluster, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to g.length).toSeq,
        s"cluster $cluster ranks not dense")
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted(Ordering[Long].reverse).toSeq,
        s"cluster $cluster scores not non-increasing")
      assert(g.length <= 3)
    }
  }
}
