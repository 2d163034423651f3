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

  // --- the 100 TB skew knob: oversized clusters split by secondary
  // sign-LSH so no task ever sweeps a hot cluster's full O(n²) pairs ---

  private val SkewDim = 8
  private val SkewPlanes = 4
  private val Threshold = 40L

  /** 200 members, 90% forced into cluster 0 (a hot templated-content
    * cluster), plus a planted near-duplicate pair (same direction,
    * scaled — cos = 1) inside the hot cluster.
    */
  private def skewedMembers = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(7)
    val base = (0 until 200).map { i =>
      (i.toLong, Array.fill(SkewDim)(rnd.nextGaussian()),
        if (i < 180) 0L else 1L)
    }
    val planted = base :+ ((1000L, base(5)._2.map(_ * 1.001), 0L))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("emb", ArrayType(DoubleType, containsNull = false)),
      StructField("cluster", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        planted.map { case (id, v, cl) => Row(id, v.toSeq, cl) }, 4), schema)
      .withColumn("nrm",
        graft.functions.VectorFunctions.normNative(col("emb")))
  }

  test("skew: oversized cluster splits into bounded sub-buckets, small cluster swept exactly") {
    import graft.operators.{SemDeDup, VectorLsh}
    val planes = VectorLsh.hyperplanes(1, SkewPlanes, SkewDim).head
    val groups = SemDeDup.subBucketed(skewedMembers, Threshold, planes)
      .groupBy(col("cluster"), col("sub")).count().collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    // the hot cluster (181 members, past the threshold) fans out over
    // the 2^SkewPlanes sign buckets: per-task sweep work is bounded by
    // the largest sub-bucket, which must be FAR below the cluster size
    // (~181/16 expected; 3× slack keeps the assert noise-proof)
    val hot = groups.collect { case ((0L, _), n) => n }
    assert(hot.size > 1, s"hot cluster did not split: $groups")
    assert(hot.max <= 3 * 181 / (1 << SkewPlanes),
      s"sub-bucket not bounded: max ${hot.max} of 181")
    // the within-threshold cluster stays ONE exact-sweep group (sub 0)
    assert(groups((1L, 0)) === 20L)
    assert(!groups.keys.exists { case (cl, sub) => cl == 1L && sub != 0 })
  }

  test("skew: planted near-duplicate pair survives the split; no cross-cluster pairs") {
    import graft.operators.SemDeDup
    val out = SemDeDup.pairs(skewedMembers, Threshold,
      numPlanes = SkewPlanes, dim = SkewDim).collect()
    // same direction ⟹ identical sign bucket ⟹ the pair is swept
    val dup = out.find(r => r.getLong(1) === 5L && r.getLong(2) === 1000L)
      .getOrElse(fail(s"planted near-dup pair lost by the split"))
    assert(dup.getDouble(3) > 0.9999)
    // pair volume: exactly Σ n·(n-1)/2 over the swept groups — the
    // split's whole point is that this is ≪ the unsplit 181·180/2
    val unsplit = SemDeDup.pairs(skewedMembers, splitThreshold = 1000L,
      numPlanes = SkewPlanes, dim = SkewDim).count()
    assert(unsplit === (181L * 180 / 2 + 20L * 19 / 2))
    assert(out.length < unsplit / 4,
      s"split did not shrink the sweep: ${out.length} vs $unsplit")
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
