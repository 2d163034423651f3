package graft.streaming

import graft.{SparkSuite, TempDirs}
import graft.functions.VectorFunctions
import graft.operators.{TopK, VectorIvf, VersionedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The standing graph-ANN index: insertion repair must be EXACT
  * against the batch edge formula (top-G over ever-arrived candidates
  * — NN-descent merge, batch boundaries invisible), deletion must
  * tombstone (retire endpoints, never refill from the discarded
  * tail), and the change-feed drain must be exactly-once across
  * checkpointed replays.
  */
class GraphIndexPipelineSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def bases(): (String, String, String, String, String) =
    (TempDirs.scoped("gix_vecs"), TempDirs.scoped("gix_edges"),
      TempDirs.scoped("gix_route"), TempDirs.scoped("gix_cent"),
      TempDirs.scoped("gix_cp"))

  private def vecs: DataFrame =
    graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("emb", col("embedding").cast("array<double>"))
      .withColumn("nrm", VectorFunctions.normNative(col("emb")))
      .select(col("vec_id"), col("emb"), col("nrm"))

  /** The batch formula q188 builds: top-G per src among the members of
    * its 2 nearest cells, cells fixed to `cents`.
    */
  private def batchEdges(corpus: DataFrame, cents: DataFrame): Set[(Long, Long)] = {
    val asg1 = VectorIvf.nearestCentroids(corpus, cents, keep = 1, "vec_id")
      .select(col("vec_id").as("dst"), col("emb").as("demb"),
        col("nrm").as("dnrm"), col("cid"))
    val asg2 = VectorIvf.nearestCentroids(corpus, cents, keep = 2, "vec_id")
      .select(col("vec_id").as("src"), col("emb").as("semb"),
        col("nrm").as("snrm"), col("cid"))
    val pairs = asg2.join(asg1, "cid")
      .filter(col("src") =!= col("dst"))
      .withColumn("ecos", VectorFunctions.dotNative(col("semb"), col("demb"))
        / (col("snrm") * col("dnrm")))
    TopK.perKey(pairs, Seq("src"), Seq(col("ecos").desc, col("dst")),
        GraphIndexPipeline.Degree)
      .select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def edgeSet(edgesBase: String): Set[(Long, Long)] =
    spark.read.format("graft").load(edgesBase)
      .select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("insert-only maintenance equals the batch edge formula " +
      "(NN-descent merge is exact); replay is exactly-once") {
    val (vb, eb, rb, cb, cp) = bases()
    VersionedTable.commitMerge(spark, vb,
      vecs.filter(col("vec_id") % 2 === 0), "vec_id", Seq("vec_id"),
      statsCols = Seq("vec_id"))
    // maintain=false: this test pins EXACT commit counts (compaction
    // would add versions); bounded history has its own test below
    GraphIndexPipeline.runAvailableNow(spark, vb, eb, rb, cb, cp,
      maintain = false)
    VersionedTable.commitMerge(spark, vb,
      vecs.filter(col("vec_id") % 2 === 1), "vec_id", Seq("vec_id"),
      statsCols = Seq("vec_id"))
    GraphIndexPipeline.runAvailableNow(spark, vb, eb, rb, cb, cp,
      maintain = false)
    // expected: the batch formula over the FULL corpus with the
    // bootstrap-elected cells (no deletes → exactness, batch
    // boundaries invisible)
    val cents = VersionedTable.readLatest(spark, cb)
    val expected = batchEdges(withNorm(vecs), cents)
    assert(edgeSet(eb) === expected)
    // each batch's adjacency rewrite is ONE atomic replace commit
    // (r14 advice: no delete-then-append crash window) — two drained
    // batches ⟹ exactly two edge-table versions
    assert(VersionedTable.latestVersion(eb) === Some(2L))
    // replay with the same checkpoint: nothing new to drain — the
    // edges table's version must not move
    val vBefore = VersionedTable.latestVersion(eb)
    GraphIndexPipeline.runAvailableNow(spark, vb, eb, rb, cb, cp,
      maintain = false)
    assert(VersionedTable.latestVersion(eb) === vBefore)
  }

  test("REPAIR (r15) restores exactness after delete churn: degraded " +
      "srcs recompute over their cells' live members, so the standing " +
      "index equals the fresh batch formula again; cost ∝ degraded") {
    val (vb, eb, rb, cb, cp) = bases()
    VersionedTable.commitMerge(spark, vb, vecs, "vec_id", Seq("vec_id"),
      statsCols = Seq("vec_id"))
    GraphIndexPipeline.runAvailableNow(spark, vb, eb, rb, cb, cp)
    // delete-heavy churn: retire a third of the corpus
    VersionedTable.commitDelete(spark, vb,
      col("vec_id") % 3 === 0, statsCols = Seq("vec_id"))
    GraphIndexPipeline.runAvailableNow(spark, vb, eb, rb, cb, cp)
    val live = withNorm(spark.read.format("graft").load(vb)
      .select(col("vec_id"), col("embedding")))
    val cents = VersionedTable.readLatest(spark, cb)
    val freshFormula = batchEdges(live, cents)
    // tombstone debt exists: the standing adjacency lost edges the
    // fresh build would have (vacated slots never refilled)
    val before = edgeSet(eb)
    assert(before.subsetOf(freshFormula))
    assert(before !== freshFormula,
      "churn fixture should actually degrade some srcs")
    // repair: recompute exactly the degraded srcs — afterwards the
    // standing index IS the fresh-build adjacency (recall floor == the
    // fresh build's, the strongest possible bound)
    val repaired = GraphIndexPipeline.repair(spark, vb, eb, rb)
    assert(repaired > 0L)
    assert(edgeSet(eb) === freshFormula)
    // cost ∝ degraded: a second call finds nothing to do and commits
    // nothing
    val v0 = VersionedTable.latestVersion(eb)
    assert(GraphIndexPipeline.repair(spark, vb, eb, rb) === 0L)
    assert(VersionedTable.latestVersion(eb) === v0)
  }

  test("BOUNDED HISTORY (r15): steady-state maintenance keeps live " +
      "file count and commit log bounded across many batches; reads " +
      "and the exactly-once gate survive retention") {
    val (vb, eb, rb, cb, cp) = bases()
    val all = vecs.persist()
    val maxId = all.agg(max(col("vec_id"))).head().getLong(0)
    // bootstrap then many small deltas, each drained with maintenance
    VersionedTable.commitMerge(spark, vb,
      all.filter(col("vec_id") <= maxId - 20), "vec_id", Seq("vec_id"),
      statsCols = Seq("vec_id"))
    GraphIndexPipeline.runAvailableNow(spark, vb, eb, rb, cb, cp)
    (1L to 20L).foreach { i =>
      VersionedTable.commitMerge(spark, vb,
        all.filter(col("vec_id") === maxId - 20 + i), "vec_id",
        Seq("vec_id"), statsCols = Seq("vec_id"))
      GraphIndexPipeline.runAvailableNow(spark, vb, eb, rb, cb, cp)
    }
    all.unpersist()
    // live files bounded by data volume, not batch count: 20 batches
    // of 1 row each must not leave ~20+ routing files behind
    val routeFiles = VersionedTable.entries(rb,
      VersionedTable.latestVersion(rb).get).size
    assert(routeFiles < 12,
      s"routing small-file debt should fold away, got $routeFiles files")
    // commit log bounded by retention: markers below the vacuum floor
    // are physically gone
    val head = VersionedTable.latestVersion(rb).get
    assert(head > 20L, "fixture should have accrued history")
    val logDir = java.nio.file.Paths.get(rb, "_log")
    val markerStream = java.nio.file.Files.list(logDir)
    val nMarkers =
      try {
        val it = markerStream.iterator()
        var n = 0
        while (it.hasNext) {
          if (it.next().getFileName.toString.endsWith(".commit")) n += 1
        }
        n
      } finally markerStream.close()
    assert(nMarkers <= 16 + 1,
      s"history should be vacuumed to retention, got $nMarkers markers")
    // reads within retention intact; the index state is still exact
    val cents = VersionedTable.readLatest(spark, cb)
    val liveAll = withNorm(spark.read.format("graft").load(vb)
      .select(col("vec_id"), col("embedding")))
    assert(edgeSet(eb) === batchEdges(liveAll, cents))
    // the exactly-once gate survives vacuum (checkpoint-restated txn
    // watermark): an empty re-drain moves nothing
    val vBefore = VersionedTable.latestVersion(eb)
    GraphIndexPipeline.runAvailableNow(spark, vb, eb, rb, cb, cp)
    assert(VersionedTable.latestVersion(eb) === vBefore)
  }

  test("deletes TOMBSTONE: retired endpoints vanish, vacated slots " +
      "are not refilled; re-inserts repair locally") {
    val (vb, eb, rb, cb, cp) = bases()
    VersionedTable.commitMerge(spark, vb, vecs, "vec_id", Seq("vec_id"),
      statsCols = Seq("vec_id"))
    GraphIndexPipeline.runAvailableNow(spark, vb, eb, rb, cb, cp)
    val before = edgeSet(eb)
    val dead = Set(6L, 7L, 8L)
    VersionedTable.commitDelete(spark, vb,
      col("vec_id").between(6L, 8L), Seq(("vec_id", 6L, 8L)),
      statsCols = Seq("vec_id"))
    GraphIndexPipeline.runAvailableNow(spark, vb, eb, rb, cb, cp)
    val after = edgeSet(eb)
    assert(after === before.filterNot { case (s, d) =>
      dead.contains(s) || dead.contains(d) },
      "a delete must remove exactly the edges touching dead nodes")
    // serving still answers off the surviving entry points
    val live = withNorm(spark.read.format("graft").load(vb)
      .select(col("vec_id"), col("embedding")))
    val queries = live.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
        col("nrm").as("qnrm"))
    val served = GraphIndexPipeline.topK(spark, eb, cb, live, queries, 5)
      .collect()
    assert(served.nonEmpty)
    assert(!served.exists(r => dead.contains(r.getLong(2))),
      "tombstoned nodes must never be served")
  }
}
