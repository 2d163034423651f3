package graft.streaming

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import org.apache.spark.sql.functions._

/** The incrementally-maintained LSH index: postings track the corpus
  * through inserts and deletes, one-batch insert+delete nets out, and
  * a replayed batch is a no-op.
  */
class LshIndexPipelineSpec extends SparkSuite {

  private def doc(id: Long, seed: String): (Long, String) =
    (id, (1 to 30).map(i => s"$seed$i word$i token$i").mkString(" "))

  test("bootstrap + incremental insert/delete tracks the corpus") {
    val s = spark
    import s.implicits._
    val docsBase = TempDirs.scoped("lshidx_docs")
    val idxBase = TempDirs.scoped("lshidx_idx")
    val cp = TempDirs.scoped("lshidx_cp")
    VersionedTable.commitMerge(s, docsBase,
      Seq(doc(1, "a"), doc(2, "b")).toDF("doc_id", "text"),
      "doc_id", Seq("doc_id"), statsCols = Seq("doc_id"))
    LshIndexPipeline.runAvailableNow(s, docsBase, idxBase, cp)
    def idxDocs() = s.read.format("graft").load(idxBase)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(idxDocs() === Seq(1L, 2L))
    // posting count: 8 bands per indexed doc
    assert(s.read.format("graft").load(idxBase).count() === 16L)
    // insert 3, delete 1 — two commits, ONE drain
    VersionedTable.commitMerge(s, docsBase,
      Seq(doc(3, "c")).toDF("doc_id", "text"),
      "doc_id", Seq("doc_id"), statsCols = Seq("doc_id"))
    VersionedTable.commitDelete(s, docsBase, col("doc_id") === 1L,
      Seq(("doc_id", 1L, 1L)), statsCols = Seq("doc_id"))
    LshIndexPipeline.runAvailableNow(s, docsBase, idxBase, cp)
    assert(idxDocs() === Seq(2L, 3L))
  }

  test("insert-then-delete of the SAME doc in one batch nets to absent") {
    val s = spark
    import s.implicits._
    val docsBase = TempDirs.scoped("lshidx_net_docs")
    val idxBase = TempDirs.scoped("lshidx_net_idx")
    val cp = TempDirs.scoped("lshidx_net_cp")
    VersionedTable.commitMerge(s, docsBase,
      Seq(doc(1, "a")).toDF("doc_id", "text"),
      "doc_id", Seq("doc_id"), statsCols = Seq("doc_id"))
    LshIndexPipeline.runAvailableNow(s, docsBase, idxBase, cp)
    // doc 9 is inserted AND deleted before the next drain
    VersionedTable.commitMerge(s, docsBase,
      Seq(doc(9, "z")).toDF("doc_id", "text"),
      "doc_id", Seq("doc_id"), statsCols = Seq("doc_id"))
    VersionedTable.commitDelete(s, docsBase, col("doc_id") === 9L,
      Seq(("doc_id", 9L, 9L)), statsCols = Seq("doc_id"))
    LshIndexPipeline.runAvailableNow(s, docsBase, idxBase, cp)
    val ids = s.read.format("graft").load(idxBase)
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L))
  }

  test("a replayed batch id is a no-op") {
    val s = spark
    import s.implicits._
    val idxBase = TempDirs.scoped("lshidx_replay_idx")
    val batch = Seq((1L, 1L, null: String, "alpha beta gamma delta " * 10,
        "insert"))
      .toDF("version", "doc_id", "text_old", "text_new", "change_type")
    LshIndexPipeline.applyBatch(spark, idxBase, batch, 0L)
    val n = s.read.format("graft").load(idxBase).count()
    assert(n === 8L)
    LshIndexPipeline.applyBatch(spark, idxBase, batch, 0L) // replay
    assert(s.read.format("graft").load(idxBase).count() === n)
    assert(VersionedTable.latestVersion(idxBase) === Some(1L))
  }
}
