package graft.streaming

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import org.apache.spark.sql.functions._

/** The incrementally-maintained IVF index: the coarse quantizer is
  * fixed at bootstrap, routings track inserts/deletes, and a replayed
  * batch is a no-op. (q182 drives the full oracle-checked lifecycle.)
  */
class IvfIndexPipelineSpec extends SparkSuite {

  private def vec(id: Long): (Long, Seq[Float]) =
    (id, (0 until 8).map(j => ((id * 31 + j * 7) % 13).toFloat - 6f))

  private def batchDf(rows: Seq[(Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (v, id, ct) =>
      (v, id,
        if (ct == "delete") None else Some(vec(id)._2),
        if (ct == "insert" || ct == "update") Some(vec(id)._2) else None,
        ct)
    }.toDF("version", "vec_id", "embedding_old", "embedding_new",
      "change_type")
      .select(col("version"), col("vec_id"),
        col("embedding_old").cast("array<float>").as("embedding_old"),
        col("embedding_new").cast("array<float>").as("embedding_new"),
        col("change_type"))
  }

  test("bootstrap fixes centroids; inserts route; deletes retire; replay no-ops") {
    val idx = TempDirs.scoped("ivfidx_idx")
    val cent = TempDirs.scoped("ivfidx_cent")
    // batch 0: bootstrap with 10 vectors
    IvfIndexPipeline.applyBatch(spark, idx, cent,
      batchDf((0L until 10L).map(i => (1L, i, "insert"))), 0L)
    val centN = VersionedTable.readLatest(spark, cent).count()
    assert(centN === 10L) // C=64 cap, corpus smaller: all elected
    assert(spark.read.format("graft").load(idx).count() === 10L)
    // batch 1: insert 2, delete 1 (netting not needed here)
    IvfIndexPipeline.applyBatch(spark, idx, cent,
      batchDf(Seq((2L, 10L, "insert"), (2L, 11L, "insert"),
        (3L, 0L, "delete"))), 1L)
    val ids = spark.read.format("graft").load(idx)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === ((1L to 11L): Seq[Long]))
    // centroids did NOT retrain on the second batch
    assert(VersionedTable.latestVersion(cent) === Some(1L))
    assert(VersionedTable.readLatest(spark, cent).count() === centN)
    // replay of batch 1: no-op
    IvfIndexPipeline.applyBatch(spark, idx, cent,
      batchDf(Seq((2L, 10L, "insert"))), 1L)
    assert(spark.read.format("graft").load(idx).count() === 11L)
    // every routing points at a live centroid
    val cids = VersionedTable.readLatest(spark, cent)
      .select(col("cid")).collect().map(_.getLong(0)).toSet
    val routedCids = spark.read.format("graft").load(idx)
      .select(col("cid")).collect().map(_.getLong(0)).toSet
    assert(routedCids.subsetOf(cids))
  }
}
