package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSuite

/** Pins what q129's single-batch-shaped oracle cannot: the upsert
  * genuinely runs MULTI-batch (one micro-batch per input file) and the
  * cross-batch merge is last-write-wins by the order columns, not by
  * arrival. */
class UpsertPipelineSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("ver", LongType),
    StructField("v", LongType)))

  test("one micro-batch per file; merged state is last-write-wins by ver") {
    import spark.implicits._
    val base = graft.TempDirs.scoped("graft_upsert_spec")
    // file 1 carries the NEWER version of key 1 (ver 3) — if the merge
    // were arrival-ordered instead of ver-ordered, file 2's ver 2 row
    // would clobber it
    Seq((1L, 3L, 30L), (2L, 1L, 200L)).toDF("k", "ver", "v")
      .coalesce(1).write.parquet(s"$base/in/f1")
    Seq((1L, 2L, 20L), (3L, 1L, 300L)).toDF("k", "ver", "v")
      .coalesce(1).write.parquet(s"$base/in/f2")
    // flatten: the file source lists leaf files; two parquet part-files
    val fs = new java.io.File(s"$base/in")
    val parts = for {
      d <- fs.listFiles.toSeq if d.isDirectory
      f <- d.listFiles if f.getName.endsWith(".parquet")
    } yield f
    val in = s"$base/flat"
    new java.io.File(in).mkdirs()
    parts.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(s"$in/part$i.parquet"))
    }
    val (state, nBatches) = UpsertPipeline.runAvailableNow(
      spark, in, s"$base/run", schema, keyCol = "k", ordCols = Seq("ver"))
    assert(nBatches == 2, s"expected one micro-batch per file, got $nBatches")
    val rows = state.orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 3L, 30L), (2L, 1L, 200L), (3L, 1L, 300L)))
  }

  test("zero pending files drain: zero batches, empty state in output shape") {
    val base = graft.TempDirs.scoped("graft_upsert_empty")
    new java.io.File(s"$base/in").mkdirs()
    val (state, n) = UpsertPipeline.runAvailableNow(
      spark, s"$base/in", s"$base/run", schema, keyCol = "k", ordCols = Seq("ver"))
    assert(n == 0)
    assert(state.count() == 0)
    assert(state.columns.toSeq == Seq("k", "ver", "v"))
  }

  test("versioned sink: same merged state, per-micro-batch time travel + CDC") {
    import spark.implicits._
    import graft.operators.VersionedTable
    val base = graft.TempDirs.scoped("graft_upsert_vt")
    val in = s"$base/flat"
    new java.io.File(in).mkdirs()
    Seq((1L, 3L, 30L), (2L, 1L, 200L)).toDF("k", "ver", "v")
      .coalesce(1).write.parquet(s"$base/f1")
    Seq((1L, 2L, 20L), (3L, 1L, 300L)).toDF("k", "ver", "v")
      .coalesce(1).write.parquet(s"$base/f2")
    val parts = for {
      d <- Seq(s"$base/f1", s"$base/f2")
      f <- new java.io.File(d).listFiles.toSeq
      if f.getName.endsWith(".parquet")
    } yield f
    parts.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(s"$in/part$i.parquet"))
    }
    val table = s"$base/table"
    val (state, nBatches, latest) = UpsertPipeline.runAvailableNowVersioned(
      spark, in, table, schema, keyCol = "k", ordCols = Seq("ver"))
    assert(nBatches == 2 && latest == 2L)
    // final state identical to the plain-parquet pipeline's semantics
    assert(state.orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 30L), (2L, 1L, 200L), (3L, 1L, 300L)))
    // per-micro-batch TIME TRAVEL: version 1 is exactly batch 1's state
    assert(VersionedTable.readVersion(spark, table, 1L).count() == 2L)
    // and the CDC feed between the batches reflects whichever file the
    // source drained first (file-batch order is not pinned): f1-first
    // leaves only f2's k=3 insert (k=1's ver 2 loses to the present
    // ver 3); f2-first shows f1's k=1 ver-3 update + k=2 insert.
    // Either way the merge is last-write-wins, never arrival-wins.
    val changes = VersionedTable.changesBetween(spark, table, 1L, 2L, "k")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type"))
      .toMap
    assert(changes === Map(3L -> "insert") ||
      changes === Map(1L -> "update", 2L -> "insert"), changes.toString)
    // replay idempotence on STATE: re-merging an already-included delta
    // advances the version, not the state (the crash-replay outcome)
    val v3 = VersionedTable.commitMerge(spark, table,
      Seq((1L, 2L, 20L), (3L, 1L, 300L)).toDF("k", "ver", "v"),
      "k", Seq("ver"))
    assert(v3 == 3L)
    assert(VersionedTable.changesBetween(spark, table, 2L, 3L, "k").count() == 0L)
  }

  test("versioned sink: empty drain leaves no table, output shape intact") {
    val base = graft.TempDirs.scoped("graft_upsert_vt_empty")
    new java.io.File(s"$base/in").mkdirs()
    val (state, n, v) = UpsertPipeline.runAvailableNowVersioned(
      spark, s"$base/in", s"$base/table", schema, "k", Seq("ver"))
    assert(n == 0 && v == 0L)
    assert(state.count() == 0 && state.columns.toSeq == Seq("k", "ver", "v"))
  }
}
