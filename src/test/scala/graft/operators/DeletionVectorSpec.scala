package graft.operators

import java.nio.file.{Files, Paths}

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable._
import org.apache.spark.sql.functions._

/** Deletion vectors — merge-on-read DELETE ([[VersionedTable
  * .commitDeleteMoR]]): sidecar-of-positions commits, DV-applied reads
  * everywhere (library, DSv2/SQL, change feed, streaming snapshot),
  * fold-away on rewrite, vacuum/restore integration.
  */
class DeletionVectorSpec extends SparkSuite {

  /** k = 0..n-1 in `files` one-file commits binned by k % files, v = 10k. */
  private def binned(base: String, n: Long, files: Int): Unit = {
    val s = spark
    import s.implicits._
    (0 until files).foreach { b =>
      VersionedTable.commitAppend(spark, base,
        (0L until n).filter(_ % files == b).map(k => (k, k * 10L))
          .toDF("k", "v").coalesce(1),
        statsCols = Seq("k"))
    }
  }

  test("MoR delete: sidecar commit, zero data files written, exact reads") {
    val base = TempDirs.scoped("dv_basic")
    binned(base, 40L, 4) // v1..v4, k%4 per file — every file spans [b, 36+b]
    val v = VersionedTable.commitDeleteMoR(spark, base,
      col("k").isin(5L, 9L, 13L)) // all in file k%4==1
    assert(v === 5L)
    val (op, adds, removes) = VersionedTable.commitDelta(base, 5L)
    assert(op === "delete_mor")
    // the commit swaps ONE manifest entry and writes NO parquet
    assert(removes.size === 1 && adds.size === 1)
    assert(adds.head.path === removes.head)
    assert(adds.head.dv.map(_.count) === Some(3L))
    assert(adds.head.rows === 10L && adds.head.liveRows === 7L)
    // the sidecar is tiny and lives in the commit's own attempt dir
    val dvPath = adds.head.dv.get.path
    assert(dvPath.startsWith("d5-") && dvPath.endsWith(".dv"))
    assert(VersionedTable.dvPositions(base, dvPath).size === 3)
    // reads drop exactly the deleted keys; untouched files intact
    val ks = VersionedTable.readLatest(spark, base)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(ks === (0L until 40L).toSet -- Set(5L, 9L, 13L))
    // time travel: pre-delete snapshot still has them
    assert(VersionedTable.readVersion(spark, base, 4L).count() === 40L)
    // zone maps untouched: pruning still scopes by k ranges
    val es = VersionedTable.entries(base, 5L)
    assert(es.size === 4 && es.forall(_.stats.contains("k")))
  }

  test("stacking merges positions; covering vector drops the file; no-op") {
    val base = TempDirs.scoped("dv_stack")
    binned(base, 12L, 2) // file0: k=0,2,..10 (6 rows); file1: odd
    VersionedTable.commitDeleteMoR(spark, base, col("k").isin(0L, 2L))
    val v2 = VersionedTable.commitDeleteMoR(spark, base, col("k").isin(4L, 6L))
    val e = VersionedTable.entries(base, v2).find(_.dv.isDefined).get
    assert(e.dv.get.count === 4L) // merged, immutable new sidecar
    // a matched-nothing delete commits nothing (already-deleted keys
    // can't re-match: the position scan reads DV-applied)
    assert(VersionedTable.commitDeleteMoR(spark, base,
      col("k").isin(0L, 2L)) === v2)
    // deleting the rest of file0 covers it entirely -> entry drops
    val v3 = VersionedTable.commitDeleteMoR(spark, base,
      col("k") % 2 === 0L)
    val es = VersionedTable.entries(base, v3)
    assert(es.size === 1 && es.forall(_.dv.isEmpty))
    assert(VersionedTable.readLatest(spark, base).count() === 6L)
    // the dropped file's commit wrote no sidecar for it
    val (_, adds3, removes3) = VersionedTable.commitDelta(base, v3)
    assert(adds3.isEmpty && removes3.size === 1)
  }

  test("rewrite paths fold vectors and never resurrect rows") {
    val base = TempDirs.scoped("dv_fold")
    binned(base, 20L, 2)
    VersionedTable.commitDeleteMoR(spark, base, col("k") < 4L)
    // CoW update on the dv'd footprint: rewrite reads DV-applied
    VersionedTable.commitUpdate(spark, base, col("k") >= 4L,
      Seq("v" -> (col("v") + 1L)), statsCols = Seq("k"))
    val afterU = VersionedTable.readLatest(spark, base)
    assert(afterU.count() === 16L)
    assert(afterU.filter(col("k") < 4L).count() === 0L)
    // the update rewrote the files whole -> vectors folded away
    assert(VersionedTable.entries(base,
      VersionedTable.latestVersion(base).get).forall(_.dv.isEmpty))
    // again with compaction
    VersionedTable.commitDeleteMoR(spark, base, col("k") === 7L)
    val cv = VersionedTable.compact(spark, base, 1, statsCols = Seq("k"))
    val es = VersionedTable.entries(base, cv)
    assert(es.size === 1 && es.head.dv.isEmpty && es.head.rows === 15L)
    assert(VersionedTable.readLatest(spark, base).count() === 15L)
    // and MERGE: source matches a soft-deleted key -> it must INSERT
    // (the row is dead), not update a ghost
    val s = spark
    import s.implicits._
    VersionedTable.commitDeleteMoR(spark, base, col("k") === 8L)
    VersionedTable.commitMergeInto(spark, base,
      Seq((8L, 999L)).toDF("sk", "sv"),
      keys = Seq("k" -> col("__s_sk")),
      matched = Seq(MergeUpdate(None, Seq("v" -> col("__s_sv")))),
      inserts = Seq(MergeInsert(None,
        Seq("k" -> col("__s_sk"), "v" -> col("__s_sv")))),
      targetSchema = afterU.schema, statsCols = Seq("k"))
    val row8 = VersionedTable.readLatest(spark, base)
      .filter(col("k") === 8L).collect()
    assert(row8.map(_.getLong(1)).toSeq === Seq(999L))
  }

  test("change feed emits soft-deleted rows; restore crosses a MoR delete") {
    val base = TempDirs.scoped("dv_cdc")
    binned(base, 10L, 2) // v1, v2
    val vd = VersionedTable.commitDeleteMoR(spark, base,
      col("k").isin(2L, 4L))
    val feed = VersionedTable.changesPerCommit(spark, base, vd - 1, vd, "k")
      .collect()
    assert(feed.length === 2)
    assert(feed.map(_.getAs[String]("change_type")).toSet === Set("delete"))
    assert(feed.map(_.getAs[Long]("k")).toSet === Set(2L, 4L))
    // restore across the MoR delete resurrects via a metadata commit
    val rv = VersionedTable.restore(base, vd - 1)
    assert(VersionedTable.readLatest(spark, base).count() === 10L)
    val (_, addsR, removesR) = VersionedTable.commitDelta(base, rv)
    // same-path swap: the dv'd entry is dropped, the clean one re-added
    assert(removesR.nonEmpty && addsR.forall(_.dv.isEmpty))
    // and the restore's change feed shows exactly the resurrected keys
    val rfeed = VersionedTable.changesPerCommit(spark, base, rv - 1, rv, "k")
      .collect()
    assert(rfeed.map(_.getAs[Long]("k")).toSet === Set(2L, 4L))
    assert(rfeed.map(_.getAs[String]("change_type")).toSet === Set("insert"))
  }

  test("vacuum keeps referenced sidecars, sweeps unreferenced ones") {
    val base = TempDirs.scoped("dv_vacuum")
    binned(base, 10L, 2)
    val v3 = VersionedTable.commitDeleteMoR(spark, base, col("k") === 2L)
    val v4 = VersionedTable.commitDeleteMoR(spark, base, col("k") === 4L)
    val dv3 = VersionedTable.entries(base, v3).flatMap(_.dv).head.path
    val dv4 = VersionedTable.entries(base, v4).flatMap(_.dv).head.path
    // retain only v4: v3's sidecar is unreferenced, v4's lives
    val deleted = VersionedTable.vacuum(base, retainFrom = v4)
    assert(deleted.contains(dv3))
    assert(Files.exists(Paths.get(base, dv4)))
    assert(VersionedTable.readLatest(spark, base).count() === 8L)
  }

  test("SQL surface: mor mode, DSv2 reads, manifest count, streaming") {
    val ns = s"dvns${System.nanoTime() % 1000000}"
    val t = s"graft.$ns.t"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$ns/t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    (0 until 4).foreach { b =>
      // one data file per commit (otherwise range(10) scatters 1-row
      // files and the MoR delete legitimately DROPS fully-covered
      // files instead of writing vectors — a different, also-correct
      // layout this test doesn't mean to pin)
      spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ " +
        s"id * 4 + $b AS k, id AS v FROM range(10)")
    }
    spark.conf.set("spark.graft.delete.mode", "mor")
    try {
      spark.sql(s"DELETE FROM $t WHERE k IN (1, 5, 9)")
      val (opD, addsD, removesD) =
        VersionedTable.commitDelta(base, VersionedTable.latestVersion(base).get)
      assert(opD === "delete_mor")
      // pure entry swaps: every re-added path was removed first, no
      // parquet written, vectors cover exactly the 3 deleted keys
      assert(addsD.map(_.path).toSet.subsetOf(removesD.toSet))
      assert(addsD.flatMap(_.dv).map(_.count).sum === 3L)
      // DSv2 read through the DV rewrite: exact rows by name and path
      assert(spark.sql(s"SELECT count(*) AS n FROM $t WHERE k < 12")
        .head().getLong(0) === 9L)
      val all = spark.read.format("graft").load(base)
      assert(all.count() === 37L)
      assert(all.filter(col("k") % 4 === 1).count() === 7L)
      // filters still prune to the implicated files on the clean leg +
      // dv leg union (plan sanity: the union is present)
      val plan = spark.sql(s"SELECT * FROM $t WHERE k IN (1, 2)")
        .queryExecution.optimizedPlan.toString()
      assert(plan.contains("Union"), plan)
      // manifest count(*): answered as LocalScan, dv-subtracted
      val agg = spark.sql(s"SELECT count(*) AS n FROM $t")
      assert(agg.head().getLong(0) === 37L)
      assert(agg.queryExecution.executedPlan.toString()
        .contains("LocalTableScan"))
      // min/max is NOT manifest-answered with a dv present (the
      // extremum may be soft-deleted) but still computes correctly
      val mm = spark.sql(s"SELECT min(k) AS lo, max(k) AS hi FROM $t")
      assert(!mm.queryExecution.executedPlan.toString()
        .contains("LocalTableScan"))
      assert(mm.head().toSeq === Seq(0L, 39L))
      // streaming snapshot applies the vectors (stream-static anti-join)
      val outDir = TempDirs.scoped("dv_stream_out")
      val cp = TempDirs.scoped("dv_stream_cp")
      spark.readStream.format("graft").load(base)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(120000)
      val streamed = spark.read.parquet(outDir)
      assert(streamed.count() === 37L)
      assert(streamed.filter(col("k").isin(1L, 5L, 9L)).count() === 0L)
    } finally {
      spark.conf.unset("spark.graft.delete.mode")
      spark.sql(s"DROP TABLE $t")
    }
  }
}
