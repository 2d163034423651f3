package graft.operators

import java.nio.file.{Files, Paths}

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "ord", "v")
  }

  test("merge commits time-travel: each version is the argmax of its prefix") {
    val base = TempDirs.scoped("vt_merge")
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 10L, 100L), (2L, 10L, 200L))), "k", Seq("ord"))
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 20L, 111L), (3L, 5L, 300L))), "k", Seq("ord"))
    // late-arriving older row for k=1: must NOT displace ord=20
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 15L, 999L))), "k", Seq("ord"))
    assert(VersionedTable.latestVersion(base) === Some(3L))
    def state(v: Long): Map[Long, (Long, Long)] =
      VersionedTable.readVersion(spark, base, v)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(state(1) === Map(1L -> (10L, 100L), 2L -> (10L, 200L)))
    assert(state(2) === Map(1L -> (20L, 111L), 2L -> (10L, 200L), 3L -> (5L, 300L)))
    assert(state(3) === Map(1L -> (20L, 111L), 2L -> (10L, 200L), 3L -> (5L, 300L)))
    assert(VersionedTable.readLatest(spark, base).count() === 3L)
  }

  test("append commits share immutable delta files across manifests") {
    val base = TempDirs.scoped("vt_append")
    VersionedTable.commitAppend(spark, base, kv(Seq((1L, 1L, 1L))))
    VersionedTable.commitAppend(spark, base, kv(Seq((2L, 2L, 2L))))
    assert(VersionedTable.readVersion(spark, base, 1).count() === 1L)
    assert(VersionedTable.readVersion(spark, base, 2).count() === 2L)
    // v2's manifest must reference v1's files, not copy them: exactly
    // two data dirs exist on disk
    val dataDirs = Files.list(Paths.get(base)).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    dataDirs.forEachRemaining(p => names += p.getFileName.toString)
    assert(names.count(_.startsWith("d")) === 2)
  }

  test("crash between data write and publish leaves the table unchanged") {
    val base = TempDirs.scoped("vt_crash")
    VersionedTable.commitAppend(spark, base, kv(Seq((1L, 1L, 1L))))
    // simulate the crash: a fully written data dir with NO manifest
    kv(Seq((9L, 9L, 9L))).write.parquet(s"$base/d2")
    assert(VersionedTable.latestVersion(base) === Some(1L))
    assert(VersionedTable.readLatest(spark, base).count() === 1L)
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, base, 2)
    }
    // the retry after the crash must self-heal over the orphan d2 dir
    // (ErrorIfExists would wedge the table on it forever)
    VersionedTable.commitAppend(spark, base, kv(Seq((2L, 2L, 2L))))
    assert(VersionedTable.latestVersion(base) === Some(2L))
    assert(VersionedTable.readVersion(spark, base, 2)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("publishing an already-committed version fails loudly") {
    // the lost-race shape: two writers compute next=2, both publish —
    // exactly one wins; the loser gets a conflict, never a silent
    // replace (rename() on POSIX would replace; the hard link cannot)
    val base = TempDirs.scoped("vt_conflict")
    VersionedTable.publish(base, 2L, "#op=append\nd2/part-0.parquet\n")
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.publish(base, 2L, "#op=append\nd2b/part-0.parquet\n")
    }
    // the winner's manifest is untouched by the failed publish
    val body = new String(Files.readAllBytes(
      Paths.get(base, "_log", f"${2L}%020d.commit")), "UTF-8")
    assert(body.contains("d2/part-0.parquet"))
    // and no temp litter remains in the log dir
    val leftovers = Files.list(Paths.get(base, "_log")).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    leftovers.forEachRemaining(p => names += p.getFileName.toString)
    assert(names.forall(!_.startsWith(".tmp")))
  }

  test("changesBetween: inserts/updates tagged, unchanged keys silent, deletes via reversal") {
    val base = TempDirs.scoped("vt_cdc")
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 10L, 100L), (2L, 10L, 200L))), "k", Seq("ord"))
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 20L, 111L), (3L, 5L, 300L))), "k", Seq("ord"))
    // late-arriving older row: displaces nothing -> empty change feed
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 15L, 999L))), "k", Seq("ord"))
    val c12 = VersionedTable.changesBetween(spark, base, 1L, 2L, "k")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type"))
      .toMap
    assert(c12 === Map(1L -> "update", 3L -> "insert")) // k=2 unchanged, silent
    assert(VersionedTable.changesBetween(spark, base, 2L, 3L, "k").count() === 0L)
    // a dropped key reads as delete when diffing backwards
    val back = VersionedTable.changesBetween(spark, base, 2L, 1L, "k")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type"))
      .toMap
    assert(back(3L) === "delete")
  }

  test("vacuum drops stranded merge states and orphans, keeps retained versions") {
    val base = TempDirs.scoped("vt_vacuum")
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 10L, 100L), (2L, 10L, 200L))), "k", Seq("ord"))
    VersionedTable.commitMerge(spark, base,
      kv(Seq((3L, 5L, 300L))), "k", Seq("ord"))
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 20L, 111L))), "k", Seq("ord"))
    // crash debris: a data dir no manifest references
    kv(Seq((9L, 9L, 9L))).write.parquet(s"$base/d99")
    val stranded = (1L to 2L).flatMap(v =>
      VersionedTable.entries(base, v).map(_.path))
    val deleted = VersionedTable.vacuum(base, retainFrom = 3L)
    // copy-on-write merge strands v1/v2 state dirs + the orphan
    assert(stranded.nonEmpty && stranded.forall(deleted.contains))
    assert(deleted.exists(_.startsWith("d99/")))
    assert(VersionedTable.latestVersion(base) === Some(3L))
    assert(VersionedTable.readVersion(spark, base, 3).count() === 3L)
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, base, 2) // cleanly gone, not dangling
    }
    assert(!Files.exists(Paths.get(base, "d99")))
  }

  test("vacuum on an append-only history deletes no data files") {
    val base = TempDirs.scoped("vt_vacuum_append")
    VersionedTable.commitAppend(spark, base, kv(Seq((1L, 1L, 1L))))
    VersionedTable.commitAppend(spark, base, kv(Seq((2L, 2L, 2L))))
    val deleted = VersionedTable.vacuum(base, retainFrom = 2L)
    // v2's manifest carries v1's files forward -> only marker 1 goes
    assert(deleted.forall(_.startsWith("_log/")))
    assert(VersionedTable.readVersion(spark, base, 2).count() === 2L)
  }

  test("zone maps: stats written at commit, carried forward verbatim on append") {
    val base = TempDirs.scoped("vt_stats")
    VersionedTable.commitAppend(spark, base,
      kv(Seq((1L, 1L, 10L), (5L, 1L, 50L))).coalesce(1), statsCols = Seq("k"))
    VersionedTable.commitAppend(spark, base,
      kv(Seq((100L, 2L, 1L))).coalesce(1), statsCols = Seq("k"))
    val e1 = VersionedTable.entries(base, 1L)
    assert(e1.size === 1 &&
      e1.head.stats("k") === VersionedTable.ColStats(1L, 5L))
    val e2 = VersionedTable.entries(base, 2L)
    assert(e2.size === 2)
    // v1's line is carried forward with its stats intact (O(delta))
    assert(e2.find(_.path == e1.head.path).get.stats ===
      e1.head.stats)
    assert(e2.find(_.path != e1.head.path).get.stats("k") ===
      VersionedTable.ColStats(100L, 100L))
  }

  test("pruned read: equality with the full read, strictly fewer files opened") {
    val base = TempDirs.scoped("vt_prune")
    // three one-file commits with disjoint key ranges
    Seq(Seq((1L, 1L, 1L), (9L, 1L, 2L)), Seq((10L, 1L, 3L), (19L, 1L, 4L)),
        Seq((20L, 1L, 5L), (29L, 1L, 6L)))
      .foreach(rows => VersionedTable.commitAppend(
        spark, base, kv(rows).coalesce(1), statsCols = Seq("k")))
    val v = VersionedTable.latestVersion(base).get
    val ranges = Seq(("k", 10L, 19L))
    val kept = VersionedTable.prune(VersionedTable.entries(base, v), ranges)
    assert(kept.size === 1 && VersionedTable.entries(base, v).size === 3)
    // the file-level skip loses no satisfying row vs the full read
    val full = VersionedTable.readVersion(spark, base, v)
      .filter(col("k").between(10L, 19L)).collect().map(_.getLong(0)).sorted
    val pruned = VersionedTable.readVersionPruned(spark, base, v, ranges)
      .filter(col("k").between(10L, 19L)).collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === full.toSeq && full.toSeq === Seq(10L, 19L))
    // every file skipped → schema-preserving empty frame
    val none = VersionedTable.readVersionPruned(
      spark, base, v, Seq(("k", 1000L, 2000L)))
    assert(none.count() === 0L && none.columns.toSeq === Seq("k", "ord", "v"))
    // a file without stats for the column is never skipped
    val noStats = VersionedTable.prune(
      Seq(VersionedTable.ManifestEntry("dX/f.parquet", Map.empty)), ranges)
    assert(noStats.size === 1)
  }

  test("stats columns must be integral and manifest-safe") {
    val base = TempDirs.scoped("vt_statcols")
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(spark, base,
        Seq(("a", 1L)).toDF("name", "k"), statsCols = Seq("name"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(spark, base,
        Seq((1L, 1L)).toDF("a=b", "k"), statsCols = Seq("a=b"))
    }
  }

  test("lost race rebases and retries: both committers succeed, state = serial") {
    val base = TempDirs.scoped("vt_race")
    // writer B lands BETWEEN writer A's merge computation and A's
    // publish (the hook runs pre-publish on attempt 1 only): A must
    // fail its first publish, rebase onto B's state, and win at v2
    // WITHOUT dropping B's rows — the lost-update window is closed by
    // pinning the snapshot version, not just by the retry
    var bVersion = -1L
    val aVersion = VersionedTable.commitMergeHooked(spark, base,
      kv(Seq((1L, 10L, 100L), (2L, 10L, 200L))), "k", Seq("ord"),
      Nil, 5) { attempt =>
      if (attempt == 1)
        bVersion = VersionedTable.commitMerge(spark, base,
          kv(Seq((2L, 20L, 222L), (3L, 10L, 300L))), "k", Seq("ord"))
    }
    assert(bVersion === 1L && aVersion === 2L)
    val state = VersionedTable.readLatest(spark, base)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // == argmax of the union == either serial order (associativity)
    assert(state === Map(1L -> (10L, 100L), 2L -> (20L, 222L),
      3L -> (10L, 300L)))
    // bounded attempts: a permanently contended table fails loudly
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.commitMergeHooked(spark, base,
        kv(Seq((9L, 1L, 9L))), "k", Seq("ord"), Nil, 2) { _ =>
        VersionedTable.commitMerge(spark, base,
          kv(Seq((8L, 1L, 8L))), "k", Seq("ord"))
      }
    }
  }

  test("compact: small-file debt repaid, data identical, history intact") {
    val base = TempDirs.scoped("vt_compact")
    // eight 1-file appends = the small-file debt a batch pipeline accrues
    (1L to 8L).foreach(i => VersionedTable.commitAppend(
      spark, base, kv(Seq((i, 1L, i * 10))).coalesce(1), statsCols = Seq("k")))
    val before = VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(VersionedTable.entries(base, 8L).size === 8)
    val v = VersionedTable.compact(spark, base, numFiles = 2,
      statsCols = Seq("k"))
    assert(v === 9L && VersionedTable.entries(base, v).size === 2)
    val after = VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after === before)
    // time travel to the pre-compaction snapshot still works...
    assert(VersionedTable.readVersion(spark, base, 8L).count() === 8L)
    // ...until retention passes, when vacuum reclaims the small files
    val deleted = VersionedTable.vacuum(base, retainFrom = 9L)
    assert(deleted.count(_.endsWith(".parquet")) >= 8)
    assert(VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq === before)
  }

  test("optimize: z-order rewrite makes pruning bite where insert order cannot") {
    val base = TempDirs.scoped("vt_optimize")
    // interleaved appends: every file spans the whole key domain, so
    // zone maps prune nothing on the raw layout
    (0L until 4L).foreach { i =>
      VersionedTable.commitAppend(spark, base,
        kv((0L until 64L).map(k => (k * 4 + i, 1L, k))).coalesce(1),
        statsCols = Seq("k"))
    }
    val vRaw = VersionedTable.latestVersion(base).get
    val ranges = Seq(("k", 0L, 31L))
    val rawKept = VersionedTable.prune(
      VersionedTable.entries(base, vRaw), ranges).size
    assert(rawKept === 4, "insert-order layout must be unprunable here")
    val v = VersionedTable.optimize(spark, base, ("k", "v"), numFiles = 4)
    val es = VersionedTable.entries(base, v)
    assert(es.size === 4)
    val kept = VersionedTable.prune(es, ranges)
    assert(kept.size < rawKept,
      s"z-order must open fewer files: ${kept.size} vs $rawKept")
    // the pruned read still returns every satisfying row
    val full = VersionedTable.readVersion(spark, base, v)
      .filter(col("k").between(0L, 31L)).collect().map(_.getLong(0)).sorted
    val pruned = VersionedTable.readVersionPruned(spark, base, v, ranges)
      .filter(col("k").between(0L, 31L)).collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === full.toSeq && full.length === 32)
  }

  test("commitDelete rewrites only zone-map-touched files; history + vacuum honest") {
    val base = TempDirs.scoped("vt_delete")
    // four one-file commits with disjoint key decades
    Seq(0L, 10L, 20L, 30L).foreach(lo => VersionedTable.commitAppend(
      spark, base, kv((lo until lo + 10L).map(k => (k, 1L, k * 2))).coalesce(1),
      statsCols = Seq("k")))
    val es4 = VersionedTable.entries(base, 4L)
    // delete one decade: only its file may be rewritten
    val v = VersionedTable.commitDelete(spark, base,
      col("k").between(10L, 19L), pruneRanges = Seq(("k", 10L, 19L)),
      statsCols = Seq("k"))
    assert(v === 5L)
    val es5 = VersionedTable.entries(base, 5L)
    // the three untouched files are carried forward VERBATIM (stats too)
    val untouched = es4.filterNot(_.stats("k") ==
      VersionedTable.ColStats(10L, 19L))
    assert(untouched.size === 3 && untouched.forall(es5.contains))
    assert(!es5.exists(_.stats.get("k").contains(
      VersionedTable.ColStats(10L, 19L))))
    // data: the decade is gone, everything else intact
    assert(VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq ===
      ((0L until 10L) ++ (20L until 40L)))
    // snapshot-then-erase: the old version still shows the rows...
    assert(VersionedTable.readVersion(spark, base, 4L).count() === 40L)
    // ...until vacuum passes retention
    VersionedTable.vacuum(base, retainFrom = 5L)
    intercept[Exception] { VersionedTable.readVersion(spark, base, 4L).count() }
    assert(VersionedTable.readLatest(spark, base).count() === 30L)
    // provable no-op: a delete whose footprint no zone map overlaps
    // commits NOTHING (no new version, no rewrite)
    val v2 = VersionedTable.commitDelete(spark, base,
      col("k").between(500L, 600L), pruneRanges = Seq(("k", 500L, 600L)))
    assert(v2 === 5L && VersionedTable.latestVersion(base) === Some(5L))
  }

  test("history: one (version, op, n_files) row per surviving commit") {
    val base = TempDirs.scoped("vt_history")
    assert(VersionedTable.history(base) === Seq.empty)
    VersionedTable.commitAppend(spark, base,
      kv(Seq((1L, 1L, 1L))).coalesce(1), statsCols = Seq("k"))
    VersionedTable.commitAppend(spark, base, kv(Seq((2L, 1L, 2L))).coalesce(1))
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 2L, 9L))), "k", Seq("ord"))
    val h = VersionedTable.history(base)
    assert(h.map(t => (t._1, t._2)) ===
      Seq((1L, "append"), (2L, "append"), (3L, "merge")))
    assert(h(0)._3 === 1 && h(1)._3 === 2) // append carries v1's file
    // vacuum drops the early manifests; history shows what survives
    VersionedTable.vacuum(base, retainFrom = 3L)
    assert(VersionedTable.history(base).map(_._1) === Seq(3L))
  }

  test("empty table read fails with a clear error") {
    val base = TempDirs.scoped("vt_empty")
    intercept[IllegalArgumentException] {
      VersionedTable.readLatest(spark, base)
    }
    assert(VersionedTable.latestVersion(base) === None)
  }
}
