package graft.operators

import java.nio.file.{Files, Paths}
import java.util.concurrent.{Callable, Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

/** GENUINELY CONCURRENT writers (r13) — unlike the scripted hook races
  * (ConflictAndFeaturesSpec / LogStoreSpec), these drive N live JVM
  * threads through the full commit protocol simultaneously: real
  * interleavings of snapshot-pin, data write, publish, lost-race
  * republish/rebase. What a multi-writer deployment (many jobs
  * appending to one 100 TB table) actually exercises.
  *
  * Invariants pinned:
  *  - NO LOST COMMIT: every writer's rows are present exactly once.
  *  - CONTIGUOUS HISTORY: versions 1..head all exist and parse.
  *  - SERIALIZABLE DELETES: concurrent overlapping deletes end in a
  *    state equal to SOME serial order (here: both fully applied).
  */
class ConcurrentWritersSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "ord", "v")
  }

  private def inThreads[A](n: Int)(body: Int => A): Seq[A] = {
    val pool = Executors.newFixedThreadPool(n)
    try {
      val fs = (0 until n).map { t =>
        pool.submit(new Callable[A] { override def call(): A = body(t) })
      }
      fs.map(_.get(300, TimeUnit.SECONDS))
    } finally { pool.shutdownNow(); () }
  }

  test("8 live threads x 4 appends each: no lost commit, contiguous log") {
    val base = TempDirs.scoped("vt_live_appends")
    VersionedTable.commitAppend(spark, base,
      kv(Seq((0L, 0L, 0L))).coalesce(1), statsCols = Seq("k"))
    inThreads(8) { t =>
      (1 to 4).foreach { i =>
        VersionedTable.commitAppend(spark, base,
          kv(Seq((t * 100L + i, t.toLong, i.toLong))).coalesce(1),
          statsCols = Seq("k"), maxAttempts = 64)
      }
    }
    val df = VersionedTable.readLatest(spark, base)
    assert(df.count() === 33L)
    // exactly once: every (thread, i) row present once
    assert(df.select(col("k")).distinct().count() === 33L)
    // contiguous, parseable history: 33 commits, no gaps, no orphans
    assert(VersionedTable.latestVersion(base) === Some(33L))
    (1L to 33L).foreach { v =>
      val (op, adds, _) = VersionedTable.commitDelta(base, v)
      assert(op === "append" && adds.nonEmpty, s"version $v")
    }
    // the log replays at head to the same 33 live files
    assert(VersionedTable.entries(base, 33L).size === 33)
  }

  test("4 live threads deleting DISJOINT bins: all four apply, footprints honored") {
    val base = TempDirs.scoped("vt_live_disjoint")
    (0L until 8L).foreach { bin =>
      VersionedTable.commitAppend(spark, base,
        kv(Seq.tabulate(10)(i => (bin * 10 + i, 1L, bin))).coalesce(1),
        statsCols = Seq("k"))
    }
    inThreads(4) { t =>
      val lo = t * 20L
      VersionedTable.commitDelete(spark, base,
        col("k") >= lo && col("k") <= lo + 9L,
        pruneRanges = Seq(("k", lo, lo + 9L)),
        statsCols = Seq("k"), maxAttempts = 64)
    }
    val ks = VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    // bins 0,2,4,6 deleted; 1,3,5,7 intact
    assert(ks === (0L until 80L).filter(k => (k / 10L) % 2L == 1L))
    assert(VersionedTable.latestVersion(base) === Some(12L))
  }

  test("2 live threads with OVERLAPPING deletes: serializable outcome") {
    val base = TempDirs.scoped("vt_live_overlap")
    VersionedTable.commitAppend(spark, base,
      kv(Seq.tabulate(10)(i => (i.toLong, 1L, 0L))).coalesce(1),
      statsCols = Seq("k"))
    inThreads(2) { t =>
      // both target the same single file: evens vs k>=5
      val pred = if (t == 0) col("k") % 2L === 0L else col("k") >= 5L
      VersionedTable.commitDelete(spark, base, pred,
        pruneRanges = Seq(("k", 0L, 9L)),
        statsCols = Seq("k"), maxAttempts = 64)
    }
    // either serial order leaves exactly the odd keys below 5
    val ks = VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ks === Seq(1L, 3L))
  }

  test("readers during a live write storm see only committed snapshots") {
    val base = TempDirs.scoped("vt_live_readers")
    (0 until 10).foreach { i =>
      VersionedTable.commitAppend(spark, base,
        kv(Seq((i.toLong, 0L, 0L))).coalesce(1), statsCols = Seq("k"))
    } // v1..v10, one row per version: rows-at-v == v, always
    @volatile var writersDone = false
    val results = inThreads(4) { t =>
      if (t < 3) {
        // 3 writers, 5 single-row appends each, racing live
        (1 to 5).foreach { i =>
          VersionedTable.commitAppend(spark, base,
            kv(Seq((100L * t + i, t.toLong, i.toLong))).coalesce(1),
            statsCols = Seq("k"), maxAttempts = 64)
        }
        if (t == 0) writersDone = true
        Seq.empty[(Long, Long)]
      } else {
        // the reader: every observation must be SOME committed
        // snapshot — rows-at-version == version, by construction.
        // Torn reads (a manifest visible before its files, a replay
        // mixing two commits) would break the equality.
        val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        while (!writersDone || seen.size < 10) {
          val v = VersionedTable.latestVersion(base).get
          seen += ((v, VersionedTable.readVersion(spark, base, v).count()))
        }
        seen.toSeq
      }
    }
    val observed = results.flatten
    assert(observed.nonEmpty)
    observed.foreach { case (v, n) =>
      assert(n === v, s"read at version $v saw $n rows — a torn snapshot")
    }
    // and the storm itself lost nothing
    assert(VersionedTable.latestVersion(base) === Some(25L))
    assert(VersionedTable.readLatest(spark, base).count() === 25L)
  }

  test("append threads racing a live RENAME: schema never resurrects the old name") {
    val base = TempDirs.scoped("vt_live_rename")
    VersionedTable.commitAppend(spark, base,
      kv(Seq((0L, 0L, 0L))).coalesce(1), statsCols = Seq("k"))
    inThreads(4) { t =>
      if (t == 0) VersionedTable.alterRenameColumn(base, "v", "val",
        maxAttempts = 64)
      else (1 to 3).foreach { i =>
        // subset-schema appends (no `v`/`val` column at all) race the
        // rename from both sides of it: a loser pinned pre-rename
        // must RE-EXECUTE, never republish its stale declared schema
        // — the r12 hole minted the renamed-away name a fresh id and
        // resurrected it as a spurious all-null visible column
        VersionedTable.commitAppend(spark, base,
          kv(Seq((t * 100L + i, t.toLong, 0L)))
            .select(col("k"), col("ord")).coalesce(1),
          statsCols = Seq("k"), maxAttempts = 64)
      }
    }
    val head = VersionedTable.latestVersion(base).get
    val vis = ColumnMapping.visible(
      VersionedTable.declaredSchema(base, head).get).fieldNames.toSeq
    // the rename held: no spurious all-null `v` column alongside `val`
    assert(vis === Seq("k", "ord", "val"))
    val df = VersionedTable.readLatest(spark, base)
    assert(df.columns.toSeq === Seq("k", "ord", "val"))
    // no lost append either: 1 seed + 9 racing appends
    assert(df.count() === 10L)
  }
}
