package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** WRITABLE BRANCHES — the write-audit-publish workflow (r16):
  * stage commits on a zero-copy branch, audit its head, publish with
  * an atomic fast-forward. These specs pin the lifecycle legs the
  * q203 oracle can't: the concurrent-writer conflict (both the static
  * fork-stale refusal and the lost publish race, via the hook seam),
  * vacuum respecting a live branch's fork snapshot, and the
  * rolled-back-moves invariant (a refused publish leaves the branch
  * readable and writable).
  */
class BranchSpec extends SparkSuite {

  private def tmp(tag: String) = graft.TempDirs.scoped(s"graft_branch_$tag")

  private def df(rows: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "v")
  }

  test("stage-audit-publish: branch diverges while main is unchanged; " +
      "fast-forward lands the branch state as ONE commit and consumes " +
      "the branch") {
    val base = tmp("wap")
    VersionedTable.commitAppend(spark, base, df((1L to 10L).map(k => (k, k))),
      statsCols = Seq("k"))
    val forkV = VersionedTable.createBranch(spark, base, "stage")
    assert(forkV === 1L)
    assert(VersionedTable.branches(base) === Map("stage" -> 1L))
    val bb = VersionedTable.branchBase(base, "stage")
    // stage two commits on the branch: an append and a delete
    VersionedTable.commitAppend(spark, bb,
      df((11L to 15L).map(k => (k, k * 2L))))
    VersionedTable.commitDelete(spark, bb, col("k") === 3L,
      pruneRanges = Seq(("k", 3L, 3L)))
    // audit the branch head (the WAP gate = plain reads of the branch)
    // — materialized NOW: the consuming publish moves these files
    val staged = VersionedTable.readLatest(spark, bb).collect().toSet
    assert(staged.size === 14)
    // main is untouched while the branch diverges
    assert(VersionedTable.readLatest(spark, base).count() === 10L)
    assert(VersionedTable.latestVersion(base) === Some(1L))
    // publish: exactly one new main version; state == branch head
    val v = VersionedTable.fastForward(spark, base, "stage")
    assert(v === 2L)
    assert(VersionedTable.latestVersion(base) === Some(2L))
    val main = VersionedTable.readLatest(spark, base).collect().toSet
    assert(main.size === 14)
    assert(main === staged,
      "post-publish main must equal the branch head exactly")
    val (op, _, _) = VersionedTable.commitDelta(base, 2L)
    assert(op === "fast_forward")
    // consumed: branch gone, clone tag released
    assert(VersionedTable.branches(base).isEmpty)
    assert(!VersionedTable.tags(base).keys.exists(_.startsWith("clone-")))
    // main stays fully operational (appends see the branch's rows)
    VersionedTable.commitAppend(spark, base, df(Seq((100L, 1L))))
    assert(VersionedTable.readLatest(spark, base).count() === 15L)
  }

  test("conflict: main advancing past the fork refuses the publish — " +
      "main untouched, branch intact and still writable") {
    val base = tmp("conflict")
    VersionedTable.commitAppend(spark, base, df(Seq((1L, 1L))))
    VersionedTable.createBranch(spark, base, "b")
    val bb = VersionedTable.branchBase(base, "b")
    VersionedTable.commitAppend(spark, bb, df(Seq((2L, 2L))))
    // a concurrent writer advances MAIN after the fork
    VersionedTable.commitAppend(spark, base, df(Seq((3L, 3L))))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.fastForward(spark, base, "b")
    }
    assert(e.getMessage.contains("advanced"))
    assert(VersionedTable.latestVersion(base) === Some(2L))
    assert(VersionedTable.readLatest(spark, base).count() === 2L)
    // the branch survives, readable and writable
    assert(VersionedTable.readLatest(spark, bb).count() === 2L)
    VersionedTable.commitAppend(spark, bb, df(Seq((4L, 4L))))
    assert(VersionedTable.readLatest(spark, bb).count() === 3L)
    VersionedTable.dropBranch(base, "b")
    assert(VersionedTable.branches(base).isEmpty)
  }

  test("LOST PUBLISH RACE (hook seam): a writer slipping in between " +
      "the fork check and the publish refuses cleanly — moved data " +
      "dirs roll back, the branch stays readable") {
    val base = tmp("race")
    VersionedTable.commitAppend(spark, base, df(Seq((1L, 1L))))
    VersionedTable.createBranch(spark, base, "r")
    val bb = VersionedTable.branchBase(base, "r")
    VersionedTable.commitAppend(spark, bb, df(Seq((2L, 2L))))
    val staged = VersionedTable.readLatest(spark, bb).collect().toSet
    val e = intercept[IllegalStateException] {
      VersionedTable.fastForwardHooked(spark, base, "r") { () =>
        // the racing writer wins version 2 INSIDE the window
        VersionedTable.commitAppend(spark, base, df(Seq((9L, 9L))))
      }
    }
    assert(e.getMessage.contains("concurrent writer"))
    // main holds exactly the racer's commit; branch rolled back whole
    assert(VersionedTable.readLatest(spark, base).collect().map(
      _.getLong(0)).toSet === Set(1L, 9L))
    assert(VersionedTable.readLatest(spark, bb).collect().toSet === staged)
    assert(VersionedTable.branches(base).keySet === Set("r"))
  }

  test("vacuum respects branch refs: a main rewrite + vacuum past the " +
      "fork keeps the fork snapshot's files (the clone tag pin) — the " +
      "branch still reads its full state") {
    val base = tmp("vac")
    VersionedTable.commitAppend(spark, base,
      df((1L to 8L).map(k => (k, k))), statsCols = Seq("k"))
    VersionedTable.createBranch(spark, base, "keep")
    val bb = VersionedTable.branchBase(base, "keep")
    VersionedTable.commitAppend(spark, bb, df(Seq((100L, 1L))))
    // main rewrites itself completely (compact drops v1's files from
    // the live set), then vacuums history below the rewrite
    VersionedTable.compact(spark, base, 1)
    val deleted = VersionedTable.vacuum(base, retainFrom = 2L)
    // the fork snapshot's data files survive (only markers may go)
    assert(!deleted.exists(_.endsWith(".parquet")),
      s"vacuum must not delete the branch's fork files, deleted: $deleted")
    assert(VersionedTable.readLatest(spark, bb).count() === 9L)
    // dropping the branch releases the pin; the next vacuum reclaims
    VersionedTable.dropBranch(base, "keep")
    val deleted2 = VersionedTable.vacuum(base, retainFrom = 2L)
    assert(deleted2.exists(_.endsWith(".parquet")),
      "post-drop vacuum should reclaim the fork snapshot's files")
    assert(VersionedTable.readLatest(spark, base).count() === 8L)
  }

  test("vacuum racing the move-to-publish window (r16 advice): moved " +
      "branch dirs are re-homed ahead-of-log with a re-armed mtime, so " +
      "an hours-old staged branch survives a concurrent vacuum") {
    import scala.jdk.CollectionConverters._
    val base = tmp("vacrace")
    VersionedTable.commitAppend(spark, base, df(Seq((1L, 1L))))
    VersionedTable.createBranch(spark, base, "old")
    val bb = VersionedTable.branchBase(base, "old")
    VersionedTable.commitAppend(spark, bb, df((2L to 6L).map(k => (k, k))))
    // simulate the normal WAP audit window: the branch was staged hours
    // ago, so every branch-local data dir's mtime is past the vacuum
    // attempt-retention gate (rename preserves mtime — without the
    // re-arm the moved dirs would be immediately sweepable)
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 7200000L)
    val st = java.nio.file.Files.list(java.nio.file.Paths.get(bb))
    try st.iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("d"))
      .foreach(p => java.nio.file.Files.setLastModifiedTime(p, old))
    finally st.close()
    val v = VersionedTable.fastForwardHooked(spark, base, "old") { () =>
      // vacuum races the window between the dir moves and the publish:
      // the moved dirs are unreferenced by any manifest right now
      VersionedTable.vacuum(base, retainFrom = 1L)
    }
    assert(v === 2L)
    // publish committed a manifest whose files all exist — the read
    // proves the racing vacuum deleted nothing the commit references
    assert(VersionedTable.readLatest(spark, base).collect()
      .map(_.getLong(0)).toSet === (1L to 6L).toSet)
  }

  test("never-diverged branch: fast-forward is a provable no-op that " +
      "still consumes the branch") {
    val base = tmp("noop")
    VersionedTable.commitAppend(spark, base, df(Seq((1L, 1L))))
    VersionedTable.createBranch(spark, base, "idle")
    assert(VersionedTable.fastForward(spark, base, "idle") === 1L)
    assert(VersionedTable.latestVersion(base) === Some(1L))
    assert(VersionedTable.branches(base).isEmpty)
  }

  test("branch via SQL procedures: create_branch / fast_forward / " +
      "drop_branch round-trip through CALL graft.system.*") {
    val s = spark
    import s.implicits._
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val ns = s"br${System.nanoTime() % 1000000}"
    Seq((1L, 1L), (2L, 2L)).toDF("k", "v").write.format("graft")
      .mode("append").save(s"$wh/$ns/t")
    val fork = spark.sql(
      s"CALL graft.system.create_branch('$ns.t', 'stage', 0)")
      .head().getLong(0)
    assert(fork === 1L)
    Seq((3L, 3L)).toDF("k", "v").write.format("graft")
      .mode("append").save(s"$wh/$ns/t/_branches/stage")
    val v = spark.sql(
      s"CALL graft.system.fast_forward('$ns.t', 'stage')")
      .head().getLong(0)
    assert(v === 2L)
    assert(spark.table(s"graft.$ns.t").count() === 3L)
    // a second branch dropped without publishing leaves main at v2
    spark.sql(s"CALL graft.system.create_branch('$ns.t', 'junk', 0)")
    spark.sql(s"CALL graft.system.drop_branch('$ns.t', 'junk')")
    assert(VersionedTable.latestVersion(s"$wh/$ns/t") === Some(2L))
  }
}
