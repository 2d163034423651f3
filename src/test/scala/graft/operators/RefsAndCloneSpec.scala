package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

/** NAMED REFS (r13): immutable tags that resolve by name and protect
  * their snapshots from vacuum (the Iceberg refs contract), and
  * SHALLOW CLONES — zero-copy writable branches whose first commit
  * references the source's data files (the Delta CLONE shape), safe
  * against source-side vacuum through an auto-created tag.
  */
class RefsAndCloneSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "ord", "v")
  }

  private def binned(base: String, bins: Long = 4L): Unit =
    (0L until bins).foreach { bin =>
      VersionedTable.commitAppend(spark, base,
        kv(Seq.tabulate(10)(i => (bin * 10 + i, 1L, bin))).coalesce(1),
        statsCols = Seq("k"))
    }

  test("tags: create, resolve by name, read through DSv2, immutable") {
    val base = TempDirs.scoped("refs_tags")
    binned(base) // v1..v4: 10, 20, 30, 40 rows
    VersionedTable.createTag(base, "rc1", 2L)
    assert(VersionedTable.tags(base) === Map("rc1" -> 2L))
    assert(VersionedTable.resolveRef(base, "rc1") === 2L)
    assert(VersionedTable.readRef(spark, base, "rc1").count() === 20L)
    // DSv2 read option
    assert(spark.read.format("graft").option("ref", "rc1")
      .load(base).count() === 20L)
    // immutable: re-tagging refuses, the pin is unchanged
    intercept[IllegalArgumentException] {
      VersionedTable.createTag(base, "rc1", 3L)
    }
    assert(VersionedTable.resolveRef(base, "rc1") === 2L)
    // unknown names refuse loudly; bad names refuse
    intercept[IllegalArgumentException] {
      VersionedTable.resolveRef(base, "nope")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.createTag(base, "a/b", 1L)
    }
    // drop releases the name
    VersionedTable.dropTag(base, "rc1")
    assert(VersionedTable.tags(base).isEmpty)
    VersionedTable.createTag(base, "rc1", 3L)
    assert(VersionedTable.readRef(spark, base, "rc1").count() === 30L)
  }

  test("vacuum retains a tagged snapshot; dropping the tag releases it") {
    val base = TempDirs.scoped("refs_vacuum")
    binned(base) // v1..v4
    // v5 rewrites bin 0 away: v4's bin-0 file becomes old history
    VersionedTable.commitDelete(spark, base, col("k") <= 9L,
      pruneRanges = Seq(("k", 0L, 9L)), statsCols = Seq("k"))
    VersionedTable.createTag(base, "pinned", 4L)
    val deleted = VersionedTable.vacuum(base, retainFrom = 5L,
      attemptRetentionMs = 0L)
    // the tagged v4 snapshot survives retention whole: files + replay
    assert(VersionedTable.readVersion(spark, base, 4L).count() === 40L)
    assert(VersionedTable.readRef(spark, base, "pinned").count() === 40L)
    // untagged markers below the floor are gone (v1..v3 time travel
    // fails cleanly), the tagged one remains
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, base, 3L).count()
    }
    // head unaffected
    assert(VersionedTable.readLatest(spark, base).count() === 30L)
    // dropping the tag releases the snapshot to the next vacuum
    VersionedTable.dropTag(base, "pinned")
    val deleted2 = VersionedTable.vacuum(base, retainFrom = 5L,
      attemptRetentionMs = 0L)
    assert(deleted2.exists(_.endsWith(".parquet")),
      s"expected the untagged bin-0 file to be reclaimed, got $deleted2")
    assert(VersionedTable.readLatest(spark, base).count() === 30L)
    assert(deleted != null)
  }

  test("shallow clone: zero-copy fork reads the source snapshot, then diverges") {
    val root = TempDirs.scoped("refs_clone_root")
    val src = s"$root/src"
    val tgt = s"$root/branch"
    binned(src) // v1..v4, 40 rows
    val v = VersionedTable.shallowClone(spark, src, tgt)
    assert(v === 1L)
    // zero data copied: the clone dir holds no data dirs at all yet
    val localDirs = {
      val st = Files.list(Paths.get(tgt))
      try st.iterator().asScala.count(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("d"))
      finally st.close()
    }
    assert(localDirs === 0)
    assert(VersionedTable.readLatest(spark, tgt).count() === 40L)
    // the clone op is visible in its history
    assert(VersionedTable.commitDelta(tgt, 1L)._1 === "clone")
    // the source auto-gained a protective tag at the cloned version
    assert(VersionedTable.tags(src).exists { case (n, tv) =>
      n.startsWith("clone-v4-") && tv === 4L })
    // branch diverges: append + CoW delete land LOCALLY
    VersionedTable.commitAppend(spark, tgt,
      kv(Seq((100L, 9L, 9L))).coalesce(1), statsCols = Seq("k"))
    VersionedTable.commitDelete(spark, tgt, col("k") <= 9L,
      pruneRanges = Seq(("k", 0L, 9L)), statsCols = Seq("k"))
    assert(VersionedTable.readLatest(spark, tgt).count() === 31L)
    // ...and the SOURCE never noticed: same head, same rows, and the
    // file the branch 'deleted' still lives in the source dir
    assert(VersionedTable.latestVersion(src) === Some(4L))
    assert(VersionedTable.readLatest(spark, src).count() === 40L)
    assert(VersionedTable.readVersion(spark, src, 4L)
      .filter(col("k") <= 9L).count() === 10L)
    // source writes don't leak into the branch either
    VersionedTable.commitAppend(spark, src,
      kv(Seq((200L, 1L, 1L))).coalesce(1), statsCols = Seq("k"))
    assert(VersionedTable.readLatest(spark, tgt).count() === 31L)
  }

  test("clone survives a source vacuum through its protective tag") {
    val root = TempDirs.scoped("refs_clone_vac")
    val src = s"$root/src"
    val tgt = s"$root/branch"
    binned(src)
    VersionedTable.shallowClone(spark, src, tgt, version = Some(4L))
    // source moves on and rewrites everything the clone references
    VersionedTable.commitDelete(spark, src, col("k") >= 0L,
      pruneRanges = Seq(("k", 0L, 39L)), statsCols = Seq("k"))
    VersionedTable.vacuum(src, retainFrom = 5L, attemptRetentionMs = 0L)
    // the auto-tag kept the cloned snapshot's files alive
    assert(VersionedTable.readLatest(spark, tgt).count() === 40L)
    // severing knowingly: drop the tag, vacuum again, clone breaks
    VersionedTable.tags(src).keys.filter(_.startsWith("clone-"))
      .foreach(VersionedTable.dropTag(src, _))
    VersionedTable.vacuum(src, retainFrom = 5L, attemptRetentionMs = 0L)
    intercept[Exception] {
      VersionedTable.readLatest(spark, tgt).count()
    }
  }

  test("a COLUMN-MAPPED table clones: mapping + colmap feature travel") {
    val root = TempDirs.scoped("refs_clone_mapped")
    val src = s"$root/src"
    val tgt = s"$root/branch"
    binned(src)
    VersionedTable.alterRenameColumn(src, "v", "val")
    VersionedTable.shallowClone(spark, src, tgt)
    // the branch reads under the LOGICAL names (files carry the
    // frozen physical `v` — the mapping metadata traveled)
    val df = VersionedTable.readLatest(spark, tgt)
    assert(df.columns.toSeq === Seq("k", "ord", "val"))
    assert(df.agg(sum(col("val"))).head().getLong(0) ===
      (0L until 4L).map(_ * 10).sum)
    // ...and declares the colmap protocol feature (a mapping-blind
    // reader must refuse, not null-fill)
    assert(VersionedTable.featuresAsOf(tgt, 1L).contains("colmap"))
    // branch DML under the logical names: appends map to the frozen
    // physical, deletes prune through the mapped ranges
    VersionedTable.commitAppend(spark, tgt,
      kv(Seq((100L, 9L, 9L))).toDF("k", "ord", "val").coalesce(1),
      statsCols = Seq("k"))
    VersionedTable.commitDelete(spark, tgt, col("k") <= 9L,
      pruneRanges = Seq(("k", 0L, 9L)), statsCols = Seq("k"))
    assert(VersionedTable.readLatest(spark, tgt).count() === 31L)
    // the source never noticed, and still reads under its own names
    assert(VersionedTable.readLatest(spark, src).count() === 40L)
    assert(VersionedTable.readLatest(spark, src).columns.toSeq ===
      Seq("k", "ord", "val"))
  }

  test("write-audit-publish: curate on a branch, promote atomically") {
    val root = TempDirs.scoped("refs_wap")
    val src = s"$root/src"
    val stage = s"$root/stage"
    binned(src) // 40 rows, v1..v4
    // WRITE: fork a zero-copy staging branch and apply the risky
    // pipeline there — the source serves readers untouched throughout
    VersionedTable.shallowClone(spark, src, stage)
    VersionedTable.commitDelete(spark, stage,
      col("v") === 0L, pruneRanges = Seq(("k", 0L, 9L)),
      statsCols = Seq("k")) // drop a bad bin
    VersionedTable.commitAppend(spark, stage,
      kv(Seq((100L, 9L, 9L), (101L, 9L, 9L))).coalesce(1),
      statsCols = Seq("k"))
    // AUDIT: validate the staged state (the gate a production WAP
    // pipeline runs — counts, constraints, quality checks)
    val staged = VersionedTable.readLatest(spark, stage)
    assert(staged.count() === 32L)
    assert(staged.filter(col("v") === 0L).count() === 0L)
    // PUBLISH: one atomic replace-commit promotes the audited state;
    // readers flip from old to new in a single version step, and the
    // pre-promote state stays time-travelable
    val pv = VersionedTable.commitReplace(spark, src, staged,
      statsCols = Seq("k"))
    assert(pv === 5L)
    val now = VersionedTable.readLatest(spark, src)
    assert(now.count() === 32L &&
      now.filter(col("k") >= 100L).count() === 2L)
    assert(VersionedTable.readVersion(spark, src, 4L).count() === 40L)
  }

  test("clone refusals: DV'd snapshots, nested targets, MoR on cross-base files") {
    val root = TempDirs.scoped("refs_clone_refuse")
    val src = s"$root/src"
    binned(src)
    // constraints travel with the clone
    VersionedTable.addConstraint(spark, src, "k_nonneg", "k >= 0")
    VersionedTable.commitDeleteMoR(spark, src, col("k") === 5L,
      pruneRanges = Seq(("k", 0L, 9L)))
    val dvErr = intercept[IllegalArgumentException] {
      VersionedTable.shallowClone(spark, src, s"$root/b1")
    }
    assert(dvErr.getMessage.contains("deletion vectors"))
    // pre-DV version clones fine
    VersionedTable.shallowClone(spark, src, s"$root/b2",
      version = Some(4L))
    assert(VersionedTable.constraints(s"$root/b2") ===
      Map("k_nonneg" -> "k >= 0"))
    // constraint enforced on the BRANCH
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(spark, s"$root/b2",
        kv(Seq((-1L, 0L, 0L))).coalesce(1))
    }
    // nested target refuses
    intercept[IllegalArgumentException] {
      VersionedTable.shallowClone(spark, src, s"$src/inner")
    }
    // MoR delete on a cross-base (cloned) file refuses, names the cure
    val morErr = intercept[IllegalArgumentException] {
      VersionedTable.commitDeleteMoR(spark, s"$root/b2",
        col("k") === 3L, pruneRanges = Seq(("k", 0L, 9L)))
    }
    assert(morErr.getMessage.contains("copy-on-write"))
    // compaction LOCALIZES the branch: afterwards MoR works
    VersionedTable.compactSmall(spark, s"$root/b2",
      smallBytes = 1L << 40, targetBytes = 1L << 40)
    VersionedTable.commitDeleteMoR(spark, s"$root/b2", col("k") === 3L,
      pruneRanges = Seq(("k", 0L, 39L)))
    assert(VersionedTable.readLatest(spark, s"$root/b2").count() === 39L)
  }
}
