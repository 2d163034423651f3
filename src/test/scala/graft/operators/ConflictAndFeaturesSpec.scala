package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

/** Round-12 commit-protocol hardening:
  *
  *  1. FOOTPRINT-DISJOINT CONFLICT DETECTION — a lost publish race
  *     whose winner touched provably disjoint files/keys REPUBLISHES
  *     the loser's already-written attempt at the new head (one
  *     manifest write) instead of re-executing the whole operation;
  *     true overlap still re-executes (the always-correct path).
  *  2. PROTOCOL FEATURE GATE — `#features=` manifest headers: commits
  *     using deletion vectors / NDV sketches declare them (sticky),
  *     and readers AND writers refuse a table carrying a feature
  *     token this build doesn't implement, loudly and by name.
  */
class ConflictAndFeaturesSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "ord", "v")
  }

  /** 8 one-file commits, k in [bin*10, bin*10+9], zone maps on k. */
  private def binnedTable(base: String): Unit =
    (0L until 8L).foreach { bin =>
      VersionedTable.commitAppend(spark, base,
        kv(Seq.tabulate(10)(i => (bin * 10 + i, 1L, bin))).coalesce(1),
        statsCols = Seq("k"))
    }

  private def dataDirCount(base: String): Int = {
    val st = Files.list(Paths.get(base))
    try st.iterator().asScala.count(p =>
      Files.isDirectory(p) && p.getFileName.toString.startsWith("d"))
    finally st.close()
  }

  test("disjoint DELETE race: loser republishes written files, no re-execution") {
    val base = TempDirs.scoped("vt_disjoint_race")
    binnedTable(base) // v1..v8, 8 data dirs
    assert(dataDirCount(base) === 8)
    // delete A scopes bins 0-1 (k in [0,19]); its pre-publish hook
    // lands delete B on bins 6-7 (k in [60,79]) — footprints disjoint
    var bVersion = -1L
    val aVersion = VersionedTable.commitDeleteHooked(spark, base,
      col("k") <= 19L && col("k") % 2L === 0L,
      pruneRanges = Seq(("k", 0L, 19L)), statsCols = Seq("k")) { () =>
      if (bVersion < 0L)
        bVersion = VersionedTable.commitDelete(spark, base,
          col("k") >= 60L, pruneRanges = Seq(("k", 60L, 79L)),
          statsCols = Seq("k"))
    }
    // B won the pinned version 9; A COMMUTED and republished at 10
    assert(bVersion === 9L && aVersion === 10L)
    // no re-execution: A wrote exactly ONE attempt dir (8 base + A's
    // rewrite of bins 0-1 + B's rewrite — re-executing would strand an
    // abandoned 11th dir)
    assert(dataDirCount(base) === 10)
    // ...and the dir A's manifest references is the one written at the
    // PINNED version (d9-*), published under v10 — the republish, by path
    val (_, aAdds, aRems) = VersionedTable.commitDelta(base, 10L)
    assert(aAdds.nonEmpty && aAdds.forall(_.path.startsWith("d9-")))
    // both deletes fully applied: evens of [0,19] gone, all of [60,79] gone
    val ks = VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ks === (0L until 60L).filterNot(k => k <= 19L && k % 2L == 0L))
    // A removed only its own bins' files; B's removals untouched
    assert(aRems.forall(p => VersionedTable.entries(base, 8L)
      .exists(_.path == p)))
  }

  test("overlapping DELETE race: loser re-derives (no lost update)") {
    val base = TempDirs.scoped("vt_overlap_race")
    binnedTable(base)
    // both deletes hit bin 0: A deletes evens of [0,9], B deletes k>=5
    // of [0,9] — same file, so A's republish would resurrect B's rows
    var bVersion = -1L
    val aVersion = VersionedTable.commitDeleteHooked(spark, base,
      col("k") <= 9L && col("k") % 2L === 0L,
      pruneRanges = Seq(("k", 0L, 9L)), statsCols = Seq("k")) { () =>
      if (bVersion < 0L)
        bVersion = VersionedTable.commitDelete(spark, base,
          col("k") >= 5L && col("k") <= 9L,
          pruneRanges = Seq(("k", 5L, 9L)), statsCols = Seq("k"))
    }
    assert(bVersion === 9L && aVersion === 10L)
    // re-execution leaves A's abandoned pinned-version attempt dir
    // (8 base + B + A's abandoned + A's committed = 11)
    assert(dataDirCount(base) === 11)
    // serializable outcome: only odds < 5 survive in bin 0
    val ks = VersionedTable.readLatest(spark, base)
      .filter(col("k") <= 9L).collect().map(_.getLong(0)).sorted.toSeq
    assert(ks === Seq(1L, 3L))
  }

  test("winner adds matching the loser's predicate: re-derives") {
    val base = TempDirs.scoped("vt_addpred_race")
    binnedTable(base)
    // A deletes k in [0,19]; winner APPENDS a row with k=15 — inside
    // A's predicate footprint, so a republish would silently leak it
    var bVersion = -1L
    val aVersion = VersionedTable.commitDeleteHooked(spark, base,
      col("k") <= 19L,
      pruneRanges = Seq(("k", 0L, 19L)), statsCols = Seq("k")) { () =>
      if (bVersion < 0L)
        bVersion = VersionedTable.commitAppend(spark, base,
          kv(Seq((15L, 2L, 99L))).coalesce(1), statsCols = Seq("k"))
    }
    assert(bVersion === 9L && aVersion === 10L)
    // the re-derived delete saw the winner's k=15 too
    assert(VersionedTable.readLatest(spark, base)
      .filter(col("k") <= 19L).count() === 0L)
  }

  test("append race republishes: blind appends commute with anything") {
    val base = TempDirs.scoped("vt_append_race")
    binnedTable(base)
    // A appends; its hook lands B — a DELETE, the worst case for a
    // blind append — at the pinned version. A reads nothing, so it
    // commutes: one data dir, republished at v10, no re-execution.
    var bVersion = -1L
    val preDirs = dataDirCount(base)
    val a = VersionedTable.commitAppendHooked(spark, base,
      kv(Seq((100L, 1L, 1L))).coalesce(1), statsCols = Seq("k")) { () =>
      if (bVersion < 0L)
        bVersion = VersionedTable.commitDelete(spark, base,
          col("k") >= 70L, pruneRanges = Seq(("k", 70L, 79L)),
          statsCols = Seq("k"))
    }
    assert(bVersion === 9L && a === 10L)
    // +2: A's single attempt dir plus B's (file-less) rewrite dir —
    // a re-executed A would strand a third
    assert(dataDirCount(base) === preDirs + 2)
    assert(VersionedTable.readLatest(spark, base).count() === 71L)
  }

  test("republish remerges a winner's schema evolution") {
    val base = TempDirs.scoped("vt_schema_race")
    binnedTable(base)
    // winner ALTERs a new column in while A's disjoint delete is
    // mid-flight: A's republished manifest must carry the UNION schema
    // (restating A's stale header would drop the winner's column)
    val aVersion = VersionedTable.commitDeleteHooked(spark, base,
      col("k") <= 9L, pruneRanges = Seq(("k", 0L, 9L)),
      statsCols = Seq("k")) { () =>
      if (VersionedTable.latestVersion(base).contains(8L))
        VersionedTable.alterAddColumns(base,
          Seq(org.apache.spark.sql.types.StructField("extra",
            org.apache.spark.sql.types.LongType)))
    }
    assert(aVersion === 10L)
    val names = VersionedTable.declaredSchema(base, 10L).get.fieldNames.toSeq
    assert(names === Seq("k", "ord", "v", "extra"))
    // and the data reads: old files null-fill the evolved column
    assert(VersionedTable.readLatest(spark, base)
      .filter(col("extra").isNull).count() === 70L)
  }

  test("RENAME winner conflicts: loser re-executes, no resurrected column") {
    val base = TempDirs.scoped("vt_rename_race")
    binnedTable(base)
    // winner RENAMES v→val while A's disjoint delete is mid-flight.
    // A's stale declared schema still says `v` — a republish would
    // remerge it and mint `v` a fresh column id, resurrecting the
    // renamed-away name as a spurious all-null column (the r12 hole:
    // a metadata winner has no adds/removes, so every DML 'commuted').
    // The alter_schema conflict check forces the re-execute path.
    val aVersion = VersionedTable.commitDeleteHooked(spark, base,
      col("k") <= 9L, pruneRanges = Seq(("k", 0L, 9L)),
      statsCols = Seq("k")) { () =>
      if (VersionedTable.latestVersion(base).contains(8L))
        VersionedTable.alterRenameColumn(base, "v", "val")
    }
    assert(aVersion === 10L)
    val vis = ColumnMapping.visible(
      VersionedTable.declaredSchema(base, aVersion).get).fieldNames.toSeq
    assert(vis === Seq("k", "ord", "val"))
    // re-execution left the pinned attempt dir stranded (8 base + A's
    // abandoned v9 attempt + A's committed re-derive = 10); a republish
    // would have left 9
    assert(dataDirCount(base) === 10)
    // the delete applied against the POST-RENAME table
    assert(VersionedTable.readLatest(spark, base).count() === 70L)
    assert(VersionedTable.readLatest(spark, base)
      .filter(col("val").isNull).count() === 0L)
  }

  test("DROP winner conflicts: loser re-executes without the dropped column") {
    val base = TempDirs.scoped("vt_drop_race")
    binnedTable(base)
    val aVersion = VersionedTable.commitDeleteHooked(spark, base,
      col("k") <= 9L, pruneRanges = Seq(("k", 0L, 9L)),
      statsCols = Seq("k")) { () =>
      if (VersionedTable.latestVersion(base).contains(8L))
        VersionedTable.alterDropColumn(base, "v")
    }
    assert(aVersion === 10L)
    val vis = ColumnMapping.visible(
      VersionedTable.declaredSchema(base, aVersion).get).fieldNames.toSeq
    assert(vis === Seq("k", "ord"))
    assert(VersionedTable.readLatest(spark, base).columns.toSeq ===
      Seq("k", "ord"))
    assert(VersionedTable.readLatest(spark, base).count() === 70L)
  }

  // -----------------------------------------------------------------
  // protocol feature gate

  test("unknown feature token refuses on read AND write, naming it") {
    val base = TempDirs.scoped("vt_feat_unknown")
    binnedTable(base)
    // a future build committed something this build doesn't implement
    Files.write(Paths.get(base, "_log", f"${9L}%020d.commit"),
      "#op=future\n#features=dv,frobnicate\n".getBytes("UTF-8"))
    val r = intercept[IllegalStateException] {
      VersionedTable.readVersion(spark, base, 9L).count()
    }
    // only the UNKNOWN token is named as the problem
    assert(r.getMessage.contains("feature(s) frobnicate"))
    val w = intercept[IllegalStateException] {
      VersionedTable.commitAppend(spark, base, kv(Seq((1L, 1L, 1L))))
    }
    assert(w.getMessage.contains("frobnicate"))
    // older versions (below the alien commit) still read fine
    assert(VersionedTable.readVersion(spark, base, 8L).count() === 80L)
  }

  test("DV and NDV commits declare their features, sticky thereafter") {
    val base = TempDirs.scoped("vt_feat_declare")
    binnedTable(base)
    def marker(v: Long): Seq[String] =
      Files.readAllLines(
        Paths.get(base, "_log", f"$v%020d.commit")).asScala.toSeq
    // pre-feature commits carry no header
    assert(!marker(8L).exists(_.startsWith("#features=")))
    // a MoR delete writes a deletion vector → declares dv
    VersionedTable.commitDeleteMoR(spark, base, col("k") === 3L,
      pruneRanges = Seq(("k", 0L, 9L)))
    assert(marker(9L).contains("#features=dv"))
    // an NDV-sketched append → declares ndv, UNIONED with dv (sticky)
    VersionedTable.commitAppend(spark, base,
      kv(Seq((200L, 1L, 1L))).coalesce(1), statsCols = Seq("k"),
      ndvCols = Seq("k"))
    assert(marker(10L).contains("#features=dv,ndv"))
    // a plain append after that still restates the union — the set
    // never silently shrinks
    VersionedTable.commitAppend(spark, base,
      kv(Seq((201L, 1L, 1L))).coalesce(1), statsCols = Seq("k"))
    assert(marker(11L).contains("#features=dv,ndv"))
    // checkpoints restate it too (v10 is on the checkpoint cadence)
    val cp = Files.readAllLines(
      Paths.get(base, "_log", f"${10L}%020d.checkpoint")).asScala
    assert(cp.head === "#features=dv,ndv" ||
      cp.take(3).contains("#features=dv,ndv"))
    // and the gated read path accepts its own declarations
    assert(VersionedTable.readLatest(spark, base).count() === 81L)
  }

  test("pre-gate tables read and write unchanged (no header, no refusal)") {
    val base = TempDirs.scoped("vt_feat_pregate")
    binnedTable(base)
    assert(VersionedTable.readLatest(spark, base).count() === 80L)
    val v = VersionedTable.commitAppend(spark, base,
      kv(Seq((300L, 1L, 1L))).coalesce(1), statsCols = Seq("k"))
    assert(v === 9L)
    val m = Files.readAllLines(
      Paths.get(base, "_log", f"$v%020d.commit")).asScala
    assert(!m.exists(_.startsWith("#features=")))
  }
}
