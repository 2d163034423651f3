package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

/** COLUMN MAPPING (r12, judge ask #4): RENAME/DROP COLUMN as
  * metadata-only commits — stable physical ids under logical names,
  * zone maps surviving renames, tombstoned drops that can never
  * resurrect, `colmap` protocol-gated.
  */
class ColumnMappingSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "ord", "v")
  }

  private def binned(base: String): Unit =
    (0L until 4L).foreach { bin =>
      VersionedTable.commitAppend(spark, base,
        kv(Seq.tabulate(10)(i => (bin * 10 + i, 1L, bin))).coalesce(1),
        statsCols = Seq("k"), bloomCols = Seq("k"))
    }

  test("RENAME is metadata-only: zero files touched, data reads under the new name") {
    val base = TempDirs.scoped("cm_rename")
    binned(base)
    val filesBefore = VersionedTable.entries(base, 4L).map(_.path).toSet
    val v = VersionedTable.alterRenameColumn(base, "v", "value")
    assert(v === 5L)
    // metadata-only, BY PATH: the snapshot references the same files
    assert(VersionedTable.entries(base, v).map(_.path).toSet === filesBefore)
    val df = VersionedTable.readLatest(spark, base)
    assert(df.columns.toSeq === Seq("k", "ord", "value"))
    assert(df.agg(sum(col("value"))).head().getLong(0) ===
      (0L until 4L).map(_ * 10).sum)
    // time travel shows each version's OWN names
    assert(VersionedTable.readVersion(spark, base, 4L).columns.toSeq ===
      Seq("k", "ord", "v"))
    // the colmap feature is declared (a mapping-blind reader refuses)
    val m = Files.readAllLines(
      Paths.get(base, "_log", f"$v%020d.commit")).asScala
    assert(m.exists(l => l.startsWith("#features=") && l.contains("colmap")))
  }

  test("zone-map pruning works ACROSS a rename of the stats column") {
    val base = TempDirs.scoped("cm_prune")
    binned(base)
    VersionedTable.alterRenameColumn(base, "k", "key")
    // logical range on the NEW name maps onto the physical 'k' tokens
    val pruned = VersionedTable.readVersionPrunedTyped(spark, base, 5L,
      Seq(VersionedTable.LongRange("key", 10L, 19L)))
    assert(pruned.inputFiles.length === 1)
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ===
      (10L until 20L))
    // and DML footprints map too: delete by the new name rewrites
    // only bin 1's file
    val before = VersionedTable.entries(base, 5L).map(_.path).toSet
    val v = VersionedTable.commitDelete(spark, base,
      col("key") === 15L, pruneRanges = Seq(("key", 15L, 15L)),
      pruneProbes = Seq(VersionedTable.KeyProbe("key", Seq(15L))))
    val after = VersionedTable.entries(base, v).map(_.path).toSet
    assert((after & before).size === 3)
    assert(VersionedTable.readLatest(spark, base).count() === 39L)
  }

  test("writes after a rename land under the physical name; old and new files union") {
    val base = TempDirs.scoped("cm_write")
    binned(base)
    VersionedTable.alterRenameColumn(base, "v", "value")
    VersionedTable.commitAppend(spark, base,
      kv(Seq((100L, 1L, 9L))).toDF("k", "ord", "value").coalesce(1),
      statsCols = Seq("k"))
    val df = VersionedTable.readLatest(spark, base)
    assert(df.count() === 41L)
    assert(df.filter(col("k") === 100L).head().getLong(2) === 9L)
    // the fresh file physically carries 'v' (the frozen physical name)
    val fresh = VersionedTable.commitDelta(base, 6L)._2.head
    val raw = spark.read.parquet(s"$base/${fresh.path}")
    assert(raw.columns.toSeq === Seq("k", "ord", "v"))
  }

  test("DROP tombstones; re-added name is a FRESH column, old data stays dead") {
    val base = TempDirs.scoped("cm_drop")
    binned(base)
    val v = VersionedTable.alterDropColumn(base, "v")
    assert(VersionedTable.entries(base, v).map(_.path).toSet ===
      VersionedTable.entries(base, 4L).map(_.path).toSet) // metadata-only
    assert(VersionedTable.readLatest(spark, base).columns.toSeq ===
      Seq("k", "ord"))
    // time travel still sees the dropped column at old versions
    assert(VersionedTable.readVersion(spark, base, 4L).columns.toSeq ===
      Seq("k", "ord", "v"))
    // re-add the SAME logical name: fresh identity — every pre-drop
    // row reads NULL (resurrecting the old bytes would be corruption)
    VersionedTable.alterAddColumns(base,
      Seq(org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val df = VersionedTable.readLatest(spark, base)
    assert(df.columns.toSeq === Seq("k", "ord", "v"))
    assert(df.filter(col("v").isNotNull).count() === 0L)
    // and a write to the re-added column round-trips
    VersionedTable.commitAppend(spark, base,
      kv(Seq((200L, 1L, 77L))).coalesce(1), statsCols = Seq("k"))
    assert(VersionedTable.readLatest(spark, base)
      .filter(col("v") === 77L).count() === 1L)
  }

  test("rename/drop refuse: collisions, last column, constraint references") {
    val base = TempDirs.scoped("cm_refuse")
    binned(base)
    intercept[IllegalArgumentException] {
      VersionedTable.alterRenameColumn(base, "v", "ord") // exists
    }
    intercept[IllegalArgumentException] {
      VersionedTable.alterRenameColumn(base, "nope", "x") // unknown
    }
    VersionedTable.addConstraint(spark, base, "v_pos", "v >= 0")
    intercept[IllegalArgumentException] {
      VersionedTable.alterRenameColumn(base, "v", "value") // referenced
    }
    intercept[IllegalArgumentException] {
      VersionedTable.alterDropColumn(base, "v") // referenced
    }
    VersionedTable.dropConstraint(base, "v_pos")
    VersionedTable.alterDropColumn(base, "v")
    VersionedTable.alterDropColumn(base, "ord")
    intercept[IllegalArgumentException] {
      VersionedTable.alterDropColumn(base, "k") // last visible column
    }
  }

  test("SQL surface: RENAME/DROP through the catalog, reads + DML follow") {
    // name-addressed through the GRAFT catalog (a session-catalog
    // table pins its CREATE-time schema and never reaches
    // GraftCatalog.alterTable — the q172 discipline)
    val t = "graft.cmns.renames"
    spark.sql("DROP TABLE IF EXISTS " + t)
    spark.sql(s"CREATE TABLE $t (k BIGINT, ord BIGINT, v BIGINT)")
    val s = spark
    import s.implicits._
    (0L until 4L).foreach { bin =>
      kv(Seq.tabulate(10)(i => (bin * 10 + i, 1L, bin))).coalesce(1)
        .writeTo(t).append()
    }
    try {
      spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO value")
      val r = spark.sql(
        s"SELECT sum(value) AS sv, count(*) AS n FROM $t").head()
      assert(r.getLong(0) === (0L until 4L).map(_ * 10).sum &&
        r.getLong(1) === 40L)
      // SQL DELETE against the renamed column (footprint maps)
      spark.sql(s"DELETE FROM $t WHERE value = 3")
      assert(spark.sql(s"SELECT count(*) AS n FROM $t")
        .head().getLong(0) === 30L)
      spark.sql(s"ALTER TABLE $t DROP COLUMN value")
      assert(spark.sql(s"SELECT * FROM $t").columns.toSeq ===
        Seq("k", "ord"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS " + t); ()
    }
  }

  test("DSv2 read after RENAME: file skipping + physical-name pushdown survive") {
    val base = TempDirs.scoped("cm_dsv2_prune")
    binned(base) // 4 one-bin files, zone maps + blooms on k
    VersionedTable.alterRenameColumn(base, "k", "key")
    // r13: the mapped read is a PHYSICAL-schema DSv2 scan under a
    // renaming Project, not the library leg — the logical predicate
    // pushes through the alias and reaches the scan as a filter on
    // the frozen physical name, which is what both the manifest
    // tokens and the parquet row groups are keyed by
    val df = spark.read.format("graft").load(base)
      .filter(col("key") === 15L)
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(15L))
    // plan-time file skipping on the RENAMED column: 1 of 4 files
    assert(graft.sources.GraftScanMetrics.lastPrune(base) === Some((1, 4)))
    // DSv2 scan in the physical plan (not a library parquet read),
    // with the literal pushed under the physical name `k`
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"))
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("EqualTo(k,15"))
    // column pruning reaches the scan too: a 1-column projection
    // reads a 1-column schema
    val proj = spark.read.format("graft").load(base).select("key")
    val pplan = proj.queryExecution.executedPlan.toString
    assert(pplan.contains("ReadSchema") && !pplan.contains("ord"))
  }

  test("DSv2 read after RENAME with deletion vectors: union stays exact") {
    val base = TempDirs.scoped("cm_dsv2_dv")
    binned(base)
    VersionedTable.alterRenameColumn(base, "v", "value")
    VersionedTable.commitDeleteMoR(spark, base, col("k") === 15L,
      pruneRanges = Seq(("k", 15L, 15L)))
    val df = spark.read.format("graft").load(base)
    assert(df.count() === 39L)
    assert(df.agg(sum(col("value"))).head().getLong(0) ===
      (0L until 4L).map(_ * 10).sum - 1L) // k=15 carried value=1
    // predicate on the renamed column over the union: exact
    assert(df.filter(col("value") === 1L).count() === 9L)
    // the clean leg is still a DSv2 scan (3 clean files), the dv'd
    // file reads through the anti-join leg
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") && plan.contains("Union"))
  }

  test("mapped tables report manifest-exact row counts to the optimizer") {
    val base = TempDirs.scoped("cm_cbo")
    binned(base)
    VersionedTable.alterRenameColumn(base, "k", "key")
    // r12 diverted mapped reads off the DSv2 scan, so scan-level stats
    // never reached the planner; the r13 physical-relation re-plan
    // restores the manifest's exact live count (what drives
    // JoinSelection's broadcast decision)
    val df = spark.read.format("graft").load(base)
    val rel = df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation => r
      case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2Relation => r
    }.get
    assert(rel.stats.rowCount.contains(BigInt(40)),
      s"expected the manifest's exact 40-row count, got ${rel.stats}")
  }

  test("mapped tables still answer count(*) from the manifest") {
    val base = TempDirs.scoped("cm_count")
    binned(base)
    VersionedTable.alterRenameColumn(base, "v", "value")
    val df = spark.read.format("graft").load(base)
    assert(df.count() === 40L)
  }
}
