package graft.operators

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

/** Incremental compaction: only small (and DV'd) files rewrite;
  * right-sized files carry forward untouched; contents are invariant;
  * deletion vectors fold away.
  */
class CompactSmallSpec extends SparkSuite {

  test("small files pack; the big file carries forward by path") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_csmall")
    // one big commit, then five tiny appends (the streaming debt shape)
    VersionedTable.commitAppend(spark, base,
      (0L until 5000L).map(k => (k, s"payload$k" * 8)).toDF("k", "v")
        .coalesce(1), statsCols = Seq("k"))
    (1L to 5L).foreach(i => VersionedTable.commitAppend(spark, base,
      Seq((5000L + i, s"x$i")).toDF("k", "v").coalesce(1),
      statsCols = Seq("k")))
    val v = VersionedTable.latestVersion(base).get
    val before = VersionedTable.entries(base, v)
    assert(before.size === 6)
    val bigPath = before.maxBy(e =>
      java.nio.file.Files.size(java.nio.file.Paths.get(base, e.path))).path
    val nv = VersionedTable.compactSmall(spark, base,
      smallBytes = 64 * 1024L, targetBytes = 1024 * 1024L)
    assert(nv === v + 1)
    val after = VersionedTable.entries(base, nv)
    // five tinies packed into one; the big file survived UNMOVED
    assert(after.size === 2)
    assert(after.map(_.path).contains(bigPath))
    // contents invariant
    assert(VersionedTable.readLatest(spark, base).count() === 5005L)
    assert(VersionedTable.readLatest(spark, base)
      .agg(sum(col("k"))).head().getLong(0) ===
      (0L until 5000L).sum + (5001L to 5005L).sum)
    // a no-debt table is a no-op (returns the current version)
    assert(VersionedTable.compactSmall(spark, base,
      smallBytes = 10L, targetBytes = 1024 * 1024L) === nv)
  }

  test("DV'd files always qualify and their deletions fold away") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_csmall_dv")
    VersionedTable.commitAppend(spark, base,
      (0L until 100L).map(k => (k, k * 2)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    VersionedTable.commitAppend(spark, base,
      (100L until 200L).map(k => (k, k * 2)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    VersionedTable.commitDeleteMoR(spark, base, col("k") < 10L,
      Seq(("k", Long.MinValue, 9L)))
    val v = VersionedTable.latestVersion(base).get
    assert(VersionedTable.entries(base, v).exists(_.dv.exists(_.count > 0)))
    // smallBytes=1: only the DV'd file qualifies (< minSmallFiles=2),
    // so nothing packs — the lone-small-file no-op contract
    assert(VersionedTable.compactSmall(spark, base,
      smallBytes = 1L, targetBytes = 1024 * 1024L) === v)
    // both files under the threshold: pack and fold the DV away
    val nv2 = VersionedTable.compactSmall(spark, base,
      smallBytes = 1024 * 1024L, targetBytes = 1024 * 1024L)
    val after = VersionedTable.entries(base, nv2)
    assert(after.forall(_.dv.forall(_.count == 0L)))
    assert(VersionedTable.readLatest(spark, base).count() === 190L)
    assert(VersionedTable.readLatest(spark, base)
      .agg(min(col("k"))).head().getLong(0) === 10L)
  }

  test("SQL surface: CALL graft.system.compact_small and zorder_by") {
    val ns = s"csml_${java.util.UUID.randomUUID().toString.take(8)}"
    val t = s"graft.$ns.t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    try {
      (1 to 4).foreach(i =>
        spark.sql(s"INSERT INTO $t VALUES ($i, ${i * 10})"))
      val v = spark.sql(
        s"CALL graft.system.compact_small('$ns.t', ${64 * 1024}, " +
          s"${1024 * 1024})").head().getLong(0)
      assert(v > 4L)
      assert(spark.sql(s"SELECT count(*) AS c FROM $t").head()
        .getLong(0) === 4L)
      val v2 = spark.sql(
        s"CALL graft.system.zorder_by('$ns.t', 'k,v', 2)")
        .head().getLong(0)
      assert(v2 === v + 1)
      assert(spark.sql(s"SELECT sum(v) AS s FROM $t").head()
        .getLong(0) === 100L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
