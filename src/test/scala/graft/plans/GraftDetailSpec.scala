package graft.plans

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import org.apache.spark.sql.functions._

/** `graft_detail(t)` — the DESCRIBE DETAIL one-row snapshot: version,
  * file/row/byte counts, DV'd files, stats discipline, constraints —
  * all from the commit log, zero data files opened.
  */
class GraftDetailSpec extends SparkSuite {

  test("detail row reflects files, rows, DVs, stats and constraints") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_detail")
    VersionedTable.commitAppend(spark, base,
      (0L until 100L).map(k => (k, k * 2)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"), bloomCols = Seq("v"))
    VersionedTable.commitAppend(spark, base,
      (100L until 200L).map(k => (k, k * 2)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"), bloomCols = Seq("v"))
    VersionedTable.addConstraint(spark, base, "k_nonneg", "k >= 0")
    VersionedTable.commitDeleteMoR(spark, base, col("k") < 10L,
      Seq(("k", Long.MinValue, 9L)))
    val r = spark.sql(s"SELECT * FROM graft_detail('$base')").head()
    assert(r.getLong(0) === 3L) // version
    assert(r.getInt(1) === 2) // n_files
    assert(r.getLong(2) === 190L) // live rows (dv-subtracted)
    assert(r.getLong(3) > 0L) // size_bytes
    assert(r.getInt(4) === 1) // one DV'd file
    assert(r.getString(5) === "k")
    assert(r.getString(6) === "v")
    assert(r.getString(7) === "k_nonneg CHECK (k >= 0)")
  }

  test("graft_files lists per-file rows/bytes/dv/bucket/row-base") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_files_tvf")
    (1L to 80L).map(k => (k, k)).toDF("k", "v").write.format("graft")
      .option("bucketBy", "4:k").option("statsCols", "k")
      .mode("append").save(base)
    VersionedTable.enableRowIds(base)
    VersionedTable.commitDeleteMoR(spark, base, col("k") === 5L,
      Seq(("k", 5L, 5L)))
    val rows = spark.sql(s"SELECT * FROM graft_files('$base')").collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[Long]("rows")).sum === 80L)
    assert(rows.map(_.getAs[Long]("live_rows")).sum === 79L)
    assert(rows.map(_.getAs[Long]("dv_positions")).sum === 1L)
    assert(rows.forall(_.getAs[String]("bucket").startsWith("k:4:")))
    assert(rows.map(_.getAs[Long]("row_base")).sorted.head === 0L)
    assert(rows.forall(_.getAs[String]("stats_cols") == "k"))
    assert(rows.forall(_.getAs[Long]("size_bytes") > 0L))
    // version pin: the pre-delete snapshot has no DV positions
    val pre = spark.sql(s"SELECT sum(dv_positions) FROM " +
      s"graft_files('$base', 2)").head().getLong(0)
    assert(pre === 0L)
  }

  test("graft_refs lists tags as (name, version) rows") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_refs")
    VersionedTable.commitAppend(spark, base,
      (0L until 10L).map(k => (k, k)).toDF("k", "v").coalesce(1))
    VersionedTable.commitAppend(spark, base,
      (10L until 20L).map(k => (k, k)).toDF("k", "v").coalesce(1))
    assert(spark.sql(s"SELECT * FROM graft_refs('$base')").count() === 0L)
    VersionedTable.createTag(base, "rc1", 1L)
    VersionedTable.createTag(base, "rc2", 2L)
    val rows = spark.sql(
      s"SELECT name, version FROM graft_refs('$base') ORDER BY name")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("rc1", 1L), ("rc2", 2L)))
    // joinable like any FROM-clause citizen: read counts per ref
    val n = spark.sql(
      s"SELECT count(*) FROM graft_refs('$base') WHERE version = 2").head()
    assert(n.getLong(0) === 1L)
  }
}
