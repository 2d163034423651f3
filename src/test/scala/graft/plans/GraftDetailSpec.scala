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
}
