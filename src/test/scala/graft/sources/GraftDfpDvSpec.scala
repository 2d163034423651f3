package graft.sources

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import org.apache.spark.sql.functions._

/** Dynamic file pruning × deletion vectors: a join over a DV'd graft
  * fact must stay correct — the DvRead rewrite splits the scan into
  * clean ∪ dv legs, each leg independently runtime-filterable, and
  * soft-deleted rows can never resurface through the join.
  */
class GraftDfpDvSpec extends SparkSuite {

  test("join over a DV'd fact equals the parquet twin; deletions stay dead") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_dfpdv")
    Seq(0L, 10L, 20L, 30L).foreach(lo => VersionedTable.commitAppend(
      spark, base,
      (lo until lo + 10L).map(k => (k, k * 7)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k")))
    // soft-delete a slice spanning two files via deletion vectors
    VersionedTable.commitDeleteMoR(spark, base,
      col("k").between(15L, 24L), Seq(("k", 15L, 24L)))
    val twinP = TempDirs.scoped("graft_dfpdv_twin")
    spark.read.format("graft").load(base)
      .write.mode("overwrite").parquet(twinP)
    val dimP = TempDirs.scoped("graft_dfpdv_dim")
    (0L until 40L).map(k => (k, k / 10L))
      .toDF("k", "grp").write.mode("overwrite").parquet(dimP)
    val dim = spark.read.parquet(dimP).filter(col("grp") === 1L) // 10..19
    def agg(f: org.apache.spark.sql.DataFrame) =
      f.join(dim, "k").agg(count(lit(1)), sum(col("v"))).head()
    val a = agg(spark.read.format("graft").load(base))
    val b = agg(spark.read.parquet(twinP))
    assert(a === b)
    // live keys in grp 1 are exactly 10..14 (15..19 soft-deleted)
    assert(a.getLong(0) === 5L)
    assert(a.getLong(1) === 7L * (10L to 14L).sum)
  }
}
