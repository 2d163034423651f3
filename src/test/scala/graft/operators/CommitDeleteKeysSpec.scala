package graft.operators

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

/** Keys-frame DELETE (r12): the change-feed maintainers' retirement
  * path without a driver-side key list — predicate by anti-join,
  * footprint from one extrema aggregate, bloom probes only when the
  * whole key set fits the probe bound (a sampled probe would be
  * unsound: a file holding only unsampled keys would prune away and
  * the delete would silently leak).
  */
class CommitDeleteKeysSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "ord", "v")
  }

  private def binned(base: String): Unit =
    (0L until 8L).foreach { bin =>
      VersionedTable.commitAppend(spark, base,
        kv(Seq.tabulate(10)(i => (bin * 10 + i, 1L, bin))).coalesce(1),
        statsCols = Seq("k"), bloomCols = Seq("k"))
    }

  test("deletes exactly the keyed rows; untouched files carry by path") {
    val base = TempDirs.scoped("vt_delkeys")
    binned(base)
    val s = spark
    import s.implicits._
    val v = VersionedTable.commitDeleteKeys(spark, base, "k",
      Seq(3L, 15L, 3L).toDF("k"), // dup keys dedupe
      statsCols = Seq("k"), bloomCols = Seq("k"))
    assert(v === 9L)
    val ks = VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).toSet
    assert(!ks.contains(3L) && !ks.contains(15L) && ks.size === 78)
    // extrema [3,15] spans bins 0-1 only; bins 2-7's files must be the
    // ORIGINAL paths (carried implicitly, never rewritten)
    val before = VersionedTable.entries(base, 8L).map(_.path).toSet
    val after = VersionedTable.entries(base, v).map(_.path).toSet
    assert((after & before).size === 6)
  }

  test("bloom probes scope a scattered key to its files when under the bound") {
    val base = TempDirs.scoped("vt_delkeys_probe")
    binned(base)
    val s = spark
    import s.implicits._
    // keys 5 and 75: extrema [5,75] overlap every bin, but the blooms
    // pin the rewrite to bins 0 and 7 only
    val v = VersionedTable.commitDeleteKeys(spark, base, "k",
      Seq(5L, 75L).toDF("k"), statsCols = Seq("k"), bloomCols = Seq("k"))
    val before = VersionedTable.entries(base, 8L).map(_.path).toSet
    val after = VersionedTable.entries(base, v).map(_.path).toSet
    assert((after & before).size === 6)
    assert(VersionedTable.readLatest(spark, base).count() === 78L)
  }

  test("large batch (past the probe bound) stays plan-safe and exact") {
    val base = TempDirs.scoped("vt_delkeys_large")
    binned(base)
    // 50k distinct keys — a literal-isin predicate of this size is the
    // plan/driver blowup the keys-frame path exists to avoid; only 40
    // of them exist (evens of [0,79])
    val keys = spark.range(0L, 100000L, 2L).withColumnRenamed("id", "k")
    val v = VersionedTable.commitDeleteKeys(spark, base, "k", keys,
      statsCols = Seq("k"), bloomCols = Seq("k"), probeLimit = 1000)
    assert(v === 9L)
    val ks = VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ks === (1L until 80L by 2L))
  }

  test("empty keys and non-overlapping keys commit nothing") {
    val base = TempDirs.scoped("vt_delkeys_noop")
    binned(base)
    val s = spark
    import s.implicits._
    assert(VersionedTable.commitDeleteKeys(spark, base, "k",
      Seq.empty[Long].toDF("k")) === 8L)
    // keys far outside every zone map: no file touched, no commit
    assert(VersionedTable.commitDeleteKeys(spark, base, "k",
      Seq(5000L, 6000L).toDF("k")) === 8L)
    assert(VersionedTable.readLatest(spark, base).count() === 80L)
  }
}
