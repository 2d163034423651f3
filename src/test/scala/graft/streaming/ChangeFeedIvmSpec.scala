package graft.streaming

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import org.apache.spark.sql.functions._

/** The delta-rule invariants q170's oracle can't isolate: batch-retry
  * idempotency (the last_batch guard), zero-row group eviction, and
  * a compaction feeding zero deltas.
  */
class ChangeFeedIvmSpec extends SparkSuite {

  private def state(view: String): Map[Long, (Long, Long)] =
    VersionedTable.readVersion(spark, view,
        VersionedTable.latestVersion(view).get)
      .collect().map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("value_sum")))).toMap

  test("delta rule across delete/update commits; retry is a no-op") {
    val base = TempDirs.scoped("graft_ivm")
    val view = TempDirs.scoped("graft_ivm_view")
    val s = spark
    import s.implicits._
    // k 0..9, v = k*10; buckets = k % 2
    VersionedTable.commitAppend(spark, base,
      (0L until 10L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1),
      Seq("k"))
    def run(): Unit = ChangeFeedIvm.runAvailableNow(
      spark, base, view, "k", b => pmod(b, lit(2L)), "v")
    run()
    assert(state(view) === Map(
      0L -> ((5L, (0L + 2 + 4 + 6 + 8) * 10)),
      1L -> ((5L, (1L + 3 + 5 + 7 + 9) * 10))))
    // delete k in {4,5}; update k=7 -> v += 1
    VersionedTable.commitDelete(spark, base, col("k").between(4L, 5L),
      Seq(("k", 4L, 5L)), statsCols = Seq("k"))
    VersionedTable.commitUpdate(spark, base, col("k") === 7L,
      Seq(("v", col("v") + 1L)), Seq(("k", 7L, 7L)), statsCols = Seq("k"))
    run()
    val expect = Map(
      0L -> ((4L, (0L + 2 + 6 + 8) * 10)),
      1L -> ((4L, (1L + 3 + 9) * 10 + 71L)))
    assert(state(view) === expect)
    // manual re-apply of an already-applied batch id: guarded no-op
    val feed = VersionedTable.changesPerCommit(spark, base, 0L, 3L, "k")
    val before = VersionedTable.latestVersion(view)
    ChangeFeedIvm.applyBatch(spark, view, feed, id = 0L, "k",
      b => pmod(b, lit(2L)), "v")
    assert(VersionedTable.latestVersion(view) === before)
    assert(state(view) === expect)
    // a compaction of the base feeds zero deltas: state unchanged
    VersionedTable.compact(spark, base, numFiles = 1, statsCols = Seq("k"))
    run()
    assert(state(view) === expect)
  }

  test("a group whose count reaches zero drops from the view") {
    val base = TempDirs.scoped("graft_ivm_zero")
    val view = TempDirs.scoped("graft_ivm_zero_view")
    val s = spark
    import s.implicits._
    VersionedTable.commitAppend(spark, base,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1), Seq("k"))
    def run(): Unit = ChangeFeedIvm.runAvailableNow(
      spark, base, view, "k", b => pmod(b, lit(2L)), "v")
    run()
    assert(state(view).keySet === Set(0L, 1L))
    VersionedTable.commitDelete(spark, base, col("k") === 2L,
      Seq(("k", 2L, 2L)), statsCols = Seq("k"))
    run()
    assert(state(view) === Map(1L -> ((1L, 10L))))
  }
}
