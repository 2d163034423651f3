package graft.operators

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

/** [[VersionedTable.commitReplaceKeys]] — the atomic keyed replace
  * (r14 advice: the GraphIndexPipeline adjacency merge used a
  * delete-then-append pair whose crash window silently lost the
  * replaced srcs' history): one manifest publish swaps the matching
  * keys' rows for the replacement frame, so there is no intermediate
  * version where the old rows are gone and the new ones absent.
  */
class CommitReplaceKeysSpec extends SparkSuite {

  import spark.implicits._

  test("replaces matching keys and keeps survivors in ONE commit") {
    val base = TempDirs.scoped("rk_basic")
    VersionedTable.commitAppend(spark, base,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      statsCols = Seq("k"))
    val v0 = VersionedTable.latestVersion(base).get
    VersionedTable.commitReplaceKeys(spark, base, "k",
      Seq(2L, 3L).toDF("k"),
      Seq((2L, "B"), (3L, "C"), (4L, "D")).toDF("k", "v"),
      statsCols = Seq("k"))
    // exactly one version advanced — the atomicity claim itself
    assert(VersionedTable.latestVersion(base) === Some(v0 + 1L))
    val rows = VersionedTable.readLatest(spark, base)
      .as[(Long, String)].collect().toSet
    assert(rows === Set((1L, "a"), (2L, "B"), (3L, "C"), (4L, "D")))
    // and no intermediate state exists: the PREVIOUS version still
    // reads the old rows whole (time travel across the replace)
    val prev = VersionedTable.readVersion(spark, base, v0)
      .as[(Long, String)].collect().toSet
    assert(prev === Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("bootstrap on an empty table commits the replacement as-is") {
    val base = TempDirs.scoped("rk_boot")
    VersionedTable.commitReplaceKeys(spark, base, "k",
      spark.emptyDataset[Long].toDF("k"),
      Seq((1L, "a")).toDF("k", "v"))
    assert(VersionedTable.readLatest(spark, base)
      .as[(Long, String)].collect().toSet === Set((1L, "a")))
  }

  test("txn stamp makes the replace idempotent across replays") {
    val base = TempDirs.scoped("rk_txn")
    VersionedTable.commitAppend(spark, base,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), statsCols = Seq("k"))
    def replay(): Unit =
      if (!VersionedTable.lastCommittedTxn(base, "rk-app").exists(_ >= 7L))
        VersionedTable.commitReplaceKeys(spark, base, "k",
          Seq(2L).toDF("k"), Seq((2L, "B")).toDF("k", "v"),
          txn = Some("rk-app" -> 7L))
    replay()
    val v1 = VersionedTable.latestVersion(base)
    replay() // crash-replay of the same batch: gated out, version pinned
    assert(VersionedTable.latestVersion(base) === v1)
    assert(VersionedTable.readLatest(spark, base)
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "B")))
  }

  test("untouched files are not rewritten (zone-map scoped footprint)") {
    val base = TempDirs.scoped("rk_scope")
    VersionedTable.commitAppend(spark, base,
      spark.range(0, 100).select(col("id").as("k"),
        col("id").cast("string").as("v")).coalesce(1),
      statsCols = Seq("k"))
    VersionedTable.commitAppend(spark, base,
      spark.range(1000, 1100).select(col("id").as("k"),
        col("id").cast("string").as("v")).coalesce(1),
      statsCols = Seq("k"))
    val pathsBefore = VersionedTable.entries(base,
      VersionedTable.latestVersion(base).get).map(_.path).toSet
    VersionedTable.commitReplaceKeys(spark, base, "k",
      Seq(1050L).toDF("k"), Seq((1050L, "X")).toDF("k", "v"),
      statsCols = Seq("k"))
    val pathsAfter = VersionedTable.entries(base,
      VersionedTable.latestVersion(base).get).map(_.path).toSet
    // the low-range file survives untouched; only the 1000s file swapped
    assert(pathsAfter.intersect(pathsBefore).size === 1)
    assert(VersionedTable.readLatest(spark, base).count() === 200L)
    assert(VersionedTable.readLatest(spark, base)
      .filter(col("k") === 1050L).select(col("v"))
      .as[String].collect().toSeq === Seq("X"))
  }

  test("an IntegerType keys frame against a LongType bloomed column " +
      "still replaces (probe values normalize to the column's type)") {
    val base = TempDirs.scoped("rk_probetype")
    VersionedTable.commitAppend(spark, base,
      spark.range(0, 300).select(col("id").as("k"),
        col("id").cast("string").as("v")).coalesce(3),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    // keys arrive as INT (e.g. literals from a caller) — the file
    // blooms were hashed from LONGs; un-normalized probes would
    // false-negative, skip the file, and leave the old row alive
    val s2 = spark
    import s2.implicits._
    VersionedTable.commitReplaceKeys(spark, base, "k",
      Seq(137).toDF("k"), Seq((137L, "X")).toDF("k", "v"),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    val vs = VersionedTable.readLatest(spark, base)
      .filter(col("k") === 137L).select(col("v"))
      .as[String].collect().toSeq
    assert(vs === Seq("X"), s"old row must be replaced, got $vs")
    assert(VersionedTable.readLatest(spark, base).count() === 300L)
  }

  test("row-tracking tables are refused loudly") {
    val base = TempDirs.scoped("rk_rowid")
    VersionedTable.commitAppend(spark, base,
      Seq((1L, "a")).toDF("k", "v"))
    VersionedTable.enableRowIds(base)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.commitReplaceKeys(spark, base, "k",
        Seq(1L).toDF("k"), Seq((1L, "A")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("row-tracking"))
  }

  test("reserved __graft_ column prefix is refused at commit") {
    val base = TempDirs.scoped("rk_reserved")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(spark, base,
        Seq((1L, "a")).toDF("k", "__graft_day"))
    }
    assert(e.getMessage.contains("__graft_"))
  }
}
