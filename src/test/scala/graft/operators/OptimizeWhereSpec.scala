package graft.operators

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable.LongRange
import org.apache.spark.sql.functions._

/** Scoped OPTIMIZE + sink auto-compaction: incremental maintenance
  * touches only the implicated files; contents are invariant.
  */
class OptimizeWhereSpec extends SparkSuite {

  test("optimizeWhere re-clusters only overlapping files") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_optw")
    // 8 one-file commits by key decade; the "recent" half is 40..79
    (0L until 8L).foreach(b => VersionedTable.commitAppend(spark, base,
      (b * 10L until b * 10L + 10L).map(k => (k, k % 4, k * 3))
        .toDF("k", "g", "v").coalesce(1),
      statsCols = Seq("k", "g")))
    val v = VersionedTable.latestVersion(base).get
    val oldPaths = VersionedTable.entries(base, v)
      .map(_.path).toSet
    val nv = VersionedTable.optimizeWhere(spark, base,
      Seq(LongRange("k", 40L, 79L)), Seq("k", "g"), numFiles = 2)
    assert(nv === v + 1)
    val after = VersionedTable.entries(base, nv)
    // the 4 untouched low-decade files survive BY PATH; 4 recent files
    // became 2 z-ordered ones
    val survivors = after.map(_.path).toSet intersect oldPaths
    assert(survivors.size === 4)
    assert(after.size === 6)
    // contents invariant
    assert(VersionedTable.readLatest(spark, base).count() === 80L)
    assert(VersionedTable.readLatest(spark, base)
      .agg(sum(col("v"))).head().getLong(0) === (0L until 80L).map(_ * 3).sum)
    // an out-of-range scope is a no-op
    assert(VersionedTable.optimizeWhere(spark, base,
      Seq(LongRange("k", 5000L, 6000L)), Seq("k", "g"), 2) === nv)
  }

  test("sink auto-compaction folds small-file debt inline") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val base = TempDirs.scoped("graft_autocompact")
    val cp = TempDirs.scoped("graft_autocompact_cp")
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    def run(): Unit = in.toDF().toDF("k", "v").writeStream
      .format("graft").option("path", base)
      .option("checkpointLocation", cp)
      .option("statsCols", "k")
      .option("autoCompactSmallBytes", (256L * 1024).toString)
      .option("autoCompactTrigger", "3")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    // three tiny batches: the third trips the trigger and compacts
    (1L to 3L).foreach { i => in.addData((i, i * 10L)); run() }
    val v = VersionedTable.latestVersion(base).get
    val hist = VersionedTable.history(base).map(_._2)
    assert(hist.count(_ == "compact") >= 1,
      s"expected an inline compaction commit, got $hist")
    val files = VersionedTable.entries(base, v)
    assert(files.size === 1, s"debt should be folded, got ${files.size}")
    assert(spark.read.format("graft").load(base)
      .orderBy("k").collect().map(_.getLong(1)).toSeq ===
      Seq(10L, 20L, 30L))
  }
}
