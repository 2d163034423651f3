package graft.operators

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

/** N-column Morton interleave: k=2 is bit-identical to the original
  * two-column formula (existing layouts/oracles depend on it), and a
  * 3-key z-ordered layout prunes on EACH of its keys.
  */
class ZValueNSpec extends SparkSuite {

  test("zValueN(k=2) is bit-identical to the original zValue formula") {
    val s = spark
    import s.implicits._
    val df = (0L until 2000L).map(i => (i * 37 % 65536, i * 101 % 65536))
      .toDF("a", "b")
    // the original formula, inlined
    val orig = (0 until 16).map { i =>
      shiftleft(shiftrightunsigned(col("a"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(col("b"), i).bitwiseAND(lit(1L)),
          2 * i + 1)
    }.reduce(_ + _)
    val n = df.filter(
      VersionedTable.zValueN(Seq(col("a"), col("b"))) =!= orig).count()
    assert(n === 0L)
  }

  test("3-key z-ordered write prunes on each key") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_z3")
    val rnd = new scala.util.Random(11)
    val df = rnd.shuffle((0L until 4096L).toList)
      .map(i => (i % 16, (i / 16) % 16, i / 256)).toDF("x", "y", "z")
    df.write.format("graft")
      .option("statsCols", "x,y,z").option("zorderCols", "x,y,z")
      .option("numFiles", "16").mode("append").save(base)
    def prunes(c: String): (Int, Int) = {
      spark.read.format("graft").load(base)
        .filter(col(c) === 3L).count()
      graft.sources.GraftScanMetrics.lastPrune(base).get
    }
    Seq("x", "y", "z").foreach { c =>
      val (kept, total) = prunes(c)
      assert(total === 16)
      assert(kept < 16, s"z-ordered layout should skip files on $c, " +
        s"kept $kept/16")
    }
  }

  test("optimizeN re-clusters an insert-ordered table on 3 keys") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_optn")
    val rnd = new scala.util.Random(13)
    rnd.shuffle((0L until 4096L).toList)
      .map(i => (i % 16, (i / 16) % 16, i / 256)).toDF("x", "y", "z")
      .write.format("graft").option("statsCols", "x,y,z")
      .option("numFiles", "16").mode("append").save(base)
    VersionedTable.optimizeN(spark, base, Seq("x", "y", "z"), 16)
    spark.read.format("graft").load(base).filter(col("y") === 7L).count()
    val (kept, total) = graft.sources.GraftScanMetrics.lastPrune(base).get
    assert(total === 16 && kept < 16)
    // row count intact across the rewrite
    assert(spark.read.format("graft").load(base).count() === 4096L)
  }
}
