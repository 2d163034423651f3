package graft.sources

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import graft.operators.VersionedTable.{BloomStats, KeyProbe}
import org.apache.spark.sql.functions._

/** Bloom-filter file skipping: the point-lookup complement to min/max
  * zone maps. The fixture scatters keys by hash (k % 8 per file), so
  * every file's min/max spans nearly the whole domain — range pruning
  * keeps everything, the bloom keeps the one file that can hold the
  * key.
  */
class BloomSkippingSpec extends SparkSuite {

  private def mkScattered(tag: String, n: Long = 400L): String = {
    val base = TempDirs.scoped(s"graft_bloom_$tag")
    val s = spark
    import s.implicits._
    val t = (0L until n).map(k => (k * 7919L % 100000L, k)).toDF("k", "v")
    (0L until 8L).foreach { b =>
      VersionedTable.commitAppend(spark, base,
        t.filter(pmod(col("k"), lit(8L)) === b).coalesce(1),
        statsCols = Seq("k"), bloomCols = Seq("k"))
    }
    base
  }

  test("driver probe positions equal Spark's xxhash64 chain") {
    val s = spark
    import s.implicits._
    val longs = (0 until 50).map(i => i * 104729L - 3L)
    val strs = (0 until 50).map(i => s"doc-$i-${"x" * (i % 9)}")
    val m = VersionedTable.BloomBits.toLong
    (0 until VersionedTable.BloomHashes).foreach { j =>
      val sparkLong = longs.toDF("x")
        .select(pmod(xxhash64(lit(j.toLong), col("x")), lit(m)))
        .collect().map(_.getLong(0)).toSeq
      assert(sparkLong === longs.map(v =>
        VersionedTable.bloomPositions(v, j + 1, m.toInt).last.toLong))
      val sparkStr = strs.toDF("x")
        .select(pmod(xxhash64(lit(j.toLong), col("x")), lit(m)))
        .collect().map(_.getLong(0)).toSeq
      assert(sparkStr === strs.map(v =>
        VersionedTable.bloomPositions(v, j + 1, m.toInt).last.toLong))
    }
  }

  test("equality keeps 1/8 files where min/max keeps all; rows exact") {
    val base = mkScattered("eq")
    val es = VersionedTable.entries(base, 8L)
    assert(es.size === 8)
    // the scattered layout defeats range pruning for this key...
    val probe = 3L * 7919L % 100000L // k of v=3
    val rangeKept = VersionedTable.prune(es,
      Seq(("k", probe, probe))).size
    assert(rangeKept === 8, s"fixture not scattered: $rangeKept")
    // ...but the bloom keeps exactly the one file holding it
    val df = spark.read.format("graft").load(base)
      .filter(col("k") === probe)
    assert(df.collect().map(_.getLong(1)).toSeq === Seq(3L))
    assert(GraftScanMetrics.lastPrune(base) === Some((1, 8)))
  }

  test("no false negatives: every present key finds its row") {
    val base = mkScattered("fn", n = 100L)
    val es = VersionedTable.entries(base, 8L)
    (0L until 100L).foreach { v =>
      val key = v * 7919L % 100000L
      val kept = VersionedTable.pruneTyped(es,
        Seq(KeyProbe("k", Seq(key))))
      // the key's own file always survives the probe
      assert(kept.exists(e => e.stats.get("k#bloom").exists {
        case BloomStats(k, bits) =>
          VersionedTable.bloomMayContain(key, k, bits)
        case _ => false
      }), s"false negative for $key")
    }
    // spot-check through the full read path
    val df = spark.read.format("graft").load(base)
      .filter(col("k") === 42L * 7919L % 100000L)
    assert(df.count() === 1L)
  }

  test("absent key prunes everything; IN probes any-match") {
    val base = mkScattered("abs")
    val df = spark.read.format("graft").load(base)
      .filter(col("k") === 99999999L)
    assert(df.count() === 0L)
    assert(GraftScanMetrics.lastPrune(base).get._1 <= 1) // fp margin
    val k1 = 3L * 7919L % 100000L
    val k2 = 5L * 7919L % 100000L
    val in = spark.read.format("graft").load(base)
      .filter(col("k").isin(k1, k2))
    assert(in.count() === 2L)
    assert(GraftScanMetrics.lastPrune(base).get._1 <= 3)
  }

  test("DML rewrites preserve the bloom discipline") {
    val base = mkScattered("dml")
    val probe = 3L * 7919L % 100000L
    spark.sql("DROP TABLE IF EXISTS graft_bloom_dml")
    spark.sql(
      s"CREATE TABLE graft_bloom_dml USING graft OPTIONS (path '$base')")
    try {
      spark.sql(s"UPDATE graft_bloom_dml SET v = v + 1 WHERE k = $probe")
      // the rewritten file carries a FRESH bloom: the probe still
      // prunes to one file and sees the updated value
      val df = spark.read.format("graft").load(base)
        .filter(col("k") === probe)
      assert(df.collect().map(_.getLong(1)).toSeq === Seq(4L))
      assert(GraftScanMetrics.lastPrune(base) === Some((1, 8)))
      val v = VersionedTable.latestVersion(base).get
      val (_, adds, _) = VersionedTable.commitDelta(base, v)
      assert(adds.forall(_.stats.contains("k#bloom")))
    } finally spark.sql("DROP TABLE IF EXISTS graft_bloom_dml")
  }
}
