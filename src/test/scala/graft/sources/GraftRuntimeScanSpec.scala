package graft.sources

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import org.apache.spark.sql.functions._

/** Dynamic file pruning ([[GraftRuntimeScan]]): join-key values that
  * only exist at runtime must prune fact files through the same
  * zone-map/bloom machinery plan-time literals use — and pruning must
  * never change the join's answer.
  */
class GraftRuntimeScanSpec extends SparkSuite {

  /** A 4-file fact table with disjoint 10k-key decades and zone maps
    * on k — big enough (r12) that its exact-rowcount stats (rows ×
    * width, the CBO upgrade) still dwarf the dimension, so the dim
    * broadcasts and DPP targets the fact side as it would at scale.
    */
  private def mkFact(tag: String): String = {
    val base = TempDirs.scoped(s"graft_dfp_$tag")
    val s = spark
    import s.implicits._
    Seq(0L, 10000L, 20000L, 30000L).foreach(lo => VersionedTable.commitAppend(
      spark, base,
      (lo until lo + 10000L).map(k => (k, k * 7)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k")))
    base
  }

  /** A parquet-backed dimension (the Filter node must survive the
    * optimizer — a filtered LocalRelation constant-folds away and
    * PartitionPruning sees no selective build side).
    */
  private def mkDim(tag: String): String = {
    val s = spark
    import s.implicits._
    val p = TempDirs.scoped(s"graft_dfp_dim_$tag")
    // grp is the correlated dimension attribute (the date-dim shape:
    // fact clustered by the dim key, dim filtered on an attribute);
    // sparse keys — a dimension is orders smaller than the fact
    (0L until 40000L by 100L).map(k => (k, k / 10000L, s"attr$k"))
      .toDF("k", "grp", "attr").write.mode("overwrite").parquet(p)
    p
  }

  test("join keys prune fact files at runtime (dynamic file pruning)") {
    val base = mkFact("bhj")
    val dim = spark.read.parquet(mkDim("bhj")).filter(col("grp") === 1L)
    val fact = spark.read.format("graft").load(base)
    val out = fact.join(dim, "k").agg(
      count(lit(1)).as("n"), sum(col("v")).as("sv")).head()
    // correctness first: every 100th key of [10000,20000)
    assert(out.getLong(0) === 100L)
    assert(out.getLong(1) === 7L * (10000L until 20000L by 100L).sum)
    // the runtime filter reached the manifest: 1 of 4 files survived
    assert(GraftScanMetrics.lastRuntimePrune(base) === Some((1, 4)))
  }

  test("dynamic file pruning survives a RENAME of the join key (r13)") {
    val base = mkFact("cmdfp")
    VersionedTable.alterRenameColumn(base, "k", "key")
    val dim = spark.read.parquet(mkDim("cmdfp")).filter(col("grp") === 1L)
    // the mapped read plans as a physical-schema DSv2 scan under a
    // renaming Project; PartitionPruning traces the logical join key
    // through the alias to the scan's physical attribute, so the
    // runtime filter still reaches the manifest's physical tokens
    val fact = spark.read.format("graft").load(base)
      .withColumnRenamed("key", "k")
    val out = fact.join(dim, "k").agg(
      count(lit(1)).as("n"), sum(col("v")).as("sv")).head()
    assert(out.getLong(0) === 100L)
    assert(out.getLong(1) === 7L * (10000L until 20000L by 100L).sum)
    assert(GraftScanMetrics.lastRuntimePrune(base) === Some((1, 4)))
  }

  test("the planned scan carries a dynamicpruning subquery") {
    val base = mkFact("plan")
    val dim = spark.read.parquet(mkDim("plan")).filter(col("grp") === 2L)
    val fact = spark.read.format("graft").load(base)
    val df = fact.join(dim, "k").agg(sum(col("v")).as("sv"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic-pruning runtime filter on the graft scan:\n$plan")
  }

  test("scattered point keys prune via bloom probes where spans cannot") {
    val base = TempDirs.scoped("graft_dfp_bloom")
    val s = spark
    import s.implicits._
    // interleaved keys: every file's [min,max] span covers the whole
    // domain, so only the bloom probe can skip
    // 250 keys/file — inside the bloom's ~300-key capacity (a
    // saturated bloom keeps everything and proves nothing); the fact's
    // exact-stats size (1000 rows x 16 B) still exceeds the 10-row
    // dim's parquet footprint, so the dim is the broadcast side
    (0L until 4L).foreach(r => VersionedTable.commitAppend(
      spark, base,
      (0L until 250L).map(i => (i * 4L + r, i)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"), bloomCols = Seq("k")))
    val dimP = TempDirs.scoped("graft_dfp_bloom_dim")
    (0L until 1000L by 100L).map(k => (k, if (k == 400L) 1L else 0L))
      .toDF("k", "sel").write.mode("overwrite").parquet(dimP)
    val dim = spark.read.parquet(dimP).filter(col("sel") === 1L)
    val fact = spark.read.format("graft").load(base)
    val got = fact.join(dim, "k").select(col("v")).head().getLong(0)
    assert(got === 100L) // 400 = 100*4 + 0
    val (kept, total) = GraftScanMetrics.lastRuntimePrune(base).get
    assert(total === 4)
    // key 17 lives in exactly one file; blooms may (rarely) keep a
    // false positive but must keep the true file and skip the rest
    assert(kept <= 2, s"bloom runtime prune kept $kept of $total")
  }

  test("unfiltered scan reports the manifest's EXACT row count as stats") {
    val base = mkFact("stats")
    val df = spark.read.format("graft").load(base)
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation =>
        val st = r.scan
          .asInstanceOf[org.apache.spark.sql.connector.read
            .SupportsReportStatistics].estimateStatistics()
        assert(st.numRows().isPresent && st.numRows().getAsLong === 40000L)
    }.ensuring(_.nonEmpty, "expected a DSv2 scan relation in the plan")
    // a filtered scan refuses the exact claim (physical ≠ filtered)
    val f = spark.read.format("graft").load(base).filter(col("k") > 5L)
    f.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation =>
        val st = r.scan
          .asInstanceOf[org.apache.spark.sql.connector.read
            .SupportsReportStatistics].estimateStatistics()
        assert(!st.numRows().isPresent)
    }
  }

  test("zone-map extrema surface as CBO column min/max and reach " +
      "catalyst attribute stats") {
    val base = mkFact("cbomm")
    val df = spark.read.format("graft").load(base)
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation =>
        val st = r.scan
          .asInstanceOf[org.apache.spark.sql.connector.read
            .SupportsReportStatistics].estimateStatistics()
        val cs = st.columnStats()
        val kStats = cs.entrySet().iterator()
        var found = false
        while (kStats.hasNext) {
          val e = kStats.next()
          if (e.getKey.toString == "k") {
            found = true
            assert(e.getValue.min().isPresent &&
              e.getValue.max().isPresent)
            assert(e.getValue.min().get() === 0L)
            assert(e.getValue.max().get() === 39999L)
          }
        }
        assert(found, s"no column stats for k in $cs")
    }.ensuring(_.nonEmpty, "expected a DSv2 scan relation in the plan")
    // with CBO on, the extrema land in the optimizer's per-attribute
    // ColumnStat — the join-cardinality / selectivity input (a pushed
    // range filter's scan keeps REFUSING numRows: exactness and
    // estimation stay separate claims, the r11 discipline)
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val st = spark.read.format("graft").load(base)
        .queryExecution.optimizedPlan.stats
      assert(st.rowCount.exists(_.toLong === 40000L))
      val kStat = st.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == "k" => cs }
      assert(kStat.isDefined, s"no attribute stats for k: $st")
      assert(kStat.get.min === Some(0L) && kStat.get.max === Some(39999L),
        s"zone-map extrema must reach catalyst ColumnStat: ${kStat.get}")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("disjoint-range files with NDV sketches surface as an exact " +
      "variable-width histogram; overlapping or sketch-less layouts refuse") {
    val s = spark
    import s.implicits._
    def scanStats(base: String) = {
      var out: Option[org.apache.spark.sql.connector.read.Statistics] = None
      spark.read.format("graft").load(base)
        .queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation =>
            out = Some(r.scan.asInstanceOf[org.apache.spark.sql.connector
              .read.SupportsReportStatistics].estimateStatistics())
        }
      out.get
    }
    def histoOf(base: String) = {
      val cs = scanStats(base).columnStats()
      val it = cs.entrySet().iterator()
      var h: Option[org.apache.spark.sql.connector.read.colstats
        .Histogram] = None
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.toString == "k" && e.getValue.histogram().isPresent)
          h = Some(e.getValue.histogram().get())
      }
      h
    }
    // clustered layout + ndv sketches: per-file ranges ARE the bins
    val base = TempDirs.scoped("graft_histo")
    Seq(0L, 1000L, 2000L, 3000L).foreach(lo =>
      VersionedTable.commitAppend(spark, base,
        (lo until lo + 1000L).map(k => (k, k)).toDF("k", "v").coalesce(1),
        statsCols = Seq("k"), ndvCols = Seq("k")))
    val h = histoOf(base)
    assert(h.isDefined, "disjoint sketched layout must report a histogram")
    val bins = h.get.bins()
    assert(bins.length === 4)
    assert(bins.head.lo() === 0.0 && bins.head.hi() === 999.0)
    assert(bins.last.lo() === 3000.0 && bins.last.hi() === 3999.0)
    assert(bins.forall(b => b.ndv() > 500L && b.ndv() <= 1000L),
      s"per-bin ndv must come from the KMV sketch: " +
        s"${bins.map(_.ndv()).toSeq}")
    assert(h.get.height() === 1000.0)
    // and it reaches catalyst under CBO
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val st = spark.read.format("graft").load(base)
        .queryExecution.optimizedPlan.stats
      val kStat = st.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == "k" => cs }
      assert(kStat.exists(_.histogram.isDefined),
        s"histogram must reach catalyst ColumnStat: $kStat")
      assert(kStat.get.histogram.get.bins.length === 4)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
    // OVERLAPPING ranges refuse (bin populations would be fictitious)
    val base2 = TempDirs.scoped("graft_histo_ovl")
    Seq(0L, 1L).foreach(r =>
      VersionedTable.commitAppend(spark, base2,
        (0L until 100L).map(i => (i * 2 + r, i)).toDF("k", "v").coalesce(1),
        statsCols = Seq("k"), ndvCols = Seq("k")))
    assert(histoOf(base2).isEmpty,
      "interleaved ranges must refuse the histogram claim")
    // sketch-less files refuse (per-bin ndv must be grounded)
    val base3 = TempDirs.scoped("graft_histo_nosketch")
    Seq(0L, 1000L).foreach(lo =>
      VersionedTable.commitAppend(spark, base3,
        (lo until lo + 1000L).map(k => (k, k)).toDF("k", "v").coalesce(1),
        statsCols = Seq("k")))
    assert(histoOf(base3).isEmpty)
  }

  test("runtime pruning never loses rows: join equals parquet twin") {
    val base = mkFact("twin")
    val s = spark
    import s.implicits._
    val twinP = TempDirs.scoped("graft_dfp_twin")
    spark.read.format("graft").load(base)
      .write.mode("overwrite").parquet(twinP)
    val dim = spark.read.parquet(mkDim("twin")).filter(col("grp") >= 2L)
    def agg(f: org.apache.spark.sql.DataFrame) =
      f.join(dim, "k").agg(count(lit(1)), sum(col("v"))).head()
    val a = agg(spark.read.format("graft").load(base))
    val b = agg(spark.read.parquet(twinP))
    assert(a === b)
  }
}
