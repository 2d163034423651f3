package graft.operators

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

/** Manifest NDV sketches: commit-time KMV per file, merged driver-
  * plane into table-level distinct-count estimates that feed the
  * optimizer's column statistics — ANALYZE TABLE the table never runs.
  */
class NdvStatsSpec extends SparkSuite {

  test("merged manifest sketches estimate NDV within tolerance") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_ndv")
    // 4 commits, overlapping value sets: k has 3000 distinct overall,
    // g has 7 — the estimate must fold across files, not sum them
    (0L until 4L).foreach(i => VersionedTable.commitAppend(spark, base,
      (0L until 2000L).map(j => (i * 500L + j, (i * 500L + j) % 7L))
        .toDF("k", "g").coalesce(1),
      statsCols = Seq("k"), ndvCols = Seq("k", "g")))
    val v = VersionedTable.latestVersion(base).get
    val ndv = VersionedTable.ndvEstimates(base, v)
    assert(ndv.keySet === Set("k", "g"))
    assert(ndv("g") === 7L) // under k: exact
    val exactK = 3500L // ids 0..3499 across the 4 overlapping commits
    assert(math.abs(ndv("k") - exactK).toDouble / exactK < 0.25,
      s"NDV estimate ${ndv("k")} vs exact $exactK out of tolerance")
  }

  test("CBO sees distinctCount via the scan's column statistics") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_ndv_cbo")
    (0L until 1000L).map(j => (j, j % 5L)).toDF("k", "g")
      .write.format("graft").mode("append")
      .option("statsCols", "k").option("ndvCols", "g").save(base)
    val df = spark.read.format("graft").load(base)
    val found = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation =>
        val st = r.scan.asInstanceOf[org.apache.spark.sql.connector.read
          .SupportsReportStatistics].estimateStatistics()
        val cs = st.columnStats()
        assert(!cs.isEmpty, "expected manifest column stats")
        val g = cs.entrySet().iterator().next()
        assert(g.getKey.toString === "g")
        assert(g.getValue.distinctCount().getAsLong === 5L)
        true
    }
    assert(found.nonEmpty)
    // the discipline is STICKY: a later plain append re-collects and
    // the estimate tracks the new value
    VersionedTable.commitAppend(spark, base,
      Seq((9999L, 9L)).toDF("k", "g").coalesce(1))
    assert(VersionedTable.ndvEstimates(base,
      VersionedTable.latestVersion(base).get).get("g").contains(6L))
    // a frame genuinely LACKING the column skips its sketch, and the
    // fold then refuses that column (graceful degrade, never a lie)
    VersionedTable.commitAppend(spark, base,
      Seq((10000L, "x")).toDF("k", "z").coalesce(1))
    assert(VersionedTable.ndvEstimates(base,
      VersionedTable.latestVersion(base).get).isEmpty)
  }

  test("NDV discipline is table-sticky: DML rewrites keep answering") {
    val ns = s"ndv_${java.util.UUID.randomUUID().toString.take(8)}"
    val t = s"graft.$ns.t"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/" +
      s"$ns/t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, g BIGINT)")
    try {
      val s = spark
      import s.implicits._
      VersionedTable.commitAppend(spark, base,
        (0L until 1000L).map(j => (j, j % 5L)).toDF("k", "g").coalesce(1),
        statsCols = Seq("k"), ndvCols = Seq("g"))
      // the r11 regression: a '#kmv' token misread as a zone-map
      // column crashed SQL DELETE/UPDATE on any ndv'd table
      spark.sql(s"DELETE FROM $t WHERE k < 100")
      spark.sql(s"UPDATE $t SET g = 0 WHERE k < 200")
      val v = VersionedTable.latestVersion(base).get
      // rewritten files RE-COLLECTED the sketch: estimates still answer
      val ndv = VersionedTable.ndvEstimates(base, v)
      assert(ndv.get("g").contains(5L))
      assert(spark.sql(s"SELECT count(*) AS c FROM $t").head()
        .getLong(0) === 900L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("CALL graft.system.analyze retrofits sketches; then sticky") {
    val ns = s"ana_${java.util.UUID.randomUUID().toString.take(8)}"
    val t = s"graft.$ns.t"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/" +
      s"$ns/t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, g BIGINT)")
    try {
      spark.sql(s"INSERT INTO $t SELECT id, id % 4 FROM range(500)")
      spark.sql(s"INSERT INTO $t SELECT id + 500, id % 4 FROM range(500)")
      // no sketches yet
      assert(VersionedTable.ndvEstimates(base,
        VersionedTable.latestVersion(base).get).isEmpty)
      spark.sql(s"CALL graft.system.analyze('$ns.t', 'g')")
      val v = VersionedTable.latestVersion(base).get
      assert(VersionedTable.ndvEstimates(base, v).get("g").contains(4L))
      // rows unchanged; analyze is stats-only
      assert(spark.sql(s"SELECT count(*) AS c FROM $t").head()
        .getLong(0) === 1000L)
      // sticky: a later INSERT keeps the discipline
      spark.sql(s"INSERT INTO $t VALUES (2000, 9)")
      assert(VersionedTable.ndvEstimates(base,
        VersionedTable.latestVersion(base).get).get("g").contains(5L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("graft_detail reports the estimates; round-trip through the log") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_ndv_detail")
    VersionedTable.commitAppend(spark, base,
      (0L until 100L).map(j => (j, j % 3L)).toDF("k", "g").coalesce(1),
      ndvCols = Seq("g"))
    val r = spark.sql(s"SELECT ndv_estimates FROM graft_detail('$base')")
      .head().getString(0)
    assert(r === "g≈3")
  }
}
