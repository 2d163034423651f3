package graft.sources

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import org.apache.spark.sql.functions._

/** The DSv2 surface: `spark.read.format("graft")` must behave like a
  * first-class table — ordinary filters reach the manifest zone maps
  * (fewer files planned), time travel is a read option, SQL sees the
  * table, schema evolution null-fills — with Spark's parquet scan
  * doing the actual reading (PushedFilters visible in the plan).
  */
class GraftDataSourceSpec extends SparkSuite {

  private def mkTable(tag: String): String = {
    val base = TempDirs.scoped(s"graft_dsv2_$tag")
    val s = spark
    import s.implicits._
    // four one-file commits with disjoint key decades
    Seq(0L, 10L, 20L, 30L).foreach(lo => VersionedTable.commitAppend(
      spark, base,
      (lo until lo + 10L).map(k => (k, k * 2, s"name$k")).toDF("k", "v", "nm")
        .coalesce(1),
      statsCols = Seq("k", "nm")))
    base
  }

  test("write-time clustering: clusterBy tightens zone maps at ingest") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_dsv2_clusterby")
    // shuffled keys: without clustering, every file spans the domain
    val df = new scala.util.Random(7).shuffle((0L until 400L).toList)
      .map(k => (k, k * 3)).toDF("k", "v")
    df.write.format("graft")
      .option("statsCols", "k").option("clusterBy", "k")
      .option("numFiles", "8").mode("append").save(base)
    val got = spark.read.format("graft").load(base)
      .filter(col("k").between(100L, 149L))
    assert(got.count() === 50L)
    val (kept, total) = GraftScanMetrics.lastPrune(base).get
    assert(total === 8)
    assert(kept <= 2, s"range-clustered write should skip most files, " +
      s"kept $kept of $total")
    // zorderCols: the two-key variant, same ingest-time story
    val zb = TempDirs.scoped("graft_dsv2_zorderw")
    df.withColumn("w", col("k") % 20L).write.format("graft")
      .option("statsCols", "k,w").option("zorderCols", "k,w")
      .option("numFiles", "8").mode("append").save(zb)
    val zf = spark.read.format("graft").load(zb)
      .filter(col("k").between(100L, 149L))
    assert(zf.count() === 50L)
    assert(GraftScanMetrics.lastPrune(zb).exists(_._1 < 8))
  }

  test("format('graft'): full read, time travel via versionAsOf") {
    val base = mkTable("tt")
    val df = spark.read.format("graft").load(base)
    assert(df.count() === 40L)
    assert(df.columns.toSeq === Seq("k", "v", "nm"))
    val v2 = spark.read.format("graft").option("versionAsOf", "2").load(base)
    assert(v2.count() === 20L)
    assert(v2.agg(max(col("k"))).head().getLong(0) === 19L)
  }

  test("pushed filter prunes files at plan time; rows match unpruned read") {
    val base = mkTable("prune")
    val df = spark.read.format("graft").load(base)
      .filter(col("k").between(10L, 19L))
    val got = df.collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (10L to 19L))
    // the planned scan consulted the zone maps: 1 of 4 files kept
    assert(GraftScanMetrics.lastPrune(base) === Some((1, 4)))
    // and the executed plan carries the predicate into the parquet
    // scan (row-group pushdown is delegated machinery, not reinvented)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") || df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")).contains("PushedFilters"))
  }

  test("string-key filter prunes through StrStats zone maps") {
    val base = TempDirs.scoped("graft_dsv2_str")
    val s = spark
    import s.implicits._
    Seq(("alpha", "delta"), ("mike", "november"), ("xray", "zulu"))
      .foreach { case (a, b) =>
        VersionedTable.commitAppend(spark, base,
          Seq((a, 1L), (b, 2L)).toDF("nm", "v").coalesce(1),
          statsCols = Seq("nm"))
      }
    val one = spark.read.format("graft").load(base)
      .filter(col("nm") === "november")
    assert(one.collect().map(_.getLong(1)).toSeq === Seq(2L))
    assert(GraftScanMetrics.lastPrune(base) === Some((1, 3)))
  }

  test("SQL round-trip: CREATE TABLE USING graft, filtered SELECT prunes") {
    val base = mkTable("sql")
    spark.sql("DROP TABLE IF EXISTS graft_sql_rt")
    spark.sql(
      s"CREATE TABLE graft_sql_rt USING graft OPTIONS (path '$base')")
    try {
      val n = spark.sql(
        "SELECT count(*) AS n FROM graft_sql_rt WHERE k >= 30")
        .head().getLong(0)
      assert(n === 10L)
      assert(GraftScanMetrics.lastPrune(base) === Some((1, 4)))
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_rt")
  }

  test("schema evolution reads through the format: old files null-fill") {
    val base = TempDirs.scoped("graft_dsv2_evolve")
    val s = spark
    import s.implicits._
    VersionedTable.commitAppend(spark, base, Seq((1L, 10L)).toDF("k", "v"))
    VersionedTable.commitAppend(spark, base,
      Seq((2L, 20L, "en")).toDF("k", "v", "lang"))
    val df = spark.read.format("graft").load(base)
    assert(df.columns.toSeq === Seq("k", "v", "lang"))
    val byK = df.collect().map(r => r.getLong(0) ->
      Option(r.getAs[String]("lang"))).toMap
    assert(byK === Map(1L -> None, 2L -> Some("en")))
    // time travel sees the pre-evolution shape
    assert(spark.read.format("graft").option("versionAsOf", "1").load(base)
      .columns.toSeq === Seq("k", "v"))
  }

  test("write path: append/overwrite through format('graft'), stats via option") {
    val base = TempDirs.scoped("graft_dsv2_write")
    val s = spark
    import s.implicits._
    // two appends through the public writer — each is one commit
    // (path-based v2 writes take Append/Overwrite modes only)
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1)
      .write.format("graft").mode("append").option("statsCols", "k")
      .save(base)
    Seq((3L, 30L), (4L, 40L)).toDF("k", "v").coalesce(1)
      .write.format("graft").mode("append").option("statsCols", "k")
      .save(base)
    assert(VersionedTable.latestVersion(base) === Some(2L))
    assert(spark.read.format("graft").load(base)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    // the writer-declared statsCols produced real zone maps: an
    // equality filter prunes to one file
    val one = spark.read.format("graft").load(base).filter(col("k") === 3L)
    assert(one.collect().map(_.getLong(1)).toSeq === Seq(30L))
    assert(GraftScanMetrics.lastPrune(base) === Some((1, 2)))
    // overwrite = commitReplace: latest is exactly the new frame,
    // history keeps the pre-replace snapshot
    Seq((9L, 90L)).toDF("k", "v")
      .write.format("graft").mode("overwrite").save(base)
    assert(spark.read.format("graft").load(base)
      .collect().map(_.getLong(0)).toSeq === Seq(9L))
    assert(spark.read.format("graft").option("versionAsOf", "2").load(base)
      .count() === 4L)
    assert(VersionedTable.history(base).map(_._2) ===
      Seq("append", "append", "replace"))
  }

  test("SQL DML: CREATE TABLE with schema, INSERT INTO, empty-table read") {
    val base = TempDirs.scoped("graft_dsv2_dml")
    spark.sql("DROP TABLE IF EXISTS graft_dml")
    spark.sql(
      s"CREATE TABLE graft_dml (k BIGINT, v BIGINT) USING graft " +
        s"OPTIONS (path '$base')")
    try {
      // a created-but-never-committed table reads as zero rows of the
      // declared schema (not an error)
      assert(spark.sql("SELECT * FROM graft_dml").count() === 0L)
      spark.sql("INSERT INTO graft_dml VALUES (1, 10), (2, 20)")
      spark.sql("INSERT INTO graft_dml VALUES (3, 30)")
      assert(spark.sql("SELECT sum(k) AS s FROM graft_dml")
        .head().getLong(0) === 6L)
      assert(VersionedTable.latestVersion(base) === Some(2L))
      spark.sql("INSERT OVERWRITE graft_dml VALUES (7, 70)")
      assert(spark.sql("SELECT k FROM graft_dml").collect()
        .map(_.getLong(0)).toSeq === Seq(7L))
    } finally spark.sql("DROP TABLE IF EXISTS graft_dml")
  }

  test("a filter no zone map overlaps plans zero files, returns zero rows") {
    val base = mkTable("zero")
    val df = spark.read.format("graft").load(base).filter(col("k") > 1000L)
    assert(df.count() === 0L)
    assert(GraftScanMetrics.lastPrune(base) === Some((0, 4)))
  }

  test("SQL DELETE FROM rewrites only files the zone maps implicate") {
    val base = mkTable("del")
    spark.sql("DROP TABLE IF EXISTS graft_del")
    spark.sql(s"CREATE TABLE graft_del USING graft OPTIONS (path '$base')")
    try {
      spark.sql("DELETE FROM graft_del WHERE k BETWEEN 12 AND 17")
      assert(spark.sql("SELECT count(*) AS c FROM graft_del")
        .head().getLong(0) === 34L)
      assert(spark.sql("SELECT count(*) AS c FROM graft_del " +
        "WHERE k BETWEEN 12 AND 17").head().getLong(0) === 0L)
      // file-scoped: exactly ONE of the four decade files removed (the
      // 10-19 one), the rest carried forward untouched in the log
      val v = VersionedTable.latestVersion(base).get
      assert(v === 5L)
      val (op, _, removes) = VersionedTable.commitDelta(base, v)
      assert(op === "delete")
      assert(removes.size === 1)
      // a delete no zone map can match is a provable no-op: no commit
      spark.sql("DELETE FROM graft_del WHERE k > 1000")
      assert(VersionedTable.latestVersion(base) === Some(5L))
      // an untranslatable predicate is rejected at analysis, never a
      // silent partial delete
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("DELETE FROM graft_del WHERE nm LIKE 'name1%'")
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_del")
  }

  test("whole-table COUNT/MIN/MAX answer from the manifest: LocalScan, zero files") {
    val base = mkTable("agg")
    spark.sql("DROP TABLE IF EXISTS graft_agg")
    spark.sql(s"CREATE TABLE graft_agg USING graft OPTIONS (path '$base')")
    try {
      val before = GraftScanMetrics.aggPushdowns(base)
      val df = spark.sql(
        "SELECT count(*) AS n, min(k) AS klo, max(k) AS khi, " +
          "min(nm) AS nlo, max(nm) AS nhi FROM graft_agg")
      val r = df.head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)) === ((40L, 0L, 39L, "name0", "name9")))
      // the scan planned as a driver-local row — no file scan at all
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("LocalTableScan"), plan)
      assert(!plan.contains("BatchScan"), plan)
      // >=: head() plans its own limited query over the same logical
      // plan, so one user-visible query may build the scan twice
      assert(GraftScanMetrics.aggPushdowns(base) >= before + 1)
    } finally spark.sql("DROP TABLE IF EXISTS graft_agg")
  }

  test("manifest aggregates refuse when they can't be exact") {
    val base = mkTable("aggref")
    val df = spark.read.format("graft").load(base)
    // v has no zone maps -> the whole aggregation falls back to a real
    // scan (values still correct)
    val q1 = df.agg(min(col("v")).as("vlo"), max(col("k")).as("khi"))
    assert(q1.head() === org.apache.spark.sql.Row(0L, 39L))
    assert(q1.queryExecution.executedPlan.toString().contains("BatchScan"))
    // a filtered aggregate is never answered from whole-table stats
    val q2 = df.filter(col("k") >= 10L).agg(count(lit(1)).as("n"))
    assert(q2.head().getLong(0) === 30L)
    assert(q2.queryExecution.executedPlan.toString().contains("BatchScan"))
    // grouped aggregates fall through too
    val q3 = df.groupBy(col("nm")).count()
    assert(q3.count() === 40L)
    assert(q3.queryExecution.executedPlan.toString().contains("BatchScan"))
  }

  test("manifest aggregates stay exact across DML and time travel") {
    val base = mkTable("aggdml")
    spark.sql("DROP TABLE IF EXISTS graft_aggdml")
    spark.sql(s"CREATE TABLE graft_aggdml USING graft OPTIONS (path '$base')")
    try {
      spark.sql("DELETE FROM graft_aggdml WHERE k BETWEEN 8 AND 22")
      val r = spark.sql("SELECT count(*) AS n, min(k) AS klo, max(k) AS khi " +
        "FROM graft_aggdml").head()
      // 8..22 gone: files 0-9 and 20-29 rewritten with fresh counts/maps
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((25L, 0L, 39L)))
      // time travel answers from THAT version's manifest
      val v4 = spark.read.format("graft").option("versionAsOf", "4").load(base)
        .agg(count(lit(1)).as("n")).head().getLong(0)
      assert(v4 === 40L)
      // count() on the DataFrame API rides the same path
      assert(spark.read.format("graft").load(base).count() === 25L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_aggdml")
  }

  test("date-typed manifest aggregates decode back to DateType") {
    val base = TempDirs.scoped("graft_dsv2_aggdate")
    val s = spark
    import s.implicits._
    Seq("2024-01-05", "2024-03-01", "2023-11-30").zipWithIndex.foreach {
      case (d, i) =>
        VersionedTable.commitAppend(spark, base,
          Seq((i.toLong, java.sql.Date.valueOf(d))).toDF("k", "dt")
            .coalesce(1), statsCols = Seq("k", "dt"))
    }
    val df = spark.read.format("graft").load(base)
      .agg(min(col("dt")).as("lo"), max(col("dt")).as("hi"))
    val r = df.head()
    assert(r.getDate(0).toString === "2023-11-30")
    assert(r.getDate(1).toString === "2024-03-01")
    assert(df.queryExecution.executedPlan.toString()
      .contains("LocalTableScan"))
  }

  test("SQL UPDATE rewrites only implicated files; old values time-travel") {
    val base = mkTable("upd")
    spark.sql("DROP TABLE IF EXISTS graft_upd")
    spark.sql(s"CREATE TABLE graft_upd USING graft OPTIONS (path '$base')")
    try {
      spark.sql("UPDATE graft_upd SET v = v + 1000 WHERE k BETWEEN 12 AND 17")
      val got = spark.sql("SELECT k, v FROM graft_upd ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === (0L until 40L).map(k =>
        (k, if (k >= 12 && k <= 17) k * 2 + 1000 else k * 2)))
      // file-scoped: only the 10-19 decade file rewritten
      val v = VersionedTable.latestVersion(base).get
      assert(v === 5L)
      val (op, adds, removes) = VersionedTable.commitDelta(base, v)
      assert(op === "update")
      assert(adds.size === 1 && removes.size === 1)
      // pre-update values still time-travel
      assert(spark.read.format("graft").option("versionAsOf", "4").load(base)
        .filter(col("k") === 15L).head().getLong(1) === 30L)
      // the change feed sees exactly the six updates
      val feed = VersionedTable.changesPerCommit(spark, base, 4L, 5L, "k")
        .collect().map(r => (r.getLong(1), r.getString(r.length - 1))).sorted
      assert(feed.toSeq === (12L to 17L).map((_, "update")))
      // the rewritten file's zone maps are FRESH: a key filter after
      // the update still prunes to one file and finds the row
      val one = spark.read.format("graft").load(base)
        .filter(col("k") === 15L)
      assert(one.head().getLong(1) === 1030L)
      assert(GraftScanMetrics.lastPrune(base) === Some((1, 4)))
      // a provably-out-of-range update is a no-op: no commit
      spark.sql("UPDATE graft_upd SET v = 0 WHERE k > 5000")
      assert(VersionedTable.latestVersion(base) === Some(5L))
      // unconditional UPDATE rewrites everything
      spark.sql("UPDATE graft_upd SET v = k")
      assert(spark.sql("SELECT sum(v) AS s FROM graft_upd")
        .head().getLong(0) === (0L until 40L).sum)
      assert(VersionedTable.commitDelta(base, 6L)._3.size === 4)
    } finally spark.sql("DROP TABLE IF EXISTS graft_upd")
  }

  test("SQL MERGE INTO: clause cascade, footprint scope, cardinality check") {
    val base = mkTable("mrg")
    val s = spark
    import s.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_mrg")
    spark.sql(s"CREATE TABLE graft_mrg USING graft OPTIONS (path '$base')")
    try {
      // source: one update (k=15), one delete trigger (k=17, nv<0),
      // one insert (k=100)
      Seq((15L, 999L), (17L, -1L), (100L, 7L)).toDF("k", "nv")
        .createOrReplaceTempView("mrg_src")
      spark.sql(
        """MERGE INTO graft_mrg t USING mrg_src s ON t.k = s.k
           WHEN MATCHED AND s.nv < 0 THEN DELETE
           WHEN MATCHED THEN UPDATE SET v = s.nv
           WHEN NOT MATCHED THEN INSERT (k, v, nm) VALUES (s.k, s.nv, 'new')
        """)
      val got = spark.sql("SELECT k, v, nm FROM graft_mrg ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val want = (0L until 40L).filterNot(_ == 17L).map {
        case 15L => (15L, 999L, "name15")
        case k => (k, k * 2, s"name$k")
      } :+ ((100L, 7L, "new"))
      assert(got.toSeq === want)
      // footprint: only the 10-19 decade file was touched (15 and 17
      // live there; 100 matches nothing) — 1 removed, not 4
      val v = VersionedTable.latestVersion(base).get
      val (op, _, removes) = VersionedTable.commitDelta(base, v)
      assert(op === "merge")
      assert(removes.size === 1)
      // pre-merge state still time-travels
      assert(spark.read.format("graft").option("versionAsOf", s"${v - 1}")
        .load(base).count() === 40L)
      // duplicate source keys that MATCH a target row: loud cardinality
      // error, nothing committed
      Seq((20L, 1L), (20L, 2L)).toDF("k", "nv")
        .createOrReplaceTempView("mrg_dup")
      val e = intercept[Exception] {
        spark.sql(
          """MERGE INTO graft_mrg t USING mrg_dup s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET v = s.nv
             WHEN NOT MATCHED THEN INSERT (k, v, nm) VALUES (s.k, s.nv, 'x')
          """)
      }
      assert(e.getMessage.contains("cardinality"), e.getMessage)
      assert(VersionedTable.latestVersion(base) === Some(v))
      // duplicate source keys that DON'T match any target row insert
      // twice — the SQL-legal case the check must not reject
      Seq((200L, 1L), (200L, 2L)).toDF("k", "nv")
        .createOrReplaceTempView("mrg_dup2")
      spark.sql(
        """MERGE INTO graft_mrg t USING mrg_dup2 s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.nv
           WHEN NOT MATCHED THEN INSERT (k, v, nm) VALUES (s.k, s.nv, 'x')
        """)
      assert(spark.sql("SELECT count(*) AS c FROM graft_mrg WHERE k = 200")
        .head().getLong(0) === 2L)
      // a merge whose source matches nothing and has no applicable
      // insert rows is a provable no-op: no commit
      val v2 = VersionedTable.latestVersion(base).get
      Seq((300L, 1L)).toDF("k", "nv").createOrReplaceTempView("mrg_noop")
      spark.sql(
        """MERGE INTO graft_mrg t USING mrg_noop s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.nv
        """)
      assert(VersionedTable.latestVersion(base) === Some(v2))
    } finally spark.sql("DROP TABLE IF EXISTS graft_mrg")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: full-sync semantics") {
    val base = mkTable("mrgsync")
    val s = spark
    import s.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_mrgsync")
    spark.sql(
      s"CREATE TABLE graft_mrgsync USING graft OPTIONS (path '$base')")
    try {
      // the sync shape: source IS the desired state for k < 20 —
      // matched rows update, unmatched source rows insert, and target
      // rows ABSENT from the source either flag (small k) or delete
      (0L until 15L).map(k => (k, k * 100L)).toDF("k", "nv")
        .createOrReplaceTempView("sync_src")
      spark.sql(
        """MERGE INTO graft_mrgsync t USING sync_src s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.nv
           WHEN NOT MATCHED THEN INSERT (k, v, nm) VALUES (s.k, s.nv, 'new')
           WHEN NOT MATCHED BY SOURCE AND t.k < 25 THEN UPDATE SET v = -1
           WHEN NOT MATCHED BY SOURCE THEN DELETE
        """)
      val got = spark.sql("SELECT k, v FROM graft_mrgsync ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // 0..14 updated to k*100; 15..24 unmatched-by-source + k<25 -> -1;
      // 25..39 unmatched-by-source -> deleted; nothing inserted (source
      // keys all existed)
      assert(got === ((0L until 15L).map(k => (k, k * 100L)) ++
        (15L until 25L).map(k => (k, -1L))))
      // every file rewritten: the bySource clause is O(table) by nature
      val v = VersionedTable.latestVersion(base).get
      assert(VersionedTable.commitDelta(base, v)._3.size === 4)
    } finally spark.sql("DROP TABLE IF EXISTS graft_mrgsync")
  }

  test("TRUNCATE via an always-true DELETE leaves a readable empty table") {
    val base = mkTable("trunc")
    spark.sql("DROP TABLE IF EXISTS graft_trunc")
    spark.sql(s"CREATE TABLE graft_trunc USING graft OPTIONS (path '$base')")
    try {
      spark.sql("DELETE FROM graft_trunc WHERE true")
      assert(spark.sql("SELECT * FROM graft_trunc").count() === 0L)
      // history intact: pre-delete versions still time-travel
      assert(spark.read.format("graft").option("versionAsOf", "4")
        .load(base).count() === 40L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_trunc")
  }
}
