package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The graft catalog: name-addressed tables over the warehouse
  * layout, SQL VERSION AS OF, and the full DML surface through
  * catalog identifiers.
  */
class GraftCatalogSpec extends SparkSuite {

  private val ns = s"ns${System.nanoTime() % 1000000}"

  test("create, insert, time travel, DML, rename, drop — all by name") {
    val t = s"graft.$ns.orders"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    // created-empty: reads as zero rows of the declared shape, v1
    assert(spark.sql(s"SELECT * FROM $t").columns.toSeq === Seq("k", "v"))
    assert(spark.sql(s"SELECT * FROM $t").count() === 0L)
    // duplicate create fails loudly
    intercept[Exception] { spark.sql(s"CREATE TABLE $t (k BIGINT)") }
    spark.sql(s"INSERT INTO $t VALUES (1, 10), (2, 20)")
    spark.sql(s"INSERT INTO $t VALUES (3, 30)")
    assert(spark.sql(s"SELECT sum(v) AS s FROM $t").head().getLong(0)
      === 60L)
    // SQL time travel: the analyzer's own VERSION AS OF resolution
    assert(spark.sql(s"SELECT count(*) AS c FROM $t VERSION AS OF 1")
      .head().getLong(0) === 0L)
    assert(spark.sql(s"SELECT count(*) AS c FROM $t VERSION AS OF 2")
      .head().getLong(0) === 2L)
    // TIMESTAMP AS OF: a pre-table instant fails loudly; "now"
    // resolves to the latest version (in-commit timestamps —
    // GraftTimestampTravelSpec covers mid-history resolution)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $t TIMESTAMP AS OF '2026-01-01'").collect()
    }
    assert(e.getMessage.contains("did not exist"), e.getMessage)
    assert(spark.sql(s"SELECT count(*) AS c FROM $t TIMESTAMP AS OF " +
      "current_timestamp()").head().getLong(0) === 3L)
    // the DML surface rides the same GraftTable
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE k = 2")
    spark.sql(s"DELETE FROM $t WHERE k = 1")
    val s2 = spark
    import s2.implicits._
    Seq((3L, 99L), (4L, 40L)).toDF("k", "nv")
      .createOrReplaceTempView("cat_src")
    spark.sql(
      s"""MERGE INTO $t tt USING cat_src s ON tt.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.nv
          WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""")
    assert(spark.sql(s"SELECT k, v FROM $t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((2L, 21L), (3L, 99L), (4L, 40L)))
    // pre-DML state still time-travels by name
    assert(spark.sql(s"SELECT count(*) AS c FROM $t VERSION AS OF 3")
      .head().getLong(0) === 3L)
    // rename keeps content; old name gone (the target resolves in the
    // SAME catalog, so it is written catalog-less)
    spark.sql(s"ALTER TABLE $t RENAME TO $ns.orders2")
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.$ns.orders2")
      .head().getLong(0) === 3L)
    intercept[Exception] { spark.sql(s"SELECT * FROM $t").collect() }
    assert(spark.sql(s"SHOW TABLES IN graft.$ns").collect()
      .map(_.getString(1)).toSeq === Seq("orders2"))
    spark.sql(s"DROP TABLE graft.$ns.orders2")
    assert(spark.sql(s"SHOW TABLES IN graft.$ns").count() === 0L)
  }

  test("catalog reads prune and answer aggregates like path reads") {
    val t = s"graft.$ns.pruned"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    (0L until 4L).foreach { b =>
      val s2 = spark
      import s2.implicits._
      (b * 10L until b * 10L + 10L).map(k => (k, k * 2)).toDF("k", "v")
        .coalesce(1).write.format("graft").mode("append")
        .option("statsCols", "k")
        .insertInto(t)
    }
    // zone-map pruning through the catalog identifier
    val q = spark.sql(s"SELECT v FROM $t WHERE k BETWEEN 10 AND 19")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ===
      (10L to 19L).map(_ * 2))
    // manifest aggregate: LocalScan by name
    val agg = spark.sql(s"SELECT count(*) AS n, max(k) AS mx FROM $t")
    assert(agg.head() === org.apache.spark.sql.Row(40L, 39L))
    assert(agg.queryExecution.executedPlan.toString()
      .contains("LocalTableScan"))
    spark.sql(s"DROP TABLE $t")
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only; old files null-fill") {
    import graft.operators.VersionedTable
    val t = s"graft.$ns.evolved"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse" +
      s"/$ns/evolved"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10), (2, 20)")
    val filesBefore = VersionedTable.entries(base, 2L).map(_.path).toSet

    spark.sql(s"ALTER TABLE $t ADD COLUMNS (tag STRING, score DOUBLE)")
    // metadata-only: v3 exists, no data files added or removed
    assert(VersionedTable.latestVersion(base) === Some(3L))
    assert(VersionedTable.entries(base, 3L).map(_.path).toSet
      === filesBefore)
    val (op, adds, removes) = VersionedTable.commitDelta(base, 3L)
    assert(op === "alter_schema" && adds.isEmpty && removes.isEmpty)
    // old rows null-fill the new columns; new writes carry them
    assert(spark.sql(s"SELECT * FROM $t").columns.toSeq
      === Seq("k", "v", "tag", "score"))
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE tag IS NULL")
      .head().getLong(0) === 2L)
    spark.sql(s"INSERT INTO $t VALUES (3, 30, 'x', 0.5)")
    assert(spark.sql(s"SELECT tag FROM $t WHERE k = 3").head()
      .getString(0) === "x")
    // time travel keeps the pre-ALTER shape
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 2").columns.toSeq
      === Seq("k", "v"))
    // existing column, NOT NULL, and non-ADD alterations fail loudly
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (v BIGINT)")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (req BIGINT NOT NULL)")
    }
    // retypes still refuse loudly; RENAME/DROP became first-class in
    // r12 (column mapping — ColumnMappingSpec covers them)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE STRING")
    }
    // the refusals published nothing
    assert(VersionedTable.latestVersion(base) === Some(4L))
    // ...and DROP COLUMN, formerly refused, is a metadata-only commit
    spark.sql(s"ALTER TABLE $t DROP COLUMN tag")
    assert(VersionedTable.latestVersion(base) === Some(5L))
    assert(spark.sql(s"SELECT * FROM $t").columns.toSeq
      === Seq("k", "v", "score"))
    spark.sql(s"DROP TABLE $t")
  }
}
