package graft.sources

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import org.apache.spark.sql.functions._

/** TIMESTAMP AS OF: in-commit timestamps are strictly increasing even
  * under rapid commits, and both the SQL literal and the
  * `timestampAsOf` read option resolve to the latest version at-or-
  * before the instant.
  */
class GraftTimestampTravelSpec extends SparkSuite {

  test("in-commit timestamps strictly increase under rapid commits") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_ts_mono")
    (1L to 5L).foreach(i => VersionedTable.commitAppend(spark, base,
      Seq((i, i)).toDF("k", "v").coalesce(1)))
    val ts = (1L to 5L).map(v =>
      VersionedTable.commitTimestamp(base, v).get)
    assert(ts === ts.sorted)
    assert(ts.distinct.size === 5, s"timestamps must be STRICTLY " +
      s"increasing (rapid same-millisecond commits bump): $ts")
  }

  test("timestampAsOf read option resolves the snapshot at the instant") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_ts_opt")
    VersionedTable.commitAppend(spark, base,
      Seq((1L, "a")).toDF("k", "v").coalesce(1))
    val t1 = VersionedTable.commitTimestamp(base, 1L).get
    VersionedTable.commitAppend(spark, base,
      Seq((2L, "b")).toDF("k", "v").coalesce(1))
    val t2 = VersionedTable.commitTimestamp(base, 2L).get
    assert(t2 > t1)
    // an instant between the commits sees only v1
    val mid = spark.read.format("graft")
      .option("timestampAsOf", (t2 - 1L).toString).load(base)
    assert(mid.collect().map(_.getLong(0)).toSeq === Seq(1L))
    // at-or-after the second commit sees both
    val late = spark.read.format("graft")
      .option("timestampAsOf", t2.toString).load(base)
    assert(late.count() === 2L)
    // before the table existed: loud failure
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .option("timestampAsOf", (t1 - 1L).toString).load(base)
    }
    assert(e.getMessage.contains("did not exist"))
  }

  test("SQL TIMESTAMP AS OF through the catalog") {
    val ns = s"ts_${java.util.UUID.randomUUID().toString.take(8)}"
    val t = s"graft.$ns.t"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(3)")
    try {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/" +
        s"$ns/t"
      val v2ts = VersionedTable.commitTimestamp(base,
        VersionedTable.latestVersion(base).get).get
      spark.sql(s"INSERT INTO $t SELECT id + 10 AS k FROM range(3)")
      // UTC timestamp string of the CTAS data commit: sees 3 rows
      val lit = java.time.Instant.ofEpochMilli(v2ts)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString
        .replace('T', ' ')
      val n = spark.sql(
        s"SELECT count(*) AS c FROM $t TIMESTAMP AS OF '$lit'")
        .head().getLong(0)
      assert(n === 3L)
      assert(spark.sql(s"SELECT count(*) AS c FROM $t").head()
        .getLong(0) === 6L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
