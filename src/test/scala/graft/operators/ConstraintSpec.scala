package graft.operators

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

/** CHECK constraints: enforced on every commit path (batch writes,
  * SQL DML, the streaming sink all route through commitAt), validated
  * against existing rows at ADD time, NULL-passing per SQL standard.
  */
class ConstraintSpec extends SparkSuite {

  test("violating commit refuses BEFORE publish; table unchanged") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_constraint")
    VersionedTable.commitAppend(spark, base,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    VersionedTable.addConstraint(spark, base, "v_pos", "v > 0")
    // a good commit passes
    VersionedTable.commitAppend(spark, base, Seq((3L, 30L)).toDF("k", "v"))
    // a violating commit fails loudly and commits NOTHING
    val e = intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(spark, base,
        Seq((4L, -5L)).toDF("k", "v"))
    }
    assert(e.getMessage.contains("v_pos"))
    assert(VersionedTable.latestVersion(base) === Some(2L))
    assert(VersionedTable.readLatest(spark, base).count() === 3L)
    // drop re-admits
    VersionedTable.dropConstraint(base, "v_pos")
    VersionedTable.commitAppend(spark, base, Seq((4L, -5L)).toDF("k", "v"))
    assert(VersionedTable.readLatest(spark, base).count() === 4L)
  }

  test("ADD CONSTRAINT validates existing rows; NULL passes") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_constraint_add")
    VersionedTable.commitAppend(spark, base,
      Seq((1L, Some(10L)), (2L, None)).toDF("k", "v"))
    // NULL v passes a v > 0 check (SQL semantics), so the add succeeds
    VersionedTable.addConstraint(spark, base, "v_pos", "v > 0")
    // an add the existing data violates refuses and stores nothing
    intercept[IllegalArgumentException] {
      VersionedTable.addConstraint(spark, base, "v_big", "v > 100")
    }
    assert(VersionedTable.constraints(base).keySet === Set("v_pos"))
  }

  test("SQL surface: SET/UNSET TBLPROPERTIES graft.constraint.*") {
    val ns = s"cons_${java.util.UUID.randomUUID().toString.take(8)}"
    val t = s"graft.$ns.t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    try {
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('graft.constraint.v_pos' = 'v > 0')")
      spark.sql(s"INSERT INTO $t VALUES (1, 10)")
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $t VALUES (2, -1)")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("v_pos")))
      assert(spark.sql(s"SELECT count(*) AS c FROM $t").head()
        .getLong(0) === 1L)
      spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES " +
        "('graft.constraint.v_pos')")
      spark.sql(s"INSERT INTO $t VALUES (2, -1)")
      assert(spark.sql(s"SELECT count(*) AS c FROM $t").head()
        .getLong(0) === 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("UPDATE that would break a constraint refuses") {
    val ns = s"consu_${java.util.UUID.randomUUID().toString.take(8)}"
    val t = s"graft.$ns.t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    try {
      spark.sql(s"INSERT INTO $t VALUES (1, 10), (2, 20)")
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('graft.constraint.v_pos' = 'v > 0')")
      intercept[Exception] {
        spark.sql(s"UPDATE $t SET v = v - 100 WHERE k = 1")
      }
      // the rewrite never published: both rows intact
      val got = spark.sql(s"SELECT v FROM $t ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      assert(got === Seq(10L, 20L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
