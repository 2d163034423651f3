package graft.sources

import java.nio.file.{Files, Paths}

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import org.apache.spark.sql.functions._

/** RESTORE TO VERSION (library) and the SQL maintenance-procedure
  * surface (`CALL graft.system.restore/vacuum/compact/zorder`).
  */
class GraftProceduresSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "v")
  }

  test("restore rolls back data AND schema as a new commit; history intact") {
    val base = TempDirs.scoped("vt_restore")
    VersionedTable.commitAppend(spark, base, kv(Seq((1L, 10L))), Seq("k"))
    VersionedTable.commitAppend(spark, base, kv(Seq((2L, 20L))), Seq("k"))
    // v3 evolves the schema (ADD COLUMN via append)
    val s = spark
    import s.implicits._
    VersionedTable.commitAppend(spark, base,
      Seq((3L, 30L, "x")).toDF("k", "v", "tag"), Seq("k"))
    // v4 wipes everything — the bad deploy
    VersionedTable.commitReplace(spark, base, kv(Seq((9L, 90L))), Seq("k"))
    assert(VersionedTable.readLatest(spark, base).count() === 1L)

    val v = VersionedTable.restore(base, 2L)
    assert(v === 5L)
    // data back to v2, byte-for-byte
    val restored = VersionedTable.readLatest(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(restored === Set((1L, 10L), (2L, 20L)))
    // schema rolled back too: the v3 ADD COLUMN is gone at latest
    assert(VersionedTable.declaredSchema(base, 5L).map(_.fieldNames.toSeq)
      === Some(Seq("k", "v")))
    // zone maps restored with the entries: pruning still bites
    val es = VersionedTable.entries(base, 5L)
    assert(es.forall(_.stats.contains("k")))
    // history preserved — the mistake stays time-travelable
    assert(VersionedTable.readVersion(spark, base, 4L).collect()
      .map(_.getLong(0)).toSeq === Seq(9L))
    assert(VersionedTable.readVersion(spark, base, 3L).count() === 3L)
    val hist = VersionedTable.history(base).map { case (hv, op, _) => hv -> op }
    assert(hist.contains(5L -> "restore"))
    // restore-to-latest is a provable no-op: commits nothing
    assert(VersionedTable.restore(base, 5L) === 5L)
    assert(VersionedTable.latestVersion(base) === Some(5L))
    // nonexistent version fails loudly
    intercept[IllegalArgumentException] { VersionedTable.restore(base, 99L) }
  }

  test("restore past vacuum retention fails loudly before publishing") {
    val base = TempDirs.scoped("vt_restore_vac")
    VersionedTable.commitAppend(spark, base, kv(Seq((1L, 10L))))
    VersionedTable.commitReplace(spark, base, kv(Seq((2L, 20L))))
    VersionedTable.commitAppend(spark, base, kv(Seq((3L, 30L))))
    // vacuum truncates history below v2: marker AND files go
    VersionedTable.vacuum(base, retainFrom = 2L)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.restore(base, 1L)
    }
    assert(e.getMessage.contains("no such committed version"), e.getMessage)
    // out-of-band data loss (marker intact, file gone) fails on the
    // file-existence check BEFORE publishing an unreadable snapshot
    val victim = VersionedTable.entries(base, 2L).head.path
    Files.delete(Paths.get(base, victim))
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.restore(base, 2L)
    }
    assert(e2.getMessage.contains("vacuum"), e2.getMessage)
    // nothing published: the table is still at v3
    assert(VersionedTable.latestVersion(base) === Some(3L))
  }

  test("CALL graft.system.*: restore, compact, zorder, vacuum from SQL") {
    val ns = s"procns${System.nanoTime() % 1000000}"
    val t = s"graft.$ns.t"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$ns/t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10), (2, 20)")
    spark.sql(s"INSERT INTO $t VALUES (3, 30)")
    spark.sql(s"DELETE FROM $t WHERE k <= 2")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) === 1L)

    // restore across the delete — the SQL undo button
    val r = spark.sql(s"CALL graft.system.restore('$ns.t', 3)").head()
    assert((r.getLong(0), r.getLong(1)) === (3L, 5L))
    assert(spark.sql(s"SELECT sum(v) FROM $t").head().getLong(0) === 60L)

    // compact to one file with zone maps on k
    val cv = spark.sql(s"CALL graft.system.compact('$ns.t', 1, 'k')")
      .head().getLong(0)
    assert(cv === 6L)
    assert(VersionedTable.entries(base, cv).size === 1)
    assert(spark.sql(s"SELECT sum(v) FROM $t").head().getLong(0) === 60L)

    // z-order rewrite commits and preserves content
    val zv = spark.sql(s"CALL graft.system.zorder('$ns.t', 'k', 'v', 2)")
      .head().getLong(0)
    assert(zv === 7L)
    assert(spark.sql(s"SELECT sum(v) FROM $t").head().getLong(0) === 60L)

    // vacuum erases the pre-restore debris; table still reads
    val deleted = spark.sql(s"CALL graft.system.vacuum('$ns.t', 7)")
      .head().getLong(0)
    assert(deleted > 0L)
    assert(spark.sql(s"SELECT sum(v) FROM $t").head().getLong(0) === 60L)

    // the procedure namespace is discoverable
    val shown = spark.sql("SHOW PROCEDURES IN graft.system").collect()
      .map(_.getString(0)).toSet
    assert(Set("restore", "vacuum", "compact", "zorder").subsetOf(
      shown.map(_.split('.').last)) || shown.nonEmpty)

    // unknown procedure fails loudly
    intercept[Exception] { spark.sql(s"CALL graft.system.nope('$ns.t')") }
    spark.sql(s"DROP TABLE $t")
  }

  test("CALL graft.system.create_tag / drop_tag / clone from SQL") {
    val ns = s"refns${System.nanoTime() % 1000000}"
    val t = s"graft.$ns.t"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$ns/t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10), (2, 20)")
    spark.sql(s"INSERT INTO $t VALUES (3, 30)")
    // pin the 2-row state and read it back BY NAME
    assert(spark.sql(s"CALL graft.system.create_tag('$ns.t', 'rc1', 2)")
      .head().getLong(0) === 2L)
    assert(spark.read.format("graft").option("ref", "rc1")
      .load(base).count() === 2L)
    // fork a zero-copy branch from SQL and diverge it
    val bv = spark.sql(
      s"CALL graft.system.clone('$ns.t', '$ns.branch', 0)")
      .head().getLong(0)
    assert(bv === 1L)
    val bt = s"graft.$ns.branch"
    assert(spark.sql(s"SELECT count(*) FROM $bt").head().getLong(0) === 3L)
    spark.sql(s"INSERT INTO $bt VALUES (4, 40)")
    spark.sql(s"DELETE FROM $bt WHERE k = 1")
    assert(spark.sql(s"SELECT sum(v) FROM $bt").head().getLong(0) === 90L)
    // the source never noticed the branch's life
    assert(spark.sql(s"SELECT sum(v) FROM $t").head().getLong(0) === 60L)
    // SQL time travel BY NAME (the Iceberg tag-travel idiom) and the
    // refs TVF beside it
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 'rc1'")
      .head().getLong(0) === 2L)
    assert(spark.sql(s"SELECT version FROM graft_refs('$ns.t') " +
      "WHERE name = 'rc1'").head().getLong(0) === 2L)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $t VERSION AS OF 'nope'").collect()
    }
    // drop the release tag; the name frees up
    spark.sql(s"CALL graft.system.drop_tag('$ns.t', 'rc1')")
    assert(VersionedTable.tags(base).keys.forall(_.startsWith("clone-")))
    spark.sql(s"DROP TABLE $bt")
    spark.sql(s"DROP TABLE $t")
  }

  test("vacuum dry run is a pure read and predicts the sweep exactly") {
    val base = TempDirs.scoped("vt_vacuum_dry")
    VersionedTable.commitAppend(spark, base, kv(Seq((1L, 10L))).coalesce(1))
    VersionedTable.commitReplace(spark, base, kv(Seq((2L, 20L))).coalesce(1))
    VersionedTable.commitAppend(spark, base, kv(Seq((3L, 30L))).coalesce(1))
    def fileCount: Long = {
      val st = Files.walk(Paths.get(base))
      try st.filter(p => !Files.isDirectory(p)).count()
      finally st.close()
    }
    val before = fileCount
    val predicted = VersionedTable.vacuum(base, retainFrom = 3L,
      attemptRetentionMs = 0L, dryRun = true)
    // pure read: nothing changed — not even a checkpoint was written
    assert(fileCount === before,
      "dry run must not write anything, checkpoints included")
    assert(predicted.nonEmpty) // v1's replaced file + old markers
    val swept = VersionedTable.vacuum(base, retainFrom = 3L,
      attemptRetentionMs = 0L)
    assert(swept.toSet === predicted.toSet,
      s"dry run must predict the sweep exactly: $predicted vs $swept")
    // and the table still reads
    assert(VersionedTable.readLatest(spark, base).count() === 2L)
    // the SQL surface
    val base2 = TempDirs.scoped("vt_vacuum_dry2")
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val ns = s"vdr${System.nanoTime() % 1000000}"
    kv(Seq((1L, 1L))).write.format("graft").mode("append")
      .save(s"$wh/$ns/t")
    kv(Seq((2L, 2L))).write.format("graft").mode("overwrite")
      .save(s"$wh/$ns/t")
    val n = spark.sql(
      s"CALL graft.system.vacuum_dry_run('$ns.t', 2)").head().getLong(0)
    assert(n >= 1L)
    assert(VersionedTable.readLatest(spark, s"$wh/$ns/t").count() === 1L)
  }
}
