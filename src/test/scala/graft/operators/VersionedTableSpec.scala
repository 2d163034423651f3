package graft.operators

import java.nio.file.{Files, Paths}

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "ord", "v")
  }

  test("merge commits time-travel: each version is the argmax of its prefix") {
    val base = TempDirs.scoped("vt_merge")
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 10L, 100L), (2L, 10L, 200L))), "k", Seq("ord"))
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 20L, 111L), (3L, 5L, 300L))), "k", Seq("ord"))
    // late-arriving older row for k=1: must NOT displace ord=20
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 15L, 999L))), "k", Seq("ord"))
    assert(VersionedTable.latestVersion(base) === Some(3L))
    def state(v: Long): Map[Long, (Long, Long)] =
      VersionedTable.readVersion(spark, base, v)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(state(1) === Map(1L -> (10L, 100L), 2L -> (10L, 200L)))
    assert(state(2) === Map(1L -> (20L, 111L), 2L -> (10L, 200L), 3L -> (5L, 300L)))
    assert(state(3) === Map(1L -> (20L, 111L), 2L -> (10L, 200L), 3L -> (5L, 300L)))
    assert(VersionedTable.readLatest(spark, base).count() === 3L)
  }

  test("append commits share immutable delta files across manifests") {
    val base = TempDirs.scoped("vt_append")
    VersionedTable.commitAppend(spark, base, kv(Seq((1L, 1L, 1L))))
    VersionedTable.commitAppend(spark, base, kv(Seq((2L, 2L, 2L))))
    assert(VersionedTable.readVersion(spark, base, 1).count() === 1L)
    assert(VersionedTable.readVersion(spark, base, 2).count() === 2L)
    // v2's manifest must reference v1's files, not copy them: exactly
    // two data dirs exist on disk
    val dataDirs = Files.list(Paths.get(base)).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    dataDirs.forEachRemaining(p => names += p.getFileName.toString)
    assert(names.count(_.startsWith("d")) === 2)
  }

  test("crash between data write and publish leaves the table unchanged") {
    val base = TempDirs.scoped("vt_crash")
    VersionedTable.commitAppend(spark, base, kv(Seq((1L, 1L, 1L))))
    // simulate the crash: a fully written data dir with NO manifest
    kv(Seq((9L, 9L, 9L))).write.parquet(s"$base/d2")
    assert(VersionedTable.latestVersion(base) === Some(1L))
    assert(VersionedTable.readLatest(spark, base).count() === 1L)
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, base, 2)
    }
    // the retry after the crash must self-heal over the orphan d2 dir
    // (ErrorIfExists would wedge the table on it forever)
    VersionedTable.commitAppend(spark, base, kv(Seq((2L, 2L, 2L))))
    assert(VersionedTable.latestVersion(base) === Some(2L))
    assert(VersionedTable.readVersion(spark, base, 2)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("publishing an already-committed version fails loudly") {
    // the lost-race shape: two writers compute next=2, both publish —
    // exactly one wins; the loser gets a conflict, never a silent
    // replace (rename() on POSIX would replace; the hard link cannot)
    val base = TempDirs.scoped("vt_conflict")
    VersionedTable.publish(base, 2L, "#op=append\nd2/part-0.parquet\n")
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.publish(base, 2L, "#op=append\nd2b/part-0.parquet\n")
    }
    // the winner's manifest is untouched by the failed publish
    val body = new String(Files.readAllBytes(
      Paths.get(base, "_log", f"${2L}%020d.commit")), "UTF-8")
    assert(body.contains("d2/part-0.parquet"))
    // and no temp litter remains in the log dir
    val leftovers = Files.list(Paths.get(base, "_log")).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    leftovers.forEachRemaining(p => names += p.getFileName.toString)
    assert(names.forall(!_.startsWith(".tmp")))
  }

  test("changesBetween: inserts/updates tagged, unchanged keys silent, deletes via reversal") {
    val base = TempDirs.scoped("vt_cdc")
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 10L, 100L), (2L, 10L, 200L))), "k", Seq("ord"))
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 20L, 111L), (3L, 5L, 300L))), "k", Seq("ord"))
    // late-arriving older row: displaces nothing -> empty change feed
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 15L, 999L))), "k", Seq("ord"))
    val c12 = VersionedTable.changesBetween(spark, base, 1L, 2L, "k")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type"))
      .toMap
    assert(c12 === Map(1L -> "update", 3L -> "insert")) // k=2 unchanged, silent
    assert(VersionedTable.changesBetween(spark, base, 2L, 3L, "k").count() === 0L)
    // a dropped key reads as delete when diffing backwards
    val back = VersionedTable.changesBetween(spark, base, 2L, 1L, "k")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type"))
      .toMap
    assert(back(3L) === "delete")
  }

  test("vacuum drops stranded merge states and orphans, keeps retained versions") {
    val base = TempDirs.scoped("vt_vacuum")
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 10L, 100L), (2L, 10L, 200L))), "k", Seq("ord"))
    VersionedTable.commitMerge(spark, base,
      kv(Seq((3L, 5L, 300L))), "k", Seq("ord"))
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 20L, 111L))), "k", Seq("ord"))
    // crash debris: a data dir no manifest references
    kv(Seq((9L, 9L, 9L))).write.parquet(s"$base/d99")
    val deleted = VersionedTable.vacuum(base, retainFrom = 3L)
    // copy-on-write merge strands v1/v2 state dirs + the orphan
    assert(deleted.exists(_.startsWith("d1/")))
    assert(deleted.exists(_.startsWith("d2/")))
    assert(deleted.exists(_.startsWith("d99/")))
    assert(VersionedTable.latestVersion(base) === Some(3L))
    assert(VersionedTable.readVersion(spark, base, 3).count() === 3L)
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, base, 2) // cleanly gone, not dangling
    }
    assert(!Files.exists(Paths.get(base, "d99")))
  }

  test("vacuum on an append-only history deletes no data files") {
    val base = TempDirs.scoped("vt_vacuum_append")
    VersionedTable.commitAppend(spark, base, kv(Seq((1L, 1L, 1L))))
    VersionedTable.commitAppend(spark, base, kv(Seq((2L, 2L, 2L))))
    val deleted = VersionedTable.vacuum(base, retainFrom = 2L)
    // v2's manifest carries v1's files forward -> only marker 1 goes
    assert(deleted.forall(_.startsWith("_log/")))
    assert(VersionedTable.readVersion(spark, base, 2).count() === 2L)
  }

  test("empty table read fails with a clear error") {
    val base = TempDirs.scoped("vt_empty")
    intercept[IllegalArgumentException] {
      VersionedTable.readLatest(spark, base)
    }
    assert(VersionedTable.latestVersion(base) === None)
  }
}
