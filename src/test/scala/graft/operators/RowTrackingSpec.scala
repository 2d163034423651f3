package graft.operators

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable._
import org.apache.spark.sql.functions._

/** ROW TRACKING: stable row identity across rewrites — ids survive
  * CoW delete, UPDATE, compaction, rebucket, MoR delete and REPLACE
  * WHERE; fresh rows always allocate above the high-water mark; the
  * mark survives RESTORE and vacuum and is never reused.
  */
class RowTrackingSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "v")
  }

  private def ids(base: String): Map[Long, Long] =
    VersionedTable.readLatestWithRowIds(spark, base)
      .select(col("k"), col(RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ids are stable across CoW delete, update, compact, rebucket, " +
      "MoR delete and replace-where; fresh rows never reuse ids") {
    val base = TempDirs.scoped("vt_rowids")
    VersionedTable.commitAppend(spark, base,
      kv((0L until 50L).map(k => (k, k))).coalesce(2), statsCols = Seq("k"))
    VersionedTable.commitAppend(spark, base,
      kv((50L until 100L).map(k => (k, k))).coalesce(2), statsCols = Seq("k"))
    // pre-enable: the id read surface refuses loudly
    val e0 = intercept[IllegalArgumentException] {
      VersionedTable.readLatestWithRowIds(spark, base).collect()
    }
    assert(e0.getMessage.contains("enableRowIds"))
    val ev = VersionedTable.enableRowIds(base)
    assert(ev === 3L)
    assert(VersionedTable.enableRowIds(base) === 3L) // idempotent
    val before = ids(base)
    assert(before.size === 100)
    assert(before.values.toSet.size === 100, "ids must be distinct")
    // CoW delete: survivors keep their exact ids
    VersionedTable.commitDelete(spark, base, col("k") < 10L,
      pruneRanges = Seq(("k", Long.MinValue, 9L)), statsCols = Seq("k"))
    assert(ids(base) === before.filter(_._1 >= 10L))
    // UPDATE: updated rows keep identity (new version of the same row)
    VersionedTable.commitUpdate(spark, base, col("k").between(10L, 19L),
      Seq("v" -> (col("v") * 100)),
      pruneRanges = Seq(("k", 10L, 19L)), statsCols = Seq("k"))
    assert(ids(base) === before.filter(_._1 >= 10L))
    // compaction: a pure rewrite preserves every id
    VersionedTable.compact(spark, base, numFiles = 2, statsCols = Seq("k"))
    assert(ids(base) === before.filter(_._1 >= 10L))
    // rebucket: layout change, ids intact
    VersionedTable.rebucket(spark, base, "k", 4)
    assert(ids(base) === before.filter(_._1 >= 10L))
    // MoR delete: positions don't move — implicit ids survive free
    VersionedTable.commitDeleteMoR(spark, base, col("k") === 20L,
      Seq(("k", 20L, 20L)))
    assert(ids(base) === before.filter(k => k._1 >= 10L && k._1 != 20L))
    // REPLACE WHERE: remainder keeps ids, replacement allocates fresh
    val survivorIds = ids(base)
    VersionedTable.commitReplaceWhere(spark, base,
      kv(Seq((30L, -1L), (31L, -2L))), col("k").between(30L, 34L),
      pruneRanges = Seq(("k", 30L, 34L)), statsCols = Seq("k"))
    val after = ids(base)
    val untouched = survivorIds.filter(p => p._1 < 30L || p._1 > 34L)
    assert(after.view.filterKeys(k => k < 30L || k > 34L).toMap === untouched)
    val allEver = before.values.toSet
    assert(Set(30L, 31L).forall(k => !allEver.contains(after(k))),
      "replacement rows must take FRESH ids, never a deleted row's")
    // appends keep allocating above the mark — across a RESTORE too
    val vNow = VersionedTable.latestVersion(base).get
    VersionedTable.restore(base, vNow - 1L)
    VersionedTable.commitAppend(spark, base, kv(Seq((500L, 5L))),
      statsCols = Seq("k"))
    val id500 = ids(base)(500L)
    assert(!allEver.contains(id500) && id500 > after.values.max,
      s"restore must not roll the id watermark back (got $id500)")
  }

  test("watermark survives vacuum via checkpoint restatement; " +
      "time travel reads each version's own ids") {
    val base = TempDirs.scoped("vt_rowids_vac")
    VersionedTable.commitAppend(spark, base,
      kv((0L until 30L).map(k => (k, k))).coalesce(1), statsCols = Seq("k"))
    VersionedTable.enableRowIds(base)
    val v2Ids = VersionedTable.readVersionWithRowIds(spark, base, 2L)
      .select(col("k"), col(RowIdCol)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    VersionedTable.commitDelete(spark, base, col("k") < 5L,
      pruneRanges = Seq(("k", Long.MinValue, 4L)), statsCols = Seq("k"))
    // survivors' ids equal ACROSS versions — the incremental-consumer
    // join property
    val v3Ids = ids(base)
    assert(v3Ids === v2Ids.filter(_._1 >= 5L))
    // vacuum away the allocating markers; the checkpoint's restated
    // #rowhwm keeps allocation monotone
    val head = VersionedTable.latestVersion(base).get
    VersionedTable.vacuum(base, retainFrom = head, attemptRetentionMs = 0L)
    VersionedTable.commitAppend(spark, base, kv(Seq((900L, 9L))),
      statsCols = Seq("k"))
    val id900 = ids(base)(900L)
    assert(!v2Ids.values.toSet.contains(id900),
      s"vacuum must not reset the watermark (id $id900 reused)")
  }

  test("SQL surface: CALL enable_row_ids + graft_with_row_ids TVF " +
      "join versions by identity; graft_detail reports the watermark") {
    val s = spark
    import s.implicits._
    val ns = s"rid${System.nanoTime() % 1000000}"
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val base = s"$wh/$ns/t"
    kv((0L until 40L).map(k => (k, k))).coalesce(1).write.format("graft")
      .option("statsCols", "k").mode("append").save(base)
    val ev = spark.sql(s"CALL graft.system.enable_row_ids('$ns.t')")
      .head().getLong(0)
    assert(ev === 2L)
    assert(spark.sql(s"SELECT row_id_hwm FROM graft_detail('$base')")
      .head().getLong(0) === 40L)
    spark.sql(s"DELETE FROM graft.$ns.t WHERE k < 15")
    // identity join across versions, in plain SQL
    val mismatches = spark.sql(
      s"""SELECT count(*) FROM graft_with_row_ids('$base') n
          JOIN graft_with_row_ids('$base', 2) o ON n._row_id = o._row_id
          WHERE n.k <> o.k""").head().getLong(0)
    assert(mismatches === 0L)
    assert(spark.sql(
      s"""SELECT count(*) FROM graft_with_row_ids('$base') n
          JOIN graft_with_row_ids('$base', 2) o
          ON n._row_id = o._row_id""").head().getLong(0) === 25L)
    // the identity feed as a FROM-clause citizen
    val cdc = spark.sql(
      s"""SELECT change_type, count(*) AS n
          FROM graft_changes_by_rowid('$base', 2, 3)
          GROUP BY change_type""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cdc === Map("delete" -> 15L))
  }

  test("CDC by identity: updates pair by id, rewrites emit NOTHING, " +
      "MoR deletes emit exactly the soft-deleted rows") {
    val base = TempDirs.scoped("vt_rowids_cdc")
    VersionedTable.commitAppend(spark, base,
      kv((0L until 40L).map(k => (k, k))).coalesce(2), statsCols = Seq("k"))
    val v0 = VersionedTable.enableRowIds(base) // v2
    VersionedTable.commitUpdate(spark, base, col("k") < 5L,
      Seq("v" -> (col("v") + 1000L)),
      pruneRanges = Seq(("k", Long.MinValue, 4L)), statsCols = Seq("k")) // v3
    VersionedTable.compact(spark, base, 1, statsCols = Seq("k")) // v4
    VersionedTable.commitDeleteMoR(spark, base, col("k") === 7L,
      Seq(("k", 7L, 7L))) // v5
    VersionedTable.commitAppend(spark, base, kv(Seq((100L, 1L)))) // v6
    val head = VersionedTable.latestVersion(base).get
    assert(head === 6L)
    val feed = VersionedTable.changesByRowId(spark, base, v0, head)
      .select(col("version"), col(RowIdCol), col("k_old"), col("k_new"),
        col("v_old"), col("v_new"), col("change_type"))
      .collect()
    // the UPDATE: 5 update rows pairing old/new values under one id
    val ups = feed.filter(r => r.getLong(0) == 3L)
    assert(ups.length === 5)
    assert(ups.forall(r => r.getString(6) == "update" &&
      r.getLong(2) == r.getLong(3) && // same key under the same id
      r.getLong(5) == r.getLong(4) + 1000L))
    // the COMPACTION: a pure rewrite is NOT a change — zero rows
    assert(!feed.exists(_.getLong(0) == 4L),
      "compaction must emit nothing in the identity feed")
    // the MoR delete: exactly the soft-deleted row
    val dels = feed.filter(r => r.getLong(0) == 5L)
    assert(dels.length === 1 && dels.head.getString(6) == "delete" &&
      dels.head.getLong(2) === 7L)
    // the append: one insert
    val ins = feed.filter(r => r.getLong(0) == 6L)
    assert(ins.length === 1 && ins.head.getString(6) == "insert" &&
      ins.head.getLong(3) === 100L)
    // and the enable_rowids restatement itself emits nothing
    assert(VersionedTable.changesByRowId(spark, base, v0 - 1L, v0)
      .count() === 0L)
  }

  test("LIVE concurrent appends on a row-tracked table: ids never " +
      "collide — lost races re-allocate their spans at the new head") {
    import java.util.concurrent.{Callable, Executors, TimeUnit}
    val base = TempDirs.scoped("vt_rowids_race")
    VersionedTable.commitAppend(spark, base,
      kv(Seq((0L, 0L))).coalesce(1), statsCols = Seq("k"))
    VersionedTable.enableRowIds(base)
    // 6 threads x 3 appends of 10 rows each, genuinely racing: losers
    // take the disjoint-race REPUBLISH path, which must re-allocate
    // id spans above the winners' watermark (two winners from one
    // pinned hwm would mint duplicate identities)
    val pool = Executors.newFixedThreadPool(6)
    try {
      (0 until 6).map { t =>
        pool.submit(new Callable[Unit] {
          override def call(): Unit =
            (1 to 3).foreach { i =>
              VersionedTable.commitAppend(spark, base,
                kv((0L until 10L).map(j =>
                  (t * 1000L + i * 100L + j, j))).coalesce(1),
                statsCols = Seq("k"), maxAttempts = 64)
            }
        })
      }.foreach(_.get(300, TimeUnit.SECONDS))
    } finally { pool.shutdownNow(); () }
    val idsAll = VersionedTable.readLatestWithRowIds(spark, base)
      .select(col(RowIdCol)).collect().map(_.getLong(0))
    assert(idsAll.length === 181) // 1 seed + 180 raced rows
    assert(idsAll.distinct.length === 181,
      s"row ids collided under live races: " +
        s"${idsAll.groupBy(identity).filter(_._2.length > 1).keys.take(5)}")
    // the watermark covers every allocation
    val head = VersionedTable.latestVersion(base).get
    assert(VersionedTable.rowHwmAsOf(base, head) === 181L)
    assert(idsAll.max < 181L)
  }

  test("append racing a concurrent enableRowIds republishes WITH id " +
      "spans (r13 advice: the retry loop must refresh the feature)") {
    val base = TempDirs.scoped("vt_rowids_race_enable")
    VersionedTable.commitAppend(spark, base,
      kv((0L until 10L).map(k => (k, k))).coalesce(1), statsCols = Seq("k"))
    // the appender pins v1 (row ids OFF); enableRowIds wins the race
    // between the appender's span decision and its publish
    VersionedTable.commitAppendHooked(spark, base,
      kv((10L until 20L).map(k => (k, k))).coalesce(1), Seq("k")) { () =>
      VersionedTable.enableRowIds(base)
    }
    // every row must carry a distinct id: the losing append's files
    // allocated spans when it republished at the new head
    val all = ids(base)
    assert(all.size === 20)
    assert(all.values.toSet.size === 20, "ids must be distinct")
    val head = VersionedTable.latestVersion(base).get
    assert(VersionedTable.rowHwmAsOf(base, head) === 20L)
  }

  test("an EMPTY version reads with ids as a zero-row frame " +
      "(r13 advice: it used to throw)") {
    val base = TempDirs.scoped("vt_rowids_empty")
    VersionedTable.commitAppend(spark, base,
      kv(Seq((1L, 1L), (2L, 2L))).coalesce(1), statsCols = Seq("k"))
    VersionedTable.enableRowIds(base)
    VersionedTable.commitDelete(spark, base, lit(true))
    val out = VersionedTable.readLatestWithRowIds(spark, base)
    assert(out.columns.toSeq === Seq("k", "v", RowIdCol))
    assert(out.count() === 0L)
  }

  test("reserved column refusals") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("vt_rowids_res")
    // even the library commit path refuses a user frame carrying the
    // reserved column on a non-enabled table
    val e = intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(spark, base,
        Seq((1L, 2L)).toDF("k", RowIdCol))
    }
    assert(e.getMessage.contains("reserved"))
    // the DSv2 write surface refuses user-supplied _row_id
    val base2 = TempDirs.scoped("vt_rowids_res2")
    val e2 = intercept[Exception] {
      Seq((1L, 2L)).toDF("k", RowIdCol).write.format("graft")
        .mode("append").save(base2)
    }
    assert(e2.getMessage.contains("reserved"))
  }
}
