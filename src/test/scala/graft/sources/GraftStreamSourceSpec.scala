package graft.sources

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types._

/** The commit log as a streaming source: `readStream.format("graft")`
  * must deliver (a) the current snapshot as the first batch, (b) each
  * later commit's added files as tail batches, exactly once across
  * checkpointed restarts, (c) a loud failure (or an explicit skip) on
  * commits that rewrite files, and (d) batches read through the
  * stream-start schema (old files null-fill evolved-in columns).
  */
class GraftStreamSourceSpec extends SparkSuite {

  private val sinkSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def appendDecade(base: String, lo: Long): Unit = {
    val s = spark
    import s.implicits._
    VersionedTable.commitAppend(spark, base,
      (lo until lo + 10L).map(k => (k, k * 2)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
  }

  /** Drain the graft stream at `base` into `dir`'s parquet sink under
    * AvailableNow, with the checkpoint keyed to `dir` (so re-calls
    * RESUME — the restart-recovery shape).
    */
  private def drain(base: String, dir: String,
                    options: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft")
    options.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load(base).writeStream
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination()
  }

  private def sinkRows(dir: String): Seq[Long] =
    spark.read.schema(sinkSchema).parquet(s"$dir/out")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("snapshot first batch, per-commit tail, exactly-once restart") {
    val base = TempDirs.scoped("graft_stream_tail")
    val dir = TempDirs.scoped("graft_stream_tail_sink")
    appendDecade(base, 0L); appendDecade(base, 10L)
    drain(base, dir)
    assert(sinkRows(dir) === (0L until 20L))
    // two more commits land; the same checkpoint resumes and reads
    // ONLY their files — rows appear exactly once
    appendDecade(base, 20L); appendDecade(base, 30L)
    drain(base, dir)
    assert(sinkRows(dir) === (0L until 40L))
    // nothing new: a third drain emits nothing
    drain(base, dir)
    assert(sinkRows(dir) === (0L until 40L))
  }

  test("snapshot start over a compacted table does not double-count") {
    val base = TempDirs.scoped("graft_stream_compact")
    val dir = TempDirs.scoped("graft_stream_compact_sink")
    appendDecade(base, 0L); appendDecade(base, 10L)
    VersionedTable.compact(spark, base, numFiles = 1, statsCols = Seq("k"))
    // fresh stream: first batch = the v3 snapshot (1 compacted file),
    // NOT a replay of appends + compaction output
    drain(base, dir)
    assert(sinkRows(dir) === (0L until 20L))
  }

  test("change commit in the tail fails loudly; skipChangeCommits skips") {
    val base = TempDirs.scoped("graft_stream_chg")
    val dir = TempDirs.scoped("graft_stream_chg_sink")
    appendDecade(base, 0L)
    drain(base, dir) // consumed through v1
    VersionedTable.compact(spark, base, numFiles = 1, statsCols = Seq("k"))
    appendDecade(base, 10L) // v3
    val ex = intercept[StreamingQueryException] { drain(base, dir) }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).exists(_.getMessage.contains("change commit")))
    // the failed attempt committed nothing; skipping moves past the
    // compaction and delivers only v3's append
    drain(base, dir, Map("skipChangeCommits" -> "true"))
    assert(sinkRows(dir) === (0L until 20L))
  }

  test("startingVersion replays from a commit; 'latest' tails only") {
    val base = TempDirs.scoped("graft_stream_sv")
    (0L until 4L).foreach(i => appendDecade(base, i * 10L))
    val d3 = TempDirs.scoped("graft_stream_sv3_sink")
    drain(base, d3, Map("startingVersion" -> "3"))
    assert(sinkRows(d3) === (20L until 40L))
    val dl = TempDirs.scoped("graft_stream_svl_sink")
    drain(base, dl, Map("startingVersion" -> "latest"))
    // nothing after the stream's start version: the sink has no data
    // files (only its metadata dir)
    assert(!new java.io.File(s"$dl/out").exists() ||
      spark.read.schema(sinkSchema).parquet(s"$dl/out").count() === 0L)
    appendDecade(base, 40L)
    drain(base, dl, Map("startingVersion" -> "latest"))
    assert(sinkRows(dl) === (40L until 50L))
  }

  private val cdcSinkSchema = StructType(Seq(
    StructField("version", LongType), StructField("k", LongType),
    StructField("v_old", LongType), StructField("v_new", LongType),
    StructField("change_type", StringType)))

  private def drainCdc(base: String, dir: String): Unit = {
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("cdcKey", "k")
      .load(base).writeStream
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination()
  }

  private def cdcRows(dir: String): Set[(Long, Long, Option[Long],
      Option[Long], String)] =
    spark.read.schema(cdcSinkSchema).parquet(s"$dir/out").collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getString(4))
    }.toSet

  test("change feed: history replay equals changesPerCommit; resume tails") {
    val base = TempDirs.scoped("graft_cdc")
    val dir = TempDirs.scoped("graft_cdc_sink")
    val s = spark
    import s.implicits._
    appendDecade(base, 0L) // v1: 10 inserts
    VersionedTable.commitMerge(spark, base, // v2: update k=5 → 999
      Seq((5L, 999L)).toDF("k", "v"), "k", Seq("v"))
    VersionedTable.commitDelete(spark, base, // v3: delete k=7
      col("k") === 7L, Seq(("k", 7L, 7L)))
    drainCdc(base, dir)
    val got = cdcRows(dir)
    val inserts: Set[(Long, Long, Option[Long], Option[Long], String)] =
      (0L until 10L)
        .map(k => (1L, k, None, Some(k * 2), "insert")).toSet
    assert(got === inserts +
      ((2L, 5L, Some(10L), Some(999L), "update")) +
      ((3L, 7L, Some(14L), None, "delete")))
    // the live feed IS the batch change feed, row for row
    val batch = VersionedTable.changesPerCommit(spark, base, 0L, 3L, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getString(4))).toSet
    assert(got === batch)
    // resume: a fourth commit feeds exactly its own inserts
    appendDecade(base, 10L)
    drainCdc(base, dir)
    assert(cdcRows(dir) === got ++
      (10L until 20L).map(k => (4L, k, None, Some(k * 2), "insert")))
  }

  test("change feed BY IDENTITY: cdcKey=_row_id streams id-paired " +
      "updates; rewrites feed zero rows; live feed equals the batch") {
    val base = TempDirs.scoped("graft_cdc_rid")
    val dir = TempDirs.scoped("graft_cdc_rid_sink")
    val s = spark
    import s.implicits._
    appendDecade(base, 0L) // v1
    val v0 = VersionedTable.enableRowIds(base) // v2 (restatement)
    VersionedTable.commitUpdate(spark, base, col("k") === 3L, // v3
      Seq("v" -> lit(777L)), pruneRanges = Seq(("k", 3L, 3L)))
    VersionedTable.compact(spark, base, 1) // v4: must feed NOTHING
    appendDecade(base, 10L) // v5: inserts with computed implicit ids
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("cdcKey", VersionedTable.RowIdCol)
      .option("startingVersion", (v0 + 1L).toString)
      .load(base).writeStream
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination()
    val ridSchema = StructType(Seq(
      StructField("version", LongType), StructField("_row_id", LongType),
      StructField("k_old", LongType), StructField("k_new", LongType),
      StructField("v_old", LongType), StructField("v_new", LongType),
      StructField("change_type", StringType)))
    val got = spark.read.schema(ridSchema).parquet(s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        r.getString(6))).toSet
    // the update pairs by id; the compaction (v4) feeds zero rows
    assert(!got.exists(_._1 == 4L), "compaction must feed nothing")
    val ups = got.filter(_._1 == 3L)
    assert(ups.size === 1 && ups.head._5 == "update" &&
      ups.head._3 == 3L && ups.head._4 == 777L)
    // appended rows carry their computed implicit ids — they must
    // MATCH what the batch id read reports for those keys
    val ids = VersionedTable.readLatestWithRowIds(spark, base)
      .filter(col("k") >= 10L).select(col("k"), col("_row_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ins = got.filter(_._1 == 5L)
      .map(t => (t._3, t._2)) // (k_new, _row_id)
    assert(ins === ids, s"streamed insert ids must equal batch ids")
    // and the live feed equals the batch identity feed, row for row
    val batch = VersionedTable.changesByRowId(spark, base, v0, 5L)
      .select(col("version"), col("_row_id"),
        col("k_new"), col("v_new"), col("change_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getString(4))).toSet
    assert(got === batch)
  }

  test("identity change feed over a SHALLOW CLONE emits the shared " +
      "snapshot's rows (r16: raw-path keying silently dropped them)") {
    val src = TempDirs.scoped("graft_cdc_clone_src")
    val tgt = TempDirs.scoped("graft_cdc_clone_tgt")
    val dir = TempDirs.scoped("graft_cdc_clone_sink")
    appendDecade(src, 0L)
    VersionedTable.enableRowIds(src)
    VersionedTable.shallowClone(spark, src, tgt)
    // the clone commit's adds are `../`-prefixed shared entries; the
    // id-keyed feed must still compute base + position for every row
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("cdcKey", VersionedTable.RowIdCol)
      .option("startingVersion", "1")
      .load(tgt).writeStream
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination()
    val ridSchema = StructType(Seq(
      StructField("version", LongType), StructField("_row_id", LongType),
      StructField("k_old", LongType), StructField("k_new", LongType),
      StructField("v_old", LongType), StructField("v_new", LongType),
      StructField("change_type", StringType)))
    val got = spark.read.schema(ridSchema).parquet(s"$dir/out")
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getString(6)))
      .toSet
    val want = VersionedTable.readLatestWithRowIds(spark, src)
      .select(col("_row_id"), col("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), "insert")).toSet
    assert(got === want,
      s"the clone's shared rows must stream with their ids: $got")
    // the hwm travels with the clone (r16): an append on the clone
    // mints FRESH ids above the cloned rows', never colliding
    appendDecade(tgt, 100L)
    val ids = VersionedTable.readLatestWithRowIds(spark, tgt)
      .select(col("_row_id")).collect().map(_.getLong(0))
    assert(ids.length === ids.distinct.length,
      s"clone append minted duplicate row ids: ${ids.sorted.toSeq}")
  }

  test("change feed: a compaction feeds zero rows (no false changes)") {
    val base = TempDirs.scoped("graft_cdc_compact")
    val dir = TempDirs.scoped("graft_cdc_compact_sink")
    appendDecade(base, 0L); appendDecade(base, 10L)
    VersionedTable.compact(spark, base, numFiles = 1, statsCols = Seq("k"))
    drainCdc(base, dir)
    val got = cdcRows(dir)
    assert(got.size === 20)
    assert(got.forall(_._5 == "insert"))
    assert(got.map(_._1) === Set(1L, 2L)) // nothing attributed to v3
  }

  test("maxCommitsPerTrigger bounds each batch; the drain still completes") {
    val base = TempDirs.scoped("graft_stream_rate")
    appendDecade(base, 0L); appendDecade(base, 10L)
    appendDecade(base, 20L); appendDecade(base, 30L)
    val batches =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("graft")
      .option("startingVersion", "1")
      .option("maxCommitsPerTrigger", "2")
      .load(base).writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, id: Long) =>
        batches.synchronized { batches += ((id, df.count())); () }
      }
      .start()
    q.awaitTermination()
    // 4 tail commits / 2 per trigger = exactly 2 bounded batches
    assert(batches.map(_._2).toSeq === Seq(20L, 20L), batches)
    // snapshot-first mode: the snapshot batch is indivisible, the cap
    // applies to the tail
    val base2 = TempDirs.scoped("graft_stream_rate2")
    appendDecade(base2, 0L); appendDecade(base2, 10L)
    val dir2 = TempDirs.scoped("graft_stream_rate2_sink")
    drain(base2, dir2, Map("maxCommitsPerTrigger" -> "1"))
    assert(sinkRows(dir2) === (0L until 20L))
    appendDecade(base2, 20L); appendDecade(base2, 30L)
    drain(base2, dir2, Map("maxCommitsPerTrigger" -> "1"))
    assert(sinkRows(dir2) === (0L until 40L))
  }

  test("a RENAMED table streams: physical scan, logical output (r13)") {
    val base = TempDirs.scoped("graft_stream_mapped")
    val dir = TempDirs.scoped("graft_stream_mapped_sink")
    appendDecade(base, 0L)
    VersionedTable.alterRenameColumn(base, "v", "val")
    // post-rename appends land under the frozen physical name
    val s = spark
    import s.implicits._
    VersionedTable.commitAppend(spark, base,
      (10L until 20L).map(k => (k, k * 2)).toDF("k", "val").coalesce(1),
      statsCols = Seq("k"))
    // snapshot + tail both read: files carry physical `v`, the stream
    // emits the pinned logical `val`
    val q = spark.readStream.format("graft").load(base)
    assert(q.schema.fieldNames.toSeq === Seq("k", "val"))
    q.writeStream.trigger(Trigger.AvailableNow()).format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").start().awaitTermination()
    val out = spark.read.schema(StructType(Seq(
        StructField("k", LongType), StructField("val", LongType))))
      .parquet(s"$dir/out")
    assert(out.count() === 20L)
    // VALUES under the logical name — a null-filled misread would sum 0
    assert(out.agg(sum(col("val"))).head().getLong(0) ===
      (0L until 20L).map(_ * 2).sum)
    // a rename lands mid-stream: a resume pinned to the now
    // renamed-away logical name must REFUSE loudly (its physical is
    // no longer resolvable from the current mapping — null-filling
    // would be the silent-wrong class), naming the cure
    VersionedTable.alterRenameColumn(base, "val", "val2")
    VersionedTable.commitAppend(spark, base,
      (20L until 30L).map(k => (k, k * 2)).toDF("k", "val2").coalesce(1),
      statsCols = Seq("k"))
    val ex = intercept[Exception] {
      spark.readStream.format("graft")
        .schema(out.schema) // the stale pinned schema still says `val`
        .load(base)
        .writeStream.trigger(Trigger.AvailableNow()).format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt").start()
        .awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("restart the stream")),
      s"expected the loud renamed-away refusal, got: ${msgs(ex)}")
    // a fresh stream under the CURRENT names drains the whole history
    val dir2 = TempDirs.scoped("graft_stream_mapped_sink2")
    val q2 = spark.readStream.format("graft").load(base)
    assert(q2.schema.fieldNames.toSeq === Seq("k", "val2"))
    q2.writeStream.trigger(Trigger.AvailableNow()).format("parquet")
      .option("path", s"$dir2/out")
      .option("checkpointLocation", s"$dir2/ckpt").start().awaitTermination()
    val out2 = spark.read.schema(StructType(Seq(
        StructField("k", LongType), StructField("val2", LongType))))
      .parquet(s"$dir2/out")
    assert(out2.count() === 30L)
    assert(out2.agg(sum(col("val2"))).head().getLong(0) ===
      (0L until 30L).map(_ * 2).sum)
  }

  test("change feed over a RENAMED table emits logical names (r13)") {
    val base = TempDirs.scoped("graft_stream_mapped_cdc")
    val dir = TempDirs.scoped("graft_stream_mapped_cdc_sink")
    appendDecade(base, 0L)
    VersionedTable.alterRenameColumn(base, "v", "val")
    VersionedTable.commitDelete(spark, base, col("k") === 3L,
      pruneRanges = Seq(("k", 0L, 9L)), statsCols = Seq("k"))
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("cdcKey", "k")
      .load(base)
    assert(q.schema.fieldNames.toSeq ===
      Seq("version", "k", "val_old", "val_new", "change_type"))
    q.writeStream.trigger(Trigger.AvailableNow()).format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").start().awaitTermination()
    val out = spark.read.parquet(s"$dir/out")
    // 10 inserts (physical files read under the frozen name) + 1 delete
    assert(out.filter(col("change_type") === "insert").count() === 10L)
    val del = out.filter(col("change_type") === "delete").collect()
    assert(del.length === 1 && del.head.getAs[Long]("k") === 3L &&
      del.head.getAs[Long]("val_old") === 6L)
    // the insert rows carry real values under the logical name
    assert(out.filter(col("change_type") === "insert")
      .agg(sum(col("val_new"))).head().getLong(0) ===
      (0L until 10L).map(_ * 2).sum)
  }

  test("batches read through the stream-start schema; old files null-fill") {
    val base = TempDirs.scoped("graft_stream_evo")
    val s = spark
    import s.implicits._
    appendDecade(base, 0L) // v1: (k, v)
    VersionedTable.commitAppend(spark, base, // v2 evolves: (k, v, tag)
      (10L until 20L).map(k => (k, k * 2, s"t$k")).toDF("k", "v", "tag")
        .coalesce(1), statsCols = Seq("k"))
    val dir = TempDirs.scoped("graft_stream_evo_sink")
    drain(base, dir)
    val out = spark.read.schema(StructType(sinkSchema.fields :+
        StructField("tag", StringType))).parquet(s"$dir/out")
    assert(out.count() === 20L)
    // v1's files predate the ADD COLUMN: their rows null-fill `tag`
    assert(out.filter(col("tag").isNull).count() === 10L)
    assert(out.filter(col("k") >= 10L && col("tag").isNotNull).count() === 10L)
  }

  test("enable_rowids mid-stream feeds ZERO rows — row mode and change " +
      "feed (r13 advice: the restatement must not re-emit the table)") {
    val base = TempDirs.scoped("graft_stream_erid")
    val dir = TempDirs.scoped("graft_stream_erid_sink")
    val cdir = TempDirs.scoped("graft_stream_erid_cdc")
    appendDecade(base, 0L) // v1
    drain(base, dir) // both streams are now tailing past v1
    drainCdc(base, cdir)
    // v2: enable_rowids republishes EVERY live entry as '+' lines with
    // no removes — a pure metadata restatement, zero new rows
    VersionedTable.enableRowIds(base)
    appendDecade(base, 10L) // v3: real inserts
    drain(base, dir)
    // no duplicate re-emission of v1's rows via the v2 restatement
    assert(sinkRows(dir) === (0L until 20L))
    drainCdc(base, cdir)
    val got = cdcRows(cdir)
    assert(got.size === 20 && got.forall(_._5 == "insert"))
    assert(got.map(_._1) === Set(1L, 3L), "nothing attributed to v2")
  }
}
