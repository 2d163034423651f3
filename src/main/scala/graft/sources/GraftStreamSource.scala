package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, input_file_name, lit, regexp_extract}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.VersionedTable

/** The graft table format as a STRUCTURED STREAMING source — the
  * commit log itself is the stream: `spark.readStream.format("graft")
  * .load(base)` tails the table, one offset per committed version
  * (the Delta-source shape; Delta's own `DeltaSource` is this same V1
  * `Source` API). Micro-batch planning is pure commit-log metadata:
  *
  *   - offset = the latest committed version (a `LongOffset`, so the
  *     sink's checkpoint records "consumed through version v" — restart
  *     resumes from the log position, exactly once);
  *   - the DEFAULT start is Delta's: the first batch is the full
  *     snapshot at the stream's first-seen version, subsequent batches
  *     are the per-commit tail — a consumer attaching to a compacted /
  *     merged table starts from its current state, not from a replay
  *     that would double-count rewritten rows;
  *   - `startingVersion` (a version number, or `latest` for
  *     only-new-commits) switches to the per-commit replay start;
  *   - a tail batch for commits `(start, end]` reads ONLY the files
  *     those commits ADDED (`VersionedTable.commitDelta` — a pure
  *     append's added files ARE its inserted rows), so batch cost is
  *     ∝ the delta, never ∝ the table: the q158 change-feed argument,
  *     now feeding a live query;
  *   - a commit that REMOVED files (delete / merge / compaction /
  *     replace) cannot stream as appends: the source fails loudly by
  *     default, or skips the commit whole under
  *     `skipChangeCommits=true` (Delta's option and caveat verbatim —
  *     rewritten rows are NOT re-emitted).
  *
  * Schema is pinned at stream start (the declared schema of the
  * resolved version): later evolved-in columns are ignored, files
  * predating an ADD COLUMN null-fill — each batch reads through the
  * same StructType, so the query's resolved plan never drifts.
  *
  * Retention contract: tailing needs the range's commit markers and
  * data files to still exist — vacuum retention must cover consumer
  * lag (the same precondition Delta's CDF read documents; a vacuumed
  * marker fails the batch loudly via `commitDelta`'s require).
  *
  * `readChangeFeed=true` (+ `cdcKey=<col>`) switches the stream to the
  * CHANGE FEED — Delta CDF as a live query: each batch emits
  * [[VersionedTable.changesPerCommit]]-shaped rows (`version`, key,
  * `*_old`/`*_new`, `change_type`) for the commits it covers, with
  * append commits streamed straight off their added files as `insert`
  * rows (zero copies) and change commits spooled per-commit under the
  * checkpoint (see [[cdcBatch]]). Default start replays the full
  * history; `startingVersion` applies as in row mode.
  */
class GraftStreamSource(spark: SparkSession, base: String,
                        sourceSchema: StructType, snapshotStart: Boolean,
                        fromVersion: Long, skipChangeCommits: Boolean,
                        cdcKey: Option[String] = None,
                        spoolDir: Option[String] = None,
                        maxCommitsPerTrigger: Option[Long] = None,
                        maxBytesPerTrigger: Option[Long] = None)
    extends Source with SupportsTriggerAvailableNow {

  maxCommitsPerTrigger.foreach(m => require(m >= 1L,
    s"maxCommitsPerTrigger must be >= 1, got $m"))
  maxBytesPerTrigger.foreach(m => require(m >= 1L,
    s"maxBytesPerTrigger must be >= 1, got $m"))

  private val readSchema =
    StructType(sourceSchema.fields.map(_.copy(nullable = true)))

  // COLUMN-MAPPED tables stream too (r13 — the r12 source refused
  // them): data files live under frozen PHYSICAL names, so every
  // per-file scan below reads the physical schema and aliases back to
  // the logical names pinned at stream start. Physicals never change
  // once assigned (renames are metadata-only), so a mid-stream rename
  // cannot drift a running query's plan — the scan keys on names the
  // files actually carry, which is MORE stable than logical ones.
  private val physOf: Map[String, String] =
    VersionedTable.latestVersion(base)
      .flatMap(v => VersionedTable.declaredSchema(base, v))
      .filter(graft.operators.ColumnMapping.isMapped)
      .map(graft.operators.ColumnMapping.toPhysical)
      .getOrElse(Map.empty)
  private def phys(c: String): String = physOf.getOrElse(c, c)
  // a pinned logical name that is no longer in the VISIBLE schema of a
  // mapped table (renamed away or dropped since the checkpoint) has no
  // resolvable physical — null-filling it would be the silent-wrong
  // class; refuse loudly and name the cure
  if (physOf.nonEmpty) {
    val unresolved = readSchema.fieldNames.filterNot(physOf.contains)
    require(unresolved.isEmpty,
      s"streaming from $base: pinned column(s) " +
        s"${unresolved.mkString(", ")} are not in the table's current " +
        "visible schema (renamed or dropped since this stream's " +
        "checkpoint) — restart the stream against the current schema")
  }
  private val scanSchema =
    StructType(readSchema.fields.map(f => f.copy(name = phys(f.name))))
  /** Project a physical-named frame onto the pinned logical schema. */
  private def toLogical(df: DataFrame): DataFrame =
    df.select(readSchema.fieldNames.map(n => col(phys(n)).as(n)).toSeq: _*)

  /** CHANGE-FEED shape (`readChangeFeed=true`): one row per
    * (commit, changed key) in [[VersionedTable.changesPerCommit]]'s
    * schema — `version`, the key, `*_old`/`*_new` value columns,
    * `change_type` — pinned at stream start like the row schema.
    */
  private val cdcSchema: Option[StructType] =
    cdcKey.map(k => GraftStreamSource.cdcSchemaOf(readSchema, k))

  override def schema: StructType = cdcSchema.getOrElse(sourceSchema)

  private def ver(o: OffsetV2): Long = o.json.trim.toLong

  private def currentLatest(): Option[Long] =
    VersionedTable.latestVersion(base)
      .filter(v => snapshotStart || v >= fromVersion)

  override def getOffset: Option[Offset] = currentLatest().map(LongOffset(_))

  // ----- Trigger.AvailableNow, first-class (the FileStreamSource /
  // Delta-source admission-control contract): the drain is bounded to
  // the versions committed when the trigger fired, so a run terminates
  // even while writers keep committing — no wrapper, no single-batch
  // fallback warning.
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = currentLatest()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control (`maxCommitsPerTrigger`): bound each batch's
    * end offset to `start + max` commits — the Delta
    * `maxFilesPerTrigger` idiom at commit granularity, so a consumer
    * restarting after long downtime drains the backlog in bounded
    * batches instead of one unbounded catch-up. The snapshot-first
    * batch is indivisible (one consistent state) and stays uncapped;
    * under AvailableNow the cap composes with the pinned drain target
    * (several bounded batches until the pin is reached).
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val capped = currentLatest().map { l =>
      val pinned = availableNowCap.fold(l)(math.min(l, _))
      val byCommits = (Option(start), maxCommitsPerTrigger) match {
        case (Some(st), Some(m)) => math.min(pinned, ver(st) + m)
        case (None, Some(m)) if !snapshotStart =>
          math.min(pinned, fromVersion - 1L + m)
        case _ => pinned
      }
      (Option(start).map(ver)
        .orElse(if (snapshotStart) None else Some(fromVersion - 1L))) match {
        case Some(from) => math.min(byCommits, bytesCap(from, byCommits))
        case None => byCommits // the snapshot-first batch is indivisible
      }
    }
    capped.map(LongOffset(_)).orNull
  }

  /** `maxBytesPerTrigger` (the Delta idiom at commit granularity):
    * admit commits after `fromExclusive` until their ADDED files'
    * cumulative bytes reach the cap — always at least one, so the
    * stream can never stall on a single oversized commit. Sizes come
    * from the commit deltas' files on disk (driver-plane metadata
    * walk, ∝ admitted commits).
    */
  private def bytesCap(fromExclusive: Long, upTo: Long): Long =
    maxBytesPerTrigger match {
      case None => upTo
      case Some(cap) =>
        var acc = 0L
        var v = fromExclusive
        while (v < upTo && acc < cap) {
          val (_, adds, _) = VersionedTable.commitDelta(base, v + 1L)
          acc += adds.map { e =>
            val p = java.nio.file.Paths.get(base, e.path)
            if (java.nio.file.Files.exists(p)) java.nio.file.Files.size(p)
            else 0L
          }.sum
          v += 1L
        }
        // the loop admits ≥1 commit whenever any is available (acc
        // starts below the cap), so v is the bounded end offset
        v
    }

  override def reportLatestOffset(): OffsetV2 =
    currentLatest().map(LongOffset(_)).orNull

  override def getBatch(start: Option[Offset], end: Offset): DataFrame =
    cdcSchema match {
      case Some(cs) => cdcBatch(start, ver(end), cs)
      case None => rowBatch(start, ver(end))
    }

  private def rowBatch(start: Option[Offset], endV: Long): DataFrame = {
    val es: Seq[VersionedTable.ManifestEntry] = start match {
      case None if snapshotStart =>
        // first batch: the full snapshot at the stream's start version
        VersionedTable.entries(base, endV)
      case _ =>
        val lo = start.map(ver(_) + 1L).getOrElse(fromVersion)
        (lo to endV).flatMap { v =>
          val (op, adds, removes) = VersionedTable.commitDelta(base, v)
          // enable_rowids is a pure RESTATEMENT: it republishes every
          // live entry as '+' lines (no removes) to stamp id bases —
          // zero new rows. Streaming it as appends would re-emit the
          // ENTIRE table as duplicate inserts (the batch feed filters
          // these via never-before-live paths; the stream skips by op,
          // O(1) — an enable_rowids commit adds only already-live paths
          // by construction, see VersionedTable.enableRowIds).
          if (op == "enable_rowids") Seq.empty
          // appended files never carry a deletion vector at birth
          else if (removes.isEmpty) adds
          else if (skipChangeCommits) Seq.empty
          else throw new IllegalStateException(
            s"graft stream over $base hit change commit v$v (op=$op): a " +
              "commit that removes files cannot stream as appends — set " +
              "skipChangeCommits=true to skip rewrite commits (their " +
              "re-written rows will NOT be re-emitted), or read the " +
              "change feed (readChangeFeed=true) instead")
        }
    }
    if (es.isEmpty) GraftBridge.streamingEmpty(spark, readSchema)
    else {
      val scan = GraftBridge.streamingScan(spark,
        es.map(e => s"$base/${e.path}"), scanSchema)
      // snapshot entries may carry deletion vectors (MoR deletes):
      // drop the soft-deleted positions via a stream-static broadcast
      // anti-join on (file, row_index) — the same shape the batch
      // reader uses, cost ∝ dv'd files' rows + deleted positions
      val dvd = es.filter(_.dv.exists(_.count > 0L))
      if (dvd.isEmpty) toLogical(scan)
      else {
        val withPos = scan
          .withColumn("__rel", regexp_extract(col("_metadata.file_path"),
            "/(d[0-9]+-[^/]+/[^/]+)$", 1))
          .withColumn("__pos", col("_metadata.row_index"))
        val dvF = org.apache.spark.sql.functions.broadcast(
          VersionedTable.dvPositionsFrame(spark, base, dvd))
        toLogical(withPos.join(dvF,
          withPos("__rel") === dvF("__dvrel") &&
            withPos("__pos") === dvF("__dvpos"), "left_anti"))
      }
    }
  }

  /** One CDC micro-batch for commits `(start, end]`. Two legs, both
    * O(changed files):
    *   - pure-append commits stream their ADDED FILES directly as
    *     `insert` rows — zero copies; the emitting commit's version is
    *     recovered from the file's `d{v}-{nonce}` directory name (the
    *     commit protocol's layout invariant), so one scan serves any
    *     number of appends in the range;
    *   - change commits (delete/merge/compact/replace) spool their
    *     [[VersionedTable.changesPerCommit]] diff to a per-commit
    *     parquet under the stream's checkpoint metadata dir and stream
    *     that — the read-side materialization of Delta's `_change_data`
    *     files, deterministic per commit (overwrite mode), so a
    *     retried batch rebuilds the identical spool. A compaction's
    *     diff is empty by construction (rows unchanged) — it spools
    *     zero rows rather than failing the feed.
    */
  private def cdcBatch(start: Option[Offset], endV: Long,
                       cs: StructType): DataFrame = {
    val key = cdcKey.get
    val byId = key == VersionedTable.RowIdCol
    val spool = spoolDir.getOrElse(throw new IllegalStateException(
      "CDC stream needs a spool dir — create the source through " +
        "readStream.format(\"graft\") so the checkpoint provides one"))
    val lo = start.map(ver(_) + 1L).getOrElse(fromVersion)
    var appendAdds = Vector.empty[VersionedTable.ManifestEntry]
    var spoolPaths = Vector.empty[String]
    (lo to endV).foreach { v =>
      val (op, adds, removes) = VersionedTable.commitDelta(base, v)
      // metadata-only restatement (see rowBatch): no rows changed, so
      // the change feed emits nothing for it
      if (op == "enable_rowids") ()
      else if (removes.isEmpty) appendAdds ++= adds
      else {
        val dir = s"$spool/v$v"
        align(
          if (byId) VersionedTable.changesByRowId(spark, base, v - 1, v)
          else VersionedTable.changesPerCommit(spark, base, v - 1, v, key),
          cs).write.mode("overwrite").parquet(dir)
        spoolPaths :+= dir
      }
    }
    val legs = Seq(
      if (appendAdds.isEmpty) None else Some(insertLeg(appendAdds, cs, key)),
      if (spoolPaths.isEmpty) None
      else Some(GraftBridge.streamingScan(spark, spoolPaths, cs))).flatten
    legs.reduceOption(_.unionByName(_))
      .getOrElse(GraftBridge.streamingEmpty(spark, cs))
  }

  /** Append commits as CDC `insert` rows, straight off the data files.
    * Under `cdcKey=_row_id` the key is computed, not read: a pure
    * append's ids are its files' implicit `rowBase + row_index` (the
    * manifest carries the bases; a stream-static broadcast join maps
    * each scanned row's file to its base — appended files never carry
    * materialized ids, those only come from rewrites, which are
    * change commits and take the spool leg).
    */
  private def insertLeg(adds: Vector[VersionedTable.ManifestEntry],
                        cs: StructType, key: String): DataFrame = {
    val byId = key == VersionedTable.RowIdCol
    val scan = GraftBridge.streamingScan(spark,
      adds.map(e => s"$base/${e.path}"), scanSchema)
    val vals = readSchema.fieldNames.filterNot(_ == key).toSeq
    def verCol: Column =
      regexp_extract(input_file_name(), "/d([0-9]+)-[^/]*/[^/]*$", 1)
        .cast(LongType).as("version")
    val keyed =
      if (byId) {
        val missing = adds.filter(_.rowBase < 0L)
        require(missing.isEmpty,
          s"cdcKey=${VersionedTable.RowIdCol} needs row tracking on " +
            s"every streamed file — ${missing.size} appended file(s) " +
            s"carry no row-id base (enableRowIds on $base first)")
        val sq = spark
        import sq.implicits._
        // keyed by the SCAN-KEY suffix (VersionedTable.relKey): the
        // __rel regex below never yields a clone/branch entry's `../`
        // prefix, so raw-path keying would silently drop every shared
        // file's rows from the id-keyed feed (r16 review)
        val bases = org.apache.spark.sql.functions.broadcast(
          adds.map(e => (VersionedTable.relKey(e.path), e.rowBase))
            .toDF("__rbrel", "__rbbase"))
        scan
          .withColumn("__rel", regexp_extract(col("_metadata.file_path"),
            "/(d[0-9]+-[^/]+/[^/]+)$", 1))
          .withColumn("__pos", col("_metadata.row_index"))
          .join(bases, col("__rel") === col("__rbrel"))
          .withColumn(key, col("__rbbase") + col("__pos"))
      } else scan.withColumn(key, col(phys(key)))
    keyed.select(
      verCol +:
        col(key) +:
        (vals.map(c => lit(null).cast(readSchema(c).dataType)
          .as(s"${c}_old")) ++
          vals.map(c => col(phys(c)).as(s"${c}_new"))) :+
        lit("insert").as("change_type"): _*)
  }

  /** Project `df` onto exactly `cs` (missing columns null-fill — the
    * schema-evolution case where an old commit's diff lacks a later
    * column), keeping the spool and the stream schema aligned.
    */
  private def align(df: DataFrame, cs: StructType): DataFrame =
    df.select(cs.fields.map(f =>
      (if (df.columns.contains(f.name)) col(f.name) else lit(null))
        .cast(f.dataType).as(f.name)).toSeq: _*)

  override def stop(): Unit = ()
}

object GraftStreamSource {

  /** The change-feed schema for a row schema and key — must match
    * [[VersionedTable.changesPerCommit]]'s output shape exactly
    * (`version`, key, `*_old` then `*_new` in row-schema order,
    * `change_type`), since spooled diffs and the declared stream
    * schema are one and the same.
    */
  def cdcSchemaOf(rowSchema: StructType, key: String): StructType = {
    val nullable =
      StructType(rowSchema.fields.map(_.copy(nullable = true)))
    val vals = nullable.fields.filterNot(_.name == key)
    // cdcKey=_row_id: CDC BY IDENTITY (q195 as a live stream) — the
    // key is the engine-assigned stable row id, not a data column, so
    // every data column becomes an _old/_new pair
    val keyField =
      if (key == VersionedTable.RowIdCol)
        StructField(key, LongType, nullable = false)
      else nullable.fields.find(_.name == key).getOrElse(
        throw new IllegalArgumentException(
          s"cdcKey '$key' is not a column " +
            s"(${rowSchema.fieldNames.mkString(", ")})"))
    StructType(
      StructField("version", LongType, nullable = false) +:
        keyField +:
        (vals.map(f => f.copy(name = s"${f.name}_old")) ++
          vals.map(f => f.copy(name = s"${f.name}_new"))).toSeq :+
        StructField("change_type", StringType, nullable = true))
  }
}
