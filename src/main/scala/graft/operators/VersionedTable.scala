package graft.operators

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Minimal snapshot-versioned parquet table: a commit-log directory of
  * manifest files gives plain parquet the four properties a 100 TB
  * pipeline reaches for a table format for — ATOMIC commit visibility,
  * TIME TRAVEL (`readVersion`), a MERGE INTO closure (`commitMerge`,
  * the q129 SCD1 argmax discipline), and — r10 — MANIFEST-LEVEL DATA
  * SKIPPING (`readVersionPruned`: per-file min/max zone maps written
  * at commit, consumed at read). All from public first principles
  * (the Delta/Iceberg commit-protocol idea: data files are immutable
  * and invisible until a manifest names them; the manifest carries the
  * statistics that let a reader never open non-overlapping files).
  *
  * Layout under `base/`:
  *   d{version}-{nonce}/part-*.parquet   immutable data files of ONE
  *                                       commit ATTEMPT (the nonce
  *                                       keeps concurrent attempts'
  *                                       files private — two writers
  *                                       racing to the same version
  *                                       can never list or clobber
  *                                       each other's data)
  *   _log/{version%020d}.commit          manifest: one line per data
  *                                       file composing that VERSION's
  *                                       full snapshot view, plus
  *                                       optional per-file column stats
  *
  * Manifest line format (tab-separated):
  *   relative/path.parquet[<TAB>col=lo..hi]...
  * Stats are per-file min/max of the INTEGRAL columns declared at
  * commit time (`statsCols`) — the zone maps a reader prunes on. A
  * column absent from a file's line (e.g. all-null in that file, or
  * the file predates stats) is simply not prunable on — skipping
  * degrades to reading, never to wrong answers. Files carried forward
  * by an append manifest keep their original stats lines VERBATIM, so
  * stat maintenance stays O(delta) like the manifest itself.
  *
  * Commit protocol (crash-safe, optimistic concurrency):
  *   1. pin the latest committed version v (the snapshot this commit
  *      is computed AGAINST — publishing is only attempted at v+1, so
  *      a commit that raced past us cannot be silently overwritten or
  *      silently missing from a merge);
  *   2. write the new data files under an attempt-private
  *      d{v+1}-{nonce} dir — unreferenced until step 4, so a crash
  *      here leaves only invisible orphans (spec-pinned; vacuum sweeps
  *      them);
  *   3. if stats columns are declared, scan the freshly written delta
  *      once for per-file min/max (O(delta); on a cluster the same
  *      numbers come out of the parquet footers already in hand);
  *   4. publish the manifest via hard-link create-EXCLUSIVE (link(2)
  *      fails with EEXIST if version v+1 was already committed) — an
  *      atomic rename() would silently REPLACE an existing marker on
  *      POSIX, turning a lost race into silent data loss; the link
  *      makes the loser fail loudly with a conflict.
  * On conflict, `commitAppend`/`commitMerge` REBASE AND RETRY (bounded
  * attempts): both closures are associative — append sets commute and
  * the merge argmax is order-insensitive — so recomputing against the
  * new latest is semantically free; the loser's abandoned attempt dir
  * is an invisible orphan for vacuum. Readers of version n see exactly
  * the manifest's file list regardless of concurrent writers.
  *
  * An APPEND commit writes only its delta files (manifest = previous
  * manifest + new lines — O(delta) I/O); a MERGE commit is
  * copy-on-write of the keyed current-state table (dimension-sized by
  * construction — one row per key — so the rewrite is bounded by the
  * key domain, never by history).
  *
  * Scale shape of skipping: the manifest is driver-plane metadata
  * (one line per file — MBs at 100k files), so pruning happens BEFORE
  * Spark lists or opens anything; a selective key predicate over a
  * clustered layout (see q153's z-order fixture) turns a 100 TB scan
  * into however many files actually overlap. Local-FS `java.nio` is
  * the sandbox I/O seam; on a cluster the same steps run through the
  * Hadoop FileSystem API (object stores need the same create-exclusive
  * publish, e.g. an S3 conditional PUT).
  */
object VersionedTable {

  /** Per-file min/max of one stats column (inclusive). */
  final case class ColStats(lo: Long, hi: Long)

  /** One manifest line: a data file path (relative to the table base)
    * plus its zone-map stats.
    */
  final case class ManifestEntry(path: String, stats: Map[String, ColStats])

  private def logDir(base: String): Path = Paths.get(base, "_log")

  private def markerPath(base: String, v: Long): Path =
    logDir(base).resolve(f"$v%020d.commit")

  /** Highest committed version, or None for an empty/uninitialized table.
    * Orphan data dirs (a crash between data write and publish) are
    * invisible here by construction.
    */
  def latestVersion(base: String): Option[Long] = {
    val log = logDir(base)
    if (!Files.isDirectory(log)) return None
    val stream = Files.list(log)
    val vs =
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".commit") &&
          n.stripSuffix(".commit").forall(_.isDigit))
        .map(_.stripSuffix(".commit").toLong)
        .toSeq
      finally stream.close() // Files.list holds a directory fd until closed
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def readManifest(base: String, v: Long): Seq[String] = {
    val m = markerPath(base, v)
    require(Files.exists(m),
      s"version $v does not exist in $base (latest: ${latestVersion(base)})")
    Files.readAllLines(m).asScala.toSeq
      .filterNot(l => l.startsWith("#") || l.isEmpty)
  }

  private def parseEntry(line: String): ManifestEntry = {
    val toks = line.split('\t')
    val stats = toks.iterator.drop(1).map { t =>
      val Array(c, range) = t.split("=", 2)
      val Array(lo, hi) = range.split("\\.\\.", 2)
      c -> ColStats(lo.toLong, hi.toLong)
    }.toMap
    ManifestEntry(toks.head, stats)
  }

  private def formatEntry(e: ManifestEntry): String =
    (e.path +: e.stats.toSeq.sortBy(_._1).map { case (c, st) =>
      s"$c=${st.lo}..${st.hi}" }).mkString("\t")

  /** The manifest of committed version `v`, parsed — the metadata
    * surface specs and audits (q153) count files and read zone maps
    * through.
    */
  def entries(base: String, v: Long): Seq[ManifestEntry] =
    readManifest(base, v).map(parseEntry)

  /** DESCRIBE HISTORY: one (version, op, n_files) row per committed
    * version, oldest first — read entirely from the commit log's
    * `#op=` headers and line counts (driver-plane; vacuumed-away
    * versions are simply absent). The audit surface a table owner
    * reads before time-traveling or assigning blame.
    */
  def history(base: String): Seq[(Long, String, Int)] = {
    val latest = latestVersion(base).getOrElse(return Seq.empty)
    (1L to latest).filter(v => Files.exists(markerPath(base, v))).map { v =>
      val raw = Files.readAllLines(markerPath(base, v)).asScala.toSeq
      val op = raw.find(_.startsWith("#op="))
        .map(_.stripPrefix("#op=")).getOrElse("unknown")
      (v, op, raw.count(l => !l.startsWith("#") && l.nonEmpty))
    }
  }

  /** Zone-map pruning: keep the entries that can possibly hold a row
    * satisfying EVERY conjunct `col BETWEEN lo AND hi`. An entry
    * without stats for a referenced column is never skipped — pruning
    * degrades to reading, not to wrong answers.
    */
  def prune(es: Seq[ManifestEntry],
            ranges: Seq[(String, Long, Long)]): Seq[ManifestEntry] =
    es.filter(e => ranges.forall { case (c, lo, hi) =>
      e.stats.get(c).forall(st => st.hi >= lo && st.lo <= hi)
    })

  /** The table as of committed version `v` (1-based) — time travel. */
  def readVersion(s: SparkSession, base: String, v: Long): DataFrame = {
    val files = entries(base, v).map(e => s"$base/${e.path}")
    s.read.parquet(files: _*)
  }

  /** Time travel THROUGH the zone maps: read version `v` opening only
    * the files whose stats overlap every `col BETWEEN lo AND hi`
    * conjunct. File-level skipping only — the caller still applies the
    * row-level filter; the contract is that the pruned read contains
    * every satisfying row of the full read (spec-pinned, and q153
    * hash-compares a pruned aggregate against a full-scan oracle).
    */
  def readVersionPruned(s: SparkSession, base: String, v: Long,
                        ranges: Seq[(String, Long, Long)]): DataFrame = {
    val all = entries(base, v)
    require(all.nonEmpty, s"version $v of $base has an empty manifest")
    val kept = prune(all, ranges)
    if (kept.isEmpty)
      // schema-preserving empty frame: every file was skipped
      s.read.parquet(s"$base/${all.head.path}").limit(0)
    else s.read.parquet(kept.map(e => s"$base/${e.path}"): _*)
  }

  def readLatest(s: SparkSession, base: String): DataFrame = {
    val v = latestVersion(base).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $base"))
    readVersion(s, base, v)
  }

  /** Append `df` as a new version: writes ONLY the delta's files; the
    * manifest carries the previous version's lines forward verbatim
    * (stats included). On a lost publish race, rebases onto the
    * winner's manifest and retries — append sets commute, so the
    * rebase is a manifest recomputation, not a data decision.
    */
  def commitAppend(s: SparkSession, base: String, df: DataFrame,
                   statsCols: Seq[String] = Nil,
                   maxAttempts: Int = 5): Long =
    retrying(maxAttempts) {
      val prevV = latestVersion(base)
      val prev = prevV.map(readManifest(base, _)).getOrElse(Seq.empty)
      commitAt(s, base, df, "append", statsCols, prevV)(fresh => prev ++ fresh)
    }

  /** MERGE INTO closure: the new version's state is the per-key argmax
    * (latest by `ordCols`) of previous state ∪ `delta` — associative,
    * so commit order across deltas cannot change the final state, and
    * a lost publish race is resolved by re-reading the winner's state
    * and re-merging the same delta (bounded retries). The first merge
    * commit on an empty table is the delta's own argmax. Copy-on-write:
    * the manifest references only the freshly written state files.
    * The snapshot version the merge was computed against is pinned —
    * publish is attempted at exactly that version + 1, so a commit
    * landing mid-computation forces a rebase instead of being silently
    * dropped from the merged state.
    */
  def commitMerge(s: SparkSession, base: String, delta: DataFrame,
                  keyCol: String, ordCols: Seq[String],
                  statsCols: Seq[String] = Nil,
                  maxAttempts: Int = 5): Long =
    commitMergeHooked(s, base, delta, keyCol, ordCols, statsCols,
      maxAttempts)(_ => ())

  /** [[commitMerge]] with a pre-publish hook per attempt — the seam
    * the concurrency spec injects a racing committer through (a
    * deterministic interleaving beats a timing-dependent thread race).
    */
  private[operators] def commitMergeHooked(
      s: SparkSession, base: String, delta: DataFrame,
      keyCol: String, ordCols: Seq[String], statsCols: Seq[String],
      maxAttempts: Int)(beforePublish: Int => Unit): Long = {
    var attempt = 0
    retrying(maxAttempts) {
      attempt += 1
      val prevV = latestVersion(base)
      val merged = prevV match {
        case Some(v) =>
          argmaxLatest(readVersion(s, base, v).unionByName(delta),
            keyCol, ordCols)
        case None => argmaxLatest(delta, keyCol, ordCols)
      }
      val a = attempt
      commitAt(s, base, merged, "merge", statsCols, prevV,
        () => beforePublish(a))(fresh => fresh)
    }
  }

  private def retrying(maxAttempts: Int)(attempt: => Long): Long = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var left = maxAttempts
    while (true) {
      try return attempt
      catch {
        case e: java.util.ConcurrentModificationException =>
          left -= 1
          if (left == 0) throw e
      }
    }
    -1L // unreachable
  }

  /** DELETE WHERE as a commit — the GDPR/right-to-be-forgotten path a
    * 100 TB table cannot live without: the new version's manifest
    * carries every file whose zone maps CANNOT contain a matching row
    * forward VERBATIM (stats included) and rewrites only the touched
    * files with `NOT rowPred` — O(affected files), not O(table), the
    * same file-scoped rewrite Delta/Iceberg perform. `pruneRanges`
    * scopes which files can match and MUST be implied by `rowPred`
    * (a row satisfying rowPred must fall inside the ranges on the
    * stats columns) — the caller states the delete's key footprint,
    * exactly as a `DELETE WHERE k BETWEEN a AND b` does; empty ranges
    * = every file is touched. Returns the new version, or the current
    * one unchanged when no file can contain a match (a provable
    * no-op commits nothing). Deleted rows remain time-travelable at
    * older versions until [[vacuum]] passes retention — the
    * snapshot-then-erase discipline (physical erasure is vacuum's
    * job, and the audit trail wants it that way).
    */
  def commitDelete(s: SparkSession, base: String,
                   rowPred: org.apache.spark.sql.Column,
                   pruneRanges: Seq[(String, Long, Long)] = Nil,
                   statsCols: Seq[String] = Nil,
                   maxAttempts: Int = 5): Long =
    retrying(maxAttempts) {
      val prevV = latestVersion(base)
      require(prevV.isDefined, s"nothing to delete from in $base")
      val es = entries(base, prevV.get)
      val touched = prune(es, pruneRanges)
      if (touched.isEmpty) prevV.get
      else {
        val untouched = es.filterNot(touched.toSet)
        val remaining = s.read
          .parquet(touched.map(e => s"$base/${e.path}"): _*)
          .filter(!rowPred)
        commitAt(s, base, remaining, "delete", statsCols, prevV)(
          fresh => untouched.map(formatEntry) ++ fresh)
      }
    }

  /** 16-bit Morton interleave of two integral columns — the z-value
    * [[optimize]] clusters on (and q133/q153 audit): a codegen'd sum
    * of shift/mask terms, no UDF. Degrades gracefully past 2^16 per
    * key (identical on any engine computing the same expression).
    */
  def zValue(a: org.apache.spark.sql.Column,
             b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Bin-packing COMPACTION: rewrite the latest snapshot into
    * `numFiles` balanced files as a new commit — the maintenance job
    * that pays down the small-file debt O(delta) appends accumulate
    * (at 100 TB, thousands of per-batch appends otherwise turn every
    * read into a file-open storm). Copy-on-write: readers of older
    * versions are untouched; [[vacuum]] reclaims the stranded small
    * files once retention passes. Stats are recomputed for the new
    * files at commit.
    */
  def compact(s: SparkSession, base: String, numFiles: Int,
              statsCols: Seq[String] = Nil): Long = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    retrying(maxAttempts = 5) {
      val prevV = latestVersion(base)
      require(prevV.isDefined, s"nothing to compact in $base")
      val snap = readVersion(s, base, prevV.get).repartition(numFiles)
      commitAt(s, base, snap, "compact", statsCols, prevV)(fresh => fresh)
    }
  }

  /** OPTIMIZE ZORDER BY: rewrite the latest snapshot range-clustered
    * on the Morton z-value of two key columns (sorted within files),
    * as a new commit with fresh zone maps — the layout that makes
    * [[readVersionPruned]]'s skipping bite on multi-key predicates
    * (q153 measures the effect: a z-clustered layout answers a
    * selective key slice from a fraction of the files an insert-order
    * layout must open). Same copy-on-write/vacuum story as
    * [[compact]]; the rewritten columns' stats are always collected.
    */
  def optimize(s: SparkSession, base: String, zCols: (String, String),
               numFiles: Int, statsCols: Seq[String] = Nil): Long = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    retrying(maxAttempts = 5) {
      val prevV = latestVersion(base)
      require(prevV.isDefined, s"nothing to optimize in $base")
      val z = zValue(col(zCols._1).cast("long"), col(zCols._2).cast("long"))
      val snap = readVersion(s, base, prevV.get)
        .repartitionByRange(numFiles, z)
        .sortWithinPartitions(z)
      val stats = (statsCols ++ Seq(zCols._1, zCols._2)).distinct
      commitAt(s, base, snap, "optimize", stats, prevV)(fresh => fresh)
    }
  }

  /** Retention vacuum: delete every data file not referenced by any
    * manifest of version ≥ `retainFrom`, plus the manifests below it —
    * time travel to versions < `retainFrom` fails cleanly afterwards
    * (their markers are gone, not dangling), reads at ≥ `retainFrom`
    * are untouched. Also sweeps crash orphans and abandoned commit
    * attempts (data dirs no manifest ever referenced). Returns the
    * deleted paths (relative), for the audit log a production vacuum
    * writes. Append-only histories delete nothing (later manifests
    * carry every earlier file — the O(delta) manifest design means
    * retention costs nothing until copy-on-write MERGE commits strand
    * old state dirs).
    */
  def vacuum(base: String, retainFrom: Long): Seq[String] = {
    val latest = latestVersion(base).getOrElse(return Seq.empty)
    require(retainFrom <= latest,
      s"retainFrom $retainFrom is beyond latest committed version $latest")
    val referenced = (retainFrom to latest)
      .filter(v => Files.exists(markerPath(base, v)))
      .flatMap(v => entries(base, v).map(_.path)).toSet
    val dataDirs = {
      val stream = Files.list(Paths.get(base))
      try stream.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("d"))
        .toSeq
      finally stream.close()
    }
    val deletedFiles = dataDirs.flatMap { dir =>
      val stream = Files.list(dir)
      val files =
        try stream.iterator().asScala.filter(f => !Files.isDirectory(f)).toSeq
        finally stream.close()
      val rels = files.map(f => s"${dir.getFileName}/${f.getFileName}")
      if (!rels.exists(referenced.contains)) {
        // dir holds NO live data (crash orphan, abandoned attempt, or
        // stranded merge state): remove it whole, bookkeeping files
        // (_SUCCESS, .crc) included
        files.foreach(f => Files.deleteIfExists(f))
        try Files.deleteIfExists(dir) catch { case _: Exception => }
        rels
      } else {
        // live dir: delete only unreferenced DATA files — writer
        // bookkeeping stays with the files it describes
        val victims = files.zip(rels).filter { case (f, rel) =>
          rel.endsWith(".parquet") &&
            !f.getFileName.toString.startsWith(".") &&
            !referenced.contains(rel)
        }
        victims.foreach { case (f, _) => Files.deleteIfExists(f) }
        victims.map(_._2)
      }
    }
    val deletedMarkers = (1L until retainFrom)
      .filter(v => Files.deleteIfExists(markerPath(base, v)))
      .map(v => s"_log/${markerPath(base, v).getFileName}")
    deletedFiles ++ deletedMarkers
  }

  /** Change data feed between two committed versions: one row per key
    * whose state differs, tagged insert/update/delete with old and new
    * value columns side by side (the Delta-CDF idea reconstructed from
    * snapshots). Scale: both sides are dimension-sized state tables
    * (one row per key), the diff is ONE key-keyed full-outer join; no
    * log replay, no history scan. A key present in both versions with
    * identical value columns emits nothing.
    */
  def changesBetween(s: SparkSession, base: String, fromV: Long, toV: Long,
                     keyCol: String): DataFrame = {
    val before = readVersion(s, base, fromV)
    val after = readVersion(s, base, toV)
    val valCols = before.columns.filterNot(_ == keyCol).toSeq
    val b = before.select(col(keyCol) +:
      valCols.map(c => col(c).as(s"${c}_old")) :+
      lit(true).as("__in_old"): _*)
    val a = after.select(col(keyCol) +:
      valCols.map(c => col(c).as(s"${c}_new")) :+
      lit(true).as("__in_new"): _*)
    val changed = valCols.map(c =>
      !(col(s"${c}_old") <=> col(s"${c}_new"))).reduce(_ || _)
    b.join(a, Seq(keyCol), "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .drop("__in_old", "__in_new")
  }

  /** Latest row per key by `ordCols` (the q21/q129 max-of-struct
    * argmax; `ordCols` must totally order rows within a key).
    */
  def argmaxLatest(df: DataFrame, keyCol: String,
                   ordCols: Seq[String]): DataFrame = {
    val valCols = df.columns.filterNot(_ == keyCol).toSeq
    df.groupBy(col(keyCol))
      .agg(max(struct((ordCols ++ valCols.filterNot(ordCols.contains))
        .map(col): _*)).as("__m"))
      .select(col(keyCol) +: valCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** One commit ATTEMPT at pinned snapshot `prevV`: write data files
    * to an attempt-private dir, collect stats, publish at prevV+1 (a
    * ConcurrentModificationException here means the snapshot went
    * stale — the caller rebases).
    */
  private def commitAt(s: SparkSession, base: String, df: DataFrame,
                       op: String, statsCols: Seq[String],
                       prevV: Option[Long],
                       beforePublish: () => Unit = () => ())(
      manifest: Seq[String] => Seq[String]): Long = {
    statsCols.foreach { c =>
      require(!c.contains('=') && !c.contains('\t'),
        s"stats column name '$c' would corrupt the manifest line format")
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"stats column '$c' must be integral for zone maps, got $dt")
    }
    val next = prevV.getOrElse(0L) + 1L
    // attempt-private dir: concurrent committers (and retries) can
    // never list or overwrite each other's unpublished files
    val dataDir = f"d$next-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(s"$base/$dataDir")
    val dirStream = Files.list(Paths.get(base, dataDir))
    val freshNames =
      try dirStream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        .toSeq.sorted
      finally dirStream.close()
    val stats = collectStats(s, s"$base/$dataDir", statsCols)
    // with stats collected, a fresh file absent from the grouped scan
    // is PROVABLY empty (zero rows ⟹ no group; all-null columns still
    // group) — keep it out of the manifest, so deletes that empty a
    // file don't strand unprunable zero-row entries
    val liveNames =
      if (statsCols.isEmpty) freshNames else freshNames.filter(stats.contains)
    val freshLines = liveNames.map { n =>
      formatEntry(ManifestEntry(s"$dataDir/$n", stats.getOrElse(n, Map.empty)))
    }
    beforePublish()
    publish(base, next, (s"#op=$op" +: manifest(freshLines))
      .mkString("", "\n", "\n"))
    next
  }

  /** Per-file min/max of the declared integral columns over a freshly
    * written delta dir: one O(delta) grouped scan keyed by the hidden
    * `_metadata.file_name`, collected to the driver — metadata-plane
    * by construction (one row per file, like the manifest itself). On
    * a cluster the same numbers come from the parquet footers the
    * writer already produced; the read-back keeps the sandbox seam
    * engine-only.
    */
  private def collectStats(s: SparkSession, dir: String,
      statsCols: Seq[String]): Map[String, Map[String, ColStats]] = {
    if (statsCols.isEmpty) return Map.empty
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__lo_$c"),
      max(col(c).cast("long")).as(s"__hi_$c")))
    s.read.parquet(dir)
      .groupBy(col("_metadata.file_name").as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r: Row =>
        val per = statsCols.flatMap { c =>
          val lo = r.getAs[Any](s"__lo_$c")
          val hi = r.getAs[Any](s"__hi_$c")
          // all-null column in this file → no stats → never pruned on
          if (lo == null || hi == null) None
          else Some(c -> ColStats(lo.asInstanceOf[Long], hi.asInstanceOf[Long]))
        }.toMap
        r.getAs[String]("__f") -> per
      }.toMap
  }

  /** Publish in isolation (package-visible so the spec can pin the
    * single-winner property without a timing-dependent race): atomic
    * create-exclusive publish of version `v`'s manifest.
    */
  private[operators] def publish(base: String, v: Long, body: String): Unit = {
    Files.createDirectories(logDir(base))
    val tmp = logDir(base).resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, body.getBytes("UTF-8"))
    try Files.createLink(markerPath(base, v), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"commit conflict: version $v was committed concurrently in $base")
    } finally Files.deleteIfExists(tmp)
  }
}
