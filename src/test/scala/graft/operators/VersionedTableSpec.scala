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
    // crash debris: a data dir no manifest references, AHEAD of the
    // log (d99 > latest 3) — indistinguishable from a racing writer's
    // in-flight attempt, so the default age gate must spare it
    kv(Seq((9L, 9L, 9L))).write.parquet(s"$base/d99")
    val stranded = (1L to 2L).flatMap(v =>
      VersionedTable.entries(base, v).map(_.path))
    val gated = VersionedTable.vacuum(base, retainFrom = 3L)
    // stranded merge states are at versions ≤ latest (their race is
    // decided) — swept immediately; the fresh ahead-of-log dir is not
    assert(stranded.nonEmpty && stranded.forall(gated.contains))
    assert(!gated.exists(_.startsWith("d99/")))
    assert(Files.exists(Paths.get(base, "d99")))
    // past the retention window the same dir is a provable orphan
    val deleted = VersionedTable.vacuum(base, retainFrom = 3L,
      attemptRetentionMs = 0L)
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

  test("zone maps: stats written at commit, carried forward verbatim on append") {
    val base = TempDirs.scoped("vt_stats")
    VersionedTable.commitAppend(spark, base,
      kv(Seq((1L, 1L, 10L), (5L, 1L, 50L))).coalesce(1), statsCols = Seq("k"))
    VersionedTable.commitAppend(spark, base,
      kv(Seq((100L, 2L, 1L))).coalesce(1), statsCols = Seq("k"))
    val e1 = VersionedTable.entries(base, 1L)
    assert(e1.size === 1 &&
      e1.head.stats("k") === VersionedTable.ColStats(1L, 5L))
    val e2 = VersionedTable.entries(base, 2L)
    assert(e2.size === 2)
    // v1's line is carried forward with its stats intact (O(delta))
    assert(e2.find(_.path == e1.head.path).get.stats ===
      e1.head.stats)
    assert(e2.find(_.path != e1.head.path).get.stats("k") ===
      VersionedTable.ColStats(100L, 100L))
  }

  test("pruned read: equality with the full read, strictly fewer files opened") {
    val base = TempDirs.scoped("vt_prune")
    // three one-file commits with disjoint key ranges
    Seq(Seq((1L, 1L, 1L), (9L, 1L, 2L)), Seq((10L, 1L, 3L), (19L, 1L, 4L)),
        Seq((20L, 1L, 5L), (29L, 1L, 6L)))
      .foreach(rows => VersionedTable.commitAppend(
        spark, base, kv(rows).coalesce(1), statsCols = Seq("k")))
    val v = VersionedTable.latestVersion(base).get
    val ranges = Seq(("k", 10L, 19L))
    val kept = VersionedTable.prune(VersionedTable.entries(base, v), ranges)
    assert(kept.size === 1 && VersionedTable.entries(base, v).size === 3)
    // the file-level skip loses no satisfying row vs the full read
    val full = VersionedTable.readVersion(spark, base, v)
      .filter(col("k").between(10L, 19L)).collect().map(_.getLong(0)).sorted
    val pruned = VersionedTable.readVersionPruned(spark, base, v, ranges)
      .filter(col("k").between(10L, 19L)).collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === full.toSeq && full.toSeq === Seq(10L, 19L))
    // every file skipped → schema-preserving empty frame
    val none = VersionedTable.readVersionPruned(
      spark, base, v, Seq(("k", 1000L, 2000L)))
    assert(none.count() === 0L && none.columns.toSeq === Seq("k", "ord", "v"))
    // a file without stats for the column is never skipped
    val noStats = VersionedTable.prune(
      Seq(VersionedTable.ManifestEntry("dX/f.parquet", Map.empty)), ranges)
    assert(noStats.size === 1)
  }

  test("stats columns must be zone-map-typed and manifest-safe") {
    val base = TempDirs.scoped("vt_statcols")
    val s = spark
    import s.implicits._
    // floats have no safe zone-map order (NaN) — rejected loudly
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(spark, base,
        Seq((1.5, 1L)).toDF("score", "k"), statsCols = Seq("score"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(spark, base,
        Seq((1L, 1L)).toDF("a=b", "k"), statsCols = Seq("a=b"))
    }
  }

  test("string and date zone maps: typed stats, hex-safe encoding, pruning bites") {
    val base = TempDirs.scoped("vt_strstats")
    val s = spark
    import s.implicits._
    def batch(rows: Seq[(String, Int, Long)]) = {
      val df = rows.toDF("name", "days", "v")
        .withColumn("day", org.apache.spark.sql.functions.date_add(
          org.apache.spark.sql.functions.lit("2024-01-01").cast("date"),
          col("days"))).drop("days").coalesce(1)
      VersionedTable.commitAppend(spark, base, df,
        statsCols = Seq("name", "day"))
    }
    // three one-file commits with disjoint name/date ranges; a tab- and
    // dot-bearing name exercises the hex escape
    batch(Seq(("alpha", 0, 1L), ("beta..\tx", 5, 2L)))
    batch(Seq(("mike", 10, 3L), ("november", 15, 4L)))
    batch(Seq(("xray", 20, 5L), ("zulu", 25, 6L)))
    val v = VersionedTable.latestVersion(base).get
    val es = VersionedTable.entries(base, v)
    assert(es.size === 3)
    assert(es.head.stats("name") ===
      VersionedTable.StrStats("alpha", "beta..\tx"))
    // dates flatten to epoch days
    val d0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    assert(es.head.stats("day") === VersionedTable.ColStats(d0, d0 + 5))
    // string pruning: the m..p slice keeps only the middle file
    val keptS = VersionedTable.pruneTyped(es,
      Seq(VersionedTable.StrRange("name", "m", "p")))
    assert(keptS.size === 1 && keptS.head.path == es(1).path)
    // date pruning via the typed helper
    val keptD = VersionedTable.pruneTyped(es,
      Seq(VersionedTable.PruneRange.date("day",
        java.time.LocalDate.parse("2024-01-20"),
        java.time.LocalDate.parse("2024-01-31"))))
    assert(keptD.size === 1 && keptD.head.path == es(2).path)
    // the pruned read loses nothing vs the full read
    val full = VersionedTable.readVersion(spark, base, v)
      .filter(col("name") >= "m" && col("name") <= "p")
      .collect().map(_.getAs[Long]("v")).sorted
    val pruned = VersionedTable.readVersionPrunedTyped(spark, base, v,
        Seq(VersionedTable.StrRange("name", "m", "p")))
      .filter(col("name") >= "m" && col("name") <= "p")
      .collect().map(_.getAs[Long]("v")).sorted
    assert(pruned.toSeq === full.toSeq && full.toSeq === Seq(3L, 4L))
  }

  test("schema evolution: ADD COLUMN via append; time travel keeps each shape") {
    val base = TempDirs.scoped("vt_evolve")
    val s = spark
    import s.implicits._
    VersionedTable.commitAppend(spark, base, Seq((1L, 10L)).toDF("k", "v"))
    // v2 adds a column: older files must null-fill it on read
    VersionedTable.commitAppend(spark, base,
      Seq((2L, 20L, "en")).toDF("k", "v", "lang"))
    val v2 = VersionedTable.readVersion(spark, base, 2L)
    assert(v2.columns.toSeq === Seq("k", "v", "lang"))
    val byK = v2.collect().map(r => r.getLong(0) ->
      Option(r.getAs[String]("lang"))).toMap
    assert(byK === Map(1L -> None, 2L -> Some("en")))
    // time travel to v1 sees the ORIGINAL two-column shape
    assert(VersionedTable.readVersion(spark, base, 1L).columns.toSeq ===
      Seq("k", "v"))
    // a type change is refused loudly
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(spark, base,
        Seq((3L, "oops")).toDF("k", "v"))
    }
    // merge-side evolution: a delta with a new column upserts cleanly
    VersionedTable.commitMerge(spark, base,
      Seq((1L, 2L, 11L, "fr", 1L)).toDF("k", "ord", "v", "lang", "w"),
      "k", Seq("ord"))
    val latest = VersionedTable.readLatest(spark, base)
    assert(latest.columns.contains("w"))
  }

  test("a delete that empties the table still reads (zero rows, right schema)") {
    val base = TempDirs.scoped("vt_wipe")
    val s = spark
    import s.implicits._
    VersionedTable.commitAppend(spark, base,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    val v = VersionedTable.commitDelete(spark, base, col("k") >= 0L,
      pruneRanges = Seq(("k", 0L, 100L)), statsCols = Seq("k"))
    assert(VersionedTable.entries(base, v).isEmpty)
    val wiped = VersionedTable.readVersion(spark, base, v)
    assert(wiped.count() === 0L && wiped.columns.toSeq === Seq("k", "v"))
    assert(VersionedTable.readVersionPruned(spark, base, v,
      Seq(("k", 0L, 5L))).count() === 0L)
    // and the table remains appendable after the wipe
    VersionedTable.commitAppend(spark, base, Seq((3L, 30L)).toDF("k", "v"))
    assert(VersionedTable.readLatest(spark, base).count() === 1L)
  }

  test("commitDelete verifyFootprint catches a too-narrow pruneRanges contract") {
    val base = TempDirs.scoped("vt_footprint")
    val s = spark
    import s.implicits._
    Seq(0L, 10L).foreach(lo => VersionedTable.commitAppend(spark, base,
      (lo until lo + 10L).map(k => (k, k)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k")))
    // rowPred matches both decades but the declared footprint only
    // covers the first — the audit mode must refuse the silent partial
    // delete
    intercept[IllegalArgumentException] {
      VersionedTable.commitDelete(spark, base, col("k") % 2L === 0L,
        pruneRanges = Seq(("k", 0L, 9L)), verifyFootprint = true)
    }
    // an honest footprint passes with the verification on
    val v = VersionedTable.commitDelete(spark, base,
      col("k").between(0L, 9L), pruneRanges = Seq(("k", 0L, 9L)),
      verifyFootprint = true)
    assert(VersionedTable.readVersion(spark, base, v)
      .collect().map(_.getLong(0)).sorted.toSeq === (10L until 20L))
  }

  test("delta log: commit bytes ∝ delta; checkpoint replay is exact") {
    val base = TempDirs.scoped("vt_deltalog")
    val s = spark
    import s.implicits._
    // 23 one-file appends: crosses two checkpoint boundaries (10, 20)
    (1L to 23L).foreach(i => VersionedTable.commitAppend(spark, base,
      Seq((i, i)).toDF("k", "v").coalesce(1), statsCols = Seq("k")))
    // the LAST commit's manifest is O(delta): headers + ONE +line,
    // though the table holds 23 live files
    val lastBody = new String(Files.readAllBytes(
      Paths.get(base, "_log", f"${23L}%020d.commit")), "UTF-8")
    val bodyLines = lastBody.split("\n").filterNot(_.startsWith("#"))
    assert(bodyLines.length === 1 && bodyLines.head.startsWith("+"))
    // checkpoints exist at the cadence and replay to the same snapshot
    assert(Files.exists(Paths.get(base, "_log", f"${10L}%020d.checkpoint")))
    assert(Files.exists(Paths.get(base, "_log", f"${20L}%020d.checkpoint")))
    assert(VersionedTable.entries(base, 23L).size === 23)
    // reads on both sides of a checkpoint boundary agree with the data
    assert(VersionedTable.readVersion(spark, base, 9L)
      .collect().map(_.getLong(0)).sorted.toSeq === (1L to 9L))
    assert(VersionedTable.readVersion(spark, base, 10L)
      .collect().map(_.getLong(0)).sorted.toSeq === (1L to 10L))
    assert(VersionedTable.readVersion(spark, base, 11L)
      .collect().map(_.getLong(0)).sorted.toSeq === (1L to 11L))
    // vacuum to a non-checkpoint version writes one, then truncates:
    // replay at and past retainFrom still works
    VersionedTable.vacuum(base, retainFrom = 15L)
    assert(Files.exists(Paths.get(base, "_log", f"${15L}%020d.checkpoint")))
    assert(VersionedTable.readVersion(spark, base, 15L).count() === 15L)
    assert(VersionedTable.readVersion(spark, base, 23L).count() === 23L)
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, base, 9L)
    }
  }

  test("changesPerCommit: log-derived feed matches snapshot diffs, reads only touched files") {
    val base = TempDirs.scoped("vt_cdf")
    val s = spark
    import s.implicits._
    // four disjoint one-file decades, then a delete touching ONE file
    Seq(0L, 10L, 20L, 30L).foreach(lo => VersionedTable.commitAppend(
      spark, base, (lo until lo + 10L).map(k => (k, k * 2)).toDF("k", "v")
        .coalesce(1), statsCols = Seq("k")))
    VersionedTable.commitDelete(spark, base, col("k").between(12L, 14L),
      pruneRanges = Seq(("k", 12L, 14L)), statsCols = Seq("k"))
    // the delete commit's delta names exactly one removed + one added
    // file — the ONLY files the log-derived feed reads (vs the
    // 4-file-vs-4-file join a snapshot diff pays)
    val es4 = VersionedTable.entries(base, 4L).map(_.path).toSet
    val es5 = VersionedTable.entries(base, 5L).map(_.path).toSet
    assert((es4 -- es5).size === 1 && (es5 -- es4).size === 1)
    // per-commit rows: appends are pure inserts, the delete emits
    // exactly its three keys
    val feed = VersionedTable.changesPerCommit(spark, base, 0L, 5L, "k")
      .collect()
      .map(r => (r.getAs[Long]("version"), r.getAs[Long]("k"),
        r.getAs[String]("change_type")))
    assert(feed.count(_._3 == "insert") === 40)
    assert(feed.filter(_._1 == 5L).map(t => (t._2, t._3)).sorted.toSeq ===
      Seq((12L, "delete"), (13L, "delete"), (14L, "delete")))
    // cross-check the delete commit against the snapshot-diff feed
    val snap = VersionedTable.changesBetween(spark, base, 4L, 5L, "k")
      .collect().map(r => (r.getAs[Long]("k"),
        r.getAs[String]("change_type"))).sorted.toSeq
    assert(feed.filter(_._1 == 5L).map(t => (t._2, t._3)).sorted.toSeq
      === snap)
    // value columns ride along: old value present on deletes
    val olds = VersionedTable.changesPerCommit(spark, base, 4L, 5L, "k")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("v_old")).toMap
    assert(olds === Map(12L -> 24L, 13L -> 26L, 14L -> 28L))
  }

  test("lost race rebases and retries: both committers succeed, state = serial") {
    val base = TempDirs.scoped("vt_race")
    // writer B lands BETWEEN writer A's merge computation and A's
    // publish (the hook runs pre-publish on attempt 1 only): A must
    // fail its first publish, rebase onto B's state, and win at v2
    // WITHOUT dropping B's rows — the lost-update window is closed by
    // pinning the snapshot version, not just by the retry
    var bVersion = -1L
    val aVersion = VersionedTable.commitMergeHooked(spark, base,
      kv(Seq((1L, 10L, 100L), (2L, 10L, 200L))), "k", Seq("ord"),
      Nil, 5) { attempt =>
      if (attempt == 1)
        bVersion = VersionedTable.commitMerge(spark, base,
          kv(Seq((2L, 20L, 222L), (3L, 10L, 300L))), "k", Seq("ord"))
    }
    assert(bVersion === 1L && aVersion === 2L)
    val state = VersionedTable.readLatest(spark, base)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // == argmax of the union == either serial order (associativity)
    assert(state === Map(1L -> (10L, 100L), 2L -> (20L, 222L),
      3L -> (10L, 300L)))
    // bounded attempts: a permanently contended table fails loudly
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.commitMergeHooked(spark, base,
        kv(Seq((9L, 1L, 9L))), "k", Seq("ord"), Nil, 2) { _ =>
        VersionedTable.commitMerge(spark, base,
          kv(Seq((8L, 1L, 8L))), "k", Seq("ord"))
      }
    }
  }

  test("compact: small-file debt repaid, data identical, history intact") {
    val base = TempDirs.scoped("vt_compact")
    // eight 1-file appends = the small-file debt a batch pipeline accrues
    (1L to 8L).foreach(i => VersionedTable.commitAppend(
      spark, base, kv(Seq((i, 1L, i * 10))).coalesce(1), statsCols = Seq("k")))
    val before = VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(VersionedTable.entries(base, 8L).size === 8)
    val v = VersionedTable.compact(spark, base, numFiles = 2,
      statsCols = Seq("k"))
    assert(v === 9L && VersionedTable.entries(base, v).size === 2)
    val after = VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after === before)
    // time travel to the pre-compaction snapshot still works...
    assert(VersionedTable.readVersion(spark, base, 8L).count() === 8L)
    // ...until retention passes, when vacuum reclaims the small files
    val deleted = VersionedTable.vacuum(base, retainFrom = 9L)
    assert(deleted.count(_.endsWith(".parquet")) >= 8)
    assert(VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq === before)
  }

  test("optimize: z-order rewrite makes pruning bite where insert order cannot") {
    val base = TempDirs.scoped("vt_optimize")
    // interleaved appends: every file spans the whole key domain, so
    // zone maps prune nothing on the raw layout
    (0L until 4L).foreach { i =>
      VersionedTable.commitAppend(spark, base,
        kv((0L until 64L).map(k => (k * 4 + i, 1L, k))).coalesce(1),
        statsCols = Seq("k"))
    }
    val vRaw = VersionedTable.latestVersion(base).get
    val ranges = Seq(("k", 0L, 31L))
    val rawKept = VersionedTable.prune(
      VersionedTable.entries(base, vRaw), ranges).size
    assert(rawKept === 4, "insert-order layout must be unprunable here")
    val v = VersionedTable.optimize(spark, base, ("k", "v"), numFiles = 4)
    val es = VersionedTable.entries(base, v)
    assert(es.size === 4)
    val kept = VersionedTable.prune(es, ranges)
    assert(kept.size < rawKept,
      s"z-order must open fewer files: ${kept.size} vs $rawKept")
    // the pruned read still returns every satisfying row
    val full = VersionedTable.readVersion(spark, base, v)
      .filter(col("k").between(0L, 31L)).collect().map(_.getLong(0)).sorted
    val pruned = VersionedTable.readVersionPruned(spark, base, v, ranges)
      .filter(col("k").between(0L, 31L)).collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === full.toSeq && full.length === 32)
  }

  test("commitDelete rewrites only zone-map-touched files; history + vacuum honest") {
    val base = TempDirs.scoped("vt_delete")
    // four one-file commits with disjoint key decades
    Seq(0L, 10L, 20L, 30L).foreach(lo => VersionedTable.commitAppend(
      spark, base, kv((lo until lo + 10L).map(k => (k, 1L, k * 2))).coalesce(1),
      statsCols = Seq("k")))
    val es4 = VersionedTable.entries(base, 4L)
    // delete one decade: only its file may be rewritten
    val v = VersionedTable.commitDelete(spark, base,
      col("k").between(10L, 19L), pruneRanges = Seq(("k", 10L, 19L)),
      statsCols = Seq("k"))
    assert(v === 5L)
    val es5 = VersionedTable.entries(base, 5L)
    // the three untouched files are carried forward VERBATIM (stats too)
    val untouched = es4.filterNot(_.stats("k") ==
      VersionedTable.ColStats(10L, 19L))
    assert(untouched.size === 3 && untouched.forall(es5.contains))
    assert(!es5.exists(_.stats.get("k").contains(
      VersionedTable.ColStats(10L, 19L))))
    // data: the decade is gone, everything else intact
    assert(VersionedTable.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq ===
      ((0L until 10L) ++ (20L until 40L)))
    // snapshot-then-erase: the old version still shows the rows...
    assert(VersionedTable.readVersion(spark, base, 4L).count() === 40L)
    // ...until vacuum passes retention
    VersionedTable.vacuum(base, retainFrom = 5L)
    intercept[Exception] { VersionedTable.readVersion(spark, base, 4L).count() }
    assert(VersionedTable.readLatest(spark, base).count() === 30L)
    // provable no-op: a delete whose footprint no zone map overlaps
    // commits NOTHING (no new version, no rewrite)
    val v2 = VersionedTable.commitDelete(spark, base,
      col("k").between(500L, 600L), pruneRanges = Seq(("k", 500L, 600L)))
    assert(v2 === 5L && VersionedTable.latestVersion(base) === Some(5L))
  }

  test("history: one (version, op, n_files) row per surviving commit") {
    val base = TempDirs.scoped("vt_history")
    assert(VersionedTable.history(base) === Seq.empty)
    VersionedTable.commitAppend(spark, base,
      kv(Seq((1L, 1L, 1L))).coalesce(1), statsCols = Seq("k"))
    VersionedTable.commitAppend(spark, base, kv(Seq((2L, 1L, 2L))).coalesce(1))
    VersionedTable.commitMerge(spark, base,
      kv(Seq((1L, 2L, 9L))), "k", Seq("ord"))
    val h = VersionedTable.history(base)
    assert(h.map(t => (t._1, t._2)) ===
      Seq((1L, "append"), (2L, "append"), (3L, "merge")))
    assert(h(0)._3 === 1 && h(1)._3 === 2) // append carries v1's file
    // vacuum drops the early manifests; history shows what survives
    VersionedTable.vacuum(base, retainFrom = 3L)
    assert(VersionedTable.history(base).map(_._1) === Seq(3L))
  }

  test("empty table read fails with a clear error") {
    val base = TempDirs.scoped("vt_empty")
    intercept[IllegalArgumentException] {
      VersionedTable.readLatest(spark, base)
    }
    assert(VersionedTable.latestVersion(base) === None)
  }
}
