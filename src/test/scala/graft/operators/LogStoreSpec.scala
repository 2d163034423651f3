package graft.operators

import java.nio.file.{Files, Path, Paths}

import graft.{SparkSuite, TempDirs}
import org.apache.spark.sql.functions._

/** The storage seam (r12): the commit protocol's correctness rests on
  * exactly two [[LogStore]] contracts — create-exclusive publish and
  * all-or-nothing overwrite. These specs pin (a) the POSIX
  * implementation honors them, and (b) the protocol's loud-failure
  * property holds for ANY contract-honoring store: a mock that has no
  * native atomic primitive (the object-store shape — no rename, no
  * link; just a conditional create, as S3 `If-None-Match` provides)
  * still makes a double publish fail loudly and a lost race resolve
  * correctly, never silently overwrite.
  */
class LogStoreSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "ord", "v")
  }

  test("PosixLogStore: putIfAbsent admits one winner, loser throws") {
    val dir = Paths.get(TempDirs.scoped("logstore_posix"))
    Files.createDirectories(dir)
    val p = dir.resolve("m1")
    PosixLogStore.putIfAbsent(p, "winner".getBytes("UTF-8"))
    intercept[java.nio.file.FileAlreadyExistsException] {
      PosixLogStore.putIfAbsent(p, "loser".getBytes("UTF-8"))
    }
    // the loser never clobbered the winner, and left no temp debris
    assert(new String(Files.readAllBytes(p), "UTF-8") === "winner")
    val st = Files.list(dir)
    try assert(st.iterator().next().getFileName.toString === "m1")
    finally st.close()
  }

  /** An object-store-shaped store: no link(2), no atomic rename —
    * putIfAbsent is a conditional create (the S3 `PutObject
    * If-None-Match: *` semantics, emulated by exists-then-write; the
    * protocol's races in these specs are scripted, so the emulation's
    * check-to-write window is never interleaved).
    */
  private final class ConditionalPutStore extends LogStore {
    var puts = 0
    var conflicts = 0
    override def putIfAbsent(path: Path, bytes: Array[Byte]): Unit = {
      if (Files.exists(path)) {
        conflicts += 1
        throw new java.nio.file.FileAlreadyExistsException(path.toString)
      }
      puts += 1
      Files.write(path, bytes)
    }
    override def overwrite(path: Path, bytes: Array[Byte]): Unit = {
      Files.write(path, bytes); ()
    }
  }

  test("non-atomic store honoring the contract: double publish fails loudly") {
    val store = new ConditionalPutStore
    val base = TempDirs.scoped("logstore_double")
    LogStore.withStoreAt(Paths.get(base), store) {
      VersionedTable.commitAppend(spark, base, kv(Seq((1L, 1L, 1L))))
      // a second publish at the SAME version must surface as a commit
      // conflict — the loud failure the whole protocol rests on
      intercept[java.util.ConcurrentModificationException] {
        VersionedTable.publish(base, 1L, "#op=evil\n")
      }
      assert(store.conflicts === 1)
      // the winner's manifest is untouched
      assert(VersionedTable.readLatest(spark, base).count() === 1L)
    }
  }

  test("lost race under the object-store mock resolves like POSIX") {
    val store = new ConditionalPutStore
    val base = TempDirs.scoped("logstore_race")
    LogStore.withStoreAt(Paths.get(base), store) {
      (0L until 4L).foreach { bin =>
        VersionedTable.commitAppend(spark, base,
          kv(Seq.tabulate(10)(i => (bin * 10 + i, 1L, bin))).coalesce(1),
          statsCols = Seq("k"))
      }
      var bV = -1L
      val aV = VersionedTable.commitDeleteHooked(spark, base,
        col("k") <= 9L, pruneRanges = Seq(("k", 0L, 9L)),
        statsCols = Seq("k")) { () =>
        if (bV < 0L)
          bV = VersionedTable.commitDelete(spark, base, col("k") >= 30L,
            pruneRanges = Seq(("k", 30L, 39L)), statsCols = Seq("k"))
      }
      // disjoint race: republished, one conflict surfaced and absorbed
      assert(bV === 5L && aV === 6L && store.conflicts === 1)
      assert(VersionedTable.readLatest(spark, base).count() === 20L)
    }
  }

  test("prefix routing: an unrelated table never routes through the mock") {
    val store = new ConditionalPutStore
    val mocked = TempDirs.scoped("logstore_scope_a")
    val other = TempDirs.scoped("logstore_scope_b")
    LogStore.withStoreAt(Paths.get(mocked), store) {
      VersionedTable.commitAppend(spark, mocked, kv(Seq((1L, 1L, 1L))))
      VersionedTable.commitAppend(spark, other, kv(Seq((2L, 1L, 1L))))
      // only the scoped table's publish went through the mock — a
      // concurrent commit elsewhere can no longer race a spec's store
      assert(store.puts === 1)
    }
    // uninstalled after the body: back to POSIX everywhere
    VersionedTable.commitAppend(spark, mocked, kv(Seq((3L, 1L, 1L))))
    assert(store.puts === 1)
    assert(VersionedTable.readLatest(spark, mocked).count() === 2L)
  }
}
