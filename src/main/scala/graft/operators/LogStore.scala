package graft.operators

import java.nio.file.{Files, Path, StandardCopyOption}

/** The ATOMIC-PUBLISH SEAM between the commit protocol and the
  * filesystem — the one place [[VersionedTable]]'s correctness
  * touches storage semantics, abstracted so the format's claims
  * survive its own deployment target (the Delta `LogStore` idea):
  * POSIX gives create-exclusive via `link(2)` and atomic same-dir
  * `rename(2)`; S3 has neither rename nor (historically) a
  * conditional create, so a production deployment plugs a store
  * built on `PutObject If-None-Match: *` (S3 conditional writes) or
  * a DynamoDB mutex — anything honoring the two contracts below.
  *
  * CONTRACTS (everything the protocol needs — nothing else):
  *
  *  1. [[putIfAbsent]] writes `bytes` at `path` iff nothing exists
  *     there, and throws
  *     [[java.nio.file.FileAlreadyExistsException]] otherwise —
  *     ATOMICALLY: two concurrent calls for the same path must
  *     admit AT MOST ONE winner, and the loser must see the
  *     exception, never silently overwrite (a lost commit race that
  *     replaces the winner's manifest is silent data loss — the
  *     failure mode this seam exists to make impossible). Partial
  *     content must never be observable (write-then-link /
  *     write-then-conditional-PUT, not open-and-append).
  *  2. [[overwrite]] replaces `path` with `bytes` such that readers
  *     see either the old or the new complete content — used ONLY
  *     for artifacts whose content is a deterministic function of
  *     the log (checkpoints, constraint sets), where duplicate or
  *     lost writes are harmless and replay never depends on them.
  *
  * The active store is process-global ([[LogStore.active]]) — the
  * sandbox default is [[PosixLogStore]]; specs install a mock to
  * prove the protocol's loud-failure property holds for any
  * contract-honoring implementation.
  */
trait LogStore {
  /** Atomic create-exclusive: publish `bytes` at `path`, or throw
    * `FileAlreadyExistsException` — see contract 1 above.
    */
  def putIfAbsent(path: Path, bytes: Array[Byte]): Unit

  /** All-or-nothing replace for log-derived artifacts — contract 2. */
  def overwrite(path: Path, bytes: Array[Byte]): Unit
}

/** POSIX implementation: temp-file + `link(2)` (create-exclusive —
  * an atomic `rename()` would silently REPLACE an existing marker,
  * turning a lost race into silent data loss) and temp-file +
  * atomic same-directory move for overwrites.
  */
object PosixLogStore extends LogStore {
  override def putIfAbsent(path: Path, bytes: Array[Byte]): Unit = {
    val tmp = path.getParent.resolve(
      s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, bytes)
    try Files.createLink(path, tmp)
    finally Files.deleteIfExists(tmp)
  }

  override def overwrite(path: Path, bytes: Array[Byte]): Unit = {
    val tmp = path.getParent.resolve(
      s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, bytes)
    Files.move(tmp, path,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}

object LogStore {
  /** The store every [[VersionedTable]] publish/checkpoint goes
    * through. Process-global by design: a table's storage semantics
    * are a deployment property, not a per-call one.
    */
  @volatile var active: LogStore = PosixLogStore

  /** Run `body` under `store`, restoring the previous store after —
    * the spec seam (NOT thread-safe across concurrent suites; specs
    * that use it run their races single-threaded and scripted).
    */
  private[graft] def using[A](store: LogStore)(body: => A): A = {
    val prev = active
    active = store
    try body finally active = prev
  }
}
