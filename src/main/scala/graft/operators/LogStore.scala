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
  /** The deployment default (this sandbox: POSIX semantics). */
  val default: LogStore = PosixLogStore

  // Per-PATH-PREFIX overrides (the spec seam, and the shape a
  // multi-store deployment — one table on S3, one on HDFS — needs
  // anyway). r12 kept a process-global mutable `active` swapped
  // around spec bodies; a commit on an UNRELATED table running
  // concurrently with the swap window would silently route through
  // the other deployment's store. Prefix routing removes the race by
  // construction: installing a store for one table's path can never
  // redirect another table's publish.
  private val overrides =
    new java.util.concurrent.ConcurrentHashMap[String, LogStore]()

  /** The store governing `path`: the longest installed prefix match,
    * else [[default]]. O(installed overrides) — zero in production,
    * a handful in specs.
    */
  def forPath(path: Path): LogStore = {
    if (overrides.isEmpty) default
    else {
      val p = path.toAbsolutePath.normalize.toString
      var best: LogStore = default
      var bestLen = -1
      overrides.forEach { (pre, st) =>
        if (p.startsWith(pre) && pre.length > bestLen) {
          best = st; bestLen = pre.length
        }
      }
      best
    }
  }

  /** Run `body` with `store` governing every path under `prefix`,
    * uninstalling after — the spec seam. Tables outside `prefix` are
    * untouched, so concurrent suites cannot race each other's stores.
    */
  private[graft] def withStoreAt[A](prefix: Path, store: LogStore)
                                   (body: => A): A = {
    val key = prefix.toAbsolutePath.normalize.toString
    overrides.put(key, store)
    try body finally { overrides.remove(key); () }
  }
}
