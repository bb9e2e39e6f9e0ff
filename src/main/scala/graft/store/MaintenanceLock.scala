package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}

/** Advisory single-maintainer lock for the persisted artifact stores (IVF
  * and LSH indexes, minhash dedup store, LM count tables, decontam bloom
  * store).
  *
  * Every store documents a "single maintainer, run between probes"
  * contract: append/compact/reindex stage under dot-prefixed siblings and
  * publish with the two-rename `.prev` swap, which is crash-safe for ONE
  * writer but races badly for two (a second compactor can swap a stale
  * staging tree over the first one's published result). This lock turns
  * that documented contract into a checked one: each maintenance entry
  * point takes `<store>/_maintenance.lock` for the duration of the
  * operation and a concurrent maintainer REFUSES LOUDLY
  * (`IllegalStateException` naming the holder) instead of silently
  * racing.
  *
  * Mechanics:
  *  - Acquisition is `FileSystem.create(overwrite = false)` — atomic on
  *    HDFS and close enough on local/object stores for an ADVISORY lock
  *    (this guards against cron overlap and operator error, not byzantine
  *    writers). The lock file body records pid, op, and acquire time for
  *    the refusal message.
  *  - A holder that CRASHES leaves the file behind; a later maintainer
  *    takes the lock over once the file is older than `staleAfterMs`
  *    (default 30 min — far beyond any store operation here, far under a
  *    cron period). Takeover first RENAMES the stale file aside (rename
  *    of one source succeeds for exactly one contender), then creates
  *    fresh — so two waiters racing a stale lock serialize on the rename
  *    and the loser refuses instead of deleting the winner's fresh lock.
  *  - Reentrant per thread: a maintainer that composes another locked
  *    entry point on the same store (e.g. a streaming batch maintainer
  *    delegating to the batch appender) re-enters without touching the
  *    file. Distinct threads and distinct processes always contend.
  *  - Probes/readers never take the lock — reads are lock-free by design
  *    (the `.prev` fallback already covers the swap window), so a stuck
  *    maintainer can never block serving.
  *
  * The lock file lives at the store ROOT next to the store's half dirs
  * (`sigs/`, `cells/`, `uni/`, ...); parquet readers only ever open those
  * half dirs, so the extra root file is invisible to every read path.
  */
object MaintenanceLock {

  final val LockName = "_maintenance.lock"

  private val held = new ThreadLocal[scala.collection.mutable.Map[String, Int]] {
    override def initialValue(): scala.collection.mutable.Map[String, Int] =
      scala.collection.mutable.Map.empty
  }

  /** Run `body` holding the maintenance lock of the store rooted at
    * `storePath`; refuses (IllegalStateException) if another maintainer
    * holds a fresh lock. Releases on every exit path, including non-local
    * returns and failures inside `body` — and only releases its OWN
    * acquisition: the lock body carries a unique token, and the delete is
    * skipped if the file no longer holds it (a holder that outlived
    * `staleAfterMs` and was legitimately taken over must not delete its
    * successor's lock).
    */
  def withLock[T](fs: FileSystem, storePath: String, op: String,
                  staleAfterMs: Long = 30L * 60 * 1000)(body: => T): T =
    // the lock body is the one context where a ledger's vacuum watermark
    // cannot change underneath us, so Ledger memoizes it per root for the
    // duration (outermost acquisition only — re-entries share the scope)
    Ledger.memoScope { withLockNoMemo(fs, storePath, op, staleAfterMs)(body) }

  private def withLockNoMemo[T](fs: FileSystem, storePath: String, op: String,
                  staleAfterMs: Long)(body: => T): T = {
    // reentrancy keys on the fully-qualified path so 'file:/store' and
    // '/store' spellings of one store can never miss the held-count and
    // refuse against their own lock file
    val key = fs.makeQualified(new Path(storePath)).toString
    val counts = held.get()
    if (counts.getOrElse(key, 0) > 0) {
      counts(key) += 1
      try body finally counts(key) -= 1
    } else {
      val lock = new Path(key, LockName)
      val token = acquire(fs, lock, op, staleAfterMs)
      counts(key) = 1
      try body finally {
        counts(key) -= 1
        if (counts(key) <= 0) counts.remove(key)
        try if (readLock(fs, lock).contains(token)) fs.delete(lock, false)
        catch { case _: java.io.IOException => () }
      }
    }
  }

  private def readLock(fs: FileSystem, lock: Path): String =
    try {
      val in = fs.open(lock)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    } catch { case _: java.io.IOException => "<unreadable>" }

  /** Returns the unique token written into the acquired lock file. */
  private def acquire(fs: FileSystem, lock: Path, op: String, staleAfterMs: Long): String = {
    val token = s"${ProcessHandle.current().pid()}-${java.util.UUID.randomUUID()}"
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lock, false)
        try out.write(
          s"""{"pid":${ProcessHandle.current().pid()},"op":"$op","token":"$token","acquired_at_ms":${System.currentTimeMillis()}}"""
            .getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    fs.mkdirs(lock.getParent)
    if (tryCreate()) return token
    // lock exists (or raced): stale takeover, else refuse loudly.
    // Takeover claims the stale file by RENAMING it aside first — rename of
    // one source succeeds for exactly one contender, so two waiters racing
    // the same stale lock serialize there (an unconditional delete would
    // let the slower waiter delete the faster one's FRESH lock).
    try {
      val age = System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
      if (age > staleAfterMs) {
        val tomb = new Path(lock.getParent,
          s"$LockName.stale-${ProcessHandle.current().pid()}-${System.nanoTime()}")
        val claimed = try fs.rename(lock, tomb) catch { case _: java.io.IOException => false }
        if (claimed) {
          fs.delete(tomb, false)
          if (tryCreate()) return token
        }
      }
    } catch { case _: java.io.IOException => () }
    val holder = readLock(fs, lock).take(200)
    throw new IllegalStateException(
      s"store ${lock.getParent} is under maintenance ($holder) — the single-maintainer " +
        s"contract refuses concurrent $op; if the previous maintainer crashed, its lock " +
        s"goes stale after ${staleAfterMs / 1000} s and is taken over automatically")
  }
}
