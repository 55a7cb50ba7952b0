package graft

/** Crash-safe local/shared-filesystem directory swaps, used by every
  * read-merge-replace writer (catalog events/customers, segment
  * membership). The protocol: write new contents to `<dst>_tmp`, move the
  * live dir aside to `<dst>_bak`, rename tmp into place, drop the backup —
  * at every instant either the old or the new contents exist under a
  * recoverable name, and [[recoverSwap]] (run before reads and writes)
  * finishes or rolls back an interrupted swap. */
object Fs {

  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree); f.delete()
  }

  /** Writer side of the commit protocol: serialize every read-merge-swap on
    * a store directory so concurrent writers can't each merge against the
    * same base and last-writer-wins drop a batch (the reference serializes
    * inserts through its per-partition sidelog commit,
    * `src/sidelog.h:15-60`, `src/oloop_insert.cpp:73-190`). Two layers:
    * a per-path JVM monitor (threads of one server), wrapping an OS file
    * lock on the sibling `<dir>.lock` (a second server process on the same
    * shared filesystem — `FileChannel` locks are per-process and would
    * otherwise throw on same-JVM contention). Readers never take the lock:
    * the atomic rename swap already guarantees they see the old or the new
    * contents, so queries stay wait-free under live ingest. Reentrant per
    * thread, so a locked operation can call a locked helper. The lock file
    * lives NEXT TO the directory (not inside) — whole-dir swaps replace the
    * directory while the lock is held.
    *
    * Swapping this store for a transactional table format (Delta/Iceberg
    * MERGE) replaces exactly this function and [[swapInto]]'s rename with
    * the format's optimistic commit — the call sites don't change. */
  private val jvmLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val heldLocks: ThreadLocal[scala.collection.mutable.Set[String]] =
    ThreadLocal.withInitial(() => scala.collection.mutable.Set.empty[String])

  def withWriteLock[T](dirPath: String)(body: => T): T = {
    val f = new java.io.File(dirPath + ".lock")
    Option(f.getParentFile).foreach(_.mkdirs())
    val canon = f.getCanonicalPath
    if (heldLocks.get.contains(canon)) return body // reentrant hold
    val mon = jvmLocks.computeIfAbsent(canon, _ => new Object)
    mon.synchronized {
      val ch = java.nio.channels.FileChannel.open(f.toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock() // blocks until a peer process commits
        heldLocks.get += canon
        try body
        finally {
          heldLocks.get -= canon
          try lk.release() catch { case _: Throwable => () }
        }
      } finally ch.close()
    }
  }

  def swapInto(dstPath: String)(write: String => Unit): Unit = {
    recoverSwap(dstPath)
    val dst = new java.io.File(dstPath)
    val tmp = new java.io.File(dstPath + "_tmp")
    val bak = new java.io.File(dstPath + "_bak")
    write(tmp.toString)
    if (dst.isDirectory)
      require(dst.renameTo(bak), s"backup rename failed for $dstPath")
    if (!tmp.renameTo(dst)) {
      if (bak.isDirectory) bak.renameTo(dst) // roll back to the old contents
      throw new IllegalStateException(s"swap failed for $dstPath")
    }
    rmTree(bak)
  }

  /** Reader-side recovery: mutate ONLY on crash evidence (the live dir is
    * missing with a backup present), and then under the writer lock so a
    * writer mid-swap can't be mistaken for a crash and hijacked — a
    * lock-free reader running full [[recoverSwap]] could rename the
    * writer's backup into place between its two renames, or delete a
    * concurrent writer's staging. Normal reads touch nothing. */
  def recoverForRead(dstPath: String): Unit = {
    val dst = new java.io.File(dstPath)
    if (!dst.isDirectory && new java.io.File(dstPath + "_bak").isDirectory)
      withWriteLock(dstPath) { recoverSwap(dstPath) }
  }

  def recoverSwap(dstPath: String): Unit = {
    val dst = new java.io.File(dstPath)
    val bak = new java.io.File(dstPath + "_bak")
    if (!dst.isDirectory && bak.isDirectory) // crashed between the two renames
      require(bak.renameTo(dst), s"swap recovery failed for $dstPath")
    if (dst.isDirectory) rmTree(bak)         // completed swap; drop leftovers
    rmTree(new java.io.File(dstPath + "_tmp")) // stale partial write
  }
}
