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

  def recoverSwap(dstPath: String): Unit = {
    val dst = new java.io.File(dstPath)
    val bak = new java.io.File(dstPath + "_bak")
    if (!dst.isDirectory && bak.isDirectory) // crashed between the two renames
      require(bak.renameTo(dst), s"swap recovery failed for $dstPath")
    if (dst.isDirectory) rmTree(bak)         // completed swap; drop leftovers
    rmTree(new java.io.File(dstPath + "_tmp")) // stale partial write
  }
}
