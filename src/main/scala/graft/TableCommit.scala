package graft

/** Manifest-based commit protocol for the bucketed events store — the
  * MERGE-shaped transaction layer over plain parquet.
  *
  * Problem: a rename-swapped bucket directory gives writer atomicity but NOT
  * reader snapshot isolation — Spark plans a scan against a file listing,
  * and a swap that deletes those paths mid-query fails the reader
  * (FAILED_READ_FILE). The reference avoids this by WAL-ordered visibility
  * (`src/sidelog.h:15-60`): readers only ever see committed, immutable
  * state. The same property here, Delta/Iceberg-style:
  *
  *   - part files are IMMUTABLE once written; an insert MOVES freshly staged
  *     files into the bucket dirs under new unique names and never touches
  *     existing ones;
  *   - the live file set is defined solely by the manifest log: each commit
  *     CREATES a new `_commit.v{gen}` file (create-new, never rename — the
  *     Delta-log discipline, safe on object stores where rename is
  *     copy+delete and not atomic) and the LIVE state is the
  *     highest-generation manifest that parses. A reader can never see a
  *     mix, and a half-written manifest is unreadable (strict JSON — every
  *     proper prefix has an unclosed brace) so it is simply skipped;
  *   - create-new doubles as write-conflict detection: two committers
  *     racing to the same generation means one loses with
  *     FileAlreadyExistsException instead of silently clobbering — the same
  *     optimistic-concurrency primitive Delta gets from put-if-absent;
  *   - files retired by a commit stay on disk for a grace window
  *     ([[graceMs]]) so in-flight readers that planned against the previous
  *     manifest still find every path; a later committer garbage-collects
  *     them (the VACUUM analogue), along with orphans from crashed writers.
  *
  * Writers serialize via [[Fs.withWriteLock]]; readers never lock. Swapping
  * this layer for Delta/Iceberg replaces exactly [[read]]/[[write]]/[[gc]]
  * with the format's own log — call sites in [[Catalog]] are unchanged.
  */
object TableCommit {

  /** One commit's retired file set: kept on disk until `ts + graceMs`. */
  final case class Retired(ts: Long, paths: Seq[String])

  /** The manifest: monotonically increasing generation, live parquet file
    * names per bucket (relative to `__bucket=<b>/`), the retire log, and —
    * for date-scoped merges — an advisory per-bucket UPPER BOUND on any
    * person's row count (`personMax`). The bound lets a scoped insert skip
    * the eventMax guard scan when `bound + batch ≤ eventMax`: scoped
    * inserts add their batch's per-person max to it (still an upper
    * bound — upsert collapses only shrink truth), full-bucket merges
    * CLEAR their buckets' entries (the next scoped insert re-seeds the
    * exact value from its guard scan). Missing entries simply force the
    * scan — old manifests parse as empty. */
  final case class State(gen: Long, buckets: Map[Int, Seq[String]],
                         retired: Seq[Retired],
                         personMax: Map[Int, Long] = Map.empty)

  /** How long retired files stay readable after being superseded. Bounds
    * reader staleness the same way Delta's VACUUM retention does: any scan
    * that planned within the window completes; a longer-running scan fails
    * the same way it would after VACUUM. */
  @volatile var graceMs: Long = 10 * 60 * 1000L

  private def commitFile(root: String) = new java.io.File(root, "_commit")
  private def versionFile(root: String, gen: Long) =
    new java.io.File(root, s"_commit.v$gen")

  private def versionGens(root: String): Seq[Long] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("_commit.v"))
      .flatMap(f => f.getName.stripPrefix("_commit.v").toLongOption)
      .sorted.toSeq

  /** The LIVE state: the highest-generation `_commit.v{gen}` that parses
    * completely. An unparseable candidate (a committer crashed mid-write)
    * is skipped — the previous generation is still the committed truth,
    * exactly the WAL-ordered visibility the reference's sidelog gives
    * (`src/sidelog.h:15-60`). Falls back to the legacy renamed `_commit`
    * pointer for stores written before the log existed. */
  def read(root: String): Option[State] = {
    versionGens(root).sorted(Ordering[Long].reverse).iterator
      .flatMap { g =>
        val st = parseManifest(versionFile(root, g))
        // a skipped VERSIONED manifest is either a torn write (expected,
        // silent is fine for the highest gen) or in-place corruption of a
        // previously committed file — the latter silently rolls the table
        // back a generation, so make every skip observable
        if (st.isEmpty)
          System.err.println(
            s"[graft] WARN skipping unreadable manifest ${versionFile(root, g)}" +
              " — falling back to the previous generation")
        st
      }
      .nextOption()
      .orElse(parseManifest(commitFile(root), requireEof = false))
  }

  /** A PAST committed snapshot, readable while every file it references
    * still exists (the grace window bounds history depth exactly as Delta's
    * VACUUM retention bounds its time travel). Returns None once vacuumed. */
  def readVersion(root: String, gen: Long): Option[State] =
    parseManifest(versionFile(root, gen)).filter(allFilesPresent(root, _))

  /** Generations currently time-travelable (all referenced files present),
    * ascending. The live generation is always last. */
  def versions(root: String): Seq[Long] =
    versionGens(root).filter(g => readVersion(root, g).isDefined)

  private def allFilesPresent(root: String, st: State): Boolean =
    st.buckets.forall { case (b, fs) =>
      fs.forall(f => new java.io.File(root, s"__bucket=$b/$f").isFile) }

  /** Parse a manifest file; None if absent or INCOMPLETE. Strict-JSON
    * parse failure ⇔ a committer crashed mid-write (every proper prefix of
    * the serialized form has an unclosed outer brace, so no truncation can
    * masquerade as a committed manifest); the trailing `"eof":1` end marker
    * is VERIFIED on top of that, so a manifest that happens to re-close as
    * valid JSON after in-place damage still reads as uncommitted. The
    * legacy renamed `_commit` pointer predates the marker
    * (`requireEof = false`). */
  private def parseManifest(f: java.io.File,
                            requireEof: Boolean = true): Option[State] = {
    if (!f.isFile) return None
    try {
      val s = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      import org.json4s._
      val j = org.json4s.jackson.JsonMethods.parse(s)
      implicit val fmts: Formats = DefaultFormats
      val buckets = (j \ "buckets") match {
        case JObject(fields) => fields.map { case (k, v) =>
          k.toInt -> v.extract[Seq[String]] }.toMap
        case _ => Map.empty[Int, Seq[String]]
      }
      val retired = (j \ "retired") match {
        case JArray(items) => items.map(i =>
          Retired((i \ "ts").extract[Long], (i \ "paths").extract[Seq[String]]))
        case _ => Nil
      }
      val personMax = (j \ "person_max") match {
        case JObject(fields) => fields.map { case (k, v) =>
          k.toInt -> v.extract[Long] }.toMap
        case _ => Map.empty[Int, Long]
      }
      if (requireEof && (j \ "eof").extractOpt[Int] != Some(1)) None
      else Some(State((j \ "gen").extract[Long], buckets, retired, personMax))
    } catch { case _: Exception => None }
  }

  /** Publish a manifest WITHOUT rename: create `_commit.v{gen}` with
    * CREATE_NEW and fsync. Readers pick the highest parseable generation,
    * so the new state becomes visible exactly when the write completes; an
    * interrupted write leaves an unparseable file that readers skip. If the
    * generation file already exists COMMITTED, another writer won the race
    * — throws FileAlreadyExistsException so the caller can re-read and
    * retry (optimistic concurrency); if it exists but is incomplete (a
    * crashed writer's torn file), it is reclaimed — safe because an
    * unparseable manifest is invisible to every reader and the caller holds
    * the writer lock. */
  def write(root: String, st: State): Unit = {
    def jstr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val buckets = st.buckets.toSeq.sortBy(_._1).map { case (b, fs) =>
      s"""${jstr(b.toString)}:[${fs.map(jstr).mkString(",")}]"""
    }.mkString("{", ",", "}")
    val retired = st.retired.map(r =>
      s"""{"ts":${r.ts},"paths":[${r.paths.map(jstr).mkString(",")}]}""")
      .mkString("[", ",", "]")
    val personMax = st.personMax.toSeq.sortBy(_._1)
      .map { case (b, n) => s"""${jstr(b.toString)}:$n""" }
      .mkString("{", ",", "}")
    val json =
      s"""{"gen":${st.gen},"buckets":$buckets,"retired":$retired,""" +
        s""""person_max":$personMax,"eof":1}"""
    val target = versionFile(root, st.gen)
    if (target.isFile && parseManifest(target).isEmpty)
      target.delete(): Unit // torn write from a crashed committer — reclaim
    val ch = java.nio.channels.FileChannel.open(target.toPath,
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      ch.force(true)
    } finally ch.close()
    // one-time cleanup: the legacy renamed `_commit` pointer is now
    // superseded by the log (read() prefers any versioned manifest); a
    // plain delete needs no rename and is idempotent
    commitFile(root).delete(): Unit
  }

  /** Parquet files of one bucket dir as manifest-relative names —
    * `file` at the top level, `event_date=D/file` one level down (the
    * `date_partition` layout). */
  private def bucketEntries(bd: java.io.File): Seq[String] =
    Option(bd.listFiles()).getOrElse(Array.empty).toSeq.flatMap {
      case f if f.isFile && f.getName.endsWith(".parquet") => Seq(f.getName)
      case sd if sd.isDirectory && sd.getName.startsWith("event_date=") =>
        Option(sd.listFiles()).getOrElse(Array.empty).toSeq
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(f => s"${sd.getName}/${f.getName}")
      case _ => Nil
    }

  /** Synthesize a manifest from the directory listing — the one-time
    * migration for stores written before the manifest existed. */
  def fromListing(root: String): State = {
    val d = new java.io.File(root)
    val buckets = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .map(bd => bd.getName.stripPrefix("__bucket=").toInt -> bucketEntries(bd))
      .filter(_._2.nonEmpty)
      .toMap
    State(0L, buckets, Nil)
  }

  /** Garbage collection, run by committers while holding the writer lock:
    * delete retired files past the grace window, plus orphans — parquet
    * files in bucket dirs referenced by neither the manifest nor the retire
    * log (a crashed writer moved them in but never committed) that are old
    * enough that no pre-crash reader can still want them. */
  def gc(root: String, st: State, nowMs: Long): State = {
    val (expired, live) = st.retired.partition(_.ts + graceMs <= nowMs)
    expired.foreach(_.paths.foreach { p =>
      val f = new java.io.File(root, p)
      f.delete()
      // a fully-vacuumed date dir is dead weight for future listings
      val parent = f.getParentFile
      if (parent != null && parent.getName.startsWith("event_date="))
        parent.delete(): Unit // fails (kept) while non-empty — fine
    })
    val referenced: Set[String] =
      st.buckets.flatMap { case (b, fs) => fs.map(f => s"__bucket=$b/$f") }.toSet ++
        st.retired.flatMap(_.paths)
    val d = new java.io.File(root)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .foreach { bd =>
        bucketEntries(bd).foreach { rel =>
          val f = new java.io.File(bd, rel)
          if (!referenced.contains(s"${bd.getName}/$rel") &&
              f.lastModified() + graceMs <= nowMs)
            f.delete(): Unit
        }
      }
    // drop version manifests whose snapshot is no longer fully on disk —
    // they can never be read again
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("_commit.v"))
      .foreach { vf =>
        val gone = parseManifest(vf).exists(v => !allFilesPresent(root, v))
        if (gone) vf.delete(): Unit
      }
    st.copy(retired = live)
  }
}
