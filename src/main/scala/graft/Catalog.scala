package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Property definition (`POST /v1/table` body, docs/rest/README.md:28-79):
  * `type` ∈ text|int|double|bool; `is_set` makes it a collection; and
  * `is_customer` attaches it to the customer instead of the event history. */
final case class PropDef(
    name: String,
    ptype: String,
    isSet: Boolean = false,
    isCustomer: Boolean = false) {
  def sparkType: DataType = {
    val base: DataType = ptype match {
      case "text"   => StringType
      case "int"    => LongType
      case "double" => DoubleType
      case "bool"   => BooleanType
      case other    => throw new IllegalArgumentException(s"bad property type '$other'")
    }
    if (isSet) ArrayType(base) else base
  }
}

/** Table settings (`src/table.h:118-131` defaults + `PUT /table/settings`). */
final case class TableSettings(
    idTextual: Boolean = true,
    eventMax: Int = 5000,                            // table.h:122
    eventTtlMs: Long = 86400000L * 365L * 5L,        // table.h:124 (5 years)
    sessionTimeMs: Long = 30L * 60L * 1000L,         // table.h:125
    segmentIntervalMs: Long = 1000L,                 // table.h:127
    tzOffsetMs: Long = 0L,                           // table.h:123
    eventOrder: Seq[String] = Nil,                   // z-order (table.cpp:138-146)
    storageBuckets: Int = 32,                        // id-hash partition count
    // group-commit threshold for raw-JSON inserts: batches append to a
    // pending WAL (the reference's sidelog discipline, src/sidelog.h:15-60)
    // and merge into bucket parquet only once this many rows are pending.
    // 0 = merge every batch (classic eager behavior). Reads always see
    // pending rows (WAL overlay), so visibility is unaffected either way.
    flushRows: Int = 0,
    // Which id-hash assigns rows to storage buckets. "murmur3" is Spark's
    // own bucket-table hash (HashPartitioning.partitionIdExpression), which
    // lets reads claim the bucket layout to Catalyst — person-scoped
    // queries then plan with NO exchange and NO per-person sort (see
    // graft.sources.BucketedEvents). Metas written before this field
    // existed parse as "xxhash64" (their on-disk layout) and keep the
    // explicit-file-list read path.
    bucketHash: String = "murmur3",
    // Two-level layout: `__bucket=B/event_date=D/` — time-framed queries
    // (`.range(iso, iso)`, framed OSL scans) PRUNE whole date directories
    // (a 1-week query over 5-year retention opens ~0.4% of the store,
    // matching the reference's time-boxed block iteration,
    // src/queryinterpreter.cpp:2460-2533). The adjudicated trade (r16
    // verdict #1): date-splitting multiplies files per bucket, so an
    // UNFRAMED person-scoped scan keeps its exchange-free claim but
    // re-sorts per person (Spark claims the (id, stamp) order only when
    // each selected bucket has <= 1 file — a frame pruning to one date
    // gets the sort claim back automatically). Default off: history-wide
    // workloads keep the zero-sort single-file-per-bucket layout.
    datePartition: Boolean = false)

final case class TableMeta(
    table: String,
    properties: Seq[PropDef],
    settings: TableSettings) {

  def eventProps: Seq[PropDef] = properties.filterNot(_.isCustomer)
  def customerProps: Seq[PropDef] = properties.filter(_.isCustomer)

  /** Event-history schema: fixed (id, stamp, event) + event properties. */
  def eventsSchema: StructType = {
    val idType = if (settings.idTextual) StringType else LongType
    StructType(
      StructField("id", idType, nullable = false) ::
      StructField("stamp", LongType, nullable = false) ::
      StructField("event", StringType, nullable = false) ::
      eventProps.map(p => StructField(p.name, p.sparkType, nullable = true)).toList)
  }

  /** Customer-properties schema: id + customer props (facts, not history). */
  def customerSchema: StructType = {
    val idType = if (settings.idTextual) StringType else LongType
    StructType(
      StructField("id", idType, nullable = false) ::
      customerProps.map(p => StructField(p.name, p.sparkType, nullable = true)).toList)
  }
}

/** Persistent table catalog — the engine's DDL surface, mirroring the
  * reference's `/v1/table` routes (`src/rpc.h:31-52`): create, describe,
  * list, drop, add/remove property, update settings.
  *
  * Metadata lives as one JSON file per table under
  * `<warehouse>/<table>/table.json`; event history as parquet under
  * `<warehouse>/<table>/events`. On a cluster the warehouse is any shared
  * filesystem (HDFS/S3); metadata IO is tiny and driver-side by design,
  * data IO is all Spark jobs. Property-name rules follow
  * docs/rest/README.md:42 (lowercase alphanumeric + `_`, no leading digit).
  */
final class Catalog(spark: SparkSession, val warehouse: String) {

  private val NameRx = "^[a-z_][a-z0-9_]*$".r
  private val MaxProps = 4096 // src/common.h:10

  private def dir(table: String) = new java.io.File(warehouse, table)
  private def metaFile(table: String) = new java.io.File(dir(table), "table.json")
  private[graft] def eventsDir(table: String) = new java.io.File(dir(table), "events").toString
  private def customersDir(table: String) = new java.io.File(dir(table), "customers").toString

  // Customer-prop rewrites are GENERATIONAL since round 15 (rename-free):
  // the old write-back swap renamed files a concurrent reader may have
  // planned — the same FAILED_READ_FILE class the membership soak caught.
  // The pointer file `customers.gen` names the live generation (the bare
  // dir for gen 0), each merge writes the next generation beside it and
  // flips the pointer atomically, and generations older than the
  // just-retired one reclaim (one-cycle reader grace window).
  private def customersGen(table: String): Long = {
    val p = new java.io.File(dir(table), "customers.gen")
    if (!p.isFile) 0L
    else try new String(java.nio.file.Files.readAllBytes(p.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    catch { case _: Exception => 0L }
  }

  private def currentCustomersDir(table: String): String = {
    val g = customersGen(table)
    if (g == 0L) {
      // legacy pointerless dir: recover a pre-round-15 crashed swap once
      Fs.recoverForRead(customersDir(table))
      customersDir(table)
    } else s"${customersDir(table)}_v$g"
  }

  // ------------------------------------------------------------------ meta IO
  private def writeMeta(m: TableMeta): Unit = {
    val sb = new StringBuilder
    def js(s: String): String = Json.str(s)
    sb.append("{\"table\":").append(js(m.table))
    sb.append(",\"id_type\":").append(js(if (m.settings.idTextual) "textual" else "numeric"))
    sb.append(",\"properties\":[")
    sb.append(m.properties.map { p =>
      s"{\"name\":${js(p.name)},\"type\":${js(p.ptype)},\"is_set\":${p.isSet},\"is_customer\":${p.isCustomer}}"
    }.mkString(","))
    sb.append("],\"event_order\":[")
    sb.append(m.settings.eventOrder.map(js).mkString(","))
    sb.append("],\"settings\":{")
    sb.append(s"""\"event_max\":${m.settings.eventMax},\"event_ttl_ms\":${m.settings.eventTtlMs},""")
    sb.append(s"""\"session_time_ms\":${m.settings.sessionTimeMs},\"segment_interval_ms\":${m.settings.segmentIntervalMs},""")
    sb.append(s"""\"tz_offset_ms\":${m.settings.tzOffsetMs},\"storage_buckets\":${m.settings.storageBuckets},""")
    sb.append(s"""\"flush_rows\":${m.settings.flushRows},\"bucket_hash\":${js(m.settings.bucketHash)},""")
    sb.append(s"""\"date_partition\":${m.settings.datePartition}}}""")
    dir(m.table).mkdirs()
    val p = metaFile(m.table).toPath
    val prevMtime =
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.getLastModifiedTime(p).toMillis
      else Long.MinValue
    java.nio.file.Files.write(p, sb.toString.getBytes("UTF-8"))
    // the describe() fast path trusts an unchanged (size, mtime) stat; a
    // rewrite landing in the SAME clock millisecond as the previous
    // version (with the same byte length) would be stat-invisible, so
    // force the mtime strictly past the old one. Writes are rare (DDL /
    // settings), the extra stat+set is driver-side only.
    if (java.nio.file.Files.getLastModifiedTime(p).toMillis <= prevMtime)
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(prevMtime + 1))
    metaCache.remove(m.table): Unit
  }

  private val metaSchema = StructType(Seq(
    StructField("table", StringType),
    StructField("id_type", StringType),
    StructField("properties", ArrayType(StructType(Seq(
      StructField("name", StringType), StructField("type", StringType),
      StructField("is_set", BooleanType), StructField("is_customer", BooleanType))))),
    StructField("event_order", ArrayType(StringType)),
    StructField("settings", StructType(Seq(
      StructField("event_max", LongType), StructField("event_ttl_ms", LongType),
      StructField("session_time_ms", LongType), StructField("segment_interval_ms", LongType),
      StructField("tz_offset_ms", LongType), StructField("storage_buckets", LongType),
      StructField("flush_rows", LongType), StructField("bucket_hash", StringType),
      StructField("date_partition", BooleanType))))))

  /** (stat size, stat mtime millis, content hash, parsed meta) — describe()
    * runs on every insert and query. The common path is ONE stat: if the
    * file's (size, mtime) matches the cache, return without reading — on a
    * shared filesystem (HDFS/S3) a full read per operation is real I/O. On
    * stat change, read the bytes and check the content HASH before paying
    * the Spark-job parse (the hash stays the authoritative key — every
    * cache entry is self-consistent with its own bytes). The stat prefilter
    * is sound because [[writeMeta]] forces a strictly-increasing mtime: a
    * rewrite can never present the previous version's (size, mtime). The
    * stat is taken BEFORE the read, so a write racing between the two maps
    * an old stat to new content — the next stat mismatches and
    * self-corrects via the hash check. */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, String, TableMeta)]

  private def contentKey(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  def describe(table: String): TableMeta = {
    require(exists(table), s"no such table '$table'")
    val path = metaFile(table).toPath
    val attrs = java.nio.file.Files.readAttributes(
      path, classOf[java.nio.file.attribute.BasicFileAttributes])
    val (sz, mt) = (attrs.size, attrs.lastModifiedTime.toMillis)
    val cached = metaCache.get(table)
    if (cached != null && cached._1 == sz && cached._2 == mt) return cached._4
    val bytes = java.nio.file.Files.readAllBytes(path)
    val key = contentKey(bytes)
    if (cached != null && cached._3 == key) {
      metaCache.put(table, (sz, mt, key, cached._4))
      return cached._4
    }
    val m = parseMeta(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    metaCache.put(table, (sz, mt, key, m))
    m
  }

  private def parseMeta(json: String): TableMeta = {
    import spark.implicits._
    val row = spark.read.schema(metaSchema).json(Seq(json).toDS()).head()
    val props = row.getSeq[org.apache.spark.sql.Row](2).map(p =>
      PropDef(p.getString(0), p.getString(1), p.getBoolean(2), p.getBoolean(3)))
    val st = row.getStruct(4)
    TableMeta(row.getString(0), props, TableSettings(
      idTextual = row.getString(1) == "textual",
      eventMax = st.getLong(0).toInt, eventTtlMs = st.getLong(1),
      sessionTimeMs = st.getLong(2), segmentIntervalMs = st.getLong(3),
      tzOffsetMs = st.getLong(4),
      eventOrder = row.getSeq[String](3),
      // metas written before bucketed storage existed default to 32
      storageBuckets = if (st.isNullAt(5)) 32 else st.getLong(5).toInt,
      flushRows = if (st.isNullAt(6)) 0 else st.getLong(6).toInt,
      // pre-round-16 metas carry no hash field: their files were laid out
      // by xxhash64 and must keep reading (and pruning) that way
      bucketHash = if (st.isNullAt(7)) "xxhash64" else st.getString(7),
      // pre-round-17 metas: id-bucketed only (no date dirs on disk)
      datePartition = if (st.isNullAt(8)) false else st.getBoolean(8)))
  }

  // --------------------------------------------------------------------- DDL
  def exists(table: String): Boolean = metaFile(table).isFile

  def create(meta: TableMeta): Unit = {
    require(NameRx.pattern.matcher(meta.table).matches(), s"bad table name '${meta.table}'")
    require(!exists(meta.table), s"table '${meta.table}' already exists")
    validateProps(meta.properties)
    writeMeta(meta)
  }

  private def validateProps(props: Seq[PropDef]): Unit = {
    require(props.length <= MaxProps, s"more than $MaxProps properties")
    val dupes = props.groupBy(_.name).collect { case (n, ps) if ps.length > 1 => n }
    require(dupes.isEmpty, s"duplicate properties: ${dupes.mkString(",")}")
    props.foreach { p =>
      require(NameRx.pattern.matcher(p.name).matches(), s"bad property name '${p.name}'")
      p.sparkType // validates the type string
      require(!Seq("id", "stamp", "event").contains(p.name), s"'${p.name}' is reserved")
    }
  }

  def list(): Seq[String] = {
    val d = new java.io.File(warehouse)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && new java.io.File(f, "table.json").isFile)
      .map(_.getName).toSeq.sorted
  }

  def drop(table: String): Unit = {
    require(exists(table), s"no such table '$table'")
    metaCache.remove(table): Unit
    Option(pendingParsed.remove(table)).foreach(_._2.unpersist(false))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(dir(table))
  }

  def addProperty(table: String, prop: PropDef): Unit = {
    flush(table) // pending WAL rows parse against the pre-DDL schema
    val m = describe(table)
    validateProps(m.properties :+ prop)
    writeMeta(m.copy(properties = m.properties :+ prop))
  }

  def dropProperty(table: String, name: String): Unit = {
    flush(table) // pending WAL rows parse against the pre-DDL schema
    val m = describe(table)
    require(m.properties.exists(_.name == name), s"no such property '$name'")
    writeMeta(m.copy(properties = m.properties.filterNot(_.name == name)))
  }

  def updateSettings(table: String, f: TableSettings => TableSettings): Unit = {
    flush(table) // pending WAL rows merge under the pre-update settings
    val m = describe(table)
    val next = f(m.settings)
    // layout-determining settings are immutable once any file is committed:
    // files are named/laid out under the OLD (hash, modulus, date split) —
    // a changed BucketSpec would silently DROP files whose embedded bucket
    // id >= the new count from the native bucketed scan, and co-partitioned
    // joins would read the wrong buckets. The reference fixes its partition
    // count at table creation the same way (src/rpc_insert.cpp:154).
    if (TableCommit.read(eventsDir(table)).exists(_.buckets.nonEmpty) ||
        hasParquet(new java.io.File(eventsDir(table)))) {
      require(next.storageBuckets == m.settings.storageBuckets,
        s"storage_buckets is immutable once '$table' holds data " +
          s"(${m.settings.storageBuckets} -> ${next.storageBuckets}); " +
          "create a new table and re-insert to re-bucket")
      require(next.bucketHash == m.settings.bucketHash,
        s"bucket_hash is immutable once '$table' holds data")
      require(next.datePartition == m.settings.datePartition,
        s"date_partition is immutable once '$table' holds data")
    }
    writeMeta(m.copy(settings = next))
  }

  // -------------------------------------------------------------------- data
  /** Event history; empty (with the right schema) before the first insert.
    * Columns added after data was written surface as nulls; dropped
    * properties disappear from the projection immediately. */
  private def rmTree(f: java.io.File): Unit = Fs.rmTree(f)
  private def swapInto(dstPath: String)(write: String => Unit): Unit =
    Fs.swapInto(dstPath)(write)
  private def recoverSwap(dstPath: String): Unit = Fs.recoverSwap(dstPath)

  /** Recover interrupted swaps for the events dir: the whole-dir swap names
    * plus each per-bucket swap, plus any abandoned staging root. Driver-side
    * metadata ops bounded by the bucket count. */
  private def recoverEvents(table: String): Unit = {
    val root = eventsDir(table)
    recoverSwap(root)
    rmTree(new java.io.File(root + "_stage"))
    val d = new java.io.File(root)
    Option(d.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .filter(n => n.endsWith("_bak") || n.endsWith("_tmp"))
      .map(n => n.stripSuffix("_bak").stripSuffix("_tmp")).distinct
      .foreach(b => recoverSwap(new java.io.File(d, b).toString))
  }

  /** Storage-bucket id of a row (or of a literal id, for pruned customer
    * fetches). murmur3 is `pmod(hash(id), n)` — bit-identical to Spark's
    * `HashPartitioning.partitionIdExpression`, which is what lets the read
    * path claim the layout as a native bucketed table (BucketedEvents). */
  private def bucketOf(m: TableMeta, id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    m.settings.bucketHash match {
      case "murmur3" =>
        pmod(hash(id), lit(m.settings.storageBuckets))
      case _ =>
        pmod(xxhash64(id), lit(m.settings.storageBuckets.toLong)).cast("int")
    }

  private def bucketCol(m: TableMeta): org.apache.spark.sql.Column =
    bucketOf(m, col("id"))

  /** UTC calendar date of the event stamp — the second partition level for
    * `date_partition` tables. Monotone in stamp, so inclusive-widened date
    * bounds derived from a stamp window can never exclude a qualifying row. */
  private def dateCol: org.apache.spark.sql.Column =
    to_date(timestamp_millis(col("stamp")))

  /** The partition columns a read of this table's store carries (dropped
    * before the caller sees the events schema). */
  private def partCols(m: TableMeta): Seq[String] =
    if (m.settings.datePartition) Seq("__bucket", "event_date")
    else Seq("__bucket")

  /** Does the directory hold any COMMITTED parquet file, by Spark's own
    * visibility rules — `_temporary` (an in-flight append's task files)
    * and other `_`/`.`-prefixed entries don't count, EXCEPT partition
    * dirs (`__bucket=N`), which Spark does read. Counting `_temporary`
    * contents made a first-append race deterministic-ish: hasParquet said
    * yes while the reader's listing found nothing committed →
    * UNABLE_TO_INFER_SCHEMA (round-15 soak). */
  private def hasParquet(f: java.io.File): Boolean =
    (f.isFile && f.getName.endsWith(".parquet") &&
      !f.getName.startsWith("_") && !f.getName.startsWith(".")) ||
      (f.isDirectory &&
        (!f.getName.startsWith("_") || f.getName.contains("=")) &&
        !f.getName.startsWith(".") &&
        Option(f.listFiles()).getOrElse(Array.empty).exists(hasParquet))

  /** Event history with the partition columns (`__bucket`, and
    * `event_date` for `date_partition` tables) retained for pruned reads;
    * empty (right schema) before the first insert. `dateBounds` (epoch ms,
    * inclusive) becomes an `event_date` predicate Catalyst turns into
    * PartitionFilters — whole date directories never open. */
  private def eventsWithBucket(table: String, m: TableMeta,
                               atGen: Option[Long] = None,
                               dateBounds: Option[(Long, Long)] = None): DataFrame = {
    val schema = m.eventsSchema
    val root = eventsDir(table)
    val d = new java.io.File(root)
    val dateParted = m.settings.datePartition
    val withBucket = StructType(schema.fields ++
      (StructField("__bucket", IntegerType) ::
        (if (dateParted) List(StructField("event_date", DateType)) else Nil)))
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withBucket)
    def align(raw: DataFrame) =
      withBucket.fields.foldLeft(raw) { (df, f) =>
        if (df.columns.contains(f.name)) df
        else df.withColumn(f.name, lit(null).cast(f.dataType))
      }.select(withBucket.fieldNames.map(col): _*)
    // inclusive-widened to the bounds' UTC dates: event_date is monotone in
    // stamp, so no qualifying row is outside the kept partitions; the
    // caller's own stamp predicates stay row-exact
    def prune(df: DataFrame): DataFrame = dateBounds match {
      case Some((lo, hi)) if dateParted =>
        var p = df
        if (lo > Long.MinValue)
          p = p.where(col("event_date") >= to_date(timestamp_millis(lit(lo))))
        if (hi < Long.MaxValue)
          p = p.where(col("event_date") <= to_date(timestamp_millis(lit(hi))))
        p
      case _ => df
    }
    def scanSnapshot(c: TableCommit.State) = {
      val files = c.buckets.toSeq.sortBy(_._1).flatMap { case (b, fs) =>
        fs.map(f => s"$root/__bucket=$b/$f") }
      if (files.isEmpty) empty
      // murmur3 layouts read through the native bucketed-scan path: the
      // manifest-backed FileIndex lists exactly the committed snapshot and
      // the relation claims HashPartitioning(id) (+ the (id, stamp) order
      // whenever each selected bucket holds one file — always for the
      // undated layout; after date pruning to one date for dated ones), so
      // person-scoped plans drop their exchange (round-16 #1, round-17 #1)
      else if (m.settings.bucketHash == "murmur3" &&
          graft.sources.BucketedEvents.allBucketNamed(c))
        prune(align(graft.sources.BucketedEvents.snapshot(
          spark, root, c, schema, m.settings.storageBuckets, dateParted)))
      // basePath keeps the partition dir components as partition columns
      else prune(align(spark.read.option("basePath", root).parquet(files: _*)))
    }
    atGen match {
      case Some(gen) =>
        scanSnapshot(TableCommit.readVersion(root, gen).getOrElse(
          throw new IllegalArgumentException(
            s"version $gen of '$table' is not available " +
              "(never committed, or vacuumed past the grace window)")))
      case None => TableCommit.read(root) match {
        // manifest store: scan exactly the committed snapshot's files —
        // concurrent committers retire (not delete) what they replace, so
        // every planned path stays readable through the grace window
        case Some(c) => scanSnapshot(c)
        case None => // pre-manifest store (or none): directory listing
          // crash recovery only (safe under the writer lock); routine
          // stage/bak cleanup is writer-side — a lock-free reader deleting
          // the staging dir would abort a concurrent writer's job
          Fs.recoverForRead(root)
          if (!hasParquet(d)) empty
          else prune(align(spark.read.parquet(root)))
      }
    }
  }

  private def dropPartCols(m: TableMeta, df: DataFrame): DataFrame =
    df.drop(partCols(m): _*)

  def events(table: String): DataFrame = {
    val m = describe(table)
    // the committed base is passed BY NAME: overlayPending lists the WAL
    // first and only then forces the base plan (which reads the commit
    // manifest). Planning the base first would race a concurrent drain —
    // commit gen N+1, then .drained markers — into returning the stale
    // gen-N base with an empty WAL listing, dropping acked raw inserts.
    overlayPending(table, m, dropPartCols(m, eventsWithBucket(table, m)))
  }

  /** Time-framed events view (bounds in epoch ms, inclusive): on a
    * `date_partition` table the bounds become `event_date` partition
    * filters — a one-week query over a years-deep store opens ~0.4% of its
    * directories (the reference's time-boxed block iteration,
    * `src/queryinterpreter.cpp:2460-2533`, and TTL culling,
    * `src/grid.cpp:698-750`, bound reads the same way). The view is
    * inclusive-WIDENED to whole UTC dates: callers keep their row-exact
    * stamp predicates (an OSL frame, a `.range()` filter) exactly as over
    * the unframed view. Undated tables return the plain view. Buckets
    * touched by a pending WAL overlay unpruned (bounded by flush_rows),
    * preserving read-your-writes. */
  def eventsFramed(table: String, loMs: Long, hiMs: Long): DataFrame = {
    val m = describe(table)
    if (!m.settings.datePartition) return events(table)
    val bounds = Some((loMs, hiMs))
    overlayPending(table, m,
      dropPartCols(m, eventsWithBucket(table, m, dateBounds = bounds)),
      dateBounds = bounds)
  }

  /** Time travel: the events table exactly as committed at generation
    * `gen` (see [[TableCommit.readVersion]]). History depth is bounded by
    * the retire grace window — the same contract as Delta's VACUUM
    * retention. */
  def eventsAt(table: String, gen: Long): DataFrame = {
    val m = describe(table)
    dropPartCols(m, eventsWithBucket(table, m, atGen = Some(gen)))
  }

  /** Generations of `table` currently readable via [[eventsAt]],
    * ascending (live generation last). */
  def eventVersions(table: String): Seq[Long] =
    TableCommit.versions(eventsDir(table))

  /** One customer's history, partition-pruned to their id-hash bucket: the
    * scan touches 1/`storage_buckets` of the table (the reference answers
    * `GET /customer` from the person's partition the same way,
    * `src/oloop_person.cpp`). */
  def customerEvents(table: String, id: Any): DataFrame = {
    val m = describe(table)
    // List the WAL BEFORE planning the committed base (same read-your-
    // writes ordering as events(): a drain between the two steps must be
    // seen by at least one of them).
    val hasPending = pendingFiles(table).nonEmpty
    // Hash the literal AT THE STORED id TYPE: Spark hash functions are
    // type-sensitive (hash/xxhash64 of Int 5 != Long 5 != String "5"), so an
    // uncast caller-supplied literal would prune to the wrong bucket.
    // Mirrors insert's bucketCol hash (per-meta: murmur3 or legacy xxhash64).
    val idLit = lit(id).cast(m.eventsSchema("id").dataType)
    if (!hasPending) {
      val b = bucketOf(m, idLit)
      dropPartCols(m, eventsWithBucket(table, m)
          .where(col("__bucket").isNull || col("__bucket") === b))
        .where(col("id") === idLit)
    }
    // WAL rows for this id may supersede stored ones: overlay, then filter.
    // Pruning is lost only while a pending WAL exists (bounded by flushRows)
    else overlayPending(table, m,
      dropPartCols(m, eventsWithBucket(table, m))).where(col("id") === idLit)
  }

  // ------------------------------------------------- group-commit pending WAL
  /** Raw-JSON batches land here before merging into bucket parquet — the
    * reference's sidelog WAL (`src/sidelog.h:15-60`): an append is one
    * driver-side file create (milliseconds), while the O(touched-buckets)
    * read-merge-write runs only when [[TableSettings.flushRows]] rows have
    * accumulated (group commit). Readers overlay pending rows through the
    * SAME merge transform the drain will run ([[mergeTouched]]), so
    * read-your-writes holds regardless of the threshold. Replay after a
    * crash (drain committed, WAL not yet retired) is idempotent: the upsert
    * key (id, stamp, z-rank, row-hash) collapses re-merged rows. */
  private def pendingDir(table: String) =
    new java.io.File(dir(table), "events_pending")

  /** WAL name carries (nowMs, rows): pending totals and the drain clock
    * come from the listing alone, no file reads. */
  private val WalName = """wal-(\d+)-(\d+)-(\d+)\.jsonl""".r

  private def pendingFiles(table: String): Seq[java.io.File] = {
    val ls = Option(pendingDir(table).listFiles()).getOrElse(Array.empty)
    val drained = ls.collect {
      case f if f.getName.endsWith(".drained") =>
        f.getName.stripSuffix(".drained")
    }.toSet
    ls.filter(f => f.isFile && WalName.pattern.matcher(f.getName).matches() &&
        !drained(f.getName))
      .sortBy(_.getName).toSeq
  }

  /** True while raw-JSON rows await their group-commit merge — readers that
    * must see ONLY committed state (e.g. the property-value index) check
    * this and fall back to the overlay scan. */
  private[graft] def hasPendingWal(table: String): Boolean =
    pendingFiles(table).nonEmpty

  private def pendingRows(table: String): Long =
    pendingFiles(table).map { f =>
      val WalName(_, _, rows) = f.getName: @unchecked; rows.toLong
    }.sum

  private def appendPending(table: String, jsonEvents: Seq[String],
                            nowMs: Long): Unit = {
    val d = pendingDir(table)
    d.mkdirs()
    val name = s"wal-${System.nanoTime()}-$nowMs-${jsonEvents.size}.jsonl"
    val tmp = new java.io.File(d, name + ".tmp")
    java.nio.file.Files.write(tmp.toPath,
      jsonEvents.mkString("", "\n", "\n").getBytes("UTF-8"))
    // rename-in-place is atomic on a local fs; lock-free overlay readers
    // never observe a half-written .jsonl
    require(tmp.renameTo(new java.io.File(d, name)), s"WAL publish failed: $name")
  }

  /** Parse pending WAL lines exactly as [[Api.insert]] parses a live batch:
    * schema-driven JSON with second/ISO stamp normalization. */
  private def parsePending(m: TableMeta, files: Seq[java.io.File]): DataFrame = {
    import graft.operators.EventIngest
    val raw = spark.read.text(files.map(_.toString): _*).toDF("j")
      .where(length(trim(col("j"))) > 0)
    EventIngest.parseJson(raw, "j",
      StructType(m.eventsSchema.fields.map(f =>
        if (f.name == "stamp") f.copy(dataType = StringType) else f)))
      .withColumn("stamp", graft.operators.EventIngest.normalizeStamp(col("stamp")))
      .select(m.eventsSchema.fieldNames.map(col): _*)
  }

  /** (WAL fileset fingerprint, its touched buckets) per table: the
    * touched-bucket probe is a real Spark job run eagerly at plan-build
    * time, and every read while the SAME WAL is pending needs the same
    * answer — memoize so only the first read (and the drain) pays it. */
  private val overlayTouched =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[Int])]

  /** (WAL fileset fingerprint, parsed + persisted pending frame): between
    * drains EVERY overlay read re-scanned and re-parsed every pending WAL
    * file ([[parsePending]]); the rows are bounded by `flush_rows`, so pin
    * the parsed frame in memory keyed by the same fileset fingerprint as
    * the probe memo. Honest accounting (WalReadBench): local warm latency
    * is MERGE-dominated — the upsert window over the touched buckets —
    * so this cache barely moves wall-clock at local[32]; what it removes
    * is the per-query re-READ of the WAL fileset, which on the shared-
    * filesystem deployment (HDFS/S3) is files×queries remote reads
    * between drains. Entries unpersist as soon as the listing changes — a
    * cached frame only ever serves reads whose live listing IS its
    * fileset, so its source files exist for any recompute (the drain's
    * grace window covers in-flight jobs that span a retirement, exactly
    * as for uncached reads). */
  private val pendingParsed =
    new java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]

  /** Test-only interleave hook, fired right after the WAL listing in
    * [[overlayPending]]: lets a spec drain the table between "list WAL"
    * and "plan committed base" to prove the ordering is race-safe. */
  private[graft] var afterWalListHook: () => Unit = () => ()

  /** Test-only kill point between the drain's COMMIT (insertLocked
    * returned — the new generation is published, the pointer is flipped)
    * and WAL retirement (the `.drained` markers): a throw here simulates a
    * crash in that window, leaving the WAL listed AND its rows committed.
    * Recovery contract: replay is idempotent — the upsert key
    * (id, stamp, z-rank, row-hash) collapses the re-merged rows — and
    * overlay reads in the window dedup the double-counted rows the same
    * way (GroupCommitSpec round-16 crash legs). */
  private[graft] var afterDrainCommitHook: () => Unit = () => ()

  /** The touched-bucket set memoized for the current pending WAL (None
    * when no overlay read has probed yet). Diagnostic surface for specs
    * and WalReadBench: the overlay's read amplification is bounded by
    * THIS set — untouched buckets scan committed parquet unchanged. */
  private[graft] def pendingTouchedBuckets(table: String): Option[Seq[Int]] =
    Option(overlayTouched.get(table)).map(_._2)

  /** The live view while a WAL is pending: untouched buckets as committed,
    * touched buckets through the same merge the drain will write.
    *
    * `base` is BY NAME and must not be forced before [[pendingFiles]]
    * runs: listing first means a drain that lands after the listing leaves
    * both the WAL files (side-marker retirement + grace window) and the
    * new committed generation visible — the overlay merge dedups the
    * double-counted rows by the upsert key. The reverse order could pair a
    * stale base with an empty listing and lose acked rows. */
  private def overlayPending(table: String, m: TableMeta,
                             base: => DataFrame,
                             dateBounds: Option[(Long, Long)] = None): DataFrame = {
    val files = pendingFiles(table)
    afterWalListHook()
    if (files.isEmpty) {
      Option(pendingParsed.remove(table)).foreach(_._2.unpersist(false))
      return base
    }
    val walNow = files.map { f =>
      val WalName(_, now, _) = f.getName: @unchecked; now.toLong
    }.max
    val key = files.map(_.getName).mkString(",")
    val memo = Option(overlayTouched.get(table)).collect {
      case (k, t) if k == key => t
    }
    val parsed = Option(pendingParsed.get(table)).collect {
      case (k, df) if k == key => df
    }.getOrElse {
      val df = parsePending(m, files)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Option(pendingParsed.put(table, (key, df)))
        .filter(_._1 != key).foreach(_._2.unpersist(false))
      df
    }
    val (touched, merged) =
      mergeTouched(table, m, parsed, walNow, memo)
    if (memo.isEmpty) overlayTouched.put(table, (key, touched)): Unit
    // untouched buckets keep any caller-requested date pruning; touched
    // buckets merge their full history (upsert semantics need it) — the
    // caller's row-exact stamp predicates still apply above this view
    val untouched = dropPartCols(m,
      eventsWithBucket(table, m, dateBounds = dateBounds)
        .where(col("__bucket").isNotNull && !col("__bucket").isin(touched: _*)))
    untouched.unionByName(merged)
  }

  /** Merge pending WAL batches into bucket parquet (one read-merge-write
    * for ALL pending rows — the group commit) and retire the WAL files.
    * Caller holds the writer lock. Retiring creates a SIDE MARKER
    * (`<wal>.drained`) instead of renaming: a lock-free overlay reader
    * that already planned the WAL path keeps finding it for the same
    * grace window manifest-retired parquet gets (double reads dedup by
    * the upsert key, so an in-flight reader spanning the drain still
    * computes the right rows). Replay after a crash (merge committed,
    * marker not yet written) is idempotent for the same reason. */
  private def drainPendingLocked(table: String, nowMs: Long): Unit = {
    val files = pendingFiles(table)
    if (files.nonEmpty) {
      val m = describe(table)
      val walNow = files.map { f =>
        val WalName(_, now, _) = f.getName: @unchecked; now.toLong
      }.max.max(nowMs)
      insertLocked(table, parsePending(m, files), walNow)
      afterDrainCommitHook()
      files.foreach { f =>
        val marker = new java.io.File(f.getPath + ".drained")
        if (!marker.exists()) java.nio.file.Files.createFile(marker.toPath): Unit
      }
    }
    val cutoff = System.currentTimeMillis() - TableCommit.graceMs
    Option(pendingDir(table).listFiles()).getOrElse(Array.empty)
      .filter(_.lastModified < cutoff)
      .foreach { f =>
        if (f.getName.endsWith(".drained")) {
          new java.io.File(f.getPath.stripSuffix(".drained")).delete()
          f.delete(): Unit
        // an append that crashed between the .tmp write and its rename
        // (or whose rename threw) never published — readers ignore .tmp,
        // so past the grace window it is garbage to reclaim
        } else if (f.getName.endsWith(".tmp")) f.delete(): Unit
      }
  }

  /** Force-merge any pending WAL into bucket parquet (public flush). */
  def flush(table: String, nowMs: Long = System.currentTimeMillis()): Unit =
    Fs.withWriteLock(eventsDir(table)) { drainPendingLocked(table, nowMs) }

  /** Raw-JSON insert (`POST /v1/insert` body): append to the pending WAL,
    * then merge once [[TableSettings.flushRows]] rows are pending (0 =
    * merge immediately — classic behavior). */
  def insertRaw(table: String, jsonEvents: Seq[String], nowMs: Long): Unit = {
    if (jsonEvents.isEmpty) return
    val m = describe(table)
    Fs.withWriteLock(eventsDir(table)) {
      appendPending(table, jsonEvents, nowMs)
      if (pendingRows(table) >= math.max(1L, m.settings.flushRows.toLong)) {
        drainPendingLocked(table, nowMs)
        vacuumExpiredLocked(table, nowMs): Unit
      }
    }
  }

  /** Insert with the reference's full pipeline (`src/oloop_insert.cpp`):
    * upsert by (id, stamp, z-order rank, row hash), z-ordered merge, TTL and
    * eventMax culls — per TOUCHED id-hash bucket only. Storage is
    * `events/__bucket=<hash(id) % storage_buckets>/` parquet: a batch reads,
    * merges and atomically swaps just the buckets its ids hash into, so
    * ingest cost scales with the batch's id spread, not the table size
    * (at cluster scale the same layout maps onto Delta/Iceberg MERGE with
    * partition pruning). Culls apply to touched customers' buckets — the
    * reference likewise culls a person's grid when it is re-packed on
    * insert, not table-wide. */
  /** Parquet content at the events root that is NOT under a `__bucket=` dir:
    * a legacy flat (pre-bucket) layout. Such tables must be migrated whole —
    * a per-touched-bucket swap would leave the flat files in place next to
    * partition dirs (conflicting directory structures on the next read) and
    * duplicate the flat rows that hash into swapped buckets. */
  private def legacyFlatFiles(root: java.io.File): Array[java.io.File] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filterNot(_.getName.startsWith("__bucket="))
      .filter(hasParquet)

  def insert(table: String, incoming: DataFrame, nowMs: Long): Unit =
    // commit protocol: the whole read-merge-swap holds the table's writer
    // lock, so a concurrent insert merges against THIS batch's result
    // instead of the same base (lost update); readers stay lock-free on
    // the atomic bucket renames. Any pending WAL drains FIRST so this
    // batch's rows supersede earlier raw-JSON appends (upsert latest-wins)
    Fs.withWriteLock(eventsDir(table)) {
      drainPendingLocked(table, nowMs)
      insertLocked(table, incoming, nowMs)
      vacuumExpiredLocked(table, nowMs): Unit
    }

  /** Retention sweep: on a `date_partition` table, whole date directories
    * past the TTL horizon drop from the manifest at METADATA cost — no
    * data job, no file read (the reference culls expired blocks the same
    * way, `src/grid.cpp:698-750`). A date D is swept only when EVERY
    * possible stamp in it is expired (`(D+1) ≤ now − ttl`, UTC) — rows of
    * the partial day at the horizon stay until a merge culls them, exactly
    * the [[graft.operators.EventIngest.cullTtl]] row rule, conservatively.
    * This complements the merge-time cull, which only reaches TOUCHED
    * buckets: at 100 TB with 5-year retention the untouched 99% of history
    * ages out by manifest edits alone. Dropped files retire through the
    * standard grace window (in-flight readers keep their snapshot).
    * Returns the number of files swept. */
  def vacuumExpired(table: String, nowMs: Long): Int =
    Fs.withWriteLock(eventsDir(table)) { vacuumExpiredLocked(table, nowMs) }

  private def vacuumExpiredLocked(table: String, nowMs: Long): Int = {
    val m = describe(table)
    if (!m.settings.datePartition) return 0
    val root = eventsDir(table)
    TableCommit.read(root) match {
      case None => 0
      case Some(c) =>
        val horizon = nowMs - m.settings.eventTtlMs
        def expired(entry: String): Boolean =
          entry.startsWith("event_date=") && {
            val d = entry.takeWhile(_ != '/').stripPrefix("event_date=")
            try {
              val day = java.time.LocalDate.parse(d).toEpochDay
              (day + 1) * 86400000L <= horizon
            } catch { case _: Exception => false }
          }
        val parts = c.buckets.toSeq.map { case (b, fs) =>
          val (drop, keep) = fs.partition(expired)
          (b, drop, keep)
        }
        val dropped = parts.flatMap { case (b, drop, _) =>
          drop.map(f => s"__bucket=$b/$f") }
        if (dropped.isEmpty) return 0
        val keepBuckets = parts.collect {
          case (b, _, keep) if keep.nonEmpty => b -> keep }.toMap
        val wallNow = System.currentTimeMillis()
        val next = TableCommit.State(c.gen + 1, keepBuckets,
          c.retired :+ TableCommit.Retired(wallNow, dropped),
          // row removals keep every upper bound valid
          personMax = c.personMax.filter(kv => keepBuckets.contains(kv._1)))
        TableCommit.write(root, TableCommit.gc(root, next, wallNow))
        dropped.size
    }
  }

  /** The merge both the eager insert WRITES and the pending-WAL overlay
    * READS: existing rows of the batch's touched buckets upserted with the
    * batch, TTL and eventMax culled. Sharing one transform makes the
    * overlaid live view and the post-drain committed state identical by
    * construction. */
  private def mergeTouched(table: String, m: TableMeta, aligned: DataFrame,
                           nowMs: Long,
                           knownTouched: Option[Seq[Int]] = None)
      : (Seq[Int], DataFrame) = {
    import graft.operators.EventIngest
    // bounded by storage_buckets — a tiny driver-side list, never row data
    val touched: Seq[Int] = knownTouched.getOrElse(
      aligned.select(bucketCol(m).as("__bucket"))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted)
    val existing = dropPartCols(m, eventsWithBucket(table, m)
      .where(col("__bucket").isNull || col("__bucket").isin(touched: _*)))
    val merged0 = EventIngest.upsert(existing, aligned,
      m.settings.eventOrder, m.eventProps.map(_.name))
    val merged = EventIngest.cullEventMax(
      EventIngest.cullTtl(merged0, nowMs, m.settings.eventTtlMs),
      m.settings.eventMax, m.settings.eventOrder)
    (touched, merged)
  }

  /** Stage the merged touched-bucket rows as partitioned parquet. Each
    * writer partition holds exactly one bucket's rows sorted by
    * (__bucket, [event_date,] id, stamp): the partition dirs split that
    * sorted run, so EVERY staged file is (id, stamp)-sorted — the invariant
    * that lets the bucketed read claim the sort order whenever a bucket
    * contributes one file (always for undated tables; per pruned date for
    * dated ones). The sort leads with the write's partition columns, so
    * FileFormatWriter's required ordering is already satisfied and no
    * second (order-destroying) sort is inserted. */
  private def stageWrite(m: TableMeta, merged: DataFrame, nTouched: Int,
                         stage: String): Unit = {
    val dated = m.settings.datePartition
    val withParts =
      if (dated)
        merged.withColumn("__bucket", bucketCol(m)).withColumn("event_date", dateCol)
      else merged.withColumn("__bucket", bucketCol(m))
    val sortCols = partCols(m) ++ Seq("id", "stamp")
    withParts
      .repartition(math.max(nTouched, 1), col("__bucket"))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.partitionBy(partCols(m): _*).mode(SaveMode.Overwrite).parquet(stage)
  }

  /** Move a staged bucket's files into the live bucket dir, descending into
    * `event_date=` subdirs for dated tables; returns the manifest-relative
    * names (`[event_date=D/]file`). murmur3 layouts embed the bucket id in
    * the file NAME — the tag FileSourceScanExec uses to map files onto
    * bucket partitions. Spark part-file names carry a fresh UUID: no clash. */
  private def moveStaged(m: TableMeta, staged: java.io.File,
                         dstDir: java.io.File, b: Int,
                         prefix: String): Seq[String] = {
    dstDir.mkdirs()
    Option(staged.listFiles()).getOrElse(Array.empty).toSeq.flatMap {
      case f if f.isFile && f.getName.endsWith(".parquet") =>
        val name =
          if (m.settings.bucketHash == "murmur3")
            graft.sources.BucketedEvents.bucketedFileName(f.getName, b)
          else f.getName
        val dst = new java.io.File(dstDir, name)
        require(f.renameTo(dst), s"stage move failed for $dst")
        Seq(prefix + name)
      case sd if sd.isDirectory && sd.getName.startsWith("event_date=") =>
        moveStaged(m, sd, new java.io.File(dstDir, sd.getName), b,
          prefix + sd.getName + "/")
      case _ => Nil
    }
  }

  /** Date-SCOPED merge for `date_partition` tables: a batch's rows can
    * upsert-collide only with rows at the same (id, stamp) — the same
    * `event_date` — so the merge needs to read and rewrite ONLY the
    * batch's dates (plus the TTL horizon date, whose partial-day rows
    * cull row-level; wholly-expired dates sweep via [[vacuumExpired]]).
    * At 5-year retention this turns a daily batch's write cost from
    * O(touched buckets × full history) into O(touched buckets × 1 day) —
    * the reference's insert likewise re-packs only the person-grid blocks
    * it touches (`src/grid.cpp:1194-1369`).
    *
    * The ONE cross-date effect is eventMax eviction (new rows can push a
    * person over the cap, evicting their OLDEST rows in other dates). The
    * guard handles it in three tiers: (1) steady state — the manifest's
    * per-bucket person-count bound proves nobody can exceed the cap, no
    * scan at all; (2) bound missing or tripped — one narrow (id, stamp,
    * event) column scan recomputes truth, re-seeds the bound, and evicts
    * SCOPED: the merge widens to the dates holding over-cap persons'
    * surplus rows and filters below their exact per-person cutoffs;
    * (3) only genuine ambiguity (a possible upsert-collapse with an
    * over-cap person, a retention-order tie at the cap boundary), a first
    * insert, or a backfill spanning > 32 dates (rewriting the bucket
    * outright is cheaper) falls back to the full-bucket merge. Returns
    * true when the scoped path committed. */
  private def insertDatedScoped(table: String, m: TableMeta,
                                aligned: DataFrame, nowMs: Long): Boolean = {
    val root = new java.io.File(eventsDir(table))
    val commit0 = TableCommit.read(root.toString).getOrElse(return false)
    if (commit0.buckets.isEmpty) return false // first insert seeds full
    // touched buckets + the batch's dates: driver-side lists bounded by
    // the batch's spread (one tiny job)
    val probe = aligned.select(bucketCol(m).as("__b"), dateCol.as("__d"))
      .distinct().collect()
    if (probe.isEmpty) return true // empty batch: nothing to do
    val touched = probe.map(_.getInt(0)).distinct.toSeq.sorted
    val batchDates = probe.map(_.getDate(1).toLocalDate).distinct.toSeq
    if (batchDates.size > 32) return false // backfill: full rewrite wins
    val horizonDate = java.time.Instant.ofEpochMilli(nowMs - m.settings.eventTtlMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    import graft.operators.EventIngest
    val cap = m.settings.eventMax
    val horizonMs = nowMs - m.settings.eventTtlMs
    // eventMax guard. Steady state is O(batch): the manifest carries a
    // per-bucket UPPER BOUND on any person's row count, so when
    // bound + batch's per-person max ≤ eventMax no history scan runs at
    // all. When a bucket's bound is missing (first scoped insert after a
    // full merge / old manifest) or trips the cap, ONE narrow (id, stamp,
    // event) column scan of THE TRIPPED BUCKETS ONLY (no payload read)
    // recomputes truth exactly, re-seeds the bound, and — round 17 —
    // drives SCOPED EVICTION: over-cap persons' surplus rows live in
    // dates the scan identifies from their stamps, so the merge widens to
    // those dates and drops rows below each person's cap-th-newest
    // (stamp, z-rank) cutoff, instead of rewriting the bucket's whole
    // history. The cutoff is exact as long as no batch row can
    // upsert-collapse with an over-cap person's rows (a collapse needs a
    // matching (id, stamp, event) triple — the full-row hash refines it)
    // and no tie straddles the cap boundary; either ambiguity falls back
    // to the full merge, whose upsert decides on complete rows. Without
    // this, one at-cap person would degrade every future insert touching
    // their bucket into a full-history rewrite.
    val batchMaxByBucket: Map[Int, Long] = aligned
      .groupBy(bucketCol(m).as("__b"), col("id")).agg(count(lit(1)).as("__n"))
      .groupBy(col("__b")).agg(max(col("__n")).as("__mx"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bounds = commit0.personMax
    // only the buckets whose bound is missing or would cross the cap need
    // the scan — a batch touching 1 000 buckets where 10 tripped reads 10
    val tripped = touched.filterNot(b =>
      bounds.get(b).exists(_ + batchMaxByBucket.getOrElse(b, 0L) <= cap))
    val (newBounds: Map[Int, Long],
         evictDates: Seq[java.time.LocalDate],
         cutoffs: Option[DataFrame]) =
      if (tripped.isEmpty)
        (touched.map(b =>
          b -> (bounds(b) + batchMaxByBucket.getOrElse(b, 0L))).toMap,
         Seq.empty[java.time.LocalDate], None)
      else {
        val exist = dropPartCols(m, eventsWithBucket(table, m)
          .where(col("__bucket").isin(tripped: _*)))
          .select(col("id"), col("stamp"), col("event"))
          .where(col("stamp") >= horizonMs)
          .withColumn("__new", lit(0))
        val fresh = aligned
          .where(bucketCol(m).isin(tripped: _*))
          .select(col("id"), col("stamp"), col("event"))
          .where(col("stamp") >= horizonMs)
          .withColumn("__new", lit(1))
        val zr = EventIngest.eventRank(col("event"), m.settings.eventOrder)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("stamp").desc, zr.desc)
        // localCheckpoint: three consumers (decision, evicted dates, the
        // merge's cutoff join) read the narrow scan once
        val ranked = exist.unionByName(fresh)
          .withColumn("__zr", zr)
          .withColumn("__rn", row_number().over(w))
          .localCheckpoint()
        val perPerson = ranked.groupBy(col("id")).agg(
          count(lit(1)).as("__n"),
          max(when(col("__rn") === cap,
            struct(col("stamp").as("s"), col("__zr").as("r")))).as("__cut"),
          max(when(col("__rn") === cap + 1,
            struct(col("stamp").as("s"), col("__zr").as("r")))).as("__nxt"),
          // the dates holding this person's surplus rows (collect_list
          // skips the non-evicted rows' nulls; bounded by retention days)
          array_distinct(collect_list(
            when(col("__rn") > cap, dateCol))).as("__evd"))
        // a batch row MAY collapse with an existing row only on a matching
        // (id, stamp, event) triple
        val collided = ranked.groupBy(col("id"), col("stamp"), col("event"))
          .agg(min(col("__new")).as("__mn"), max(col("__new")).as("__mx"))
          .where(col("__mn") === 0 && col("__mx") === 1)
          .select(col("id")).distinct()
        // ONE decision pass: per-bucket exact bound, ambiguity flag, and
        // the union of evicted-row dates
        val summary = perPerson
          .join(collided.withColumn("__coll", lit(1)), Seq("id"), "left_outer")
          .groupBy(bucketCol(m).as("__b")).agg(
            max(least(col("__n"), lit(cap.toLong))).as("__mx"),
            max(when(col("__n") > cap &&
              (col("__coll") === 1 || col("__cut") === col("__nxt")), 1)
              .otherwise(0)).as("__bad"),
            array_distinct(flatten(collect_list(col("__evd")))).as("__evd"))
          .collect().map(r => r.getInt(0) ->
            ((r.getLong(1), r.getInt(2),
              r.getSeq[java.sql.Date](3).map(_.toLocalDate)))).toMap
        if (summary.values.exists(_._2 == 1)) return false // ambiguous: full merge
        val evicted = summary.values.flatMap(_._3).toSeq.distinct
        val cuts = perPerson.where(col("__n") > cap)
          .select(col("id"), col("__cut.s").as("__cs"), col("__cut.r").as("__cr"))
        val okBounds = touched.filterNot(tripped.contains).map(b =>
          b -> (bounds(b) + batchMaxByBucket.getOrElse(b, 0L))).toMap
        val exactBounds = tripped.map(b =>
          b -> summary.get(b).map(_._1).getOrElse(0L)).toMap
        (okBounds ++ exactBounds,
         evicted, if (evicted.isEmpty) None else Some(cuts))
      }
    val affected = (batchDates ++ evictDates :+ horizonDate).distinct.sorted
      .map(d => s"event_date=$d").toSet
    // merge ONLY the affected dates of the touched buckets — the read is
    // partition-pruned on both levels
    // typed date literals so the IN-predicate prunes partitions directly
    val affDates = affected.map(_.stripPrefix("event_date=")).toSeq.sorted
      .map(java.sql.Date.valueOf)
    val existing = dropPartCols(m, eventsWithBucket(table, m)
      .where(col("__bucket").isin(touched: _*) &&
        col("event_date").isin(affDates: _*)))
    val merged0 = EventIngest.cullTtl(
      EventIngest.upsert(existing, aligned,
        m.settings.eventOrder, m.eventProps.map(_.name)),
      nowMs, m.settings.eventTtlMs)
    // scoped eviction: drop over-cap persons' rows strictly below their
    // cutoff in the (stamp desc, z-rank desc) retention order — the same
    // order cullEventMax applies on the full-merge path
    val merged = cutoffs match {
      case None => merged0
      case Some(cuts) =>
        val zr = EventIngest.eventRank(col("event"), m.settings.eventOrder)
        merged0.join(cuts, Seq("id"), "left_outer")
          .where(col("__cs").isNull || col("stamp") > col("__cs") ||
            (col("stamp") === col("__cs") && zr >= col("__cr")))
          .drop("__cs", "__cr")
    }
    val stage = new java.io.File(eventsDir(table) + "_stage")
    rmTree(stage)
    stageWrite(m, merged, touched.size, stage.toString)
    val newBuckets = scala.collection.mutable.Map(commit0.buckets.toSeq: _*)
    val retiredNow = scala.collection.mutable.ArrayBuffer.empty[String]
    touched.foreach { b =>
      val staged = new java.io.File(stage, s"__bucket=$b")
      val dstDir = new java.io.File(root, s"__bucket=$b")
      val moved: Seq[String] =
        if (!staged.isDirectory) Nil
        else moveStaged(m, staged, dstDir, b, prefix = "")
      val (replaced, kept) = newBuckets.getOrElse(b, Nil)
        .partition(e => affected.contains(e.takeWhile(_ != '/')))
      retiredNow ++= replaced.map(n => s"__bucket=$b/$n")
      val next = kept ++ moved
      if (next.nonEmpty) newBuckets(b) = next else newBuckets.remove(b): Unit
    }
    val wallNow = System.currentTimeMillis()
    val next = TableCommit.State(commit0.gen + 1, newBuckets.toMap,
      commit0.retired :+ TableCommit.Retired(wallNow, retiredNow.toSeq),
      // exact-or-upper bounds for the touched buckets; untouched keep theirs
      personMax = (commit0.personMax ++ newBounds)
        .filter(kv => newBuckets.contains(kv._1)))
    TableCommit.write(root.toString, TableCommit.gc(root.toString, next, wallNow))
    rmTree(stage)
    true
  }

  private def insertLocked(table: String, incoming: DataFrame, nowMs: Long): Unit = {
    val m = describe(table)
    val aligned = incoming.select(m.eventsSchema.fieldNames.map(col): _*)
    recoverEvents(table)
    if (legacyFlatFiles(new java.io.File(eventsDir(table))).nonEmpty)
      return insertMigrateLegacy(table, m, aligned, nowMs)
    if (m.settings.datePartition && insertDatedScoped(table, m, aligned, nowMs))
      return
    val (touched, merged) = mergeTouched(table, m, aligned, nowMs)
    if (touched.isEmpty) return
    // stage the touched buckets, then commit via the manifest: move the
    // staged (immutable, uniquely-named) files into the bucket dirs, publish
    // a new _commit atomically, and retire — not delete — the files they
    // replace, so readers that planned against the previous snapshot still
    // find every path (TableCommit.graceMs bounds how long)
    val root = new java.io.File(eventsDir(table))
    val stage = new java.io.File(eventsDir(table) + "_stage")
    rmTree(stage)
    stageWrite(m, merged, touched.size, stage.toString)
    root.mkdirs()
    val commit0 = TableCommit.read(root.toString)
      .getOrElse(TableCommit.fromListing(root.toString)) // one-time migration
    val newBuckets = scala.collection.mutable.Map(commit0.buckets.toSeq: _*)
    val retiredNow = scala.collection.mutable.ArrayBuffer.empty[String]
    touched.foreach { b =>
      val staged = new java.io.File(stage, s"__bucket=$b")
      val dstDir = new java.io.File(root, s"__bucket=$b")
      val moved: Seq[String] =
        if (!staged.isDirectory) Nil // every row of the bucket was culled
        else moveStaged(m, staged, dstDir, b, prefix = "")
      retiredNow ++= newBuckets.getOrElse(b, Nil).map(n => s"__bucket=$b/$n")
      if (moved.nonEmpty) newBuckets(b) = moved else newBuckets.remove(b): Unit
    }
    val wallNow = System.currentTimeMillis()
    val next = TableCommit.State(commit0.gen + 1, newBuckets.toMap,
      commit0.retired :+ TableCommit.Retired(wallNow, retiredNow.toSeq),
      // a full merge invalidates its buckets' person-count bounds (culls
      // may have shrunk truth well below them) — the next scoped insert's
      // guard scan re-seeds exact values; untouched buckets keep theirs
      personMax = (commit0.personMax -- touched)
        .filter(kv => newBuckets.contains(kv._1)))
    TableCommit.write(root.toString, TableCommit.gc(root.toString, next, wallNow))
    rmTree(stage)
  }

  /** First insert into a legacy flat (pre-bucket) events dir migrates the
    * WHOLE table: merge the batch into the full history, write every bucket,
    * and swap the entire events root atomically ([[Fs.swapInto]] — the old
    * flat files leave with the old root; a crash at any point is recovered
    * by `recoverSwap(root)` on the next read/insert). One-time O(table)
    * cost, after which inserts are per-touched-bucket again. */
  private def insertMigrateLegacy(table: String, m: TableMeta,
                                  aligned: DataFrame, nowMs: Long): Unit = {
    import graft.operators.EventIngest
    val nB = m.settings.storageBuckets
    val existing = eventsWithBucket(table, m).drop("__bucket")
    val merged0 = EventIngest.upsert(existing, aligned,
      m.settings.eventOrder, m.eventProps.map(_.name))
    val merged = EventIngest.cullEventMax(
      EventIngest.cullTtl(merged0, nowMs, m.settings.eventTtlMs),
      m.settings.eventMax, m.settings.eventOrder)
    swapInto(eventsDir(table)) { tmp =>
      stageWrite(m, merged, nB, tmp)
    }
    // seed the manifest so every subsequent read/commit is snapshot-isolated
    TableCommit.write(eventsDir(table),
      TableCommit.fromListing(eventsDir(table)).copy(gen = 1L))
  }

  /** Customer-property facts (`is_customer` props), merged by id. */
  def customers(table: String): DataFrame = {
    val m = describe(table)
    val cur = currentCustomersDir(table)
    if (!new java.io.File(cur).isDirectory) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.customerSchema)
    else spark.read.parquet(cur)
  }

  def mergeCustomers(table: String, updates: DataFrame): Unit =
    Fs.withWriteLock(customersDir(table)) {
      val merged = graft.operators.CustomerProps.writeBack(customers(table), updates)
      val cur = customersGen(table)
      val next = cur + 1
      // the generational write reads the previous generation while
      // writing the next — rename-free, readers keep their planned files
      merged.write.mode(SaveMode.Overwrite)
        .parquet(s"${customersDir(table)}_v$next")
      val pf = new java.io.File(dir(table), "customers.gen")
      val tmp = new java.io.File(pf.toString + "_tmp")
      java.nio.file.Files.write(tmp.toPath,
        next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp.toPath, pf.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val re = "customers_v(\\d+)".r
      Option(dir(table).listFiles)
        .getOrElse(Array.empty).foreach { f =>
          val g = f.getName match {
            case "customers" => Some(0L)
            case re(g0) => Some(g0.toLong)
            case _ => None
          }
          g.filter(_ < cur).foreach(_ => Fs.rmTree(f))
        }
    }

  /** Run an OSL script over the table's event history and merge any
    * customer-property assignments back into the customer store — the
    * reference's script-driven prop write-back (`setGridProps`,
    * `src/queryinterpreter.cpp:3116-3264`), typically wired to `on_insert`.
    * Prop variables are seeded from — and validated against — the table's
    * declared `is_customer` schema. */
  def runPropWriteback(table: String, script: String, nowMs: Long): Unit = {
    val m = describe(table)
    require(m.customerProps.nonEmpty,
      s"table '$table' declares no is_customer properties")
    val updates = graft.osl.OslEngine.propWriteback(
      events(table), customers(table), script, nowMs, m.settings.sessionTimeMs)
    mergeCustomers(table, updates)
  }
}
