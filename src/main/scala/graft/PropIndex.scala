package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Materialized property-value index — the Spark analogue of the
  * reference's attribute index, which answers `/v1/query/{t}/property`
  * counts purely from `(prop, value) -> person bitmap` postings with ZERO
  * row scans (`/root/reference/src/oloop_property.cpp:34-307`; countable
  * segments read the same index, `src/oloop_segment.cpp:184-196`).
  *
  * Layout: one side table per events table at `<table>/propindex/data`,
  * rows `(prop, value_str, customers, n_rows)` partitioned by the SAME
  * `__bucket` id-hash as the events store. The key fact that makes plain
  * counts (not bitmaps) exact: storage buckets partition PERSONS —
  * `bucket(id)` is a function of `id` — so per-bucket `COUNT(DISTINCT id)`
  * partials are over disjoint person sets and their SUM is the exact global
  * distinct count, for textual and numeric ids alike.
  *
  * Freshness is generational and incremental: `srcgen.json` records, per
  * CELL, a fingerprint of the events manifest's live file list — a cell is
  * a whole bucket for undated tables and a (bucket, date) pair for
  * `date_partition` tables. [[ensure]] diffs fingerprints against the
  * CURRENT commit and recomputes only the cells whose files changed. On
  * dated tables that grain matters: a daily insert rewrites one date per
  * touched bucket, so the refresh reads ONE DAY of events into the
  * per-(bucket, date) POSTINGS tier (`propindex/postings` — the
  * reference's per-value person lists), then re-aggregates the touched
  * buckets' serving counts from postings alone (index-sized, never a
  * history scan; distinct persons are not additive across dates, which is
  * why the bucket-level rollup exists). The index data dirs carry their
  * own [[TableCommit]] manifests, so index readers get the identical
  * snapshot isolation (create-new log, grace-window retires) as events
  * readers — no swap can fail a planned scan.
  *
  * Answerable index-only (Api.queryProperty routes here): all value search
  * modes (`gt/gte/lt/lte/eq/between/rx/sub` — every mode is a VALUE-level
  * predicate), `order=`, `trim=`, and the `*` segment. Falls back to the
  * row scan for: numeric `bucket=` grouping (distinct persons across
  * merged values cannot be summed from per-value counts), named-segment
  * intersections, set-valued props, and while a pending WAL overlays
  * uncommitted rows.
  */
object PropIndex {

  /** Event-history columns the index covers: the fixed `event` column plus
    * every scalar (non-set) event property. */
  def indexableProps(m: TableMeta): Seq[String] =
    "event" +: m.eventProps.filterNot(_.isSet).map(_.name)

  def indexable(m: TableMeta, prop: String): Boolean =
    indexableProps(m).contains(prop)

  private def indexRoot(cat: Catalog, table: String) =
    new java.io.File(new java.io.File(cat.warehouse, table), "propindex")
  private def dataDir(cat: Catalog, table: String) =
    new java.io.File(indexRoot(cat, table), "data")
  private def srcGenFile(cat: Catalog, table: String) =
    new java.io.File(indexRoot(cat, table), "srcgen.json")

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(12).map("%02x".format(_)).mkString

  /** Per-CELL fingerprint of the events store's live files (order-fixed),
    * plus the prop-list fingerprint a DDL change invalidates everything
    * through. A cell is a whole bucket (`"3"`) for undated tables, and a
    * (bucket, date) pair (`"3/event_date=2024-01-01"`) for
    * `date_partition` tables — the grain an insert actually touches, so a
    * daily batch staleness-marks only its dates, never whole buckets. */
  private def fingerprints(state: TableCommit.State,
                           dated: Boolean): Map[String, String] =
    if (!dated)
      state.buckets.map { case (b, fs) =>
        b.toString -> sha(fs.sorted.mkString("\n")) }
    else
      state.buckets.toSeq.flatMap { case (b, fs) =>
        fs.groupBy(_.takeWhile(_ != '/')).map { case (datePart, cellFs) =>
          s"$b/$datePart" -> sha(cellFs.sorted.mkString("\n")) }
      }.toMap

  private def propsFp(m: TableMeta): String =
    sha(indexableProps(m).mkString("\n"))

  private final case class SrcGen(propsFp: String, cells: Map[String, String])

  private def readSrcGen(f: java.io.File): Option[SrcGen] = {
    if (!f.isFile) return None
    try {
      val s = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      import org.json4s._
      implicit val fmts: Formats = DefaultFormats
      val j = org.json4s.jackson.JsonMethods.parse(s)
      val cells = (j \ "buckets") match {
        case JObject(fields) => fields.map { case (k, v) =>
          k -> v.extract[String] }.toMap
        case _ => Map.empty[String, String]
      }
      Some(SrcGen((j \ "props_fp").extract[String], cells))
    } catch { case _: Exception => None }
  }

  private def writeSrcGen(f: java.io.File, g: SrcGen): Unit = {
    val buckets = g.cells.toSeq.sorted
      .map { case (b, fp) => s""""$b":"$fp"""" }.mkString("{", ",", "}")
    val json = s"""{"props_fp":"${g.propsFp}","buckets":$buckets}"""
    val tmp = new java.io.File(f.getPath + "_tmp")
    java.nio.file.Files.write(tmp.toPath,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  private val indexSchema = StructType(Seq(
    StructField("prop", StringType),
    StructField("value_str", StringType),
    StructField("customers", LongType),
    StructField("n_rows", LongType)))

  /** The per-bucket posting aggregation: explode each row into one
    * `(prop, value_str)` pair per indexed column (nulls kept — the scan
    * path counts the null group too), then ONE hash aggregation. Partial
    * (map-side) aggregation collapses the explode before the exchange, so
    * the shuffle carries `buckets × distinct values`, never row data. */
  private def aggregate(events: DataFrame, props: Seq[String]): DataFrame = {
    val pairs = array(props.map(p =>
      struct(lit(p).as("prop"), col(p).cast("string").as("value_str"))): _*)
    events
      .select(col("id"), col("__bucket"), explode(pairs).as("pv"))
      .groupBy(col("__bucket"), col("pv.prop").as("prop"),
        col("pv.value_str").as("value_str"))
      .agg(countDistinct(col("id")).as("customers"),
        count(lit(1)).as("n_rows"))
  }

  /** Make the index current for `table` (incremental — recompute only
    * buckets whose events files changed) and return it as a DataFrame
    * `(prop, value_str, customers, n_rows, __bucket)` reading ONLY index
    * parquet. Caller must have checked [[Catalog.hasPendingWal]]. */
  def ensure(spark: SparkSession, cat: Catalog, table: String): DataFrame = {
    val eventsRoot = cat.eventsDir(table)
    // (meta, events snapshot, target fingerprints) from the CURRENT commit
    def target(): (TableMeta, TableCommit.State, SrcGen) = {
      val m = cat.describe(table)
      val state = TableCommit.read(eventsRoot)
        .getOrElse(TableCommit.fromListing(eventsRoot))
      (m, state, SrcGen(propsFp(m), fingerprints(state, m.settings.datePartition)))
    }
    val (_, _, want0) = target()
    val dir = dataDir(cat, table)
    val have = readSrcGen(srcGenFile(cat, table))
    if (!have.contains(want0)) {
      Fs.withWriteLock(indexRoot(cat, table).toString) {
        // recompute the target under the lock, from a FRESH manifest read:
        // a reader queued behind a concurrent refresh must never rebuild
        // the index BACKWARD to its pre-lock (stale) events snapshot — the
        // refresh is forward-only, and a stale want simply finds the work
        // already done (have2 == fresh want) and becomes a no-op
        val (m, state, want) = target()
        val dated = m.settings.datePartition
        val have2 = readSrcGen(srcGenFile(cat, table))
        if (!have2.contains(want)) {
          // a props fingerprint change invalidates every cell
          val stale =
            if (have2.exists(_.propsFp == want.propsFp))
              want.cells.filter { case (k, fp) =>
                !have2.exists(_.cells.get(k).contains(fp)) }.keySet
            else want.cells.keySet
          val dropped = have2.map(_.cells.keySet.diff(want.cells.keySet))
            .getOrElse(Set.empty)
          if (dated)
            rebuildDated(spark, cat, table, m, state, want, stale, dropped)
          else
            rebuild(spark, cat, table, m, state, want,
              stale.map(_.toInt), dropped.map(_.toInt))
        }
      }
    }
    read(spark, dir.toString)
  }

  private def rebuild(spark: SparkSession, cat: Catalog, table: String,
                      m: TableMeta, state: TableCommit.State, want: SrcGen,
                      stale: Set[Int], dropped: Set[Int]): Unit = {
    val eventsRoot = cat.eventsDir(table)
    val counts: Option[DataFrame] =
      if (stale.isEmpty) None
      else {
        // snapshot-consistent source: the SAME manifest the fingerprints
        // came from, as an explicit file list (a racing insert can't skew it)
        val files = state.buckets.toSeq.filter(p => stale(p._1))
          .sortBy(_._1).flatMap { case (b, fs) =>
            fs.map(f => s"$eventsRoot/__bucket=$b/$f") }
        if (files.isEmpty) None
        else {
          // explicit schema: buckets written under older DDL epochs may lack
          // later-added prop columns — they read as nulls; __bucket (and any
          // event_date) come from the dir names via basePath
          val readSchema = StructType(
            m.eventsSchema.fields.map(_.copy(nullable = true)) :+
              StructField("__bucket", IntegerType))
          val events = spark.read.option("basePath", eventsRoot)
            .schema(readSchema).parquet(files: _*)
          Some(aggregate(events, indexableProps(m)))
        }
      }
    commitCounts(cat, table, stale, dropped, counts)
    writeSrcGen(srcGenFile(cat, table), want)
  }

  /** Stage `counts` (`prop, value_str, customers, n_rows, __bucket`) and
    * commit it into the serving manifest: `stale` buckets replace their
    * files (or drop out when the staged dir is absent — no rows left),
    * `dropped` buckets drop outright; everything retires through the
    * grace window. */
  private def commitCounts(cat: Catalog, table: String, stale: Set[Int],
                           dropped: Set[Int],
                           counts: Option[DataFrame]): Unit = {
    val dir = dataDir(cat, table)
    dir.mkdirs()
    val commit0 = TableCommit.read(dir.toString)
      .getOrElse(TableCommit.State(0L, Map.empty, Nil))
    val newBuckets = scala.collection.mutable.Map(commit0.buckets.toSeq: _*)
    val retiredNow = scala.collection.mutable.ArrayBuffer.empty[String]
    counts match {
      case Some(df) =>
        val stage = new java.io.File(dir.getPath + "_stage")
        Fs.rmTree(stage)
        df.repartition(math.max(stale.size, 1), col("__bucket"))
          .write.partitionBy("__bucket").mode(SaveMode.Overwrite)
          .parquet(stage.toString)
        stale.toSeq.sorted.foreach { b =>
          val staged = new java.io.File(stage, s"__bucket=$b")
          val dstDir = new java.io.File(dir, s"__bucket=$b")
          val moved: Seq[String] =
            if (!staged.isDirectory) Nil // bucket has no rows at all
            else {
              dstDir.mkdirs()
              Option(staged.listFiles()).getOrElse(Array.empty).toSeq
                .filter(f => f.isFile && f.getName.endsWith(".parquet"))
                .map { f =>
                  val dst = new java.io.File(dstDir, f.getName)
                  require(f.renameTo(dst), s"propindex stage move failed: $dst")
                  f.getName
                }
            }
          retiredNow ++= newBuckets.getOrElse(b, Nil).map(n => s"__bucket=$b/$n")
          if (moved.nonEmpty) newBuckets(b) = moved else newBuckets.remove(b): Unit
        }
        Fs.rmTree(stage)
      case None => stale.foreach { b =>
        retiredNow ++= newBuckets.getOrElse(b, Nil).map(n => s"__bucket=$b/$n")
        newBuckets.remove(b): Unit
      }
    }
    dropped.foreach { b =>
      retiredNow ++= newBuckets.getOrElse(b, Nil).map(n => s"__bucket=$b/$n")
      newBuckets.remove(b): Unit
    }
    val now = System.currentTimeMillis()
    val next = TableCommit.State(commit0.gen + 1, newBuckets.toMap,
      commit0.retired :+ TableCommit.Retired(now, retiredNow.toSeq))
    TableCommit.write(dir.toString, TableCommit.gc(dir.toString, next, now))
  }

  private def postingsDir(cat: Catalog, table: String) =
    new java.io.File(indexRoot(cat, table), "postings")

  private val postingsSchema = StructType(Seq(
    StructField("prop", StringType),
    StructField("value_str", StringType),
    StructField("id", StringType),
    StructField("n_rows", LongType)))

  /** Per-(bucket, date) postings: one row per (prop, value, person, date)
    * with that person's row count for the value — the reference's
    * per-value person lists (`src/oloop_property.cpp:34-307`) keyed so a
    * changed date recomputes alone. Distinct-person counts are NOT
    * additive across dates (one person spans many), which is why the
    * serving counts tier re-aggregates a bucket's postings — index-sized,
    * never events — whenever any of its cells change. Size honesty: the
    * collapse factor is rows-per-(person, value, day), so postings win
    * big on repeated values (event names, categorical props — the
    * reference's indexed attributes) and degrade toward events size for
    * continuous props whose every row is a fresh value; the narrow
    * 4-column schema still keeps the rollup far below an events re-read. */
  private def postingsAgg(events: DataFrame, props: Seq[String]): DataFrame = {
    val pairs = array(props.map(p =>
      struct(lit(p).as("prop"), col(p).cast("string").as("value_str"))): _*)
    events
      .select(col("id").cast("string").as("id"), col("__bucket"),
        col("event_date"), explode(pairs).as("pv"))
      .groupBy(col("__bucket"), col("event_date"),
        col("pv.prop").as("prop"), col("pv.value_str").as("value_str"),
        col("id"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("prop"), col("value_str"), col("id"), col("n_rows"),
        col("__bucket"), col("event_date"))
  }

  /** Dated-table rebuild: refresh the per-(bucket, date) POSTINGS for the
    * stale cells (reading ONLY those dates' events — a daily insert costs
    * one day, not the bucket's history), then recompute the serving
    * counts of every touched bucket from its postings. */
  private def rebuildDated(spark: SparkSession, cat: Catalog, table: String,
                           m: TableMeta, state: TableCommit.State,
                           want: SrcGen, staleCells: Set[String],
                           droppedCells: Set[String]): Unit = {
    val eventsRoot = cat.eventsDir(table)
    val pDir = postingsDir(cat, table)
    pDir.mkdirs()
    def parse(k: String): (Int, String) = {
      val i = k.indexOf('/')
      (k.take(i).toInt, k.drop(i + 1))
    }
    val stale = staleCells.map(parse)
    val dropped = droppedCells.map(parse)
    val pCommit0 = TableCommit.read(pDir.toString)
      .getOrElse(TableCommit.State(0L, Map.empty, Nil))
    val pBuckets = scala.collection.mutable.Map(pCommit0.buckets.toSeq: _*)
    val pRetired = scala.collection.mutable.ArrayBuffer.empty[String]
    def dropCell(b: Int, datePart: String): Unit = {
      val (replaced, kept) = pBuckets.getOrElse(b, Nil)
        .partition(_.startsWith(datePart + "/"))
      pRetired ++= replaced.map(n => s"__bucket=$b/$n")
      if (kept.nonEmpty) pBuckets(b) = kept else pBuckets.remove(b): Unit
    }
    if (stale.nonEmpty) {
      // snapshot-consistent source: the stale cells' live files from the
      // SAME manifest the fingerprints came from
      val files = state.buckets.toSeq.sortBy(_._1).flatMap { case (b, fs) =>
        fs.filter(f => stale.contains((b, f.takeWhile(_ != '/'))))
          .map(f => s"$eventsRoot/__bucket=$b/$f") }
      val readSchema = StructType(
        m.eventsSchema.fields.map(_.copy(nullable = true)) ++ Seq(
          StructField("__bucket", IntegerType),
          StructField("event_date", DateType)))
      val events = spark.read.option("basePath", eventsRoot)
        .schema(readSchema).parquet(files: _*)
      val stage = new java.io.File(pDir.getPath + "_stage")
      Fs.rmTree(stage)
      postingsAgg(events, indexableProps(m))
        .repartition(math.max(stale.size, 1),
          col("__bucket"), col("event_date"))
        .sortWithinPartitions(col("prop"), col("value_str"), col("id"))
        .write.partitionBy("__bucket", "event_date")
        .mode(SaveMode.Overwrite).parquet(stage.toString)
      stale.toSeq.sorted.foreach { case (b, datePart) =>
        val staged = new java.io.File(
          new java.io.File(stage, s"__bucket=$b"), datePart)
        val moved: Seq[String] =
          if (!staged.isDirectory) Nil // cell has no rows
          else {
            val dstDir = new java.io.File(
              new java.io.File(pDir, s"__bucket=$b"), datePart)
            dstDir.mkdirs()
            Option(staged.listFiles()).getOrElse(Array.empty).toSeq
              .filter(f => f.isFile && f.getName.endsWith(".parquet"))
              .map { f =>
                val dst = new java.io.File(dstDir, f.getName)
                require(f.renameTo(dst), s"postings stage move failed: $dst")
                s"$datePart/${f.getName}"
              }
          }
        dropCell(b, datePart)
        if (moved.nonEmpty) pBuckets(b) = pBuckets.getOrElse(b, Nil) ++ moved
      }
      Fs.rmTree(stage)
    }
    dropped.foreach { case (b, d) => dropCell(b, d) }
    val now0 = System.currentTimeMillis()
    val pNext = TableCommit.State(pCommit0.gen + 1, pBuckets.toMap,
      pCommit0.retired :+ TableCommit.Retired(now0, pRetired.toSeq))
    TableCommit.write(pDir.toString, TableCommit.gc(pDir.toString, pNext, now0))
    // serving tier: re-aggregate the touched buckets from their postings
    val staleBuckets: Set[Int] = stale.map(_._1) ++ dropped.map(_._1)
    val counts: Option[DataFrame] = {
      val pFiles = pNext.buckets.toSeq.filter(p => staleBuckets(p._1))
        .sortBy(_._1).flatMap { case (b, fs) =>
          fs.map(f => s"$pDir/__bucket=$b/$f") }
      if (pFiles.isEmpty) None
      else {
        val withParts = StructType(postingsSchema.fields ++ Seq(
          StructField("__bucket", IntegerType),
          StructField("event_date", DateType)))
        val postings = spark.read.option("basePath", pDir.toString)
          .schema(withParts).parquet(pFiles: _*)
        Some(postings
          .groupBy(col("__bucket"), col("prop"), col("value_str"))
          .agg(countDistinct(col("id")).as("customers"),
            sum(col("n_rows")).as("n_rows"))
          .select(col("prop"), col("value_str"), col("customers"),
            col("n_rows"), col("__bucket")))
      }
    }
    commitCounts(cat, table, staleBuckets, Set.empty, counts)
    writeSrcGen(srcGenFile(cat, table), want)
  }

  /** The committed index as a DataFrame — exactly the manifest's live file
    * set (snapshot-isolated like the events store). */
  private def read(spark: SparkSession, dir: String): DataFrame = {
    val withBucket = StructType(
      indexSchema.fields :+ StructField("__bucket", IntegerType))
    TableCommit.read(dir) match {
      case Some(c) if c.buckets.nonEmpty =>
        val files = c.buckets.toSeq.sortBy(_._1).flatMap { case (b, fs) =>
          fs.map(f => s"$dir/__bucket=$b/$f") }
        spark.read.option("basePath", dir).schema(withBucket).parquet(files: _*)
      case _ =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withBucket)
    }
  }

  /** Index-only distinct-customer counts for one property: per-bucket
    * partials sum exactly (buckets partition persons). Returns
    * `(value_str, customers, n_rows)` — one row per distinct value,
    * including the null group. */
  def valueCounts(index: DataFrame, prop: String): DataFrame =
    index.where(col("prop") === prop)
      .groupBy(col("value_str"))
      .agg(sum(col("customers")).as("customers"),
        sum(col("n_rows")).as("n_rows"))
}
