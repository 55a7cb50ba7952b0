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
  * bucket, a fingerprint of the events manifest's live file list for that
  * bucket. [[ensure]] diffs fingerprints against the CURRENT commit and
  * recomputes only the buckets whose files changed (the same touched-bucket
  * discipline as ingest itself — at 100 TB an insert touching 3 buckets
  * re-indexes 3/`storage_buckets` of the data). The index data dir carries
  * its own [[TableCommit]] manifest, so index readers get the identical
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

  /** Per-bucket fingerprint of the events store's live files (order-fixed),
    * plus the prop-list fingerprint a DDL change invalidates everything
    * through. */
  private def fingerprints(state: TableCommit.State): Map[Int, String] =
    state.buckets.map { case (b, fs) => b -> sha(fs.sorted.mkString("\n")) }

  private def propsFp(m: TableMeta): String =
    sha(indexableProps(m).mkString("\n"))

  private final case class SrcGen(propsFp: String, buckets: Map[Int, String])

  private def readSrcGen(f: java.io.File): Option[SrcGen] = {
    if (!f.isFile) return None
    try {
      val s = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      import org.json4s._
      implicit val fmts: Formats = DefaultFormats
      val j = org.json4s.jackson.JsonMethods.parse(s)
      val buckets = (j \ "buckets") match {
        case JObject(fields) => fields.map { case (k, v) =>
          k.toInt -> v.extract[String] }.toMap
        case _ => Map.empty[Int, String]
      }
      Some(SrcGen((j \ "props_fp").extract[String], buckets))
    } catch { case _: Exception => None }
  }

  private def writeSrcGen(f: java.io.File, g: SrcGen): Unit = {
    val buckets = g.buckets.toSeq.sortBy(_._1)
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
    val m = cat.describe(table)
    val eventsRoot = cat.eventsDir(table)
    val state = TableCommit.read(eventsRoot)
      .getOrElse(TableCommit.fromListing(eventsRoot))
    val want = SrcGen(propsFp(m), fingerprints(state))
    val dir = dataDir(cat, table)
    val have = readSrcGen(srcGenFile(cat, table))
    if (!have.contains(want)) {
      Fs.withWriteLock(indexRoot(cat, table).toString) {
        // re-read under the lock: a concurrent ensure may have done the work
        val have2 = readSrcGen(srcGenFile(cat, table))
        if (!have2.contains(want)) rebuild(spark, cat, table, m, state, want,
          // a props fingerprint change invalidates every bucket
          stale = if (have2.exists(_.propsFp == want.propsFp))
              want.buckets.filter { case (b, fp) =>
                !have2.exists(_.buckets.get(b).contains(fp)) }.keySet
            else want.buckets.keySet,
          dropped = have2.map(_.buckets.keySet.diff(want.buckets.keySet))
            .getOrElse(Set.empty))
      }
    }
    read(spark, dir.toString)
  }

  private def rebuild(spark: SparkSession, cat: Catalog, table: String,
                      m: TableMeta, state: TableCommit.State, want: SrcGen,
                      stale: Set[Int], dropped: Set[Int]): Unit = {
    val eventsRoot = cat.eventsDir(table)
    val dir = dataDir(cat, table)
    dir.mkdirs()
    val commit0 = TableCommit.read(dir.toString)
      .getOrElse(TableCommit.State(0L, Map.empty, Nil))
    val newBuckets = scala.collection.mutable.Map(commit0.buckets.toSeq: _*)
    val retiredNow = scala.collection.mutable.ArrayBuffer.empty[String]
    if (stale.nonEmpty) {
      // snapshot-consistent source: the SAME manifest the fingerprints came
      // from, as an explicit file list (a racing insert can't skew it)
      val files = state.buckets.toSeq.filter(p => stale(p._1))
        .sortBy(_._1).flatMap { case (b, fs) =>
          fs.map(f => s"$eventsRoot/__bucket=$b/$f") }
      if (files.nonEmpty) {
        // explicit schema: buckets written under older DDL epochs may lack
        // later-added prop columns — they read as nulls; __bucket (and any
        // event_date) come from the dir names via basePath
        val readSchema = StructType(
          m.eventsSchema.fields.map(_.copy(nullable = true)) :+
            StructField("__bucket", IntegerType))
        val events = spark.read.option("basePath", eventsRoot)
          .schema(readSchema).parquet(files: _*)
        val stage = new java.io.File(dir.getPath + "_stage")
        Fs.rmTree(stage)
        aggregate(events, indexableProps(m))
          .repartition(math.max(stale.size, 1), col("__bucket"))
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
      } else stale.foreach { b =>
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
