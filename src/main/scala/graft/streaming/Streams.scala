package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Segments

/** Streaming surface (SURVEY §2.9): ingest pipeline, on-insert segment
  * refresh, and enter/exit eventing.
  *
  * The reference's shape — HTTP JSON → WAL → per-partition drain →
  * grid upsert → on_insert segments → enter/exit messages to subscribers
  * (`src/rpc_insert.cpp`, `src/oloop_insert.cpp:166-183`,
  * `src/message_broker.h`) — maps to Structured Streaming `foreachBatch`:
  * append the micro-batch to the events table, re-evaluate flagged segments
  * for the touched customers only, diff membership, and append enter/exit
  * records to a subscriber-readable table.
  *
  * Storage is plain parquet directories (this container has no Delta):
  *   dir/events/          — the event log (append)
  *   dir/segments/<name>_v{g}/ + <name>.gen pointer — membership, one
  *     GENERATION per rewrite (rename-free; the retired generation is the
  *     reader grace window — round 15)
  *   dir/segment_events/  — enter/exit stream (append)
  *
  * Late/out-of-order data: the reference supports unbounded lateness via
  * merge-sort on stamp (`src/grid.cpp:1272-1368`); the equivalent here is
  * recompute-affected-customers per batch, not state-store watermarks
  * (SURVEY §2.9 "Watermarks: none").
  */
object Streams {

  /** A segment definition for on-insert refresh: given the touched subset of
    * the events table, return the member ids (`events => membership`). */
  type SegmentFn = DataFrame => DataFrame

  /** Start the ingest pipeline on a streaming events DataFrame
    * (same schema as the batch events table: id, stamp, event, …).
    *
    * Per micro-batch (all paths touch only the batch's customer ids):
    *  1. append to `dir/events`
    *  2. for each on-insert segment: recompute membership for touched ids
    *     over their FULL history, diff vs stored membership → enter/exit
    *  3. append enter/exit records to `dir/segment_events`, write the
    *     next membership generation and flip `segments/<name>.gen`
    */
  def startIngest(stream: DataFrame, dir: String, checkpoint: String,
                  onInsertSegments: Map[String, SegmentFn] = Map.empty,
                  trigger: Trigger = Trigger.ProcessingTime(0L),
                  afterBatch: () => Unit = () => (),
                  ingest: Option[DataFrame => Unit] = None,
                  history: Option[SparkSession => DataFrame] = None): StreamingQuery = {
    // Trigger.AvailableNow terminates once the data available AT START is
    // drained — use it for scheduled catch-up jobs, not live ingest.
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, dir, onInsertSegments, batchId, ingest, history)
        // post-batch hook: subscription push delivery rides here (the
        // reference broker notifies subscribers as messages enqueue,
        // src/message_broker.h:19-130)
        afterBatch()
        ()
      }
      .start()
  }

  /** The batch body of the ingest pipeline — also callable directly (the
    * reference's bulk `POST /v1/insert` path).
    *
    * `ingest`/`history` override WHERE batches land and where per-person
    * history is read back from. The defaults are the standalone streaming
    * layout (plain appends under `dir/events`); a CATALOG-managed table
    * must pass its own insert pipeline + committed read instead
    * ([[graft.Api.startIngest]] does) — a flat append next to a
    * manifest-committed store would be INVISIBLE to manifest reads, and
    * the catalog route additionally buys the streamed rows the bucketed
    * (exchange-free, sorted) layout and upsert/TTL semantics, exactly the
    * reference's insert consumer draining into the same table store
    * (src/oloop_insert.cpp:166-183). */
  def ingestBatch(batch: DataFrame, dir: String,
                  onInsertSegments: Map[String, SegmentFn], batchId: Long,
                  ingest: Option[DataFrame => Unit] = None,
                  history: Option[SparkSession => DataFrame] = None): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    ingest.getOrElse((b: DataFrame) =>
      b.write.mode("append").parquet(s"$dir/events"))(batch)

    if (onInsertSegments.nonEmpty) {
      val touched = batch.select("id").distinct().cache()
      val history0 = history.map(_(spark))
        .getOrElse(spark.read.parquet(s"$dir/events"))
      val historyTouched = history0
        .join(touched, Seq("id"), "left_semi")
      val nowMs = batch.agg(max(col("stamp"))).head().getLong(0)
      onInsertSegments.foreach { case (name, fn) =>
        // same writer lock as refreshSegments: the batch diff-and-rewrite
        // is a read-modify-write of the membership pointer
        graft.Fs.withWriteLock(s"$dir/segments/$name") {
          val newMembers = fn(historyTouched).select("id").distinct().cache()
          val prev = previousMembership(spark, dir, name, newMembers)
          val oldMembers = prev.join(touched, Seq("id"), "left_semi")
          val entered = newMembers.join(oldMembers, Seq("id"), "left_anti")
            .select(col("id"), lit(name).as("segment"), lit("entered").as("state"),
              lit(nowMs).as("stamp"), lit(batchId).as("batch_id"))
          val exited = oldMembers.join(newMembers, Seq("id"), "left_anti")
            .select(col("id"), lit(name).as("segment"), lit("exited").as("state"),
              lit(nowMs).as("stamp"), lit(batchId).as("batch_id"))
          val changes = entered.unionByName(exited)
          if (!changes.isEmpty)
            appendSegmentEvents(changes, dir)
          // new membership = (stored - touched exits) + entries. The
          // generational write reads the PREVIOUS generation while
          // writing the next — no staging copy, no overwrite of a dir a
          // reader (or this very plan) holds (round 15)
          val untouchedMembers = prev.join(touched, Seq("id"), "left_anti")
          writeMembership(spark, dir, name,
            untouchedMembers.unionByName(newMembers))
        }
      }
      touched.unpersist()
    }
  }

  /** Full segment refresh — the body of the reference's background refresh
    * loop (`src/oloop_seg_refresh.cpp`; `refresh=`/`ttl=` flags on
    * `@segment`). Recomputes each segment over the whole events table,
    * diffs against stored membership (enter/exit events appended), and
    * rewrites membership. Run it on the schedule the segment's `refresh`
    * flag dictates (e.g. from a cron'd batch job or Trigger.AvailableNow
    * stream). */
  def refreshSegments(spark: SparkSession, dir: String,
                      segments: Map[String, SegmentFn], nowMs: Long,
                      historyOverride: Option[SparkSession => DataFrame] = None): Unit = {
    // catalog-managed tables pass their committed view: a raw listing
    // over a manifest store would double-read retired-but-not-vacuumed
    // files (same contract as ingestBatch's history override)
    val history = historyOverride.map(_(spark))
      .getOrElse(spark.read.parquet(s"$dir/events"))
    segments.foreach { case (name, fn) =>
      // diff-then-rewrite holds the segment's writer lock: two refreshers
      // racing would otherwise diff against the same previous membership
      // and double-append enter/exit events
      graft.Fs.withWriteLock(s"$dir/segments/$name") {
        val newMembers = fn(history).select("id").distinct().cache()
        val prev = previousMembership(spark, dir, name, newMembers).cache()
        val entered = newMembers.join(prev, Seq("id"), "left_anti")
          .select(col("id"), lit(name).as("segment"), lit("entered").as("state"),
            lit(nowMs).as("stamp"), lit(-1L).as("batch_id"))
        val exited = prev.join(newMembers, Seq("id"), "left_anti")
          .select(col("id"), lit(name).as("segment"), lit("exited").as("state"),
            lit(nowMs).as("stamp"), lit(-1L).as("batch_id"))
        val changes = entered.unionByName(exited)
        if (!changes.isEmpty)
          appendSegmentEvents(changes, dir)
        // rename-free generational rewrite: a concurrent reader keeps the
        // files it planned (the old swap's rename broke them — round 15)
        writeMembership(spark, dir, name, newMembers)
        newMembers.unpersist(); prev.unpersist()
      }
    }
  }

  // ------------------------------------------ generational membership dirs
  /** Resolve a segment's CURRENT membership directory. Membership
    * rewrites are GENERATIONAL since round 15 (found live by the soak
    * spec: the old rename/overwrite swap broke concurrent readers with
    * FAILED_READ_FILE on files they had already planned): the pointer
    * file `segments/<name>.gen` names the live generation
    * (`<name>_v{g}`), each rewrite lands in the NEXT generation and
    * flips the pointer with one atomic file move, the just-retired
    * generation stays on disk as the reader grace window, and older ones
    * retire — the `TableCommit`/`AnnIndex` discipline. No pointer =
    * never refreshed (the bare legacy dir, recovered if a pre-round-15
    * swap crashed there). */
  def membershipDir(tableDir: String, name: String): String = {
    val gen = membershipGen(tableDir, name)
    if (gen == 0L) {
      val base = s"$tableDir/segments/$name"
      graft.Fs.recoverForRead(base)
      base
    } else s"$tableDir/segments/${name}_v$gen"
  }

  /** Current membership frame (PATH_NOT_FOUND when never refreshed —
    * callers that tolerate that check the dir first, like before). */
  def membership(spark: SparkSession, tableDir: String, name: String): DataFrame =
    spark.read.parquet(membershipDir(tableDir, name))

  private def membershipGen(tableDir: String, name: String): Long = {
    val p = new java.io.File(s"$tableDir/segments/$name.gen")
    if (!p.isFile) 0L
    else try new String(java.nio.file.Files.readAllBytes(p.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    catch { case _: Exception => 0L }
  }

  /** Rewrite a segment's membership rename-free: write generation g+1
    * beside the current one, flip the pointer atomically, retire
    * generations older than the just-retired g (the grace window).
    * Callers hold the segment's writer lock. */
  private def writeMembership(spark: SparkSession, tableDir: String,
                              name: String, members: DataFrame): Unit = {
    val cur = membershipGen(tableDir, name)
    val next = cur + 1
    members.write.mode("overwrite")
      .parquet(s"$tableDir/segments/${name}_v$next")
    val pf = new java.io.File(s"$tableDir/segments/$name.gen")
    val tmp = new java.io.File(pf.toString + "_tmp")
    java.nio.file.Files.write(tmp.toPath,
      next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, pf.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val re = s"${java.util.regex.Pattern.quote(name)}_v(\\d+)".r
    Option(new java.io.File(s"$tableDir/segments").listFiles)
      .getOrElse(Array.empty).foreach { f =>
        val g = f.getName match {
          case n if n == name => Some(0L) // the pre-generational bare dir
          case re(g0) => Some(g0.toLong)
          case _ => None
        }
        g.filter(_ < cur).foreach(_ => graft.Fs.rmTree(f))
      }
  }

  private def previousMembership(spark: SparkSession, tableDir: String,
                                 name: String,
                                 template: DataFrame): DataFrame = {
    val segDir = membershipDir(tableDir, name)
    if (!new java.io.File(segDir).isDirectory)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], template.schema)
    else spark.read.parquet(segDir).select("id")
  }

  /** Which segment definitions are due for a refresh, given each one's
    * `refresh=` flag (seconds or a time literal like `5_minutes`) and the
    * last refresh times — the driver loop the reference runs per table
    * (`src/table.cpp:104-126` segmentRefresh schedule). Segments without a
    * refresh flag never come due (on-demand / on_insert only). */
  def dueForRefresh(defs: Seq[graft.osl.Ast.SegmentDef],
                    lastRefreshMs: Map[String, Long],
                    nowMs: Long): Seq[graft.osl.Ast.SegmentDef] =
    defs.filter { d =>
      d.flags.get("refresh").exists { v =>
        // the lexer tags values that came from time literals (5_minutes)
        // with an explicit `ms` suffix; bare numbers mean SECONDS (the
        // reference's default is 86400 = daily, table.h:42).
        val intervalMs =
          if (v.endsWith("ms")) v.dropRight(2).toDouble.toLong
          else v.toDouble.toLong * 1000L
        intervalMs > 0 &&
          nowMs - lastRefreshMs.getOrElse(d.name, Long.MinValue / 2) >= intervalMs
      }
    }

  /** Current enter/exit event log (the subscriber view —
    * `src/rpc_sub.cpp:274-411`'s queue equivalent).
    *
    * Round 15 (found by the soak spec): the log's FIRST append exposes a
    * window where the directory exists but holds no committed parquet
    * yet (only `_temporary`) — schema inference fails there on every
    * retry, yet semantically it is an EMPTY feed (cursor untouched, the
    * rows deliver on the next cycle once committed), exactly like the
    * missing-directory state the callers already map to empty. A
    * mid-compaction swap recovers first, as before. */
  def segmentEvents(spark: SparkSession, dir: String): DataFrame = {
    val log = s"$dir/segment_events"
    graft.Fs.recoverForRead(log)
    val committed = Option(new java.io.File(log).listFiles)
      .exists(_.exists(_.getName.endsWith(".parquet")))
    if (committed) spark.read.parquet(log)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("segment",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("state",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("stamp",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("batch_id",
          org.apache.spark.sql.types.LongType))))
  }

  /** All appenders to the enter/exit log funnel through the log's own
    * writer lock: the ingest batch and the refresh loop already hold a
    * PER-SEGMENT lock, so two different segments could otherwise append
    * concurrently with a [[compactSegmentEvents]] swap in flight. */
  private def appendSegmentEvents(changes: DataFrame, dir: String): Unit =
    graft.Fs.withWriteLock(s"$dir/segment_events") {
      changes.write.mode("append").parquet(s"$dir/segment_events")
    }

  /** Compact the append-only enter/exit log — the streaming path's
    * small-file maintenance: every ingest batch and refresh appends one
    * part file, and at production batch cadence a week is thousands of
    * KB-sized files, each a listing + open cost for every poll. When the
    * log holds at least `minFiles` part files, rewrite it as one
    * (stamp, id)-sorted file via the crash-safe swap (readers between the
    * two renames recover through `Fs.recoverForRead`, the same discipline
    * the membership dirs use). Cursor semantics are untouched: a
    * subscription cursor is a (stamp, id) watermark, not a file offset, so
    * polls and push drains see the identical feed before and after.
    * Returns the number of files compacted (0 = below threshold).
    * [[graft.Api.segmentRefresh]] runs it after every refresh cycle. */
  def compactSegmentEvents(spark: SparkSession, dir: String,
                           minFiles: Int = 8): Long = {
    val log = new java.io.File(s"$dir/segment_events")
    if (!log.isDirectory) return 0L
    graft.Fs.withWriteLock(log.toString) {
      val parts = Option(log.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      if (parts.length < minFiles) 0L
      else {
        val compacted = spark.read.parquet(log.toString)
          .orderBy(col("stamp"), col("id"))
          .coalesce(1)
        graft.Fs.swapInto(log.toString)(tmp =>
          compacted.write.mode("overwrite").parquet(tmp))
        parts.length.toLong
      }
    }
  }

  /** Streaming exact dedup: drop rows whose key was already seen within the
    * watermark delay. State is bounded by the watermark (old keys age out of
    * the store), which is the only shape that survives an unbounded stream —
    * the batch analog is `Dedup.exactDedup`. Dedup ingestion feeds use
    * `md5(text)` (or the insert row-hash) as the key. */
  def dedupStream(stream: DataFrame, keyCols: Seq[String],
                  tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** One tracked funnel per person: how far the person has advanced and the
    * first/last matched stamps. Small and fixed-size — the state store
    * carries O(active persons), not their event history. */
  final case class FunnelProgress(step: Int, firstStamp: Long, lastStamp: Long)

  /** A completed funnel: the person, the anchor step's stamp, the final
    * step's stamp. */
  final case class FunnelCompletion(id: String, startStamp: Long, endStamp: Long)

  /** Incremental funnel over a live stream — the streaming counterpart of
    * `EventOps.funnelN` (same strictly-after, within-window advance rule):
    * per person, advance one tracked funnel through `steps`, emit a
    * completion record when the last step lands, then re-arm.
    *
    * `flatMapGroupsWithState` with an event-time timeout keeps state
    * BOUNDED: a funnel that stalls past `withinMs` behind the watermark is
    * dropped on timeout, so the store holds only in-flight funnels — the
    * only shape that survives an unbounded stream. Rows inside a
    * micro-batch process in stamp order; cross-batch late data older than
    * the watermark is ignored (the batch engine remains the
    * unbounded-lateness path, SURVEY §2.9 divergence note). */
  def funnelStream(stream: DataFrame, steps: Seq[String], withinMs: Long,
                   watermark: String = "1 hour"): org.apache.spark.sql.Dataset[FunnelCompletion] = {
    require(steps.size >= 2, "funnel needs at least 2 steps")
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // the watermark column must survive into the stateful operator, so it
    // rides along as the tuple's 4th field
    val typed = stream
      .withColumn("__ts", timestamp_millis(col("stamp")))
      .withWatermark("__ts", watermark)
      .select(col("id").cast("string").as("_1"), col("stamp").cast("long").as("_2"),
        col("event").cast("string").as("_3"), col("__ts").as("_4"))
      .as[(String, Long, String, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelProgress, FunnelCompletion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (id: String, rows: Iterator[(String, Long, String, java.sql.Timestamp)],
         state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) { // stalled past the window: drop the funnel
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelProgress(0, 0L, 0L))
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelCompletion]
            rows.toArray.sortBy(_._2).foreach { case (_, stamp, event, _) =>
              // anchor: the FIRST step-0 event arms the funnel (funnelN's
              // min(step_0)); later step-0 events don't re-anchor
              if (st.step == 0) {
                if (event == steps.head) st = FunnelProgress(1, stamp, stamp)
              } else if (event == steps(st.step) &&
                  stamp > st.lastStamp && stamp - st.lastStamp <= withinMs) {
                st = st.copy(step = st.step + 1, lastStamp = stamp)
                if (st.step == steps.size) {
                  out += FunnelCompletion(id, st.firstStamp, stamp)
                  st = FunnelProgress(0, 0L, 0L) // re-arm
                }
              }
            }
            if (st.step == 0) state.remove()
            else {
              state.update(st)
              // expire when no advance can arrive inside the window anymore;
              // clamped above the watermark (setting at-or-behind it throws)
              state.setTimeoutTimestamp(
                math.max(st.lastStamp + withinMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Per-LSH-bucket streaming state: the first document that claimed the
    * bucket (its id doubles as the near-dup representative) and its stamp. */
  final case class BucketState(firstId: Long, firstStamp: Long)

  /** An incremental near-dup match: `doc_id` collided with the bucket that
    * `dup_of` claimed first, on `band`. */
  final case class NearDupMatch(doc_id: Long, dup_of: Long, band: Int)

  /** Streaming near-dup detection — the incremental form of
    * [[graft.operators.Dedup.minhashStarEdges]]: each arriving document's
    * MinHash band signatures probe per-bucket state; the first document to
    * claim a bucket becomes its representative, and every later arrival in
    * that bucket emits a `(doc, representative, band)` star edge. Batch and
    * stream thus build the SAME edge structure (first-seen rep instead of
    * min-id rep — the arrival-order analogue).
    *
    * State is one (firstId, stamp) pair per live bucket, expired
    * `retentionMs` behind the watermark by event-time timeout — bounded the
    * only way an unbounded stream allows, exactly like the funnel state
    * above. A doc colliding on k bands emits k matches; consumers that want
    * one verdict per doc take any (they all name a prior near-dup). */
  /** Maintain a persisted ANN index ([[graft.operators.AnnIndex]]) from a
    * vector stream `(vec_id, embedding)`: each micro-batch appends its NEW
    * vectors against the stored centroids — the anti-join on `vec_id`
    * makes a replayed batch a no-op, so the at-least-once `foreachBatch`
    * contract yields exactly-once index contents. The index must already
    * exist (`AnnIndex.buildIvf`); dim drift in the stream fails the batch
    * loudly rather than mixing embedding spaces. Pair with
    * [[startIngest]]'s afterBatch hook or run standalone — the same
    * discipline keeps the MinHash [[graft.operators.TextIndex]] current
    * (`TextIndex.append` in place of `AnnIndex.appendIvf`).
    *
    * Each append writes one small parquet file per touched cell, so at
    * micro-batch cadence the cells directory degrades into a small-file
    * field that erodes the pruned-scan win; `compactAt` bounds it — once
    * the current generation holds that many files, the batch also folds
    * them back to one file per cell (`AnnIndex.compact`, a rename-free
    * generation swap that concurrent searches ride through). */
  def annIndexStream(stream: DataFrame, path: String, checkpoint: String,
                     trigger: Trigger = Trigger.ProcessingTime(0L),
                     compactAt: Int = 256)
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.AnnIndex.appendIvf(batch, path)
          graft.operators.AnnIndex.maybeCompact(batch.sparkSession, path, compactAt)
        }
      }
      .start()

  def nearDupStream(stream: DataFrame, bands: Int = 4, rows: Int = 4,
                    watermark: String = "1 hour",
                    retentionMs: Long = 24L * 3600 * 1000)
      : org.apache.spark.sql.Dataset[NearDupMatch] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val sigUdf = udf(graft.operators.Dedup.bandSigKernel(bands, rows))
    val typed = stream
      .withColumn("__ts", timestamp_millis(col("stamp")))
      .withWatermark("__ts", watermark)
      .select(col("doc_id").cast("long").as("_1"), col("stamp").cast("long").as("_2"),
        explode(sigUdf(col("text"))).as("__b"), col("__ts").as("_4"))
      .select(col("_1"), col("_2"),
        concat_ws(":", col("__b._1"), col("__b._2")).as("_3"), col("_4"))
      .as[(Long, Long, String, java.sql.Timestamp)]
    typed.groupByKey(_._3)
      .flatMapGroupsWithState[BucketState, NearDupMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows0: Iterator[(Long, Long, String, java.sql.Timestamp)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val band = key.takeWhile(_ != ':').toInt
            // deterministic within a micro-batch: stamp then id order
            val sorted = rows0.toArray.sortBy(r => (r._2, r._1))
            var st = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupMatch]
            sorted.foreach { case (docId, stamp, _, _) =>
              if (st == null) st = BucketState(docId, stamp)
              else if (docId != st.firstId) out += NearDupMatch(docId, st.firstId, band)
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(
              sorted.last._2 + retentionMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Windowed corpus-drift monitor — the streaming deployment of
    * [[graft.operators.Sampling.groupDriftKL]]: per event-time window and
    * group, the KL divergence (bits) of the window's hashed-unigram token
    * distribution from a FIXED reference model
    * ([[graft.operators.Sampling.bucketModel]] over the accepted baseline
    * corpus, held in the closure like any broadcast side). A source whose
    * live text drifts from the baseline mix shows a rising curve within a
    * watermark delay.
    *
    * One streaming aggregation: tokens hash in-row (compiled kernel), and
    * a typed Aggregator buffers the buckets-sized count vector per open
    * (window, group) cell — state is O(open windows × groups × buckets),
    * never O(tokens). The finish pass applies the same smoothed
    * full-domain formula as the batch operator — but double-summed, not
    * the batch path's 8-decimal DECIMAL(28,8) recipe, so the two can
    * differ in the low decimals (the spec checks against an independent
    * double-precision computation, not against groupDriftKL's hash). */
  def driftStream(stream: DataFrame, groupCol: String, textCol: String,
                  tsCol: String, reference: Array[Double],
                  windowDur: String = "10 minutes",
                  watermark: String = "1 hour"): DataFrame = {
    val buckets = reference.length
    require(buckets > 0, "empty reference model")
    val klAgg = org.apache.spark.sql.functions.udaf(new KlAggregator(reference))
    stream
      .withWatermark(tsCol, watermark)
      .select(col(tsCol).as("__ts"), col(groupCol).as("group"),
        explode(graft.operators.TextOps.tokenBucketsKernel(buckets)(col(textCol)))
          .as("b"))
      .groupBy(window(col("__ts"), windowDur), col("group"))
      .agg(count(lit(1)).as("n_tokens"), klAgg(col("b")).as("kl_bits"))
  }

  /** Bucket-count KL aggregator for [[driftStream]]: buffer = the
    * buckets-sized count vector; finish = full-domain smoothed
    * `Σ_b p_b · log2(p_b / q_b)` against the reference probabilities. */
  private final class KlAggregator(reference: Array[Double])
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Double] {
    private val b = reference.length
    def zero: Array[Long] = new Array[Long](b)
    def reduce(buf: Array[Long], bucket: Long): Array[Long] = {
      buf(bucket.toInt) += 1; buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b) { x(i) += y(i); i += 1 }
      x
    }
    def finish(buf: Array[Long]): Double = {
      var n = 0L
      var i = 0
      while (i < b) { n += buf(i); i += 1 }
      var kl = 0.0
      i = 0
      while (i < b) {
        val p = (buf(i) + 1).toDouble / (n + b)
        kl += p * (math.log(p / reference(i)) / math.log(2.0))
        i += 1
      }
      kl
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** Streaming sessionization with the built-in session_window — tumbling
    * gap-based sessions over event time (SURVEY §2.9 "Windows"). */
  def sessionCounts(stream: DataFrame, gap: String = "30 minutes",
                    watermark: String = "1 hour"): DataFrame = {
    stream
      .withColumn("ts", timestamp_millis(col("stamp")))
      .withWatermark("ts", watermark)
      .groupBy(col("id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
  }
}
