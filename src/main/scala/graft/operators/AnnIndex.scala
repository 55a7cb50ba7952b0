package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index — the IVF cell table and PQ codebooks/codes as
  * durable storage artifacts instead of per-session caches.
  *
  * [[Similarity.ivfAssign]]/[[Similarity.pqCodebooks]] memoize per
  * (session, corpus-plan) — the reference analogue builds its index at
  * ingest and answers every query from it (`src/attributes.h`), which the
  * memo replicates only within one session: a fresh session (or a corpus
  * that grew) re-pays the full build scan. This object completes the story
  * across sessions, exactly like [[TextIndex]] does for MinHash
  * signatures: [[buildIvf]]/[[buildPq]] write the index once,
  * [[appendIvf]]/[[appendPq]] maintain it incrementally as new vectors
  * arrive (anti-join on `vec_id` — re-sending an indexed vector is a
  * no-op), and the search entry points answer from the store without ever
  * rescanning indexed vectors.
  *
  * Storage shape (the faiss IVF-flat / PQ layout on parquet):
  *  - `path/meta`       one row: (kind, dim, nlist, m, ksub) — appends and
  *    reads validate against it (a dim change means a different embedding
  *    model: fail loudly, never silently mix spaces).
  *  - `path/centroids`  (cid, vec) — nlist rows, collected + broadcast.
  *  - `path/cells`      (vec_id, e) partitioned by `cell` — the inverted
  *    lists. A search reads ONLY the probed cells (partition pruning), so
  *    at 100 TB a query touches nprobe/nlist of the corpus bytes and the
  *    build cost is paid once, not per session.
  *  - `path/books`      (s, c, vec) — m·ksub codeword rows.
  *  - `path/codes`      (vec_id, code) partitioned by `idb` (id-hash
  *    bucket) — 4-int codes, the only thing a PQ search scans; appends
  *    dedup against only the buckets their ids hash into.
  *
  * Appends assign/encode NEW vectors against the STORED
  * centroids/codebooks (no retrain — the faiss discipline; recall drifts
  * only if the data distribution does, and a rebuild is an explicit
  * [[buildIvf]]). Search results are bit-identical to the session-memoized
  * path on the same corpus: both run the same [[Similarity.ivfSearch]] /
  * [[Similarity.pqSearch]] cores. */
object AnnIndex {

  private def asDouble(c: org.apache.spark.sql.Column) = c.cast("array<double>")

  // ------------------------------------------------------------------- meta
  private case class Meta(kind: String, dim: Int, nlist: Int, m: Int,
                          ksub: Int, fp: Long, nb: Int, gen: Long) {
    /** Base name of the generation-current data dir ("cells" for IVF,
      * "codes" for PQ). */
    def dataBase: String = if (kind == "ivf") "cells" else "codes"
    def partCol: String = if (kind == "ivf") "cell" else "idb"
  }

  /** Data dirs are generation-versioned so [[compact]] can swap in a
    * rewritten copy WITHOUT renaming or deleting files a concurrent reader
    * may have planned (the rename-free discipline of `TableCommit`): a new
    * generation is written beside the old one, the meta row flips to it,
    * and only generations older than the just-retired one are removed —
    * the previous generation stays on disk as the grace window. */
  private def dataDir(path: String, base: String, gen: Long): String =
    if (gen == 0L) s"$path/$base" else s"$path/${base}_v$gen"

  private def currentData(path: String, meta: Meta): String =
    dataDir(path, meta.dataBase, meta.gen)

  private def writeMeta(spark: SparkSession, path: String, meta: Meta): Unit = {
    val prev = metaDirStamp(path)
    // ONE properties file flipped with an atomic move — the meta used to
    // be a parquet dir OVERWRITTEN in place, which exposed a footerless
    // window to concurrent readers (round-15 ANN soak caught it live:
    // UNABLE_TO_INFER_SCHEMA mid-maintenance). The membership-pointer
    // discipline applies: write beside, move atomically, never delete a
    // state a reader may be mid-read of (a legacy parquet meta dir is
    // left in place; the file wins resolution).
    val f = new java.io.File(s"$path/meta.properties")
    f.getParentFile.mkdirs()
    val p = new java.util.Properties
    p.setProperty("kind", meta.kind)
    p.setProperty("dim", meta.dim.toString)
    p.setProperty("nlist", meta.nlist.toString)
    p.setProperty("m", meta.m.toString)
    p.setProperty("ksub", meta.ksub.toString)
    p.setProperty("fp", meta.fp.toString)
    p.setProperty("nb", meta.nb.toString)
    p.setProperty("gen", meta.gen.toString)
    val tmp = new java.io.File(f.toString + "_tmp")
    val out = new java.io.FileOutputStream(tmp)
    try p.store(out, null) finally out.close()
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // the store cache trusts an unchanged meta mtime stamp; force it
    // strictly past the previous version's so a same-millisecond rewrite
    // can never serve the old model (Catalog.writeMeta's discipline)
    if (metaDirStamp(path) <= prev) f.setLastModified(prev + 1): Unit
  }

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val f = new java.io.File(s"$path/meta.properties")
    if (f.isFile) {
      val p = new java.util.Properties
      val in = new java.io.FileInputStream(f)
      try p.load(in) finally in.close()
      Meta(p.getProperty("kind"), p.getProperty("dim").toInt,
        p.getProperty("nlist").toInt, p.getProperty("m").toInt,
        p.getProperty("ksub").toInt, p.getProperty("fp").toLong,
        p.getProperty("nb").toInt, p.getProperty("gen").toLong)
    } else {
      // legacy parquet meta (pre-round-15 store): readable, and the next
      // writeMeta flips it to the properties file
      val df = spark.read.parquet(s"$path/meta")
      require(df.columns.contains("gen"),
        s"index at $path predates the generational layout — rebuild it")
      val r = df.head()
      Meta(r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getLong(5), r.getInt(6), r.getLong(7))
    }
  }

  /** Fingerprint of the corpus' resolved file listing (0 for in-memory
    * frames — those can change without a listing change, so they never
    * count as "current"). Lets [[buildIvfIfStale]]/[[buildPqIfStale]]
    * skip a rebuild when the index already matches the data — the commit
    * protocol never rewrites a data file in place, so an unchanged
    * listing means unchanged bytes. */
  private def corpusFp(corpus: DataFrame): Long = {
    // a CACHED corpus hides its files from Dataset.inputFiles
    // (InMemoryRelation is a leaf node) — which made every warm query
    // treat the index as never-current and pay a full no-op append cycle
    // (round 15, found by JobAudit: 16 of q_ann_ivf_indexed's 27 driver
    // jobs). Resolve the listing through the cached plan's file scans.
    val direct = corpus.inputFiles
    val files =
      if (direct.nonEmpty) direct
      else corpus.queryExecution.optimizedPlan.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          m.cacheBuilder.cachedPlan.collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.relation.location.inputFiles.toSeq
          }.flatten
      }.flatten.toArray
    if (files.isEmpty) 0L
    else files.sorted.foldLeft(1125899906842597L)((h, f) => h * 31 + f.hashCode)
  }

  private def metaIfAny(spark: SparkSession, path: String): Option[Meta] =
    try Some(cachedMeta(spark, path))
    catch {
      case _: org.apache.spark.sql.AnalysisException => None // no index yet
      case _: IllegalArgumentException => None // pre-`nb` layout: rebuild
    }

  /** The meta row, cached by the meta dir's mtime stamp like the model —
    * the "is the index current?" check a query server runs per query must
    * not cost two Spark jobs (schema infer + head) every time (round 15,
    * directive #2). Every build/append/compact rewrites the meta, so the
    * stamp always moves with the row. */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Meta)]

  private def cachedMeta(spark: SparkSession, path: String): Meta = {
    val stamp = metaDirStamp(path)
    val hit = metaCache.get(path)
    if (hit != null && hit._1 == stamp) return hit._2
    val meta = readMeta(spark, path)
    metaCache.put(path, (stamp, meta))
    meta
  }

  /** The generation-current data table read with a stamp-cached SCHEMA —
    * parquet schema inference is a Spark job per read, and the cells/codes
    * schema is fixed by the layout; the file listing itself stays live
    * (appends land new files without a meta bump, and partition discovery
    * is driver-side). */
  private val dataSchemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, org.apache.spark.sql.types.StructType)]

  private def readData(spark: SparkSession, path: String,
                       meta: Meta): DataFrame = {
    val dir = currentData(path, meta)
    val stamp = metaDirStamp(path)
    val hit = dataSchemaCache.get(path)
    val schema =
      if (hit != null && hit._1 == stamp) hit._2
      else {
        val s = spark.read.parquet(dir).schema
        dataSchemaCache.put(path, (stamp, s))
        s
      }
    spark.read.schema(schema).parquet(dir)
  }

  /** (meta-dir mtime stamp, meta, centroids-or-books) per index path: the
    * meta row and the broadcast-side model (nlist centroids / m·ksub
    * codewords) are tiny but cost a Spark job each to load — a query
    * server answering from the store shouldn't re-collect them per query.
    * Validity is the meta dir's newest mtime: every build AND IfStale
    * append rewrites the meta (fp changes), so model changes always bump
    * the stamp; a stale hit can only ever serve the model that produced
    * bit-identical results before the rewrite. */
  private val storeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Meta, AnyRef)]

  private def metaDirStamp(path: String): Long = {
    val f = new java.io.File(s"$path/meta.properties")
    val d = new java.io.File(s"$path/meta")
    val legacy = Option(d.listFiles).map(_.foldLeft(d.lastModified)((m, x) =>
      math.max(m, x.lastModified))).getOrElse(d.lastModified)
    math.max(f.lastModified, legacy)
  }

  private def cachedModel(spark: SparkSession, path: String, kind: String)
                         (load: Meta => AnyRef): (Meta, AnyRef) = {
    val stamp = metaDirStamp(path)
    val hit = storeCache.get(path)
    if (hit != null && hit._1 == stamp) {
      require(hit._2.kind == kind, s"index at $path is ${hit._2.kind}, not $kind")
      return (hit._2, hit._3)
    }
    val meta = cachedMeta(spark, path)
    // kind gates BEFORE the model load: reading an IVF store through the
    // PQ entry point must fail the contract check, not a missing-path read
    require(meta.kind == kind, s"index at $path is ${meta.kind}, not $kind")
    val model = load(meta)
    storeCache.put(path, (stamp, meta, model))
    (meta, model)
  }

  /** Ensure the IVF index covers this corpus, doing the least work that
    * gets there: no index (or different params/dim) → full build; same
    * corpus listing → no-op; a GROWN corpus → [[appendIvf]] of the new
    * vectors against the stored centroids (the anti-join skips
    * already-indexed ids), never a rebuild. The idempotent entry point
    * for "ensure indexed" call sites — an ingest pipeline calls this
    * after every commit and pays one pass over the new vectors plus a
    * cell-pruned id-column dedup scan, never a corpus rescan. */
  def buildIvfIfStale(corpus: DataFrame, path: String, nlist: Int = 16,
                      compactAt: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val fp = corpusFp(corpus)
    metaIfAny(spark, path) match {
      case Some(m) if m.kind == "ivf" && m.nlist == nlist &&
          fp != 0L && m.fp == fp => () // current
      case Some(m) if m.kind == "ivf" && m.nlist == nlist &&
          m.dim == dimOf(corpus) =>
        appendIvf(corpus, path)
        writeMeta(spark, path, m.copy(fp = fp))
        maybeCompact(spark, path, compactAt)
      case _ => buildIvf(corpus, path, nlist)
    }
  }

  /** PQ twin of [[buildIvfIfStale]]: build, no-op, or append-only. */
  def buildPqIfStale(corpus: DataFrame, path: String, m: Int = 4,
                     ksub: Int = 16, compactAt: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val fp = corpusFp(corpus)
    metaIfAny(spark, path) match {
      case Some(mt) if mt.kind == "pq" && mt.m == m && mt.ksub == ksub &&
          fp != 0L && mt.fp == fp => () // current
      case Some(mt) if mt.kind == "pq" && mt.m == m && mt.ksub == ksub &&
          mt.dim == dimOf(corpus) =>
        appendPq(corpus, path)
        writeMeta(spark, path, mt.copy(fp = fp))
        maybeCompact(spark, path, compactAt)
      case _ => buildPq(corpus, path, m, ksub)
    }
  }

  private def dimOf(vecs: DataFrame): Int =
    vecs.select(size(col("embedding"))).head().getInt(0)

  private def checkDim(meta: Meta, vecs: DataFrame): Unit = {
    val d = dimOf(vecs)
    require(d == meta.dim,
      s"embedding dim $d does not match the index (dim ${meta.dim}) — " +
        "a different embedding space needs a rebuild, not an append")
  }

  // -------------------------------------------------------------------- IVF
  /** Build (or rebuild) the IVF index: centroids via the same deterministic
    * strided seeding as [[Similarity.ivfAssign]], corpus written as
    * cell-partitioned inverted lists. */
  def buildIvf(corpus: DataFrame, path: String, nlist: Int = 16): Unit = {
    val spark = corpus.sparkSession
    val (assigned, centroids) = Similarity.ivfAssign(corpus, nlist)
    import spark.implicits._
    // REBUILD-over-existing lands in the NEXT generation (round 14,
    // ADVICE r13): data and model dirs a concurrent reader may have
    // planned against are never overwritten in place — the new
    // generation is written first, the meta flips to it last (the
    // cutover), and generations older than the just-retired one reclaim
    // under the same grace window [[compact]] uses. A fresh path builds
    // straight into gen 0.
    val prevMeta = metaIfAny(spark, path)
    val gen = prevMeta.map(_.gen + 1).getOrElse(0L)
    centroids.toSeq.toDF("cid", "vec")
      .coalesce(1).write.mode("overwrite")
      .parquet(dataDir(path, "centroids", gen))
    assigned.select(col("vec_id"), col("e"), col("cell"))
      .write.partitionBy("cell").mode("overwrite")
      .parquet(dataDir(path, "cells", gen))
    writeMeta(spark, path,
      Meta("ivf", dimOf(corpus), nlist, 0, 0, corpusFp(corpus), 0, gen))
    prevMeta.foreach { pm =>
      val pg = pm.gen
      dropOldGenerations(spark, path, "cells", keepFrom = pg)
      // the model's grace dir is the one a prev-meta reader RESOLVES
      // (highest model gen ≤ the retired meta gen), not the meta gen
      // itself — compactions bump meta without rewriting the model
      dropOldGenerations(spark, path, "centroids",
        keepFrom = modelGen(spark, path, "centroids", pg))
      // kind REPURPOSING (ivf over a pq store — round 15, ADVICE r14): a
      // concurrent pq reader may still hold files it planned under the
      // previous meta — its codes/books generations retire under the
      // SAME grace window as a same-kind rebuild, not immediately. They
      // reclaim fully one maintenance cycle later: the next build or
      // compact over the (now-ivf) store sees prev.kind == "ivf" and
      // deletes every pq generation (no reader can hold them by then).
      val (codesKeep, booksKeep) =
        if (pm.kind == "pq") (pg, modelGen(spark, path, "books", pg))
        else (Long.MaxValue, Long.MaxValue)
      dropOldGenerations(spark, path, "codes", keepFrom = codesKeep)
      dropOldGenerations(spark, path, "books", keepFrom = booksKeep)
    }
  }

  /** The model dir (centroids/books) for this meta generation: rebuilds
    * write the model at the SAME generation as the data, while
    * [[compact]] bumps the data generation without touching the model —
    * so the current model is the highest-numbered dir ≤ meta.gen. The
    * cap also closes the rebuild race: a reader holding the OLD meta
    * never resolves the in-flight new model. Bare dirs read as gen 0
    * (pre-round-14 stores). */
  private def modelGen(spark: SparkSession, path: String, base: String,
                       maxGen: Long): Long = {
    val re = s"${base}_v(\\d+)".r
    val (fsys, p) = hadoopFs(spark, path)
    val gens =
      if (!fsys.exists(p)) Seq(0L)
      else fsys.listStatus(p).toSeq.flatMap(_.getPath.getName match {
        case `base` => Some(0L)
        case re(g) => Some(g.toLong)
        case _ => None
      }).filter(_ <= maxGen)
    if (gens.isEmpty) 0L else gens.max
  }

  private def modelDir(spark: SparkSession, path: String, base: String,
                       maxGen: Long): String =
    dataDir(path, base, modelGen(spark, path, base, maxGen))

  private def storedCentroids(spark: SparkSession, path: String, meta: Meta)
      : Array[(Long, Array[Double])] =
    spark.read.parquet(modelDir(spark, path, "centroids", meta.gen)).collect()
      .map(r => (r.getAs[Long]("cid"), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Incrementally index new vectors: assign against the STORED centroids,
    * append into their cell partitions; vectors already indexed (by
    * `vec_id`) are skipped. The dedup never rescans the whole corpus:
    * new vectors are assigned to cells FIRST (one pass over the batch vs
    * the broadcast centroids), and the anti-join reads only the `vec_id`
    * column of the cells the batch lands in — a `cell IN (touched)`
    * partition filter, the same pruning discipline [[ivfTopK]] uses. A
    * batch of b vectors touches ≤ min(b, nlist) cells, so the per-append
    * cost is the batch plus that slice of the id column, not the corpus;
    * with a corpus-sized nlist (the faiss √N discipline) a micro-batch
    * append is effectively O(new). Pruned dedup is exact because ids are
    * immutable keys: a re-sent `vec_id` carries the same embedding, and
    * the same embedding lands in the same cell under the stored centroids
    * — re-sending an id with a DIFFERENT embedding is a contract
    * violation (an update needs a rebuild, like any index retrain). */
  def appendIvf(newVecs: DataFrame, path: String): Unit = {
    val (frame, touched) = ivfAppendFrame(newVecs, path)
    if (touched.nonEmpty) {
      val meta = cachedMeta(newVecs.sparkSession, path)
      frame.write.partitionBy("cell").mode("append")
        .parquet(currentData(path, meta))
    }
  }

  /** The deduped, cell-assigned frame an IVF append writes, plus the cells
    * it touches — split from [[appendIvf]] so specs can pin the dedup
    * scan's `PartitionFilters` (the O(new-not-corpus) evidence). */
  private[graft] def ivfAppendFrame(newVecs: DataFrame,
                                    path: String): (DataFrame, Array[Long]) = {
    val spark = newVecs.sparkSession
    val meta = cachedMeta(spark, path)
    require(meta.kind == "ivf", s"index at $path is ${meta.kind}, not ivf")
    checkDim(meta, newVecs)
    val centroids = storedCentroids(spark, path, meta)
    val assigned = newVecs
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("cell", Similarity.nearestCentroid(col("e"), centroids, 1)(0))
    val touched = assigned.select("cell").distinct().collect().map(_.getLong(0))
    val existing = readData(spark, path, meta)
      .where(col("cell").isin(touched: _*)).select("vec_id")
    (assigned.join(existing, Seq("vec_id"), "left_anti"), touched)
  }

  /** IVF top-k answered from the store: centroids collected (tiny), probe
    * cells computed per query, and the cell scan prunes STATICALLY to the
    * probed partitions — the query side is small by contract (it
    * broadcasts in the search core), so collecting its distinct probe
    * cells first is one tiny job, and the resulting `cell IN (...)`
    * filter reaches the parquet scan as a partition filter: a query
    * touches nprobe/nlist of the corpus bytes by construction, not by
    * optimizer luck. Bit-identical ranking to [[Similarity.ivfTopK]] over
    * the same indexed corpus (the filter only drops cells no query
    * probes). */
  def ivfTopK(spark: SparkSession, path: String, queries: DataFrame, k: Int,
              nprobe: Int = 4): DataFrame = {
    val (meta, model) = cachedModel(spark, path, "ivf")(m => storedCentroids(spark, path, m))
    val centroids = model.asInstanceOf[Array[(Long, Array[Double])]]
    val probed = queries
      .select(explode(Similarity.nearestCentroid(
        asDouble(col("embedding")), centroids, nprobe)).as("cell"))
      .distinct().collect().map(_.getLong(0))
    val assigned = readData(spark, path, meta)
      .where(col("cell").isin(probed: _*))
    Similarity.ivfSearch(assigned, centroids, queries, k, nprobe)
  }

  // --------------------------------------------------------------------- PQ
  /** Deterministic id→bucket for the codes layout: Murmur3 of the id,
    * folded non-negative. Stable across JVMs/sessions (Spark's `hash`),
    * so an append computes the same buckets the build wrote. */
  private def idBucket(idCol: org.apache.spark.sql.Column, nb: Int) =
    pmod(hash(idCol), lit(nb))

  /** Build (or rebuild) the PQ index: codebooks via the same deterministic
    * strided sampling as [[Similarity.pqCodebooks]], corpus stored as
    * m-int codes partitioned by an id-hash bucket `idb` — a search scans
    * every code (ADC is a full-codes pass by design, `idb` doesn't change
    * that), but an append's dedup prunes to the buckets the new ids hash
    * into instead of scanning the whole id column. `nb` trades layout
    * granularity for prune factor; size it ≥ the expected micro-batch
    * row count so each append touches ~1 bucket per new id. */
  def buildPq(corpus: DataFrame, path: String, m: Int = 4, ksub: Int = 16,
              nb: Int = 32): Unit = {
    val spark = corpus.sparkSession
    val books = Similarity.pqCodebooks(corpus, m, ksub)
    import spark.implicits._
    // rebuild-over-existing lands in the NEXT generation; the meta flip
    // is the cutover and older generations retire under the compact
    // grace window (round 14, ADVICE r13 — see buildIvf)
    val prevMeta = metaIfAny(spark, path)
    val gen = prevMeta.map(_.gen + 1).getOrElse(0L)
    books.zipWithIndex.flatMap { case (sub, s) =>
      sub.zipWithIndex.map { case (cw, c) => (s, c, cw.toSeq) }
    }.toSeq.toDF("s", "c", "vec")
      .coalesce(1).write.mode("overwrite")
      .parquet(dataDir(path, "books", gen))
    Similarity.pqEncode(corpus, m, ksub)
      .select(col("vec_id"), col("code"))
      .withColumn("idb", idBucket(col("vec_id"), nb))
      .write.partitionBy("idb").mode("overwrite")
      .parquet(dataDir(path, "codes", gen))
    writeMeta(spark, path,
      Meta("pq", dimOf(corpus), 0, m, ksub, corpusFp(corpus), nb, gen))
    prevMeta.foreach { pm =>
      val pg = pm.gen
      dropOldGenerations(spark, path, "codes", keepFrom = pg)
      dropOldGenerations(spark, path, "books",
        keepFrom = modelGen(spark, path, "books", pg))
      // kind repurposing (pq over an ivf store): grace-retire the ivf
      // reader's resolvable generations, reclaim fully next cycle — see
      // the buildIvf twin
      val (cellsKeep, centroidsKeep) =
        if (pm.kind == "ivf") (pg, modelGen(spark, path, "centroids", pg))
        else (Long.MaxValue, Long.MaxValue)
      dropOldGenerations(spark, path, "cells", keepFrom = cellsKeep)
      dropOldGenerations(spark, path, "centroids", keepFrom = centroidsKeep)
    }
  }

  private def storedBooks(spark: SparkSession, path: String,
                          meta: Meta): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(modelDir(spark, path, "books", meta.gen))
      .collect()
      .map(r => ((r.getAs[Int]("s"), r.getAs[Int]("c")), r.getSeq[Double](2).toArray))
      .toMap
    Array.tabulate(meta.m)(s =>
      (0 until rows.keys.count(_._1 == s)).map(c => rows((s, c))).toArray)
  }

  /** Incrementally encode new vectors against the STORED codebooks and
    * append their codes; already-indexed `vec_id`s are skipped. Like
    * [[appendIvf]], the dedup never rescans the whole codes table: new ids
    * hash to their `idb` buckets first, and the anti-join reads only the
    * `vec_id` column of those bucket partitions (`idb IN (touched)` as a
    * partition filter). Exact by construction — the bucket of an id is a
    * pure function of the id, so an already-indexed duplicate can only
    * live in a bucket the batch touches. Encoding (the expensive kernel)
    * runs AFTER the dedup, so replayed batches pay only the hash. */
  def appendPq(newVecs: DataFrame, path: String): Unit = {
    val (frame, touched) = pqAppendFrame(newVecs, path)
    if (touched.nonEmpty) {
      val meta = cachedMeta(newVecs.sparkSession, path)
      frame.write.partitionBy("idb").mode("append")
        .parquet(currentData(path, meta))
    }
  }

  /** The deduped, encoded frame a PQ append writes, plus the id buckets it
    * touches — split from [[appendPq]] so specs can pin the dedup scan's
    * `PartitionFilters`. */
  private[graft] def pqAppendFrame(newVecs: DataFrame,
                                   path: String): (DataFrame, Array[Int]) = {
    val spark = newVecs.sparkSession
    val meta = cachedMeta(spark, path)
    require(meta.kind == "pq", s"index at $path is ${meta.kind}, not pq")
    checkDim(meta, newVecs)
    val books = storedBooks(spark, path, meta)
    val incoming = newVecs
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("idb", idBucket(col("vec_id"), meta.nb))
    val touched = incoming.select("idb").distinct().collect().map(_.getInt(0))
    val existing = readData(spark, path, meta)
      .where(col("idb").isin(touched: _*)).select("vec_id")
    val frame = incoming.join(existing, Seq("vec_id"), "left_anti")
      .withColumn("code", Similarity.pqCodeKernel(books)(col("e")))
      .select(col("vec_id"), col("code"), col("idb"))
    (frame, touched)
  }

  /** PQ-ADC top-k answered from the store: codebooks collected (tiny), the
    * code table is the only thing scanned. Bit-identical ranking to
    * [[Similarity.pqTopK]] over the same indexed corpus. */
  def pqTopK(spark: SparkSession, path: String, queries: DataFrame,
             k: Int): DataFrame = {
    val (meta, model) = cachedModel(spark, path, "pq")(m => storedBooks(spark, path, m))
    val books = model.asInstanceOf[Array[Array[Array[Double]]]]
    val enc = readData(spark, path, meta)
      .select(col("vec_id").as("nid"), col("code"))
    Similarity.pqSearch(enc, books, queries, k, meta.m, meta.ksub)
  }

  // -------------------------------------------------------------- compaction
  /** The index's current data table (IVF cells / PQ codes) — resolves the
    * generation-current directory, so callers never hard-code layout. */
  def data(spark: SparkSession, path: String): DataFrame =
    readData(spark, path, cachedMeta(spark, path))

  /** Number of parquet data files in the current generation — the
    * small-file pressure gauge [[maybeCompact]] reads. Streaming appends
    * write one file per touched partition per micro-batch, so this grows
    * linearly with batches until a compaction folds it back to one file
    * per partition value. */
  def dataFileCount(spark: SparkSession, path: String): Int =
    parquetFiles(spark, currentData(path, cachedMeta(spark, path)))

  // file counting and generation retirement go through the Hadoop
  // FileSystem API resolved from the index path itself, so the store is
  // genuinely storage-agnostic: on s3a/hdfs paths a java.io.File walk
  // would silently report 0 files — maybeCompact would never fire and
  // retirement could never delete (round-13 fix, ADVICE r12).
  private def hadoopFs(spark: SparkSession, p: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sessionState.newHadoopConf()), hp)
  }

  private def parquetFiles(spark: SparkSession, dir: String): Int = {
    val (fsys, p) = hadoopFs(spark, dir)
    if (!fsys.exists(p)) 0
    else {
      val it = fsys.listFiles(p, true)
      var n = 0
      while (it.hasNext)
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
  }

  /** Remove data generations older than `keepFrom` (the grace-window
    * policy: [[compact]] keeps the just-retired generation for readers
    * that already planned against its listing; the one before it can no
    * longer have readers by the time another compaction cycle runs). */
  private def dropOldGenerations(spark: SparkSession, path: String,
                                 base: String, keepFrom: Long): Unit = {
    val re = s"${base}_v(\\d+)".r
    val (fsys, p) = hadoopFs(spark, path)
    if (fsys.exists(p)) fsys.listStatus(p).foreach { st =>
      val gen = st.getPath.getName match {
        case `base` => Some(0L)
        case re(g) => Some(g.toLong)
        case _ => None
      }
      gen.filter(_ < keepFrom).foreach(_ => fsys.delete(st.getPath, true): Unit)
    }
  }

  /** Fold the append-accumulated small files back to one file per
    * partition value, without breaking concurrent readers: the rewrite
    * lands in a NEW generation directory beside the current one, the meta
    * row flips to it (bumping the store-cache stamp), and only
    * generations older than the just-retired one are deleted — a reader
    * that planned against the old listing keeps its files for a full
    * compaction cycle (the same retirement discipline as the event
    * tables' `TableCommit`). Search results are unchanged: the rewrite is
    * a partition-preserving shuffle of the same rows, and both search
    * cores rank with deterministic tie-breaks. */
  def compact(spark: SparkSession, path: String): Unit = {
    val meta = cachedMeta(spark, path)
    val cur = currentData(path, meta)
    val next = dataDir(path, meta.dataBase, meta.gen + 1)
    spark.read.parquet(cur)
      .repartition(col(meta.partCol))
      .write.partitionBy(meta.partCol).mode("overwrite").parquet(next)
    writeMeta(spark, path, meta.copy(gen = meta.gen + 1))
    dropOldGenerations(spark, path, meta.dataBase, keepFrom = meta.gen)
  }

  /** Compact iff the current generation's file count is at or past the
    * threshold — the cheap local check an ingest/streaming maintenance
    * loop calls after every append. */
  def maybeCompact(spark: SparkSession, path: String, atFiles: Int): Unit =
    if (atFiles > 0 && dataFileCount(spark, path) >= atFiles)
      compact(spark, path)
}
