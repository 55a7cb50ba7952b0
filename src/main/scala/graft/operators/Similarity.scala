package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score every corpus vector with an in-row fold (codegen, no UDF), keep
  * top-k per query with a window rank. At 100 TB corpus scale the scan is
  * embarrassingly parallel and the only shuffle is the tiny top-k
  * aggregation.
  *
  * Scale path: LSH bucketing via random-hyperplane signs (deterministic
  * seeded planes) — corpus is bucketed once (in-row signature), queries probe
  * only their bucket: turns the all-pairs scan into an equi-join on the
  * signature.
  */
object Similarity {

  /** Cast to double once; all arithmetic in double for engine parity. */
  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** In-row dot product of two equal-length double arrays: a native codegen
    * Expression (see [[graft.functions.DotProduct]]) with the same
    * sequential summation order as the lambda fold / DuckDB
    * `list_dot_product` — bit-exact oracle parity, ~100× per-element cost
    * of interpreted higher-order lambdas avoided. */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  /** The pure-built-in fold (kept for parity testing against [[dot]]). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val da = asDouble(a)
    val db = asDouble(b)
    dot(da, db) / (norm(da) * norm(db))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Queries are broadcast — the corpus scan
    * never shuffles its vectors. */
  /** BM25 keyword-search top-k (Robertson/Sparck Jones; k1/b defaults per
    * the literature). The query's term list is tiny and fixed, so per-term
    * frequencies evaluate IN-ROW (array filters over the token array — no
    * explode, no per-term shuffle) and the corpus stats (N, avg doc length,
    * per-term doc frequency) reduce to ONE broadcast-joined stats row: two
    * scans total regardless of corpus size. Deterministic tiebreak on id. */
  def bm25TopK(docs: DataFrame, id: Column, text: Column, query: Seq[String],
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "empty query")
    val toks = TextOps.tokens(text)
    val base = docs.select(id.as("doc_id"), toks.as("__toks"),
      size(toks).cast("long").as("__dl"))
    val statCols = Seq(
      count(lit(1)).as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl")) ++
      query.zipWithIndex.map { case (t, i) =>
        count(when(array_contains(col("__toks"), t), 1)).as(s"__df_$i")
      }
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    val termScores = query.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("__toks"), x => x === lit(t))).cast("double")
      val df = col(s"__df_$i").cast("double")
      val idf = log((col("__n").cast("double") - df + 0.5) / (df + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / col("__avgdl")))
    }
    scored
      .select(col("doc_id"), round(termScores.reduce(_ + _), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms are per-VECTOR columns computed before the join — same IEEE
    // expression as dot/(|a||b|) per pair, but evaluated n times, not n²
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("ce"))
      .withColumn("cn", norm(col("ce")))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", norm(col("qe")))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic pseudo-random plane component for (plane p, dim j):
    * md5("p:j") first 8 hex chars as a fraction of 2^32, centered on 0.
    * Computed in Scala at plan-build time — as Catalyst expressions these
    * were dim×planes md5 calls constant-folded on EVERY analysis. */
  def planeComponent(p: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(s"$p:$j".getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 4) { h = (h << 8) | (dig(i) & 0xFFL); i += 1 }
    h.toDouble / 4294967296.0 - 0.5
  }

  /** Random-hyperplane LSH signature: `planes` pseudo-random unit directions
    * derived deterministically from (plane, dimension); signature bit p =
    * sign of dot(v, plane_p). Deterministic across engines and runs.
    *
    * Implemented as a compiled kernel UDF: the equivalent Catalyst tree is
    * planes×dim element_at/multiply nodes (512 for 64-dim), which blows past
    * codegen limits and falls back to interpreted eval — measured 136 s for
    * 2 000 rows at sf0.1 vs sub-second for this one-pass primitive loop.
    * Sum order (j ascending per plane) matches the old expression fold, so
    * signatures are bit-identical. */
  def lshSignature(v: Column, dim: Int, planes: Int = 8): Column = {
    val mats = Array.tabulate(planes, dim)((p, j) => planeComponent(p, j))
    val kernel = udf { (arr: Seq[Double]) =>
      if (arr == null) null.asInstanceOf[java.lang.Long]
      else {
        var sig = 0L
        var p = 0
        while (p < planes) {
          val plane = mats(p)
          val n = math.min(dim, arr.length)
          var proj = 0.0
          var j = 0
          while (j < n) { proj += arr(j) * plane(j); j += 1 }
          if (proj > 0) sig |= (1L << p)
          p += 1
        }
        java.lang.Long.valueOf(sig)
      }
    }
    kernel(asDouble(v))
  }

  /** Per-vector int8 scalar quantization stats: min/max-ranged 0..255 codes
    * (C-style rounding, halves away from zero), code sum and max absolute
    * reconstruction error — the compression step ANN indexes apply before
    * storing 100 TB of vectors. One kernel pass per row; constant-scale
    * vectors quantize to all-zeros. Returns struct(qsum, max_err). */
  def quantizeStats(v: Column): Column = {
    val kernel = udf { (arr: Seq[Double]) =>
      if (arr == null || arr.isEmpty) (0L, 0.0)
      else {
        var mn = arr(0); var mx = arr(0)
        var i = 1
        while (i < arr.length) {
          val x = arr(i)
          if (x < mn) mn = x
          if (x > mx) mx = x
          i += 1
        }
        val scale = (mx - mn) / 255.0
        var qsum = 0L
        var maxErr = 0.0
        i = 0
        while (i < arr.length) {
          val x = arr(i)
          val q = if (scale == 0.0) 0L
            else graft.osl.Interpreter.cRound((x - mn) / scale).toLong
          qsum += q
          val err = math.abs(x - (mn + q * scale))
          if (err > maxErr) maxErr = err
          i += 1
        }
        (qsum, maxErr)
      }
    }
    kernel(asDouble(v)).cast("struct<qsum:bigint,max_err:double>")
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with cosine ≥
    * `threshold`. Brute-force tier — run on an LSH bucket or bounded subset;
    * at corpus scale feed it [[lshTopK]]'s buckets instead. */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val v = vectors.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("n", norm(col("e"))) // per-vector, not per-pair
    val a = v.select(col("vec_id").as("id_a"), col("e").as("ea"), col("n").as("na"))
    val b = v.select(col("vec_id").as("id_b"), col("e").as("eb"), col("n").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** IVF (inverted-file) ANN index: partition the corpus into `nlist`
    * coarse cells (nearest of `nlist` deterministic centroid vectors taken
    * from the corpus itself — ids sorted, evenly strided, a k-means-free
    * seeding that is reproducible across engines and runs), then answer
    * queries by probing the `nprobe` nearest cells only.
    *
    * Scale shape: centroids are tiny and broadcast; corpus assignment is a
    * scan (argmin over nlist dot products, codegen'd); the query join is an
    * equi-join on cell id touching nprobe/nlist of the corpus. This is the
    * standard IVF-flat recall/cost trade.
    */
  /** Centroid sets memoized per (session, canonicalized corpus plan, nlist):
    * an ANN index is built once at ingest and maintained incrementally — the
    * reference never rebuilds per query, and neither should the per-query
    * count + global-rank + collect here. Keyed on the canonicalized logical
    * plan (structural equality, no hash-collision risk); a changed corpus is
    * a different plan → different key. */
  /** Bounded LRU (access-order): a long-lived API server sees an open-ended
    * stream of distinct corpus plans, and an unbounded map would pin every
    * plan (and transitively its session state) for the process lifetime.
    * 64 live indexes is far beyond any realistic concurrent working set;
    * eviction only costs a rebuild on next use. */
  private val centroidCacheMax = 64
  private val centroidCache = new java.util.LinkedHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int),
    Array[(Long, Array[Double])]](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), Array[(Long, Array[Double])]]): Boolean =
      size() > centroidCacheMax
  }

  def ivfAssign(corpus: DataFrame, nlist: Int): (DataFrame, Array[(Long, Array[Double])]) = {
    val v = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val cacheKey = (v.sparkSession, v.queryExecution.analyzed.canonicalized, nlist)
    val cached = centroidCache.synchronized(centroidCache.get(cacheKey))
    if (cached != null)
      return (v.withColumn("cell", nearestCentroid(col("e"), cached, 1)(0)), cached)
    // Strided centroid seeding without collecting the corpus: count once,
    // compute the nlist target ranks, rank IDS ONLY through a global
    // row_number (16 bytes/row through the one-off sort — an index-build
    // cost), and collect just the nlist centroid rows for broadcast.
    val n = v.count()
    val stride = math.max(1L, n / nlist)
    val targets = (0 until nlist).map(i => math.min(i.toLong * stride, n - 1))
      .distinct.toSet
    // Global ranks WITHOUT a one-partition window: a distributed sort keeps
    // range partitions, zipWithIndex stitches per-partition offsets — the
    // same ranks a global row_number yields, minus the single-task sort
    // that would bottleneck an index build over a 100 TB corpus.
    val cidRows = v.select("vec_id").orderBy("vec_id").rdd
      .zipWithIndex()
      .filter { case (_, rn) => targets.contains(rn) }
      .map(_._1.getLong(0))
      .collect()
    // nlist ids -> an IN filter the scan can push down; no join needed
    val centroids = v.where(col("vec_id").isin(cidRows: _*))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    centroidCache.synchronized(centroidCache.put(cacheKey, centroids))
    val assigned = v.withColumn("cell", nearestCentroid(col("e"), centroids, 1)(0))
    (assigned, centroids)
  }

  /** Column: the `take` nearest centroid ids (by cosine, ties to the larger
    * cid) as an array. Compiled kernel over the broadcast centroid matrix —
    * the equivalent Catalyst tree bakes nlist×dim literals into the
    * generated source, so every (sf, centroid-set) recompiles a 1 000+-node
    * class; the kernel is one closure regardless of centroids. Sum order
    * matches the old expression fold (j ascending), so every cosine is
    * IEEE-identical. */
  private[operators] def nearestCentroid(
      e: Column, centroids: Array[(Long, Array[Double])],
      take: Int): Column = {
    val cids = centroids.map(_._1)
    val vecs = centroids.map(_._2)
    val norms = vecs.map(v => { var s = 0.0; var j = 0; while (j < v.length) { s += v(j) * v(j); j += 1 }; math.sqrt(s) })
    val kernel = udf { (arr: Seq[Double]) =>
      if (arr == null) Array.empty[Long]
      else {
        var es = 0.0
        var j = 0
        while (j < arr.length) { es += arr(j) * arr(j); j += 1 }
        val en = math.sqrt(es)
        val scored = Array.tabulate(cids.length) { i =>
          val v = vecs(i)
          val n = math.min(v.length, arr.length)
          var d = 0.0
          var k = 0
          while (k < n) { d += arr(k) * v(k); k += 1 }
          (d / (en * norms(i)), cids(i))
        }
        scored.sortBy { case (c, id) => (-c, -id) }.take(take).map(_._2)
      }
    }
    kernel(e)
  }

  /** IVF-flat top-k: probe the `nprobe` nearest cells per query, exact
    * cosine within them. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val (assigned, centroids) = ivfAssign(corpus, nlist)
    // materialize the cell assignment once (lazy localCheckpoint): codegen
    // defers the centroid-argmax kernel into the broadcast join's per-pair
    // loop otherwise — nQ kernel runs per corpus row. The persisted-index
    // path ([[AnnIndex.ivfTopK]]) reads assignments from parquet and needs
    // no barrier.
    ivfSearch(assigned.localCheckpoint(false), centroids, queries, k, nprobe)
  }

  /** The IVF search core over an already-assigned corpus `(vec_id, e,
    * cell)` — shared by the session-memoized path above and the persisted
    * index ([[AnnIndex]]), so both produce bit-identical rankings. */
  private[operators] def ivfSearch(assigned: DataFrame,
                                   centroids: Array[(Long, Array[Double])],
                                   queries: DataFrame, k: Int,
                                   nprobe: Int): DataFrame = {
    val c = assigned.select(col("vec_id").as("nid"), col("e").as("ce"), col("cell"))
      .withColumn("cn", norm(col("ce")))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("cell", explode(nearestCentroid(col("qe"), centroids, nprobe)))
      .withColumn("qn", norm(col("qe")))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
      .distinct() // a neighbor may appear via several probed cells
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Bucketed ANN: join corpus and queries on LSH signature, then exact
    * cosine within buckets. Trades recall for a scan→equi-join reduction. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int,
              planes: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("ce"))
      .withColumn("sig", lshSignature(col("ce"), dim, planes))
      .withColumn("cn", norm(col("ce")))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("sig", lshSignature(col("qe"), dim, planes))
      .withColumn("qn", norm(col("qe")))
    val scored = c.join(broadcast(q), Seq("sig"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** SemDedup (semantic dedup over embeddings, Abbas et al. 2023 shape):
    * cluster the corpus coarsely, then inside each cluster drop every vector
    * that has a LOWER-id near-duplicate (cosine ≥ `tau`) — the deterministic
    * "keep the first representative" policy. Returns one verdict row per
    * vector: `(vec_id, cell, kept)`.
    *
    * Scale shape: clustering is [[ivfAssign]] (broadcast centroids, one scan);
    * the quadratic pair scan is confined to single cells — with nlist sized
    * ~sqrt(n/target_cell) each cell's self-join is bounded, and cells run in
    * parallel (shuffle key = cell). Nothing quadratic ever crosses cells, so
    * the 100 TB cost is sum(cell²) not corpus². */
  def semDedup(corpus: DataFrame, tau: Double, nlist: Int = 16): DataFrame = {
    val (assigned0, _) = ivfAssign(corpus, nlist)
    // lazily cache the assignment (vec_id, e, cell, norm): the pair join's
    // two sides and the final verdict select all read it — uncached, the
    // centroid-argmax kernel would re-run per consumer. Lazy localCheckpoint
    // rather than persist(): no session-lifetime CacheManager entry (this
    // function cannot unpersist — it returns a lazy frame), and the
    // ContextCleaner frees the blocks once the query's frames are GC'd.
    val assigned = assigned0.withColumn("n", norm(col("e")))
      .localCheckpoint(false)
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
      col("e").as("ea"), col("n").as("na"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("e").as("eb"), col("n").as("nb"))
    val dropped = a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b") &&
        dot(col("ea"), col("eb")) / (col("na") * col("nb")) >= tau)
      .select(col("id_b").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cell"))
      .join(dropped.withColumn("__drop", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(!col("__drop"), lit(true)).as("kept"))
  }

  // ------------------------------------------------------------------ PQ

  /** Product-quantization codebooks: `ksub` strided sample vectors seed
    * each of the `m` sub-codebooks (the deterministic seeding
    * [[ivfAssign]] uses), then ONE Lloyd refinement replaces every
    * codeword with the mean of the corpus subvectors assigned to it
    * (round-17 #6; empty codes keep their seed). The means run in exact
    * decimal space — per-component `sum(cast(x as decimal(18,6)))` then a
    * single IEEE divide, the [[labelCentroids]] discipline — so the
    * refined books are order-independent and oracle-reproducible, and the
    * recall gain is gated by recall@k in PipelineOpsSpec (ship only if
    * ≥ seed). Cost: one corpus scan + an `m×ksub×d`-row aggregate — the
    * same shape as a [[kmeansCentroids]] iteration, linear at 100 TB.
    * Returns `m × ksub × d` doubles, memoized like the IVF centroids. */
  private val pqCache = new java.util.LinkedHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Int),
    Array[Array[Array[Double]]]](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Int), Array[Array[Array[Double]]]]): Boolean =
      size() > centroidCacheMax
  }

  /** The strided-sample SEED books (pre-refinement) — the spec's recall
    * baseline. */
  private[graft] def pqCodebooksSeed(corpus: DataFrame, m: Int,
                                         ksub: Int): Array[Array[Array[Double]]] = {
    val v = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val n = v.count()
    val stride = math.max(1L, n / ksub)
    val targets = (0 until ksub).map(i => math.min(i.toLong * stride, n - 1))
      .distinct.toSet
    val sampleIds = v.select("vec_id").orderBy("vec_id").rdd
      .zipWithIndex()
      .filter { case (_, rn) => targets.contains(rn) }
      .map(_._1.getLong(0))
      .collect()
    val samples = v.where(col("vec_id").isin(sampleIds: _*))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val dim = samples.head._2.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val d = dim / m
    Array.tabulate(m) { s =>
      samples.map { case (_, e) => e.slice(s * d, (s + 1) * d) }
    }
  }

  /** One Lloyd step over `seed`: assign every corpus subvector to its
    * nearest seed codeword (the same surrogate + smaller-code ties as
    * [[pqCodeKernel]]), then per (sub, code, component) take the
    * decimal-exact mean; unassigned codes keep the seed codeword. One scan
    * + a tiny (m·ksub·d-row) collect. */
  private[graft] def pqLloydStep(corpus: DataFrame,
                                     seed: Array[Array[Array[Double]]],
                                     m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    val v = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val d = seed.head.head.length
    val stats = v
      .select(pqCodeKernel(seed)(col("e")).as("code"), col("e"))
      .select(posexplode(col("code")).as(Seq("s", "c")), col("e"))
      .select(col("s"), col("c"),
        posexplode(slice(col("e"), col("s") * d + lit(1), lit(d))).as(Seq("j", "x")))
      .groupBy(col("s"), col("c"), col("j"))
      .agg(sum(col("x").cast("decimal(18,6)")).cast("double").as("sx"),
        count(lit(1)).as("n"))
      .collect()
    val refined = seed.map(_.map(_.clone()))
    stats.foreach { r =>
      refined(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
        r.getDouble(3) / r.getLong(4)
    }
    refined
  }

  def pqCodebooks(corpus: DataFrame, m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    val v = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val cacheKey = (v.sparkSession, v.queryExecution.analyzed.canonicalized, m, ksub)
    val cached = pqCache.synchronized(pqCache.get(cacheKey))
    if (cached != null) return cached
    val books = pqLloydStep(corpus, pqCodebooksSeed(corpus, m, ksub), m, ksub)
    pqCache.synchronized(pqCache.put(cacheKey, books))
    books
  }

  /** PQ-encode: each vector's subvector `s` maps to the code of its nearest
    * codeword by the L2 surrogate `cw·cw − 2·(sub·cw)` (the `sub·sub` term
    * is constant per argmin; the surrogate — not the full distance — is the
    * documented comparison everywhere, so engines agree bit-for-bit), ties
    * to the smaller code. Adds `code: array<int>` (m entries). Compiled
    * kernel over the broadcast codebooks; dot folds j-ascending. */
  def pqEncode(corpus: DataFrame, m: Int = 4, ksub: Int = 16): DataFrame = {
    val books = pqCodebooks(corpus, m, ksub)
    val v = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    v.withColumn("code", pqCodeKernel(books)(col("e")))
  }

  private[graft] def pqCodeKernel(books: Array[Array[Array[Double]]]): Column => Column = {
    val m = books.length
    val cs = books.map(_.map(cw => { var s = 0.0; var j = 0; while (j < cw.length) { s += cw(j) * cw(j); j += 1 }; s }))
    val kernel = udf { (arr: Seq[Double]) =>
      if (arr == null) null
      else Array.tabulate(m) { s =>
        val d = books(s).head.length
        val off = s * d
        var best = 0
        var bestDist = Double.MaxValue
        var c = 0
        while (c < books(s).length) {
          val cw = books(s)(c)
          var dot = 0.0
          var j = 0
          while (j < d) { dot += arr(off + j) * cw(j); j += 1 }
          val dist = cs(s)(c) - 2.0 * dot
          if (dist < bestDist) { bestDist = dist; best = c }
          c += 1
        }
        best
      }
    }
    kernel(_)
  }

  /** PQ-ADC top-k: queries score every corpus code by table lookup — per
    * query, a distance table of `m × ksub` surrogate L2 entries
    * (`cw·cw − 2·(q_sub·cw)`); a neighbor's approximate distance is the
    * s-ascending sum of its codes' entries. Rank by `(adist asc, nid asc)`.
    *
    * Scale shape: the corpus is touched once to encode (codes are 4 ints —
    * at 100 TB the code table is ~1/250th of the raw vectors and the only
    * thing the search scans); queries broadcast with their distance tables
    * inline; scoring is `m` array lookups + adds per (query, code) pair
    * inside whole-stage codegen — no vector math on the scan side. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 4, ksub: Int = 16): DataFrame = {
    val books = pqCodebooks(corpus, m, ksub)
    // materialize the codes once (lazy localCheckpoint) — same deferred-
    // kernel trap as [[ivfTopK]]: the encode kernel would re-run nQ× per
    // corpus row inside the broadcast join loop. [[AnnIndex.pqTopK]] reads
    // codes from parquet and needs no barrier.
    val enc = pqEncode(corpus, m, ksub)
      .select(col("vec_id").as("nid"), col("code"))
      .localCheckpoint(false)
    pqSearch(enc, books, queries, k, m, ksub)
  }

  /** The PQ-ADC search core over an already-encoded corpus `(nid, code)` —
    * shared by the session-memoized path above and the persisted index
    * ([[AnnIndex]]), so both produce bit-identical rankings. */
  /** Per-query ADC distance table (`m × ksub` surrogate L2 entries) as a
    * compiled kernel column — shared by [[pqSearch]] and the one-pass
    * quality report. */
  private[operators] def pqDistTableKernel(books: Array[Array[Array[Double]]],
                                           m: Int, ksub: Int): Column => Column = {
    val kernel = udf { (arr: Seq[Double]) =>
      if (arr == null) null
      else {
        val out = new Array[Double](m * ksub)
        var s = 0
        while (s < m) {
          val d = books(s).head.length
          val off = s * d
          var c = 0
          while (c < books(s).length) {
            val cw = books(s)(c)
            var dot = 0.0
            var j = 0
            while (j < d) { dot += arr(off + j) * cw(j); j += 1 }
            var cc = 0.0
            j = 0
            while (j < d) { cc += cw(j) * cw(j); j += 1 }
            out(s * ksub + c) = cc - 2.0 * dot
            c += 1
          }
          s += 1
        }
        out
      }
    }
    kernel(_)
  }

  private[graft] def pqSearch(enc: DataFrame,
                                  books: Array[Array[Array[Double]]],
                                  queries: DataFrame, k: Int,
                                  m: Int, ksub: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("dt", pqDistTableKernel(books, m, ksub)(col("qe")))
    // s-ascending explicit fold — the exact addition order the oracle mirrors
    val adist = (0 until m).map(s =>
        element_at(col("dt"), element_at(col("code"), s + 1) + lit(s * ksub + 1)))
      .reduce(_ + _)
    val scored = enc.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), adist.as("adist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("adist").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Per-label centroids, componentwise: `(label, pos, centroid, n)` — the
    * class-prototype / IVF-training aggregation. Component sums run in
    * exact decimal space (per-element cast to DECIMAL(18,6)) making the
    * result order-independent and oracle-exact; the final divide is one
    * deterministic IEEE op. Spark casts float→decimal through the exact
    * DOUBLE value, and no double ever falls exactly halfway between two
    * 6-decimal values, so the rounding is engine-independent — an oracle
    * must mirror the route (`CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))`),
    * since a direct float→decimal conversion at float precision rounds a
    * handful of elements differently.
    *
    * Scale shape: posexplode emits `rows × dim` narrow rows, but hash
    * partial aggregation collapses them to `labels × dim` per task BEFORE
    * the shuffle — the exchange carries only the tiny centroid frame, never
    * the vectors. */
  def labelCentroids(vectors: DataFrame, label: Column, vec: Column): DataFrame =
    vectors
      .select(label.as("label"), posexplode(vec).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(
        (sum(col("x").cast("decimal(18,6)")).cast("double") / count(lit(1)))
          .as("centroid"),
        count(lit(1)).as("n"))

  /** Nearest-centroid assignment by cosine with ties to the SMALLEST
    * cluster id (ascending scan, replace only on strictly greater score) —
    * the SQL-mirror order `ROW_NUMBER() OVER (ORDER BY cos DESC, cid ASC)`.
    * Sums run in position order, so every cosine is IEEE-identical to
    * DuckDB's `list_dot_product`-based expression. */
  private def nearestClusterMinTie(e: Column,
                                   centroids: Array[Array[Double]]): Column = {
    val vecs = centroids
    val norms = vecs.map { v =>
      var s = 0.0; var j = 0
      while (j < v.length) { s += v(j) * v(j); j += 1 }
      math.sqrt(s)
    }
    val kernel = udf { (arr: Seq[Double]) =>
      var es = 0.0
      var j = 0
      while (j < arr.length) { es += arr(j) * arr(j); j += 1 }
      val en = math.sqrt(es)
      var best = 0
      var bestCos = Double.NegativeInfinity
      var i = 0
      while (i < vecs.length) {
        val v = vecs(i)
        // a ragged embedding column would silently assign to the wrong
        // cluster under a truncated dot product — refuse instead
        require(v.length == arr.length,
          s"embedding dimension ${arr.length} != centroid dimension ${v.length}")
        var d = 0.0
        var p = 0
        while (p < v.length) { d += arr(p) * v(p); p += 1 }
        val c = d / (en * norms(i))
        if (c > bestCos) { bestCos = c; best = i }
        i += 1
      }
      best.toLong
    }
    kernel(e)
  }

  /** Deterministic Lloyd's k-means over the embedding column — the corpus
    * clustering primitive behind cluster-balanced sampling and diversity
    * analysis of training corpora (the cluster step SemDedup and DSIR-style
    * curation papers assume as given).
    *
    * Everything is cross-engine reproducible (no RNG, no fp order
    * dependence), so a SQL engine unrolling the same iterations computes
    * bit-identical centroids:
    *  - init: the vectors of the k smallest `vec_id`s (a global top-k scan,
    *    `TakeOrderedAndProject` — not a full sort), cluster ids 0..k-1 in
    *    id order;
    *  - assignment: nearest centroid by cosine with position-order sums
    *    (IEEE-identical to `list_dot_product`), ties to the smaller id;
    *  - update: per-component mean via DECIMAL(18,6) sums — the
    *    [[labelCentroids]] recipe, order-independent and exact.
    *
    * Scale shape: each iteration is ONE corpus scan against the broadcast
    * k×dim centroid matrix (driver-held, like any broadcast join side) plus
    * one posexplode hash-agg whose map-side partial aggregation collapses
    * to k×dim rows per task before the shuffle — the embeddings themselves
    * never shuffle, and only the k×dim centroid frame is ever collected.
    * Iterations are bounded by `iters` (k-means convergence is a quality
    * knob, not a correctness one).
    *
    * Returns `(cluster, pos, centroid, n)` — the centroid matrix after the
    * final update with each cluster's final member count. Clusters with no
    * members in the final assignment are absent from the result (a SQL
    * GROUP BY drops them identically); mid-loop empty clusters keep their
    * previous centroid. */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters > 0, s"k and iters must be positive (got k=$k, iters=$iters)")
    val v = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    var centroids: Array[Array[Double]] =
      v.orderBy(col("vec_id").asc).limit(k).collect()
        .map(_.getSeq[Double](1).toArray)
    require(centroids.length == k, s"corpus has fewer than $k vectors")
    def update(cs: Array[Array[Double]]): DataFrame =
      // assign FIRST, in its own projection: a generator's sibling
      // expressions land in the Project ABOVE the Generate, which would
      // re-run the kernel once per exploded element (64× — measured 6×
      // wall time); as a plain attribute the cluster id is computed once
      // per row and carried through the explode
      v.select(nearestClusterMinTie(col("e"), cs).as("cluster"), col("e"))
        .select(col("cluster"), posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(
          (sum(col("x").cast("decimal(18,6)")).cast("double") / count(lit(1)))
            .as("centroid"),
          count(lit(1)).as("n"))
    // iterations 1..iters-1 materialize only the k×dim centroid frame;
    // the final iteration's plan is returned lazily like any other query
    for (_ <- 1 until iters) {
      val rows = update(centroids).collect()
      val next = centroids.map(_.clone())
      rows.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1)) = r.getDouble(2)
      }
      centroids = next
    }
    update(centroids)
  }

  /** ANN quality report — the eval every approximate-index deployment
    * runs before trusting it: recall@k of each approximate index (LSH,
    * IVF, PQ) against the EXACT cosine top-k over the same query set.
    * Returns one row per method: `(method, n_queries, hits, possible,
    * recall)` where `hits = Σ_q |approx_q ∩ exact_q|`, `possible =
    * n_queries × k`, `recall = round(hits / possible, 6)` (one IEEE
    * division then round — engine-portable).
    *
    * Scale shape: each index's own top-k plan runs unchanged (their scale
    * stories apply); the exact baseline is the brute-force scan — at
    * corpus scale you run this on a SAMPLED query set, which is the
    * `queries` frame by construction. The intersection is a semi-join on
    * (qid, nid) pairs — k×queries rows, broadcast-sized. */
  def annQualityReport(corpus: DataFrame, queries: DataFrame, k: Int,
                       lshDim: Int = 64): DataFrame = {
    // ONE action, ~6 scheduled stages past the (memoized) model builds
    // (round-16 directive #2; the r15 shape ran 11 jobs / 23 stages —
    // four separate per-method rank windows, a cached exact side and two
    // extra broadcast builds). The whole report is one DAG:
    //
    //  - ONE query-side frame carries every per-method model column
    //    (IVF probe cells, LSH signature, PQ distance table) and
    //    broadcasts once — the exact/ivf/pq branches share one identity
    //    broadcast (ReuseExchange collapses their non-equi joins); lsh's
    //    hashed sig-join adds the second;
    //  - the IVF probe is `array_contains(qcells, cell)` inside the join
    //    condition — same pair set as the explode+equi-join, but
    //    duplicate-free by construction, so no distinct() pass;
    //  - ONE rank window over the 4-way union — partitionBy(method, qid),
    //    orderBy(skey, nid) with skey = −cos (order-exact negation) for
    //    the cosine methods and the ADC distance for PQ — replaces four
    //    per-method windows with a single exchange;
    //  - hits fall out of a (qid, nid) window (a pair is a hit for m iff
    //    'exact' ranked it too), and the 3-row report is ONE global agg
    //    (per-method conditional sums + the distinct-qid query count,
    //    exploded back to rows). Every query has k exact neighbors, so
    //    exact's distinct qids ARE the query set.
    val m = 4; val ksub = 16; val nlist = 16; val nprobe = 4
    val (assigned, centroids) = ivfAssign(corpus, nlist)
    val books = pqCodebooks(corpus, m, ksub)
    // The encoded corpus materializes ONCE (lazy localCheckpoint, the
    // semDedup discipline): under whole-stage codegen a projection feeding
    // a broadcast join defers non-condition columns into the per-pair
    // loop, so the cell/signature/code kernels would otherwise re-run
    // nQ× per corpus row (measured 4-6× wall time). At 100 TB the encoded
    // corpus is what [[AnnIndex]] persists — this is the in-session
    // equivalent of reading it back.
    // Degenerate vectors (null / zero-norm) are EXCLUDED from the eval:
    // their cosine is null/NaN, and the single −cos ASC rank key here
    // places NaN/null opposite to the serving paths' cos DESC windows
    // (desc: NaN first, nulls last; asc-on-negation: NaN last, nulls
    // first) — the report's rankings would diverge from what the index
    // actually serves. A recall eval over unit-normalizable vectors only
    // is the honest comparison; serving paths keep their own semantics.
    val c = assigned.select(col("vec_id").as("nid"), col("e").as("ce"), col("cell"))
      .withColumn("cn", norm(col("ce")))
      .where(col("ce").isNotNull && col("cn") > 0)
      .withColumn("csig", lshSignature(col("ce"), lshDim))
      .withColumn("code", pqCodeKernel(books)(col("ce")))
      .localCheckpoint(false)
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", norm(col("qe")))
      .where(col("qe").isNotNull && col("qn") > 0)
      .withColumn("qcells", nearestCentroid(col("qe"), centroids, nprobe))
      .withColumn("qsig", lshSignature(col("qe"), lshDim))
      .withColumn("qdt", pqDistTableKernel(books, m, ksub)(col("qe")))
    val qb = broadcast(q)
    val cos = dot(col("qe"), col("ce")) / (col("qn") * col("cn"))
    // s-ascending explicit fold — the exact addition order the oracle mirrors
    val adist = (0 until m).map(s =>
        element_at(col("qdt"), element_at(col("code"), s + 1) + lit(s * ksub + 1)))
      .reduce(_ + _)
    // every method's candidate test is a per-pair predicate (the exact and
    // PQ branches score all pairs anyway — this is the brute-force-graded
    // EVAL, run on a sampled query set; the serving paths keep their
    // pruned per-method plans), so ONE pair scan emits all four methods'
    // entries. cos/adist and the membership flags are computed ONCE per
    // pair in a codegen projection BELOW the explode; the generator is a
    // plain array of (method, skey) structs with nulls filtered after the
    // explode — a higher-order `filter` inside the generator would drop
    // the whole expression to interpreted eval (CodegenFallback), paying
    // 3 interpreted 64-dim dots per pair.
    val pairs = c.join(qb, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cos.as("__cos"), adist.as("__adist"),
        array_contains(col("qcells"), col("cell")).as("__in_ivf"),
        (col("qsig") === col("csig")).as("__in_lsh"))
    val union = pairs
      .select(col("qid"), col("nid"), explode(array(
        struct(lit("exact").as("method"), (-col("__cos")).as("skey")),
        when(col("__in_ivf"),
          struct(lit("ivf").as("method"), (-col("__cos")).as("skey"))),
        when(col("__in_lsh"),
          struct(lit("lsh").as("method"), (-col("__cos")).as("skey"))),
        struct(lit("pq").as("method"), col("__adist").as("skey")))).as("e"))
      .where(col("e").isNotNull)
      .select(col("e.method").as("method"), col("qid"), col("nid"),
        col("e.skey").as("skey"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("method"), col("qid"))
      .orderBy(col("skey").asc, col("nid").asc)
    val ranked = union.withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= k)
    val wPair = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"), col("nid"))
    val flagged = ranked.withColumn("__hit",
      max(when(col("method") === "exact", 1).otherwise(0)).over(wPair))
    def hitsOf(name: String) =
      sum(when(col("method") === name && col("__hit") === 1, 1L).otherwise(0L))
    flagged.agg(
        countDistinct(when(col("method") === "exact", col("qid"))).as("nq"),
        hitsOf("ivf").as("h_ivf"), hitsOf("lsh").as("h_lsh"),
        hitsOf("pq").as("h_pq"))
      .select(explode(array(
          struct(lit("ivf").as("method"), col("h_ivf").as("hits")),
          struct(lit("lsh").as("method"), col("h_lsh").as("hits")),
          struct(lit("pq").as("method"), col("h_pq").as("hits")))).as("mh"),
        col("nq"))
      .select(col("mh.method").as("method"), col("nq").as("n_queries"),
        col("mh.hits").as("hits"), (col("nq") * k).as("possible"),
        round(col("mh.hits").cast("double") /
          (col("nq") * k).cast("double"), 6).as("recall"))
    // no orderBy: three rows, and the driver compare sorts rows itself —
    // a sort here would cost one more exchange (= one more driver job)
  }
}
