package graft

import graft.operators.{AnnIndex, Similarity}
import org.apache.spark.sql.functions._

/** Persisted ANN index (round 11): the IVF cell table / PQ codes as durable
  * parquet, maintained incrementally — searches answer from the store and
  * match the session-memoized path bit-for-bit on the same corpus. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  // deterministic corpus: 60 vectors in 3 loose clusters
  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    val center = seed % 3
    Array.tabulate(dim)(j =>
      (center * 2.0 + math.sin(j + center) + rnd.nextDouble() * 0.3).toFloat)
  }
  private def corpus(ids: Range) =
    ids.map(i => (i.toLong, vec(i).toSeq)).toDF("vec_id", "embedding")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "rank", "nid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("indexed IVF search == session-memoized search, bit-for-bit") {
    val all = corpus(0 until 60)
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildIvf(all, path, nlist = 8)
    val q = all.where(col("vec_id") < 5)
    val fromIndex = canon(AnnIndex.ivfTopK(spark, path, q, k = 4, nprobe = 3))
    val fromScratch = canon(Similarity.ivfTopK(all, q, k = 4, nlist = 8, nprobe = 3))
    assert(fromIndex == fromScratch)
    assert(fromIndex.nonEmpty)
  }

  test("indexed PQ search == session-memoized search, bit-for-bit") {
    val all = corpus(0 until 60)
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildPq(all, path, m = 4, ksub = 8)
    val q = all.where(col("vec_id") < 5)
    val fromIndex = canon(AnnIndex.pqTopK(spark, path, q, k = 4))
    val fromScratch = canon(Similarity.pqTopK(all, q, k = 4, m = 4, ksub = 8))
    assert(fromIndex == fromScratch)
    assert(fromIndex.nonEmpty)
  }

  test("append indexes only NEW vectors against the stored centroids") {
    val base = corpus(0 until 40)
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildIvf(base, path, nlist = 8)
    // append 20 new + re-send 10 already-indexed (must be a no-op)
    AnnIndex.appendIvf(corpus(30 until 60), path)
    val cells = spark.read.parquet(s"$path/cells")
    assert(cells.count() == 60, "append must dedup re-sent vec_ids")
    assert(cells.select("vec_id").distinct().count() == 60)
    // an appended vector is retrievable: a probe equal to vector 55 (an
    // appended id, query id outside the corpus so nothing self-excludes)
    // must rank it first with cosine 1.0
    val probe = Seq((1000L, vec(55).toSeq)).toDF("vec_id", "embedding")
    val top = AnnIndex.ivfTopK(spark, path, probe, k = 1, nprobe = 3)
      .select("nid").head().getLong(0)
    assert(top == 55L, s"appended vector must be searchable, got $top")
    // idempotence: re-appending the same batch adds nothing
    AnnIndex.appendIvf(corpus(30 until 60), path)
    assert(spark.read.parquet(s"$path/cells").count() == 60)
  }

  test("PQ append encodes only NEW vectors with the stored codebooks") {
    val base = corpus(0 until 40)
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildPq(base, path, m = 4, ksub = 8)
    // append 20 new + re-send 5 already-indexed (must be a no-op)
    AnnIndex.appendPq(corpus(35 until 60), path)
    val codes = spark.read.parquet(s"$path/codes")
    assert(codes.count() == 60, "append must dedup re-sent vec_ids")
    // the re-sent vector keeps its build-time code (never rewritten)...
    val buildCode = Similarity.pqEncode(base, m = 4, ksub = 8)
      .where(col("vec_id") === 38).select("code").head().getSeq[Int](0)
    val storedCode = codes.where(col("vec_id") === 38).select("code")
      .head().getSeq[Int](0)
    assert(storedCode == buildCode)
    // ...and appended vectors carry codes from the STORED (base-corpus)
    // codebooks: every code entry is a valid codeword index
    val appended = codes.where(col("vec_id") === 50).select("code")
      .head().getSeq[Int](0)
    assert(appended.length == 4 && appended.forall(c => c >= 0 && c < 8))
    // idempotence: re-appending adds nothing
    AnnIndex.appendPq(corpus(35 until 60), path)
    assert(spark.read.parquet(s"$path/codes").count() == 60)
  }

  test("IVF append dedup prunes to the touched cells (never a corpus scan)") {
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildIvf(corpus(0 until 60), path, nlist = 8)
    val cellDirs = Option(new java.io.File(s"$path/cells").listFiles).toSeq
      .flatten.count(_.getName.startsWith("cell="))
    // a batch from ONE cluster (ids ≡ 0 mod 3 share a center) lands in a
    // strict subset of the cells
    val batch = Seq(100L, 101L).map(i => (i, vec(i.toInt * 3).toSeq))
      .toDF("vec_id", "embedding")
    val (frame, touched) = AnnIndex.ivfAppendFrame(batch, path)
    assert(touched.nonEmpty && touched.length < cellDirs,
      s"batch should touch a strict subset of $cellDirs cells, got ${touched.length}")
    // the dedup scan's plan prunes statically: `cell IN (touched)` reaches
    // the parquet scan as a PARTITION filter — the O(new)-not-O(corpus)
    // evidence the append contract claims
    val plan = frame.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"expected a non-empty cell partition filter on the dedup scan in:\n$plan")
    // and the frame is exactly the new vectors, assigned
    assert(frame.count() == 2)
  }

  test("PQ append dedup prunes to the touched id buckets") {
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildPq(corpus(0 until 60), path, m = 4, ksub = 8)
    val batch = Seq((200L, vec(7).toSeq)).toDF("vec_id", "embedding")
    val (frame, touched) = AnnIndex.pqAppendFrame(batch, path)
    assert(touched.length == 1, "one new id hashes to exactly one bucket")
    val plan = frame.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*idb".r.findFirstIn(plan).isDefined,
      s"expected a non-empty idb partition filter on the dedup scan in:\n$plan")
    assert(frame.count() == 1)
  }

  test("buildIfStale: no-op on same listing, append-only on growth") {
    // file-backed corpus (in-memory frames have no listing fingerprint
    // and always rebuild)
    val dataDir = java.nio.file.Files.createTempDirectory("annidx-data").toString
    corpus(0 until 40).coalesce(1).write.mode("append").parquet(dataDir)
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    def read() = spark.read.parquet(dataDir)
    AnnIndex.buildIvfIfStale(read(), path, nlist = 8)
    val centroids0 = spark.read.parquet(s"$path/centroids")
      .collect().map(_.getLong(0)).sorted.toSeq
    def cellFiles() = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f.getPath)
      walk(new java.io.File(s"$path/cells")).filter(_.endsWith(".parquet")).sorted
    }
    val files0 = cellFiles()
    // same listing: a second call must not touch the store
    AnnIndex.buildIvfIfStale(read(), path, nlist = 8)
    assert(cellFiles() == files0, "unchanged corpus must be a no-op")
    // grown listing: append-only — new vectors indexed, existing cell
    // files untouched, centroids NOT retrained (the faiss discipline)
    corpus(40 until 60).coalesce(1).write.mode("append").parquet(dataDir)
    AnnIndex.buildIvfIfStale(read(), path, nlist = 8)
    assert(spark.read.parquet(s"$path/cells").count() == 60)
    assert(cellFiles().toSet.intersect(files0.toSet) == files0.toSet,
      "growth must append, not rewrite the existing cell files")
    val centroids1 = spark.read.parquet(s"$path/centroids")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(centroids1 == centroids0, "append must not retrain centroids")
    // and now current again: third call is a no-op
    val files1 = cellFiles()
    AnnIndex.buildIvfIfStale(read(), path, nlist = 8)
    assert(cellFiles() == files1)
    // different nlist = a different index: full rebuild — round 14:
    // into the NEXT generation (gen 1); the bare gen-0 model stays as
    // the reader grace copy
    AnnIndex.buildIvfIfStale(read(), path, nlist = 4)
    assert(spark.read.parquet(s"$path/centroids_v1").count() == 4)
    assert(spark.read.parquet(s"$path/centroids").count() == 8,
      "the retired model generation is the reader grace window")
    // and the rebuilt store answers with the new model
    val q14 = read().where(col("vec_id") < 2)
    assert(AnnIndex.ivfTopK(spark, path, q14, k = 2, nprobe = 2).count() == 4)
  }

  test("streaming index maintenance: appends per batch, replay-idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildIvf(corpus(0 until 40), path, nlist = 8)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.Streams.annIndexStream(
      mem.toDF().toDF("vec_id", "embedding"), path,
      java.nio.file.Files.createTempDirectory("annidx-ckpt").toString)
    try {
      mem.addData((40 until 50).map(i => (i.toLong, vec(i).toSeq)): _*)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$path/cells").count() == 50)
      // a replayed/overlapping batch is a no-op (anti-join dedup)
      mem.addData((45 until 60).map(i => (i.toLong, vec(i).toSeq)): _*)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$path/cells").count() == 60)
      assert(spark.read.parquet(s"$path/cells")
        .select("vec_id").distinct().count() == 60)
      // streamed vectors are immediately searchable
      val probe = Seq((1000L, vec(55).toSeq)).toDF("vec_id", "embedding")
      assert(AnnIndex.ivfTopK(spark, path, probe, k = 1, nprobe = 3)
        .select("nid").head().getLong(0) == 55L)
    } finally q.stop()
  }

  test("compact folds append small-files; search bit-identical; rename-free") {
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildIvf(corpus(0 until 30), path, nlist = 8)
    // micro-batch appends accumulate one file per touched cell per batch
    (30 until 60).grouped(5).foreach(g =>
      AnnIndex.appendIvf(corpus(g.head until g.head + 5), path))
    val before = AnnIndex.dataFileCount(spark, path)
    val q = corpus(0 until 60).where(col("vec_id") < 5)
    val resBefore = canon(AnnIndex.ivfTopK(spark, path, q, k = 4, nprobe = 3))
    // threshold 0 = off; a threshold above the count is a no-op too
    AnnIndex.maybeCompact(spark, path, 0)
    AnnIndex.maybeCompact(spark, path, before + 1)
    assert(AnnIndex.dataFileCount(spark, path) == before)
    AnnIndex.compact(spark, path)
    val after = AnnIndex.dataFileCount(spark, path)
    assert(after < before && after <= 8,
      s"compaction must fold to ≤1 file/cell: $before -> $after")
    assert(AnnIndex.data(spark, path).count() == 60, "no rows lost")
    assert(canon(AnnIndex.ivfTopK(spark, path, q, k = 4, nprobe = 3)) == resBefore,
      "search must be bit-identical across a compaction")
    // rename-free generation swap: the retired gen-0 dir stays as the
    // grace window for readers that planned against its listing...
    assert(new java.io.File(s"$path/cells").exists)
    assert(new java.io.File(s"$path/cells_v1").exists)
    // ...and the NEXT compaction cycle retires it
    AnnIndex.compact(spark, path)
    assert(!new java.io.File(s"$path/cells").exists)
    assert(new java.io.File(s"$path/cells_v1").exists)
    assert(new java.io.File(s"$path/cells_v2").exists)
    assert(canon(AnnIndex.ivfTopK(spark, path, q, k = 4, nprobe = 3)) == resBefore)
    // appends keep landing in the current generation
    AnnIndex.appendIvf(corpus(60 until 65), path)
    assert(AnnIndex.data(spark, path).count() == 65)
    assert(new java.io.File(s"$path/cells_v2").exists &&
      !new java.io.File(s"$path/cells").exists)
  }

  test("rebuild lands in the NEXT generation, reader-safe, no orphans") {
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildIvf(corpus(0 until 30), path, nlist = 8)
    AnnIndex.appendIvf(corpus(30 until 40), path)
    AnnIndex.compact(spark, path) // -> cells_v1 current, cells grace
    AnnIndex.compact(spark, path) // -> cells_v2 current, cells gone
    assert(new java.io.File(s"$path/cells_v1").exists &&
      new java.io.File(s"$path/cells_v2").exists)
    // round 14 (ADVICE r13): a full rebuild writes the NEW generation
    // beside the current one — cells_v2, which a concurrent reader may
    // have planned against, is never overwritten or deleted on this
    // cycle (it is the grace window); only OLDER generations reclaim
    AnnIndex.buildIvf(corpus(0 until 50), path, nlist = 8)
    assert(new java.io.File(s"$path/cells_v3").exists,
      "rebuild must land in the next generation")
    assert(new java.io.File(s"$path/cells_v2").exists,
      "the just-retired generation is the reader grace window")
    assert(!new java.io.File(s"$path/cells_v1").exists,
      "older generations must be reclaimed")
    // the rebuilt model rides its own generation dir, capped at meta.gen
    assert(new java.io.File(s"$path/centroids_v3").exists)
    assert(AnnIndex.data(spark, path).count() == 50)
    val q = corpus(0 until 50).where(col("vec_id") < 3)
    assert(AnnIndex.ivfTopK(spark, path, q, k = 2, nprobe = 3).count() == 6)
    // the NEXT maintenance cycle (a compact) retires the grace dir
    AnnIndex.compact(spark, path)
    assert(!new java.io.File(s"$path/cells_v2").exists &&
      new java.io.File(s"$path/cells_v3").exists &&
      new java.io.File(s"$path/cells_v4").exists)
    // and searches still resolve the gen-3 model under the gen-4 meta
    assert(AnnIndex.ivfTopK(spark, path, q, k = 2, nprobe = 3).count() == 6)
    // a SECOND rebuild over the compacted store: gen 5; cells_v3
    // reclaimed (older than the retired v4), v4 kept as grace. The MODEL
    // grace is the dir a gen-4 reader RESOLVES — centroids_v3 — so it is
    // kept; the gen-0 bare centroids (two rebuilds stale) reclaim.
    AnnIndex.buildIvf(corpus(0 until 60), path, nlist = 8)
    assert(new java.io.File(s"$path/cells_v5").exists &&
      new java.io.File(s"$path/cells_v4").exists &&
      !new java.io.File(s"$path/cells_v3").exists)
    assert(new java.io.File(s"$path/centroids_v5").exists &&
      new java.io.File(s"$path/centroids_v3").exists &&
      !new java.io.File(s"$path/centroids").exists)
    assert(AnnIndex.data(spark, path).count() == 60)
  }

  test("kind repurposing grace-retires the other kind's dirs (round 15)") {
    // ADVICE r14: buildIvf over an existing PQ store (and vice versa)
    // deleted the other kind's CURRENT codes/books immediately — a
    // concurrent reader of the previous kind mid-query lost its planned
    // files. The repurposed build now retires the other kind under the
    // same grace window as a same-kind rebuild; the NEXT maintenance
    // cycle (any build/compact, whose prev meta is already the new kind)
    // reclaims it fully.
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildPq(corpus(0 until 30), path, m = 4, ksub = 8)
    assert(new java.io.File(s"$path/codes").exists &&
      new java.io.File(s"$path/books").exists)
    // repurpose to IVF: the pq reader's resolvable gen-0 dirs SURVIVE
    AnnIndex.buildIvf(corpus(0 until 30), path, nlist = 8)
    assert(new java.io.File(s"$path/cells_v1").exists)
    assert(new java.io.File(s"$path/codes").exists &&
      new java.io.File(s"$path/books").exists,
      "the previous kind's current generation is the reader grace window")
    val q = corpus(0 until 30).where(col("vec_id") < 3)
    assert(AnnIndex.ivfTopK(spark, path, q, k = 2, nprobe = 3).count() == 6)
    // next same-kind maintenance cycle: the pq leftovers reclaim
    AnnIndex.buildIvf(corpus(0 until 40), path, nlist = 8)
    assert(!new java.io.File(s"$path/codes").exists &&
      !new java.io.File(s"$path/books").exists,
      "repurposed-kind dirs reclaim one maintenance cycle later")
    assert(new java.io.File(s"$path/cells_v1").exists &&
      new java.io.File(s"$path/cells_v2").exists)
    // ...and the mirror direction: PQ over an IVF store
    val path2 = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildIvf(corpus(0 until 30), path2, nlist = 8)
    AnnIndex.buildPq(corpus(0 until 30), path2, m = 4, ksub = 8)
    assert(new java.io.File(s"$path2/cells").exists &&
      new java.io.File(s"$path2/centroids").exists,
      "ivf dirs survive the pq repurposing as the grace window")
    AnnIndex.buildPq(corpus(0 until 40), path2, m = 4, ksub = 8)
    assert(!new java.io.File(s"$path2/cells").exists &&
      !new java.io.File(s"$path2/centroids").exists)
  }

  test("PQ compact: codes fold per id-bucket, rankings unchanged") {
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildPq(corpus(0 until 30), path, m = 4, ksub = 8)
    (30 until 60).grouped(10).foreach(g =>
      AnnIndex.appendPq(corpus(g.head until g.head + 10), path))
    val before = AnnIndex.dataFileCount(spark, path)
    val q = corpus(0 until 60).where(col("vec_id") < 5)
    val resBefore = canon(AnnIndex.pqTopK(spark, path, q, k = 4))
    AnnIndex.compact(spark, path)
    assert(AnnIndex.dataFileCount(spark, path) < before)
    assert(AnnIndex.data(spark, path).count() == 60)
    assert(canon(AnnIndex.pqTopK(spark, path, q, k = 4)) == resBefore)
  }

  test("round-15 soak: concurrent searches during appends, rebuilds, compactions") {
    // The generational machinery (gen+1 cutover, pointer-capped model
    // resolution, one-cycle grace retirement) has so far been spec'd with
    // SEQUENTIAL steps; this drives a live reader through the full
    // maintenance lifecycle. The grace contract is "a reader that planned
    // against the old listing keeps its files for one maintenance cycle" —
    // the writer barriers on the reader completing at least one full
    // query between operations, so no reader ever spans two cycles
    // (the documented operating envelope), and then every search must
    // succeed with the full result set: no FAILED_READ_FILE, no partial
    // top-k, no stale-model mix.
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildIvf(corpus(0 until 30), path, nlist = 8)
    val q = corpus(0 until 30).where(col("vec_id") < 3)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val completed = new java.util.concurrent.atomic.AtomicLong(0)
    val reader = new Thread(() =>
      try while (!stop.get()) {
        val n = AnnIndex.ivfTopK(spark, path, q, k = 2, nprobe = 3).count()
        assert(n == 6, s"partial search result: $n rows")
        completed.incrementAndGet(): Unit
      } catch { case t: Throwable => errs.add(t) })
    reader.start()
    def barrier(): Unit = {
      val at = completed.get()
      val t0 = System.nanoTime()
      while (completed.get() < at + 1 && errs.isEmpty &&
        System.nanoTime() - t0 < 60e9) Thread.sleep(10)
    }
    try {
      (30 until 60).grouped(10).foreach { g =>
        barrier()
        AnnIndex.appendIvf(corpus(g.head until g.head + 10), path)
      }
      barrier()
      AnnIndex.compact(spark, path)
      barrier()
      AnnIndex.buildIvf(corpus(0 until 70), path, nlist = 8) // full rebuild
      barrier()
      AnnIndex.compact(spark, path)
      barrier()
    } finally { stop.set(true); reader.join(120000) }
    assert(errs.isEmpty,
      s"reader failed during maintenance: ${Option(errs.peek()).map(_.toString)}")
    assert(completed.get() >= 7, s"reader starved: ${completed.get()} queries")
    assert(AnnIndex.data(spark, path).count() == 70)
  }

  test("index invalidation: dim or kind mismatch fails loudly") {
    val base = corpus(0 until 40)
    val path = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.buildIvf(base, path, nlist = 8)
    // a different embedding space (other dim) must not silently mix in
    val otherDim = Seq((100L, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](AnnIndex.appendIvf(otherDim, path))
    assert(e1.getMessage.contains("dim"))
    // reading an IVF store through the PQ entry point fails loudly
    val e2 = intercept[IllegalArgumentException](
      AnnIndex.pqTopK(spark, path, base.limit(1), k = 1))
    assert(e2.getMessage.contains("not pq"))
    val e3 = intercept[IllegalArgumentException](
      AnnIndex.appendPq(base, path))
    assert(e3.getMessage.contains("not pq"))
  }
}
