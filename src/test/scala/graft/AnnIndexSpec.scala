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
