package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash index — the dedup family's signature table as a durable
  * storage artifact instead of a per-session cache.
  *
  * The reference builds its attribute index at ingest and answers every
  * query from it (`src/attributes.h`); [[Dedup]]'s stage memo replicates
  * that within a session. This object completes the story across sessions
  * and clusters: [[build]] writes the `(doc_id, mins)` signature table as
  * parquet once, [[append]] maintains it incrementally as new documents
  * arrive (batch increments or a streaming `foreachBatch`), and the
  * candidate/star-edge readers derive band buckets from the STORED
  * signatures — the shingle/md5 kernel never re-reads a document that is
  * already indexed.
  *
  * Scale shape: the index is ~`k` longs per document (vs the document's
  * kilobytes of text), partitionable and bucketable like any parquet table;
  * appends anti-join on `doc_id` only. Readers shuffle `(doc_id, 16-byte
  * band sig)` rows exactly like the from-scratch path, so every downstream
  * property (bucket-local pairs, star-edge linearity) carries over.
  */
object TextIndex {

  // ---------------------------------------------- generational layout
  // Rebuilds are GENERATIONAL since round 15 (the overwrite audit after
  // the ANN-soak meta hole): the sibling pointer file `${path}.gen`
  // names the live generation (the bare `path` for gen 0, `${path}_v{g}`
  // after), a rebuild writes the next generation beside the current one
  // and flips the pointer with one atomic move, and the just-retired
  // generation stays on disk as the reader grace window — appends never
  // delete anything and land in the current generation.
  private def genOf(path: String): Long = {
    val p = new java.io.File(s"$path.gen")
    if (!p.isFile) 0L
    else try new String(java.nio.file.Files.readAllBytes(p.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    catch { case _: Exception => 0L }
  }

  private def dataDir(path: String, g: Long): String =
    if (g == 0L) path else s"${path}_v$g"

  /** The generation-current signature directory. */
  def currentDir(path: String): String = dataDir(path, genOf(path))

  /** Build (or rebuild) the signature index for a corpus — rename-free:
    * a rebuild over a live index lands in the next generation and cuts
    * over via the pointer; generations older than the just-retired one
    * reclaim. */
  def build(docs: DataFrame, id: Column, text: Column, path: String,
            k: Int = 16): Unit = {
    val cur = genOf(path)
    val rebuild = new java.io.File(dataDir(path, cur)).isDirectory
    val next = if (rebuild) cur + 1 else cur
    Dedup.minhashSignatures(docs, id, text, k)
      .write.mode("overwrite").parquet(dataDir(path, next))
    if (rebuild) {
      val pf = new java.io.File(s"$path.gen")
      val tmp = new java.io.File(pf.toString + "_tmp")
      java.nio.file.Files.write(tmp.toPath,
        next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp.toPath, pf.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      (0L until cur).foreach { g =>
        graft.Fs.rmTree(new java.io.File(dataDir(path, g)))
      }
    }
  }

  /** The stored `(doc_id, mins)` signature table. */
  def signatures(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(currentDir(path))

  /** Incrementally index new documents: signatures are computed for docs
    * whose `doc_id` is not yet present and appended — existing entries are
    * never rewritten (signatures are content-deterministic, so re-sending
    * an indexed doc is a no-op). Parquet append is the storage-format
    * analogue of the ingest-time index update; under a concurrent-writer
    * regime route it through the same writer lock as catalog commits. */
  def append(newDocs: DataFrame, id: Column, text: Column, path: String,
             k: Int = 16): Unit = {
    val spark = newDocs.sparkSession
    val fresh = Dedup.minhashSignatures(newDocs, id, text, k)
    val existing =
      try signatures(spark, path).select(col("doc_id"))
      catch { case _: org.apache.spark.sql.AnalysisException =>
        build(newDocs, id, text, path, k); return }
    fresh.join(existing, Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(currentDir(path))
  }

  private def bandRowsFromIndex(spark: SparkSession, path: String,
                                bands: Int, rows: Int): DataFrame = {
    val bandUdf = udf(Dedup.bandSigFromMins(bands, rows))
    signatures(spark, path)
      .select(col("doc_id"), explode(bandUdf(col("mins"))).as("b"))
      .select(col("doc_id"), col("b._1").as("band"), col("b._2").as("sig"))
  }

  /** Candidate pairs from the stored index — byte-identical to
    * [[Dedup.minhashCandidates]] over the indexed corpus, without touching
    * any document text. */
  def candidatePairs(spark: SparkSession, path: String,
                     bands: Int = 4, rows: Int = 4): DataFrame =
    Dedup.pairsFromBandRows(bandRowsFromIndex(spark, path, bands, rows))

  /** Spanning-star edges from the stored index — byte-identical to
    * [[Dedup.minhashStarEdges]] over the indexed corpus. */
  def starEdges(spark: SparkSession, path: String,
                bands: Int = 4, rows: Int = 4): DataFrame =
    Dedup.starFromBandRows(bandRowsFromIndex(spark, path, bands, rows))
}
