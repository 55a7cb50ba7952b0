package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: exact dedup is a hash-groupBy (one shuffle, map-side
  * combine). MinHash-LSH computes signatures IN-ROW (Column expressions over
  * the shingle array — no explode, codegen'd), then shuffles only the tiny
  * `(band, signature)` pairs; candidate pairs come from an equi-join on the
  * band key, which Catalyst executes as a shuffled hash join keyed on the
  * band signature. At 100 TB the heavy text never moves — only doc ids and
  * 16-byte band keys.
  */
object Dedup {

  /** Exact duplicate groups by content hash: one row per distinct content
    * with its representative (min id) and copy count. */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(md5(text).as("content_hash"))
      .agg(min(id).as("representative"), count(lit(1)).as("n_copies"))

  /** Keep one representative row per distinct content (min id wins). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** MinHash value for one seed: min over shingles of md5(seed:shingle)
    * (lexicographic min over hex — engine-portable, no 64-bit int needed). */
  private def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(seed + ":"), s))))

  /** LSH band keys: `bands` bands × `rows` minhashes per band, each band key
    * the md5 of its concatenated row-minima. Returns the docs frame with an
    * `array<struct<band:int, sig:string>>` column `lsh_bands`. */
  def withLshBands(docs: DataFrame, text: Column, bands: Int = 4, rows: Int = 4): DataFrame = {
    val sh = TextOps.shingles(text)
    val bandCols = (0 until bands).map { b =>
      val sig = md5(concat_ws("|", (0 until rows).map(r => minhash(sh, b * rows + r)): _*))
      struct(lit(b).as("band"), sig.as("sig"))
    }
    docs.withColumn("lsh_bands", array(bandCols: _*))
  }

  /** Candidate near-duplicate pairs (id_a < id_b) from MinHash-LSH: docs
    * sharing at least one band signature. */
  def minhashCandidates(docs: DataFrame, id: Column, text: Column,
                        bands: Int = 4, rows: Int = 4): DataFrame = {
    val withBands = withLshBands(docs.select(id.as("doc_id"), text.as("__text")),
      col("__text"), bands, rows)
    val exploded = withBands
      .select(col("doc_id"), explode(col("lsh_bands")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.sig").as("sig"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity between all pairs of the given docs
    * (use on a pre-filtered subset or LSH candidates — O(n²)). */
  def ngramJaccardPairs(docs: DataFrame, id: Column, text: Column,
                        threshold: Double): DataFrame = {
    val withSh = docs.select(id.as("doc_id"),
      array_distinct(TextOps.shingles(text)).as("sh"))
    val a = withSh.as("a")
    val b = withSh.as("b")
    a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash: 32-bit signature from per-token md5s — bit k of the signature
    * is 1 when the sum over tokens of (bit k set ? +1 : -1) is positive.
    * In-row, codegen-friendly; pairs within small Hamming distance are
    * near-dups. Returns signature as Long (0..2^32). */
  def simhash(text: Column, bits: Int = 32): Column = {
    val toks = TextOps.tokens(text)
    // per-token 32-bit value from the first 8 hex chars of md5
    val hashes = transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val bitCols = (0 until bits).map { k =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, k).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash signatures. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
