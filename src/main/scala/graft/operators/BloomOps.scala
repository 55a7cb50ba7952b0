package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

/** Bloom-filter pre-filtered joins — the explicit form of runtime filter
  * pushdown for the decontamination / membership shapes of a corpus
  * pipeline.
  *
  * At 100 TB the semi-join "keep corpus rows whose key appears in this
  * reference set" shuffles the entire corpus on the key just to discard
  * most of it. When the reference set fits a few-MB bitset, the right plan
  * is: build a Bloom filter over the reference keys once, broadcast it,
  * drop non-members AT SCAN SPEED on the corpus side, and only then run the
  * exact join on the (tiny) surviving fraction to remove the false
  * positives. The result is EXACTLY the semi-join — the Bloom stage only
  * prunes — but the shuffle carries `matches + fpp·corpus` rows instead of
  * the corpus. Spark's own runtime row-group filtering applies the same
  * idea inside AQE; this operator makes it available to any pipeline stage
  * (and to keys Spark would not derive a runtime filter for).
  */
object BloomOps {

  /** A temp key-column name that cannot collide with `large`'s columns —
    * a fixed `__k` made the join condition ambiguous the moment a caller's
    * frame already carried a `__k` (e.g. a frame built by another operator
    * in this library). */
  private def tempKey(large: DataFrame): String =
    Iterator.from(0).map(i => if (i == 0) "__bloom_k" else s"__bloom_k$i")
      .find(n => !large.columns.contains(n)).get

  /** `expectedNumItems` for the filter: approximate distinct keys with 10%
    * headroom (0 ⟺ the key side is truly empty — HLL of a non-empty input
    * is ≥ 1, so the callers' empty-side early-outs stay exact). */
  private def sizeDistinct(canon: DataFrame, kn: String): Long = {
    val approx = canon.agg(approx_count_distinct(col(kn))).head().getLong(0)
    if (approx == 0L) 0L else approx + approx / 10 + 16
  }

  /** Exact left-semi join of `large` on `small`'s keys with a broadcast
    * Bloom pre-filter on the large side.
    *
    * `expectedFpp` sizes the filter (bits ≈ −n·ln(fpp)/ln²2 — 1.2 MB per
    * million keys at 1%). Key columns may be any integral or string type;
    * both sides are probed/built through the same canonical encoding, so
    * filter semantics never depend on the parquet physical type. */
  def bloomSemiJoin(large: DataFrame, largeKey: Column,
                    small: DataFrame, smallKey: Column,
                    expectedFpp: Double = 0.01): DataFrame = {
    val kn = tempKey(large)
    // r17: NO .distinct() anywhere — a semi-join is EXISTS, so a duplicated
    // key side changes nothing, and the old shape paid the key-dedup shuffle
    // THREE times (sizing count, filter build, verify join). The sizing
    // count over raw keys is a safe upper bound for expectedNumItems
    // (duplicate inserts set the same bits, so the realized fpp only
    // improves); both remaining passes are shuffle-free scans.
    val keys = small.select(smallKey.as(kn)).where(col(kn).isNotNull)
    val integral = keys.schema.head.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case StringType => false
      case other => throw new IllegalArgumentException(
        s"bloomSemiJoin key must be integral or string, got $other")
    }
    val canon = if (integral) keys.select(col(kn).cast("long").as(kn)) else keys
    // small side by contract — size the filter by (approximate) DISTINCT
    // keys, not raw rows: a duplicate-heavy reference side would otherwise
    // over-allocate the broadcast bitset proportionally to row count
    // (~1.2 MB per million at 1% fpp). Same single partial-agg job shape as
    // a count; the +10% headroom absorbs the HLL estimate's error band, and
    // an underestimate only nudges the realized fpp — the verify join keeps
    // the result exact either way.
    val n = sizeDistinct(canon, kn)
    if (n == 0) return large.where(lit(false)) // semi-join with nothing: empty
    val bf = canon.stat.bloomFilter(kn, n, expectedFpp)
    val might =
      if (integral) {
        val u = udf((x: java.lang.Long) => x != null && bf.mightContainLong(x))
        u(largeKey.cast("long"))
      } else {
        val u = udf((x: String) => x != null && bf.mightContainString(x))
        u(largeKey)
      }
    // exact verify join confined to the pre-filtered fraction; AQE
    // broadcasts the key side when it is small enough
    large.where(might)
      .join(canon, largeKey.cast(if (integral) "long" else "string") === col(kn),
        "left_semi")
  }

  /** Exact left-anti join (decontamination: DROP rows whose key is in the
    * reference set). The Bloom filter cannot pre-filter the anti side —
    * a false positive would wrongly drop a row — so the filter instead
    * splits the corpus at scan speed: definite non-members (`mightContain`
    * false — the overwhelming majority) pass through WITHOUT joining, and
    * only possible members go through the exact anti-join. */
  def bloomAntiJoin(large: DataFrame, largeKey: Column,
                    small: DataFrame, smallKey: Column,
                    expectedFpp: Double = 0.01): DataFrame = {
    val kn = tempKey(large)
    // r17: no .distinct() — anti-join semantics ignore right-side dups and
    // the dedup shuffle ran three times (see bloomSemiJoin)
    val keys = small.select(smallKey.as(kn)).where(col(kn).isNotNull)
    val integral = keys.schema.head.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case StringType => false
      case other => throw new IllegalArgumentException(
        s"bloomAntiJoin key must be integral or string, got $other")
    }
    val canon = if (integral) keys.select(col(kn).cast("long").as(kn)) else keys
    val n = sizeDistinct(canon, kn) // distinct-keyed sizing, see bloomSemiJoin
    if (n == 0) return large // anti-join with nothing drops nothing
    val bf = canon.stat.bloomFilter(kn, n, expectedFpp)
    val might =
      if (integral) {
        val u = udf((x: java.lang.Long) => x != null && bf.mightContainLong(x))
        u(largeKey.cast("long"))
      } else {
        val u = udf((x: String) => x != null && bf.mightContainString(x))
        u(largeKey)
      }
    val suspects = large.where(might)
      .join(canon, largeKey.cast(if (integral) "long" else "string") === col(kn),
        "left_anti")
    large.where(!might).unionByName(suspects)
  }
}
