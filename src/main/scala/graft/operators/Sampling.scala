package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus mixing: membership depends only on the
  * row's id (md5 60-bit hash mod 100), so samples are reproducible across
  * runs, engines and cluster sizes, can be unioned consistently across
  * tables, and never need a shuffle — it's a plain filter at scan speed.
  * The standard way training mixes weight their sources. */
object Sampling {

  /** Stable 0..99 percentile bucket for an id (md5 first 15 hex chars as a
    * 60-bit int, the engine-portable recipe used across this codebase). */
  def hashBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"), lit(100L))

  /** Keep ~pct% of rows, deterministically by id. */
  def deterministicSample(df: DataFrame, id: Column, pct: Int): DataFrame =
    df.where(hashBucket(id) < pct)

  /** Deterministic train/val/test assignment by id-hash percentile:
    * buckets [0,train) -> train, [train,train+val) -> val, rest -> test.
    * A plain projection — no shuffle, stable across runs, engines and
    * cluster sizes, and consistent with [[deterministicSample]] so a
    * sampled corpus splits the same way as the full one. */
  def trainValTestSplit(df: DataFrame, id: Column,
                        trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    df.withColumn("split",
      when(hashBucket(id) < trainPct, "train")
        .when(hashBucket(id) < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Per-stratum rates: keep ~rates(stratum)% of each stratum's rows
    * (strata absent from the map are dropped) — source-weighted corpus
    * mixing in one filter. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
                       rates: Map[String, Int]): DataFrame = {
    val rate = rates.foldLeft(lit(0): Column) { case (acc, (k, v)) =>
      when(stratum === k, lit(v)).otherwise(acc)
    }
    df.where(hashBucket(id) < rate)
  }

  /** Cap rows per key: keep the first `k` rows of each key by `order`
    * (deterministic — the domain/source caps dedup pipelines apply so one
    * crawl domain can't dominate a training mix). One window rank over a
    * single shuffle on the key; at 100 TB this is the standard top-k-per-
    * group plan (rank computes per partition after hash-partitioning by
    * key, no global sort). */
  def capPerKey(df: DataFrame, key: Column, order: Column, k: Int): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(order.asc)
    df.withColumn("__rk", row_number().over(w)).where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Temperature-based source rebalancing: downsample each source so the
    * mixture follows `n_s^alpha` (alpha < 1 flattens the source
    * distribution — the multi-corpus/multilingual rebalancing rule). Each
    * source keeps `n_s^(alpha-1) / max_s' n_s'^(alpha-1)` of its rows — the
    * smallest source keeps 100%, dominant ones shed — decided per row by
    * the same portable id-hash bucket as [[deterministicSample]].
    *
    * Scale shape: one tiny per-source count agg (broadcast back), then a
    * scan-speed filter. No shuffle of the data itself, reproducible on any
    * cluster size. Adds `keep_frac` (the source's keep fraction). */
  def temperatureMix(df: DataFrame, id: Column, source: Column,
                     alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(source.as("__src"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", pow(col("__n"), alpha - 1))
    val maxW = counts.agg(max(col("__w")).as("__mw"))
    val rates = counts.crossJoin(broadcast(maxW))
      .select(col("__src"), (col("__w") / col("__mw")).as("keep_frac"))
    df.join(broadcast(rates), source === col("__src"))
      .where(hashBucket(id) < col("keep_frac") * 100)
      .drop("__src")
  }

  /** Sequence packing for training batches: per stream (e.g. source), docs
    * are laid out in `order` as one concatenated token stream and cut into
    * `budget`-token training sequences; each doc's `pack` is the sequence
    * its FIRST token lands in (`token_offset div budget` — the concat-then-
    * chunk pipeline every LLM pretraining mix runs). Adds `token_offset` and
    * `pack`.
    *
    * One window (exclusive running sum) over a single shuffle on the stream
    * key — packing is embarrassingly parallel across streams, and within a
    * stream the running sum is the standard rank plan. No state, no driver
    * loop, deterministic on any cluster size. */
  def packSequences(df: DataFrame, stream: Column, order: Column,
                    tokenCount: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stream).orderBy(order.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("token_offset",
        coalesce(sum(tokenCount.cast("long")).over(w), lit(0L)))
      // integer floor-div: the double-division route is only exact for
      // power-of-two budgets (…9999 doubles truncate one pack too low)
      .withColumn("pack", expr(s"token_offset div $budget"))
  }

  /** DSIR-style importance weights (data selection via importance
    * resampling): score every document by the log-likelihood ratio of its
    * tokens under a hashed-unigram model of the `isTarget` corpus vs the
    * background, then sample high-weight docs to shift a raw corpus toward
    * the target distribution. Returns `(doc_id, n_tokens, weight)` with
    * `weight = Σ_tok log2( p_target(bucket(tok)) / p_background(bucket(tok)) )`,
    * Laplace-smoothed (+1 per bucket).
    *
    * Scale shape: tokens hash into `buckets` feature buckets (md5-derived,
    * engine-portable), so the model tables are buckets-sized regardless of
    * corpus vocabulary; both models build in ONE two-phase conditional
    * aggregation pass, the 1-row totals broadcast back, and scoring is the
    * token explode joined to the (tiny, AQE-broadcast) bucket table plus
    * one groupBy(doc). Per-token log-ratios round to 4 decimals and sum as
    * DECIMAL(28,4) — order-independent, bit-identical across engines (the
    * [[graft.operators.TextOps.unigramBits]] exactness recipe). */
  /** Per-group distribution drift: KL divergence (bits) of each group's
    * hashed-unigram token distribution from the whole-corpus distribution —
    * the monitoring signal behind corpus-mix curation (a source whose
    * language drifts from the mix shows a rising KL; a near-duplicate of
    * the mix shows ~0). Smoothing and hashing follow [[dsirWeights]]:
    * tokens hash into `buckets` md5-derived feature buckets so the model
    * tables are bucket-sized regardless of vocabulary, and both
    * distributions are Laplace-smoothed (+1 per bucket).
    *
    * `KL(group ‖ corpus) = Σ_b p_gb · log2(p_gb / q_b)` with
    * `p_gb = (c_gb + 1) / (n_g + B)`, `q_b = (c_b + 1) / (n + B)`.
    * Per-bucket terms round to 8 decimals and sum as DECIMAL(28,8) — the
    * [[dsirWeights]] / `TextOps.unigramBits` engine-exactness recipe, at a
    * scale fitting THESE terms: a smoothed bucket term is O(1/buckets)
    * (~1e-4), so the 4-decimal rounding the per-token recipes use would
    * drown the value in rounding bias (measured: it drove the provably
    * non-negative KL to −0.45); 8 decimals bound the total error by
    * buckets·5e-9.
    *
    * Scale shape: ONE token-explode pass feeds a (group, bucket) hash agg
    * (partial-combined to groups×buckets rows per task); corpus totals
    * derive from the same table by a second tiny agg — the text is scanned
    * once and never shuffled. Returns `(group, n_tokens, kl_bits)`. */
  def groupDriftKL(docs: DataFrame, group: Column, text: Column,
                   buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // hashed buckets via the compiled kernel (one md5 pass per row, the
    // tokenBucketsExpr parity twin proves byte-identity); the token strings
    // never materialize as rows
    val gb = docs.select(group.as("group"),
        explode(TextOps.tokenBucketsKernel(buckets)(text)).as("b"))
      .groupBy(col("group"), col("b"))
      .agg(count(lit(1)).as("c_gb"))
    // bucket-sized frames from here on: corpus per-bucket counts, per-group
    // totals, and the 1-row corpus total all derive from the gb table
    val cbHit = gb.groupBy(col("b")).agg(sum(col("c_gb")).as("c_b"))
    // the sum must run over the FULL bucket domain, not just corpus-hit
    // buckets: an unhit bucket still carries a positive smoothed term
    // (p = 1/(n_g+B) vs q = 1/(n+B)), and dropping those terms biases the
    // provably non-negative KL downward (observed negative totals)
    val ng = gb.groupBy(col("group")).agg(sum(col("c_gb")).as("n_g"))
    val n = cbHit.agg(sum(col("c_b")).as("n"))
    val cb = docs.sparkSession.range(buckets).toDF("b")
      .join(cbHit, Seq("b"), "left")
      .select(col("b"), coalesce(col("c_b"), lit(0L)).as("c_b"))
    val full = ng.crossJoin(broadcast(cb)).crossJoin(broadcast(n))
      .join(gb, Seq("group", "b"), "left")
      .select(col("group"), col("n_g"), col("n"),
        coalesce(col("c_gb"), lit(0L)).as("c_gb"), col("c_b"))
    val pgb = (col("c_gb") + 1).cast("double") / (col("n_g") + buckets)
    val qb = (col("c_b") + 1).cast("double") / (col("n") + buckets)
    full
      .select(col("group"), col("n_g"),
        round(pgb * log2(pgb / qb), 8).as("__term"))
      .groupBy(col("group"))
      .agg(max(col("n_g")).as("n_tokens"),
        sum(col("__term").cast("decimal(28,8)")).cast("double").as("kl_bits"))
  }

  /** Smoothed hashed-unigram bucket model of a reference corpus, as a
    * driver-held probability array (buckets-sized — ≤ a few KB, the
    * broadcast side of any drift comparison): `q_b = (c_b + 1) / (n + B)`
    * with [[TextOps.tokenBucketsKernel]] hashing. The baseline
    * [[graft.streaming.Streams.driftStream]] monitors live windows
    * against. */
  def bucketModel(docs: DataFrame, text: Column, buckets: Int = 4096): Array[Double] = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val counts = docs
      .select(explode(TextOps.tokenBucketsKernel(buckets)(text)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect()
    val arr = Array.fill(buckets)(0L)
    counts.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    val n = arr.sum
    arr.map(c => (c + 1).toDouble / (n + buckets))
  }

  def dsirWeights(docs: DataFrame, id: Column, text: Column,
                  isTarget: Column, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // drop the token string right after hashing and materialize the narrow
    // (doc_id, target, bucket) rows ONCE (lazy checkpoint): the model agg
    // and the scoring join both read them, and the md5-per-token pass —
    // the scan-heavy half of the query — would otherwise run twice
    val toks = docs.select(id.as("doc_id"), isTarget.as("__t"),
        explode(TextOps.tokenBucketsKernel(buckets)(text)).as("b"))
      .localCheckpoint(false)
    val model = toks.groupBy(col("b")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("cb"))
    val totals = model.agg(
      sum(col("ct")).as("tt"), sum(col("cb")).as("tb"))
    val scoredBuckets = model.crossJoin(broadcast(totals))
      .select(col("b"), round(log2(
        ((col("ct") + 1).cast("double") / (col("tt") + buckets)) /
          ((col("cb") + 1).cast("double") / (col("tb") + buckets))), 4)
        .as("__lr"))
    toks.join(scoredBuckets, "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        graft.functions.AggFns.dsum(col("__lr")).as("weight"))
  }
}
