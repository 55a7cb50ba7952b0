package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.AggFns._
import graft.functions.TimeFns
import graft.operators.{EventOps, Segments, TextOps}

import graft.Queries._

/** Registry family: LLM data-pipeline operators — dedup (exact/MinHash/
  * SimHash/n-gram), text quality/normalize/langid/PII, BPE, sampling/
  * packing/splits, bloom joins, drift, multimodal decode.
  * Split from Queries.scala in round 13 (pure mechanical move). */
object QueriesPipeline {

  val entries: Seq[Q] = Seq(

    // Exact dedup by content hash (hash-groupBy).
    Q("q_dedup_exact",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Dedup.exactGroups(d, col("doc_id"), col("text"))
      },
      Some("""SELECT md5(text) AS content_hash, MIN(doc_id) AS representative,
        COUNT(*) AS n_copies FROM documents GROUP BY 1""")),

    // MinHash + LSH candidate pairs (shingle -> minhash -> band -> bucket join).
    Q("q_minhash_lsh_pairs",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Dedup.minhashCandidates(d, col("doc_id"), col("text"))
      },
      Some(s"""WITH $MinhashPairsCtes
        $MinhashPairsSelect""")),

    // Edit-distance verification of the LSH candidates — the exact-check
    // stage after recall: keep pairs whose normalized Levenshtein
    // similarity clears 0.97. Quadratic cost confined to candidate rows.
    Q("q_editdist_pairs",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val pairs = graft.operators.Dedup.minhashCandidates(d, col("doc_id"), col("text"))
        graft.operators.Dedup.editDistanceVerify(d, col("doc_id"), col("text"),
          pairs, minSim = 0.97)
      },
      Some(s"""WITH $MinhashPairsCtes,
        pairs AS ($MinhashPairsSelect)
        SELECT p.id_a, p.id_b, levenshtein(da.text, db.text) AS edit_dist,
          round(1 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
                / greatest(greatest(len(da.text), len(db.text)), 1), 4) AS edit_sim
        FROM pairs p
        JOIN documents da ON p.id_a = da.doc_id
        JOIN documents db ON p.id_b = db.doc_id
        WHERE round(1 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
              / greatest(greatest(len(da.text), len(db.text)), 1), 4) >= 0.97""")),

    // Near-dup clustering: connected components over the LSH candidate
    // pairs (iterative min-label propagation; representative = min doc_id).
    // Oracle: recursive-CTE reachability over the same pair SQL.
    Q("q_neardup_components",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val pairs = graft.operators.Dedup.minhashCandidates(d, col("doc_id"), col("text"))
        graft.operators.Dedup.connectedComponents(pairs, d.select("doc_id"))
          .groupBy(col("label").as("component"))
          .agg(count(lit(1)).as("n_members"))
          .where(col("n_members") > 1)
      },
      Some(s"""WITH RECURSIVE $MinhashPairsCtes,
        pairs AS ($MinhashPairsSelect),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(v, l) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, r.l FROM edges e JOIN reach r ON e.dst = r.v),
        lab AS (SELECT v, MIN(l) AS label FROM reach GROUP BY v)
        SELECT label AS component, COUNT(*) AS n_members
        FROM lab GROUP BY label""")),

    // Same components from spanning-star edges (n-1 per bucket instead of
    // n(n-1)/2 pairs) — the hot-bucket-safe 100 TB path. Shares the
    // all-pairs oracle: star linkage preserves bucket connectivity exactly,
    // so the clusters (and this whole result) are identical.
    Q("q_neardup_star",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val edges = graft.operators.Dedup.minhashStarEdges(d, col("doc_id"), col("text"))
        graft.operators.Dedup.connectedComponents(edges, d.select("doc_id"))
          .groupBy(col("label").as("component"))
          .agg(count(lit(1)).as("n_members"))
          .where(col("n_members") > 1)
      },
      Some(s"""WITH RECURSIVE $MinhashPairsCtes,
        pairs AS ($MinhashPairsSelect),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(v, l) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, r.l FROM edges e JOIN reach r ON e.dst = r.v),
        lab AS (SELECT v, MIN(l) AS label FROM reach GROUP BY v)
        SELECT label AS component, COUNT(*) AS n_members
        FROM lab GROUP BY label""")),

    // END-TO-END near-dedup (star edges → components → keep each cluster's
    // min-id representative; unclustered docs keep themselves): the one-call
    // corpus dedup pipeline, oracle-checked against the recursive-CTE
    // clustering — kept docs are exactly those NOT labeled into someone
    // else's component.
    Q("q_near_dedup",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Dedup.nearDedup(d, "doc_id", "text")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_kept_id"))
      },
      Some(s"""WITH RECURSIVE $MinhashPairsCtes,
        pairs AS ($MinhashPairsSelect),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(v, l) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, r.l FROM edges e JOIN reach r ON e.dst = r.v),
        lab AS (SELECT v, MIN(l) AS label FROM reach GROUP BY v)
        SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_kept_id
        FROM documents
        WHERE doc_id NOT IN (SELECT v FROM lab WHERE label <> v)
        GROUP BY source""")),

    // Substring-level duplication profile (ExactSubstr signal, Lee et al.
    // 2022): per-doc coverage of token spans whose 8-token window occurs
    // more than once in the corpus. Posting kernel + hash agg + per-doc
    // interval union — text never shuffles.
    Q("q_dup_span_coverage",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Dedup.duplicatedSpanCoverage(d, col("doc_id"), col("text"))
      },
      Some("""WITH t AS (
          SELECT doc_id, list_filter(string_split(text,' '), x -> len(x)>0) AS toks
          FROM documents),
        n AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM t WHERE len(toks) > 0),
        g AS (
          SELECT doc_id, n_tokens,
            unnest(list_transform(range(1, n_tokens - 8 + 2),
              i -> {'pos': i - 1,
                    'h': ('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 15))::BIGINT})) AS s
          FROM n WHERE n_tokens >= 8),
        g2 AS (SELECT doc_id, n_tokens, s.pos AS pos, s.h AS h FROM g),
        dup AS (SELECT h FROM g2 GROUP BY h HAVING COUNT(*) > 1),
        dp AS (SELECT g2.doc_id, g2.n_tokens, g2.pos FROM g2 JOIN dup USING (h)),
        w AS (SELECT doc_id, n_tokens, pos,
                LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM dp),
        c AS (SELECT doc_id, SUM(LEAST(8, COALESCE(nxt, pos + 8) - pos)) AS dup_tokens
              FROM w GROUP BY doc_id)
        SELECT n.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
          CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
          CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / n.n_tokens AS dup_fraction
        FROM n LEFT JOIN c USING (doc_id)""")),

    // Exact n-gram Jaccard near-dup pairs on a bounded subset (O(n²) tier;
    // LSH above is the scale path).
    Q("q_ngram_jaccard_pairs",
      (s, dir) => {
        val d = Tables.documents(s, dir).where(col("doc_id") < 100)
        graft.operators.Dedup.ngramJaccardPairs(d, col("doc_id"), col("text"), 0.02)
      },
      Some(NgramJaccardOracle)),

    // Same exact Jaccard via the inverted shingle index (posting self-join +
    // pair count) — the linear-in-shared-shingles scale path; must produce
    // byte-identical pairs to the cross-join tier, so it shares its oracle.
    Q("q_ngram_jaccard_indexed",
      (s, dir) => {
        val d = Tables.documents(s, dir).where(col("doc_id") < 100)
        graft.operators.Dedup.ngramJaccardPairsIndexed(d, col("doc_id"), col("text"), 0.02)
      },
      Some(NgramJaccardOracle)),

    // Post-LSH candidate scoring: estimated Jaccard = fraction of the 16
    // minhash positions two signatures share — orders candidates without
    // re-reading any text (one signature scan + a join on the tiny pair
    // list). Exact dyadic fraction (n/16), so the double compares bit-equal.
    Q("q_minhash_jaccard_est",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Dedup.minhashJaccardEstimate(d, col("doc_id"), col("text"))
      },
      Some {
        import graft.operators.Dedup.{kmA, kmB, MinhashP => MP}
        val aList = (0 until 16).map(kmA).mkString("[", ",", "]")
        val bList = (0 until 16).map(kmB).mkString("[", ",", "]")
        s"""WITH $MinhashPairsCtes,
          m AS (
            SELECT doc_id, list_transform(range(0,16), i ->
              list_aggregate(list_transform(hs, v -> (v * ($aList)[i+1] + ($bList)[i+1]) % $MP), 'min')) AS mins
            FROM h),
          pairs AS ($MinhashPairsSelect)
          SELECT p.id_a, p.id_b,
            CAST(len(list_filter(range(1,17), i -> a.mins[i] = b.mins[i])) AS DOUBLE) / 16 AS est_jaccard
          FROM pairs p JOIN m a ON p.id_a = a.doc_id JOIN m b ON p.id_b = b.doc_id"""
      }),

    // Document chunking: 64-token windows with 16 tokens of overlap — the
    // pre-embedding split for RAG/context-bounded training. In-row Column
    // exprs (sequence + slice), exploded only at the output boundary.
    Q("q_doc_chunks",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .repartition(s.sparkContext.defaultParallelism)
        TextOps.chunk(d, col("text"), size = 64, overlap = 16)
          .select(col("doc_id"), col("chunk_ix"), col("chunk_text"),
            col("chunk_tokens"))
      },
      Some("""WITH t AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
          FROM documents),
        c AS (
          SELECT doc_id, toks, len(toks) AS n,
            CASE WHEN len(toks) <= 64 THEN 1
                 ELSE 1 + CAST(CEIL((len(toks) - 64) / 48.0) AS INTEGER) END AS nc
          FROM t WHERE len(toks) > 0)
        SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_ix,
          array_to_string(list_slice(toks, u.i * 48 + 1, u.i * 48 + 64), ' ') AS chunk_text,
          CAST(LEAST(64, n - u.i * 48) AS INTEGER) AS chunk_tokens
        FROM c, LATERAL (SELECT unnest(range(0, c.nc)) AS i) u""")),

    // BM25 keyword-search top-k: per-term tf evaluates in-row over the
    // token array; corpus stats (N, avgdl, per-term df) reduce to one
    // broadcast stats row — two scans total at any corpus size. The oracle
    // mirrors the exact arithmetic association, scores rounded to 4dp.
    Q("q_bm25_topk",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .repartition(s.sparkContext.defaultParallelism)
        graft.operators.Similarity.bm25TopK(d, col("doc_id"), col("text"),
          Seq("join", "vector", "slow"), k = 25)
      },
      Some(s"""WITH $Bm25ScoredCtes
        SELECT doc_id, ROUND(raw, 4) AS score FROM sc
        ORDER BY score DESC, doc_id ASC LIMIT 25""")),

    // Hybrid retrieval: BM25 keyword recall (top-25) -> exact cosine rerank
    // against a query embedding (vec_id 0) -> top-10. The lexical stage
    // bounds the vector work to candidate rows; both stages are the
    // already-verified kernels.
    Q("q_hybrid_search",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .repartition(s.sparkContext.defaultParallelism)
        val bm = graft.operators.Similarity.bm25TopK(d, col("doc_id"), col("text"),
          Seq("join", "vector", "slow"), k = 25)
        val emb = Tables.embeddings(s, dir)
        val q = emb.where(col("vec_id") === 0).select(col("embedding").as("__qe"))
        val reranked = bm
          .join(emb.select(col("vec_id").as("doc_id"), col("embedding").as("__ce")), "doc_id")
          .crossJoin(broadcast(q))
          .withColumn("cos",
            graft.operators.Similarity.cosine(col("__qe"), col("__ce")))
        val w = Window.orderBy(col("cos").desc, col("doc_id").asc)
        reranked.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 10)
          .select(col("rank"), col("doc_id"), col("score"), col("cos"))
      },
      Some(s"""WITH $Bm25ScoredCtes,
        bm AS (SELECT doc_id, ROUND(raw, 4) AS score FROM sc
               ORDER BY score DESC, doc_id ASC LIMIT 25),
        q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        r AS (SELECT bm.doc_id, bm.score,
                list_dot_product(qe, ce.embedding::DOUBLE[])
                  / (sqrt(list_dot_product(qe, qe))
                     * sqrt(list_dot_product(ce.embedding::DOUBLE[], ce.embedding::DOUBLE[]))) AS cos
              FROM bm JOIN embeddings ce ON bm.doc_id = ce.vec_id, q),
        ranked AS (SELECT ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id ASC) AS rank,
                          doc_id, score, cos FROM r)
        SELECT rank, doc_id, score, cos FROM ranked WHERE rank <= 10""")),

    // Document fingerprinting (k smallest shingle hashes).
    Q("q_doc_fingerprints",
      (s, dir) => {
        // single-file local input = one partition; spread the kernel
        val d = Tables.documents(s, dir)
          .repartition(s.sparkContext.defaultParallelism)
        d.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fingerprint"))
      },
      Some("""WITH t AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
          FROM documents),
        s AS (
          SELECT doc_id,
            CASE WHEN len(toks) >= 3
                 THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                 ELSE [] END AS sh
          FROM t)
        SELECT doc_id, array_to_string(list_sort(list_transform(sh, x -> md5(x)))[1:4], '|') AS fingerprint
        FROM s""")),

    // Text quality signals aggregated per language.
    Q("q_text_quality_by_lang",
      (s, dir) => {
        val d = TextOps.withQualitySignals(Tables.documents(s, dir))
        d.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            dsum(col("n_tokens").cast("double")).as("total_tokens"),
            davg(col("stopword_ratio")).as("avg_stopword_ratio"),
            davg(col("mean_token_len")).as("avg_token_len"))
      },
      Some(s"""WITH t AS (
          SELECT lang, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
          FROM documents),
        q AS (
          SELECT lang, len(toks) AS n_tokens,
            CASE WHEN len(toks) > 0
                 THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to','is'], x))) AS DOUBLE) / len(toks)
                 ELSE 0.0 END AS stopword_ratio,
            CASE WHEN len(toks) > 0
                 THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
                 ELSE 0.0 END AS mean_token_len
          FROM t)
        SELECT lang, COUNT(*) AS n_docs,
          ${dsumSql("n_tokens")} AS total_tokens,
          ${dsumSql("stopword_ratio")} / COUNT(stopword_ratio) AS avg_stopword_ratio,
          ${dsumSql("mean_token_len")} / COUNT(mean_token_len) AS avg_token_len
        FROM q GROUP BY lang""")),

    // Language-ID heuristic vs labeled lang (confusion counts).
    Q("q_langid_confusion",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.withColumn("predicted", TextOps.langIdHeuristic(col("text")))
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n_docs"))
      },
      Some("""WITH t AS (
          SELECT lang, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
          FROM documents)
        SELECT lang,
          CASE WHEN list_contains(toks, 'the') THEN 'en'
               WHEN list_contains(toks, 'le') THEN 'fr'
               WHEN list_contains(toks, 'der') THEN 'de'
               WHEN list_contains(toks, 'el') THEN 'es'
               ELSE 'unknown' END AS predicted,
          COUNT(*) AS n_docs
        FROM t GROUP BY 1, 2""")),

    // Per-source corpus report (round 8): the first query a data engineer
    // runs against a new corpus — volume, token mass, exact-dup rate and
    // language mix per source, one scan + one hash agg.
    Q("q_corpus_report",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(graft.operators.TextOps.tokenCount(col("text")).cast("long"))
            .as("total_tokens"),
          countDistinct(md5(col("text"))).as("distinct_docs"),
          round(lit(1.0) - countDistinct(md5(col("text"))).cast("double") /
            count(lit(1)).cast("double"), 6).as("dup_rate"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"))
      },
      Some("""SELECT source,
          COUNT(*) AS n_docs,
          CAST(SUM(len(list_filter(string_split(text, ' '), x -> len(x) > 0))) AS BIGINT) AS total_tokens,
          COUNT(DISTINCT md5(text)) AS distinct_docs,
          ROUND(1.0 - COUNT(DISTINCT md5(text)) / (COUNT(*) * 1.0), 6) AS dup_rate,
          COUNT(DISTINCT lang) AS n_langs,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source""")),

    // SimHash signatures (near-dup fingerprint; rows-only oracle).
    Q("q_simhash",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.select(col("doc_id"), graft.operators.Dedup.simhash(col("text")).as("simhash"))
      },
      // Per-token md5 bit votes, replicated in SQL; empty/tokenless docs
      // keep signature 0 via the left join.
      Some("""WITH t AS (
          SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> len(x)>0)) AS tok
          FROM documents),
        h AS (
          SELECT doc_id, CAST(('0x'||substr(md5(tok),1,8)) AS BIGINT) AS h FROM t),
        v AS (
          SELECT doc_id, k.k, SUM(CASE WHEN (h >> k.k) & 1 = 1 THEN 1 ELSE -1 END) AS vote
          FROM h CROSS JOIN (SELECT unnest(range(32)) AS k) k
          GROUP BY doc_id, k.k),
        s AS (
          SELECT doc_id, CAST(SUM(CASE WHEN vote > 0 THEN 1::BIGINT << CAST(k AS INT) ELSE 0 END) AS BIGINT) AS simhash
          FROM v GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
        FROM documents d LEFT JOIN s USING (doc_id)""")),

    // SimHash near-dup pairs within Hamming distance 3, via banded chunks
    // (pigeonhole-exact — identical to brute force, which the oracle runs
    // over the same 60-bit signatures: 15-hex-char token hashes, 60 vote
    // positions).
    Q("q_simhash_neardup",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Dedup.simhashNearDupPairs(d, col("doc_id"), col("text"))
      },
      Some("""WITH t AS (
          SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> len(x)>0)) AS tok
          FROM documents),
        h AS (
          SELECT doc_id, CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) AS h FROM t),
        v AS (
          SELECT doc_id, k.k, SUM(CASE WHEN (h >> k.k) & 1 = 1 THEN 1 ELSE -1 END) AS vote
          FROM h CROSS JOIN (SELECT unnest(range(60)) AS k) k
          GROUP BY doc_id, k.k),
        sg AS (
          SELECT doc_id, CAST(SUM(CASE WHEN vote > 0 THEN 1::BIGINT << CAST(k AS INT) ELSE 0 END) AS BIGINT) AS simhash
          FROM v GROUP BY doc_id),
        sigs AS (
          SELECT d.doc_id, COALESCE(sg.simhash, 0) AS simhash
          FROM documents d LEFT JOIN sg USING (doc_id))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""")),

    // Multimodal: binary assets with typed metadata (text bytes stand in for
    // image/audio payloads; plumbing is the point).
    Q("q_binary_assets",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id").as("asset_id"), encode(col("text"), "UTF-8").as("asset"),
            col("source"))
        graft.operators.Multimodal.withMetadata(d)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_assets"),
            sum(col("meta.byte_len")).as("total_bytes"),
            countDistinct(col("meta.content_hash")).as("n_distinct"))
      },
      Some("""SELECT source, COUNT(*) AS n_assets,
        CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        COUNT(DISTINCT md5(text)) AS n_distinct
        FROM documents GROUP BY source""")),

    // Multimodal decode — REAL: synthesize a spec-compliant PNG per doc
    // (dims derived from doc columns), then decode it with the JDK's
    // ImageIO reader inside mapPartitions. The oracle predicts the
    // round-trip arithmetically, so a decoder that mis-reads dimensions,
    // drops channels, or fails to parse (decoded=false -> channels=0)
    // hash-mismatches.
    Q("q_multimodal_decode",
      (s, dir) => {
        val m = graft.operators.Multimodal
        // ImageIO encode+decode ≫ shuffle cost per row -> spread the
        // under-parallel cached scan before the kernel
        val d = Tables.spread(Tables.documents(s, dir)
            .select(col("doc_id").as("asset_id"), col("n_chars")))
          .select(col("asset_id"),
            m.pngColumn(col("asset_id"),
              (lit(1) + col("asset_id") % 48).cast("int"),
              (lit(1) + col("n_chars") % 32).cast("int")).as("asset"))
        m.decodeImage(d)
          .groupBy(col("width"))
          .agg(count(lit(1)).as("n_assets"), max(col("height")).as("max_height"),
            sum(when(col("decoded"), col("channels"))).as("sum_channels"))
      },
      Some("""WITH d AS (
          SELECT doc_id, 1 + (doc_id % 48) AS width, 1 + (n_chars % 32) AS height
          FROM documents)
        SELECT CAST(width AS INT) AS width, COUNT(*) AS n_assets,
          CAST(MAX(height) AS INT) AS max_height,
          CAST(3 * COUNT(*) AS BIGINT) AS sum_channels
        FROM d GROUP BY width""")),

    // Real audio decode: synthesized PCM16 WAVs (deterministic rate/length
    // per asset) decoded by the JDK's AudioSystem inside mapPartitions;
    // oracle = closed form over the synthesis parameters (frame count =
    // sample count, duration = floor(n*1000/rate)).
    Q("q_audio_decode",
      (s, dir) => {
        val m = graft.operators.Multimodal
        val d = Tables.spread(Tables.documents(s, dir)
            .select(col("doc_id").as("asset_id"), col("n_chars")))
          .select(col("asset_id"),
            m.wavColumn(col("asset_id"),
              element_at(
                array(lit(8000), lit(16000), lit(22050), lit(44100)),
                (col("asset_id") % 4 + 1).cast("int")),
              (lit(100) + col("n_chars") % 400).cast("int")).as("asset"))
        m.decodeAudio(d)
          .groupBy(col("sample_rate"))
          .agg(count(lit(1)).as("n_assets"),
            sum(col("duration_ms")).as("total_ms"),
            sum(when(col("decoded"), col("n_frames"))).as("total_frames"))
      },
      Some("""WITH d AS (
          SELECT doc_id,
            CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000
                 WHEN 2 THEN 22050 ELSE 44100 END AS rate,
            100 + (n_chars % 400) AS n
          FROM documents)
        SELECT CAST(rate AS INT) AS sample_rate, COUNT(*) AS n_assets,
          CAST(SUM((n * 1000) // rate) AS BIGINT) AS total_ms,
          CAST(SUM(n) AS BIGINT) AS total_frames
        FROM d GROUP BY rate""")),

    // Decode fallback plumbing: bytes no JDK reader accepts (text bytes
    // standing in for codec formats) take the deterministic stand-in path
    // with decoded=false — SQL-expressible: width from byte length, height
    // from the (signed) first UTF-8 byte.
    Q("q_multimodal_fallback",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id").as("asset_id"), encode(col("text"), "UTF-8").as("asset"))
        graft.operators.Multimodal.decodeImage(d)
          .where(!col("decoded"))
          .groupBy(col("width"))
          .agg(count(lit(1)).as("n_assets"), max(col("height")).as("max_height"))
      },
      Some("""WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS blen,
            CASE WHEN octet_length(encode(text)) = 0 THEN NULL
                 ELSE CAST(('0x'||substr(hex(encode(text)),1,2)) AS INT) END AS b0u
          FROM documents),
        d AS (
          SELECT doc_id, 1 + (blen % 64) AS width,
            1 + (CASE WHEN b0u IS NULL THEN 0
                      ELSE ABS(CASE WHEN b0u >= 128 THEN b0u - 256 ELSE b0u END) END % 64) AS height
          FROM b)
        SELECT CAST(width AS INT) AS width, COUNT(*) AS n_assets, CAST(MAX(height) AS INT) AS max_height
        FROM d GROUP BY width""")),

    // Cross-source exact dedup: within each content-hash group keep the
    // copy from the most-preferred source (curated dump beats crawl), then
    // lowest id. One min_by hash aggregation — no window, no join.
    Q("q_dedup_priority",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Dedup.exactDedupPrioritized(d, col("doc_id"),
            col("text"), col("source"), Seq("src3", "src1", "src0"))
          .groupBy(col("kept_source"))
          .agg(count(lit(1)).as("n_groups"), sum(col("n_copies")).as("n_docs"))
      },
      Some("""WITH g AS (
          SELECT md5(text) AS content_hash,
            arg_min(source, printf('%02d|%012d',
              CASE WHEN source = 'src3' THEN 0
                   WHEN source = 'src1' THEN 1
                   WHEN source = 'src0' THEN 2 ELSE 3 END, doc_id)) AS kept_source,
            COUNT(*) AS n_copies
          FROM documents GROUP BY md5(text))
        SELECT kept_source, COUNT(*) AS n_groups,
          CAST(SUM(n_copies) AS BIGINT) AS n_docs
        FROM g GROUP BY kept_source""")),

    // PII scan + redaction audit: per source, regex hit counts for emails /
    // IPv4s / phones and the chars a redaction pass would remove. Pure
    // codegen'd regexp over the scan — the compliance sweep every corpus
    // release runs. (Synthetic corpus carries no PII: the zeros ARE the
    // expected audit result, and the spec proves the patterns on real
    // fixtures.)
    Q("q_pii_scan",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.select(col("source"), TextOps.piiCounts(col("text")).as("c"),
            (length(col("text")) - length(TextOps.piiRedact(col("text"))))
              .cast("long").as("delta"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("c.emails").cast("long")).as("emails"),
            sum(col("c.ipv4s").cast("long")).as("ipv4s"),
            sum(col("c.phones").cast("long")).as("phones"),
            sum(col("delta")).as("chars_removed"))
      },
      Some(s"""SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(len(regexp_extract_all(text, '${TextOps.EmailPattern}'))) AS BIGINT) AS emails,
          CAST(SUM(len(regexp_extract_all(text, '${TextOps.Ipv4Pattern}'))) AS BIGINT) AS ipv4s,
          CAST(SUM(len(regexp_extract_all(text, '${TextOps.PhonePattern}'))) AS BIGINT) AS phones,
          CAST(SUM(len(text) - len(
            regexp_replace(regexp_replace(regexp_replace(text,
              '${TextOps.EmailPattern}', '<EMAIL>', 'g'),
              '${TextOps.Ipv4Pattern}', '<IP>', 'g'),
              '${TextOps.PhonePattern}', '<PHONE>', 'g'))) AS BIGINT) AS chars_removed
        FROM documents GROUP BY source""")),

    // Sequence packing (concat-then-chunk): per source stream, docs ordered
    // by id form one token stream cut into 256-token training sequences;
    // a doc belongs to the pack its first token lands in. One window over
    // one shuffle on source; packs then aggregate per (source, pack).
    Q("q_pack_sequences",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("source"), col("doc_id"), TextOps.tokenCount(col("text")).as("toks"))
        graft.operators.Sampling.packSequences(d, col("source"), col("doc_id"),
            col("toks"), budget = 256)
          .groupBy(col("source"), col("pack"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks").cast("long")).as("pack_tokens"),
            min(col("token_offset")).as("first_offset"))
      },
      Some("""WITH t AS (
          SELECT source, doc_id,
            len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS toks
          FROM documents),
        o AS (
          SELECT source, doc_id, toks,
            CAST(COALESCE(SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
          FROM t)
        SELECT source, off // 256 AS pack, COUNT(*) AS n_docs,
          CAST(SUM(toks) AS BIGINT) AS pack_tokens, MIN(off) AS first_offset
        FROM o GROUP BY source, off // 256""")),

    // Composite quality filter (C4/Gopher-style rule cascade): every doc
    // gets a verdict — first failing rule or 'kept' — and per-(source,
    // verdict) counts audit the cut. Pure scan-speed Column expressions.
    Q("q_quality_filter",
      (s, dir) => {
        val d = TextOps.withQualitySignals(Tables.documents(s, dir))
        val verdict = when(col("n_tokens") < 30, "too_short")
          .when(col("stopword_ratio") < 0.02, "low_stopword")
          .when(col("mean_token_len") > 5.0, "long_tokens")
          .otherwise("kept")
        d.groupBy(col("source"), verdict.as("verdict"))
          .agg(count(lit(1)).as("n_docs"),
            dsum(col("n_tokens").cast("double")).as("tokens"))
      },
      Some(s"""WITH t AS (
          SELECT source, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
          FROM documents),
        q AS (
          SELECT source, len(toks) AS n_tokens,
            CASE WHEN len(toks) > 0
                 THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to','is'], x))) AS DOUBLE) / len(toks)
                 ELSE 0.0 END AS stopword_ratio,
            CASE WHEN len(toks) > 0
                 THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
                 ELSE 0.0 END AS mean_token_len
          FROM t),
        v AS (
          SELECT source, n_tokens,
            CASE WHEN n_tokens < 30 THEN 'too_short'
                 WHEN stopword_ratio < 0.02 THEN 'low_stopword'
                 WHEN mean_token_len > 5.0 THEN 'long_tokens'
                 ELSE 'kept' END AS verdict
          FROM q)
        SELECT source, verdict, COUNT(*) AS n_docs,
          ${dsumSql("n_tokens")} AS tokens
        FROM v GROUP BY source, verdict""")),

    // BPE merge training: the tokenizer-vocabulary induction step. Corpus
    // touched once (distinct-word frequency table); each merge iteration
    // aggregates pair counts over that table only. nMerges=12 is a fixed
    // literal, so the driver loop unrolls into a 12-step chained-CTE DuckDB
    // oracle (bpeMergeCtes) — hash-exact, no longer rows-only. Excluded
    // from the bench sweep (12 iterations = 12 jobs).
    Q("q_bpe_merges",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val merges = TextOps.trainBpeMerges(d, col("text"), nMerges = 12)
        import s.implicits._
        merges.zipWithIndex
          .map { case ((a, b), i) => (i + 1L, a, b) }
          .toDF("rank", "lhs", "rhs")
      },
      Some(s"""WITH ${bpeMergeCtes(12)}
        SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs FROM merges"""),
      bench = false),

    // Tokenizer application: encode the corpus with the merges trained
    // above; per-source sub-word token economy. The encode loop (apply the
    // lowest-rank applicable merge until none apply) is a recursive CTE
    // over the DISTINCT vocab: a word row recurses only while some merge's
    // paren-wrapped pair occurs in its encoded form, so the per-word
    // fixpoint is exactly the one non-recursing row.
    Q("q_bpe_encode",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val merges = TextOps.trainBpeMerges(d, col("text"), nMerges = 12)
        TextOps.bpeEncode(d, col("doc_id"), col("text"), merges)
          .join(d.select(col("doc_id"), col("source")), "doc_id")
          .groupBy(col("source"))
          .agg(sum(col("n_bpe_tokens")).as("bpe_tokens"),
            count(lit(1)).as("n_docs"))
      },
      Some(s"""WITH RECURSIVE ${bpeMergeCtes(12)},
        vocab AS MATERIALIZED (
          SELECT DISTINCT unnest(list_filter(string_split(text,' '), x -> len(x) > 0)) AS w
          FROM documents),
        enc AS (
          SELECT w, '(' || array_to_string(string_split(w,''), ')(') || ')' AS es FROM vocab
          UNION ALL
          SELECT e2.w, replace(e2.es, '('||mm.lhs||')('||mm.rhs||')', '('||mm.lhs||mm.rhs||')') AS es
          FROM (
            SELECT e.w, e.es,
              (SELECT MIN(m2.rank) FROM merges m2
                WHERE contains(e.es, '('||m2.lhs||')('||m2.rhs||')')) AS best
            FROM enc e) e2
          JOIN merges mm ON mm.rank = e2.best),
        final AS (
          SELECT w, len(string_split(substr(es, 2, len(es)-2), ')(')) AS ntok
          FROM enc e
          WHERE NOT EXISTS (SELECT 1 FROM merges m
                            WHERE contains(e.es, '('||m.lhs||')('||m.rhs||')'))),
        tok AS (
          SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> len(x) > 0)) AS w
          FROM documents),
        dc AS (
          SELECT t.doc_id, SUM(f.ntok) AS n FROM tok t JOIN final f USING (w) GROUP BY t.doc_id)
        SELECT d.source, CAST(SUM(dc.n) AS BIGINT) AS bpe_tokens, COUNT(*) AS n_docs
        FROM dc JOIN documents d USING (doc_id) GROUP BY d.source"""),
      bench = false),

    // Canonical text normalization (NFC + lower + control-strip + whitespace
    // collapse): the cleaning step ahead of exact/near dedup. Counts how
    // many raw docs collapse to each normalized form.
    Q("q_text_normalize",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.select(col("source"), TextOps.normalize(col("text")).as("norm"))
          .groupBy(col("source"))
          .agg(countDistinct(col("norm")).as("n_distinct"),
            count(lit(1)).as("n_docs"),
            sum(length(col("norm")).cast("long")).as("total_chars"))
      },
      Some("""WITH n AS (
          SELECT source,
            trim(regexp_replace(
              regexp_replace(lower(nfc_normalize(text)), '[\x00-\x20\x7f]', ' ', 'g'),
              ' +', ' ', 'g'), ' ') AS norm
          FROM documents)
        SELECT source, COUNT(DISTINCT norm) AS n_distinct, COUNT(*) AS n_docs,
          CAST(SUM(len(norm)) AS BIGINT) AS total_chars
        FROM n GROUP BY source""")),

    // Corpus vocabulary: top-k tokens by document frequency (stopword/vocab
    // derivation; explode -> hash agg -> tiny top-k).
    Q("q_top_tokens",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        TextOps.topTokens(d, col("text"), 20)
      },
      Some("""WITH t AS (
          SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
          FROM documents)
        SELECT token, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS occurrences
        FROM t GROUP BY token ORDER BY doc_freq DESC, token ASC LIMIT 20""")),

    // Gopher-style repetition quality filter: per-doc top-bigram fraction
    // and distinct-token ratio (compiled kernel, scan speed) plus the keep
    // verdict — summarized per language so the result is a stable small
    // table. Division happens once on exact integer counts in both engines.
    Q("q_repetition_filter",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        TextOps.repetitionFilter(d)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(col("keep"), 1)).as("n_kept"),
            dsum(col("top_bigram_frac")).as("sum_tb"),
            dsum(col("distinct_token_ratio")).as("sum_dr"))
      },
      Some(s"""WITH t AS (
          SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
          FROM documents),
        n AS (SELECT doc_id, lang, len(toks) AS n, len(list_distinct(toks)) AS nd FROM t),
        bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i + 1])) AS g
               FROM t WHERE len(toks) >= 2),
        mx AS (SELECT doc_id, MAX(c) AS mx FROM (
                 SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2) GROUP BY doc_id),
        sig AS (
          SELECT n.doc_id, n.lang,
            CASE WHEN n.n >= 2 THEN CAST(mx.mx AS DOUBLE) / (n.n - 1) ELSE 0.0 END AS tb,
            CASE WHEN n.n > 0 THEN CAST(n.nd AS DOUBLE) / n.n ELSE 0.0 END AS dr
          FROM n LEFT JOIN mx USING (doc_id))
        SELECT lang, COUNT(*) AS n_docs,
          COUNT(CASE WHEN tb <= 0.05 AND dr >= 0.4 THEN 1 END) AS n_kept,
          ${dsumSql("tb")} AS sum_tb,
          ${dsumSql("dr")} AS sum_dr
        FROM sig GROUP BY lang""")),

    // Per-source document caps (domain caps): keep the first 15 docs of
    // each source by doc_id — one window rank over a hash shuffle on the
    // key, the standard anti-domination step in corpus mixing.
    Q("q_source_caps",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Sampling.capPerKey(d, col("source"), col("doc_id"), 15)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            max(col("doc_id")).as("max_kept_id"))
      },
      Some("""WITH r AS (
          SELECT source, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk
          FROM documents)
        SELECT source, COUNT(*) AS n_kept, MAX(doc_id) AS max_kept_id
        FROM r WHERE rk <= 15 GROUP BY source""")),

    // Corpus-wide top bigrams by document frequency (n-gram statistics for
    // vocab/boilerplate analysis): in-row shingling, one explode + one
    // aggregation, tiny top-k sort.
    Q("q_bigram_topk",
      (s, dir) => {
        // ~200× explode amplification per doc: a 1-split scan would chain
        // the whole explode+agg to one core — spread qualifies here
        val d = Tables.spread(Tables.documents(s, dir))
        d.select(explode(TextOps.shingles(col("text"), 2)).as("bigram"),
            col("doc_id"))
          .groupBy(col("bigram"))
          .agg(countDistinct(col("doc_id")).as("doc_freq"),
            count(lit(1)).as("occurrences"))
          .orderBy(col("doc_freq").desc, col("bigram").asc)
          .limit(20)
      },
      Some("""WITH t AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
          FROM documents),
        b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS bigram
              FROM t WHERE len(toks) >= 2)
        SELECT bigram, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS occurrences
        FROM b GROUP BY bigram ORDER BY doc_freq DESC, bigram ASC LIMIT 20""")),

    // Benchmark decontamination: distinct word-8-gram overlap of every doc
    // against a held-out benchmark slice (doc_id < 25) — counts per
    // contamination level.
    Q("q_contamination",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        TextOps.contaminationCounts(
            d.where(col("doc_id") >= 25), d.where(col("doc_id") < 25))
          .groupBy(col("n_contaminated"))
          .agg(count(lit(1)).as("n_docs"))
      },
      Some("""WITH t AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
          FROM documents),
        g AS (
          SELECT doc_id,
            CASE WHEN len(toks) >= 8
                 THEN list_distinct(list_transform(range(1, len(toks) - 6),
                   i -> CAST(('0x' || substr(md5(list_aggregate(toks[i:i+7], 'string_agg', ' ')), 1, 15)) AS BIGINT)))
                 ELSE [] END AS grams
          FROM t),
        bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 25),
        corpus AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 25),
        hits AS (
          SELECT c.doc_id, COUNT(*) AS n
          FROM corpus c JOIN bench b USING (gram) GROUP BY c.doc_id),
        per_doc AS (
          SELECT d.doc_id, COALESCE(h.n, 0) AS n_contaminated
          FROM (SELECT doc_id FROM documents WHERE doc_id >= 25) d
          LEFT JOIN hits h USING (doc_id))
        SELECT CAST(n_contaminated AS BIGINT) AS n_contaminated, COUNT(*) AS n_docs
        FROM per_doc GROUP BY 1""")),

    // Deterministic stratified sampling (corpus mixing): per-source keep
    // rates over a stable id-hash bucket — reproducible across engines,
    // runs and cluster sizes; a scan-speed filter, no shuffle.
    // Deterministic 90/5/5 train/val/test split (id-hash percentiles, no
    // shuffle; the same recipe as deterministicSample so samples and splits
    // compose consistently).
    Q("q_train_val_test",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Sampling.trainValTestSplit(d, col("doc_id"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            dsum(length(col("text")).cast("double")).as("total_chars"))
      },
      Some("""WITH h AS (
          SELECT text,
            CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'train'
                 WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 95 THEN 'val'
                 ELSE 'test' END AS split
          FROM documents)
        SELECT split, COUNT(*) AS n_docs,
          CAST(SUM(CAST(CAST(LENGTH(text) AS DOUBLE) AS DECIMAL(28,4))) AS DOUBLE) AS total_chars
        FROM h GROUP BY split""")),

    Q("q_stratified_sample",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val rates = Map("src0" -> 50, "src1" -> 100, "src2" -> 25)
        graft.operators.Sampling.stratifiedSample(d, col("doc_id"), col("source"), rates)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), countDistinct(col("doc_id")).as("n_docs"))
      },
      Some("""WITH h AS (
          SELECT source, doc_id,
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
          FROM documents),
        kept AS (
          SELECT * FROM h
          WHERE bucket < CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 100
                                     WHEN 'src2' THEN 25 ELSE 0 END)
        SELECT source, COUNT(*) AS n_kept, COUNT(DISTINCT doc_id) AS n_docs
        FROM kept GROUP BY source""")),

    // Token counting: whitespace vs BPE-ish regex sub-word tokens per source.
    Q("q_token_counts",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.groupBy(col("source"))
          .agg(
            sum(TextOps.tokenCount(col("text")).cast("long")).as("ws_tokens"),
            sum(TextOps.bpeishTokenCount(col("text")).cast("long")).as("bpe_tokens"),
            count(lit(1)).as("n_docs"))
      },
      Some(s"""SELECT source,
        CAST(SUM(len(list_filter(string_split(text, ' '), x -> len(x) > 0))) AS BIGINT) AS ws_tokens,
        CAST(SUM(len(regexp_extract_all(text, '${TextOps.BpeishPattern}'))) AS BIGINT) AS bpe_tokens,
        COUNT(*) AS n_docs
        FROM documents GROUP BY source""")),

    // As-of join: each purchase picks up the latest at-or-before click of
    // the same person (union + one sorted window pass — no range join).
    // Oracle: DuckDB's native ASOF LEFT JOIN over the same pre-aggregated
    // right side.
    Q("q_asof_prior_click",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.where(col("event") === "purchase")
          .select("id", "stamp", "event_id", "value")
        val clicks = e.where(col("event") === "click")
          .groupBy(col("id"), col("stamp").as("click_stamp"))
          .agg(max(col("value")).as("click_value"))
        EventOps.asofJoin(purchases, clicks, "id", "stamp", "click_stamp",
          Seq("click_value"))
      },
      Some(s"""$E,
        l AS (SELECT id, stamp, event_id, value FROM e WHERE event = 'purchase'),
        r AS (SELECT id, stamp AS click_stamp, MAX(value) AS click_value
              FROM e WHERE event = 'click' GROUP BY 1, 2)
        SELECT l.id, l.stamp, l.event_id, l.value,
          r.click_stamp AS asof_click_stamp, r.click_value AS asof_click_value
        FROM l ASOF LEFT JOIN r ON l.id = r.id AND l.stamp >= r.click_stamp""")),

    // CCNet-style line dedup (boilerplate removal): lines present in more
    // than 390 distinct docs drop; docs reassemble in original order.
    // The synthetic corpus has no newlines, so "lines" are the
    // space-delimited tokens — same machinery, same oracle shape.
    Q("q_line_dedup",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        TextOps.lineDedup(d, col("doc_id"), col("text"), " ", 390L)
      },
      Some("""WITH ls AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        lines AS (SELECT doc_id, unnest(l) AS line,
                         unnest(generate_series(1, len(l))) AS pos FROM ls),
        nz AS (SELECT * FROM lines WHERE len(line) > 0),
        freq AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM nz GROUP BY 1),
        kept AS (SELECT n.doc_id, n.pos, n.line
                 FROM nz n JOIN freq f ON n.line = f.line WHERE f.df <= 390),
        agg AS (SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS text_clean,
                       COUNT(*) AS n_kept FROM kept GROUP BY 1)
        SELECT d.doc_id, COALESCE(a.text_clean, '') AS text_clean,
               COALESCE(a.n_kept, 0) AS n_kept
        FROM documents d LEFT JOIN agg a USING (doc_id)""")),

    // Unigram LM (perplexity-proxy) quality filter: bits/token under corpus
    // unigram frequencies; keep <= 4.95 (rare-token-heavy docs score high).
    Q("q_unigram_bits",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        TextOps.unigramBits(d, col("doc_id"), col("text"), keepMaxBits = 4.95)
      },
      Some("""WITH toks AS (SELECT doc_id,
            unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok
          FROM documents),
        cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
        tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM cnt),
        b AS (SELECT doc_id, round(-log2(cnt.c / tot.t), 4) AS bits
              FROM toks, cnt, tot WHERE toks.tok = cnt.tok)
        SELECT doc_id, COUNT(*) AS n_tokens,
          CAST(SUM(CAST(bits AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS bits_per_token,
          (CAST(SUM(CAST(bits AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)) <= 4.95 AS keep
        FROM b GROUP BY 1""")),

    // CCNet head/middle/tail: NTILE terciles of the unigram-LM
    // bits-per-token ranking (rank-based cut — no float-interpolated
    // percentile at any boundary). Global rank via distributed sort +
    // zipWithIndex, never a one-partition window.
    Q("q_perplexity_buckets",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.TextOps.perplexityBuckets(d, col("doc_id"), col("text"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            min(col("bits_per_token")).as("min_bits"),
            max(col("bits_per_token")).as("max_bits"))
      },
      Some("""WITH toks AS (SELECT doc_id,
            unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok
          FROM documents),
        cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
        tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM cnt),
        b AS (SELECT doc_id, round(-log2(cnt.c / tot.t), 4) AS bits
              FROM toks, cnt, tot WHERE toks.tok = cnt.tok),
        bdoc AS (SELECT doc_id, COUNT(*) AS n_tokens,
            CAST(SUM(CAST(bits AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS bits_per_token
          FROM b GROUP BY 1),
        nt AS (SELECT doc_id, n_tokens, bits_per_token,
            NTILE(3) OVER (ORDER BY bits_per_token ASC, doc_id ASC) AS bucket
          FROM bdoc)
        SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
          MIN(bits_per_token) AS min_bits, MAX(bits_per_token) AS max_bits
        FROM nt GROUP BY bucket""")),

    // One-pass column profiling over the corpus table: non-null count,
    // exact distinct, min/max per column — the data-quality gate.
    Q("q_profile_documents",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Profiling.profile(d,
          Seq("doc_id", "lang", "source", "n_chars"))
      },
      Some(Seq("doc_id", "lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS "column", COUNT($c) AS n_nonnull,
           COUNT(DISTINCT $c) AS n_distinct,
           CAST(MIN($c) AS VARCHAR) AS min_value,
           CAST(MAX($c) AS VARCHAR) AS max_value FROM documents"""
      }.mkString(" UNION ALL "))),

    // Temperature-based rebalancing (alpha = 0.5) over the skewed lang
    // distribution: each language keeps sqrt(n_min/n_lang) of its docs,
    // decided by the portable id-hash bucket — dominant langs shed rows.
    Q("q_temperature_mix",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Sampling.temperatureMix(d, col("doc_id"), col("lang"), 0.5)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            round(max(col("keep_frac")), 4).as("keep_frac"))
      },
      Some("""WITH c AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY 1),
        w AS (SELECT lang, pow(n, -0.5) AS w FROM c),
        m AS (SELECT MAX(w) AS mw FROM w),
        r AS (SELECT lang, w / mw AS keep_frac FROM w, m),
        kept AS (SELECT d.lang, r.keep_frac FROM documents d JOIN r USING (lang)
          WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
                < keep_frac * 100)
        SELECT lang, COUNT(*) AS n_kept, round(MAX(keep_frac), 4) AS keep_frac
        FROM kept GROUP BY 1""")),

    // DSIR-style importance weights: hashed-unigram log-likelihood ratio of
    // target (lang='en') vs background, per-token log2 rounded to 4
    // decimals and decimal-summed (the unigram_bits exactness recipe).
    // Top-20 docs the resampler would favor.
    Q("q_dsir_weights",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Sampling.dsirWeights(
            d, col("doc_id"), col("text"), col("lang") === "en")
          .orderBy(col("weight").desc, col("doc_id").asc)
          .limit(20)
      },
      Some("""WITH toks AS (
          SELECT doc_id, lang = 'en' AS t,
            unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok
          FROM documents),
        tb AS (
          SELECT doc_id, t,
            ('0x' || substr(md5(tok), 1, 6))::BIGINT % 4096 AS b
          FROM toks),
        model AS (
          SELECT b,
            SUM(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
            SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS cb
          FROM tb GROUP BY b),
        tot AS (SELECT SUM(ct) AS tt, SUM(cb) AS tb2 FROM model),
        lr AS (
          SELECT b, round(log2(
            ((ct + 1) / CAST(tt + 4096 AS DOUBLE)) /
            ((cb + 1) / CAST(tb2 + 4096 AS DOUBLE))), 4) AS lrv
          FROM model, tot),
        scored AS (
          SELECT tb.doc_id, COUNT(*) AS n_tokens,
            CAST(SUM(CAST(lrv AS DECIMAL(28,4))) AS DOUBLE) AS weight
          FROM tb JOIN lr USING (b) GROUP BY tb.doc_id)
        SELECT doc_id, n_tokens, weight FROM scored
        ORDER BY weight DESC, doc_id ASC LIMIT 20""")),

    // Bloom-filter pre-filtered semi-join: lineitems of urgent orders. The
    // Bloom stage drops non-members at scan speed before any shuffle; the
    // exact verify join removes false positives, so the result is EXACTLY
    // the plain semi-join the oracle computes.
    Q("q_bloom_semijoin",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val urgent = Tables.orders(s, dir)
          .where(col("o_orderpriority") === "1-URGENT")
        graft.operators.BloomOps.bloomSemiJoin(
            li, col("l_orderkey"), urgent, col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n_items,
          ${dsumSql("l_quantity")} AS sum_qty
        FROM lineitem
        WHERE l_orderkey IN (
          SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag""")),

    // Bloom pre-filtered DECONTAMINATION (anti-join): drop corpus docs whose
    // content fingerprint appears in the benchmark set. The filter splits
    // the corpus at scan speed — definite non-members bypass the join
    // entirely; only possible members pay the exact anti-join (a false
    // positive must never drop a clean row).
    Q("q_bloom_decontaminate",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val bench = d.where(col("doc_id") % 7 === 0)
          .select(md5(col("text")).as("fp"))
        graft.operators.BloomOps.bloomAntiJoin(
            d.withColumn("fp", md5(col("text"))), col("fp"), bench, col("fp"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
      },
      Some("""SELECT source, COUNT(*) AS n_kept,
          CAST(SUM(n_chars) AS BIGINT) AS chars_kept
        FROM documents
        WHERE md5(text) NOT IN (
          SELECT md5(text) FROM documents WHERE doc_id % 7 = 0)
        GROUP BY source""")),

    // Corpus-mix drift monitoring: KL divergence (bits) of each source's
    // hashed-unigram distribution from the whole corpus — per-bucket terms
    // round to 4 decimals and decimal-sum (the dsir/unigram_bits exactness
    // recipe), so the oracle lands on identical bits.
    Q("q_source_drift",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Sampling.groupDriftKL(d, col("source"), col("text"))
          .withColumnRenamed("group", "source")
      },
      Some("""WITH toks AS (
          SELECT source AS grp,
            unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok
          FROM documents),
        tb AS (SELECT grp,
            ('0x' || substr(md5(tok), 1, 6))::BIGINT % 4096 AS b
          FROM toks),
        gb AS (SELECT grp, b, COUNT(*) AS c_gb FROM tb GROUP BY 1, 2),
        cbh AS (SELECT b, SUM(c_gb) AS c_b FROM gb GROUP BY 1),
        cb AS (SELECT r.range AS b, COALESCE(cbh.c_b, 0) AS c_b
          FROM range(4096) r LEFT JOIN cbh ON cbh.b = r.range),
        ng AS (SELECT grp, SUM(c_gb) AS n_g FROM gb GROUP BY 1),
        nt AS (SELECT SUM(c_b) AS n FROM cbh),
        fl AS (SELECT ng.grp, ng.n_g, cb.b, cb.c_b, nt.n,
            COALESCE(gb.c_gb, 0) AS c_gb
          FROM ng CROSS JOIN cb CROSS JOIN nt
          LEFT JOIN gb ON gb.grp = ng.grp AND gb.b = cb.b),
        terms AS (SELECT grp, n_g,
            round(((c_gb + 1) / CAST(n_g + 4096 AS DOUBLE)) *
              log2(((c_gb + 1) / CAST(n_g + 4096 AS DOUBLE)) /
                   ((c_b + 1) / CAST(n + 4096 AS DOUBLE))), 8) AS t
          FROM fl)
        SELECT grp AS source, CAST(MAX(n_g) AS BIGINT) AS n_tokens,
          CAST(SUM(CAST(t AS DECIMAL(28,8))) AS DOUBLE) AS kl_bits
        FROM terms GROUP BY grp""")),

    // Real image RESIZE: synthesized PNGs decoded and nearest-neighbor
    // downsampled to 8×8 inside mapPartitions; the exact per-channel pixel
    // sums of the resized raster are recomputed arithmetically by the
    // oracle from the synthesis formula (PNG is lossless, the NN mapping is
    // integer floor — every byte is a closed form of the parameters).
    Q("q_image_resize",
      (s, dir) => {
        val m = graft.operators.Multimodal
        val d = Tables.spread(Tables.documents(s, dir)
            .select(col("doc_id").as("asset_id"), col("n_chars")))
          .select(col("asset_id"),
            m.pngColumn(col("asset_id"),
              (lit(1) + col("asset_id") % 48).cast("int"),
              (lit(1) + col("n_chars") % 32).cast("int")).as("asset"))
        m.resizeImage(d, 8, 8)
          .where(col("decoded"))
          .select(col("asset_id"), col("sum_r"), col("sum_g"), col("sum_b"))
      },
      Some("""WITH d AS (
          SELECT doc_id AS asset_id, 1 + (doc_id % 48) AS w, 1 + (n_chars % 32) AS h
          FROM documents),
        g AS (SELECT gx.range AS x, gy.range AS y
          FROM range(8) gx CROSS JOIN range(8) gy),
        px AS (SELECT d.asset_id,
            ((d.asset_id * 2654435761 + ((g.x * d.w) // 8) * 31
              + ((g.y * d.h) // 8) * 17) & 16777215) AS rgb
          FROM d CROSS JOIN g)
        SELECT asset_id,
          CAST(SUM((rgb >> 16) & 255) AS BIGINT) AS sum_r,
          CAST(SUM((rgb >> 8) & 255) AS BIGINT) AS sum_g,
          CAST(SUM(rgb & 255) AS BIGINT) AS sum_b
        FROM px GROUP BY asset_id""")),

    // Real FRAME SAMPLING: synthesized multi-image GIFs (one shrinking
    // grayscale frame per index) opened with the JDK's ImageReader, every
    // 2nd frame decoded; per-frame dimensions and frame counts are closed
    // forms of the synthesis parameters.
    Q("q_video_frames",
      (s, dir) => {
        val m = graft.operators.Multimodal
        val d = Tables.spread(Tables.documents(s, dir)
            .select(col("doc_id").as("asset_id")))
          .select(col("asset_id"),
            m.gifColumn(col("asset_id"),
              (lit(4) + col("asset_id") % 16).cast("int"),
              (lit(3) + col("asset_id") % 12).cast("int"),
              (lit(1) + col("asset_id") % 7).cast("int")).as("asset"))
        m.sampleFrames(d, 2)
      },
      Some("""WITH d AS (
          SELECT doc_id AS asset_id, 4 + (doc_id % 16) AS w,
            3 + (doc_id % 12) AS h, 1 + (doc_id % 7) AS n
          FROM documents),
        f AS (SELECT d.asset_id, d.w, d.h, d.n, r.range AS fi
          FROM d CROSS JOIN range(7) r
          WHERE r.range < d.n AND r.range % 2 = 0)
        SELECT asset_id, CAST(fi AS INT) AS frame_idx,
          CAST(GREATEST(1, w - fi) AS INT) AS width,
          CAST(GREATEST(1, h - fi) AS INT) AS height,
          CAST(n AS INT) AS n_frames, TRUE AS decoded
        FROM f""")),

    // Corpus-governance overlap matrix: pairwise source-level shingle
    // Jaccard over 60-bit hash postings (text never shuffles). Top-10
    // most-overlapping source pairs.
    Q("q_source_overlap",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Dedup.sourceShingleOverlap(d, col("source"), col("text"))
          .orderBy(col("jaccard").desc, col("source_a").asc, col("source_b").asc)
          .limit(10)
      },
      Some("""WITH post AS (
          SELECT DISTINCT source AS src,
            ('0x' || substr(md5(g), 1, 15))::BIGINT % 2147483647 AS h
          FROM (
            SELECT source, unnest(list_distinct(sh)) AS g FROM (
              SELECT source, list_transform(
                range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
              FROM (SELECT source,
                list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
                FROM documents)))),
        sizes AS (SELECT src, COUNT(*) AS n FROM post GROUP BY 1),
        pairs AS (
          SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS common
          FROM post a JOIN post b ON a.h = b.h AND a.src < b.src
          GROUP BY 1, 2)
        SELECT source_a, source_b,
          CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
          common,
          round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.src = source_a
        JOIN sizes sb ON sb.src = source_b
        ORDER BY jaccard DESC, source_a ASC, source_b ASC LIMIT 10""")),

    // Bounded-heap top-k per key: the aggregator's partial buffer caps at k,
    // so map-side combine ships keys×k entries through the shuffle where the
    // window-rank form sorts each key's whole history on one reducer.
    // Oracle = that window-rank form (identical deterministic ordering).
    Q("q_topk_agg",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val f = graft.functions.TopK.topK(3)
        li.groupBy(col("l_returnflag"))
          .agg(f(col("l_extendedprice"), col("l_orderkey")).as("top"))
          .select(col("l_returnflag"), posexplode(col("top")).as(Seq("i", "e")))
          .select(col("l_returnflag"), (col("i") + 1).cast("int").as("rank"),
            col("e.ord").as("l_extendedprice"), col("e.payload").as("l_orderkey"))
      },
      Some("""SELECT l_returnflag, CAST(rank AS INT) AS rank,
          l_extendedprice, l_orderkey
        FROM (
          SELECT l_returnflag, l_extendedprice, l_orderkey,
            ROW_NUMBER() OVER (PARTITION BY l_returnflag
              ORDER BY l_extendedprice DESC, l_orderkey ASC) AS rank
          FROM lineitem)
        WHERE rank <= 3""")),

    // Outlier-robust value stats: clip each event type's values at the
    // discrete p05/p95 (rank-based — engine-portable bounds), then the
    // winsorized mean through the DECIMAL path. One sort window + one agg.
    Q("q_value_winsorized",
      (s, dir) => {
        val e = Tables.events(s, dir)
        graft.operators.EventOps.winsorizedStats(
          e, col("event"), col("value"), 0.05, 0.95, keyAlias = "event")
      },
      Some(s"""$E, r AS (
          SELECT event, value,
            ROW_NUMBER() OVER (PARTITION BY event ORDER BY value) AS rn,
            COUNT(*) OVER (PARTITION BY event) AS n
          FROM e WHERE value IS NOT NULL),
        b AS (
          SELECT event, value,
            MIN(CASE WHEN rn >= CEIL(0.05 * n) THEN value END) OVER (PARTITION BY event) AS lo,
            MIN(CASE WHEN rn >= CEIL(0.95 * n) THEN value END) OVER (PARTITION BY event) AS hi
          FROM r)
        SELECT event, COUNT(*) AS n_rows, MIN(lo) AS lo, MIN(hi) AS hi,
          CAST(SUM(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
          ${dsumSql("LEAST(GREATEST(value, lo), hi)")} / COUNT(*) AS mean_winsorized
        FROM b GROUP BY event""")),

    // Skew-safe exact distinct: the events table is the skewed shape (5 hot
    // event types over 32 cores) — salting splits each key 16 ways by user
    // hash, so per-cell distincts are disjoint and their sum is exact while
    // no reducer sees a whole hot key. Oracle = plain COUNT(DISTINCT).
    Q("q_skew_distinct",
      (s, dir) => {
        val e = Tables.events(s, dir)
        graft.operators.EventOps.saltedDistinctCount(
          e, col("event"), col("id"), salts = 16,
          keyAlias = "event", alias = "n_users")
      },
      Some(s"""$E SELECT event, COUNT(DISTINCT id) AS n_users
        FROM e GROUP BY event""")),
  )
}
