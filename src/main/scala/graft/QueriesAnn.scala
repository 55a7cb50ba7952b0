package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.AggFns._
import graft.functions.TimeFns
import graft.operators.{EventOps, Segments, TextOps}

import graft.Queries._

/** Registry family: embedding similarity — brute/LSH/IVF/PQ ANN, the
  * persisted AnnIndex store, recall report, semantic dedup, centroids,
  * quantization, k-means.
  * Split from Queries.scala in round 13 (pure mechanical move). */
object QueriesAnn {

  val entries: Seq[Q] = Seq(

    // Brute-force cosine top-k ANN (queries = vec_id < 10, k = 5).
    Q("q_ann_cosine_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.Similarity.bruteForceTopK(
          emb, emb.where(col("vec_id") < 10), 5)
          .select(col("qid"), col("rank"), col("nid"), col("cos"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS ce FROM embeddings),
        scored AS (
          SELECT qid, nid,
            list_dot_product(qe, ce) / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
          FROM q JOIN c ON qid <> nid),
        ranked AS (
          SELECT qid, nid, cos, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
          FROM scored)
        SELECT qid, rank, nid, cos FROM ranked WHERE rank <= 5""")),

    // LSH-bucketed ANN (scale path) — engine-side only; LSH plane derivation
    // is not reasonably SQL-expressible, driver records rows-only.
    Q("q_ann_lsh_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.Similarity.lshTopK(
          emb, emb.where(col("vec_id") < 10), 64, 5)
          .select(col("qid"), col("rank"), col("nid"))
      },
      // Plane p component j = md5("p:j") first 8 hex chars as a centered
      // fraction of 2^32 — reproduced verbatim; signature join + exact
      // cosine rank inside buckets.
      Some("""WITH planes AS (
          SELECT p.p, list_transform(range(64),
            j -> CAST(('0x'||substr(md5(p.p||':'||j),1,8)) AS BIGINT) / 4294967296.0 - 0.5) AS plane
          FROM (SELECT unnest(range(8)) AS p) p),
        v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        sig AS (
          SELECT vec_id, CAST(SUM(CASE WHEN list_dot_product(e, plane) > 0
                                      THEN 1::BIGINT << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS sig
          FROM v CROSS JOIN planes GROUP BY vec_id),
        sv AS (SELECT s.vec_id, s.sig, v.e, sqrt(list_dot_product(v.e, v.e)) AS n
               FROM sig s JOIN v USING (vec_id)),
        scored AS (
          SELECT q.vec_id AS qid, c.vec_id AS nid,
                 list_dot_product(q.e, c.e) / (q.n * c.n) AS cos
          FROM sv c JOIN sv q ON c.sig = q.sig AND q.vec_id < 10 AND q.vec_id <> c.vec_id),
        ranked AS (SELECT qid, nid,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
                   FROM scored)
        SELECT qid, CAST(rank AS INT) AS rank, nid FROM ranked WHERE rank <= 5""")),

    // IVF-flat ANN (scale path #2): deterministic coarse cells, probe
    // nearest nprobe cells per query; rows-only oracle (centroid seeding is
    // engine-side).
    Q("q_ann_ivf_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.Similarity.ivfTopK(
          emb, emb.where(col("vec_id") < 10), k = 5)
          .select(col("qid"), col("rank"), col("nid"))
      },
      // Full IVF replica: strided centroid seeding, argmax-(cos,cid) cell
      // assignment, nprobe=4 probing, rank by (cos desc, nid asc). DuckDB
      // list_dot_product folds j-ascending like the DotProduct expression,
      // so every double is IEEE-identical.
      Some(IvfOracleSql)),

    // PQ-ADC top-k: product-quantized codes (m=4 subspaces × 16 codewords
    // from the strided sample) searched by per-query distance-table lookup.
    // Full replica oracle: same codebooks, same L2 surrogate cw·cw − 2·q·cw,
    // same s-ascending table-sum, rank by (adist asc, nid asc).
    Q("q_ann_pq_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.Similarity.pqTopK(
          emb, emb.where(col("vec_id") < 10), k = 5)
          .select(col("qid"), col("rank"), col("nid"))
      },
      Some(PqOracleSql)),

    // Round-11: the PERSISTED-index twins. AnnIndex writes the IVF cell
    // table / PQ codes as parquet (the faiss layout: centroids broadcast,
    // cell-partitioned inverted lists, 4-int codes) and answers from the
    // store — a fresh session or an incremental append never re-pays the
    // build scan (AnnIndexSpec proves append = assign-new-only; the
    // session-memoized twins above rebuild per session). buildIfStale
    // fingerprints the corpus file listing into the index meta: same
    // listing → no-op, grown listing → append-only, so only the FIRST
    // run (or a dataset change) pays the build. Same oracles: both paths
    // run the identical search core, bit-for-bit.
    Q("q_ann_ivf_indexed",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val path = annIndexPath("ivf", dir)
        graft.operators.AnnIndex.buildIvfIfStale(emb, path)
        graft.operators.AnnIndex.ivfTopK(
          s, path, emb.where(col("vec_id") < 10), k = 5)
          .select(col("qid"), col("rank"), col("nid"))
      },
      Some(IvfOracleSql)),

    Q("q_ann_pq_indexed",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val path = annIndexPath("pq", dir)
        graft.operators.AnnIndex.buildPqIfStale(emb, path)
        graft.operators.AnnIndex.pqTopK(
          s, path, emb.where(col("vec_id") < 10), k = 5)
          .select(col("qid"), col("rank"), col("nid"))
      },
      Some(PqOracleSql)),

    // ANN quality report (round 8): recall@5 of every approximate index
    // (LSH, IVF, PQ) against the exact cosine top-5 on the same query set —
    // the eval that decides whether an index is shippable. Oracle: the
    // three full-replica oracles above plus the brute baseline, namespaced
    // into one WITH and intersected; recall is one IEEE division + round.
    Q("q_ann_recall",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.Similarity.annQualityReport(
          emb, emb.where(col("vec_id") < 10), k = 5)
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        nq AS (SELECT COUNT(*) AS n FROM v WHERE vec_id < 10),
        b_scored AS (
          SELECT q.vec_id AS qid, c.vec_id AS nid,
            list_dot_product(q.e, c.e) / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS cos
          FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        b_top AS (SELECT qid, nid FROM (
          SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r
          FROM b_scored) WHERE r <= 5),
        l_planes AS (
          SELECT p.p, list_transform(range(64),
            j -> CAST(('0x'||substr(md5(p.p||':'||j),1,8)) AS BIGINT) / 4294967296.0 - 0.5) AS plane
          FROM (SELECT unnest(range(8)) AS p) p),
        l_sig AS (
          SELECT vec_id, CAST(SUM(CASE WHEN list_dot_product(e, plane) > 0
                                      THEN 1::BIGINT << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS sig
          FROM v CROSS JOIN l_planes GROUP BY vec_id),
        l_sv AS (SELECT s.vec_id, s.sig, v.e, sqrt(list_dot_product(v.e, v.e)) AS n
                 FROM l_sig s JOIN v USING (vec_id)),
        l_scored AS (
          SELECT q.vec_id AS qid, c.vec_id AS nid,
                 list_dot_product(q.e, c.e) / (q.n * c.n) AS cos
          FROM l_sv c JOIN l_sv q ON c.sig = q.sig AND q.vec_id < 10 AND q.vec_id <> c.vec_id),
        l_top AS (SELECT qid, nid FROM (
          SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r
          FROM l_scored) WHERE r <= 5),
        i_ids AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS rn,
                         COUNT(*) OVER () AS n FROM v),
        i_cents AS (
          SELECT DISTINCT i.vec_id AS cid, cv.e AS ce, sqrt(list_dot_product(cv.e, cv.e)) AS cn
          FROM (SELECT unnest(range(16)) AS k) k
          JOIN i_ids i ON i.rn = LEAST(k.k * GREATEST(1, i.n // 16), i.n - 1)
          JOIN v cv ON cv.vec_id = i.vec_id),
        i_assign AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT a.vec_id, c.cid,
              ROW_NUMBER() OVER (PARTITION BY a.vec_id
                ORDER BY list_dot_product(a.e, c.ce) / (sqrt(list_dot_product(a.e, a.e)) * c.cn) DESC,
                         c.cid DESC) AS r
            FROM v a CROSS JOIN i_cents c) WHERE r = 1),
        i_corpus AS (
          SELECT a.vec_id AS nid, v.e AS ce, sqrt(list_dot_product(v.e, v.e)) AS cn2, a.cell
          FROM i_assign a JOIN v USING (vec_id)),
        i_probes AS (
          SELECT vec_id AS qid, cid AS cell FROM (
            SELECT q.vec_id, c.cid,
              ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY list_dot_product(q.e, c.ce) / (sqrt(list_dot_product(q.e, q.e)) * c.cn) DESC,
                         c.cid DESC) AS r
            FROM v q CROSS JOIN i_cents c WHERE q.vec_id < 10) WHERE r <= 4),
        i_qv AS (SELECT vec_id AS qid, e AS qe, sqrt(list_dot_product(e, e)) AS qn FROM v WHERE vec_id < 10),
        i_scored AS (
          SELECT DISTINCT p.qid, c.nid,
            list_dot_product(q.qe, c.ce) / (q.qn * c.cn2) AS cos
          FROM i_probes p JOIN i_corpus c USING (cell) JOIN i_qv q ON q.qid = p.qid
          WHERE p.qid <> c.nid),
        i_top AS (SELECT qid, nid FROM (
          SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r
          FROM i_scored) WHERE r <= 5),
        p_samp AS (
          SELECT DISTINCT i.vec_id, cv.e
          FROM (SELECT unnest(range(16)) AS k) k
          JOIN i_ids i ON i.rn = LEAST(k.k * GREATEST(1, i.n // 16), i.n - 1)
          JOIN v cv ON cv.vec_id = i.vec_id),
        p_codes AS (SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code FROM p_samp),
        p_cw0 AS (
          SELECT s.s AS sub, c.code, c.e[s.s*16+1 : (s.s+1)*16] AS cwv,
            list_dot_product(c.e[s.s*16+1 : (s.s+1)*16], c.e[s.s*16+1 : (s.s+1)*16]) AS cs
          FROM p_codes c CROSS JOIN (SELECT unnest(range(4)) AS s) s),
        p_enc0 AS (
          SELECT vec_id, sub, code FROM (
            SELECT a.vec_id, w.sub, w.code,
              ROW_NUMBER() OVER (PARTITION BY a.vec_id, w.sub
                ORDER BY w.cs - 2*list_dot_product(a.e[w.sub*16+1 : (w.sub+1)*16], w.cwv) ASC,
                         w.code ASC) AS r
            FROM v a CROSS JOIN p_cw0 w) WHERE r = 1),
        p_subc AS (
          SELECT e0.sub, e0.code,
            unnest(a.e[e0.sub*16+1 : (e0.sub+1)*16]) AS x,
            generate_subscripts(a.e[e0.sub*16+1 : (e0.sub+1)*16], 1) AS j
          FROM p_enc0 e0 JOIN v a USING (vec_id)),
        p_mu AS (
          SELECT sub, code, j,
            CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu
          FROM p_subc GROUP BY 1, 2, 3),
        p_cw AS MATERIALIZED (
          SELECT w.sub, w.code, COALESCE(m2.cwv, w.cwv) AS cwv,
            list_dot_product(COALESCE(m2.cwv, w.cwv), COALESCE(m2.cwv, w.cwv)) AS cs
          FROM p_cw0 w LEFT JOIN (
            SELECT sub, code, list(mu ORDER BY j) AS cwv FROM p_mu GROUP BY 1, 2) m2
            ON m2.sub = w.sub AND m2.code = w.code),
        p_enc AS (
          SELECT vec_id, sub, code FROM (
            SELECT a.vec_id, w.sub, w.code,
              ROW_NUMBER() OVER (PARTITION BY a.vec_id, w.sub
                ORDER BY w.cs - 2*list_dot_product(a.e[w.sub*16+1 : (w.sub+1)*16], w.cwv) ASC,
                         w.code ASC) AS r
            FROM v a CROSS JOIN p_cw w) WHERE r = 1),
        p_q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
        p_dt AS (
          SELECT q.qid, w.sub, w.code,
            w.cs - 2*list_dot_product(q.qe[w.sub*16+1 : (w.sub+1)*16], w.cwv) AS dd
          FROM p_q q CROSS JOIN p_cw w),
        p_sc AS (
          SELECT d.qid, e2.vec_id AS nid,
            MAX(CASE WHEN d.sub=0 THEN d.dd END) AS d0,
            MAX(CASE WHEN d.sub=1 THEN d.dd END) AS d1,
            MAX(CASE WHEN d.sub=2 THEN d.dd END) AS d2,
            MAX(CASE WHEN d.sub=3 THEN d.dd END) AS d3
          FROM p_enc e2 JOIN p_dt d ON d.sub = e2.sub AND d.code = e2.code
          GROUP BY 1, 2),
        p_top AS (SELECT qid, nid FROM (
          SELECT qid, nid,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ((d0+d1)+d2)+d3 ASC, nid ASC) AS r
          FROM p_sc WHERE qid <> nid) WHERE r <= 5),
        m AS (
          SELECT 'ivf' AS method, COUNT(*) AS hits
          FROM i_top t JOIN b_top b ON t.qid = b.qid AND t.nid = b.nid
          UNION ALL SELECT 'lsh', COUNT(*)
          FROM l_top t JOIN b_top b ON t.qid = b.qid AND t.nid = b.nid
          UNION ALL SELECT 'pq', COUNT(*)
          FROM p_top t JOIN b_top b ON t.qid = b.qid AND t.nid = b.nid)
        SELECT m.method, nq.n AS n_queries, m.hits, nq.n * 5 AS possible,
          ROUND(m.hits / (nq.n * 5.0), 6) AS recall
        FROM m CROSS JOIN nq""")),

    // Embedding-cosine near-duplicate detection (dedup family; bounded
    // subset for the O(n²) tier — LSH buckets are the scale path).
    Q("q_embedding_neardup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).where(col("vec_id") < 500)
        graft.operators.Similarity.cosineNearDupPairs(emb, 0.9)
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("id_a")).as("n_left"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 500),
        p AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cos
          FROM v a JOIN v b ON a.vec_id < b.vec_id)
        SELECT COUNT(*) AS n_pairs, COUNT(DISTINCT id_a) AS n_left
        FROM p WHERE cos >= 0.9""")),

    // SemDedup (cluster-then-pairwise semantic dedup): IVF-cell clustering
    // confines the quadratic cosine scan to single cells; inside each cell
    // any vector with a lower-id near-duplicate (cos >= 0.9) is dropped.
    // Reports per-cell corpus and survivor counts.
    Q("q_semdedup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.Similarity.semDedup(emb, tau = 0.9)
          .groupBy(col("cell"))
          .agg(count(lit(1)).as("n_vectors"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      },
      // Mirrors the IVF oracle's strided-centroid seeding + argmax-(cos,cid)
      // assignment, then the in-cell lower-id near-dup rule.
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        ids AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS rn,
                       COUNT(*) OVER () AS n FROM v),
        cents AS (
          SELECT DISTINCT i.vec_id AS cid, cv.e AS ce, sqrt(list_dot_product(cv.e, cv.e)) AS cn
          FROM (SELECT unnest(range(16)) AS k) k
          JOIN ids i ON i.rn = LEAST(k.k * GREATEST(1, i.n // 16), i.n - 1)
          JOIN v cv ON cv.vec_id = i.vec_id),
        assign AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT a.vec_id, c.cid,
              ROW_NUMBER() OVER (PARTITION BY a.vec_id
                ORDER BY list_dot_product(a.e, c.ce) / (sqrt(list_dot_product(a.e, a.e)) * c.cn) DESC,
                         c.cid DESC) AS r
            FROM v a CROSS JOIN cents c) WHERE r = 1),
        av AS (
          SELECT a.vec_id, a.cell, v.e, sqrt(list_dot_product(v.e, v.e)) AS nn
          FROM assign a JOIN v USING (vec_id)),
        dropped AS (
          SELECT DISTINCT b.vec_id
          FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE list_dot_product(a.e, b.e) / (a.nn * b.nn) >= 0.9)
        SELECT av.cell, COUNT(*) AS n_vectors,
          CAST(SUM(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM av LEFT JOIN dropped d ON av.vec_id = d.vec_id
        GROUP BY av.cell""")),

    // Int8 scalar quantization of embeddings (the storage-compression step
    // for vector indexes): per-label code sums + worst reconstruction error.
    // Per-label centroids (class prototypes / IVF training step): exact
    // decimal component sums -> order-independent, oracle-bit-equal. The
    // shuffle carries only labels×dim partial sums, never the vectors.
    Q("q_embedding_centroids",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.Similarity.labelCentroids(emb, col("label"), col("embedding"))
      },
      Some("""WITH u AS (
          SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
            unnest(embedding) AS x
          FROM embeddings)
        SELECT label, pos,
          CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS centroid,
          COUNT(*) AS n
        FROM u GROUP BY label, pos""")),

    Q("q_embedding_quantize",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        emb.select(col("label"),
            graft.operators.Similarity.quantizeStats(col("embedding")).as("st"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("st.qsum")).as("total_qsum"),
            max(col("st.max_err")).as("max_err"))
      },
      Some("""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
        q AS (SELECT label, list_aggregate(e, 'min') AS mn,
                     list_aggregate(e, 'max') AS mx, e FROM v),
        z AS (SELECT label, mn, (mx - mn) / 255.0 AS scale,
          CASE WHEN mx = mn THEN list_transform(e, x -> CAST(0 AS BIGINT))
               ELSE list_transform(e, x -> CAST(round((x - mn) / ((mx - mn) / 255.0)) AS BIGINT)) END AS qs,
          e FROM q),
        w AS (SELECT label, CAST(list_sum(qs) AS BIGINT) AS qsum,
          list_aggregate(list_transform(range(1, len(e) + 1),
            i -> abs(e[i] - (mn + qs[i] * scale))), 'max') AS max_err
          FROM z)
        SELECT label, COUNT(*) AS n_vecs, CAST(SUM(qsum) AS BIGINT) AS total_qsum,
          MAX(max_err) AS max_err
        FROM w GROUP BY label""")),

    // Deterministic Lloyd's k-means (k=4, 2 iterations) over the embedding
    // corpus: seeded from the 4 lowest vec_ids, cosine assignment with
    // position-order sums (IEEE ≡ list_dot_product), DECIMAL(18,6) centroid
    // means — the oracle unrolls the same two iterations and lands on
    // bit-identical centroids. Oracle caveat: a MID-LOOP empty cluster
    // keeps its previous centroid in the operator, while the unrolled SQL's
    // GROUP BY drops it — parity holds because no cluster empties on this
    // data (k lowest-id seeds over a dense corpus); a k far above the
    // natural cluster count could diverge on that edge.
    Q("q_kmeans_clusters",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.Similarity.kmeansCentroids(emb, 4, 2)
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        init AS (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cid, e AS ce
          FROM (SELECT vec_id, e FROM v ORDER BY vec_id ASC LIMIT 4)),
        s1 AS (
          SELECT v.vec_id, i.cid,
            list_dot_product(v.e, i.ce) /
              (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(i.ce, i.ce))) AS cos
          FROM v CROSS JOIN init i),
        a1 AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
              ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
            FROM s1) WHERE rn = 1),
        u1 AS (
          SELECT a1.cid, generate_subscripts(v.e, 1) - 1 AS pos, unnest(v.e) AS x
          FROM a1 JOIN v USING (vec_id)),
        c1 AS (
          SELECT cid, pos,
            CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c
          FROM u1 GROUP BY cid, pos),
        ce1 AS (SELECT cid, list(c ORDER BY pos ASC) AS ce FROM c1 GROUP BY cid),
        s2 AS (
          SELECT v.vec_id, ce1.cid,
            list_dot_product(v.e, ce1.ce) /
              (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(ce1.ce, ce1.ce))) AS cos
          FROM v CROSS JOIN ce1),
        a2 AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
              ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
            FROM s2) WHERE rn = 1),
        u2 AS (
          SELECT a2.cid, generate_subscripts(v.e, 1) - 1 AS pos, unnest(v.e) AS x
          FROM a2 JOIN v USING (vec_id))
        SELECT cid AS cluster, pos,
          CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS centroid,
          COUNT(*) AS n
        FROM u2 GROUP BY cid, pos""")),
  )
}
