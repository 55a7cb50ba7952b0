package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID heuristics, shingling and document
  * fingerprinting.
  *
  * All of these are pure per-row Column expressions (whole-stage codegen, no
  * UDFs, no shuffles) — at 100 TB they run at scan speed and pushdown/pruning
  * still apply.
  */
object TextOps {

  /** Canonical text normalization for dedup/cleaning pipelines: Unicode NFC,
    * lowercase (root locale — matches utf8proc/DuckDB `lower`), control
    * characters to spaces, whitespace runs collapsed, trimmed. One compiled
    * kernel call per row (NFC needs the JDK normalizer; everything else
    * rides along in the same pass). */
  def normalize(text: Column): Column = {
    val kernel = udf { (s: String) =>
      if (s == null) null
      else {
        val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
        val lower = nfc.toLowerCase(java.util.Locale.ROOT)
        val sb = new java.lang.StringBuilder(lower.length)
        var i = 0
        var lastSpace = true // leading whitespace drops (trim semantics)
        while (i < lower.length) {
          val c = lower.charAt(i)
          // ASCII controls + space + DEL only — unicode spaces pass
          // through, keeping the kernel bit-identical to the SQL-regex oracle
          val isWs = c <= ' ' || c == '\u007f'
          if (isWs) { if (!lastSpace) sb.append(' '); lastSpace = true }
          else { sb.append(c); lastSpace = false }
          i += 1
        }
        var n = sb.length
        while (n > 0 && sb.charAt(n - 1) == ' ') n -= 1
        sb.substring(0, n)
      }
    }
    kernel(text)
  }

  /** Whitespace tokenization. Deterministic; empty string → [""] filtered. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Per-token hashed feature buckets, one compiled kernel call per row:
    * each token's md5 first 3 bytes (= first 6 hex chars) mod `buckets` —
    * byte-identical to the Column route
    * `pmod(conv(substring(md5(tok), 1, 6), 16, 10), buckets)`
    * ([[tokenBucketsExpr]], the parity twin kept under test) and to the SQL
    * oracles' `('0x' || substr(md5(tok), 1, 6))::BIGINT % buckets`. One
    * MessageDigest per row replaces an md5-string → substring → base-16
    * conv Column chain per token — the model-build scan of the drift/DSIR
    * operators at a fraction of the cost. */
  def tokenBucketsKernel(buckets: Int): Column => Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val k = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        text.split(" ").iterator.filter(_.nonEmpty).map { tok =>
          val dig = md.digest(tok.getBytes("UTF-8"))
          md.reset()
          val v = ((dig(0) & 0xFFL) << 16) | ((dig(1) & 0xFFL) << 8) |
            (dig(2) & 0xFFL)
          v % buckets
        }.toArray
      }
    }
    (text: Column) => k(text)
  }

  /** Pure-Column twin of [[tokenBucketsKernel]] (parity reference). */
  def tokenBucketsExpr(text: Column, buckets: Int): Column =
    transform(tokens(text), t =>
      pmod(conv(substring(md5(t), 1, 6), 16, 10).cast("long"), lit(buckets.toLong)))

  /** BPE-ish sub-word tokenization: letter runs, digit runs, and individual
    * punctuation marks each count as a token (the pre-tokenization split
    * most BPE vocabularies apply before merges). */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokens(text: Column): Column = regexp_extract_all(text, lit(BpeishPattern), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Small english-ish stopword list used by quality scoring. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  def stopwordCount(text: Column): Column = {
    val sw = array(Stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(sw, t)))
  }

  /** Quality signals: token count, mean token length, stopword ratio,
    * punctuation ratio — the standard cheap pre-filters for LLM corpora. */
  def withQualitySignals(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val toks = tokens(text)
    docs
      .withColumn("n_tokens", size(toks))
      .withColumn("n_stopwords", stopwordCount(text))
      .withColumn("mean_token_len",
        when(size(toks) > 0,
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
          .otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(col("n_tokens") > 0, col("n_stopwords").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
  }

  /** Marker-word language ID heuristic (n-gram/stopword profiling stand-in;
    * deterministic and SQL-mirrorable). First matching marker wins. */
  def langIdHeuristic(text: Column): Column = {
    val toks = tokens(text)
    when(array_contains(toks, "the"), "en")
      .when(array_contains(toks, "le"), "fr")
      .when(array_contains(toks, "der"), "de")
      .when(array_contains(toks, "el"), "es")
      .otherwise("unknown")
  }

  /** Word w-shingles as an array column: shingle i = words[i..i+w-1] joined
    * by spaces. In-row (no explode) so it composes with minhash at scan
    * speed. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = tokens(text)
    // zip_with over w shifted slices, NOT transform+element_at: an
    // element_at(toks, i) inside a lambda re-inlines the whole
    // filter(split(text)) tree per ELEMENT (O(w·K²) interpreted work per
    // doc — measured 400 s single-core at sf0.1 for bigrams); slices
    // evaluate the token array O(w) times per ROW and the per-element
    // lambda is a 2-string concat.
    val cnt = size(toks) - (w - 1)
    val sh = (2 to w).foldLeft(slice(toks, lit(1), cnt)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), cnt), (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) >= w, sh).otherwise(array().cast("array<string>"))
  }

  /** Chunk documents into token windows of `size` with `overlap` tokens of
    * context carried between consecutive chunks — the standard pre-embedding
    * split for RAG / context-window-bounded training. In-row Column
    * expressions (sequence + slice; no UDF, no explode until the caller asks
    * for rows), so chunking runs at scan speed and composes with
    * partitioning. Documents with no tokens produce no chunks.
    *
    * Returns one row per chunk: every original column plus
    * `(chunk_ix, chunk_text, chunk_tokens)`. */
  def chunk(docs: DataFrame, text: Column,
            size: Int = 64, overlap: Int = 16): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0")
    val step = size - overlap
    val toks = tokens(text)
    val n = org.apache.spark.sql.functions.size(toks)
    // number of chunks: 1 if n <= size else 1 + ceil((n - size) / step)
    val extra = ceil((n - size).cast("double") / step).cast("int")
    val nChunks = when(n <= size, lit(1)).otherwise(lit(1) + extra)
    val chunks = when(n > 0,
      transform(sequence(lit(0), nChunks - 1), i =>
        struct(
          i.as("chunk_ix"),
          concat_ws(" ", slice(toks, i * step + 1, lit(size))).as("chunk_text"),
          least(lit(size), n - i * step).as("chunk_tokens"))))
      .otherwise(array().cast(
        "array<struct<chunk_ix:int,chunk_text:string,chunk_tokens:int>>"))
    docs.withColumn("__c", explode(chunks))
      .withColumn("chunk_ix", col("__c.chunk_ix"))
      .withColumn("chunk_text", col("__c.chunk_text"))
      .withColumn("chunk_tokens", col("__c.chunk_tokens"))
      .drop("__c")
  }

  /** Benchmark decontamination: per corpus document, how many of its
    * distinct word n-grams appear anywhere in the `benchmark` set — the
    * overlap screen run before training on scraped corpora. The benchmark's
    * n-gram set is tiny relative to the corpus and broadcast; the corpus
    * explodes n-grams once and aggregates back — one scan + one broadcast
    * join at 100 TB. */
  def contaminationCounts(corpus: DataFrame, benchmark: DataFrame,
                          text: Column = col("text"), n: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast => bc}
    // n-grams never leave the row as strings: a kernel emits each doc's
    // DISTINCT gram hashes (md5 first 15 hex chars = 60 bits, the same
    // engine-portable recipe as the MinHash oracle), so the explode/join
    // moves 8-byte longs instead of ~50-char shingles (15 s -> ~2 s at
    // sf0.1, and the difference compounds at corpus scale).
    val kernel = udf { (t: String) =>
      if (t == null) Array.empty[Long]
      else {
        val toks = t.split(" ").filter(_.nonEmpty)
        if (toks.length < n) Array.empty[Long]
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val seen = new java.util.HashSet[java.lang.Long]()
          val out = scala.collection.mutable.ArrayBuffer.empty[Long]
          var i = 0
          while (i <= toks.length - n) {
            val sb = new java.lang.StringBuilder(toks(i))
            var k = 1
            while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
            val dig = md.digest(sb.toString.getBytes("UTF-8"))
            md.reset()
            var h = 0L
            var bi = 0
            while (bi < 7) { h = (h << 8) | (dig(bi) & 0xFFL); bi += 1 }
            h = (h << 4) | ((dig(7) & 0xF0L) >> 4) // 15 hex chars = 60 bits
            if (seen.add(h)) out += h
            i += 1
          }
          out.toArray
        }
      }
    }
    val benchGrams = benchmark
      .select(explode(kernel(text)).as("gram")).distinct()
    val corpusGrams = corpus
      .select(col("doc_id"), explode_outer(kernel(text)).as("gram"))
    corpusGrams.join(bc(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
      // zero rows for clean docs: restore them with an outer join
      .join(corpus.select(col("doc_id")), Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
  }

  /** Repetition signals (Gopher-style quality pre-filter, Rae et al. 2021
    * §A1.1): the fraction of the document's word bigrams taken by its most
    * frequent bigram, and the distinct-token ratio. Highly repetitive
    * machine-generated or boilerplate text scores high/low respectively.
    * One compiled kernel pass per row (bigram histogram needs a hash map —
    * not expressible as a codegen'd Column without per-element lambda
    * costs); runs at scan speed, no shuffle.
    *
    * Returns struct(top_bigram_frac, distinct_token_ratio); zero-token
    * docs → (0.0, 0.0), one-token docs → (0.0, 1.0). Division is one IEEE
    * double op on exact integer counts — engine-portable. */
  def repetitionSignals(text: Column): Column = {
    val kernel = udf { (t: String) =>
      if (t == null) (0.0, 0.0)
      else {
        val toks = t.split(" ").filter(_.nonEmpty)
        val n = toks.length
        if (n == 0) (0.0, 0.0)
        else {
          val distinct = new java.util.HashSet[String]()
          toks.foreach(distinct.add)
          val dr = distinct.size.toDouble / n
          if (n < 2) (0.0, dr)
          else {
            val counts = new java.util.HashMap[String, Int]()
            var mx = 0
            var i = 0
            while (i < n - 1) {
              val g = toks(i) + " " + toks(i + 1)
              val c = counts.merge(g, 1, Integer.sum)
              if (c > mx) mx = c
              i += 1
            }
            (mx.toDouble / (n - 1), dr)
          }
        }
      }
    }
    kernel(text).cast(
      "struct<top_bigram_frac:double,distinct_token_ratio:double>")
  }

  /** Repetition filter: annotate with [[repetitionSignals]] and a `keep`
    * verdict (top-bigram fraction at most `maxTopBigramFrac` AND distinct
    * ratio at least `minDistinctRatio`). */
  def repetitionFilter(docs: DataFrame, text: Column = col("text"),
                       maxTopBigramFrac: Double = 0.05,
                       minDistinctRatio: Double = 0.4): DataFrame = {
    val sig = repetitionSignals(text)
    docs
      .withColumn("__sig", sig)
      .withColumn("top_bigram_frac", col("__sig.top_bigram_frac"))
      .withColumn("distinct_token_ratio", col("__sig.distinct_token_ratio"))
      .withColumn("keep",
        col("top_bigram_frac") <= maxTopBigramFrac &&
          col("distinct_token_ratio") >= minDistinctRatio)
      .drop("__sig")
  }

  /** Corpus vocabulary: top-k tokens by document frequency (ties broken
    * lexicographically). The building block for stopword/vocab derivation —
    * one explode + one hash aggregation + a tiny top-k sort. */
  def topTokens(docs: DataFrame, text: Column, k: Int): DataFrame =
    docs.select(explode(tokens(text)).as("token"), col("doc_id"))
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"),
        count(lit(1)).as("occurrences"))
      .orderBy(col("doc_freq").desc, col("token").asc)
      .limit(k)

  /** Document fingerprint (winnowing-style): the k lexicographically
    * smallest md5 hashes of the doc's 3-word shingles, joined. Two docs
    * sharing most content share most of the fingerprint.
    *
    * Compiled kernel (one JVM call per row); [[fingerprintExpr]] is the
    * equivalent pure-Column form, kept spec-asserted identical — interpreted
    * per-element lambda costs made it 60× slower at sf0.1. */
  def fingerprint(text: Column, k: Int = 4): Column = {
    val kernel = udf { (t: String) =>
      if (t == null) ""
      else {
        val toks = t.split(" ").filter(_.nonEmpty)
        if (toks.length < 3) ""
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val hashes = (0 to toks.length - 3).map { i =>
            val dig = md.digest((toks(i) + " " + toks(i + 1) + " " + toks(i + 2)).getBytes("UTF-8"))
            md.reset()
            dig.map(b => f"$b%02x").mkString
          }
          hashes.sorted.take(k).mkString("|")
        }
      }
    }
    kernel(text)
  }

  /** Pure-Column fingerprint (parity reference for [[fingerprint]]). */
  def fingerprintExpr(text: Column, k: Int = 4): Column =
    concat_ws("|", slice(array_sort(transform(shingles(text), s => md5(s))), 1, k))

  /** BPE merge training (Sennrich et al. 2016): iteratively merge the most
    * frequent adjacent symbol pair. Returns the merge table
    * `(rank, left, right)` — the artifact a tokenizer ships.
    *
    * Scale shape: the corpus is touched ONCE (token explode → distinct-word
    * frequency table); every merge iteration then runs on the distinct-word
    * table only — one pair-count aggregation (map-side partial) + one
    * in-row merge map, with `localCheckpoint` every few rounds to keep the
    * plan O(1). This is the standard distributed formulation: corpus size
    * drops out after the first pass, iterations cost O(|vocab|).
    * Ties break deterministically (count desc, then pair lexicographic). */
  def trainBpeMerges(docs: DataFrame, text: Column, nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    val mergeUdf = udf { (syms: Seq[String], a: String, b: String) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    var words = docs.select(explode(tokens(text)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var round = 0
    while (!done && merges.length < nMerges) {
      val pairs = words
        .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("l"), y.as("r")))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (pairs.isEmpty) done = true
      else {
        val (a, b) = (pairs(0).getString(0), pairs(0).getString(1))
        merges += ((a, b))
        words = words.select(
          mergeUdf(col("syms"), lit(a), lit(b)).as("syms"), col("freq"))
        round += 1
        if (round % 8 == 0) {
          val cp = words.localCheckpoint(true)
          words = cp
        }
      }
    }
    merges.toSeq
  }

  /** Apply a trained BPE merge table (from [[trainBpeMerges]]) to text:
    * each word starts as characters and repeatedly applies the
    * HIGHEST-PRIORITY (lowest-rank) applicable merge, all occurrences at
    * once, until none apply — the standard encode loop a tokenizer runs.
    *
    * Scale shape mirrors training: only DISTINCT words are encoded (the
    * merge loop runs on the vocab, not the corpus), then the encodings join
    * back to the posexploded word stream and re-assemble per doc. The merge
    * table rides the closure (it's a few hundred pairs — broadcast-sized by
    * construction). Returns `(doc_id, bpe_tokens, n_bpe_tokens)`. */
  def bpeEncode(docs: DataFrame, idCol: Column, textCol: Column,
                merges: Seq[(String, String)]): DataFrame = {
    val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val encodeUdf = udf { (w: String) =>
      var syms: IndexedSeq[String] = w.split("").toIndexedSeq.filter(_.nonEmpty)
      var done = syms.length < 2
      while (!done) {
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) bestRank = r
          i += 1
        }
        if (bestRank == Int.MaxValue) done = true
        else {
          val (a, b) = merges(bestRank)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              out += (a + b); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.toIndexedSeq
          done = syms.length < 2
        }
      }
      syms
    }
    val words = docs.select(idCol.as("doc_id"),
      posexplode(tokens(textCol)).as(Seq("__pos", "__w")))
    val vocab = words.select(col("__w")).distinct()
      .withColumn("__enc", encodeUdf(col("__w")))
    words.join(vocab, "__w")
      .groupBy("doc_id")
      .agg(flatten(transform(
          array_sort(collect_list(struct(col("__pos"), col("__enc")))),
          s => s.getField("__enc"))).as("bpe_tokens"))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")))
  }

  // -------------------------------------------------------------------- PII
  // Detection/redaction patterns kept to the regex subset where Java regex
  // (Spark codegen) and RE2 (DuckDB oracle) agree exactly: no backrefs, no
  // lookaround, ASCII word boundaries over ASCII text.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Per-doc PII hit counts as a struct `{emails, ipv4s, phones}` — pure
    * codegen'd regexp_count, no UDF, runs at scan speed. */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(EmailPattern)).as("emails"),
    regexp_count(text, lit(Ipv4Pattern)).as("ipv4s"),
    regexp_count(text, lit(PhonePattern)).as("phones"))

  /** Redacted text: emails → `<EMAIL>`, then IPv4 → `<IP>`, then phones →
    * `<PHONE>`. Email first so `user@10.0.0.1`-style hosts redact as one
    * email, not an email stub plus an IP. Pure Column chain (codegen). */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailPattern), lit("<EMAIL>")),
        lit(Ipv4Pattern), lit("<IP>")),
      lit(PhonePattern), lit("<PHONE>"))

  /** Unigram language-model scoring — the KenLM-perplexity-filter analogue
    * (CCNet's quality dimension) with the corpus itself as the model: each
    * doc scores `bits_per_token = mean(-log2 p(tok))` under corpus unigram
    * frequencies. Low bits = repetitive/predictable text, high bits = rare-
    * token garbage; `keep` brackets the healthy middle.
    *
    * Determinism across engines: each per-token surprisal rounds to 4
    * decimals (`round` half-away-from-zero — identical in Spark and DuckDB
    * for positive values) and sums in exact DECIMAL space, so the mean is
    * bit-stable regardless of aggregation order.
    *
    * Scale shape: one explode → token hash-agg (the model fits executors —
    * vocab, not corpus, sized) → join tokens back on the token key (AQE
    * broadcasts small vocabularies) → one groupBy(doc). No windows, no
    * driver state. */
  def unigramBits(docs: DataFrame, idCol: Column, textCol: Column,
                  keepMaxBits: Double): DataFrame = {
    val toks = docs.select(idCol.as("doc_id"), explode(tokens(textCol)).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).cast("double").as("t"))
    val scored = toks.join(counts, "tok")
      .crossJoin(broadcast(total))
      .withColumn("bits", round(-log2(col("c") / col("t")), 4))
    scored.groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        (graft.functions.AggFns.dsum(col("bits")) / count(lit(1)))
          .as("bits_per_token"))
      .withColumn("keep", col("bits_per_token") <= keepMaxBits)
  }

  /** CCNet-style perplexity split (head/middle/tail): rank every doc by its
    * unigram-LM bits-per-token (asc, doc_id tiebreak) and cut the ranking
    * into `nBuckets` NTILE buckets — bucket 1 = the most-predictable "head"
    * CCNet keeps, the top tercile = the "tail" it drops. Rank-based, so no
    * float-interpolated percentile ever decides a boundary (engine-portable
    * to the bit where a `percentile_cont` threshold would not be).
    *
    * Scale shape: the ranking is a distributed sort + `zipWithIndex`
    * (per-partition offsets stitched — the same global-rank trick the IVF
    * seeding uses), never a single-partition window; the bucket id is then
    * the closed form `floor(rank·b/n)+1`, which equals SQL `NTILE(b)`
    * (larger buckets first) for a total-order ranking. Returns
    * `(doc_id, n_tokens, bits_per_token, bucket)`. */
  def perplexityBuckets(docs: DataFrame, idCol: Column, textCol: Column,
                        nBuckets: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val scored = unigramBits(docs, idCol, textCol, keepMaxBits = Double.MaxValue)
      .select(col("doc_id"), col("n_tokens"), col("bits_per_token"))
    // r17: the PAYLOAD rides the distributed sort, so the ranking needs no
    // join-back, no localCheckpoint and no separate count() — one sizing
    // job (per-partition counts of the sorted ranking, which also yields n)
    // replaces the three driver actions the old shape paid. The second pass
    // over the sorted RDD reuses the sort's shuffle files; only its final
    // stage recomputes.
    val sorted = scored
      .orderBy(col("bits_per_token").asc, col("doc_id").asc).rdd
    val sizes = sorted
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().sortBy(_._1).map(_._2.toLong)
    val n = sizes.sum
    val offsets = sizes.scanLeft(0L)(_ + _)
    val b = nBuckets.toLong
    val rankRows = sorted.mapPartitionsWithIndex { (i, it) =>
      val base = offsets(i)
      it.zipWithIndex.map { case (r, j) =>
        org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2),
          ((base + j) * b / n + 1).toInt)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        scored.schema("doc_id").dataType),
      org.apache.spark.sql.types.StructField("n_tokens",
        scored.schema("n_tokens").dataType),
      org.apache.spark.sql.types.StructField("bits_per_token",
        scored.schema("bits_per_token").dataType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType)))
    spark.createDataFrame(rankRows, schema)
  }

  /** CCNet-style line-level dedup / boilerplate removal: split each doc on
    * `delim`, drop every line whose corpus-wide document frequency exceeds
    * `maxDocFreq` (navbars, cookie banners, license footers), and reassemble
    * the survivors in original order. Returns
    * `(doc_id, text_clean, n_kept)` — one row per input doc, empty string
    * when nothing survives.
    *
    * Scale shape: explode → two-phase hash agg on the line (distinct-doc
    * count) → join back (AQE broadcasts when the distinct-line table is
    * small) → one groupBy(doc) rebuild. No windows over the full corpus, no
    * driver collection; the only wide exchanges key on line hash and doc id. */
  def lineDedup(docs: DataFrame, idCol: Column, textCol: Column,
                delim: String, maxDocFreq: Long): DataFrame = {
    val lines = docs
      .select(idCol.as("doc_id"),
        posexplode(split(textCol, java.util.regex.Pattern.quote(delim)))
          .as(Seq("__pos", "__line")))
      .where(length(col("__line")) > 0)
    val freq = lines.groupBy("__line")
      .agg(countDistinct(col("doc_id")).as("__df"))
    val kept = lines.join(freq.where(col("__df") <= maxDocFreq), "__line")
    val rebuilt = kept.groupBy("doc_id").agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")),
        delim).as("text_clean"),
      count(lit(1)).as("n_kept"))
    docs.select(idCol.as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
