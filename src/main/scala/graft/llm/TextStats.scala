package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY.md §2.12): tokenization, token counting, quality scoring,
  * language ID, document fingerprinting.
  *
  * All pure Column compositions over a string column — no UDFs, each
  * derivation stays in whole-stage codegen and scales embarrassingly
  * (no shuffle; the scan partitioning carries through).
  */
object TextStats {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: count of word/punctuation units
    * (`\w+` runs plus isolated non-space punctuation). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Distinct-token / total-token ratio (lexical diversity). */
  def typeTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / tokenCount(text)

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - 1)).cast("double") / tokenCount(text)

  /** Deflate compression ratio, `compressed_bytes / raw_bytes` — the
    * cheap entropy proxy web-scale pipelines ship as a quality signal
    * (RedPajama-V2's "ccnet_…/rps_doc_*" family includes it):
    * boilerplate, keyword spam, and repeated templates compress far
    * below ~0.4; high-entropy noise sits near 1. A UDF by necessity
    * (no SQL deflate), per-row and shuffle-free; level 6 = zlib
    * default, pinned for reproducibility. Empty text → NULL. */
  def compressionRatio(text: Column): Column = {
    val f = org.apache.spark.sql.functions.udf { (s: String) =>
      if (s == null || s.isEmpty) None
      else {
        val raw = s.getBytes("UTF-8")
        val d = new java.util.zip.Deflater(6)
        d.setInput(raw); d.finish()
        // zlib worst case is a slight EXPANSION (~0.03% + header);
        // undersizing would spin the finished() loop forever
        val buf = new Array[Byte](raw.length + (raw.length >> 8) + 64)
        var n = 0
        while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
        d.end()
        Some(n.toDouble / raw.length)
      }
    }
    round(f(text), 6)
  }

  /** Composite quality score in [0,1]-ish: rewards moderate length,
    * lexical diversity, and sane token lengths — the shape of the
    * heuristic filters used on web-scale corpora. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 64.0, lit(1.0))
    val diversity = typeTokenRatio(text)
    val tokLen = avgTokenLen(text)
    val tokLenScore = when(tokLen.between(2.0, 12.0), 1.0).otherwise(0.5)
    round(lenScore * 0.4 + diversity * 0.4 + tokLenScore * 0.2, 6)
  }

  /** Heuristic language ID: marker-token hit counts per language with a
    * deterministic priority order. Profiles are pluggable; these defaults
    * demo the operator shape (real profiles would be char-n-gram tables
    * broadcast to executors).
    */
  def langIdHeuristic(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    when(padded.contains(" the "), "en")
      .when(padded.contains(" le ") || padded.contains(" la "), "fr")
      .when(padded.contains(" der ") || padded.contains(" die "), "de")
      .when(padded.contains(" el ") || padded.contains(" los "), "es")
      .otherwise("und")
  }

  /** Normalized document fingerprint: lowercase, collapse whitespace,
    * md5 — stable across incidental formatting differences. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Default stopword set for [[stopwordRatio]] (English function
    * words; pluggable). */
  val DefaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "that", "this")

  /** Fraction of tokens that are stopwords — high-signal quality
    * heuristic (near-0 → keyword spam / code; near-1 → boilerplate).
    * Per-row array filter against a literal set; no shuffle. */
  def stopwordRatio(text: Column,
      stopwords: Seq[String] = DefaultStopwords): Column = {
    val sw = array(stopwords.map(lit): _*)
    round(size(filter(tokens(text), t => array_contains(sw, t)))
      .cast("double") / tokenCount(text), 6)
  }

  /** Winnowing document fingerprint (the MOSS rolling-hash scheme —
    * Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every character
    * `k`-gram of the normalized text, slide a window of `w` consecutive
    * gram hashes, keep each window's minimum; the distinct minima are
    * the fingerprint. Guarantees any shared substring of length
    * ≥ k+w−1 contributes a shared fingerprint hash — edit-robust where
    * the whole-doc md5 [[fingerprint]] is not.
    *
    * Relational shape: explode gram positions (doc-contiguous, no
    * shuffle), rolling min via a ROWS window frame (ONE exchange+sort
    * on doc_id — inherent: the fingerprint is a per-doc sequential
    * fold), distinct-agg per doc. Returns (doc_id, n_fp, fp_digest)
    * where fp_digest = md5 of the sorted distinct minima — two docs
    * sharing no content share no digest, near-dups share most minima
    * (compare via the exploded variant if per-hash overlap is needed).
    */
  def winnowFingerprint(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame =
    winnowHashes(docs, idCol, textCol, k, w)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        md5(concat_ws(",", array_sort(collect_list(col("wm"))))).as("fp_digest"))

  /** The distinct selected hashes behind [[winnowFingerprint]] as
    * (doc_id, wm) rows — joinable: a self-join on `wm` finds documents
    * sharing any ≥ k+w−1-char substring (containment/plagiarism
    * detection), with bucket sizes bounded by hash popularity, never
    * corpus². */
  def winnowHashes(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select(col(idCol).as("doc_id"),
        regexp_replace(lower(col(textCol)), "\\s+", " ").as("t"))
      .filter(length(col("t")) >= k + w - 1)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), length(col("t")) - (k - 1))).as("pos"))
      .select(col("doc_id"), col("pos"),
        substring(md5(col("t").substr(col("pos"), lit(k))), 1, 8).as("h"))
    val roll = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    grams.withColumn("wm", min(col("h")).over(roll))
      .filter(col("pos") >= w) // full windows only
      .select(col("doc_id"), col("wm")).distinct()
  }

  /** TF-IDF features (SURVEY §2.12): whitespace tokens → HashingTF →
    * IDF. Both fits are distributed (document-frequency aggregation);
    * the transform is per-row. */
  def tfidf(df: DataFrame, textCol: String, numFeatures: Int = 1 << 12): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
    val tok = new Tokenizer().setInputCol(textCol).setOutputCol("_tokens")
    val tf = new HashingTF().setInputCol("_tokens").setOutputCol("_tf")
      .setNumFeatures(numFeatures)
    val tfed = tf.transform(tok.transform(df))
    val idf = new IDF().setInputCol("_tf").setOutputCol("tfidf").fit(tfed)
    idf.transform(tfed).drop("_tokens", "_tf")
  }

  /** Exact TF-IDF top-`topK` terms per document, fully SQL-expressible
    * (unlike the [[tfidf]] HashingTF path, whose murmur buckets no other
    * engine reproduces): tf = term count in doc, idf = ln((N+1)/(df+1))+1
    * (smoothed, sklearn-style). Two shuffles — (doc, term) counts, then
    * term-keyed df — and the 1-row corpus count joins in by broadcast.
    * Ties after 6-dp rounding break by term, so top-k is reproducible
    * across engines. */
  def tfidfTerms(docs: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // df rides a WINDOW over the (doc, term, tf) table instead of a
    // separate term aggregate joined back: the corpus is tokenized
    // exactly ONCE in a straight-line plan — no duplicate subtree (the
    // r9 shape), no persist + result checkpoint (the r10 shape; its
    // eager materialization cost more than the pass it saved — r11
    // probe, isolated min-of-3 at sf0.1: r10 1.33 s, r9 0.97 s, this
    // 0.79 s). count over an unbounded term frame equals the join's
    // groupBy(term).count exactly, and WindowExec buffers one term
    // group at a time (spillable), the same per-key bound the join's
    // build side had. Plan stays fully visible to audits (no
    // ExistingRDD), and nothing is left persisted on the session.
    val terms = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    tfidfScored(docs, idCol, terms, topK)
  }

  /** The scoring pipeline of [[tfidfTerms]] over a (doc_id, term, tf,
    * df) table — split out so callers holding a persisted term index
    * (df already attached) can score without re-tokenizing. */
  private[graft] def tfidfScored(docs: DataFrame, idCol: String,
      terms: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = terms.crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") *
        (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }

  /** Okapi BM25 top-k retrieval (Robertson & Zaragoza 2009; the idf is
    * Lucene's non-negative ln(1 + (N − df + ½)/(df + ½)) variant):
    * for every query (a bag of terms), the `k` highest-scoring docs by
    *   Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    * Distinct query terms each count once (bag weights belong on the
    * query side if wanted).
    *
    * Engine-portability: each (query, doc, term) contribution is
    * quantized to integer micro-units and summed as BIGINT — exact and
    * order-independent, so ranking and the 6-dp score are reproducible
    * on any engine (the [[unigramLogProb]] micro-nat trick). Ties break
    * by doc id.
    *
    * Scale shape: ONE (doc, term) tf aggregate + a doc-length aggregate
    * over the corpus, a term-keyed df aggregate over the tf table, and
    * a broadcast of the (small) query-term list pruning the tf table
    * BEFORE anything else joins — the per-query work is proportional to
    * the posting lists of its terms, never the corpus. The 1-row corpus
    * stats broadcast. At 100 TB the tf/dl/df tables are the persisted
    * "index"; build once ([[bm25Index]]), query many. */
  def bm25TopK(queries: DataFrame, docs: DataFrame, queryIdCol: String,
      queryTermsCol: String, idCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // tf feeds THREE derived relations (dl, df, stats) — materialize it
    // once here or the tokenize+aggregate pipeline evaluates once per
    // branch (the ad-hoc path; the steady-state path reads a persisted
    // index and never re-tokenizes). Eager SERIALIZED persist, not
    // localCheckpoint: the posting table is corpus-token-scale, and
    // checkpoint blocks are deserialized and un-evictable (the pinning
    // the sf10 graph probe OOM'd on); the count() populates the cache
    // before the three independent aggregate stages race to read it.
    val tf = bm25Tf(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    tf.count()
    // dl is CONSUMED TWICE (the corpus stats rollup and the hits join)
    // and each uncached evaluation is a full pass over the
    // corpus-token-scale tf table — persist the doc-count-sized result
    // so the second consumer reads n_docs rows instead of re-folding
    // every posting (measured at sf0.1: two identical 0.65 s tf-pass
    // stages → one; at 100 TB it removes a token-scale pass). O(docs)
    // memory, evictable, released with tf below.
    val dlC = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // eager localCheckpoint on the k·|queries|-sized RESULT lets the
      // corpus-token-scale tf cache release before returning — a
      // DataFrame persist is held by the session CacheManager until
      // explicit unpersist, so the ad-hoc path must not leak one per
      // call on a long-lived session (the steady-state path uses
      // [[bm25Index]] and the CALLER owns that lifecycle)
      val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val stats = dlC.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
      bm25TopKWith(queries, queryIdCol, queryTermsCol, k, tf, dlC, dft, stats, k1, b)
        .localCheckpoint()
    } finally {
      tf.unpersist(blocking = false)
      dlC.unpersist(blocking = false)
    }
  }

  /** The four relations of a BM25 "index": (doc,term,tf), (doc,dl),
    * (term,df), and the 1-row (n_docs, total_dl) stats — dl/df/stats
    * all derive from the tf table (dl = Σ tf per doc), so the corpus
    * text is tokenized exactly ONCE. Persist these at scale;
    * [[bm25TopKWith]] queries them without re-scanning text. */
  def bm25Index(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val tf = bm25Tf(docs, idCol, textCol)
    val (dl, dft, stats) = bm25Derived(tf)
    (tf, dl, dft, stats)
  }

  private def bm25Tf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  private def bm25Derived(tf: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    (dl, dft, stats)
  }

  /** BM25 scoring against a pre-built index — the steady-state path. */
  def bm25TopKWith(queries: DataFrame, queryIdCol: String,
      queryTermsCol: String, k: Int, tf: DataFrame, dl: DataFrame,
      dft: DataFrame, stats: DataFrame,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(col(queryTermsCol))).as("term"))
    // prune the posting lists FIRST: only query terms survive the scan;
    // the df table prunes the same way (vocab-sized at 100 TB — the
    // semi-join makes its join side query-term-sized, hence broadcast)
    val dftQ = dft.join(broadcast(q.select(col("term")).distinct()), Seq("term"), "left_semi")
    val hits = tf.join(broadcast(q), "term")
      .join(dftQ, "term").join(dl, "doc_id").crossJoin(broadcast(stats))
      .withColumn("avgdl", col("total_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("c6", round(col("idf") * (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
        * 1e6, 0).cast("long"))
    val agg = hits.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c6")).as("s6"), count(lit(1)).as("n_terms_hit"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("s6").desc, col("doc_id"))
    agg.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms_hit"),
        round(col("s6").cast("double") / 1e6, 6).as("bm25"))
  }

  /** Email regex shared with the oracle contract (kept to syntax that
    * means the same thing in Java regex and RE2). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-number regex: 3-3-4 groups with -, ., or space separators. */
  val PhonePattern = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** PII scan — the redaction pass every training-corpus pipeline runs
    * before release: per-row counts of email/phone matches plus the
    * text with both redacted. Pure codegen'd regex column ops, zero
    * shuffle. */
  def piiScan(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", size(regexp_extract_all(t, lit(EmailPattern), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(PhonePattern), lit(0))))
      .withColumn("redacted",
        regexp_replace(regexp_replace(t, EmailPattern, "[EMAIL]"),
          PhonePattern, "[PHONE]"))
  }

  /** Exact corpus-wide heavy hitters: the `k` most frequent whitespace
    * tokens with counts. Two-level hash aggregate (partial map-side
    * combine collapses each partition's token counts before the single
    * shuffle on token) + `TakeOrdered` for the global top-k — no global
    * sort, no driver-side counting. Token keys are near-uniform after
    * the partial agg (one row per distinct token per partition), so no
    * salting is needed even though token FREQUENCIES are Zipfian.
    * Ties break lexicographically for a deterministic result. */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Approximate token-frequency sketch (Count-Min) for when the
    * vocabulary is too large to hash-aggregate exactly (web-scale
    * n-gram counting): fixed O(1/eps · log 1/confidence) memory however
    * many distinct tokens exist, partial sketches merged across
    * partitions, errors are OVERESTIMATES bounded by eps·N with the
    * given confidence — so a heavy-hitter screen via the sketch never
    * misses a true heavy hitter. Pair with [[heavyHitters]]: sketch to
    * screen candidates cheaply, exact-count only the survivors. */
  def tokenSketch(docs: DataFrame, textCol: String, eps: Double = 1e-4,
      confidence: Double = 0.99, seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch =
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .stat.countMinSketch("token", eps, confidence, seed)

  /** Per-group vocabulary sketches: an HLL (Apache DataSketches) per
    * `groupCol` estimating its distinct-token count. The sketch is a
    * BINARY COLUMN — mergeable aggregate state, which is the whole
    * point at 100 TB: per-shard/per-day sketches persist beside the
    * data and roll up with [[unionVocabSketches]] in milliseconds,
    * instead of re-scanning the corpus for every distinct-count over a
    * new grouping. (~2 % standard error at lgK=12, 4 KB per sketch.) */
  def vocabSketch(docs: DataFrame, groupCol: String, textCol: String,
      lgK: Int = 12): DataFrame =
    docs.select(col(groupCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(groupCol))
      .agg(hll_sketch_agg(col("token"), lit(lgK)).as("vocab_sketch"),
        count(lit(1)).as("n_tokens"))

  /** Roll sketches up across groups: the merged estimate of distinct
    * tokens over ALL groups — no rescan, pure sketch union. */
  def unionVocabSketches(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("vocab_sketch"))).as("est_distinct_tokens"))

  /** Per-document unigram log-probability score — the self-trained
    * stand-in for the KenLM perplexity filter (CCNet, Wenzek et al.
    * 2020): fit a unigram LM on the corpus itself (token frequencies),
    * score each doc by its mean token surprisal −ln p(token). High
    * scores = improbable token streams (noise, mojibake, keyword spam);
    * the filter drops the tail. Returns (doc_id, n_tokens, avg_nll).
    *
    * Engine-portability: each token's surprisal is quantized to integer
    * micro-nats and summed as BIGINT — exact and order-independent
    * (double summation drifts with partitioning; decimal DIVISION
    * rounds differently across engines). The mean is then one double
    * division of identical integers on any engine.
    * Scale shape: ONE token-frequency aggregate (uniform keys) +
    * broadcast total + a doc-keyed aggregate — the frequency table
    * broadcasts while vocab fits (AQE decides), and nothing is ever
    * corpus-wide beyond it. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("token"))
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val scored = tok.join(freq, Seq("token")).crossJoin(broadcast(total))
      .withColumn("nll6",
        round(-log(col("cnt").cast("double") / col("total")) * 1e6, 0).cast("long"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("nll6")).as("sum6"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sum6").cast("double") / col("n_tokens") / 1e6, 4).as("avg_nll"))
  }

  /** Per-source token-distribution diagnostics: Shannon entropy of each
    * source's unigram distribution plus its KL divergence from the
    * whole-corpus distribution — the standard mixture-QA pair for
    * training-data curation (a low-entropy source is repetitive/
    * templated; a high-KL source is distributionally unlike the rest
    * of the mix and will shift the trained model).
    *   H(p_s)      = −Σ_t (c_st/T_s) ln(c_st/T_s)
    *   KL(p_s‖q)   =  Σ_t (c_st/T_s) ln((c_st/T_s)/(c_t/T))
    * KL is computed over the source's own support, where q > 0 always
    * holds (every source token is a corpus token) — no smoothing needed.
    * Engine-exactness: the per-(source,token) ln terms quantize to
    * integer micro-nats and are weighted by the INTEGER count c_st, so
    * both sums are order-independent BIGINT arithmetic (the
    * [[unigramLogProb]] trick, weighted). The weighted products stay in
    * long range while c_st·20e6 < 2⁶³ — i.e. per-(source,token) counts
    * up to ~4.6e11 occurrences, far past any real corpus cell.
    * Scale shape: ONE (source, token) aggregate off the tokenize scan;
    * everything after is vocab-sized (the per-source and per-token
    * rollups re-aggregate that table; the per-source totals and the
    * grand total broadcast). The only corpus-wide job is the first agg. */
  def sourceEntropy(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(srcCol).as("source"),
      explode(split(col(textCol), " ")).as("token"))
    val st = tok.groupBy(col("source"), col("token")).agg(count(lit(1)).as("cnt_st"))
    val perSrc = st.groupBy(col("source")).agg(sum(col("cnt_st")).as("tot_s"))
    val perTok = st.groupBy(col("token")).agg(sum(col("cnt_st")).as("cnt_t"))
    val total = perTok.agg(sum(col("cnt_t")).as("total"))
    st.join(broadcast(perSrc), Seq("source")).join(perTok, Seq("token"))
      .crossJoin(broadcast(total))
      .withColumn("h6",
        round(-log(col("cnt_st").cast("double") / col("tot_s")) * 1e6, 0).cast("long"))
      .withColumn("kl6",
        round(log((col("cnt_st").cast("double") / col("tot_s")) /
          (col("cnt_t").cast("double") / col("total"))) * 1e6, 0).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct_tokens"), max(col("tot_s")).as("n_tokens"),
        sum(col("cnt_st") * col("h6")).as("hsum6"),
        sum(col("cnt_st") * col("kl6")).as("klsum6"))
      .select(col("source"), col("n_distinct_tokens"), col("n_tokens"),
        round(col("hsum6").cast("double") / col("n_tokens") / 1e6, 4).as("entropy_nats"),
        round(col("klsum6").cast("double") / col("n_tokens") / 1e6, 4).as("kl_vs_corpus"))
  }

  /** Bigram LM surprisal — the conditional-probability upgrade of
    * [[unigramLogProb]] (the CCNet-style LM quality screen, one order
    * up): per doc, the mean −ln P(w_i | w_{i−1}) under an add-1
    * (Laplace) smoothed bigram model fit on the corpus itself,
    *   P(w_i | w_{i−1}) = (c(w_{i−1} w_i) + 1) / (c(w_{i−1} ·) + V),
    * with V the corpus vocabulary size. Add-1 keeps every count an
    * exact integer, so both engines divide IDENTICAL integers and the
    * micro-nat quantization trick of [[unigramLogProb]] carries over —
    * exact, order-independent, engine-portable. Returns
    * (doc_id, n_bigrams, avg_nll) for docs with ≥ 1 bigram.
    *
    * Scale shape: bigram rows are generated doc-contiguous from the
    * token array (fused explode + element_at — zero shuffle); the
    * bigram-count table is ONE uniform hash aggregate, and the context
    * count rides it as a w1-partitioned window sum — computed on the
    * (vocab²-bounded) count table, NOT by re-aggregating the corpus
    * stream, so the corpus is scanned twice total (bigram stream +
    * count build; a separate ctx aggregate would make it three and run
    * the bigram pipeline twice). V is a 1-row broadcast. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(1), size(col("tk")) - 1)).as("i"))
      .select(col("doc_id"),
        element_at(col("tk"), col("i")).as("w1"),
        element_at(col("tk"), col("i") + 1).as("w2"))
    val big = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .withColumn("cu", sum(col("cb")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
    val vocab = docs
      .select(explode(split(col(textCol), " ")).as("token"))
      .agg(countDistinct(col("token")).as("v"))
    bg.join(big, Seq("w1", "w2"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll6",
        round(-log((col("cb") + lit(1.0)) / (col("cu") + col("v"))) * 1e6, 0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll6")).as("sum6"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sum6").cast("double") / col("n_bigrams") / 1e6, 4).as("avg_nll"))
  }

  /** Composed Gopher-style document filter (Rae et al. 2021,
    * arXiv:2112.11446 Table A1): the length / mean-token-length /
    * stopword / repetition rules evaluated in one pass, each failure
    * named so the drop is auditable (production corpus filtering keeps
    * per-rule counters, not just a boolean). Returns every doc with its
    * signals, `fail_reasons` (comma-joined rule names, "" = clean) and
    * `keep`. Docs with no bigrams have NULL top_bigram_frac and skip
    * the repetition rule — same convention as [[repetitionStats]].
    *
    * Shape: the column rules are codegen'd projections on the scan; the
    * repetition signals reuse [[repetitionStats]]'s doc-scoped
    * aggregates; ONE doc-keyed join stitches them. Nothing corpus-wide,
    * linear and skew-free at any scale. */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 16, maxTokens: Long = 100000,
      minAvgTokLen: Double = 2.0, maxAvgTokLen: Double = 12.0,
      minStopwordRatio: Double = 0.02,
      maxDupWordFrac: Double = 0.7, maxTopBigramFrac: Double = 0.18): DataFrame = {
    val t = col(textCol)
    val base = docs.select(col(idCol).as("doc_id"),
      round(avgTokenLen(t), 6).as("avg_tok_len"),
      stopwordRatio(t).as("stopword_ratio"))
    base.join(repetitionStats(docs, idCol, textCol), Seq("doc_id"))
      .withColumn("fail_reasons", concat_ws(",",
        when(col("n_tokens") < minTokens, "too_short"),
        when(col("n_tokens") > maxTokens, "too_long"),
        when(!col("avg_tok_len").between(minAvgTokLen, maxAvgTokLen), "tok_len"),
        when(col("stopword_ratio") < minStopwordRatio, "low_stopword"),
        when(col("dup_word_frac") > maxDupWordFrac, "dup_words"),
        when(col("top_bigram_frac") > maxTopBigramFrac, "rep_bigram")))
      .withColumn("keep", col("fail_reasons") === "")
      .select(col("doc_id"), col("n_tokens"), col("avg_tok_len"),
        col("stopword_ratio"), col("dup_word_frac"), col("top_bigram_frac"),
        col("fail_reasons"), col("keep"))
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1: "repetition" filters) per document:
    * duplicate-word fraction (1 − distinct/total tokens) and the
    * fraction of all 2-grams taken by the single most frequent 2-gram.
    * High values flag boilerplate/spam for corpus filtering.
    *
    * Shape: the bigram rows come from the same explode(sequence) +
    * element_at formulation as [[graft.llm.Dedup.shingleRowsRaw]] —
    * fully codegen'd, zero shuffle to generate; then TWO hash
    * aggregates keyed by (doc_id, bigram) → doc_id (both map-side
    * combining) and one doc-keyed join against the token-level
    * aggregate. Nothing is ever corpus-wide: every key is doc-scoped,
    * so the op scales linearly and skew-free. Docs with < 2 tokens get
    * NULL top_bigram_frac (no bigrams exist). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("tk"))
    val tokStats = tk
      .select(col("doc_id"), explode(col("tk")).as("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("token")).as("n_distinct"))
      .withColumn("dup_word_frac",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6))
    val bigramStats = tk
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(1), size(col("tk")) - 1)).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        element_at(col("tk"), col("i")),
        element_at(col("tk"), col("i") + 1)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max_bg"), sum(col("c")).as("total_bg"))
      .select(col("doc_id").as("__bid"),
        round(col("max_bg").cast("double") / col("total_bg"), 6).as("top_bigram_frac"))
    tokStats.join(bigramStats, col("doc_id") === col("__bid"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("dup_word_frac"), col("top_bigram_frac"))
  }

  /** Convenience: attach the full stats column set. */
  def withStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_regex_tokens", regexTokenCount(t))
      .withColumn("type_token_ratio", typeTokenRatio(t))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_pred", langIdHeuristic(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
