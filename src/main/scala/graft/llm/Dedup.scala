package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md §2.12):
  * exact, token-set, MinHash (+LSH banding), SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB):
  *  - exact/token-set dedup is one hash-aggregate on a fingerprint — the
  *    shuffle key is the fingerprint itself so the reduction is maximal
  *    map-side (partial agg) and skew-free (hashes are uniform);
  *  - MinHash signatures are computed per-row with array expressions
  *    (no explode, no shuffle), then LSH banding shuffles only
  *    (docId, band, bandHash) tuples — tiny compared to the corpus;
  *  - candidate verification joins are band-bucket joins, never a
  *    quadratic cross join.
  */
object Dedup {

  /** Distinct word-3-gram shingles of a whitespace-tokenized text.
    * Requires ≥3 tokens (filter shorter docs first — ANSI mode makes
    * out-of-bounds element_at an error). */
  def shingles3(text: Column): Column = {
    val t = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
  }

  /** MinHash signature as an array of `n` 64-bit minima over xxhash64 of
    * the shingles, seeded per hash index. Per-row, shuffle-free. */
  def minhashSignature(shingles: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))

  /** Portable MinHash over md5 hex strings (reproducible in any engine
    * with md5 — used by the DuckDB-oracle contract; xxhash64 variant is
    * the fast path). */
  def minhashSignatureMd5(shingles: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => array_min(transform(shingles, s => md5(concat(i.cast("string"), lit("|"), s)))))

  /** Exact dedup: group identical values of `fingerprintCol`, keep the
    * minimum id; returns (fingerprint, keep_id, n_dups). */
  def exactGroups(df: DataFrame, idCol: String, fingerprintCol: Column): DataFrame =
    df.groupBy(fingerprintCol.as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Candidate near-duplicate pairs: docs agreeing on ≥ `minMatches` of
    * `n` minhashes. The join key is (hashIndex, minhashValue) — i.e. LSH
    * with band size 1 — so cost scales with bucket sizes, not corpus².
    */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minMatches: Int): DataFrame = {
    val sigs = docs
      .filter(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).as("doc_id"),
        posexplode(minhashSignatureMd5(shingles3(col(textCol)), n)).as(Seq("i", "mh")))
    val a = sigs.as("a")
    val b = sigs.as("b")
    a.join(b, col("a.i") === col("b.i") && col("a.mh") === col("b.mh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_matches"))
      .filter(col("n_matches") >= minMatches)
  }

  /** 16-bit SimHash from md5 of whitespace tokens (frequency-weighted).
    * Bit b is the sign of the +1/−1 vote sum over tokens, where a token
    * votes by the low bit of hex digit b of its md5. Integer votes →
    * order-independent, engine-portable. */
  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val votes = (0 until 16).map { b =>
      sum(when((instr(lit("0123456789abcdef"), substring(col("h"), b + 1, 1)) - 1) % 2 === 1, 1)
        .otherwise(-1)).as(s"v$b")
    }
    val agg = tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sim = (0 until 16).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** Exact n-gram Jaccard similarity for all pairs in `docs` — O(n²) in
    * bucket sizes of the shingle join; intended for candidate sets or
    * deterministic samples, with MinHash-LSH as the full-scale path. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val sh = docs
      .filter(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).as("doc_id"), explode(shingles3(col(textCol))).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }
}
