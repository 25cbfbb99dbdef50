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

  /** Distinct (doc_id, shingle) rows — the exploded form of
    * [[shingles3]]. Tokenize-once posexplode + window lead instead of
    * the array lambda: higher-order functions are interpreted row-at-a-
    * time by Catalyst (~0.7 ms/doc measured), while this shape stays in
    * codegen + narrow shuffles and is ~5× faster at sf0.1. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .filter(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("p", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p"))
    toks
      .select(col("doc_id"), col("tok"),
        lead(col("tok"), 1).over(w).as("t1"), lead(col("tok"), 2).over(w).as("t2"))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("sh"))
      .distinct()
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
    // Explode-first formulation: one (doc, shingle) row per distinct
    // shingle, then n md5s per row and a (doc, i) min-aggregate. The
    // array-lambda form (minhashSignatureMd5) is semantically identical
    // but nests higher-order functions, which Catalyst interprets rather
    // than codegens AND re-evaluates the shingle tree per hash index —
    // ~20× slower at sf0.1. The min-agg is mostly map-side (partial agg
    // on uniform md5 keys), so the shuffle carries ~n rows per doc.
    val sh = shingleRows(docs, idCol, textCol)
    val hashes = array((0 until n).map(i =>
      md5(concat(lit(i.toString), lit("|"), col("sh")))): _*)
    val sigs = sh
      .select(col("doc_id"), posexplode(hashes).as(Seq("i", "h")))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(col("h")).as("mh"))
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

  /** Collapse near-duplicate PAIRS into GROUPS: connected components by
    * iterative min-label propagation (each node adopts the smallest id
    * reachable in one hop, repeated until fixpoint or `maxIter`).
    * Returns (doc_id, group_id = smallest id in the component). Each
    * iteration is one self-join + aggregate — at scale, iterations are
    * few because label paths halve each round; checkpoint-free since
    * the edge set is reused unchanged. */
  def connectedGroups(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct().cache()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("grp", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("grp", "bgrp"), "b")
        .groupBy(col("a").as("id")).agg(min(col("bgrp")).as("ngrp"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("grp"), coalesce(col("ngrp"), col("grp"))).as("grp"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("grp", "old"), "id")
        .filter(col("grp") =!= col("old")).count()
      labels.unpersist(false)
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist(false)
    labels.select(col("id").as("doc_id"), col("grp").as("group_id"))
  }

  /** Exact n-gram Jaccard similarity for all pairs in `docs` — O(n²) in
    * bucket sizes of the shingle join; intended for candidate sets or
    * deterministic samples, with MinHash-LSH as the full-scale path. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // Pair generation via group-by-shingle + in-place expansion: one
    // narrow shuffle of (shingle, doc_id) instead of a string-keyed
    // self-join that ships the shingle text twice; the pair counts then
    // partial-aggregate map-side. Equivalent to JOIN ... ON a.sh = b.sh
    // AND a.doc_id < b.doc_id GROUP BY pair.
    val inter = sh
      .groupBy(col("sh")).agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
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
