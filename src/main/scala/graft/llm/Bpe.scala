package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary LEARNING, distributed (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units"
  * — the merge-table algorithm behind GPT/Llama tokenizers).
  * [[Tokenize]] applies a fixed vocabulary; this learns one.
  *
  * Scale design: training never touches the corpus after ONE word-
  * frequency aggregate — the working set is the DISTINCT-WORD table
  * (urn-shaped: ~10⁷–10⁸ rows at web scale, vs 10¹² corpus tokens),
  * carried as (symbols ARRAY<STRING>, n). Each merge round is
  *  1. a pair-count aggregate: explode adjacent symbol pairs weighted
  *     by word count, hash-agg, TakeOrdered top-1 (count desc, pair asc
  *     — deterministic ties);
  *  2. a projection applying the merge to the symbol arrays.
  * So cost is numMerges × (one small shuffle + one map pass) over the
  * word table — the corpus itself is read exactly once. Lineage is
  * truncated by `localCheckpoint` every `checkpointEvery` rounds
  * (K chained projections would otherwise deepen the plan linearly).
  */
object Bpe {

  /** Word frequency table of the corpus: ONE aggregate, the only
    * corpus-sized job in BPE training. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` BPE merges from a (word, n) frequency table.
    * Returns the merge table in application order: (rank, left, right).
    * Deterministic: ties in pair count break on (left, right) asc. */
  def fitMerges(freqs: DataFrame, numMerges: Int,
      checkpointEvery: Int = 10): Seq[(String, String)] = {
    require(numMerges >= 1)
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val merges = Seq.newBuilder[(String, String)]
    var words = freqs
      .select(split(col("word"), "").as("symbols"), col("n"))
      .localCheckpoint()
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val top = words
        .filter(size(col("symbols")) >= 2)
        .select(posexplode(slice(col("symbols"), lit(1), size(col("symbols")) - 1))
          .as(Seq("i", "a")), col("symbols"), col("n"))
        .select(col("a"), element_at(col("symbols"), col("i") + 2).as("b"), col("n"))
        .groupBy("a", "b").agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val ab = a + b
        // apply the merge left-to-right (the canonical greedy order)
        val applyMerge = udf { (syms: Seq[String]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += ab; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toSeq
        }
        words = words.select(applyMerge(col("symbols")).as("symbols"), col("n"))
        round += 1
        if (round % checkpointEvery == 0) words = words.localCheckpoint()
      }
    }
    merges.result()
  }

  /** Encode texts with a learned merge table: per word, greedily apply
    * the LOWEST-RANK applicable merge until none applies (the exact
    * inference loop of every BPE tokenizer), then map symbols to ids.
    * Ids: single characters first (sorted), then merged symbols in
    * merge-rank order — deterministic for a fixed merge table; symbols
    * outside the alphabet+merges map to `unkId`. Zero-shuffle
    * projection; the merge table broadcasts as a rank map.
    * Output: input columns + `tokens ARRAY<STRING>`,
    * `token_ids ARRAY<INT>`, `n_tokens INT`. */
  def encode(docs: DataFrame, textCol: String,
      mergeTable: Seq[(String, String)], alphabet: Seq[String],
      unkId: Int = -1): DataFrame = {
    val spark = docs.sparkSession
    val ranks = mergeTable.zipWithIndex.toMap
    val ids = (alphabet.distinct.sorted ++ mergeTable.map { case (a, b) => a + b })
      .distinct.zipWithIndex.toMap
    val bcR = spark.sparkContext.broadcast(ranks)
    val bcI = spark.sparkContext.broadcast(ids)
    val enc = udf { (text: String) =>
      if (text == null) (Array.empty[String], Array.empty[Int])
      else {
        val r = bcR.value
        val out = Array.newBuilder[String]
        text.split("\\s+").filter(_.nonEmpty).foreach { w =>
          var syms = w.split("").toVector
          var done = false
          while (!done && syms.length >= 2) {
            // lowest-rank applicable merge, leftmost occurrence
            var best = Int.MaxValue; var at = -1
            var i = 0
            while (i < syms.length - 1) {
              val rk = r.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
              if (rk < best) { best = rk; at = i }
              i += 1
            }
            if (at < 0) done = true
            else syms = (syms.take(at) :+ (syms(at) + syms(at + 1))) ++
              syms.drop(at + 2)
          }
          out ++= syms
        }
        val toks = out.result()
        (toks, toks.map(t => bcI.value.getOrElse(t, unkId)))
      }
    }.asNondeterministic() // one evaluation per row (cf. StreamDedup)
    docs.withColumn("__e", enc(col(textCol)))
      .withColumn("tokens", col("__e._1"))
      .withColumn("token_ids", col("__e._2"))
      .withColumn("n_tokens", size(col("tokens")))
      .drop("__e")
  }

  /** The corpus alphabet (distinct single characters of non-whitespace
    * text) — the id base [[encode]] expects. One small aggregate. */
  def alphabet(docs: DataFrame, textCol: String): Seq[String] =
    docs.select(explode(split(regexp_replace(col(textCol), "\\s+", ""), ""))
        .as("c"))
      .filter(length(col("c")) > 0)
      .distinct().collect().map(_.getString(0)).toSeq
}
