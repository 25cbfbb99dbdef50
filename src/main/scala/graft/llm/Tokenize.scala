package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subword tokenization against a learned vocabulary — the step that
  * turns a filtered corpus into trainable token ids, and the engine's
  * only operator whose inner loop is inherently sequential per word
  * (greedy longest-match; no closed-form SQL).
  *
  * Scale shape: the vocabulary is fit with ONE distributed frequency
  * aggregate (driver receives `vocabSize` rows, nothing else), then
  * broadcast once; tokenization is a zero-shuffle projection. The
  * per-row work is a Scala UDF by necessity — the greedy match is a
  * data-dependent loop, not an expression tree — but it touches only
  * the text column, carries no state, and parallelizes embarrassingly,
  * so the 100 TB cost is pure CPU riding the scan.
  */
object Tokenize {

  /** Learn a `vocabSize`-entry vocabulary: every single character seen
    * (so tokenization never fails) plus the most frequent whitespace
    * words, ranked by (count desc, token asc) — fully deterministic.
    * Ids are 0-based in that rank order. One aggregate + one top-k;
    * returns (token STRING, id INT). */
  def fitVocab(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1)
    val words = docs.select(explode(split(col(textCol), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
    val chars = docs.select(
        explode(split(regexp_replace(col(textCol), "\\s+", ""), "")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
    // Characters take rank priority over multi-char words so the
    // single-char fallback alphabet always makes the cut (a vocab
    // without it can only emit unk for unseen words); a single-char
    // WORD and the character it equals collapse to the char entry.
    val ranked = chars.withColumn("__prio", lit(0))
      .unionByName(words.withColumn("__prio", lit(1)))
      .groupBy("token").agg(min(col("__prio")).as("__prio"), max(col("n")).as("n"))
      .orderBy(col("__prio"), col("n").desc, col("token"))
      .limit(vocabSize)
    ranked.select(col("token"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__prio"), col("n").desc, col("token"))) - 1).as("id"))
  }

  /** Tokenize `textCol` by greedy longest-match against `vocab`
    * ((token, id) rows): each whitespace word is scanned left to right,
    * the longest vocab prefix is emitted, and an unmatched leading
    * character emits `unkId` and advances one char. Deterministic for a
    * fixed vocab. Output: input columns + `token_ids ARRAY<INT>`,
    * `n_tokens INT`, `n_unk INT`.
    *
    * The vocab is collected (vocabSize-bounded by [[fitVocab]]) and
    * broadcast as a hash map; `maxTokenLen` caps the prefix probe so a
    * word of length L costs O(L · maxTokenLen) lookups. */
  def tokenize(docs: DataFrame, textCol: String, vocab: DataFrame,
      unkId: Int = -1): DataFrame = {
    val spark = docs.sparkSession
    val entries = vocab.select(col("token"), col("id").cast("int"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    val maxLen = entries.iterator.map(_._1.length).maxOption.getOrElse(1)
    val bc = spark.sparkContext.broadcast(entries.toMap)
    val tok = udf { (text: String) =>
      if (text == null) (Array.empty[Int], 0, 0)
      else {
        val v = bc.value
        val out = Array.newBuilder[Int]
        var unk = 0
        text.split("\\s+").foreach { w =>
          var i = 0
          while (i < w.length) {
            var len = math.min(maxLen, w.length - i)
            var hit = -1
            while (len >= 1 && hit < 0) {
              val id = v.getOrElse(w.substring(i, i + len), -1)
              if (id >= 0) hit = len else len -= 1
            }
            if (hit > 0) {
              out += v(w.substring(i, i + hit)); i += hit
            } else {
              out += unkId; unk += 1; i += 1
            }
          }
        }
        val ids = out.result()
        (ids, ids.length, unk)
      }
    }.asNondeterministic() // single evaluation per row (cf. StreamDedup)
    docs.withColumn("__t", tok(col(textCol)))
      .withColumn("token_ids", col("__t._1"))
      .withColumn("n_tokens", col("__t._2"))
      .withColumn("n_unk", col("__t._3"))
      .drop("__t")
  }
}
