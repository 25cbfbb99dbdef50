package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Tokenize

/** Greedy longest-match subword tokenization: vocab fit determinism,
  * char-fallback priority, hand-traced greedy matches, corpus-scale
  * sanity on the documents table. */
class TokenizeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def vocabOf(pairs: (String, Int)*) = pairs.toSeq.toDF("token", "id")

  test("tokenize: greedy longest-match, hand-traced") {
    val vocab = vocabOf("abc" -> 0, "ab" -> 1, "a" -> 2, "b" -> 3, "c" -> 4)
    val out = Tokenize.tokenize(Seq(
      ("abc",  "whole-word hit"),
      ("abab", "two greedy bigrams"),
      ("abd",  "longest prefix then unk for d"),
      ("cab abc", "two words")
    ).toDF("text", "why"), "text", vocab, unkId = -1)
      .select("text", "token_ids", "n_tokens", "n_unk")
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Int](1), r.getInt(2), r.getInt(3)))).toMap
    assert(out("abc") == ((Seq(0), 1, 0)))
    assert(out("abab") == ((Seq(1, 1), 2, 0)))
    assert(out("abd") == ((Seq(1, -1), 2, 1)))
    // "cab": no prefix match at c -> emit c, then "ab" matches greedily
    assert(out("cab abc") == ((Seq(4, 1, 0), 3, 0)))
  }

  test("tokenize: null text yields empty ids, not a crash") {
    val vocab = vocabOf("a" -> 0)
    val out = Tokenize.tokenize(
      Seq((1L, null.asInstanceOf[String]), (2L, "a")).toDF("id", "text"),
      "text", vocab).orderBy("id").collect()
    assert(out(0).getSeq[Int](2).isEmpty && out(0).getInt(3) == 0)
    assert(out(1).getSeq[Int](2) == Seq(0))
  }

  test("fitVocab: deterministic ids, chars ranked before words") {
    val docs = Seq("aa bb aa cc", "aa bb zz").toDF("text")
    val v1 = Tokenize.fitVocab(docs, "text", 8).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val v2 = Tokenize.fitVocab(docs, "text", 8).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(v1 == v2, "vocab fit must be deterministic")
    // chars a,b,c,z occupy the first ids (count desc, token asc):
    // a(x6? 'aa'x3 -> 6 chars), b(4), c(2), z(2) then words
    val charIds = Seq("a", "b", "c", "z").map(v1)
    val wordIds = Seq("aa", "bb", "cc", "zz").map(v1)
    assert(charIds.max < wordIds.min,
      s"chars must outrank words: chars=$charIds words=$wordIds")
    assert(v1("a") == 0 && v1("b") == 1, s"count-desc then token-asc: $v1")
  }

  test("fitVocab + tokenize on the documents table: ids bounded, unk only off-vocab") {
    val docs = Tables.load(spark, sf0001, "documents")
    // sf0.001's synthetic corpus has a small closed vocabulary; size the
    // cap to exercise truncation of the word tail but keep every char
    val nChars = docs.select(explode(split(regexp_replace(col("text"),
      "\\s+", ""), "")).as("c")).filter(length(col("c")) > 0)
      .distinct().count().toInt
    val cap = nChars + 10
    val vocab = Tokenize.fitVocab(docs, "text", cap)
    assert(vocab.count() == cap, s"expected truncation to $cap")
    val toks = Tokenize.tokenize(docs, "text", vocab).cache()
    val stats = toks.agg(
      max(array_max(col("token_ids"))), sum("n_tokens"), sum("n_unk"),
      sum(size(col("token_ids")))).head
    assert(stats.getInt(0) < cap, "ids must stay inside the vocab")
    assert(stats.getLong(1) == stats.getLong(3), "n_tokens == ids length")
    // the char fallback is in-vocab, so unk can only come from chars
    // absent from the corpus — impossible when vocab was fit ON it
    assert(stats.getLong(2) == 0L,
      s"corpus-fit vocab must tokenize its own corpus unk-free, got ${stats.getLong(2)}")
    toks.unpersist()
  }

  test("tokenize is a zero-shuffle projection") {
    val docs = Tables.load(spark, sf0001, "documents")
    val vocab = Tokenize.fitVocab(docs, "text", 64)
    val plan = Tokenize.tokenize(docs, "text", vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tokenize must not shuffle:\n$plan")
  }
}
