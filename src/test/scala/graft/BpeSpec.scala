package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Bpe

/** Distributed BPE training vs an independent sequential reference
  * implementation (same counting and tie rules), plus encode
  * round-trip/segmentation properties. */
class BpeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Sequential reference: overlapping pair counts weighted by word
    * freq, best = (count desc, pair asc), merge applied left-to-right
    * non-overlapping. */
  private def refBpe(freqs: Seq[(String, Long)], k: Int): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      freqs.map { case (w, n) => w.split("").toVector -> n }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          counts((syms(i), syms(i + 1))) += n; i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += best
        words = words.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += best._1 + best._2; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), n)
        }
        round += 1
      }
    }
    merges.result()
  }

  // the classic Sennrich corpus
  private val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("fitMerges matches the sequential reference, merge for merge") {
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val freqs = Bpe.wordFreqs(docs, "text")
    val gotFreqs = freqs.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(gotFreqs.toMap == Map("low" -> 5L, "lower" -> 2L,
      "newest" -> 6L, "widest" -> 3L))
    val expected = refBpe(gotFreqs, 10)
    val got = Bpe.fitMerges(freqs, 10, checkpointEvery = 3)
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
    // first merges on this corpus are famously (e,s) then (es,t)
    assert(got.take(2) == Seq("e" -> "s", "es" -> "t"), got.take(2).toString)
  }

  test("fitMerges stops early when no pairs remain") {
    val freqs = Seq(("ab", 3L)).toDF("word", "n")
    val got = Bpe.fitMerges(freqs, 100)
    assert(got == Seq("a" -> "b"), got.toString)
  }

  test("encode: tokens re-concatenate to the input words; training words segment consistently") {
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val merges = Bpe.fitMerges(Bpe.wordFreqs(docs, "text"), 8)
    val ab = Bpe.alphabet(docs, "text")
    val out = Bpe.encode(Seq(("newest widest", 1)).toDF("text", "x"),
      "text", merges, ab)
    val row = out.head
    val toks = row.getSeq[String](row.fieldIndex("tokens"))
    assert(toks.mkString("") == "newestwidest",
      s"concat must reproduce the words, got $toks")
    // with (e,s),(es,t),(est->...) learned, 'newest' compresses well
    assert(toks.length < "newest widest".replace(" ", "").length,
      s"no compression happened: $toks")
    // ids: in-vocab tokens nonnegative, and n_tokens consistent
    val ids = row.getSeq[Int](row.fieldIndex("token_ids"))
    assert(ids.forall(_ >= 0) && ids.length == toks.length)
    assert(row.getInt(row.fieldIndex("n_tokens")) == toks.length)
  }

  test("encode: unseen characters map to unkId, ids are deterministic") {
    val merges = Seq("a" -> "b")
    val out1 = Bpe.encode(Seq(("ab zq", 1)).toDF("text", "x"),
      "text", merges, alphabet = Seq("a", "b", "z"), unkId = -7)
    val r = out1.head
    assert(r.getSeq[String](r.fieldIndex("tokens")) == Seq("ab", "z", "q"))
    val ids = r.getSeq[Int](r.fieldIndex("token_ids"))
    // alphabet sorted: a=0,b=1,z=2; merges after: ab=3; q unseen=-7
    assert(ids == Seq(3, 2, -7), ids.toString)
  }

  test("encode is a zero-shuffle projection") {
    val docs = Tables.load(spark, sf0001, "documents")
    val merges = Bpe.fitMerges(
      Bpe.wordFreqs(docs.limit(50), "text"), 5)
    val plan = Bpe.encode(docs, "text", merges,
      Bpe.alphabet(docs.limit(50), "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }
}
