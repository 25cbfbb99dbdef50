package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.batch.FeaturePipeline
import graft.llm.{Dedup, Similarity, TextStats}
import graft.schema.{Schemas, Txn}

/** Edge rows and empty inputs (SURVEY §5.2): operators must return
  * empty/well-typed results, not throw — empty partitions are the
  * steady state of a filtered 100 TB scan. */
class EdgeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val emptyTxns = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.txn)
    .withColumnRenamed("long", "lon")

  test("feature pipeline on an empty frame keeps the 13-column schema") {
    val out = FeaturePipeline.features(emptyTxns)
    assert(out.count() == 0)
    assert(out.columns.length == 13)
  }

  test("dedup operators tolerate empty and sub-3-token docs") {
    val docs = Seq((1L, "one two"), (2L, ""), (3L, "a")).toDF("doc_id", "text")
    assert(Dedup.minhashCandidatePairs(docs, "doc_id", "text", 8, 6).count() == 0)
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5).count() == 0)
    assert(Dedup.simhash16(docs, "doc_id", "text").count() == 3)
    val empty = docs.filter($"doc_id" < 0)
    assert(Dedup.exactGroups(empty, "doc_id", md5($"text")).count() == 0)
  }

  test("similarity handles empty query sets and zero vectors") {
    val vecs = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val none = Similarity.cosineTopK(vecs.filter($"vec_id" < 0), vecs,
      "vec_id", "embedding", 3)
    assert(none.count() == 0)
    // zero vector → cosine NaN; ranking must still not throw
    val withZero = Similarity.cosineTopK(vecs.filter($"vec_id" === 0), vecs,
      "vec_id", "embedding", 3).collect()
    assert(withZero.length == 1)
  }

  test("text stats on empty strings are defined") {
    val st = TextStats.withStats(Seq(Tuple1("")).toDF("text"), "text")
    assert(st.count() == 1) // no throw; token count of "" is 1 (one empty token)
  }

  test("connected groups of an empty pair set is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedGroups(empty).count() == 0)
  }

  test("round-2 operators tolerate empty and degenerate inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.simhashPairs(empty, "doc_id", "text").count() == 0)
    assert(TextStats.winnowFingerprint(empty, "doc_id", "text").count() == 0)
    assert(TextStats.tfidfTerms(empty, "doc_id", "text", 5).count() == 0)
    // text shorter than k+w-1 chars has no full winnow window → absent
    val short = Seq((1L, "abc")).toDF("doc_id", "text")
    assert(TextStats.winnowFingerprint(short, "doc_id", "text").count() == 0)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.quantizeInt8(noVecs, "vec_id", "embedding").count() == 0)
    // empty increment short-circuits; empty history still derives features
    val incr = FeaturePipeline.incrementalFeatures(emptyTxns, emptyTxns)
    assert(incr.count() == 0 && incr.columns.length == 13)
  }

  test("round-3 operators tolerate empty and degenerate inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.chunkDedupStats(empty, "doc_id", "text", 5).count() == 0)
    assert(Dedup.editDistancePairs(empty, "doc_id", "text",
      lit("b"), 48, 8).count() == 0)
    assert(TextStats.gopherFilter(empty, "doc_id", "text").count() == 0)
    // a single one-token doc: one chunk, zero dup chunks; no pairs
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    val c = Dedup.chunkDedupStats(one, "doc_id", "text", 5).head()
    assert(c.getLong(1) == 1L && c.getLong(2) == 0L)
    assert(Dedup.editDistancePairs(one, "doc_id", "text", lit("b"), 48, 8).count() == 0)
    // gopher filter on a short doc fails too_short but still reports signals
    val g = TextStats.gopherFilter(one, "doc_id", "text").head()
    assert(g.getString(g.fieldIndex("fail_reasons")).contains("too_short"))
    // mixture weights of a single group = 1.0
    val w = graft.llm.Shards.sourceWeights(one.withColumn("grp", lit("g")), "grp", 0.7)
      .head()
    assert(w.getDouble(w.fieldIndex("weight")) == 1.0)
  }

  test("round-4 operators tolerate empty and degenerate inputs") {
    import graft.llm.Similarity
    import graft.operators.SkewJoin
    // bigram NLL: docs with < 2 tokens have no bigrams and are excluded
    val docs = Seq((1L, "solo"), (2L, "two words"), (3L, "")).toDF("doc_id", "text")
    val bg = TextStats.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bg.keySet == Set(2L), s"only the 2-token doc has a bigram: $bg")
    assert(bg(2L) == 1L)
    // salted join with factor=1 degenerates to the plain join
    val f = Seq((1L, 10L), (2L, 20L)).toDF("k", "p")
    val d = Seq((1L, "a")).toDF("k", "n")
    assert(SkewJoin.saltedEquiJoin(f, d, Seq("k"), 1).count() == 1)
    // hashOrderedSample with n beyond the row count returns everything
    assert(Similarity.hashOrderedSample(f, "k", 100).count() == 2)
    // PQ on a corpus smaller than k: codebooks pad to k, encode still works
    val tiny = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val books = Similarity.fitPqCodebooks(tiny, "vec_id", "embedding", m = 2, k = 16)
    assert(books.length == 2 && books.forall(_.length == 16))
    val codes = Similarity.pqEncode(tiny, "vec_id", "embedding", books)
    assert(codes.count() == 2)
    // empty corpus: quantizer fit fails loudly, not with a wrong model
    val emptyV = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.fitPqCodebooks(emptyV, "vec_id", "embedding", m = 2, k = 4)
    }
  }

  test("retrieval/graph operators tolerate empty and degenerate inputs") {
    import graft.operators.Graph
    // BM25: query terms absent from the corpus yield no hits, not rows
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val qMiss = Seq((9L, Seq("zeta"))).toDF("qid", "terms")
    assert(TextStats.bm25TopK(qMiss, docs, "qid", "terms", "doc_id", "text", 5).count() == 0)
    // BM25: empty query SET is fine (no rows out)
    val qEmpty = Seq.empty[(Long, Seq[String])].toDF("qid", "terms")
    assert(TextStats.bm25TopK(qEmpty, docs, "qid", "terms", "doc_id", "text", 5).count() == 0)
    // pageRank on a 2-cycle: both nodes fixed at 150000 + 85% of 1e6
    val two = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(two, "src", "dst", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(1L) == pr(2L), "symmetric 2-cycle must tie")
    // deg=1 both sides: r = 150000 + (85·r) div 100 has exact fixpoint 1e6
    assert(pr(1L) == 1000000L, s"integer fixpoint drifted: ${pr(1L)}")
    // triangleCount: duplicate and reversed duplicate edges collapse
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val t = Graph.triangleCount(dup, "u", "v").head
    assert((t.getLong(0), t.getLong(1)) == ((3L, 1L)))
    // triangleCount on an empty edge set
    val none = Seq.empty[(Long, Long)].toDF("u", "v")
    val t0 = Graph.triangleCount(none, "u", "v").head
    assert((t0.getLong(0), t0.getLong(1)) == ((0L, 0L)))
    // labelPropagation: a single undirected edge OSCILLATES under
    // synchronous updates (the textbook bipartite caveat — each node
    // adopts the other's label every round); pin the period-2 behavior
    val lpEven = Graph.labelPropagation(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
      "src", "dst", 4).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lpOdd = Graph.labelPropagation(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
      "src", "dst", 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpEven == Map(1L -> 1L, 2L -> 2L), s"got $lpEven")
    assert(lpOdd == Map(1L -> 2L, 2L -> 1L), s"got $lpOdd")
  }

  test("window queries on a single-row table") {
    val one = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".cast("long")).rangeBetween(-600, 0)
    val r = one.select($"event_id", count(lit(1)).over(w).as("c")).head()
    assert(r.getLong(1) == 1L)
  }
}
