package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextStats
import graft.operators.Graph

/** BM25 retrieval vs an independent sequential reference, and integer
  * PageRank vs a hand-run power iteration with the same integer rules. */
class RankSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // ---- BM25 ----

  /** Spark round() is HALF_UP (away from zero on ties) — math.rint is
    * half-to-even and would diverge on exact .5 micro-unit boundaries. */
  private def roundHalfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Sequential reference: same Lucene idf, same micro-unit rounding. */
  private def refBm25(corpus: Seq[(Long, String)], qTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Long] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = corpus.length
    val dl = toks.map { case (id, tk) => id -> tk.length }.toMap
    val avgdl = dl.values.sum.toDouble / n
    val df = toks.flatMap(_._2.distinct).groupBy(identity).map { case (t, xs) => t -> xs.length }
    val terms = qTerms.distinct
    toks.map { case (id, tk) =>
      val s6 = terms.flatMap { t =>
        val tf = tk.count(_ == t)
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          Some(roundHalfUp(idf * (tf * (k1 + 1)) /
            (tf + k1 * ((1 - b) + b * dl(id) / avgdl)) * 1e6))
        }
      }.sum
      id -> s6
    }.filter(_._2 != 0L).toMap
  }

  test("bm25TopK matches the sequential reference on a hand corpus") {
    val corpus = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry cherry durian"),
      (3L, "apple apple apple apple"),
      (4L, "elderberry fig"),
      (5L, "banana apple"))
    val docs = corpus.toDF("doc_id", "text")
    val qs = Seq((100L, Seq("apple", "banana"))).toDF("qid", "terms")
    val got = TextStats.bm25TopK(qs, docs, "qid", "terms", "doc_id", "text", k = 10)
      .orderBy($"rank").collect()
    val exp = refBm25(corpus, Seq("apple", "banana"))
    // every doc containing a query term appears, ranked by score desc
    assert(got.map(_.getLong(2)).toSet == exp.keySet)
    val expOrder = exp.toSeq.sortBy { case (id, s6) => (-s6, id) }.map(_._1)
    assert(got.map(_.getLong(2)).toSeq == expOrder)
    got.foreach { r =>
      val id = r.getLong(2)
      assert(math.abs(r.getDouble(4) - exp(id) / 1e6) < 1e-9,
        s"score mismatch for doc $id")
    }
  }

  test("bm25: rarer term dominates a common one at equal tf") {
    // 'rare' appears in 1 doc, 'common' in all — idf must rank doc 1
    // (rare hit) above doc 2 (common-only) for a query with both terms
    val docs = Seq(
      (1L, "rare common pad pad"),
      (2L, "common pad pad pad"),
      (3L, "common pad pad pad")).toDF("doc_id", "text")
    val qs = Seq((1L, Seq("rare", "common"))).toDF("qid", "terms")
    val got = TextStats.bm25TopK(qs, docs, "qid", "terms", "doc_id", "text", k = 3)
      .orderBy($"rank").collect()
    assert(got.head.getLong(2) == 1L)
    assert(got.head.getLong(3) == 2L) // both terms hit doc 1
  }

  test("bm25 is partition-order independent") {
    val docs = Tables.load(spark, sf0001, "documents")
    val qs = docs.filter($"doc_id" % 97 === 0)
      .select($"doc_id".as("qid"),
        array_distinct(slice(split($"text", " "), 1, 4)).as("terms"))
    val a = TextStats.bm25TopK(qs, docs, "qid", "terms", "doc_id", "text", k = 10)
      .orderBy($"query_id", $"rank").collect().toSeq
    val b = TextStats.bm25TopK(qs, docs.repartition(7, $"lang"), "qid", "terms",
      "doc_id", "text", k = 10)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(a == b)
  }

  // ---- PageRank ----

  /** Sequential reference with the identical integer update rule. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    var rank: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = in.map { case (n, m) => n -> (150000L + 85L * m / 100L) }
    }
    rank
  }

  test("pageRank matches the sequential integer reference on a hand graph") {
    // path-with-hub: 1-2, 2-3, 3-4, 2-4 (undirected → both directions)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L))
    val dir = und ++ und.map(_.swap)
    val got = Graph.pageRank(dir.toDF("src", "dst"), "src", "dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(dir, 10))
  }

  test("pageRank: hub of a star outranks leaves; mass is conserved-ish") {
    val leaves = (2L to 9L)
    val dir = leaves.flatMap(l => Seq((1L, l), (l, 1L)))
    val got = Graph.pageRank(dir.toDF("src", "dst"), "src", "dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(leaves.forall(l => got(1L) > got(l)))
    // integer truncation only loses mass: total ≤ n·1e6, and not by much
    val total = got.values.sum
    assert(total <= 9L * 1000000L && total > 8L * 1000000L, total.toString)
  }

  test("pageRank on a power-law hub graph matches the sequential reference (skew correctness)") {
    // Zipf-ish layout: node 1 touches ~half of all edges — the
    // celebrity shape the 100 TB probes stress. Distributed join/agg
    // supersteps must produce bit-identical ranks no matter how AQE
    // splits the hub's partition. Deterministic generator, 600 edges.
    val rnd = new scala.util.Random(7)
    val und = (0 until 600).map { _ =>
      def zipf(): Long = math.min(50L, math.max(1L,
        math.exp(rnd.nextDouble() * math.log(50.0)).toLong))
      (zipf(), zipf())
    }.filter { case (a, b) => a != b }.distinct
    val dir = (und ++ und.map(_.swap)).distinct
    val hubDeg = dir.groupBy(_._1).map(_._2.size).max
    assert(hubDeg >= 20, s"generator degenerate: max degree $hubDeg")
    val got = Graph.pageRank(dir.toDF("src", "dst").repartition(16), "src", "dst",
        iters = 10, assumeDistinct = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(dir, 10))
  }

  /** Sequential PPR reference with the identical integer update rule. */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    val base = 150000L * deg.size / seeds.size
    var rank: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = in.map { case (n, m) =>
        n -> ((if (seeds.contains(n)) base else 0L) + 85L * m / 100L)
      }
    }
    rank
  }

  test("personalized pageRank matches the sequential reference; rank concentrates near seeds") {
    // path 1-2-3-4-5 (undirected), seed at node 1
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val dir = und ++ und.map(_.swap)
    val seeds = Seq(1L).toDF("node")
    val got = Graph.personalizedPageRank(dir.toDF("src", "dst"), "src", "dst",
        seeds, "node", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPpr(dir, Set(1L), 10))
    // proximity to the seed orders the ranks: the seed's neighbor
    // outranks the far end of the path
    assert(got(2L) > got(4L), got.toString)
    assert(got(2L) > got(5L), got.toString)
  }

  test("personalized pageRank rejects seeds outside the graph's node set") {
    // an isolated seed would silently lose its teleport mass through
    // the message-side left_outer — the precondition is enforced, not
    // just documented
    val und = Seq((1L, 2L), (2L, 3L))
    val dir = und ++ und.map(_.swap)
    val ex = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(dir.toDF("src", "dst"), "src", "dst",
        Seq(1L, 99L).toDF("node"), "node", iters = 2)
    }
    assert(ex.getMessage.contains("not nodes of the graph"), ex.getMessage)
  }

  test("personalized pageRank with a precomputed node count matches the self-counting form") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val dir = und ++ und.map(_.swap)
    def run(known: Option[Long]) =
      Graph.personalizedPageRank(dir.toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("node"), "node", iters = 5, knownNodeCount = known)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Some(4L)) == run(None))
  }

  test("personalized pageRank with ALL nodes as seeds equals plain pageRank") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L))
    val dir = und ++ und.map(_.swap)
    val allNodes = dir.map(_._1).distinct.toDF("node")
    val ppr = Graph.personalizedPageRank(dir.toDF("src", "dst"), "src", "dst",
        allNodes, "node", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = Graph.pageRank(dir.toDF("src", "dst"), "src", "dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // base = 150000·n/n = 150000 per node — the uniform teleport
    assert(ppr == pr, s"ppr $ppr vs pr $pr")
  }

  test("k-hop neighborhood: BFS hops are shortest distances, seeds independent") {
    // path 1-2-3-4-5 plus chord 1-3 (undirected): from seed 1, node 3
    // is reachable at hop 1 (chord) AND hop 2 (via 2) — must appear
    // ONCE at hop 1; node 4 at hop 2; node 5 outside k=2.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
    val dir = und ++ und.map(_.swap)
    val got = Graph.kHopNeighborhood(dir.toDF("src", "dst"), "src", "dst",
        Seq(1L, 5L).toDF("node"), "node", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set(
      (1L, 1L, 0), (1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 2),
      (5L, 5L, 0), (5L, 4L, 1), (5L, 3L, 2)), got.toString)
  }

  test("k-hop neighborhood matches sequential BFS on random graphs") {
    val rnd = new scala.util.Random(47)
    (1 to 3).foreach { trial =>
      val n = 12 + rnd.nextInt(10)
      val und = (0 until n * 2).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val dir = (und ++ und.map(_.swap)).distinct
      val nodes = dir.map(_._1).distinct
      val seeds = nodes.take(3)
      val k = 1 + rnd.nextInt(3)
      // sequential BFS reference
      val adj = dir.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val expected = seeds.flatMap { s =>
        var dist = Map(s -> 0)
        var frontier = Set(s)
        for (h <- 1 to k) {
          val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
          dist ++= next.map(_ -> h)
          frontier = next
        }
        dist.map { case (node, hop) => (s, node, hop) }
      }.toSet
      val got = Graph.kHopNeighborhood(dir.toDF("src", "dst"), "src", "dst",
          seeds.toDF("node"), "node", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected,
        s"trial $trial (n=$n k=$k): missing ${(expected -- got).take(3)}, extra ${(got -- expected).take(3)}")
    }
  }

  /** Sequential LPA reference: identical mode/min-tie rules. */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    var lbl: Map[Long, Long] = e.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lbl = e.groupBy(_._2).map { case (dst, es) =>
        val counts = es.map { case (src, _) => lbl(src) }
          .groupBy(identity).map { case (l, xs) => l -> xs.length }
        dst -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    lbl
  }

  test("labelPropagation matches the sequential reference; barbell splits") {
    // two triangles joined by one bridge edge — LPA should keep two
    // communities (labels 1 and 4 win their triangles)
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val dir = und ++ und.map(_.swap)
    val got = Graph.labelPropagation(dir.toDF("src", "dst"), "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refLpa(dir, 5))
    assert(got.values.toSet.size == 2, s"expected 2 communities: $got")
    assert(Set(1L, 2L, 3L).map(got) != Set(4L, 5L, 6L).map(got))
  }

  test("labelPropagation is deterministic under repartitioning") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L))
    val dir = (und ++ und.map(_.swap)).toDF("src", "dst")
    val a = Graph.labelPropagation(dir, "src", "dst", 5)
      .orderBy($"node").collect().toSeq
    val b = Graph.labelPropagation(dir.repartition(5), "src", "dst", 5)
      .orderBy($"node").collect().toSeq
    assert(a == b)
  }

  test("triangleCount: K4 has 4, path has 0, random graphs match brute force") {
    val k4 = for { u <- 0L to 3L; v <- (u + 1) to 3L } yield (u, v)
    val got = Graph.triangleCount(k4.toDF("u", "v"), "u", "v").head
    assert((got.getLong(0), got.getLong(1)) == ((6L, 4L)))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(Graph.triangleCount(path.toDF("u", "v"), "u", "v").head.getLong(1) == 0L)
    val rnd = new scala.util.Random(3)
    (1 to 3).foreach { trial =>
      val n = 8L
      val es = (for { u <- 0L until n; v <- (u + 1) until n if rnd.nextBoolean() }
        yield (u, v)).toSeq
      val brute = (for { a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
        if es.contains((a, b)) && es.contains((b, c)) && es.contains((a, c)) } yield 1).size
      val g = Graph.triangleCount(es.toDF("u", "v"), "u", "v").head
      assert(g.getLong(1) == brute.toLong, s"trial $trial")
    }
  }

  test("pageRank is deterministic under repartitioning") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L))
    val dir = (und ++ und.map(_.swap)).toDF("src", "dst")
    val a = Graph.pageRank(dir, "src", "dst", 10)
      .orderBy($"node").collect().toSeq
    val b = Graph.pageRank(dir.repartition(5), "src", "dst", 10)
      .orderBy($"node").collect().toSeq
    assert(a == b)
  }
}
