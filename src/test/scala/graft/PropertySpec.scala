package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{Functions, HaversineMiles}
import graft.llm.{Dedup, MllibLsh}
import graft.stream.StreamPipeline

/** ScalaCheck properties (SURVEY §5.3): haversine metric axioms against
  * the scalar reference implementation, try_cast round-trips, dedup
  * idempotence, and MLlib-LSH vs exact-Jaccard agreement. */
class PropertySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val lat = Gen.choose(-89.0, 89.0)
  private val lon = Gen.choose(-179.0, 179.0)

  test("columnar haversine equals the scalar form; symmetric; non-negative; zero at identity") {
    val pts = Gen.listOfN(4, Gen.zip(lat, lon)).sample.get ++
      (1 to 30).flatMap(_ => Gen.listOfN(2, Gen.zip(lat, lon)).sample.toList.flatten)
    val pairs = pts.grouped(2).collect { case Seq(a, b) => (a._1, a._2, b._1, b._2) }.toSeq
    val df = pairs.toDF("a1", "o1", "a2", "o2")
      .select($"a1", $"o1", $"a2", $"o2",
        HaversineMiles.native($"a1", $"o1", $"a2", $"o2").as("fwd"),
        HaversineMiles.native($"a2", $"o2", $"a1", $"o1").as("rev"),
        HaversineMiles.native($"a1", $"o1", $"a1", $"o1").as("self"))
    df.collect().foreach { r =>
      val scalar = StreamPipeline.haversineMiles(
        r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(r.getDouble(4) - scalar) < 1e-6)
      assert(math.abs(r.getDouble(4) - r.getDouble(5)) < 1e-6) // symmetry
      assert(r.getDouble(4) >= 0.0)
      assert(r.getDouble(6) == 0.0)
    }
  }

  test("salted join equals plain join for random factors, key skews, and dup keys") {
    import graft.operators.SkewJoin
    val rnd = new scala.util.Random(23)
    (1 to 4).foreach { trial =>
      val factor = 1 + rnd.nextInt(12)
      val nKeys = 1 + rnd.nextInt(6)
      val fact = (0 until 400).map(i =>
        (rnd.nextInt(nKeys).toLong, i.toLong)).toDF("k", "payload")
      // dim with DUPLICATE keys: every fact row must still meet every
      // matching dim row exactly once under exactly one salt value
      val dim = (0 until 20).map(i =>
        ((i % nKeys).toLong, s"d$i")).toDF("k", "name")
      val salted = SkewJoin.saltedEquiJoin(fact, dim, Seq("k"), factor)
        .select($"k", $"payload", $"name")
      val plain = fact.join(dim, Seq("k")).select($"k", $"payload", $"name")
      assert(salted.exceptAll(plain).count() == 0 &&
        plain.exceptAll(salted).count() == 0,
        s"trial $trial (factor=$factor nKeys=$nKeys): salted != plain")
    }
  }

  test("tryCastAny: numeric strings round-trip, garbage maps to null") {
    val rows = Seq("12", "-7", "3.5", "-0.25", "abc", "1.2.3", "", "12a")
    val got = rows.toDF("s").select(Functions.tryCastAny($"s")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(12.0), Some(-7.0), Some(3.5), Some(-0.25),
      None, None, None, None))
  }

  test("exact dedup is idempotent: deduping the keepers changes nothing") {
    val docs = Tables.load(spark, sf0001, "documents")
    val once = Dedup.exactGroups(docs, "doc_id", md5($"text"))
    val keepers = docs.join(once.select($"keep_id".as("doc_id")), "doc_id")
    val twice = Dedup.exactGroups(keepers, "doc_id", md5($"text"))
    assert(twice.filter($"n_dups" > 1).count() == 0)
    assert(twice.count() == once.count())
  }

  test("chunk dedup invariants: exact dup pairs at ratio 1, chunk totals conserved") {
    val docs = Tables.load(spark, sf0001, "documents")
    val stats = Dedup.chunkDedupStats(docs, "doc_id", "text", 5)
    // conservation: Σ n_chunks == total chunk instances = Σ ceil(tokens/5)
    val total = stats.agg(sum($"n_chunks")).head().getLong(0)
    val expected = docs.select(
        ceil(size(split($"text", " ")).cast("double") / 5).cast("long").as("c"))
      .agg(sum($"c")).head().getLong(0)
    assert(total == expected, s"chunk totals: $total vs $expected")
    // planting an exact copy drives both copies' dup_ratio to 1.0
    // (every chunk of each appears in the other)
    val minId = docs.agg(min($"doc_id")).head().getLong(0)
    val copy = docs.filter($"doc_id" === minId)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val plantedStats = Dedup.chunkDedupStats(
      docs.select($"doc_id", $"text").union(copy), "doc_id", "text", 5)
    val ratios = plantedStats
      .filter($"doc_id" === minId || $"doc_id" === minId + 1000000L)
      .collect().map(_.getAs[Double]("dup_ratio"))
    assert(ratios.length == 2 && ratios.forall(_ == 1.0), ratios.mkString(","))
  }

  test("chunk dedup matches in-memory brute force on random corpora") {
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo")
    val rnd = new scala.util.Random(7)
    val docs = (0L until 40L).map { i =>
      val len = 3 + rnd.nextInt(12)
      (i, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val k = 3
    // brute force: chunk every doc, count distinct docs per chunk string
    val chunksOf = (t: String) => t.split(" ").grouped(k).map(_.mkString(" ")).toSeq
    val df = docs.flatMap { case (id, t) => chunksOf(t).map(c => (c, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = docs.map { case (id, t) =>
      val cs = chunksOf(t)
      id -> ((cs.size.toLong, cs.count(c => df(c) > 1).toLong))
    }.toMap
    val got = graft.llm.Dedup.chunkDedupStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("edit-distance pairs: zero distance iff identical prefixes, symmetric under id swap") {
    val docs = Tables.load(spark, sf0001, "documents")
    val pairs = Dedup.editDistancePairs(docs, "doc_id", "text",
      concat_ws("|", $"lang", ($"n_chars" / 16).cast("long")), 48, 8).collect()
    val texts = docs.select($"doc_id", substring($"text", 1, 48).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    pairs.foreach { r =>
      val (a, b, d) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(a < b, "pair ordering broken")
      assert((d == 0) == (texts(a) == texts(b)),
        s"distance $d disagrees with prefix equality for ($a,$b)")
    }
  }

  test("winnowing guarantee: any shared substring of length >= k+w-1 yields a shared hash") {
    import graft.llm.TextStats
    // random word-soup docs, each pair sharing a planted 3-word passage
    val words = Gen.listOfN(6, Gen.oneOf("alpha", "bravo", "charlie", "delta",
      "echo", "foxtrot", "golf", "hotel", "india", "juliet"))
    val passage = "shared passage content here"
    val docs = (1 to 8).map { i =>
      val filler = words.sample.get.mkString(" ")
      // even ids carry the passage, odd ids don't
      (i.toLong, if (i % 2 == 0) s"$filler $passage" else filler)
    }.toDF("doc_id", "text")
    val h = TextStats.winnowHashes(docs, "doc_id", "text").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val carriers = (1 to 8).filter(_ % 2 == 0).map(_.toLong)
    for (a <- carriers; b <- carriers if a < b)
      assert((h(a) & h(b)).nonEmpty,
        s"docs $a and $b share a ${passage.length}-char passage but no winnow hash")
  }

  test("simhash banding is exact at radius 3 on random near-dup corpora") {
    // random docs + mutated copies (one token changed) — banding must
    // find EXACTLY the brute-force hamming<=3 pairs, never a subset
    val vocab = Vector("data", "spark", "query", "engine", "shuffle",
      "join", "scan", "filter", "window", "agg", "stream", "batch")
    val base = Gen.listOfN(12, Gen.oneOf(vocab))
    val docs = (0 until 6).flatMap { i =>
      val toks = base.sample.get
      val mutated = toks.updated(5, "MUTANT")
      Seq((i * 2L, toks.mkString(" ")), (i * 2L + 1, mutated.mkString(" ")))
    }.toDF("doc_id", "text")
    val sig = Dedup.simhashWide(docs, "doc_id", "text", 32).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, sa) <- sig; (b, sb) <- sig if a < b
      hm = java.lang.Long.bitCount(sa ^ sb) if hm <= 3
    } yield (a, b, hm)).toSet
    val banded = Dedup.simhashPairs(docs, "doc_id", "text", 3, 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute, s"banded=$banded brute=$brute")
  }

  test("int8 quantization bounds: codes in [-127,127], max-abs element saturates") {
    import graft.llm.Similarity
    val vals = Gen.listOfN(16, Gen.choose(-50.0, 50.0))
    val rows = (1 to 10).map(i => (i.toLong, vals.sample.get.map(_.toFloat).toArray))
    val q = Similarity.quantizeInt8(rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getString(2).split(",").map(_.toInt))
    q.foreach { case (id, codes) =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id out of range")
      assert(codes.exists(c => math.abs(c) == 127), s"vec $id never saturates")
    }
  }

  test("MLlib MinHashLSH candidates cover the exact high-jaccard pairs") {
    val docs = Tables.load(spark, sf0001, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.8)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = MllibLsh.minhashDupPairs(docs, "doc_id", "text", maxJaccardDistance = 0.4)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val missed = exact -- approx
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("MLlib BucketedRandomProjectionLSH finds the vector itself first") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val key = emb.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray
    val nn = MllibLsh.euclideanNeighbors(emb, "vec_id", "embedding", key, k = 3)
      .collect()
    assert(nn.nonEmpty)
    assert(nn.head.getLong(0) == 0L && nn.head.getDouble(1) == 0.0)
  }

  test("bm25 matches an in-memory reference on random corpora") {
    import graft.llm.TextStats
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    (1 to 5).foreach { trial =>
      val corpus = (1L to 12L).map(id =>
        id -> Seq.fill(2 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val qTerms = Seq.fill(2)(vocab(rnd.nextInt(vocab.size))).distinct
      // in-memory reference: same idf/micro-unit rules as RankSpec's
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
      val n = corpus.length
      val dl = toks.map { case (id, tk) => id -> tk.length }.toMap
      val avgdl = dl.values.sum.toDouble / n
      val df = toks.flatMap(_._2.distinct).groupBy(identity)
        .map { case (t, xs) => t -> xs.length }
      val exp = toks.map { case (id, tk) =>
        id -> qTerms.flatMap { t =>
          val tf = tk.count(_ == t)
          // HALF_UP to match Spark round() (math.rint is half-to-even)
          if (tf == 0) None else Some(BigDecimal(
            math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * (tf * 2.2) /
              (tf + 1.2 * (0.25 + 0.75 * dl(id) / avgdl)) * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        }.sum
      }.filter(_._2 != 0L).toMap
      val got = TextStats.bm25TopK(
          Seq((0L, qTerms)).toDF("qid", "terms"),
          corpus.toDF("doc_id", "text"), "qid", "terms", "doc_id", "text", k = 50)
        .collect().map(r => r.getLong(2) -> math.rint(r.getDouble(4) * 1e6).toLong).toMap
      assert(got == exp, s"trial $trial: got $got expected $exp")
    }
  }

  test("pageRank invariants on random symmetric graphs: floor, mass bound, reference parity") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      val nNodes = 6 + rnd.nextInt(5)
      val und = (0 until nNodes).map(i =>
        (i.toLong, ((i + 1 + rnd.nextInt(nNodes - 1)) % nNodes).toLong))
        .filter(e => e._1 != e._2) ++ (1 until nNodes).map(i => (0L, i.toLong))
      val dir = (und ++ und.map(_.swap)).distinct
      val got = Graph.pageRank(dir.toDF("src", "dst"), "src", "dst", 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // same integer rules as RankSpec's reference
      val deg = dir.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
      var rank: Map[Long, Long] = deg.map { case (k, _) => k -> 1000000L }
      for (_ <- 1 to 10)
        rank = dir.groupBy(_._2).map { case (dst, es) =>
          dst -> (150000L + 85L * es.map { case (s, _) => rank(s) / deg(s) }.sum / 100L)
        }
      assert(got == rank, s"trial $trial parity")
      assert(got.values.forall(_ >= 150000L), s"trial $trial floor")
      assert(got.values.sum <= got.size * 1000000L, s"trial $trial mass")
    }
  }

  test("interpolation: known points exact, interior interpolants within neighbor bounds") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(13)
    val rows = (1L to 60L).map { i =>
      (i, i % 3, i * 7 + rnd.nextInt(5), if (rnd.nextBoolean()) "ok" else "error",
        rnd.nextDouble() * 100)
    }
    val e = rows.toDF("event_id", "user_id", "ts_sec", "event_type", "value")
      .withColumn("v", when($"event_type" =!= "error", $"value"))
    val wp = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wn = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
      .rowsBetween(0, Window.unboundedFollowing)
    val pv = last($"v", ignoreNulls = true).over(wp)
    val nv = first($"v", ignoreNulls = true).over(wn)
    val pt = last(when($"v".isNotNull, $"ts_sec"), ignoreNulls = true).over(wp)
    val nt = first(when($"v".isNotNull, $"ts_sec"), ignoreNulls = true).over(wn)
    val out = e.select($"event_id", $"v", pv.as("pv"), nv.as("nv"),
      round(when($"v".isNotNull, $"v")
        .when(pv.isNull, nv).when(nv.isNull, pv)
        .otherwise(pv + (nv - pv) * (($"ts_sec" - pt) / (nt - pt))), 6).as("vi"))
      .collect()
    out.foreach { r =>
      val vi = Option(r.get(4)).map(_.asInstanceOf[Double])
      if (!r.isNullAt(1)) {
        assert(vi.contains(math.rint(r.getDouble(1) * 1e6) / 1e6), "known point must pass through")
      } else if (!r.isNullAt(2) && !r.isNullAt(3)) {
        val (lo, hi) = (math.min(r.getDouble(2), r.getDouble(3)) - 1e-6,
          math.max(r.getDouble(2), r.getDouble(3)) + 1e-6)
        assert(vi.exists(x => x >= lo && x <= hi),
          s"interpolant $vi outside neighbor bounds [$lo,$hi]")
      }
    }
  }

  test("chunker invariants hold for random window/stride/doc-length combinations") {
    import graft.llm.Chunker
    val rnd = new scala.util.Random(31)
    (1 to 5).foreach { trial =>
      val window = 1 + rnd.nextInt(12)
      val stride = 1 + rnd.nextInt(12) // may exceed window (gap sampling)
      val docs = (0 until 40).map { i =>
        val n = 1 + rnd.nextInt(40)
        (i.toLong, (0 until n).map(j => s"t$j").mkString(" "))
      }.toDF("doc_id", "text")
      val chunks = Chunker.chunkByTokens(docs, "doc_id", "text", window, stride)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      val byDoc = chunks.groupBy(_._1)
      val nTokens = docs.collect().map(r =>
        r.getLong(0) -> r.getString(1).split(" ").length).toMap
      byDoc.foreach { case (id, cs) =>
        val n = nTokens(id)
        // chunk ids are dense from 0; starts are stride multiples
        assert(cs.map(_._2).sorted.toSeq == cs.indices.toSeq)
        cs.foreach { case (_, cid, start, len, text) =>
          assert(start == cid * stride)
          assert(len >= 1 && len <= window)
          assert(text.split(" ").length == len, s"$text len != $len")
        }
        // when stride <= window the doc is fully covered and the last
        // chunk reaches the end; never a chunk fully inside another
        if (stride <= window) {
          val covered = cs.map(c => c._3 + c._4).max
          assert(covered == n, s"doc $id covered $covered of $n")
        }
      }
      assert(byDoc.keySet == nTokens.keySet, s"trial $trial lost docs")
    }
  }

  test("applyChangelog matches a sequential in-memory fold on random logs") {
    import graft.operators.Scd
    val keyGen = Gen.choose(0L, 7L) // small key space forces collisions
    val opGen = Gen.frequency(3 -> "U", 2 -> "I", 2 -> "D")
    for (trial <- 1 to 8) {
      val snapKeys = Gen.listOfN(5, keyGen).sample.get.distinct
      val snap = snapKeys.map(k => (k, s"s$k"))
      val logLen = 1 + trial
      val entries = (1 to logLen).map { seq =>
        val k = keyGen.sample.get
        val op = opGen.sample.get
        (k, s"v${k}_$seq", op, seq / 3, seq.toLong) // duplicate ts values across seqs
      }
      // sequential reference: fold the log in (ts, seq) order over a map
      val ref = entries.sortBy(e => (e._4, e._5))
        .foldLeft(snap.toMap.map { case (k, v) => k -> v }) { (m, e) =>
          if (e._3 == "D") m - e._1 else m + (e._1 -> e._2)
        }
      val out = Scd.applyChangelog(
        snap.toDF("k", "v"),
        entries.toDF("k", "v", "op", "ts", "seq"),
        Seq("k"), seqCol = Some("seq"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == ref, s"trial $trial: log=$entries snap=$snap")
    }
  }
}
