package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin
import graft.llm.TextStats

/** Scale-readiness mechanics: salting preserves join/agg semantics,
  * bucketing removes the join shuffle, TF-IDF fits distributed. */
class ScaleSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.load(spark, sf0001, "orders")
    val customer = Tables.load(spark, sf0001, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select($"o_orderkey", $"c_name")
    val salted = SkewJoin.saltedEquiJoin(orders, customer,
        Seq("o_custkey"), factor = 7)
      .select($"o_orderkey", $"c_name")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salted count equals plain groupBy count") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val plain = li.groupBy($"l_suppkey").agg(count(lit(1)).as("n"))
    val salted = SkewJoin.saltedCount(li, "l_suppkey", 7, $"l_orderkey")
    val diff = plain.join(salted.withColumnRenamed("n", "n2"), "l_suppkey")
      .filter($"n" =!= $"n2").count()
    assert(diff == 0)
  }

  test("bucketed tables join without an exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graftbuckets LOCATION '$wh'")
    val li = Tables.load(spark, sf0001, "lineitem")
    val o = Tables.load(spark, sf0001, "orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graftbuckets.li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graftbuckets.o_b")
    val joined = spark.table("graftbuckets.li_b")
      .join(spark.table("graftbuckets.o_b").hint("merge"),
        $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == li.count())
  }

  test("ngram jaccard with df cap survives one shingle shared by 10k docs") {
    import graft.llm.Dedup
    // Every doc contains the hot shingle "aa bb cc"; each pair of
    // consecutive docs additionally shares a rare shingle. Uncapped,
    // the hot bucket expands to ~5*10^7 pairs inside ONE task; capped,
    // it is dropped before expansion.
    val docs = spark.range(10000).select($"id".as("doc_id"),
      concat(lit("aa bb cc rare"), ($"id" / 2).cast("long"), lit(" x y")).as("text"))
    val hot = Dedup.hotShingles(docs, "doc_id", "text", maxDf = 100).collect()
    assert(hot.map(_.getString(0)).toSet == Set("aa bb cc"), hot.mkString(","))
    val t0 = System.nanoTime()
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.5, maxShingleDf = 100)
    // consecutive (2k, 2k+1) docs share ALL their capped shingles → jaccard 1.0
    assert(pairs.count() == 5000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60, s"capped ngram jaccard took $secs s")
  }

  test("band-bucket cap bounds mass-duplicate cliques, keeps distinct near-dup pairs") {
    import graft.llm.Dedup
    // 2000 identical docs (one clique) + one genuine near-dup pair with
    // unique text — at web scale the clique's pair output is quadratic;
    // the cap must drop it while the distinct pair survives
    val clique = (1L to 2000L).map(i => (i, "the same mass duplicated text body across the corpus every time"))
    // the surviving pair: identical distinct-from-clique text (simhash
    // hamming 0 — a one-word edit flips ~10 of 32 bits on short docs,
    // so radius-3 simhash only pairs (near-)identical short texts)
    val pair = Seq(
      (9001L, "a genuinely distinct document about spark shuffle internals today"),
      (9002L, "a genuinely distinct document about spark shuffle internals today"))
    val docs = (clique ++ pair).toDF("doc_id", "text")
    val capped = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        n = 8, minMatches = 6, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((9001L, 9002L)), s"distinct near-dup pair lost: $capped")
    assert(!capped.exists(p => p._1 <= 2000L), s"mass clique leaked into pairs: ${capped.size}")
    val simCapped = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 3, nBits = 32, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simCapped.contains((9001L, 9002L)), s"distinct pair lost by simhash cap: $simCapped")
    assert(!simCapped.exists(p => p._1 <= 2000L), "mass clique leaked through simhash cap")
  }

  test("edit-distance block cap drops oversized blocks, keeps discriminating ones") {
    import graft.llm.Dedup
    import org.apache.spark.sql.functions.col
    // one degenerate block of 2000 docs + one 2-doc block with a true
    // near-dup: the cap must kill the m² candidate expansion of the big
    // block while the small block's pair survives
    val big = (1L to 2000L).map(i => (i, s"padding text number $i", "hot"))
    val pair = Seq(
      (9001L, "the quick brown fox", "cold"),
      (9002L, "the quick brown fax", "cold"))
    val docs = (big ++ pair).toDF("doc_id", "text", "blk")
    val capped = Dedup.editDistancePairs(docs, "doc_id", "text",
        col("blk"), prefixLen = 48, maxDist = 8, maxBlock = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((9001L, 9002L)), s"got $capped")
  }

  test("tf-idf produces sparse features and down-weights ubiquitous tokens") {
    val docs = Tables.load(spark, sf0001, "documents").limit(100)
    val out = TextStats.tfidf(docs, "text")
    assert(out.columns.contains("tfidf"))
    val v = out.select("tfidf").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.numNonzeros > 0)
  }
}
