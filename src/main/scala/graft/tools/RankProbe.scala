package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** 10× scale probe for the retrieval/graph/BPE family (same protocol as
  * [[Scratch]]: SPARK_GRAFT_SCALE_X unions the base tables N× with
  * offset ids). Numbers land in PLANS.md. */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scaleX = sys.env.getOrElse("SPARK_GRAFT_SCALE_X", "1").toInt
    val base = Tables.load(spark, dir, "documents")
    val docs = (if (scaleX == 1) base
      else (0 until scaleX).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
        .reduce(_ union _)).cache()
    println(s"docs: ${docs.count()} (scaleX=$scaleX)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    import graft.llm.{Bpe, TextStats}

    // BM25: index build (the once-per-corpus cost) vs query batch
    time("bm25 index (tf+dl+df)") {
      val (tf, dl, dft, _) = TextStats.bm25Index(docs, "doc_id", "text")
      tf.count() + dl.count() + dft.count()
    }
    // FIXED query set (base id range only): isolates corpus scaling —
    // querying the scaled union would also multiply the query batch
    val qs = docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 1000000L)
      .select(col("doc_id").as("qid"),
        array_distinct(slice(split(col("text"), " "), 1, 4)).as("terms"))
    time("bm25TopK end-to-end")(
      TextStats.bm25TopK(qs, docs, "qid", "terms", "doc_id", "text", 10).count())

    // BPE: word-freq aggregate + 12 merge rounds over the word table
    time("bpe wordFreqs")(Bpe.wordFreqs(docs, "text").count())
    time("bpe fitMerges(12)") {
      Bpe.fitMerges(Bpe.wordFreqs(docs, "text"), 12).length.toLong
    }

    // PageRank: customer-supplier graph, edge set scaled by replicating
    // the base graph into scaleX disconnected copies (node ids offset)
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
    val rel0 = o.join(l, "ok")
      .select((col("ck") * 2).as("a"), (col("sk") * 2 + 1).as("b")).distinct()
    val rel = (if (scaleX == 1) rel0
      else (0 until scaleX).map(i =>
        rel0.select((col("a") + lit(i * 10000000L)).as("a"),
          (col("b") + lit(i * 10000000L)).as("b")))
        .reduce(_ union _)).cache()
    println(s"undirected relations: ${rel.count()}")
    val edges = rel.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
    time("pageRank(10 iters)")(
      graft.operators.Graph.pageRank(edges, "src", "dst", 10,
        assumeDistinct = true).count())

    spark.stop()
  }
}
