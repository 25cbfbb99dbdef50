package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev probe (optimization r11): isolated min-of-3 timings for the
  * candidate reshapes of the round's targets — ns_tfidf / a27 (prove or
  * revert the r10 persists), and the graph family's fixed-cost cuts
  * (window-deg edge build, InSet teleport for ppr). Results →
  * OPTIMIZATION_r11.md. Usage: runMain graft.tools.R11Probe [group...]
  * with groups from {tfidf, a27, graph, ppr}. */
object R11Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "false"))
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val groups = if (args.nonEmpty) args.toSet else Set("tfidf", "a27", "graph", "ppr")

    def t(name: String) = Tables.load(spark, dir, name)
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-40s ${ts.map(_._1).min}%8.3f s  rows=${ts.head._2}")
    }

    // ---------- ns_tfidf variants ----------
    if (groups("tfidf")) {
      val docs = t("documents")
      def terms0 = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      def score(terms: DataFrame, dft: DataFrame): DataFrame = {
        val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
        val scored = terms.join(dft, "term").crossJoin(broadcast(nDocs))
          .withColumn("tfidf", round(col("tf") *
            (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1), 6))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("tfidf"))
      }
      time("tfidf r10 (persist+ckpt, current)")(
        graft.llm.TextStats.tfidfTerms(docs, "doc_id", "text", 5)
          .orderBy(col("doc_id"), col("rank")).count())
      time("tfidf r9 (dup subtree, no persist)") {
        val terms = terms0
        val dft = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
        score(terms, dft).orderBy(col("doc_id"), col("rank")).count()
      }
      time("tfidf window-df (single pass)") {
        val terms = terms0
        val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
        val scored = terms
          .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
          .crossJoin(broadcast(nDocs))
          .withColumn("tfidf", round(col("tf") *
            (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1), 6))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("tfidf"))
          .orderBy(col("doc_id"), col("rank")).count()
      }
    }

    // ---------- a27 variants ----------
    if (groups("a27")) {
      val li = t("lineitem")
        .select(col("l_returnflag").as("rf"), col("l_extendedprice").as("x"))
      def finish(med: DataFrame, mkMad: DataFrame => DataFrame): Long = {
        val dev = li.join(broadcast(med), "rf").withColumn("adev", abs(col("x") - col("med")))
        val mad = mkMad(dev)
        dev.join(broadcast(mad), "rf")
          .groupBy(col("rf"), col("med"), col("mad"))
          .agg(count(when(col("adev") > lit(3 * 1.4826) * col("mad"), 1)).as("n_outliers"))
          .select(col("rf"), round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
            col("n_outliers"))
          .orderBy(col("rf")).count()
      }
      time("a27 r10 (2x localCheckpoint, current)")(
        finish(li.groupBy(col("rf")).agg(median(col("x")).as("med")).localCheckpoint(),
          dev => dev.groupBy(col("rf")).agg(median(col("adev")).as("mad")).localCheckpoint()))
      time("a27 r9 (plain, reuse-exchange)")(
        finish(li.groupBy(col("rf")).agg(median(col("x")).as("med")),
          dev => dev.groupBy(col("rf")).agg(median(col("adev")).as("mad"))))
      time("a27 collect-local (3-row literals)") {
        def localize(df: DataFrame): DataFrame =
          spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
        finish(localize(li.groupBy(col("rf")).agg(median(col("x")).as("med"))),
          dev => localize(dev.groupBy(col("rf")).agg(median(col("adev")).as("mad"))))
      }
    }

    // ---------- graph: pageRank edge-build variants ----------
    if (groups("graph")) {
      def edges(): DataFrame = graft.queries.NorthStar.custSuppEdges(spark, dir)
      val SER = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

      def rounds(ed: DataFrame, rank0: DataFrame, iters: Int): Long = {
        var rank = rank0
        var i = 1
        while (i <= iters) {
          rank = ed.join(rank, ed("src") === rank("node"))
            .select(col("dst"), expr("rank div deg").as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("m"))
            .select(col("dst").as("node"),
              (lit(150000L) + expr("(85 * m) div 100")).as("rank"))
          if (i % 3 == 0) rank = rank.localCheckpoint()
          i += 1
        }
        val out = rank.localCheckpoint()
        out.count()
      }

      time("pr current (Graph.pageRank)")(
        graft.operators.Graph.pageRank(edges(), "src", "dst",
          iters = 10, assumeDistinct = true).count())

      time("pr window-deg build") {
        val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val e = edges().select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        val ed = e.withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
          .persist(SER)
        cached += ed
        val rank0 = ed.groupBy(col("src")).agg(first(lit(1)).as("_1"))
          .select(col("src").as("node"), lit(1000000L).as("rank"))
        val n = rounds(ed, rank0, 10)
        cached.foreach(_.unpersist(blocking = false))
        n
      }

      // symmetrized-but-undeduped edges (custSuppEdges without its
      // .distinct()): dedup fused into the src exchange below
      def rawEdges(): DataFrame = {
        val o = t("orders").select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
        val l = t("lineitem").select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        val rel = o.join(l, "ok")
          .select((col("ck") * 2).as("a"), (col("sk") * 2 + 1).as("b"))
        rel.select(explode(array(
            struct(col("a").as("src"), col("b").as("dst")),
            struct(col("b").as("src"), col("a").as("dst")))).as("e"))
          .select(col("e.src"), col("e.dst"))
      }

      time("pr fused-dedup + window-deg") {
        val e = rawEdges().select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        val ed = e.repartition(col("src"))
          .dropDuplicates("src", "dst")
          .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
          .persist(SER)
        val rank0 = ed.groupBy(col("src")).agg(first(lit(1)).as("_1"))
          .select(col("src").as("node"), lit(1000000L).as("rank"))
        val n = rounds(ed, rank0, 10)
        ed.unpersist(blocking = false)
        n
      }

      time("khop current") {
        val e = edges()
        val seeds = e.select(col("src")).distinct()
          .filter(col("src") % 200 === 0 && col("src") < 25600)
        graft.operators.Graph.kHopNeighborhood(e, "src", "dst",
          seeds, "src", k = 2, assumeDistinct = true).count()
      }
      time("khop fused-dedup prep") {
        val e = rawEdges().select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        val ed = e.repartition(col("src")).dropDuplicates("src", "dst")
          .persist(SER)
        val seeds = ed.select(col("src")).distinct()
          .filter(col("src") % 200 === 0 && col("src") < 25600)
        var visited = seeds.select(col("src").as("seed")).distinct()
          .select(col("seed"), col("seed").as("node"), lit(0).as("hop"))
          .localCheckpoint()
        var frontier = visited
        var h = 1
        while (h <= 2) {
          val next = ed.join(frontier, ed("src") === frontier("node"))
            .select(col("seed"), col("dst").as("node")).distinct()
            .join(visited.select(col("seed"), col("node")), Seq("seed", "node"), "left_anti")
            .withColumn("hop", lit(h))
            .localCheckpoint()
          visited = visited.unionByName(next)
          frontier = next
          h += 1
        }
        val n = visited.localCheckpoint().count()
        ed.unpersist(blocking = false)
        n
      }

      time("lp current") {
        graft.operators.Graph.labelPropagation(edges(), "src", "dst",
          iters = 5, assumeDistinct = true).count()
      }
      time("lp fused-dedup prep") {
        val e0 = rawEdges().select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        val e = e0.repartition(col("src")).dropDuplicates("src", "dst")
          .persist(SER)
        var labels = e.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
        var i = 1
        while (i <= 5) {
          labels = e.join(labels, e("src") === labels("node"))
            .select(col("dst"), col("lbl"))
            .repartition(col("dst"))
            .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
            .groupBy(col("dst"))
            .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl"))).as("lbl"))
            .select(col("dst").as("node"), col("lbl"))
          if (i % 2 == 0) labels = labels.localCheckpoint()
          i += 1
        }
        val n = labels.localCheckpoint().count()
        e.unpersist(blocking = false)
        n
      }

      time("pr window-deg, ckpt every 5") {
        val e = edges().select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        val ed = e.withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
          .persist(SER)
        var rank = ed.groupBy(col("src")).agg(first(lit(1)).as("_1"))
          .select(col("src").as("node"), lit(1000000L).as("rank"))
        var i = 1
        while (i <= 10) {
          rank = ed.join(rank, ed("src") === rank("node"))
            .select(col("dst"), expr("rank div deg").as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("m"))
            .select(col("dst").as("node"),
              (lit(150000L) + expr("(85 * m) div 100")).as("rank"))
          if (i % 5 == 0) rank = rank.localCheckpoint()
          i += 1
        }
        val n = rank.localCheckpoint().count()
        ed.unpersist(blocking = false)
        n
      }
    }

    // ---------- shingle: interpreted-lambda vs codegen'd+shuffle ----------
    // VERDICT item 6: the r10 shape replaced a corpus-token exchange
    // with an interpreted array lambda — prove the trade holds when the
    // data grows (no sf1 on disk: replicate the corpus 10x with shifted
    // ids, which scales the data-bound part faithfully). noop sink so
    // every column is computed (guide §1.4).
    if (groups("shingle")) {
      def noop(df: DataFrame): Long = {
        df.write.format("noop").mode("overwrite").save(); 0L
      }
      def corpus(mult: Int): DataFrame = {
        val d = t("documents")
        if (mult == 1) d
        else d.select(explode(sequence(lit(0), lit(mult - 1))).as("r"),
            col("doc_id"), col("text"))
          .select((col("doc_id") * mult + col("r")).as("doc_id"), col("text"))
      }
      Seq(1, 10).foreach { mult =>
        val docs = corpus(mult)
        time(s"shingle lambda (r10 shape) x$mult")(
          noop(graft.llm.Dedup.shingleRows(docs, "doc_id", "text")))
        time(s"shingle explode+distinct (r9) x$mult")(
          noop(graft.llm.Dedup.shingleRowsRaw(docs, "doc_id", "text").distinct()))
      }
    }

    // ---------- ppr: teleport-mass variants ----------
    if (groups("ppr")) {
      def edges(): DataFrame = graft.queries.NorthStar.custSuppEdges(spark, dir)
      time("ppr current (Graph.personalizedPageRank)") {
        val e = edges()
        val seeds = e.select(col("src")).distinct()
          .filter(col("src") % 20 === 0 && col("src") < 12800)
        graft.operators.Graph.personalizedPageRank(e, "src", "dst",
          seeds, "src", iters = 5, assumeDistinct = true,
          validateSeeds = false).count()
      }
      time("ppr InSet teleport + window-deg") {
        val SER = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
        val e = edges().select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        val ed = e.withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
          .persist(SER)
        val deg = ed.groupBy(col("src")).agg(first(lit(1)).as("_1"))
          .select(col("src").as("node"))
        val seedSet = deg.filter(col("node") % 20 === 0 && col("node") < 12800)
          .select(col("node")).distinct().localCheckpoint()
        val seedIds = seedSet.collect().map(_.getLong(0))
        val nNodes = deg.count()
        val base = (150000L * nNodes) / seedIds.length
        var rank = deg.select(col("node"), lit(1000000L).as("rank"))
        var i = 1
        while (i <= 5) {
          rank = ed.join(rank, ed("src") === rank("node"))
            .select(col("dst"), expr("rank div deg").as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("m"))
            .select(col("dst").as("node"),
              (when(col("dst").isin(seedIds.map(Long.box): _*), lit(base))
                .otherwise(lit(0L)) + expr("(85 * m) div 100")).as("rank"))
          if (i % 3 == 0) rank = rank.localCheckpoint()
          i += 1
        }
        val n = rank.localCheckpoint().count()
        ed.unpersist(blocking = false)
        n
      }
    }

    spark.stop()
  }
}
