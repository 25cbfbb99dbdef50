package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables

/** Local stage-profiling scratch main (not part of the driver
  * contract): times the dedup pipeline stages at the SF dir in
  * SPARK_GRAFT_SF_DIR. Numbers land in PLANS.md. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SCALE_X=10 unions the documents table N× with offset
    // ids — a cheap 10×-scale probe for nonlinear blowups in the dedup
    // family (duplicate groups grow N×, so pair outputs grow too).
    val scaleX = sys.env.getOrElse("SPARK_GRAFT_SCALE_X", "1").toInt
    val base = Tables.load(spark, dir, "documents")
    val docs = (if (scaleX == 1) base
      else (0 until scaleX).map(i =>
        base.select((org.apache.spark.sql.functions.col("doc_id") +
          org.apache.spark.sql.functions.lit(i * 1000000L)).as("doc_id"),
          org.apache.spark.sql.functions.col("text")))
        .reduce(_ union _)).cache()
    println(s"docs: ${docs.count()} (scaleX=$scaleX)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    import graft.llm.{Dedup, TextStats}
    time("shingleRowsRaw")(Dedup.shingleRowsRaw(docs, "doc_id", "text").count())
    time("minhash pairs (warm)")(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text", 8, 6).count())
    time("minhash pairs")(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text", 8, 6).count())
    time("connectedGroups")(
      Dedup.connectedGroups(
        Dedup.minhashCandidatePairs(docs, "doc_id", "text", 8, 6)).count())
    time("simhashPairs")(Dedup.simhashPairs(docs, "doc_id", "text").count())
    time("winnowFingerprint")(
      TextStats.winnowFingerprint(docs, "doc_id", "text").count())
    time("dedupCorpus")(
      Dedup.dedupCorpus(docs, "doc_id", "text", 8, 6).count())
    time("bloomDecontaminate")(
      Dedup.bloomDecontaminate(docs,
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 37 === 0),
        "doc_id", "text", 6).count())
    time("heavyHitters")(TextStats.heavyHitters(docs, "text", 20).count())
    time("packGreedy")(graft.llm.Shards.packGreedy(
      docs.select(org.apache.spark.sql.functions.col("doc_id"),
        TextStats.tokenCount(org.apache.spark.sql.functions.col("text"))
          .cast("long").as("n_tokens")),
      "doc_id", "n_tokens", 4096).count())
    locally {
      import org.apache.spark.sql.functions._
      // Scaled copies keep the ORIGINAL lang/n_chars? The probe union
      // carries only (doc_id, text) — rebuild the blocking columns from
      // the text so editDistancePairs sees realistic blocks.
      val withBlk = docs.withColumn("n_chars", length(col("text")))
        .withColumn("lang", lit("xx"))
      time("chunkDedupStats")(
        Dedup.chunkDedupStats(docs, "doc_id", "text", 5).count())
      time("chunkDedupStrip")(
        Dedup.chunkDedupStrip(docs, "doc_id", "text", 5).count())
      time("editDistancePairs(cap500)")(
        Dedup.editDistancePairs(withBlk, "doc_id", "text",
          concat_ws("|", col("lang"), (col("n_chars") / 16).cast("long")),
          48, 8, maxBlock = 500).count())
      time("incrementalNearDups")(
        Dedup.incrementalNearDups(
          docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", 8, 6).count())
      time("unigramLogProb")(
        TextStats.unigramLogProb(docs, "doc_id", "text").count())
      time("gopherFilter")(
        TextStats.gopherFilter(docs, "doc_id", "text").count())
    }
    locally {
      import org.apache.spark.sql.functions._
      import graft.llm.{CorpusPrep, Similarity}
      val withSrc = docs.withColumn("source",
        concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")))
      // Bench draws from the ORIGINAL id range only — at scaleX>1 every
      // text has offset copies, so a bench over the union contaminates
      // the whole corpus and the probe measures an empty pipeline.
      time("corpusPrep")(
        CorpusPrep.prepare(withSrc,
          docs.filter(col("doc_id") < 1000000L && col("doc_id") % 37 === 0),
          "doc_id", "text", "source",
          Map("src0" -> 0.25, "src1" -> 0.75), 0.5, 6, 16).count())
      // Synthetic embedding table for the linear embedding ops:
      // scaleX × 20k hash-random 64-dim vectors (deterministic).
      val emb = spark.range(20000L * scaleX).select(col("id").as("vec_id"),
        pmod(col("id"), lit(10)).cast("int").as("label"),
        transform(sequence(lit(1), lit(64)),
          i => pmod(hash(col("id"), i), lit(1000)) / 1000.0).as("embedding"))
        .cache()
      println(s"embeddings: ${emb.count()} (64-dim)")
      time("groupCentroids")(
        Similarity.groupCentroids(emb, "label", "embedding").count())
      time("clusterAssign")(Similarity.assignToCentroids(emb, "vec_id", "embedding",
        Similarity.groupCentroids(emb, "label", "embedding")).count())
      time("groupDiversity")(
        Similarity.groupDiversity(emb, "label", "embedding").count())
      time("standardize")(
        Similarity.standardizeEmbeddings(emb, "vec_id", "embedding").count())
      time("signRandomProjection")(
        Similarity.signRandomProjection(emb, "vec_id", "embedding", 64, 16).count())
      time("knnClassify(25q)")(Similarity.knnClassify(
        emb.filter(col("vec_id") < 25), emb, "vec_id", "embedding", "label", 5).count())
      emb.unpersist()
    }
    locally {
      import org.apache.spark.sql.functions._
      import graft.llm.Chunker
      import graft.operators.Sketches
      time("chunkByTokens(32/24)")(
        Chunker.chunkByTokens(docs, "doc_id", "text", 32, 24).count())
      // Probes drawn from the original id range (see corpusPrep note)
      time("crossCorpusNearDups")(
        Dedup.crossCorpusNearDups(docs,
          docs.filter(col("doc_id") < 1000000L && col("doc_id") % 7 === 0),
          "doc_id", "text", 8, 6).count())
      val ev = Tables.load(spark, dir, "events")
      val evx = (if (scaleX == 1) ev
        else (0 until scaleX).map(i => ev.select(
          (col("event_id") + lit(i * 100000000L)).as("event_id"), col("ts"),
          (col("user_id") + lit(i * 1000000L)).as("user_id"),
          col("event_type"), col("value"), col("props")))
          .reduce(_ union _)).cache()
      println(s"events: ${evx.count()} (scaleX=$scaleX)")
      val evd = evx.withColumn("day",
        to_date(timestamp_seconds(graft.Tables.tsSec(col("ts")))))
      time("hllSliceTable")(Sketches.distinctSketchTable(
        evd, Seq("event_type", "day"), "user_id").count())
      time("hllSliceAndRollup")(Sketches.rollupDistinct(
        Sketches.distinctSketchTable(evd, Seq("event_type", "day"), "user_id"),
        Seq("event_type")).count())
      time("cmsBuild") { Sketches.cmsBuild(evx, "user_id"); 1L }
      evx.unpersist()
    }
    spark.stop()
  }
}
