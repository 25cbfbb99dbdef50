package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Local profiling scratch main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents").cache()
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    import graft.llm.Dedup

    // variant A: current explode + window-lead
    // variant B: posexplode over index sequence + element_at (no shuffle,
    //            but Generate copies the token array per output row)
    val b = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(1), size(col("tk")) - 2)).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        element_at(col("tk"), col("i")),
        element_at(col("tk"), col("i") + 1),
        element_at(col("tk"), col("i") + 2)).as("sh"))
    time("variantB warm")(b.count())
    time("variantB")(b.count())
    val toksOnly = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
    time("toks explode only")(toksOnly.count())
    // stage-by-stage: shingles, 8 md5 sigs, band join
    time("shingleRowsRaw")(Dedup.shingleRowsRaw(docs, "doc_id", "text").count())
    val n = 8
    val nMd5 = (n + 3) / 4
    val withH = Dedup.shingleRowsRaw(docs, "doc_id", "text").select(
      col("doc_id") +: (0 until nMd5).map(j =>
        md5(concat(lit(j.toString), lit("|"), col("sh"))).as(s"h$j")): _*)
    val minCols = (0 until n).map(i =>
      min(substring(col(s"h${i / 4}"), (i % 4) * 8 + 1, 8)).as(s"m$i"))
    val sigs2 = withH.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        posexplode(array((0 until n).map(i => col(s"m$i")): _*)).as(Seq("i", "mh")))
    time("sigs columnar-min")(sigs2.count())
    time("sigs columnar-min (2nd)")(sigs2.count())
    time("full minhash pairs")(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text", 8, 6).count())
    time("full minhash pairs (2nd)")(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text", 8, 6).count())
    time("connectedGroups on pairs")(
      Dedup.connectedGroups(
        Dedup.minhashCandidatePairs(docs, "doc_id", "text", 8, 6)).count())
    spark.stop()
  }
}
