package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.TextStats

/** Scaling probe for the PLANS.md claim that BM25's superlinear bench
  * growth is the BENCH's query-set-scales-with-corpus construction, not
  * the plan: hold the query set FIXED (every 97th sf0.01 doc, the
  * production corpus-grows/queries-fixed deployment) and time the same
  * `bm25TopK` against the sf0.01 / sf0.1 / sf1 corpora. Linear-in-corpus
  * timings here + the bench's ~20× at 10× queries×corpus together pin
  * the quadratic to the workload definition. Numbers land in PLANS.md.
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // FIXED queries: the bench's own sf0.1 query set (every 97th doc),
    // reused at every scale — so probe-sf1 vs bench-sf1 differ ONLY in
    // query count (52 fixed here vs ~520 scaling there), isolating the
    // query-set-scales-with-corpus factor from corpus growth itself
    val qs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        array_distinct(slice(split(col("text"), " "), 1, 4)).as("terms"))
      .cache()
    println(s"fixed queries: ${qs.count()}")

    for ((label, dir) <- Seq(
        "sf0.01" -> "/root/testdata/sf0.01",
        "sf0.1" -> "/root/testdata/sf0.1",
        "sf1" -> "/root/repo/tmp/sf1")) {
      val docs = Tables.load(spark, dir, "documents")
      val nd = docs.count()
      // min of 2 timed runs after one warmup, the bench's protocol
      def once(): Double = {
        val t0 = System.nanoTime()
        TextStats.bm25TopK(qs, docs, "qid", "terms", "doc_id", "text", k = 10).count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = math.min(once(), once())
      println(f"$label%-7s docs=$nd%9d  bm25TopK(fixed-queries) = $t%7.2f s")
    }
    spark.stop()
  }
}
