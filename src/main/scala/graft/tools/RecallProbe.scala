package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{Tables}
import graft.llm.Similarity
/** Dev probe: measured ANN recall across LSH bit-widths and IVF on the
  * sf0.001 embeddings — the numbers behind LlmSpec's recall floors and
  * the ns_ann_recall config choice (4-bit LSH: the 8-bit config
  * measures 0.0 on this table and is pinned as such in the spec).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[4]")
      .appName("recall-probe").config("spark.sql.shuffle.partitions","4")).getOrCreate()
    import spark.implicits._
    val emb = Tables.load(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"), "embeddings")
    val q = emb.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "embedding", 5)
    def mean(df: org.apache.spark.sql.DataFrame): Double = {
      val rs = Similarity.recallAtK(exact, df).collect().map(_.getAs[Double]("recall"))
      rs.sum / rs.length
    }
    for (bits <- Seq(4, 6, 8)) {
      val sp = Similarity.lshTopK(q, emb, "vec_id", "embedding", 64, bits, 5)
      val mp = Similarity.lshTopKMultiProbe(q, emb, "vec_id", "embedding", 64, bits, 5)
      println(s"PROBE bits=$bits single=${mean(sp)} multi=${mean(mp)}")
    }
    println(s"PROBE ivf=${mean(Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5, 8, 2))}")
    for (kc <- Seq(64, 256)) {
      val idx = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
        nCells = 8, m = 8, kCodes = kc)
      for (nProbe <- Seq(5, 6, 8); of <- Seq(10, 20)) {
        val rr = Similarity.ivfPqTopKReranked(q, idx, emb, "vec_id", "embedding",
          k = 5, nProbe = nProbe, overFetch = of)
        println(s"PROBE ivfpq_rerank kCodes=$kc nProbe=$nProbe overFetch=$of recall=${mean(rr)}")
      }
    }
    spark.stop()
  }
}
