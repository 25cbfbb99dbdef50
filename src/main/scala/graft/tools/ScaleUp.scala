package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Materialize an FK-CONSISTENT scaled copy of a testdata directory:
  * each copy i shifts every surrogate key in its own domain by i·10^8
  * (even offset, preserving the even/odd customer-supplier node
  * encoding NorthStar's graph queries rely on), so joins, graph edges,
  * and point lookups behave exactly as at the base scale — just 10×
  * more of them. region/nation are fixed-cardinality dimensions and
  * copy through unchanged; event/document/embedding payloads replicate
  * verbatim (identical-text copies stress the dedup/LSH buckets — a
  * harder layout than fresh uniques).
  *
  * This is the sf1 evidence generator (VERDICT r5 #1): the oracle gate
  * and bench run against the output directory with no code changes.
  * Dev tool — writes under /root/repo/tmp, never into /root/testdata.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [outDir] [copies]
  */
object ScaleUp {
  private val D = 100000000L // per-copy key offset (even)

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/tmp/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // key columns per table, each shifted by the copy offset
    val shifted: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    def scale(name: String): DataFrame = {
      val base = Tables.load(spark, src, name)
      shifted.get(name) match {
        case None => base // region/nation: fixed dims
        case Some(keys) =>
          (0 until copies).map { i =>
            keys.foldLeft(base) { (df, k) =>
              df.withColumn(k, col(k) + lit(i * D))
            }
          }.reduce(_ unionByName _)
      }
    }

    (shifted.keys.toSeq ++ Seq("region", "nation")).sorted.foreach { t =>
      val df = scale(t)
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"$t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
