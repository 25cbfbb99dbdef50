package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables

/** Dev probe: time named inventory queries (warm, min of 2). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // shuffle partitions must scale with the probed SF (the 100 TB
    // sizing rule: hold rows-per-partition roughly constant) — 32 fits
    // sf0.1..sf1; sf10 needs ~256 or the 32-way hash aggregates
    // exceed the per-task memory quota
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s ${ts.min}%6.2f s")
    }
    spark.stop()
  }
}
