package graft.tools
import org.apache.spark.sql.SparkSession
import graft.Tables
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    Tables.AllTables.foreach(n => Tables.load(spark, dir, n))
    val t0 = System.nanoTime()
    (1 to 20).foreach(_ => Tables.AllTables.foreach(n => Tables.load(spark, dir, n)))
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"200 warm Tables.load calls: $dt%.2f s (${dt / 200 * 1000}%.1f ms each)")
    spark.stop()
  }
}
