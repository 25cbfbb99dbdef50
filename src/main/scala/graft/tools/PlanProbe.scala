package graft.tools
import org.apache.spark.sql.SparkSession
import graft.Tables
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    args.foreach { q =>
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.count() // materialize AQE final plan
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
