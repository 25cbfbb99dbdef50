package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (one JVM, reused via getOrCreate). */
trait SparkSuite {
  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  def sf0001 = "/root/testdata/sf0.001"
}
