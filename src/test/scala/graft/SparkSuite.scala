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

  /** Run `body` with SQL confs set, restoring prior values after —
    * the shared session makes leaked confs a cross-suite hazard. */
  def withSQLConf[A](pairs: (String, String)*)(body: => A): A = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
