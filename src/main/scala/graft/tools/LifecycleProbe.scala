package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Snapshots

/** Dev probe (r10): per-phase timing of the s21 MOR lifecycle to split
  * inherent write/commit work from driver overhead. */
object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 2).foreach { run =>
      println(s"== run $run ==")
      val tmp = java.nio.file.Files.createTempDirectory("graft_lcp_").toString
      val base = Tables.load(spark, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      phase("commit base (8 files)")(Snapshots.commit(spark, tmp,
        base.repartitionByRange(8, $"o_orderkey")))
      phase("deleteWhereMor")(Snapshots.deleteWhereMor(spark, tmp, $"o_totalprice" < 50000.0))
      val src = base.filter($"o_orderkey" % 100 === 0)
        .withColumn("o_orderstatus", lit("U"))
      phase("mergeIntoMor")(Snapshots.mergeIntoMor(spark, tmp, src, Seq("o_orderkey")))
      phase("purgeDeletes")(Snapshots.purgeDeletes(spark, tmp))
      phase("deleteWhereMor 2")(Snapshots.deleteWhereMor(spark, tmp, $"o_totalprice" > 400000.0))
      phase("read+count")(Snapshots.read(spark, tmp).count())
    }
    spark.stop()
  }
}
