package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Snapshots

/** Local probe (not part of the driver contract): stats-in-log at a
  * many-file scale — what the footer reads cost at COMMIT time, what
  * the log fold costs at PLAN time, and what the pruning saves at READ
  * time, against the unpruned twin. Feeds the PLANS.md round-8 table. */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf10")
    val files = sys.env.getOrElse("SPARK_GRAFT_STATS_FILES", "256").toInt
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "256"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val laid = li.repartitionByRange(files, $"l_orderkey")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // 1) commit cost: footer stats vs none (the write dominates; the
    //    delta is the O(files) driver footer reads)
    val tPlain = java.nio.file.Files.createTempDirectory("graft_sp_plain_").toString
    timed(s"commit $files files, NO stats")(
      Snapshots.commit(spark, tPlain, laid))
    val tStats = java.nio.file.Files.createTempDirectory("graft_sp_stats_").toString
    Snapshots.setStatsColumns(spark, tStats, Seq("l_orderkey"))
    timed(s"commit $files files, WITH footer stats")(
      Snapshots.commit(spark, tStats, laid))

    // 2) plan cost + selectivity: the fold is driver-side JSON work
    val q = Snapshots.read(spark, tStats)
      .stat.approxQuantile("l_orderkey", Array(0.50, 0.51), 0.0005)
    val lo = q(0).toLong; val hi = q(1).toLong
    val keep = timed("statsPrunedFiles fold (~1% band)")(
      Snapshots.statsPrunedFiles(spark, tStats, "l_orderkey", lo, hi))
    println(s"  survivors: ${keep.size}/$files files")

    // 3) read cost: pruned vs full-scan twin, identical results
    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.where($"l_orderkey".between(lo, hi))
        .agg(sum($"l_quantity")).head.getDouble(0).toLong
    val full = timed("read full + filter")(agg(Snapshots.read(spark, tPlain)))
    val pruned = timed("readStatsPruned + filter")(
      agg(Snapshots.readStatsPruned(spark, tStats, "l_orderkey", lo, hi)))
    require(full == pruned, s"pruned read diverged: $full vs $pruned")

    // 4) retention-delete planning: stats fold vs zone-map scan
    val cowS = timed("deleteRange, stats-planned (zero scans)")(
      Snapshots.deleteRange(spark, tStats, "l_orderkey", lo, hi))
    val cowZ = timed("deleteRange, zone-map-planned (one scan)")(
      Snapshots.deleteRange(spark, tPlain, "l_orderkey", lo, hi))
    println(s"  footprints: stats dropped=${cowS.filesDropped} " +
      s"rewrote=${cowS.filesRewritten}; zone-map dropped=${cowZ.filesDropped} " +
      s"rewrote=${cowZ.filesRewritten}")
    require(Snapshots.read(spark, tStats).count() == Snapshots.read(spark, tPlain).count(),
      "delete results diverged")
    spark.stop()
  }
}
