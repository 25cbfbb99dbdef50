package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Snapshots

/** Local probe (not part of the driver contract): the DV read's
  * price and join strategy on a worst-case MOR table — every file
  * dirty, deletion at the given fraction. Feeds the PLANS.md
  * read-amplification table and pins whether the anti-join
  * broadcasts after file-path dictionary coding. */
object MorReadProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val t = java.nio.file.Files.createTempDirectory("graft_morread_").toString
    Snapshots.commit(spark, t, li.repartitionByRange(64, $"l_orderkey"))
    val scattered = pmod(xxhash64($"l_orderkey", $"l_extendedprice"), lit(100)) === 0
    val t0 = System.nanoTime()
    val cow = Snapshots.deleteWhereMor(spark, t, scattered)
    println(f"MOR delete: ${cow.dvRows} rows to DV in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val df = Snapshots.read(spark, t)
    val plan = df.queryExecution.executedPlan.toString
    val strat = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
      .filter(plan.contains).mkString(",")
    println(s"anti-join strategy: $strat")
    def timed(label: String)(f: => Long): Unit = {
      f
      val best = (1 to 2).map { _ =>
        val s0 = System.nanoTime(); f; (System.nanoTime() - s0) / 1e9
      }.min
      println(f"  $label%-30s $best%7.3f s")
    }
    timed("read-after, MOR count(*)")(df.agg(count(lit(1))).head.getLong(0))
    // count(*) on plain parquet is footer-only — compare a REAL
    // aggregate that reads data on both paths
    val files = Snapshots.filesAt(spark, t, 0L)
    val plain = spark.read.parquet(files: _*)
    timed("plain scan sum(qty)")(
      plain.agg(sum($"l_quantity")).head.getDouble(0).toLong)
    // default path: in-scan broadcast-bitmap filter (no join operator)
    timed("MOR read sum(qty), BITMAP")(
      Snapshots.read(spark, t).agg(sum($"l_quantity")).head.getDouble(0).toLong)
    // forced fallback: the dictionary-coded broadcast anti-join (the
    // round-7 plan — kept for mass deletes past the bitmap budget)
    val savedBudget = Snapshots.dvBitmapMaxBytes
    Snapshots.dvBitmapMaxBytes = 0L
    try timed("MOR read sum(qty), ANTI-JOIN")(
      Snapshots.read(spark, t).agg(sum($"l_quantity")).head.getDouble(0).toLong)
    finally Snapshots.dvBitmapMaxBytes = savedBudget
    // component: the per-row file-id map lookup without the join
    val dvPathsProbe = spark.read.parquet(
      java.nio.file.Paths.get(t, "dv").toFile.listFiles()
        .flatMap(_.listFiles()).map(_.toString).filter(_.endsWith(".parquet")): _*)
      .select("file_path").distinct().collect().map(_.getString(0)).sorted
    val fidMap = typedLit(dvPathsProbe.zipWithIndex.toMap)
    timed("scan + fid lookup, no join")(
      plain.withColumn("__fid", element_at(fidMap, col("_metadata.file_path")))
        .agg(sum($"__fid")).head.getLong(0))
    timed("scan + row_index, no join")(
      plain.withColumn("__ri", col("_metadata.row_index"))
        .agg(sum($"__ri")).head.getLong(0))

    // change-feed extraction cost: a CLUSTERED MOR delete touches few
    // files, so the delete-content semi-join reads O(dirty files) —
    // the incremental consumer's cost is delta-shaped, not table-shaped
    val t2 = java.nio.file.Files.createTempDirectory("graft_cdf_probe_").toString
    Snapshots.commit(spark, t2, li.repartitionByRange(64, $"l_orderkey"))
    val Array(qlo, qhi) = Snapshots.read(spark, t2)
      .stat.approxQuantile("l_orderkey", Array(0.50, 0.51), 0.0005)
    val band = $"l_orderkey" >= qlo.toLong && $"l_orderkey" <= qhi.toLong
    val morB = Snapshots.deleteWhereMor(spark, t2, band)
    println(f"clustered ~1%% MOR delete: ${morB.dvRows} dv rows")
    val vNow = Snapshots.latestVersion(spark, t2).get
    timed("changeFeed(delete delta only)")(
      Snapshots.changeFeed(spark, t2, 0L, vNow)
        .filter(col("_change_type") === "delete").agg(count(lit(1))).head.getLong(0))
    spark.stop()
  }
}
