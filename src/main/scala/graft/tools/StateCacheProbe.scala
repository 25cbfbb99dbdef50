package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Snapshots

/** Snapshot-state cache probe (dev tooling): builds a long-log table
  * (hundreds of commits, thousands of files, stats recorded) and
  * measures the DRIVER cost of repeated reads of the same version —
  * the serving pattern the (table, version)-keyed manifest/state/stats
  * caches exist for. Reported: cold fold (cache invalidated) vs warm
  * fold (cached) for `filesAt` + `statsPrunedFiles`, and the
  * post-vacuum loud-failure check. Numbers land in PLANS.md. */
object StateCacheProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[8]").appName("state-cache-probe")
      .config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val commits = sys.env.getOrElse("SPARK_GRAFT_PROBE_COMMITS", "300").toInt
    val filesPer = 4
    val t = java.nio.file.Files.createTempDirectory("graft_scp_").toString
    Snapshots.setStatsColumns(spark, t, Seq("v"))
    val t0 = System.nanoTime()
    (0 until commits).foreach { i =>
      Snapshots.commit(spark, t,
        spark.range(i * 100L, i * 100L + 100L).select($"id", ($"id" * 2).as("v"))
          .repartition(filesPer))
      if ((i + 1) % 100 == 0) println(s"  committed ${i + 1}/$commits")
    }
    println(f"build: $commits commits x $filesPer files in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val latest = Snapshots.latestVersion(spark, t).get

    // latest-version probe: pointer read + 1 existence check (O(1)) vs
    // the pre-r11 full directory listing (O(commits)) — run at several
    // log lengths to show the probe cost is flat in commit count
    {
      def msPer(n: Int)(g: => Any): Double = {
        val s = System.nanoTime(); (0 until n).foreach(_ => g)
        (System.nanoTime() - s) / 1e6 / n
      }
      val viaPtr = msPer(500)(Snapshots.latestVersion(spark, t))
      val viaList = msPer(100)(Snapshots.versions(spark, t).lastOption)
      println(f"latestVersion @ $commits commits: pointer $viaPtr%8.4f ms/call" +
        f"   listing $viaList%8.4f ms/call")
    }

    def timeMs[A](n: Int)(f: => A): Double = {
      val s = System.nanoTime(); (0 until n).foreach(_ => f)
      (System.nanoTime() - s) / 1e6 / n
    }

    def probe(label: String): Unit = {
      Snapshots.invalidateCaches(t)
      val cold = timeMs(1) {
        Snapshots.filesAt(spark, t, latest)
        Snapshots.statsPrunedFiles(spark, t, "v", 1000L, 2000L)
      }
      val warm = timeMs(200) {
        Snapshots.filesAt(spark, t, latest)
        Snapshots.statsPrunedFiles(spark, t, "v", 1000L, 2000L)
      }
      // pinned version: no latestVersion listing — the pure cached fold
      val warmPinned = timeMs(200) {
        Snapshots.filesAt(spark, t, latest)
        Snapshots.statsPrunedFiles(spark, t, "v", 1000L, 2000L, Some(latest))
      }
      println(f"$label%-28s cold fold $cold%8.1f ms   warm $warm%8.3f ms/read" +
        f"   warm+pinned $warmPinned%8.3f ms/read")
    }

    probe("no checkpoint")
    Snapshots.checkpoint(spark, t)
    probe("with checkpoint sidecar")

    // history scans (commitBatch idempotence shape) ride the manifest cache
    Snapshots.invalidateCaches(t)
    val histCold = timeMs(1)(Snapshots.history(spark, t).count())
    val histWarm = timeMs(20)(Snapshots.history(spark, t).count())
    println(f"history (all manifests)      cold $histCold%8.1f ms   warm $histWarm%8.1f ms")

    // vacuum invalidates: time travel below the horizon must fail loudly
    Snapshots.filesAt(spark, t, 0L)
    Snapshots.vacuum(spark, t, retainVersions = 1)
    val loud =
      try { Snapshots.read(spark, t, Some(0L)); "SILENT-STALE (BUG)" }
      catch { case _: IllegalArgumentException => "loud (correct)" }
    println(s"post-vacuum time travel to v0: $loud")
    spark.stop()
  }
}
