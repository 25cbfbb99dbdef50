package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.Tables

/** Dev probe (guide §1.1 "empirical"): run named inventory queries and
  * print the per-stage time/shuffle breakdown — where the wall-clock of
  * a multi-job query (iterative graph rounds, snapshot lifecycles)
  * actually goes. Warm run only (one untimed pass first). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(name: String, ms: Long, tasks: Int,
      inMb: Double, shrMb: Double, shwMb: Double)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
        val m = si.taskMetrics
        // attribute the stage to the first graft frame in its callsite
        val site = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("tools.StageProbe"))
          .map(_.trim.take(70)).getOrElse(si.name.take(60))
        stages += St(site, ms, si.numTasks,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6)
      }
    }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // listener bus drain
      println(s"===== $name  wall=${f"$wall%.2f"}s  stages=${stages.size} " +
        s"stageSum=${f"${stages.map(_.ms).sum / 1e3}%.2f"}s =====")
      stages.sortBy(-_.ms).take(25).foreach { s =>
        println(f"  ${s.ms}%6d ms  t=${s.tasks}%3d  in=${s.inMb}%8.1f MB  " +
          f"sr=${s.shrMb}%7.1f MB  sw=${s.shwMb}%7.1f MB  ${s.name}")
      }
    }
    spark.stop()
  }
}
