package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Snapshots

/** Streaming-source probe (dev tooling): measures the graft-snapshot
  * MicroBatchStream against its own inner read path at a few million
  * rows — what does the DSv2 streaming shipping COST on top of the
  * batch reads it plans?
  *
  * Scenarios (numbers land in PLANS.md):
  *   1. full replication (initial snapshot + deltas) into the
  *      exactly-once commitBatch sink — end-to-end rows/s;
  *   2. per-commit pacing (maxVersionsPerTrigger=1) — the per-batch
  *      fixed overhead, measured as wall / batches;
  *   3. the same content read DIRECTLY via Snapshots.read +
  *      readChanges (no streaming machinery) — the floor;
  *   4. CDC stream over a MOR-deleted table — retraction extraction
  *      through the DV bitmap path inside a stream.
  */
object StreamSourceProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]").appName("stream-source-probe")
      .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val commits = sys.env.getOrElse("SPARK_GRAFT_PROBE_COMMITS", "8").toInt
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity", $"l_extendedprice")
    val total = li.count()
    println(s"source rows: $total across $commits commits")

    def sec(t0: Long) = (System.nanoTime() - t0) / 1e9

    // ---- build src: `commits` appends
    val root = java.nio.file.Files.createTempDirectory("graft_ssp_").toString
    val src = s"$root/src"
    var t0 = System.nanoTime()
    (0 until commits).foreach { i =>
      Snapshots.commit(spark, src, li.where($"l_orderkey" % commits === i))
    }
    println(f"build: $commits commits in ${sec(t0)}%.1f s")

    // ---- 3a. floor: direct full read (what the initial batch plans)
    t0 = System.nanoTime()
    val directRows = Snapshots.read(spark, src).count()
    val directSec = sec(t0)
    println(f"direct read: $directRows rows in $directSec%.2f s")

    // ---- 1. replicate through the stream, one shot (allAvailable)
    def replicate(dst: String, ckpt: String, maxPer: Option[Int]): (Long, Int) = {
      var batches = 0
      var q = spark.readStream.format("graft-snapshot")
      maxPer.foreach(n => q = q.option("maxVersionsPerTrigger", n.toString))
      val s0 = System.nanoTime()
      val qq = q.option("startingVersion", "0").load(src)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, id: Long) =>
          batches += 1
          Snapshots.commitBatch(spark, dst, df, id): Unit
        }.start()
      qq.awaitTermination()
      (System.nanoTime() - s0, batches)
    }

    val (oneShotNs, b1) = replicate(s"$root/dst1", s"$root/ck1", None)
    val oneShot = oneShotNs / 1e9
    val dstRows = Snapshots.read(spark, s"$root/dst1").count()
    require(dstRows == total, s"replication lost rows: $dstRows vs $total")
    println(f"stream replicate (single batch): $oneShot%.2f s " +
      f"($b1 batches, ${total / oneShot}%.0f rows/s; direct-read floor $directSec%.2f s)")

    // ---- 2. per-commit pacing
    val (pacedNs, b2) = replicate(s"$root/dst2", s"$root/ck2", Some(1))
    val paced = pacedNs / 1e9
    require(Snapshots.read(spark, s"$root/dst2").count() == total)
    println(f"stream replicate (1 commit/batch): $paced%.2f s / $b2 batches = " +
      f"${paced / b2}%.2f s per micro-batch (source-side plan+ship+sink-commit)")

    // ---- 3b. delta floor: direct readChanges of each commit
    t0 = System.nanoTime()
    (0 until commits).foreach { v =>
      Snapshots.readChanges(spark, src, v - 1L, v.toLong).count()
    }
    println(f"direct per-commit readChanges: ${sec(t0)}%.2f s / $commits")

    // ---- 4. CDC stream over MOR DML
    val dead = Snapshots.read(spark, src)
      .where($"l_quantity" < lit(3.0)).count()
    Snapshots.deleteWhereMor(spark, src, $"l_quantity" < lit(3.0))
    var insSeen = 0L; var delSeen = 0L
    t0 = System.nanoTime()
    val qc = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingVersion", (commits - 1).toString).load(src)
      .writeStream.option("checkpointLocation", s"$root/ck3")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        val m = df.groupBy($"_change_type").count()
          .as[(String, Long)].collect().toMap
        insSeen += m.getOrElse("insert", 0L); delSeen += m.getOrElse("delete", 0L)
      }.start()
    qc.awaitTermination()
    println(f"CDC stream (last commit + MOR delete): ${sec(t0)}%.2f s — " +
      s"$insSeen inserts, $delSeen deletes (expected $dead deletes)")
    require(delSeen == dead)
    println("OK")
  }
}
