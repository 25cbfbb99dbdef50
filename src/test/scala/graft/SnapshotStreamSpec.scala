package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Snapshots

/** Structured Streaming OVER snapshot tables (`readStream
  * .format("graft-snapshot")`): version offsets, initial-snapshot +
  * delta semantics, startingVersion modes, admission control, the CDC
  * stream, checkpoint restart with the exactly-once
  * [[Snapshots.commitBatch]] sink (source and sink compose into an
  * end-to-end exactly-once table-to-table replication), and loud
  * failure on a non-delta commit mid-stream. */
class SnapshotStreamSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def tbl() =
    Files.createTempDirectory("graft_snapstream_").toString

  private def orders = Tables.load(spark, sf0001, "orders")
    .select($"o_orderkey", $"o_custkey", $"o_totalprice")

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("initial snapshot reads through DVs, then deltas; checkpoint restart resumes exactly-once into commitBatch") {
    val src = tbl(); val dst = tbl()
    val ckpt = Files.createTempDirectory("graft_ss_ckpt_").toString
    Snapshots.commit(spark, src, orders.filter($"o_orderkey" % 3 === 0))
    Snapshots.commit(spark, src, orders.filter($"o_orderkey" % 3 === 1))
    // a standing DV: the initial snapshot must be the MOR-subtracted
    // current rows, not the raw files
    Snapshots.deleteWhereMor(spark, src, $"o_totalprice" < 20000.0)

    def run(): Unit = {
      val q = spark.readStream.format("graft-snapshot").load(src)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, id: Long) =>
          Snapshots.commitBatch(spark, dst, df, id): Unit
        }.start()
      q.processAllAvailable(); q.stop()
    }

    run()
    assert(sameRows(Snapshots.read(spark, dst), Snapshots.read(spark, src)),
      "first run must replicate the full current snapshot")

    // more commits land while the stream is DOWN — plus neutral
    // housekeeping, which the delta read must skip silently
    Snapshots.commit(spark, src, orders.filter($"o_orderkey" % 3 === 2))
    Snapshots.compactSmall(spark, src,
      targetRowsPerFile = 1000000L, smallFileMaxBytes = 1L << 20)
    Snapshots.commit(spark, src, orders.limit(7))

    run()
    val got = Snapshots.read(spark, dst)
    val want = Snapshots.read(spark, src)
    assert(got.count() == want.count(),
      s"exactly-once: ${got.count()} vs ${want.count()} — a replayed or " +
        "double-read batch would break the count")
    assert(sameRows(got, want))
  }

  test("startingVersion=latest emits only post-attach commits; numeric startingVersion replays from that commit") {
    val src = tbl()
    Snapshots.commit(spark, src, orders.limit(100)) // v0, pre-attach
    Snapshots.commit(spark, src, orders.limit(150)) // v1, pre-attach

    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-snapshot")
      .option("startingVersion", "latest").load(src)
      .writeStream.option("checkpointLocation",
        Files.createTempDirectory("graft_ss_ckpt_").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        seen.synchronized { seen += df.count() }: Unit
      }.start()
    q.processAllAvailable()
    assert(seen.sum == 0, s"latest must skip pre-attach history: $seen")
    Snapshots.commit(spark, src, orders.limit(30))
    q.processAllAvailable(); q.stop()
    assert(seen.sum == 30, s"only the post-attach commit: $seen")

    // numeric: replay commits >= 1 as deltas (v0 excluded)
    val fromV1 = scala.collection.mutable.ArrayBuffer[Long]()
    val q2 = spark.readStream.format("graft-snapshot")
      .option("startingVersion", "1").load(src)
      .writeStream.option("checkpointLocation",
        Files.createTempDirectory("graft_ss_ckpt_").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        fromV1.synchronized { fromV1 += df.count() }: Unit
      }.start()
    q2.processAllAvailable(); q2.stop()
    assert(fromV1.sum == 150 + 30, s"deltas of v1..latest: $fromV1")
  }

  test("maxVersionsPerTrigger bounds each micro-batch to one commit's delta") {
    val src = tbl()
    Snapshots.commit(spark, src, orders.limit(10))
    Snapshots.commit(spark, src, orders.limit(20))
    Snapshots.commit(spark, src, orders.limit(40))
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-snapshot")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1").load(src)
      .writeStream.option("checkpointLocation",
        Files.createTempDirectory("graft_ss_ckpt_").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        batches.synchronized { batches += df.count() }: Unit
      }.start()
    q.awaitTermination()
    assert(batches.filter(_ > 0).toSeq == Seq(10L, 20L, 40L),
      s"one commit per micro-batch, in log order: $batches")
  }

  test("readChangeFeed streams MOR DML as insert/delete retractions") {
    val src = tbl()
    Snapshots.commit(spark, src, orders.limit(200))
    val feed = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").load(src)
      .writeStream.option("checkpointLocation",
        Files.createTempDirectory("graft_ss_ckpt_").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.groupBy($"_change_type").count()
          .as[(String, Long)].collect().toSeq
        feed.synchronized { feed ++= rows }: Unit
      }.start()
    q.processAllAvailable()
    assert(feed.toMap.getOrElse("insert", 0L) == 200,
      s"initial snapshot streams as inserts: $feed")

    // MOR DML lands mid-stream: deletes must surface WITH row content
    val dead = Snapshots.read(spark, src)
      .where($"o_totalprice" > 100000.0).count()
    assert(dead > 0)
    Snapshots.deleteWhereMor(spark, src, $"o_totalprice" > 100000.0)
    q.processAllAvailable(); q.stop()
    assert(feed.toMap.getOrElse("delete", 0L) == dead,
      s"MOR delete must stream $dead retractions: $feed")
  }

  test("CDC stream maintains a MaterializedAgg downstream: merge inserts, retract deletes, exact vs rebuild") {
    import graft.operators.MaterializedAgg
    val src = tbl()
    Snapshots.commit(spark, src, orders.limit(400))
    val keys = Seq("o_custkey")
    val measures = Seq(
      MaterializedAgg.countRows("n"),
      MaterializedAgg.sumOf(($"o_totalprice" * 100).cast("long"), "cents"))
    // the stored aggregate, maintained purely from the CDC stream —
    // no rescan of src, ever
    var agg: DataFrame = null
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").load(src)
      .writeStream.option("checkpointLocation",
        Files.createTempDirectory("graft_ss_ckpt_").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val ins = df.where($"_change_type" === "insert").drop("_change_type")
        val del = df.where($"_change_type" === "delete").drop("_change_type")
        this.synchronized {
          if (!ins.isEmpty) {
            val d = MaterializedAgg.build(ins, keys, measures)
            agg = if (agg == null) d else MaterializedAgg.merge(agg, d, keys, measures)
          }
          if (!del.isEmpty) {
            agg = MaterializedAgg.retract(agg,
              MaterializedAgg.build(del, keys, measures), keys, measures,
              dropWhen = Some($"n" === 0))
          }
          // cut lineage so 100 batches don't stack 100 joins
          if (agg != null) agg = agg.localCheckpoint()
        }: Unit
      }.start()
    q.processAllAvailable()

    // DML lands mid-stream: a scattered MOR delete and a MOR upsert
    // (whose CDF pairing is delete(old) + insert(new) in ONE batch)
    Snapshots.deleteWhereMor(spark, src, $"o_totalprice" < 60000.0)
    q.processAllAvailable()
    Snapshots.mergeIntoMor(spark, src,
      orders.limit(400).where($"o_orderkey" % 50 === 0)
        .withColumn("o_totalprice", $"o_totalprice" + 5.0),
      Seq("o_orderkey"))
    q.processAllAvailable(); q.stop()

    val want = MaterializedAgg.build(Snapshots.read(spark, src), keys, measures)
    assert(sameRows(agg, want),
      "stream-maintained aggregate must equal a from-scratch rebuild")
  }

  test("an overwrite mid-stream fails the query loudly; streamed filters/pruning stay correct") {
    val src = tbl()
    Snapshots.commit(spark, src, orders.limit(50))
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-snapshot").load(src)
      .where($"o_totalprice" > 50000.0).select($"o_orderkey")
      .writeStream.option("checkpointLocation",
        Files.createTempDirectory("graft_ss_ckpt_").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        got.synchronized { got += df.count() }: Unit
      }.start()
    q.processAllAvailable()
    val expect = orders.limit(50).where($"o_totalprice" > 50000.0).count()
    assert(got.sum == expect, s"filtered stream: ${got.sum} vs $expect")

    Snapshots.commit(spark, src, orders.limit(5), overwrite = true)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(30000): Unit
    }
    assert(e.getMessage.contains("OVERWRITE") ||
      Option(e.getCause).exists(_.getMessage.contains("OVERWRITE")),
      s"the non-delta commit must fail the stream loudly: ${e.getMessage}")
  }

  test("batch CDF read through the provider equals changeFeed; version window honored") {
    val src = tbl()
    Snapshots.commit(spark, src, orders.limit(100)) // v0
    Snapshots.deleteWhereMor(spark, src, $"o_orderkey" % 7 === 0) // v1
    Snapshots.commit(spark, src, orders.limit(120)) // v2
    val viaFormat = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").load(src)
    assert(sameRows(viaFormat, Snapshots.changeFeed(spark, src, -1L, 2L)))
    val windowed = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "1").load(src)
    assert(sameRows(windowed, Snapshots.changeFeed(spark, src, 0L, 1L)))
    assert(windowed.where($"_change_type" === "delete").count() > 0)
  }
}
