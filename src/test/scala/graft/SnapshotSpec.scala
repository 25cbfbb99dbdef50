package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Layout, Snapshots}

/** Snapshot-versioned tables: atomic manifest commits, time travel,
  * overwrite semantics, commit-collision retry, vacuum with the
  * checkpoint rewrite (retained append-versions must never dangle on
  * deleted manifests), and composition with the data-skipping layer. */
class SnapshotSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def tbl() =
    java.nio.file.Files.createTempDirectory("graft_snap_").toString

  private def orders = Tables.load(spark, sf0001, "orders")
    .select($"o_orderkey", $"o_custkey", $"o_totalprice")

  test("append commits accumulate; every version stays readable as-of") {
    val t = tbl()
    val a = orders.filter($"o_orderkey" % 2 === 0)
    val b = orders.filter($"o_orderkey" % 2 === 1)
    val v0 = Snapshots.commit(spark, t, a)
    val v1 = Snapshots.commit(spark, t, b)
    assert(v0 == 0L && v1 == 1L)
    // latest = union; v0 = first batch only (immutable under the append)
    val latest = Snapshots.read(spark, t)
    assert(latest.exceptAll(orders).isEmpty && orders.exceptAll(latest).isEmpty)
    val asOf0 = Snapshots.read(spark, t, Some(0L))
    assert(asOf0.exceptAll(a).isEmpty && a.exceptAll(asOf0).isEmpty)
    val h = Snapshots.history(spark, t).orderBy($"version")
      .select($"version", $"action").as[(Long, String)].collect().toSeq
    assert(h == Seq((0L, "append"), (1L, "append")))
  }

  test("overwrite resets the visible set; pre-overwrite versions intact") {
    val t = tbl()
    Snapshots.commit(spark, t, orders)
    val small = orders.limit(10)
    val v1 = Snapshots.commit(spark, t, small, overwrite = true)
    Snapshots.commit(spark, t, orders.limit(5)) // append on top
    assert(Snapshots.read(spark, t).count() == 15)
    assert(Snapshots.read(spark, t, Some(v1)).count() == 10)
    // time travel to v0 still sees the full table
    assert(Snapshots.read(spark, t, Some(0L)).count() == orders.count())
  }

  test("commit collision: the loser lands at the next free version, nothing lost") {
    val t = tbl()
    Snapshots.commit(spark, t, orders.limit(3))
    // squat the next version slot, as a racing writer would
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val squat = new org.apache.hadoop.fs.Path(t, "_graft_log/v00000000001.json")
    val out = f.create(squat, false)
    out.write(
      """{"version":1,"action":"append","ts":0,"files":[]}""".getBytes("UTF-8"))
    out.close()
    val v = Snapshots.commit(spark, t, orders.limit(4))
    assert(v == 2L, s"collision must push the commit to v2, got v$v")
    assert(Snapshots.read(spark, t).count() == 7)
  }

  test("vacuum: checkpoints the horizon, reclaims unreachable files, fails loudly past it") {
    val t = tbl()
    val a = orders.filter($"o_orderkey" % 2 === 0)
    val b = orders.filter($"o_orderkey" % 2 === 1)
    Snapshots.commit(spark, t, orders)                     // v0 (replaced below)
    Snapshots.commit(spark, t, a, overwrite = true)        // v1
    Snapshots.commit(spark, t, b)                          // v2 = a ∪ b
    val before = Layout.parquetFileCount(spark, t + "/data")
    val deleted = Snapshots.vacuum(spark, t, retainVersions = 2)
    assert(deleted > 0, "v0's replaced files must be reclaimed")
    assert(Layout.parquetFileCount(spark, t + "/data") == before - deleted)
    // the horizon (v1) was an append-fold; after the checkpoint rewrite
    // BOTH retained versions still read exactly
    val v1r = Snapshots.read(spark, t, Some(1L))
    assert(v1r.exceptAll(a).isEmpty && a.exceptAll(v1r).isEmpty)
    val v2r = Snapshots.read(spark, t, Some(2L))
    assert(v2r.exceptAll(orders).isEmpty && orders.exceptAll(v2r).isEmpty)
    // past the horizon: loud manifest failure, not silent missing data
    val e = intercept[IllegalArgumentException] {
      Snapshots.read(spark, t, Some(0L))
    }
    assert(e.getMessage.contains("vacuumed"))
    // idempotent: nothing left to reclaim
    assert(Snapshots.vacuum(spark, t, retainVersions = 2) == 0L)
  }

  test("vacuum retains appended history the horizon folds over (the dangling-manifest trap)") {
    val t = tbl()
    val a = orders.filter($"o_orderkey" < 500)
    val b = orders.filter($"o_orderkey" >= 500 && $"o_orderkey" < 1000)
    val c = orders.filter($"o_orderkey" >= 1000)
    Snapshots.commit(spark, t, a)   // v0
    Snapshots.commit(spark, t, b)   // v1 — horizon after vacuum(2)
    Snapshots.commit(spark, t, c)   // v2
    // nothing is unreachable (pure appends) — vacuum must delete NO data
    assert(Snapshots.vacuum(spark, t, retainVersions = 2) == 0L)
    // v1 references v0's files; its manifest was checkpointed, so the
    // fold works without v0's manifest
    val v1r = Snapshots.read(spark, t, Some(1L))
    val ab = a.unionAll(b)
    assert(v1r.exceptAll(ab).isEmpty && ab.exceptAll(v1r).isEmpty)
    val v2r = Snapshots.read(spark, t, Some(2L))
    assert(v2r.exceptAll(orders).isEmpty && orders.exceptAll(v2r).isEmpty)
  }

  test("readChanges: append deltas between versions; loud on an overwrite in range") {
    val t = tbl()
    val a = orders.filter($"o_orderkey" < 500)
    val b = orders.filter($"o_orderkey" >= 500 && $"o_orderkey" < 1000)
    val c = orders.filter($"o_orderkey" >= 1000)
    val v0 = Snapshots.commit(spark, t, a)
    val v1 = Snapshots.commit(spark, t, b)
    val v2 = Snapshots.commit(spark, t, c)
    val delta = Snapshots.readChanges(spark, t, v0, v2)
    val bc = b.unionAll(c)
    assert(delta.exceptAll(bc).isEmpty && bc.exceptAll(delta).isEmpty)
    // from -1 = since the beginning; empty range = empty relation
    assert(Snapshots.readChanges(spark, t, -1L, v2).count() == orders.count())
    assert(Snapshots.readChanges(spark, t, v2, v2).count() == 0)
    // an overwrite in range is a full-recompute signal, never a delta
    Snapshots.commit(spark, t, a, overwrite = true) // v3
    val e = intercept[IllegalArgumentException] {
      Snapshots.readChanges(spark, t, v1, 3L)
    }
    assert(e.getMessage.contains("OVERWRITE"))
  }

  test("incremental MV from the change feed == one-shot over the latest snapshot") {
    import graft.operators.MaterializedAgg
    val t = tbl()
    val measures = Seq(
      MaterializedAgg.countRows("n"),
      // decimal: the fold order differs from the one-shot, so a double
      // sum would drift in the last bits and fail the exact compare
      MaterializedAgg.sumOf($"o_totalprice".cast("decimal(18,2)"), "sum_price"))
    val v0 = Snapshots.commit(spark, t, orders.filter($"o_orderkey" % 3 === 0))
    var mv = MaterializedAgg.build(
      Snapshots.read(spark, t, Some(v0)), Seq("o_custkey"), measures)
    // two more ingest commits, each folded from readChanges only —
    // the stored history is never rescanned
    var last = v0
    for (m <- Seq(1, 2)) {
      val v = Snapshots.commit(spark, t, orders.filter($"o_orderkey" % 3 === m))
      val delta = MaterializedAgg.build(
        Snapshots.readChanges(spark, t, last, v), Seq("o_custkey"), measures)
      mv = MaterializedAgg.merge(mv, delta, Seq("o_custkey"), measures)
      last = v
    }
    val oneShot = MaterializedAgg.build(
      Snapshots.read(spark, t), Seq("o_custkey"), measures)
    assert(mv.exceptAll(oneShot).isEmpty && oneShot.exceptAll(mv).isEmpty)
  }

  test("commitBatch: replayed micro-batches are no-ops (exactly-once append)") {
    val t = tbl()
    val b0 = orders.limit(10)
    assert(Snapshots.commitBatch(spark, t, b0, batchId = 0L).contains(0L))
    assert(Snapshots.commitBatch(spark, t, orders.limit(25), batchId = 1L).contains(1L))
    // crash-replay of batch 1: skipped, count unchanged
    assert(Snapshots.commitBatch(spark, t, orders.limit(25), batchId = 1L).isEmpty)
    assert(Snapshots.read(spark, t).count() == 35)
    // a REAL stream through foreachBatch lands exactly-once too
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Long](spark)
    val q = mem.toDF().toDF("o_orderkey")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Snapshots.commitBatch(spark, t + "_stream", batch, id); ()
      }.start()
    try {
      mem.addData(1L to 100L: _*); q.processAllAvailable()
      mem.addData(101L to 150L: _*); q.processAllAvailable()
    } finally q.stop()
    assert(Snapshots.read(spark, t + "_stream").count() == 150)
  }

  test("schema evolution: a new nullable column surfaces table-wide via readEvolved") {
    val t = tbl()
    Snapshots.commit(spark, t, orders)                           // 3 cols
    Snapshots.commit(spark, t,
      orders.limit(10).withColumn("o_channel", lit("web")))     // +1 col
    // the plain read keeps the un-merged (first-file) schema cheaply;
    // the evolved read unions: old rows NULL, new rows populated
    val ev = Snapshots.readEvolved(spark, t)
    assert(ev.columns.contains("o_channel"))
    assert(ev.filter($"o_channel".isNull).count() == orders.count())
    assert(ev.filter($"o_channel" === "web").count() == 10)
    // time travel predates the evolution: no phantom column
    assert(!Snapshots.readEvolved(spark, t, Some(0L)).columns.contains("o_channel"))
  }

  test("compactLatest: transactional OPTIMIZE — content invariant, files bounded, history intact") {
    val t = tbl()
    // simulate a streaming ingest: 12 tiny commits = many small files
    (0 until 12).foreach { i =>
      Snapshots.commitBatch(spark, t,
        orders.filter($"o_orderkey" % 12 === i).repartition(4), batchId = i)
    }
    val before = Snapshots.filesAt(spark, t, 11L).size
    assert(before == 48, s"expected 48 small files, got $before")
    val v = Snapshots.compactLatest(spark, t, targetRowsPerFile = 1000)
    val after = Snapshots.filesAt(spark, t, v).size
    assert(after < before / 4, s"compaction must shrink the file count ($before -> $after)")
    val got = Snapshots.read(spark, t)
    assert(got.exceptAll(orders).isEmpty && orders.exceptAll(got).isEmpty)
    // the pre-compaction version still time-travels (until vacuum)
    assert(Snapshots.read(spark, t, Some(11L)).count() == orders.count())
    // and vacuum reclaims the 48 small files once the horizon passes them
    assert(Snapshots.vacuum(spark, t, retainVersions = 1) == before)
  }

  test("checkpoint: sidecar fold — reads identical, manifests untouched, change feed crosses it") {
    val t = tbl()
    val parts = (0 until 6).map(i => orders.filter($"o_orderkey" % 6 === i))
    parts.take(4).zipWithIndex.foreach { case (p, i) =>
      Snapshots.commitBatch(spark, t, p, batchId = i)
    }
    val before = Snapshots.filesAt(spark, t, 3L)
    val cv = Snapshots.checkpoint(spark, t)
    assert(cv == 3L)
    // identical resolution through the checkpoint
    assert(Snapshots.filesAt(spark, t, 3L).sorted == before.sorted)
    // commits continue on top; the fold starts from the checkpoint
    parts.drop(4).zipWithIndex.foreach { case (p, i) =>
      Snapshots.commitBatch(spark, t, p, batchId = 4 + i)
    }
    val latest = Snapshots.read(spark, t)
    assert(latest.exceptAll(orders).isEmpty && orders.exceptAll(latest).isEmpty)
    // manifests untouched: a change-feed range CROSSING the checkpoint
    // still reads exactly the appended rows (the vacuum horizon rewrite
    // could not do this — that is why checkpoints are sidecars)
    val delta = Snapshots.readChanges(spark, t, 2L, 5L)
    val want = parts.drop(3).reduce(_ unionAll _)
    assert(delta.exceptAll(want).isEmpty && want.exceptAll(delta).isEmpty)
    // pre-checkpoint time travel intact
    assert(Snapshots.read(spark, t, Some(1L)).count() ==
      parts.take(2).map(_.count()).sum)
  }

  test("checkpoint bounds the log fold: O(commits since checkpoint), not O(versions)") {
    val t = tbl()
    val tiny = orders.limit(2).repartition(1)
    (0 until 60).foreach(i => Snapshots.commitBatch(spark, t, tiny, batchId = i))
    def foldMillis(): Double = {
      Snapshots.filesAt(spark, t, 59L) // warm FS metadata
      val t0 = System.nanoTime()
      (1 to 5).foreach(_ => Snapshots.filesAt(spark, t, 59L))
      (System.nanoTime() - t0) / 5e6
    }
    val cold = foldMillis()
    Snapshots.checkpoint(spark, t)
    val ckpt = foldMillis()
    // 60 manifest reads vs 1 checkpoint read: demand a clear drop, not
    // a precise ratio (FS timing noise)
    assert(ckpt < cold / 2,
      f"checkpointed fold $ckpt%.1f ms must be well under the $cold%.1f ms full fold")
  }

  test("snapshot file lists compose with the skipping layer (zoneMapFiles)") {
    val t = tbl()
    Snapshots.commit(spark, t,
      orders.repartitionByRange(4, $"o_totalprice"))          // v0
    Snapshots.commit(spark, t,
      orders.limit(50).repartition(1), overwrite = true)      // v1
    // index ONLY v0's files: the manifest feeds the zone map directly,
    // no sweep of other versions' commit dirs
    val v0files = Snapshots.filesAt(spark, t, 0L)
    val zm = Layout.zoneMapFiles(spark, v0files, Seq("o_totalprice"))
    assert(zm.count() == v0files.size)
    val kept = Layout.pruneFiles(zm,
      Layout.rangeEnvelope("o_totalprice", lit(50000.0), lit(60000.0)))
    assert(kept.nonEmpty && kept.size < v0files.size)
    val got = Layout.prunedParquet(spark, t + "/data", kept)
      .filter($"o_totalprice".between(50000.0, 60000.0))
    val want = orders.filter($"o_totalprice".between(50000.0, 60000.0))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the bloom index pairs the same way: point lookup inside v0 only
    val bi = Layout.bloomIndexFiles(spark, v0files, "o_orderkey", 1024)
    val hit = Layout.pruneFilesByKeys(bi, Seq(42L))
    assert(hit.nonEmpty && hit.forall(v0files.contains))
    val row = Layout.prunedParquet(spark, t + "/data", hit)
      .filter($"o_orderkey" === 42L)
    assert(row.count() == orders.filter($"o_orderkey" === 42L).count())
  }
}
