package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Snapshots

/** Merge-on-read deletion vectors on snapshot tables: DV commits
  * rewrite ZERO data files (the write-optimized DML shape for
  * scattered deletes/upserts, where copy-on-write degenerates to
  * rewriting the table), readers subtract DVs at scan time, COW DML
  * on a DV'd table never resurrects deleted rows, purge folds DVs
  * back into clean files, and DV state survives checkpoint / restore /
  * clone / vacuum. Conflict matrix: DV∥DV and DV∥append commute;
  * DV∥rewrite of a shared file fails loudly both ways. */
class DeletionVectorSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def tbl() =
    java.nio.file.Files.createTempDirectory("graft_dv_").toString

  private def orders = Tables.load(spark, sf0001, "orders")
    .select($"o_orderkey", $"o_custkey", $"o_totalprice")

  test("MOR delete: zero rewrites, rows gone, every data file shared by reference") {
    val t = tbl()
    Snapshots.commit(spark, t, orders.repartitionByRange(8, $"o_orderkey"))
    val files0 = Snapshots.filesAt(spark, t, 0L)
    val nDel = orders.filter($"o_orderkey" <= 100L).count()
    val cow = Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 100L)
    assert(cow.version.contains(1L))
    assert(cow.filesRewritten == 0, "merge-on-read must rewrite nothing")
    assert(cow.dvRows == nDel)
    // data files are untouched and fully shared with v0
    assert(Snapshots.filesAt(spark, t, 1L).sorted == files0.sorted)
    val latest = Snapshots.read(spark, t)
    val want = orders.filter($"o_orderkey" > 100L)
    assert(latest.exceptAll(want).isEmpty && want.exceptAll(latest).isEmpty)
    // time travel: v0 still sees the deleted rows
    assert(Snapshots.read(spark, t, Some(0L)).count() == orders.count())
    val h = Snapshots.history(spark, t).orderBy($"version")
      .select($"action", $"n_files", $"n_removed", $"n_dvs")
      .as[(String, Int, Int, Int)].collect().toSeq
    assert(h.head == (("append", 8, 0, 0)))
    assert(h(1)._1 == "dv" && h(1)._2 == 0 && h(1)._3 == 0 && h(1)._4 > 0)
  }

  test("MOR delete: SQL NULL semantics, and a repeated delete is a no-op") {
    val t = tbl()
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"),
      (null, "keepme"), (30L, "c")).toDF("k", "s")
    Snapshots.commit(spark, t, df)
    val cow = Snapshots.deleteWhereMor(spark, t, $"k" < 10L)
    assert(cow.dvRows == 2L)
    val left = Snapshots.read(spark, t).select($"s").as[String].collect().sorted
    assert(left.toSeq == Seq("c", "keepme"), "NULL predicate rows must survive")
    // same delete again: every matching row is already dead — no commit
    val again = Snapshots.deleteWhereMor(spark, t, $"k" < 10L)
    assert(again.version.isEmpty && again.dvRows == 0L)
    assert(Snapshots.latestVersion(spark, t).contains(1L))
  }

  test("MOR merge == COW merge result; zero rewrites; inserts appended in the same commit") {
    val cowT = tbl(); val morT = tbl()
    val base = orders.repartitionByRange(8, $"o_orderkey")
    Snapshots.commit(spark, cowT, base)
    Snapshots.commit(spark, morT, base)
    // scattered keys — the shape where COW rewrites many files
    val src = orders.filter($"o_orderkey" % 97 === 0)
      .withColumn("o_totalprice", lit(-1.0))
      .unionByName(Seq((900000001L, 1L, 42.0), (900000002L, 2L, 43.0))
        .toDF("o_orderkey", "o_custkey", "o_totalprice"))
    val cowRes = Snapshots.mergeInto(spark, cowT, src, Seq("o_orderkey"))
    val morRes = Snapshots.mergeIntoMor(spark, morT, src, Seq("o_orderkey"))
    assert(cowRes.filesRewritten > 0, "sanity: COW pays rewrites here")
    assert(morRes.filesRewritten == 0, "MOR pays none")
    assert(morRes.dvRows == orders.filter($"o_orderkey" % 97 === 0).count())
    val a = Snapshots.read(spark, cowT)
    val b = Snapshots.read(spark, morT)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "merge-on-read and copy-on-write MERGE must agree")
    // the dv manifest also carries the appended source files
    val h = Snapshots.history(spark, morT).where($"version" === 1L)
      .select($"action", $"n_files", $"n_dvs").as[(String, Int, Int)].head()
    assert(h._1 == "dv" && h._2 > 0 && h._3 > 0)
  }

  test("COW delete/update on a DV'd table never resurrects deleted rows") {
    val t = tbl()
    Snapshots.commit(spark, t, orders.repartitionByRange(8, $"o_orderkey"))
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 100L)
    // COW delete of a band overlapping the DV'd files
    Snapshots.deleteWhere(spark, t, $"o_orderkey" > 100L && $"o_orderkey" <= 200L)
    val want = orders.filter($"o_orderkey" > 200L)
    val got = Snapshots.read(spark, t)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "the COW rewrite must apply the DVs, not resurrect dead rows")
    // COW update across DV'd files: updates land, dead rows stay dead
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 300L)
    Snapshots.updateWhere(spark, t, $"o_orderkey" <= 400L,
      Map("o_custkey" -> lit(-7L)))
    val upd = Snapshots.read(spark, t)
    assert(upd.filter($"o_orderkey" <= 300L).isEmpty)
    assert(upd.filter($"o_orderkey" <= 400L && $"o_custkey" =!= -7L).isEmpty)
    assert(upd.count() == orders.filter($"o_orderkey" > 300L).count())
  }

  test("purgeDeletes: read-equal, only dirty files rewritten, repeat is a no-op, vacuum reclaims sidecars") {
    val t = tbl()
    Snapshots.commit(spark, t, orders.repartitionByRange(8, $"o_orderkey"))
    // clustered delete band → DVs land in a minority of the 8 files
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 50L)
    val dvFilesOnDisk = () => {
      val d = new java.io.File(t, "dv")
      if (!d.exists()) 0
      else d.listFiles().flatMap(_.listFiles())
        .count(f => f.getName.endsWith(".parquet"))
    }
    assert(dvFilesOnDisk() > 0)
    val before = Snapshots.read(spark, t)
    val beforeRows = before.collect().toSeq
    val purge = Snapshots.purgeDeletes(spark, t)
    assert(purge.version.contains(2L))
    assert(purge.filesRewritten > 0 && purge.filesRewritten < 8,
      s"purge must rewrite only the dirty files, rewrote ${purge.filesRewritten}/8")
    assert(Snapshots.read(spark, t).collect().toSeq.sortBy(_.getLong(0)) ==
      beforeRows.sortBy(_.getLong(0)))
    // no DVs left: purging again is a no-op
    assert(Snapshots.purgeDeletes(spark, t).version.isEmpty)
    // vacuum to the purged version reclaims the sidecar files
    Snapshots.vacuum(spark, t, retainVersions = 1)
    assert(dvFilesOnDisk() == 0, "vacuum must sweep unreachable DV sidecars")
  }

  test("dvStats: live MOR debt, stale DV rows excluded, zero after purge") {
    val t = tbl()
    Snapshots.commit(spark, t, orders.repartitionByRange(8, $"o_orderkey"))
    assert(Snapshots.dvStats(spark, t) == Snapshots.DvStats(0, 0L, 0))
    val n = orders.filter($"o_orderkey" <= 100L).count()
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 100L)
    val s1 = Snapshots.dvStats(spark, t)
    assert(s1.dvRows == n && s1.dirtyFiles >= 1 && s1.dvFiles >= 1)
    // a COW delete rewrites the dirty file → those DV rows go stale
    Snapshots.deleteWhere(spark, t, $"o_orderkey" <= 150L)
    val s2 = Snapshots.dvStats(spark, t)
    assert(s2.dirtyFiles == 0 && s2.dvRows == 0L,
      s"stale DV rows must not count as debt, got $s2")
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 200L)
    assert(Snapshots.dvStats(spark, t).dvRows ==
      orders.filter($"o_orderkey" > 150L && $"o_orderkey" <= 200L).count())
    Snapshots.purgeDeletes(spark, t)
    assert(Snapshots.dvStats(spark, t) == Snapshots.DvStats(0, 0L, 0))
  }

  test("checkpoint, restore, and shallow clone carry the DV state") {
    val t = tbl()
    Snapshots.commit(spark, t, orders.repartitionByRange(4, $"o_orderkey"))
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 100L)        // v1
    val want = orders.filter($"o_orderkey" > 100L)
    // checkpoint at the DV'd version; later reads fold from it
    Snapshots.checkpoint(spark, t)
    Snapshots.commit(spark, t, orders.limit(0))                      // v2
    val got = Snapshots.read(spark, t)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "a checkpoint must persist the DV set, not silently drop it")
    // clone shares data AND deletion vectors
    val c = tbl()
    Snapshots.cloneShallow(spark, t, c, Some(1L))
    val cr = Snapshots.read(spark, c)
    assert(cr.exceptAll(want).isEmpty && want.exceptAll(cr).isEmpty)
    // purge away the DVs, then zero-copy restore back to the DV'd state
    Snapshots.purgeDeletes(spark, t)                                 // v3
    val v4 = Snapshots.restore(spark, t, 1L)
    val rr = Snapshots.read(spark, t, Some(v4))
    assert(rr.exceptAll(want).isEmpty && want.exceptAll(rr).isEmpty,
      "restore must reference the old version's DVs")
  }

  test("conflicts: DV vs rewrite fails loudly both ways; DV vs DV and DV vs append commute") {
    val t = tbl()
    Snapshots.commit(spark, t, orders.repartitionByRange(8, $"o_orderkey"))
    // 1) a COW rewrite racing ahead of our MOR delete on the same file
    Snapshots.raceHook = () => {
      Snapshots.raceHook = () => ()
      Snapshots.deleteWhere(spark, t, $"o_orderkey" <= 100L)
    }
    try {
      intercept[java.util.ConcurrentModificationException] {
        Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 50L)
      }
    } finally Snapshots.raceHook = () => ()
    assert(Snapshots.read(spark, t).count() ==
      orders.filter($"o_orderkey" > 100L).count())
    // 2) an MOR delete racing ahead of a COW rewrite of the same file
    Snapshots.raceHook = () => {
      Snapshots.raceHook = () => ()
      Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 150L)
    }
    try {
      intercept[java.util.ConcurrentModificationException] {
        Snapshots.deleteWhere(spark, t, $"o_orderkey" <= 200L)
      }
    } finally Snapshots.raceHook = () => ()
    // the racer's MOR delete is live; the loser's rerun lands on top
    assert(Snapshots.read(spark, t).count() ==
      orders.filter($"o_orderkey" > 150L).count())
    val retry = Snapshots.deleteWhere(spark, t, $"o_orderkey" <= 200L)
    assert(retry.version.nonEmpty)
    // 3) racing MOR deletes commute (deletes are a union)
    Snapshots.raceHook = () => {
      Snapshots.raceHook = () => ()
      Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 300L)
    }
    try {
      val c = Snapshots.deleteWhereMor(spark, t,
        $"o_orderkey" > 300L && $"o_orderkey" <= 400L)
      assert(c.version.nonEmpty, "concurrent MOR deletes must both land")
    } finally Snapshots.raceHook = () => ()
    assert(Snapshots.read(spark, t).count() ==
      orders.filter($"o_orderkey" > 400L).count())
    // 4) an append racing an MOR delete commutes too
    Snapshots.raceHook = () => {
      Snapshots.raceHook = () => ()
      Snapshots.commit(spark, t, orders.filter($"o_orderkey" > 400L).limit(5))
    }
    try {
      val c = Snapshots.deleteWhereMor(spark, t,
        $"o_orderkey" > 400L && $"o_orderkey" <= 500L)
      assert(c.version.nonEmpty)
    } finally Snapshots.raceHook = () => ()
    assert(Snapshots.read(spark, t).count() ==
      orders.filter($"o_orderkey" > 500L).count() + 5)
  }

  test("mergeBatchMor: a replayed micro-batch is a no-op; readChanges refuses dv ranges") {
    val t = tbl()
    Snapshots.commit(spark, t, orders.repartitionByRange(4, $"o_orderkey"))
    val src = orders.limit(20).withColumn("o_totalprice", lit(0.0))
    assert(Snapshots.mergeBatchMor(spark, t, src, Seq("o_orderkey"), 7L).nonEmpty)
    val v = Snapshots.latestVersion(spark, t).get
    val n = Snapshots.read(spark, t).count()
    // crash-replay of the same batch
    assert(Snapshots.mergeBatchMor(spark, t, src, Seq("o_orderkey"), 7L).isEmpty)
    assert(Snapshots.latestVersion(spark, t).contains(v))
    assert(Snapshots.read(spark, t).count() == n)
    // a dv commit in range is not an append-only delta
    val e = intercept[IllegalArgumentException] {
      Snapshots.readChanges(spark, t, 0L, v)
    }
    assert(e.getMessage.contains("DV"))
  }

  test("plan shape: DVs filter IN-SCAN (bitmap, no join); anti-join only past the budget") {
    val t = tbl()
    Snapshots.commit(spark, t, orders.repartitionByRange(8, $"o_orderkey"))
    // clustered band → DVs touch 1 of 8 files
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 50L)
    val df = Snapshots.read(spark, t)
    val plan = df.queryExecution.executedPlan.toString
    // within the bitmap budget there is NO join operator anywhere: the
    // dirty-file scan filters itself through the broadcast bitmap probe
    // (Delta's in-reader DV bitmap at the Spark API level)
    assert(!plan.contains("LeftAnti"), plan)
    assert(plan.contains("dv_bitmap_deleted"), plan)
    val scanFiles = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.length
    }
    // one dirty-file scan (1) + one clean scan (7) — the DV sidecar is
    // consumed at bitmap-build time, not in the read plan
    assert(scanFiles.sorted.toSeq == Seq(1, 7),
      s"expected scans over 1 dirty + 7 clean files, got $scanFiles")
    // past the budget (forced to 0) the read falls back to the
    // dictionary-coded broadcast anti-join — deletion-COUNT-sized,
    // the right plan for a mass delete — with IDENTICAL results
    val saved = Snapshots.dvBitmapMaxBytes
    Snapshots.dvBitmapMaxBytes = 0L
    try {
      val fb = Snapshots.read(spark, t)
      val fplan = fb.queryExecution.executedPlan.toString
      assert(fplan.contains("BroadcastHashJoin") && fplan.contains("LeftAnti"), fplan)
      assert("LeftAnti".r.findAllIn(fplan).size == 1, fplan)
      val fbScans = fb.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles.length
      }
      assert(fbScans.sorted.toSeq == Seq(1, 1, 7),
        s"expected 1 dirty + 7 clean + 1 DV sidecar, got $fbScans")
      assert(fb.exceptAll(df).isEmpty && df.exceptAll(fb).isEmpty,
        "bitmap and anti-join paths must be result-identical")
    } finally Snapshots.dvBitmapMaxBytes = saved
  }

  test("changeFeed: inserts + full-content deletes; housekeeping neutral; COW refused") {
    val t = tbl()
    val init = orders.filter($"o_orderkey" <= 800L)
    Snapshots.commit(spark, t, init.repartitionByRange(4, $"o_orderkey")) // v0
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 100L)             // v1
    val src = orders.filter($"o_orderkey" > 50L && $"o_orderkey" <= 150L)
      .withColumn("o_totalprice", lit(-5.0))                              // upsert
    Snapshots.mergeIntoMor(spark, t, src, Seq("o_orderkey"))              // v2
    Snapshots.purgeDeletes(spark, t)                                      // v3 neutral
    val vNow = Snapshots.latestVersion(spark, t).get
    val feed = Snapshots.changeFeed(spark, t, -1L, vNow)
    // the feed's net effect IS the table (bag semantics: the upsert's
    // matched rows appear as delete(old) + insert(new))
    val ins = feed.filter($"_change_type" === "insert").drop("_change_type")
    val del = feed.filter($"_change_type" === "delete").drop("_change_type")
    val net = ins.exceptAll(del)
    val now = Snapshots.read(spark, t)
    assert(net.exceptAll(now).isEmpty && now.exceptAll(net).isEmpty)
    // deletes carry FULL row content (the v1 delete band, pre-upsert prices)
    assert(del.filter($"o_orderkey" <= 50L).count() ==
      init.filter($"o_orderkey" <= 50L).count())
    // a copy-on-write replace has no recorded diff — loud
    Snapshots.deleteWhere(spark, t, $"o_orderkey" > 700L)
    val v4 = Snapshots.latestVersion(spark, t).get
    val e = intercept[IllegalArgumentException] {
      Snapshots.changeFeed(spark, t, vNow, v4)
    }
    assert(e.getMessage.contains("REPLACE"))
  }

  test("O(delta) MV maintenance over a MOR table: changeFeed folds == one-shot rebuild") {
    import graft.operators.MaterializedAgg
    import graft.operators.MaterializedAgg.{countRows, sumOf}
    val t = tbl()
    val keys = Seq("o_custkey")
    val measures = Seq(countRows("n"), sumOf($"o_orderkey", "s"))
    Snapshots.commit(spark, t,
      orders.filter($"o_orderkey" <= 800L).repartitionByRange(4, $"o_orderkey"))
    var mv = MaterializedAgg.build(Snapshots.read(spark, t), keys, measures)
      .cache()
    var lastV = Snapshots.latestVersion(spark, t).get
    def advance(): Unit = {
      val now = Snapshots.latestVersion(spark, t).get
      val feed = Snapshots.changeFeed(spark, t, lastV, now).cache()
      val ins = feed.filter($"_change_type" === "insert").drop("_change_type")
      val del = feed.filter($"_change_type" === "delete").drop("_change_type")
      // merge BEFORE retract: a key inserted and deleted inside one
      // range must exist in the MV before its retraction validates
      if (!ins.isEmpty)
        mv = MaterializedAgg.merge(mv,
          MaterializedAgg.build(ins, keys, measures), keys, measures)
      if (!del.isEmpty)
        mv = MaterializedAgg.retract(mv,
          MaterializedAgg.build(del, keys, measures), keys, measures,
          dropWhen = Some($"n" === 0))
      mv = mv.cache(); mv.count()
      lastV = now
    }
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" % 3 === 0); advance()
    val src = orders.filter($"o_orderkey" > 800L && $"o_orderkey" <= 900L)
    Snapshots.mergeIntoMor(spark, t, src, Seq("o_orderkey")); advance()
    Snapshots.purgeDeletes(spark, t)
    Snapshots.commit(spark, t,
      orders.filter($"o_orderkey" > 900L && $"o_orderkey" <= 1000L)); advance()
    Snapshots.deleteWhereMor(spark, t, $"o_custkey" % 7 === 1); advance()
    val oneShot = MaterializedAgg.build(Snapshots.read(spark, t), keys, measures)
    assert(mv.exceptAll(oneShot).isEmpty && oneShot.exceptAll(mv).isEmpty,
      "incrementally-maintained MV must equal the one-shot rebuild")
  }

  test("streaming CDF: insert + delete-position streams deliver exactly-once; net == table") {
    val t = tbl()
    Snapshots.commitBatch(spark, t,
      orders.filter($"o_orderkey" <= 400L), batchId = 0L)
    type R = (Long, Long, Double)
    val ins = collection.mutable.Buffer.empty[R]
    val dels = collection.mutable.Buffer.empty[R]
    def rows(b: org.apache.spark.sql.DataFrame): Seq[R] =
      b.select($"o_orderkey", $"o_custkey", $"o_totalprice").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val qi = Snapshots.streamChanges(spark, t, orders.schema)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = rows(b); ins.synchronized { ins ++= r }; ()
      }.start()
    val qd = Snapshots.streamDeletePositions(spark, t)
      .writeStream.outputMode("append")
      .foreachBatch { (p: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = rows(Snapshots.resolveDeletedRows(spark, t, p))
        dels.synchronized { dels ++= r }; ()
      }.start()
    try {
      qi.processAllAvailable(); qd.processAllAvailable()
      assert(ins.size == orders.filter($"o_orderkey" <= 400L).count())
      assert(dels.isEmpty)
      // a MOR upsert streams delete(old) + insert(new) for matched keys
      val src = orders.filter($"o_orderkey" > 300L && $"o_orderkey" <= 500L)
        .withColumn("o_totalprice", lit(-9.0))
      Snapshots.mergeBatchMor(spark, t, src, Seq("o_orderkey"), batchId = 1L)
      qi.processAllAvailable(); qd.processAllAvailable()
      val matched = orders
        .filter($"o_orderkey" > 300L && $"o_orderkey" <= 400L).count()
      assert(dels.size == matched, s"matched old rows must stream as deletes")
      assert(dels.forall(_._3 != -9.0), "deletes carry the OLD row content")
      // a MOR delete streams its band
      Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 50L)
      qi.processAllAvailable(); qd.processAllAvailable()
      // replaying with no new commits delivers nothing new
      val (i0, d0) = (ins.size, dels.size)
      qi.processAllAvailable(); qd.processAllAvailable()
      assert(ins.size == i0 && dels.size == d0)
      // net effect of the two streams == the table (bag semantics)
      def bag(xs: Seq[R]) = xs.groupBy(identity).view.mapValues(_.size).toMap
      val net = bag(ins.toSeq).map { case (k, n) =>
        k -> (n - bag(dels.toSeq).getOrElse(k, 0)) }.filter(_._2 > 0)
      val want = bag(rows(Snapshots.read(spark, t)))
      assert(net == want, "stream-net must equal the table")
    } finally { qi.stop(); qd.stop() }
  }

  test("merge discovery composes with the bloom index: O(candidate files), equal results") {
    import graft.operators.Layout
    val morT = tbl(); val cowT = tbl(); val plainT = tbl()
    val base = orders.repartitionByRange(8, $"o_orderkey")
    Seq(morT, cowT, plainT).foreach(Snapshots.commit(spark, _, base))
    // a maintained per-file bloom index over the merge key narrows the
    // per-batch discovery scan from every file to the key's files —
    // the index is PER-TABLE state (its file paths are that table's)
    def candFor(t: String): Seq[String] = {
      val files = Snapshots.filesAt(spark, t, 0L)
      val bi = Layout.bloomIndexFiles(spark, files, "o_orderkey", 2048)
      val cand = Layout.pruneFilesByKeys(bi, Seq(42L, 77L))
      assert(cand.size < files.size, "bloom must narrow the candidate set")
      cand
    }
    val src = orders.filter($"o_orderkey" === 42L || $"o_orderkey" === 77L)
      .withColumn("o_totalprice", lit(-3.0))
    val nMatched = src.count()
    val mor = Snapshots.mergeIntoMor(spark, morT, src, Seq("o_orderkey"),
      candidates = Some(candFor(morT)))
    assert(mor.dvRows == nMatched && mor.filesRewritten == 0)
    val cowCand = candFor(cowT)
    val cow = Snapshots.mergeInto(spark, cowT, src, Seq("o_orderkey"),
      candidates = Some(cowCand))
    assert(cow.filesRewritten <= cowCand.size)
    val plain = Snapshots.mergeInto(spark, plainT, src, Seq("o_orderkey"))
    assert(plain.version.nonEmpty)
    val a = Snapshots.read(spark, morT); val b = Snapshots.read(spark, cowT)
    val c = Snapshots.read(spark, plainT)
    assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty,
      "bloom-pruned MOR merge must equal the unpruned merge")
    assert(b.exceptAll(c).isEmpty && c.exceptAll(b).isEmpty,
      "bloom-pruned COW merge must equal the unpruned merge")
    // an insert-only batch with an empty candidate set never scans
    val ins = Seq((990000001L, 5L, 1.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val io = Snapshots.mergeIntoMor(spark, morT, ins, Seq("o_orderkey"),
      candidates = Some(Seq.empty))
    assert(io.dvRows == 0L)
    assert(Snapshots.read(spark, morT).filter($"o_orderkey" === 990000001L).count() == 1)
  }

  test("skipping-index maintenance folds through MOR commits: apply == rebuild") {
    import graft.operators.Layout
    val t = tbl()
    val cols = Seq("o_orderkey")
    Snapshots.commit(spark, t, orders.repartitionByRange(8, $"o_orderkey"))
    var zm = Layout.zoneMapFiles(spark, Snapshots.filesAt(spark, t, 0L), cols)
    def fold(v: Long): Unit = {
      val (added, removed) = Snapshots.changedFiles(spark, t, v)
      zm = Layout.zoneMapApply(spark, zm, cols, added, removed)
    }
    // a pure-DV delete changes NO files — the fold is a no-op; the
    // map's envelopes become supersets (skipping stays correctness-
    // neutral: pruning keeps a superset of matching files)
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 100L)
    fold(1L)
    // a MOR merge appends insert files — the fold indexes only them
    val src = orders.filter($"o_orderkey" > 2000L).limit(10)
      .withColumn("o_totalprice", lit(-1.0))
    Snapshots.mergeIntoMor(spark, t, src, Seq("o_orderkey"))
    fold(2L)
    // purge swaps dirty files for clean ones — drop + index the delta
    Snapshots.purgeDeletes(spark, t)
    fold(3L)
    val rebuilt = Layout.zoneMapFiles(spark,
      Snapshots.filesAt(spark, t, 3L), cols)
    assert(zm.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(zm).isEmpty,
      "folded zone map must equal a from-scratch rebuild after MOR + purge")
  }

  test("vacuum to a DV'd horizon: the checkpointed manifest carries the vectors") {
    val t = tbl()
    Snapshots.commit(spark, t, orders.repartitionByRange(4, $"o_orderkey")) // v0
    Snapshots.commit(spark, t, orders.limit(0), overwrite = false)          // v1 (will vacuum away)
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 100L)               // v2
    val want = orders.filter($"o_orderkey" > 100L)
    // fold v0..v2 away; the horizon (v2) manifest must become a
    // self-contained overwrite CARRYING its dv set
    Snapshots.vacuum(spark, t, retainVersions = 1)
    assert(Snapshots.versions(spark, t) == Seq(2L))
    val got = Snapshots.read(spark, t)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "a vacuumed DV'd horizon must still subtract its deletion vectors")
    // the sidecar survived the sweep (reachable from the horizon)
    assert(Snapshots.dvStats(spark, t).dvRows ==
      orders.filter($"o_orderkey" <= 100L).count())
    // and purge still works on the folded log
    Snapshots.purgeDeletes(spark, t)
    assert(Snapshots.read(spark, t).count() == want.count())
  }

  test("readWithVersion: per-row provenance across appends, COW rewrites, and DVs") {
    val t = tbl()
    Snapshots.commit(spark, t,
      orders.filter($"o_orderkey" <= 500L).repartitionByRange(4, $"o_orderkey")) // v0
    Snapshots.commit(spark, t,
      orders.filter($"o_orderkey" > 500L && $"o_orderkey" <= 800L))              // v1
    Snapshots.deleteWhere(spark, t, $"o_orderkey" <= 100L)                        // v2 COW
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" > 700L)                      // v3 MOR
    val got = Snapshots.readWithVersion(spark, t).cache()
    assert(got.filter($"_commit_version".isNull).isEmpty,
      "every row must resolve a provenance version")
    // v1's append rows (not MOR-deleted) stamp v1
    assert(got.filter($"o_orderkey" > 500L && $"o_orderkey" <= 700L)
      .filter($"_commit_version" =!= 1L).isEmpty)
    // rows carried through the COW rewrite re-stamp v2; untouched v0
    // files keep v0 — both appear among the <=500 rows
    val low = got.filter($"o_orderkey" > 100L && $"o_orderkey" <= 500L)
      .select($"_commit_version").distinct().as[Long].collect().toSet
    assert(low == Set(0L, 2L), s"expected v0 (untouched) + v2 (rewritten), got $low")
    // MOR-deleted rows are absent, not stamped
    assert(got.filter($"o_orderkey" > 700L).isEmpty)
    assert(got.count() ==
      orders.filter($"o_orderkey" > 100L && $"o_orderkey" <= 700L).count())
    got.unpersist()
  }

  test("readEvolved applies DVs across an evolved schema") {
    val t = tbl()
    Snapshots.commit(spark, t, orders.limit(40))
    Snapshots.commit(spark, t, orders.limit(60).withColumn("note", lit("x")))
    Snapshots.deleteWhereMor(spark, t, $"o_orderkey" <= 5L)
    val got = Snapshots.readEvolved(spark, t)
    assert(got.columns.contains("note"))
    assert(got.filter($"o_orderkey" <= 5L).isEmpty,
      "DVs must apply on the schema-evolved read too")
    // expected = the pre-delete table minus its own matching rows
    val preDelete = Snapshots.read(spark, t, Some(1L))
    assert(got.count() ==
      preDelete.count() - preDelete.filter($"o_orderkey" <= 5L).count())
  }
}
