package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Layout, SkewJoin}

/** Dev probe: measure what the round-7 skipping layer actually BUYS at
  * scale — wall-clock for the skipped plan vs its full-scan/plain twin
  * on the same data, plus the files-kept ratio. Three shapes:
  *
  *   1. zone-map range box over a range-partitioned layout (the
  *      sorted-ingest case): pruned scan vs full scan + filter
  *   2. bloom point lookup over a hash-scattered layout (the case zone
  *      maps cannot serve): pruned scan vs full scan + IN
  *   3. bloomEquiJoin vs the plain join for a selective
  *      above-broadcast dim (measures the avoided fact shuffle)
  *
  * Each result is identical between the pair BY CONSTRUCTION (the
  * oracle queries prove it at sf0.01); this probe reports the price.
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.SkipProbe
  */
object SkipProbe {
  private def timed(label: String)(f: => Long): (Double, Long) = {
    f // warm
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val best = runs.minBy(_._1)
    println(f"  $label%-34s ${best._1}%7.3f s  (${best._2} rows)")
    best
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- 1. zone map: range box over a sorted (range-partitioned) layout
    val zdir = java.nio.file.Files.createTempDirectory("graft_skipz_").toString
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_quantity")
    li.repartitionByRange(64, $"l_extendedprice")
      .write.mode("overwrite").parquet(zdir)
    val zm = Layout.zoneMap(spark, zdir, Seq("l_extendedprice")).cache()
    zm.count()
    val (lo, hi) = (20000.0, 25000.0)
    val kept = Layout.pruneFiles(zm, Layout.rangeEnvelope("l_extendedprice", lit(lo), lit(hi)))
    val ztotal = Layout.parquetFileCount(spark, zdir)
    println(s"zone-map box [$lo,$hi]: kept ${kept.size}/$ztotal files")
    timed("full scan + filter") {
      spark.read.parquet(zdir).filter($"l_extendedprice".between(lo, hi)).count()
    }
    timed("zone-map pruned scan + filter") {
      Layout.prunedParquet(spark, zdir, kept)
        .filter($"l_extendedprice".between(lo, hi)).count()
    }

    // ---- 1b. zone map at REALISTIC file counts: at 100 TB the file
    // count scales with the data (a 128 MB-file table holds ~800 k
    // files), and the full scan pays per-file open/footer/task costs
    // that row-group stats never see. Same data, 1024 files.
    val zdir2 = java.nio.file.Files.createTempDirectory("graft_skipzm_").toString
    li.repartitionByRange(1024, $"l_extendedprice")
      .write.mode("overwrite").parquet(zdir2)
    val zm2 = Layout.zoneMap(spark, zdir2, Seq("l_extendedprice")).cache()
    zm2.count()
    val kept2 = Layout.pruneFiles(zm2,
      Layout.rangeEnvelope("l_extendedprice", lit(lo), lit(hi)))
    println(s"zone-map box, many-file layout: kept ${kept2.size}/" +
      s"${Layout.parquetFileCount(spark, zdir2)} files")
    timed("full scan + filter (1024 files)") {
      spark.read.parquet(zdir2).filter($"l_extendedprice".between(lo, hi)).count()
    }
    timed("pruned scan + filter (1024 files)") {
      Layout.prunedParquet(spark, zdir2, kept2)
        .filter($"l_extendedprice".between(lo, hi)).count()
    }

    // ---- 2. bloom index: point lookups over a hash-scattered layout
    val bdir = java.nio.file.Files.createTempDirectory("graft_skipb_").toString
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    orders.repartition(64, $"o_custkey").write.mode("overwrite").parquet(bdir)
    val perFile = (orders.count() / 64).max(1)
    val t0 = System.nanoTime()
    val idx = Layout.bloomIndex(spark, bdir, "o_orderkey", perFile).cache()
    idx.count()
    println(f"bloom index build: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
      s"(${idx.count()} files, ~${perFile} items/file)")
    val keys: Seq[Any] = (1L to 8L).map(_ * 101L)
    val bkept = Layout.pruneFilesByKeys(idx, keys)
    println(s"bloom lookup ${keys.size} keys: kept ${bkept.size}/64 files")
    timed("full scan + IN") {
      spark.read.parquet(bdir).filter($"o_orderkey".isin(keys: _*)).count()
    }
    timed("bloom pruned scan + IN") {
      Layout.prunedParquet(spark, bdir, bkept)
        .filter($"o_orderkey".isin(keys: _*)).count()
    }

    // ---- 3. bloom-prefiltered join vs plain join: a dim-SELECTIVITY
    // sweep, because the tradeoff is build-cost vs avoided-shuffle and
    // the crossover is the number a pipeline author needs. AQE off for
    // the pairs so both sides run the same static plan shape (AQE's own
    // runtime bloom/broadcast decisions would blur the diff); broadcast
    // off because the PREMISE is a dim above broadcast budget.
    val fact = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_returnflag", $"l_quantity")
    println(s"join sweep: fact=${fact.count()}")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (frac <- Seq(0.2, 0.02, 0.002)) {
      val dim = Tables.load(spark, dir, "orders")
        .sample(withReplacement = false, frac, seed = 42)
        .select($"o_orderkey".as("l_orderkey"))
      val nDim = dim.count()
      println(s"  dim sample frac=$frac ($nDim keys):")
      timed(s"  plain shuffle join + agg") {
        fact.join(dim, "l_orderkey").groupBy($"l_returnflag")
          .agg(count(lit(1))).count()
      }
      timed(s"  bloom-prefiltered join + agg") {
        SkewJoin.bloomEquiJoin(fact, dim, "l_orderkey", expectedItems = nDim)
          .groupBy($"l_returnflag").agg(count(lit(1))).count()
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    // ---- 4. snapshot change feed: incremental consumers read O(delta),
    // not O(table) — 10 ingest commits, then "what changed in the last"
    val sdir = java.nio.file.Files.createTempDirectory("graft_skips_").toString
    import graft.operators.Snapshots
    val t0s = System.nanoTime()
    (0 until 10).foreach { i =>
      Snapshots.commitBatch(spark, sdir,
        li.filter($"l_orderkey" % 10 === i), batchId = i)
    }
    println(f"snapshot: 10 commits of ${li.count() / 10} rows in " +
      f"${(System.nanoTime() - t0s) / 1e9}%.1f s (log fold per commit is " +
      "manifest-scale)")
    timed("full snapshot read + agg") {
      Snapshots.read(spark, sdir).agg(count(lit(1))).head.getLong(0)
    }
    timed("readChanges(last commit) + agg") {
      Snapshots.readChanges(spark, sdir, 8L, 9L).agg(count(lit(1))).head.getLong(0)
    }

    // ---- 5. copy-on-write DML: a selective delete on a key-clustered
    // snapshot rewrites O(touched files); the naive alternative (what
    // the reference's overwrite refresh amounts to) rewrites the table.
    val cdir = java.nio.file.Files.createTempDirectory("graft_skipc_").toString
    Snapshots.commit(spark, cdir, li.repartitionByRange(64, $"l_orderkey"))
    val nRows = li.count()
    // ~1% of ROWS by key-quantile band (key domains can be sparse)
    val Array(qlo, qhi) = Snapshots.read(spark, cdir)
      .stat.approxQuantile("l_orderkey", Array(0.50, 0.51), 0.0005)
    val band = ($"l_orderkey" >= qlo.toLong && $"l_orderkey" <= qhi.toLong)
    val tCow0 = System.nanoTime()
    val cow = Snapshots.deleteWhere(spark, cdir, band)
    val tCow = (System.nanoTime() - tCow0) / 1e9
    println(f"cow delete (~1%% key band): rewrote ${cow.filesRewritten}/" +
      f"${cow.filesVisible} files in $tCow%.3f s")
    // metadata-only path: delete a ~10% key band that fully covers
    // interior files of the clustered layout — retention at manifest speed
    val Array(rlo, rhi) = Snapshots.read(spark, cdir)
      .stat.approxQuantile("l_orderkey", Array(0.70, 0.80), 0.0005)
    // a production table maintains its zone map incrementally
    // (zoneMapApply per commit) — build once here, amortized
    val vNow = Snapshots.latestVersion(spark, cdir).get
    val zmC = Layout.zoneMapFiles(spark,
      Snapshots.filesAt(spark, cdir, vNow), Seq("l_orderkey")).cache()
    zmC.count()
    val tMd0 = System.nanoTime()
    val cowR = Snapshots.deleteRange(spark, cdir, "l_orderkey",
      rlo.toLong, rhi.toLong, zm = Some(zmC))
    val tMd = (System.nanoTime() - tMd0) / 1e9
    println(f"deleteRange (~10%% band, maintained zone map): dropped " +
      f"${cowR.filesDropped} files METADATA-ONLY + rewrote " +
      f"${cowR.filesRewritten} boundary files in $tMd%.3f s")

    val fdir = java.nio.file.Files.createTempDirectory("graft_skipf_").toString
    Snapshots.commit(spark, fdir, li.repartitionByRange(64, $"l_orderkey"))
    val tFull0 = System.nanoTime()
    Snapshots.commit(spark, fdir,
      Snapshots.read(spark, fdir).where(!band), overwrite = true)
    val tFull = (System.nanoTime() - tFull0) / 1e9
    println(f"full-rewrite twin (overwrite commit): $tFull%.3f s " +
      f"(${nRows} rows rescanned+rewritten) — cow/full = ${tCow / tFull}%.2f")

    // ---- 6. merge-on-read price: a SCATTERED ~1%-of-rows delete on
    // the same clustered layout — the shape where COW's touched set is
    // EVERY file (key locality does not help a hash-scattered match).
    // MOR writes a deletion-sized sidecar and rewrites nothing; the
    // read-side debt and its purge are then measured on the same table.
    val scattered = pmod(xxhash64($"l_orderkey", $"l_extendedprice"), lit(100)) === 0
    val cowDir = java.nio.file.Files.createTempDirectory("graft_skipmc_").toString
    Snapshots.commit(spark, cowDir, li.repartitionByRange(64, $"l_orderkey"))
    val tC0 = System.nanoTime()
    val cowS = Snapshots.deleteWhere(spark, cowDir, scattered)
    val tCS = (System.nanoTime() - tC0) / 1e9
    println(f"scattered 1%% delete, COW: rewrote ${cowS.filesRewritten}/" +
      f"${cowS.filesVisible} files in $tCS%.3f s")
    val morDir = java.nio.file.Files.createTempDirectory("graft_skipmm_").toString
    Snapshots.commit(spark, morDir, li.repartitionByRange(64, $"l_orderkey"))
    val tM0 = System.nanoTime()
    val morS = Snapshots.deleteWhereMor(spark, morDir, scattered)
    val tMS = (System.nanoTime() - tM0) / 1e9
    println(f"scattered 1%% delete, MOR: ${morS.dvRows} rows to a DV sidecar, " +
      f"0/${morS.filesVisible} files rewritten, in $tMS%.3f s")
    timed("read-after, COW (plain)") {
      Snapshots.read(spark, cowDir).agg(count(lit(1))).head.getLong(0)
    }
    timed("read-after, MOR (DV anti-join)") {
      Snapshots.read(spark, morDir).agg(count(lit(1))).head.getLong(0)
    }
    val tP0 = System.nanoTime()
    val purged = Snapshots.purgeDeletes(spark, morDir)
    val tP = (System.nanoTime() - tP0) / 1e9
    println(f"purge: rewrote ${purged.filesRewritten}/${purged.filesVisible} " +
      f"files once in $tP%.3f s")
    timed("read-after-purge (plain again)") {
      Snapshots.read(spark, morDir).agg(count(lit(1))).head.getLong(0)
    }
    spark.stop()
  }
}
