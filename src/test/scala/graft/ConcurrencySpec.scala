package graft

import java.util.concurrent.Executors

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Snapshots

/** TRUE-THREAD stress for the snapshot layer's optimistic concurrency —
  * the seam-injected SnapshotSpec races pin the conflict logic
  * deterministically; this suite runs real contention through the
  * actual atomic commit point (hard-link create-if-absent on the local
  * FS — the check-then-act window Hadoop's LocalFileSystem `create`
  * would leave open is exactly what these threads would hit). The
  * invariants are exact, only the schedule is nondeterministic. */
class ConcurrencySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def tbl() =
    java.nio.file.Files.createTempDirectory("graft_conc_").toString

  test("32 concurrent appends from 8 threads: every commit lands exactly once") {
    val t = tbl()
    Snapshots.commit(spark, t, spark.range(0, 1000).toDF("id"))
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 32).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            Snapshots.commit(spark, t,
              spark.range(1000L + i * 100L, 1000L + (i + 1) * 100L).toDF("id"))
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    // 33 contiguous versions — no clobbered manifest, no gap
    assert(Snapshots.versions(spark, t) == (0L to 32L))
    // every row exactly once — a lost commit or a double-applied retry
    // would break either count
    val got = Snapshots.read(spark, t)
    assert(got.count() == 4200)
    assert(got.distinct().count() == 4200)
  }

  test("8 concurrent cow deletes straddling shared files: retries converge exactly") {
    val t = tbl()
    // 16 range-clustered files of 4000 keys; each thread deletes a
    // 2500-key band at 5000-key stride, so neighboring bands regularly
    // share a file → genuine replace-replace conflicts under contention
    Snapshots.commit(spark, t,
      spark.range(0, 64000).toDF("id").repartitionByRange(16, $"id"))
    val bands = (0 until 8).map(i => (i * 5000L, i * 5000L + 2500L))
    val retries = new java.util.concurrent.atomic.AtomicLong(0)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futs = bands.map { case (lo, hi) =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var attempts = 0
            var done = false
            while (!done) {
              try {
                Snapshots.deleteWhere(spark, t, $"id" >= lo && $"id" < hi)
                done = true
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  attempts += 1; retries.incrementAndGet()
                  assert(attempts < 50, s"band [$lo,$hi) livelocked")
              }
            }
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    val got = Snapshots.read(spark, t)
    val expectedGone = bands.map { case (lo, hi) => hi - lo }.sum
    assert(got.count() == 64000 - expectedGone)
    bands.foreach { case (lo, hi) =>
      assert(got.filter($"id" >= lo && $"id" < hi).isEmpty,
        s"band [$lo,$hi) must be fully deleted")
    }
    // rows outside every band are all intact
    val outside = bands.foldLeft(lit(true)) { case (acc, (lo, hi)) =>
      acc && !($"id" >= lo && $"id" < hi)
    }
    assert(got.filter(outside).count() == 64000 - expectedGone)
    info(s"replace conflicts retried: ${retries.get()}")
  }

  test("8 concurrent MOR deletes on shared files: deletes commute, union exact, zero rewrites") {
    val t = tbl()
    // same shared-file layout as the cow stress — but merge-on-read
    // deletes COMMUTE (each lands a dv manifest; readers union the
    // vectors), so unlike the replace-replace races above these must
    // all land WITHOUT a single content conflict
    Snapshots.commit(spark, t,
      spark.range(0, 64000).toDF("id").repartitionByRange(16, $"id"))
    val bands = (0 until 8).map(i => (i * 5000L, i * 5000L + 2500L))
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futs = bands.map { case (lo, hi) =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var attempts = 0
            var done = false
            while (!done) {
              try {
                Snapshots.deleteWhereMor(spark, t, $"id" >= lo && $"id" < hi)
                done = true
              } catch {
                // only manifest-version collisions retry here — never a
                // content conflict (no files are rewritten)
                case _: java.util.ConcurrentModificationException =>
                  attempts += 1
                  assert(attempts < 50, s"band [$lo,$hi) livelocked")
              }
            }
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    // every band's dv landed: 9 versions, zero files rewritten
    assert(Snapshots.versions(spark, t) == (0L to 8L))
    val h = Snapshots.history(spark, t).where($"version" > 0L)
      .select($"action", $"n_removed").as[(String, Int)].collect()
    assert(h.forall { case (a, r) => a == "dv" && r == 0 })
    val got = Snapshots.read(spark, t)
    val expectedGone = bands.map { case (lo, hi) => hi - lo }.sum
    assert(got.count() == 64000 - expectedGone)
    bands.foreach { case (lo, hi) =>
      assert(got.filter($"id" >= lo && $"id" < hi).isEmpty,
        s"band [$lo,$hi) must be fully deleted")
    }
    // the union of vectors purges to the same exact state
    Snapshots.purgeDeletes(spark, t)
    assert(Snapshots.read(spark, t).count() == 64000 - expectedGone)
    assert(Snapshots.dvStats(spark, t) == Snapshots.DvStats(0, 0L, 0))
  }

  test("8 concurrent MOR merges of the SAME keys: losers conflict, retries converge to one live row per key") {
    val t = tbl()
    Snapshots.commit(spark, t,
      spark.range(0, 4000).select($"id", lit(-1L).as("v"))
        .repartitionByRange(8, $"id"))
    // every thread upserts the SAME 50 keys with its own value. Without
    // the merge guard both racing merges commit: each marks the old row
    // dead and appends its own — duplicate live rows per key, a state
    // no serial order produces (the round-7 ADVICE finding). With the
    // guard, losers see the winner's appended keys overlap theirs,
    // throw, and re-run against the new state.
    val conflicts = new java.util.concurrent.atomic.AtomicLong(0)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val src = spark.range(0, 50)
              .select($"id", lit(i.toLong).as("v"))
            var attempts = 0
            var done = false
            while (!done) {
              try {
                Snapshots.mergeIntoMor(spark, t, src, Seq("id"))
                done = true
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  attempts += 1; conflicts.incrementAndGet()
                  assert(attempts < 100, s"merge $i livelocked")
              }
            }
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    val got = Snapshots.read(spark, t)
    // EXACTLY one live row per key — the invariant the guard exists for
    assert(got.count() == 4000)
    assert(got.filter($"id" < 50).count() == 50)
    assert(got.select($"id").distinct().count() == 4000)
    // all 50 carry some single thread-final value (last serial writer)
    val vs = got.filter($"id" < 50).select($"v").distinct()
      .as[Long].collect().toSet
    assert(vs.subsetOf((0L until 8L).toSet) && vs.nonEmpty)
    info(s"merge conflicts retried: ${conflicts.get()}")
  }

  test("disjoint-key MOR merges commute: all land without a content conflict") {
    val t = tbl()
    Snapshots.commit(spark, t,
      spark.range(0, 4000).select($"id", lit(-1L).as("v"))
        .repartitionByRange(8, $"id"))
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            // thread-private key band → the overlap scan finds nothing
            val src = spark.range(i * 500L, i * 500L + 100L)
              .select($"id", lit(i.toLong).as("v"))
            var attempts = 0
            var done = false
            while (!done) {
              try {
                Snapshots.mergeIntoMor(spark, t, src, Seq("id"))
                done = true
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  attempts += 1
                  assert(attempts < 100, s"merge $i livelocked")
              }
            }
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    val got = Snapshots.read(spark, t)
    assert(got.count() == 4000)
    (0 until 8).foreach { i =>
      assert(got.filter($"id" >= i * 500L && $"id" < i * 500L + 100L &&
        $"v" === i.toLong).count() == 100, s"band $i upsert lost")
    }
  }
}
