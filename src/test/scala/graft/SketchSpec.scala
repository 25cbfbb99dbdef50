package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** Mergeable-sketch operators: HLL distinct tables (slice → union
  * rollup, parquet persistence) and CMS frequency point estimates —
  * tolerance, one-sided error, and partition-order determinism. */
class SketchSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def events = Tables.load(spark, sf0001, "events")
    .withColumn("day", to_date(timestamp_seconds(Tables.tsSec($"ts"))))

  test("hll rollup estimate stays within 5% of exact per-group distinct") {
    val slices = Sketches.distinctSketchTable(events, Seq("event_type", "day"), "user_id")
    val est = Sketches.rollupDistinct(slices, Seq("event_type"))
      .select($"event_type", $"distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val e = est(k)
      assert(math.abs(e - ex).toDouble / ex <= 0.05,
        s"$k: est $e vs exact $ex drifted past 5%")
    }
  }

  test("union of day slices equals the sketch of the whole table") {
    // HLL registers are max-merged: sketch(union of slices) and
    // union(sketches of slices) hold identical registers, so the
    // rollup answers EXACTLY what a one-shot sketch would — the
    // property that makes incremental daily builds safe.
    val slices = Sketches.distinctSketchTable(events, Seq("event_type", "day"), "user_id")
    val viaSlices = Sketches.rollupDistinct(slices, Seq("event_type"))
      .select($"event_type", $"distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = Sketches.rollupDistinct(
      Sketches.distinctSketchTable(events, Seq("event_type"), "user_id"),
      Seq("event_type"))
      .select($"event_type", $"distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSlices == oneShot)
  }

  test("sketch slices persist to parquet and answer after reload") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_").toString
    Sketches.distinctSketchTable(events, Seq("event_type", "day"), "user_id")
      .write.mode("overwrite").parquet(dir)
    val live = Sketches.rollupDistinct(
      Sketches.distinctSketchTable(events, Seq("event_type", "day"), "user_id"),
      Seq("event_type"))
      .select($"event_type", $"distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reloaded = Sketches.rollupDistinct(spark.read.parquet(dir), Seq("event_type"))
      .select($"event_type", $"distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reloaded == live)
  }

  test("global rollup (no keep cols) estimates the overall distinct count") {
    val slices = Sketches.distinctSketchTable(events, Seq("event_type", "day"), "user_id")
    val est = Sketches.rollupDistinct(slices, Seq.empty)
      .select($"distinct_est").head().getLong(0)
    val exact = events.select(countDistinct($"user_id")).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= 0.05, s"est $est vs exact $exact")
  }

  test("cms estimates are one-sided: never below exact, overshoot within eps·N") {
    val eps = 0.001
    val n = events.count()
    val sketch = Sketches.cmsBuild(events, "user_id", eps = eps)
    val exact = events.groupBy($"user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keys = exact.keys.toSeq.sorted.take(50)
    Sketches.cmsEstimates(sketch, keys).foreach { case (k, est) =>
      val ex = exact(k)
      assert(est >= ex, s"CMS under-counted key $k: $est < $ex")
      assert(est - ex <= math.ceil(eps * n).toLong + 1,
        s"CMS overshoot for $k: $est vs $ex exceeds eps·N")
    }
  }

  test("cms estimates are identical across partition layouts") {
    val a = Sketches.cmsBuild(events, "user_id")
    val b = Sketches.cmsBuild(events.repartition(7), "user_id")
    val keys = Seq.range(0L, 20L)
    assert(Sketches.cmsEstimates(a, keys) == Sketches.cmsEstimates(b, keys))
  }
}
