package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.batch.FeaturePipeline
import graft.expr.{Functions, Haversine}
import graft.schema.Txn

/** Batch feature plane: schema contract, window semantics vs an
  * in-Spark brute-force range-join oracle (SURVEY §5.3 — J9 as the test
  * oracle for W1/W2), and the scalar derivations on known values. */
class FeaturePipelineSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // 3 cards, timestamps engineered so the 10-min / 1-h windows differ
  private lazy val fixture = Seq(
    Txn(ts("2024-01-01 10:00:00"), 1L, "grocery", 10.0, "F", 40.0, -74.0, 1000, ts("1990-06-15 00:00:00"), 40.1, -74.1, 0),
    Txn(ts("2024-01-01 10:05:00"), 1L, "gas", 20.0, "F", 40.0, -74.0, 1000, ts("1990-06-15 00:00:00"), 40.2, -74.2, 0),
    Txn(ts("2024-01-01 10:12:00"), 1L, "food", 30.0, "F", 40.0, -74.0, 1000, ts("1990-06-15 00:00:00"), 40.3, -74.3, 1),
    Txn(ts("2024-01-01 11:30:00"), 1L, "food", 40.0, "F", 40.0, -74.0, 1000, ts("1990-06-15 00:00:00"), 40.3, -74.3, 0),
    Txn(ts("2024-01-01 10:00:00"), 2L, "misc", 5.0, "M", 34.0, -118.0, 99999, ts("1975-01-01 00:00:00"), 34.1, -118.1, 0)
  ).toDS().toDF()

  test("feature schema is the 13-column contract") {
    val out = FeaturePipeline.features(fixture)
    assert(out.columns.toSeq == Seq("cc_num", "amt", "hour_of_day", "day_of_week",
      "age_at_txn", "distance_to_merchant", "txn_count_last_10_min",
      "avg_amt_last_1_hour", "category", "gender", "city_pop",
      "feature_timestamp", "is_fraud"))
  }

  test("trailing windows match the brute-force range self-join oracle") {
    val out = FeaturePipeline.features(fixture)
      .select($"cc_num", $"feature_timestamp", $"txn_count_last_10_min", $"avg_amt_last_1_hour")
    val t = fixture.select($"cc_num", $"trans_date_trans_time".cast("long").as("u"), $"amt")
    val brute = t.as("a").join(t.as("b"),
        $"a.cc_num" === $"b.cc_num" && $"b.u".between($"a.u" - 600, $"a.u"))
      .groupBy($"a.cc_num".as("cc_num"), $"a.u".as("u"))
      .agg(count(lit(1)).as("cnt"))
    val joined = out.withColumn("u", $"feature_timestamp".cast("long"))
      .join(brute, Seq("cc_num", "u"))
    assert(joined.filter($"txn_count_last_10_min" =!= $"cnt").count() == 0)
    // spot values: card 1 @10:05 has 2 txns in 10 min; @10:12 has 2 (10:05,10:12)
    val m = out.collect().map(r => (r.getLong(0), r.getTimestamp(1).toString) -> r.getInt(2)).toMap
    assert(m((1L, "2024-01-01 10:00:00.0")) == 1)
    assert(m((1L, "2024-01-01 10:05:00.0")) == 2)
    assert(m((1L, "2024-01-01 10:12:00.0")) == 2)
    assert(m((1L, "2024-01-01 11:30:00.0")) == 1)
  }

  test("1-hour trailing avg is correct") {
    val out = FeaturePipeline.features(fixture)
    val m = out.collect().map(r => (r.getLong(0), r.getTimestamp(11).toString) -> r.getDouble(7)).toMap
    assert(math.abs(m((1L, "2024-01-01 10:12:00.0")) - 20.0) < 1e-9) // (10+20+30)/3
    assert(math.abs(m((1L, "2024-01-01 11:30:00.0")) - 40.0) < 1e-9) // only itself in [10:30,11:30]
  }

  test("haversine matches a known distance (SF ↔ LA ≈ 347 mi)") {
    val d = Seq((37.7749, -122.4194, 34.0522, -118.2437)).toDF("a", "b", "c", "d")
      .select(Haversine.haversineMiles($"a", $"b", $"c", $"d").as("mi"))
      .head().getDouble(0)
    assert(math.abs(d - 347.4) < 1.0, s"got $d")
  }

  test("haversine is symmetric and zero on identical points") {
    val df = Seq((40.0, -74.0, 41.5, -73.2)).toDF("a", "b", "c", "d")
    val Array(fwd, rev, zero) = df.select(
      Haversine.haversineMiles($"a", $"b", $"c", $"d"),
      Haversine.haversineMiles($"c", $"d", $"a", $"b"),
      Haversine.haversineMiles($"a", $"b", $"a", $"b")).head().toSeq
      .map(_.asInstanceOf[Double]).toArray
    assert(math.abs(fwd - rev) < 1e-9)
    assert(zero == 0.0)
  }

  test("age uses 365.25-day years (reference convention)") {
    val age = Seq((ts("2024-01-01 00:00:00"), ts("1990-01-01 00:00:00")))
      .toDF("at", "dob")
      .select(Functions.ageYears($"at", $"dob").as("age")).head().getDouble(0)
    assert(math.abs(age - 34.0) < 0.05, s"got $age")
  }

  test("observed metrics accumulate during the action, no second scan") {
    val out = FeaturePipeline.featuresObserved(fixture)
    // collect() executes THIS dataset's plan (count() would derive a new
    // one whose metrics land on a different QueryExecution)
    out.collect()
    val m = out.queryExecution.observedMetrics("feature_quality")
    assert(m.getAs[Long]("n_rows") == 5)
    assert(m.getAs[Long]("null_distance") == 0)
    assert(m.getAs[Long]("negative_age") == 0)
    assert(m.getAs[Long]("n_fraud") == 1)
    assert(m.getAs[Timestamp]("min_ts") == ts("2024-01-01 10:00:00"))
    assert(m.getAs[Timestamp]("max_ts") == ts("2024-01-01 11:30:00"))
  }

  test("incremental recompute equals the full batch restricted to the increment") {
    // history: first 3 rows; increment: the 11:30 txn (card 1) + a brand-new card
    val hist = fixture.filter($"trans_date_trans_time" < lit(ts("2024-01-01 11:00:00")))
    val incr = fixture.filter($"trans_date_trans_time" >= lit(ts("2024-01-01 11:00:00")))
      .union(Seq(Txn(ts("2024-01-01 11:31:00"), 3L, "misc", 7.0, "M", 34.0, -118.0,
        5, ts("1980-01-01 00:00:00"), 34.1, -118.1, 0)).toDS().toDF())
    val full = FeaturePipeline.features(hist.union(incr))
      .filter($"feature_timestamp" >= lit(ts("2024-01-01 11:00:00")))
    val inc = FeaturePipeline.incrementalFeatures(incr, hist)
    assert(inc.count() == 2)
    assert(inc.exceptAll(full).count() == 0 && full.exceptAll(inc).count() == 0,
      s"incremental != full:\nfull=${full.collect().toSeq}\ninc=${inc.collect().toSeq}")
    // a context row INSIDE the lookback must influence the increment:
    // card-1 @11:30 has only itself in 1h (10:12 is 78 min back) — now
    // shift history so 10:45 exists and verify the avg includes it
    val hist2 = hist.union(Seq(Txn(ts("2024-01-01 10:45:00"), 1L, "misc", 100.0, "F",
      40.0, -74.0, 1000, ts("1990-06-15 00:00:00"), 40.1, -74.1, 0)).toDS().toDF())
    val inc2 = FeaturePipeline.incrementalFeatures(incr, hist2)
      .filter($"cc_num" === 1L).head()
    assert(inc2.getAs[Double]("avg_amt_last_1_hour") == 70.0) // (100 + 40) / 2
  }

  test("incremental lookback bound pushes to the history parquet scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fpinc_").toString
    fixture.write.parquet(tmp + "/hist")
    val hist = spark.read.parquet(tmp + "/hist")
    val incr = fixture.filter($"cc_num" === 1L).limit(1)
    val plan = FeaturePipeline.incrementalFeatures(incr, hist)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(trans_date_trans_time), GreaterThanOrEqual(trans_date_trans_time"),
      s"lookback bound not pushed:\n$plan")
  }

  test("csv round trip preserves the feature rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp_").toString
    fixture.write.mode("overwrite").option("header", "true").csv(tmp + "/in")
    FeaturePipeline.runCsv(spark, tmp + "/in", tmp + "/out")
    val back = spark.read.option("header", "true").csv(tmp + "/out")
    assert(back.count() == 5)
    assert(back.columns.length == 13)
  }
}
