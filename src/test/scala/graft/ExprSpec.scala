package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{Haversine, HaversineMiles}

/** Native Catalyst HaversineMiles vs the composed-Column form. */
class ExprSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val coords = Tables.load(spark, sf0001, "events")
    .select($"event_id",
      ($"value" % 89.0 - 44.0).as("lat1"),
      (($"value" * 7.3) % 179.0 - 89.0).as("lon1"),
      ($"user_id" % 89 - 44).cast("double").as("lat2"),
      ($"user_id" * 13 % 179 - 89).cast("double").as("lon2"))

  test("native expression matches the composed form on 1000 rows") {
    val both = coords.select(
      HaversineMiles.native($"lat1", $"lon1", $"lat2", $"lon2").as("native"),
      Haversine.haversineMiles($"lat1", $"lon1", $"lat2", $"lon2").as("composed"))
    val maxDiff = both.agg(max(abs($"native" - $"composed"))).head().getDouble(0)
    assert(maxDiff < 1e-9, s"max diff $maxDiff")
  }

  test("native expression stays inside whole-stage codegen") {
    val plan = coords.select(
      HaversineMiles.native($"lat1", $"lon1", $"lat2", $"lon2").as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
  }

  test("nulls propagate") {
    val r = Seq((Some(1.0), 2.0), (None, 2.0)).toDF("a", "b")
      .select(HaversineMiles.native($"a", $"b", lit(3.0), lit(4.0)).as("d"))
      .collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }

  test("registered SQL function works") {
    HaversineMiles.register(spark)
    val d = spark.sql(
      "SELECT haversine_miles(37.7749D, -122.4194D, 34.0522D, -118.2437D) AS d")
      .head().getDouble(0)
    assert(math.abs(d - 347.4) < 1.0, s"got $d")
  }
}
