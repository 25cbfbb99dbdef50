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

  test("two native instances in one projection codegen cleanly (freshName locals)") {
    // range ids are non-nullable, so nullSafeCodeGen inlines both blocks
    // unscoped into one generated function — duplicate local names would
    // fail Janino here. fallback=false turns that silent degrade into a
    // test failure.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(100).select(
        ($"id" % 89 - 44).cast("double").as("lat1"),
        ($"id" * 7 % 179 - 89).cast("double").as("lon1"),
        ($"id" % 67 - 33).cast("double").as("lat2"),
        ($"id" * 13 % 179 - 89).cast("double").as("lon2"))
      val two = df.select(
        HaversineMiles.native($"lat1", $"lon1", $"lat2", $"lon2").as("d1"),
        HaversineMiles.native($"lat2", $"lon2", $"lat1", $"lon1").as("d2"))
      val rows = two.collect()
      assert(rows.length == 100)
      // haversine is symmetric
      assert(rows.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
      assert(two.queryExecution.executedPlan.toString.contains("*(1) Project"))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("factorize: dense codes in key order, no full-table global sort") {
    import graft.expr.Functions
    val df = spark.range(1000).select(($"id" * 37 % 13).as("k"), $"id")
    val out = Functions.factorize(df, "k", "code")
    val codes = out.select("k", "code").distinct().orderBy("k").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(codes.toSeq == codes.map(_._1).sorted.zipWithIndex.map { case (k, i) => k -> i.toLong }.toSeq)
    assert(out.count() == 1000)
    // the only Sort in the plan must feed the distinct-key code table,
    // never the full input: the main branch joins via broadcast
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
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
