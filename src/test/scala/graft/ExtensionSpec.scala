package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.HaversineMiles
import graft.plans.HaversineBoundingBox

/** The geo bounding-box optimizer rule: semantics preserved, bounds
  * reach the parquet scan as pushed filters. */
class ExtensionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val geoPath = {
    val p = java.nio.file.Files.createTempDirectory("graft_geo_").toString + "/pts"
    // full 1°×1° grid so every disc contains points
    spark.range(180L * 360L).select(
      $"id",
      ($"id" % 180 - 90 + 0.5).cast("double").as("lat"),
      (($"id" / 180) % 360 - 180 + 0.5).cast("double").as("lon"))
      .write.parquet(p)
    p
  }

  private def radiusQuery = spark.read.parquet(geoPath)
    .filter(HaversineMiles.native($"lat", $"lon", lit(40.0), lit(-74.0)) <= lit(500.0))

  test("bounding-box rule preserves results exactly") {
    val without = radiusQuery.select("id").collect().map(_.getLong(0)).sorted
    HaversineBoundingBox.enable(spark)
    try {
      val withRule = radiusQuery.select("id").collect().map(_.getLong(0)).sorted
      assert(withRule.toSeq == without.toSeq)
      assert(withRule.nonEmpty, "fixture should have points inside the disc")
    } finally HaversineBoundingBox.disable(spark)
  }

  test("bounding-box bounds are pushed to the parquet scan") {
    HaversineBoundingBox.enable(spark)
    try {
      val plan = radiusQuery.queryExecution.executedPlan.toString
      // PushedFilters prints truncated, so assert the scan's DataFilters
      // carry the lat bound and the Filter condition carries all four
      assert(plan.contains("PushedFilters: [GreaterThanOrEqual(lat,"),
        s"lat bounds not pushed:\n$plan")
      assert("lon#\\d+ >= ".r.findFirstIn(plan).isDefined &&
        "lon#\\d+ <= ".r.findFirstIn(plan).isDefined,
        s"lon bounds missing from filter:\n$plan")
    } finally HaversineBoundingBox.disable(spark)
  }

  test("rule is idempotent under repeated optimizer passes") {
    HaversineBoundingBox.enable(spark)
    try {
      val once = radiusQuery.queryExecution.optimizedPlan
      val twice = HaversineBoundingBox(HaversineBoundingBox(once))
      assert(twice.fastEquals(once) || twice.semanticHash() == once.semanticHash(),
        s"rule kept adding conjuncts:\n$twice")
    } finally HaversineBoundingBox.disable(spark)
  }

  test("polar center drops the longitude bound but keeps latitude") {
    HaversineBoundingBox.enable(spark)
    try {
      val q = spark.read.parquet(geoPath)
        .filter(HaversineMiles.native($"lat", $"lon", lit(89.9), lit(0.0)) <= lit(500.0))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThanOrEqual(lat,"), plan)
      assert(!plan.contains("GreaterThanOrEqual(lon,"), plan)
      // still correct
      assert(q.count() == spark.read.parquet(geoPath).filter(
        HaversineMiles.native($"lat", $"lon", lit(89.9), lit(0.0)) <= lit(500.0)).count())
    } finally HaversineBoundingBox.disable(spark)
  }

  test("SparkSessionExtensions registration applies cleanly") {
    // full effect needs a fresh session (spark.sql.extensions at build
    // time); here the injector contract is exercised directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftSparkExtensions().apply(ext)
    // and the injected function builder produces the native expression
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = HaversineMiles(Literal(1.0), Literal(2.0), Literal(3.0), Literal(4.0))
    assert(e.dataType == org.apache.spark.sql.types.DoubleType)
  }
}
