package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every inventory query runs at sf0.001 and yields rows; every
  * oracle key corresponds to a query. The value-level compare against
  * DuckDB is the driver's job (tools/check.py locally). */
class InventorySpec extends AnyFunSuite with SparkSuite {

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("ensureViews re-registers after a view is dropped mid-session") {
    Tables.ensureViews(spark, sf0001)
    assert(spark.catalog.tableExists("lineitem"))
    spark.catalog.dropTempView(Tables.AllTables.head)
    // cached (session -> dir) entry alone would skip registration and
    // leave every query against the dropped view failing
    Tables.ensureViews(spark, sf0001)
    assert(spark.catalog.tableExists(Tables.AllTables.head))
    assert(spark.sql(s"SELECT COUNT(*) FROM ${Tables.AllTables.head}").head().getLong(0) > 0)
  }

  test("spark.sql surface: views + native functions answer plain SQL") {
    Tables.createViews(spark, sf0001)
    val agg = spark.sql(
      """SELECT l_returnflag, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(agg.count() > 0)
    val geo = spark.sql(
      """SELECT e.event_id, haversine_miles(40.7, -74.0, 34.05, -118.24) AS d
        |FROM events e LIMIT 1""".stripMargin).head()
    assert(math.abs(geo.getDouble(1) - 2445) < 15, s"got ${geo.getDouble(1)}")
    val dot = spark.sql(
      """SELECT a.vec_id,
        |  array_dot(CAST(a.embedding AS array<double>), CAST(a.embedding AS array<double>)) AS sq
        |FROM embeddings a WHERE a.vec_id = 0""".stripMargin).head()
    assert(dot.getDouble(1) > 0.0)
  }
}
