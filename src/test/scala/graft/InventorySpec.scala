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
}
