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

  // Type-drift regression guard: the driver regenerates the testdata
  // between rounds and has already shipped `events.ts` as TIMESTAMP(NANOS)
  // (→ long under nanosAsLong) and TIMESTAMP(MICROS)/isAdjustedToUTC=false
  // (→ TIMESTAMP_NTZ). Tables.load must absorb every encoding into ONE
  // engine-facing schema; this spec pins that schema per table so the next
  // silent regeneration fails HERE, by name, instead of as 21 broken
  // queries downstream.
  test("testdata schema contract: every table loads to the pinned engine schema") {
    import org.apache.spark.sql.types._
    val expected: Map[String, Seq[(String, DataType)]] = Map(
      "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
      "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> TimestampType),
      "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Seq("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
    assert(expected.keySet == Tables.AllTables.toSet)
    Tables.AllTables.foreach { name =>
      val got = Tables.load(spark, sf0001, name).schema
        .map(f => f.name -> (f.dataType match {
          // containsNull / nullability are generator details, not contract
          case ArrayType(et, _) => ArrayType(et)
          case dt => dt
        }))
      assert(got == expected(name),
        s"SCHEMA DRIFT in table '$name' — the testdata generator changed an " +
        s"encoding Tables.load does not absorb.\n  got:      $got\n  expected: ${expected(name)}")
    }
    // And the canonical epoch helper stays a LongType second count.
    val e = Tables.load(spark, sf0001, "events")
    assert(e.select(Tables.tsSec(org.apache.spark.sql.functions.col("ts"))
      .as("s")).schema("s").dataType == LongType)
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
