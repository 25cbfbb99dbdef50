package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Driver-verified query inventory (SURVEY.md §2).
  *
  * Every entry ships as (name -> query) in [[queries]] plus, when the
  * semantics are ANSI-SQL-expressible, a DuckDB oracle in [[oracle]].
  * Contract (builder prompt): column names must match the oracle exactly;
  * every query is given a deterministic total ORDER BY present in BOTH
  * formulations (the driver's hash compare is row-sensitive-safe this way;
  * Catalyst's EliminateSorts drops the sort under Bench's count() so it
  * costs nothing at bench time).
  */
object Inventory {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- W1: trailing 10-min count per key (batch_processing.py:41,44) ----
  val w1RangeCount: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec")
      .rangeBetween(-600, 0)
    t(s, dir, "events")
      .withColumn("ts_sec", Tables.tsSec($"ts"))
      .select($"event_id", $"user_id", $"ts_sec",
        count(lit(1)).over(w).as("cnt_10m"))
      .orderBy($"event_id")
  }

  val queries: Map[String, Q] = Map(
    "w1_range_count_10min" -> w1RangeCount
  ) ++ Relational.queries ++ Funcs.queries ++ NorthStar.queries ++ NonSql.queries ++ Ops.queries

  val oracle: Map[String, String] = Map(
    "w1_range_count_10min" ->
      """SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
        |COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
        |RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS cnt_10m
        |FROM events ORDER BY event_id""".stripMargin.replace("\n", " ")
  ) ++ Relational.oracle ++ Funcs.oracle ++ NorthStar.oracle ++ NonSql.oracle ++ Ops.oracle
}
