package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling and expectation validation — the data-quality gate a
  * training-data pipeline runs before anything expensive touches a new
  * drop. Both are designed around ONE pass over the table: profiling is
  * a single wide aggregate stacked to long form, and every row-local
  * expectation folds into a single conditional-count aggregate (only
  * referential rules need a join, and those broadcast the key set).
  */
object Quality {

  /** Per-column profile of `cols`: row count, null count, distinct
    * count, min and max (cast to string so heterogeneous column types
    * share one output schema). ONE aggregate job; the long (per-column-
    * row) shape is a zero-cost explode of the single result row.
    *
    * `exact=true` uses `count(distinct)` — Catalyst plans one Expand
    * that multiplies scanned rows by the number of profiled columns
    * (the oracle-checkable form, fine for daily QA on a partition).
    * `exact=false` (default) uses HLL `approx_count_distinct` — no
    * Expand, ONE map-side-mergeable pass regardless of column count:
    * the 100 TB form. */
  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty)
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(
      lit(c).as("column"), col("__n").as("n_rows"),
      col(s"__nulls_$c").as("n_nulls"), col(s"__dist_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value")))
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
      .orderBy("column")
  }

  /** A validation rule. `name` keys the output row. */
  sealed trait Rule { def name: String }
  /** `col` must never be null. */
  case class NotNull(name: String, column: String) extends Rule
  /** `col` must lie in [lo, hi] when non-null. */
  case class InRange(name: String, column: String, lo: Double, hi: Double)
      extends Rule
  /** `col` must match `pattern` (full-string RLIKE) when non-null. */
  case class Matches(name: String, column: String, pattern: String)
      extends Rule
  /** `cols` must be a unique key. Violations = surplus rows
    * (n_rows − n_distinct keys), EXACT: each distinct Unique key set
    * adds one Expand replica of the scanned rows to the shared
    * aggregate (Spark's multi-count-distinct planning). */
  case class Unique(name: String, columns: Seq[String]) extends Rule
  /** [[Unique]] with HLL `approx_count_distinct` (±~2.3 %): no Expand,
    * so ANY number of these rules still costs one plain pass — the
    * 100 TB screen; confirm a failure with an exact [[Unique]] run on
    * the offending partition. */
  case class UniqueApprox(name: String, columns: Seq[String]) extends Rule
  /** Every non-null `column` value must exist in `dim.dimColumn`.
    * Violations = rows with no referent. */
  case class ForeignKey(name: String, column: String, dim: DataFrame,
      dimColumn: String) extends Rule

  /** Run `rules` against `df`; returns one `(rule, n_violations)` row
    * per rule, ordered by rule name.
    *
    * Scale shape: every row-local rule (not-null / range / regex) and
    * every `Unique` compiles into ONE aggregate over ONE scan —
    * conditional counts and `count(distinct struct(keys))`
    * respectively — so adding rules adds columns, not passes.
    * `ForeignKey` rules each add one anti-join whose build side is the
    * DISTINCT referenced key set (dimension-sized → broadcast under
    * AQE); the fact table still streams through without a shuffle. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._

    val scalarAggs: Seq[Column] = rules.collect {
      case NotNull(n, c) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(n)
      case InRange(n, c, lo, hi) =>
        sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
          .otherwise(0L)).as(n)
      case Matches(n, c, p) =>
        sum(when(col(c).isNotNull && !col(c).rlike(p), 1L).otherwise(0L))
          .as(n)
      case Unique(n, cs) =>
        (count(lit(1)) - countDistinct(struct(cs.map(col): _*))).as(n)
      case UniqueApprox(n, cs) =>
        greatest(lit(0L),
          count(lit(1)) - approx_count_distinct(struct(cs.map(col): _*))).as(n)
    }
    val scalarPart: Option[DataFrame] =
      if (scalarAggs.isEmpty) None
      else {
        val one = df.agg(scalarAggs.head, scalarAggs.tail: _*)
        val stacked = scalarAggs.map { a =>
          val n = one.schema(scalarAggs.indexOf(a)).name
          struct(lit(n).as("rule"), col(n).as("n_violations"))
        }
        Some(one.select(explode(array(stacked: _*)).as("r")).select("r.*"))
      }
    val fkParts: Seq[DataFrame] = rules.collect {
      case ForeignKey(n, c, dim, dc) =>
        df.select(col(c)).filter(col(c).isNotNull)
          .join(dim.select(col(dc).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(n).as("rule"), col("n_violations"))
    }
    (scalarPart.toSeq ++ fkParts).reduce(_ unionByName _).orderBy("rule")
  }
}
