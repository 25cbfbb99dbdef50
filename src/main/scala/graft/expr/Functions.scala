package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scalar helpers shared by the batch pipeline and the query inventory
  * (SURVEY.md §2.8). All pure `Column` compositions — codegen-friendly,
  * no UDFs.
  */
object Functions {
  /** Seconds per 365.25-day year — the reference's age convention
    * (`back_end/feature_store/batch_processing.py:31`). */
  val SecondsPerYear = 31557600.0

  /** age in fractional years between two timestamps (F5). The
    * `cast("timestamp")` hop makes this total over TIMESTAMP_NTZ inputs
    * (parquet isAdjustedToUTC=false) — identity under the UTC session TZ. */
  def ageYears(at: Column, dob: Column): Column =
    (at.cast("timestamp").cast("long") - dob.cast("timestamp").cast("long")) /
      lit(SecondsPerYear)

  /** pandas-style factorize: dense codes in first-seen-by-sort-order
    * (`back_end/data/load_data.py:20`). Global window — fine for code
    * assignment over a modest key domain; the 100 TB path materializes
    * `distinct.orderBy.zipWithIndex` once and broadcast-joins the codes.
    */
  def factorize(key: Column): Column =
    dense_rank().over(Window.orderBy(key)) - 1

  /** Dynamic try_cast chain mirroring the serving edge's float-if-dot /
    * int / string fallback (`back_end/app/routes/feature.py:180-187`). */
  def tryCastAny(c: Column): Column =
    when(c.rlike("^-?[0-9]+\\.[0-9]+$"), c.cast("double"))
      .when(c.rlike("^-?[0-9]+$"), c.cast("long").cast("double"))
      .otherwise(lit(null))
}
