package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** pandas-style factorize: dense integer codes in key sort order
    * (`back_end/data/load_data.py:20`), appended as `outCol`.
    *
    * 100 TB shape: the global sort runs over DISTINCT keys only (a
    * distributed range-partitioned sort — never the naive
    * `dense_rank().over(Window.orderBy(key))`, which funnels the whole
    * table through ONE reducer), `zipWithIndex` assigns contiguous codes
    * with one extra tiny job for partition offsets, and the code table —
    * one row per distinct key — joins back broadcast. Set
    * `broadcastCodes=false` when the key domain itself is too large to
    * broadcast; the join then shuffles on the key, which is still
    * per-distinct-key work.
    */
  def factorize(df: DataFrame, keyCol: String, outCol: String,
      broadcastCodes: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    // NULL keys get no code row: pandas factorize codes NaN as -1
    // (load_data.py:20), and an inner/using join on a null key would
    // silently DROP the row (null never equals null). Left-join the
    // code table and map unmatched (i.e. null-key) rows to -1.
    val keys = df.select(col(keyCol)).filter(col(keyCol).isNotNull)
      .distinct().orderBy(col(keyCol))
    val schema = org.apache.spark.sql.types.StructType(
      keys.schema.fields :+
        org.apache.spark.sql.types.StructField(outCol, org.apache.spark.sql.types.LongType, nullable = false))
    val codes = spark.createDataFrame(
      keys.rdd.zipWithIndex.map { case (r, i) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      schema)
    df.join(if (broadcastCodes) broadcast(codes) else codes, Seq(keyCol), "left")
      .withColumn(outCol, coalesce(col(outCol), lit(-1L)))
  }

  /** Dynamic try_cast chain mirroring the serving edge's float-if-dot /
    * int / string fallback (`back_end/app/routes/feature.py:180-187`). */
  def tryCastAny(c: Column): Column =
    when(c.rlike("^-?[0-9]+\\.[0-9]+$"), c.cast("double"))
      .when(c.rlike("^-?[0-9]+$"), c.cast("long").cast("double"))
      .otherwise(lit(null))
}
