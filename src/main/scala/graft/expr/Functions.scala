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

  /** Exponentially weighted moving average per key (pandas
    * `ewm(alpha).mean()` with adjust=True — the smoothing transform the
    * reference's pandas plane reaches for): for row t,
    * ewma_t = Σ_{i≤t} (1−α)^{t−i} x_i / Σ_{i≤t} (1−α)^{t−i}.
    *
    * Set-based closed form, NOT a sequential fold: with rn the row
    * number in the frame, both numerator and denominator are running
    * sums of terms scaled by (1−α)^{−rn}, and the common (1−α)^{rn_t}
    * factor cancels in the ratio — so the whole transform is two
    * rows-frame window sums over one per-key sort, the same single
    * shuffle every other window feature pays. Engine-portable (any SQL
    * with POW + running sums reproduces it bit-for-bit: running frames
    * accumulate in frame order on every engine). The 1/(1−α)^rn terms
    * grow ~e^{0.1·rn}; fine in double for series up to ~300k rows per
    * key at α=0.1 — chunk longer series by epoch if that ever binds. */
  def ewma(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
      valueCol: String, alpha: Double, outCol: String): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val decay = 1.0 - alpha
    df.withColumn("__rn", row_number().over(wOrd))
      .withColumn("__inv", pow(lit(1.0 / decay), col("__rn")))
      .withColumn(outCol,
        sum(col(valueCol) * col("__inv")).over(wRun) / sum(col("__inv")).over(wRun))
      .drop("__rn", "__inv")
  }
}
