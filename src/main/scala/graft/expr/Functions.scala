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
    * Set-based closed form, NOT a sequential fold — and SAFE for keys of
    * any length. The naive trick (scale term i by (1−α)^{−rn_i}, take
    * two running sums, let the common factor cancel) overflows double at
    * rn ≈ 700/−ln(1−α) (≈ 6,600 rows/key at α=0.1). So the rows of each
    * key are cut into EPOCHS of L rows, sized so the within-epoch
    * exponent never exceeds ~100 nats (L = ⌈100/−ln(1−α)⌉; rescaled
    * terms stay ≤ e¹⁰⁰ ≈ 2.7e43, far from the e⁷⁰⁹ double ceiling).
    * With r the row offset inside its epoch and T_e the epoch-e totals,
    *   ewma_t = (S_e(t) + d^L·T_{e−1}) / (S′_e(t) + d^L·T′_{e−1})
    * where S/S′ are within-epoch running sums of x·d^{−r} and d^{−r}
    * (the common d^{r_t} cancels as before). Carries from ≥2 epochs back
    * are ≤ L·d^{L+1} ≤ L·e⁻¹⁰⁰ relative — below the 2⁻⁵³ double ulp by
    * construction, so truncating to one epoch of carry is exact at
    * double precision for every α and every key length.
    *
    * Plan shape: one hash shuffle on the key; the three window specs
    * ((key), (key, epoch), and (key RANGE epoch−1)) all hash-cluster by
    * the key prefix, so EnsureRequirements adds only local sorts — no
    * second Exchange. The previous-epoch totals come from a RANGE
    * (−1,−1) frame over the epoch number, not a join. */
  def ewma(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
      valueCol: String, alpha: Double, outCol: String): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    import org.apache.spark.sql.expressions.Window
    val decay = 1.0 - alpha
    val epochLen = math.max(1L, math.ceil(100.0 / -math.log(decay)).toLong)
    val carry = math.pow(decay, epochLen.toDouble) // ∈ [e^-100-ish, decay]
    val pCols = partitionCols.map(col)
    val wOrd = Window.partitionBy(pCols: _*).orderBy(orderCols.map(col): _*)
    val wEpochRun = Window.partitionBy(pCols :+ col("__ep"): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrevEpoch = Window.partitionBy(pCols: _*).orderBy(col("__ep"))
      .rangeBetween(-1, -1)
    df.withColumn("__rn0", row_number().over(wOrd).cast("long") - 1L)
      .withColumn("__ep", expr(s"__rn0 div ${epochLen}L"))
      .withColumn("__inv", pow(lit(1.0 / decay), (col("__rn0") % epochLen).cast("double")))
      .withColumn("__tn", col(valueCol) * col("__inv"))
      .withColumn(outCol,
        (sum(col("__tn")).over(wEpochRun) +
          lit(carry) * coalesce(sum(col("__tn")).over(wPrevEpoch), lit(0.0))) /
        (sum(col("__inv")).over(wEpochRun) +
          lit(carry) * coalesce(sum(col("__inv")).over(wPrevEpoch), lit(0.0))))
      .drop("__rn0", "__ep", "__inv", "__tn")
  }
}
