package graft.batch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.expr.{Functions, HaversineMiles}

/** The reference's batch feature plane re-expressed Spark-first.
  *
  * Input: raw credit-card transactions (FIXTURES.md §A — columns
  * trans_date_trans_time, cc_num, category, amt, gender, lat, long,
  * city_pop, dob, merch_lat, merch_long, is_fraud; timestamps already
  * typed, or strings parsed via [[parseRaw]]).
  *
  * Output: the 13-column feature row (FIXTURES.md §B), matching
  * `back_end/feature_store/batch_processing.py:24-48`:
  * time parts, age at transaction (365.25-day years), haversine distance
  * to merchant (miles, R=3963), and two trailing range-frame window
  * aggregates per card (10-min count, 1-h avg).
  *
  * Scale notes (100 TB): the only shuffle is the single hash partition
  * by `cc_num` that both window frames share (one Window node, one
  * exchange, one sort). Card keys are high-cardinality and roughly
  * uniform, so no salting is needed; with a skewed key domain AQE's
  * skew-split handles the stragglers. All expressions are built-in
  * Column ops — the whole stage compiles to one codegen span.
  */
object FeaturePipeline {

  /** Parse a CSV-shaped frame with string timestamps (the reference's
    * `to_timestamp` calls at batch_processing.py:24-25). */
  def parseRaw(df: DataFrame): DataFrame = {
    // `long` is a Java keyword, which Spark 4 encoders reject as a field
    // name — the engine's canonical column is `lon` (renamed on ingest).
    val renamed = if (df.columns.contains("long")) df.withColumnRenamed("long", "lon") else df
    renamed
      .withColumn("trans_date_trans_time", to_timestamp(col("trans_date_trans_time")))
      .withColumn("dob", to_timestamp(col("dob")))
  }

  def features(txns: DataFrame): DataFrame = {
    val byCard = Window.partitionBy(col("cc_num")).orderBy(col("unix_time"))
    val w10min = byCard.rangeBetween(-600, 0)
    val w1h = byCard.rangeBetween(-3600, 0)
    txns
      .withColumn("unix_time", col("trans_date_trans_time").cast("long"))
      .withColumn("hour_of_day", hour(col("trans_date_trans_time")))
      .withColumn("day_of_week", dayofweek(col("trans_date_trans_time")))
      .withColumn("age_at_txn", Functions.ageYears(col("trans_date_trans_time"), col("dob")))
      .withColumn("distance_to_merchant",
        HaversineMiles.native(col("lat"), col("lon"), col("merch_lat"), col("merch_long")))
      .withColumn("txn_count_last_10_min", count(lit(1)).over(w10min).cast("int"))
      .withColumn("avg_amt_last_1_hour",
        sum(col("amt").cast(DecimalType(18, 2))).over(w1h).cast("double") /
          count(lit(1)).over(w1h))
      .select(
        col("cc_num"), col("amt"), col("hour_of_day"), col("day_of_week"),
        col("age_at_txn"), col("distance_to_merchant"),
        col("txn_count_last_10_min"), col("avg_amt_last_1_hour"),
        col("category"), col("gender"), col("city_pop").cast("int").as("city_pop"),
        col("trans_date_trans_time").as("feature_timestamp"), col("is_fraud"))
  }

  /** Full reference job shape: scan CSV → derive → write CSV part files
    * (batch_processing.py:21,52). */
  def runCsv(spark: org.apache.spark.sql.SparkSession, in: String, out: String): Unit = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(in)
    features(parseRaw(raw))
      .write.mode("overwrite").option("header", "true").csv(out)
  }
}
