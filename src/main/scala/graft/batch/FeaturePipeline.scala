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

  private val outputCols = Seq(
    col("cc_num"), col("amt"), col("hour_of_day"), col("day_of_week"),
    col("age_at_txn"), col("distance_to_merchant"),
    col("txn_count_last_10_min"), col("avg_amt_last_1_hour"),
    col("category"), col("gender"), col("city_pop").cast("int").as("city_pop"),
    col("trans_date_trans_time").as("feature_timestamp"), col("is_fraud"))

  /** The 13-column derivation with all input columns still attached
    * (callers project). */
  private def derived(txns: DataFrame): DataFrame = {
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
  }

  def features(txns: DataFrame): DataFrame =
    derived(txns).select(outputCols: _*)

  /** [[features]] with observed data-quality metrics riding the SAME
    * job: `observe()` attaches aggregates to the plan that accumulate
    * DURING the action (no second scan — the production alternative to
    * a separate validation pass over 100 TB). Read the metrics from
    * `df.queryExecution.observedMetrics("feature_quality")` after any
    * action, or via a `QueryExecutionListener`/
    * `StreamingQueryListener` in long-running jobs. */
  def featuresObserved(txns: DataFrame): DataFrame =
    features(txns).observe("feature_quality",
      count(lit(1)).as("n_rows"),
      count(when(col("distance_to_merchant").isNull, 1)).as("null_distance"),
      count(when(col("age_at_txn") < 0, 1)).as("negative_age"),
      sum(col("is_fraud").cast("long")).as("n_fraud"),
      min(col("feature_timestamp")).as("min_ts"),
      max(col("feature_timestamp")).as("max_ts"))

  /** Incremental recompute: features for ONLY `newTxns`, reading just
    * the lookback horizon of `history` for the affected cards — the
    * operating mode that keeps a daily 100 TB corpus from being fully
    * re-derived for each increment (the reference's nightly job rereads
    * everything; batch_processing.py:21).
    *
    * Cost is O(increment + touched-cards' recent history):
    *  - `history` is filtered to [min(new ts) − `lookbackSec`, max(new
    *    ts)] — on date-partitioned storage this prunes old partitions at
    *    the listing, and the predicate pushes to parquet row groups;
    *  - then semi-joined to the increment's card set (AQE broadcasts the
    *    card set when small — no history shuffle);
    *  - the SAME window derivation runs over increment ∪ context, and
    *    only increment rows are kept. Trailing range frames only look
    *    backward, so context rows beyond the lookback cannot change the
    *    result: equality with the full-batch computation is exact
    *    (asserted in FeaturePipelineSpec).
    *
    * Contract: `history` must not already contain `newTxns` (rows would
    * double-count in the window frames). `lookbackSec` must cover the
    * widest window frame (1 h here). */
  def incrementalFeatures(newTxns: DataFrame, history: DataFrame,
      lookbackSec: Long = 3600L): DataFrame = {
    val b = newTxns
      .agg(min(col("trans_date_trans_time")), max(col("trans_date_trans_time"))).head()
    if (b.isNullAt(0)) return features(newTxns) // empty increment
    val lo = new java.sql.Timestamp(b.getTimestamp(0).getTime - lookbackSec * 1000)
    val hi = b.getTimestamp(1)
    val cards = newTxns.select(col("cc_num")).distinct()
    val context = history
      .filter(col("trans_date_trans_time").between(lit(lo), lit(hi)))
      .join(cards, Seq("cc_num"), "left_semi")
    val tagged = context.withColumn("__is_new", lit(false))
      .unionByName(newTxns.withColumn("__is_new", lit(true)))
    derived(tagged).filter(col("__is_new")).select(outputCols: _*)
  }

  /** Full reference job shape: scan CSV → derive → write CSV part files
    * (batch_processing.py:21,52). */
  def runCsv(spark: org.apache.spark.sql.SparkSession, in: String, out: String): Unit = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(in)
    features(parseRaw(raw))
      .write.mode("overwrite").option("header", "true").csv(out)
  }
}
