package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head vs BASELINE.md: the reference's full batch feature
  * computation took 451.29 s in pandas and ~118 s via its feature-store
  * path on ~1.3 M rows (README.md:152-166). This main generates a
  * 1.3 M-row synthetic transaction table with the reference's shape
  * (983 cards — producer.py:14; exponential amounts, normal coords)
  * and runs the COMPLETE 13-column FeaturePipeline, printing wall-clock
  * as one JSON line. */
object BenchPipeline {

  /** Synthetic transactions in the reference's shape (983 cards —
    * producer.py:14; exponential amounts, normal coords) with a
    * LEARNABLE fraud process: fraud concentrates in very-high-amount
    * transactions and in high-amount + far-from-merchant ones, plus a
    * small id-keyed label-noise floor the features cannot explain —
    * the reference's kaggle labels are likewise feature-predictable
    * but not perfectly so, which is what makes its published
    * accuracy/precision/recall/F1 a meaningful parity target
    * (README.md:152-155). A label independent of every feature (the
    * old `id % 200`) admits NO classifier better than the base rate,
    * so metric parity would be vacuous. Deterministic given n. */
  def syntheticTxns(spark: SparkSession, n: Long, parts: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, parts).select(
      $"id",
      timestamp_seconds(lit(1704067200L) + ($"id" * 37L) % 31536000L).as("trans_date_trans_time"),
      ($"id" % 983).as("cc_num"),
      element_at(array(lit("grocery"), lit("gas"), lit("food"), lit("travel"), lit("misc")),
        ($"id" % 5 + 1).cast("int")).as("category"),
      round(-log(rand(42)) * 70.0, 2).as("amt"),
      when($"id" % 2 === 0, "M").otherwise("F").as("gender"),
      (randn(1) * 5.1 + 38.5).as("lat"),
      (randn(2) * 13.7 - 90.2).as("lon"),
      ($"id" % 100000 + 100).cast("int").as("city_pop"),
      timestamp_seconds(lit(315532800L) + ($"id" % 983) * 1000000L).as("dob"),
      (randn(3) * 5.1 + 38.5).as("merch_lat"),
      (randn(4) * 13.7 - 90.2).as("merch_long"))
      .withColumn("is_fraud",
        when($"amt" > 300.0, 1)
          .when($"amt" > 220.0 && abs($"lat" - $"merch_lat") > 15.0, 1)
          .when($"id" % 667 === 0, 1)
          .otherwise(0).cast("int"))
      .drop("id")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 1300000L
    val txns = syntheticTxns(spark, n, cpus.toInt)

    val t0 = System.nanoTime()
    val out = batch.FeaturePipeline.features(txns)
    val rows = out.count()
    val featureSecs = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val tmp = java.nio.file.Files.createTempDirectory("graft_bp_").toString
    out.write.mode("overwrite").option("header", "true").csv(tmp + "/out")
    val writeSecs = (System.nanoTime() - t1) / 1e9

    // Training experiment (README.md:152-155): baseline 527.71 s,
    // feature-store path 118.38 s (3-run avg, 75% sample + train).
    val t2 = System.nanoTime()
    val (model, metrics) = ml.FraudModel.train(out.sample(0.75, 42L))
    val trainSecs = (System.nanoTime() - t2) / 1e9

    // Inference experiment (README.md:159-166): baseline 25.92 s
    // process+infer on a 100k sample; feature-store 0.97 s + 0.02 s.
    val sample = out.limit(100000).cache()
    sample.count()
    val t3 = System.nanoTime()
    ml.FraudModel.infer(model, sample).agg(sum("fraud_pred")).collect()
    val inferSecs = (System.nanoTime() - t3) / 1e9

    println(s"""{"metric":"feature_pipeline_1.3M","rows":$rows,"compute_sec":$featureSecs,"write_csv_sec":$writeSecs,"train_sec":$trainSecs,"train_auc":${metrics.rocAuc},"train_pr_auc":${metrics.prAuc},"train_acc":${metrics.accuracy},"fraud_precision":${metrics.precision},"fraud_recall":${metrics.recall},"fraud_f1":${metrics.f1},"infer_100k_sec":$inferSecs,"baseline_pandas_sec":451.29,"baseline_featurestore_sec":118.38,"baseline_infer_sec":25.92}""")
    spark.stop()
  }
}
