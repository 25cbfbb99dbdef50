package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, MultilayerPerceptronClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.{StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML plane (SURVEY.md §2.11) — the reference's pandas/sklearn/PyTorch
  * flow re-expressed with MLlib:
  *
  *   LabelEncoder         → StringIndexer      (training.py:60-62)
  *   StandardScaler       → StandardScaler     (training.py:70-71)
  *   5:1 class balancing  → sampleBy           (training.py:64-66)
  *   train_test_split     → randomSplit        (training.py:73)
  *   DeepFraudNet MLP     → MultilayerPerceptronClassifier 256-128-64
  *                          (model/training.py:33-54; no dropout in
  *                          MLlib — documented deviation) with
  *                          LogisticRegression as the fast baseline
  *   eval acc/prec/rec/F1/AUC → Multiclass+Binary evaluators
  *                          (training.py:113-116,141-144,173-192)
  *
  * Every stage is distributed: indexing is a distinct+rank fit with a
  * broadcast transform; scaling is a two-pass stats + map; training
  * iterations are tree-aggregated gradient passes — nothing collects
  * the dataset to the driver.
  */
object FraudModel {

  final case class Metrics(accuracy: Double, precision: Double,
      recall: Double, f1: Double, rocAuc: Double, prAuc: Double)

  val categoricalCols = Seq("category", "gender")
  val numericCols = Seq("amt", "hour_of_day", "day_of_week", "age_at_txn",
    "distance_to_merchant", "txn_count_last_10_min", "avg_amt_last_1_hour",
    "city_pop")

  /** 5:1 non-fraud:fraud downsample + deterministic reshuffle
    * (training.py:64-66). */
  def balance(df: DataFrame, ratio: Double = 5.0, seed: Long = 42L): DataFrame = {
    val counts = df.groupBy("is_fraud").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val frac = math.min(1.0, ratio * counts.getOrElse(1, 0L).toDouble /
      math.max(1L, counts.getOrElse(0, 0L)))
    df.stat.sampleBy("is_fraud", Map(0 -> frac, 1 -> 1.0), seed)
  }

  def pipeline(useMlp: Boolean, maxIter: Int = 50): Pipeline = {
    val indexers = categoricalCols.map { c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("keep")
    }
    val assembler = new VectorAssembler()
      .setInputCols((numericCols ++ categoricalCols.map(_ + "_idx")).toArray)
      .setOutputCol("raw_features")
    val scaler = new StandardScaler()
      .setInputCol("raw_features").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val clf =
      if (useMlp)
        new MultilayerPerceptronClassifier()
          .setLayers(Array(numericCols.size + categoricalCols.size, 256, 128, 64, 2))
          .setLabelCol("is_fraud").setFeaturesCol("features")
          .setMaxIter(maxIter).setSeed(42L)
      else
        new LogisticRegression()
          .setLabelCol("is_fraud").setFeaturesCol("features").setMaxIter(maxIter)
    new Pipeline().setStages((indexers :+ assembler :+ scaler :+ clf).toArray)
  }

  def train(features: DataFrame, useMlp: Boolean = false,
      testFraction: Double = 0.2, seed: Long = 42L): (PipelineModel, Metrics) = {
    val Array(tr, te) = balance(features, seed = seed)
      .randomSplit(Array(1 - testFraction, testFraction), seed)
    val model = pipeline(useMlp).fit(tr)
    (model, evaluate(model, te))
  }

  /** Class-WEIGHTED training — the no-downsampling alternative to
    * [[balance]]: every row is kept and each class is weighted by its
    * inverse frequency (w_c = n_total / (2·n_c), the sklearn
    * "balanced" rule), shifting the loss instead of discarding data.
    * At 100 TB this is the right default: `balance` throws away most of
    * the majority class to hit 5:1, while weighting costs one 2-row
    * class count and keeps every example. Evaluation stays unweighted
    * (the test distribution is the real one). */
  def trainWeighted(features: DataFrame, maxIter: Int = 50,
      testFraction: Double = 0.2, seed: Long = 42L): (PipelineModel, Metrics) = {
    val Array(tr, te) = features
      .randomSplit(Array(1 - testFraction, testFraction), seed)
    val counts = tr.groupBy("is_fraud").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val w0 = total / (2.0 * math.max(1L, counts.getOrElse(0, 0L)))
    val w1 = total / (2.0 * math.max(1L, counts.getOrElse(1, 0L)))
    val weighted = tr.withColumn("class_weight",
      when(col("is_fraud") === 1, w1).otherwise(w0))
    val stages = pipeline(useMlp = false, maxIter).getStages
    stages.last.asInstanceOf[LogisticRegression].setWeightCol("class_weight")
    val model = new Pipeline().setStages(stages).fit(weighted)
    (model, evaluate(model, te))
  }

  /** Binary metrics for the FRAUD class (pos_label=1), matching the
    * reference's sklearn defaults (training.py:141-144 `f1_score`,
    * `classification_report` row for label 1; :173-192 roc_auc on
    * probabilities). `metricLabel` defaults to 0.0 in MLlib, which
    * would silently report the majority (non-fraud) class.
    */
  def evaluate(model: PipelineModel, test: DataFrame): Metrics = {
    val pred = model.transform(test).cache()
    val out = metricsFrom(pred)
    pred.unpersist()
    out
  }

  /** Metrics from an already-scored frame with `is_fraud`, `prediction`
    * and `rawPrediction` columns — split out so the fraud-class
    * definitions are testable against a hand-computed confusion matrix.
    */
  def metricsFrom(pred: DataFrame): Metrics = {
    def m(name: String): Double = new MulticlassClassificationEvaluator()
      .setLabelCol("is_fraud").setPredictionCol("prediction")
      .setMetricName(name).setMetricLabel(1.0).evaluate(pred)
    def auc(name: String): Double = new BinaryClassificationEvaluator()
      .setLabelCol("is_fraud").setRawPredictionCol("rawPrediction")
      .setMetricName(name).evaluate(pred)
    Metrics(m("accuracy"), m("precisionByLabel"), m("recallByLabel"),
      m("fMeasureByLabel"), auc("areaUnderROC"), auc("areaUnderPR"))
  }

  /** Validation-based model selection — the distributed analog of the
    * reference's keep-best-checkpoint training loop (training.py:75-112
    * tracks val loss per epoch and reloads the best): fit a small
    * regularization grid under `TrainValidationSplit` and keep the
    * model with the best validation PR-AUC (the ranking metric that
    * stays informative at fraud-level class skew, unlike accuracy).
    * Candidate fits run concurrently (`setParallelism`) — model
    * selection parallelizes across the cluster instead of epochs
    * running serially on one GPU. */
  def trainSelected(features: DataFrame, regGrid: Seq[Double] = Seq(0.0, 0.01, 0.1),
      maxIter: Int = 50, testFraction: Double = 0.2,
      seed: Long = 42L): (org.apache.spark.ml.tuning.TrainValidationSplitModel, Metrics) = {
    import org.apache.spark.ml.tuning.{ParamGridBuilder, TrainValidationSplit}
    val Array(tr, te) = balance(features, seed = seed)
      .randomSplit(Array(1 - testFraction, testFraction), seed)
    val pipe = pipeline(useMlp = false, maxIter = maxIter)
    val lr = pipe.getStages.last.asInstanceOf[LogisticRegression]
    val tvs = new TrainValidationSplit()
      .setEstimator(pipe)
      .setEvaluator(new BinaryClassificationEvaluator()
        .setLabelCol("is_fraud").setMetricName("areaUnderPR"))
      .setEstimatorParamMaps(
        new ParamGridBuilder().addGrid(lr.regParam, regGrid).build())
      .setTrainRatio(0.8).setParallelism(2).setSeed(seed)
    val model = tvs.fit(tr)
    (model, metricsFrom(model.transform(te)))
  }

  /** Best-checkpoint persistence mirroring the reference's save/reload
    * (model/training.py:102-112): the fitted PipelineModel (indexers,
    * scaler stats, classifier weights) round-trips through a directory.
    */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** Batched distributed inference with the reference's 0.5 threshold
    * (training.py:114; inference_experiment.py:72-77). */
  def infer(model: PipelineModel, df: DataFrame): DataFrame =
    model.transform(df)
      .withColumn("fraud_pred", when(col("prediction") > 0.5, 1).otherwise(0))
}
