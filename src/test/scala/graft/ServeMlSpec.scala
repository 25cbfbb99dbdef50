package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.FraudModel
import graft.schema.FeatureRow
import graft.serve.FeatureStore

/** Serving facade + ML plane. */
class ServeMlSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def row(cc: Long, amt: Double, at: String, fraud: Int) =
    FeatureRow(cc, amt, 10, 2, 33.5, 12.0, 1, amt, "grocery", "F", 1000, ts(at), fraud)

  private lazy val storePath = {
    val p = java.nio.file.Files.createTempDirectory("graft_fs_").toString + "/offline"
    Seq(
      row(1L, 10.0, "2024-01-01 10:00:00", 0),
      row(1L, 20.0, "2024-01-02 11:00:00", 0),
      row(1L, 30.0, "2024-01-03 12:00:00", 1),
      row(2L, 40.0, "2024-01-02 09:00:00", 0)
    ).toDS().toDF().write.parquet(p)
    p
  }

  test("point lookup, date range, bulk cap, top-k, latest") {
    val fs = new FeatureStore(spark, storePath)
    assert(fs.byCcNum(1L).count() == 3)
    assert(fs.byDateRange("2024-01-02", "2024-01-03").count() == 3)
    assert(fs.bulk(2).count() == 2)
    val top = fs.topKRecent(1L, 2).collect().map(_.getAs[Double]("amt"))
    assert(top.toSeq == Seq(30.0, 20.0))
    val latest = fs.latestPerCard().collect()
      .map(r => r.getAs[Long]("cc_num") -> r.getAs[Double]("amt")).toMap
    assert(latest == Map(1L -> 30.0, 2L -> 40.0))
  }

  test("sync = semi/anti join counts; ingest appends") {
    val fs = new FeatureStore(spark, storePath)
    val onlineKeys = Seq(1L).toDF("cc_num")
    val (synced, skipped) = fs.sync(onlineKeys)
    assert(synced == 3 && skipped == 1)
    val p2 = java.nio.file.Files.createTempDirectory("graft_fs2_").toString + "/offline"
    val fs2 = new FeatureStore(spark, p2)
    fs2.ingest(Seq(row(9L, 1.0, "2024-02-01 00:00:00", 0)).toDS().toDF())
    fs2.ingest(Seq(row(9L, 2.0, "2024-02-02 00:00:00", 0)).toDS().toDF())
    assert(fs2.offline.count() == 2)
  }

  test("clear truncates; bulkJson exports records; foreachBatched chunks") {
    val p = java.nio.file.Files.createTempDirectory("graft_fs3_").toString + "/offline"
    val fs = new FeatureStore(spark, p)
    fs.ingest(Seq(row(1L, 1.0, "2024-01-01 00:00:00", 0),
      row(2L, 2.0, "2024-01-02 00:00:00", 0)).toDS().toDF())
    val json = fs.bulkJson().collect()
    assert(json.length == 2 && json.head.contains("\"cc_num\""))
    val counts = new java.util.concurrent.atomic.AtomicInteger(0)
    val acc = spark.sparkContext.longAccumulator("batches")
    fs.foreachBatched(fs.offline, batchSize = 1) { g => acc.add(g.size) }
    assert(acc.value == 2)
    fs.clear()
    assert(fs.offline.count() == 0)
  }

  test("JDBC backend (embedded Derby) round-trips the serving facade") {
    import graft.serve.JdbcBackend
    System.setProperty("derby.stream.error.file",
      java.nio.file.Files.createTempDirectory("graft_derbylog_").toString + "/derby.log")
    val db = java.nio.file.Files.createTempDirectory("graft_derby_").toString + "/db"
    val fs = new FeatureStore(spark, JdbcBackend(s"jdbc:derby:$db;create=true", "features"))
    fs.ingest(Seq(
      row(1L, 10.0, "2024-01-01 10:00:00", 0),
      row(1L, 30.0, "2024-01-03 12:00:00", 1),
      row(2L, 40.0, "2024-01-02 09:00:00", 0)).toDS().toDF())
    assert(fs.offline.count() == 3)
    assert(fs.byCcNum(1L).count() == 2)
    assert(fs.byDateRange("2024-01-02", "2024-01-03").count() == 2)
    val (synced, skipped) = fs.sync(Seq(1L).toDF("cc_num"))
    assert(synced == 2 && skipped == 1)
    // range-partitioned parallel read sees the same rows
    val par = JdbcBackend(s"jdbc:derby:$db", "features",
      partitionColumn = Some("cc_num"), numPartitions = 4)
    assert(par.read(spark).count() == 3)
    // Spark clamps slices to the key span (max-min=1 here) — just prove
    // the range-partitioned path executes, not a specific slice count
    assert(par.read(spark).rdd.getNumPartitions >= 1)
    fs.clear()
    assert(fs.offline.count() == 0)
    fs.ingest(Seq(row(3L, 5.0, "2024-02-01 00:00:00", 0)).toDS().toDF())
    assert(fs.offline.count() == 1)
  }

  test("MLP classifier path trains and predicts") {
    val data = spark.range(400).select(
      ($"id" % 10).as("cc_num"),
      when($"id" % 2 === 0, lit(400.0) + rand(7) * 100).otherwise(rand(8) * 50).as("amt"),
      lit(10).as("hour_of_day"), lit(2).as("day_of_week"), lit(30.0).as("age_at_txn"),
      lit(1.0).as("distance_to_merchant"), lit(1).as("txn_count_last_10_min"),
      lit(10.0).as("avg_amt_last_1_hour"), lit("grocery").as("category"),
      lit("F").as("gender"), lit(1000).as("city_pop"),
      when($"id" % 2 === 0, 1).otherwise(0).as("is_fraud"))
    val model = FraudModel.pipeline(useMlp = true, maxIter = 100).fit(data)
    val pred = model.transform(data)
    assert(pred.columns.contains("prediction"))
    val acc2 = pred.filter($"prediction" === $"is_fraud").count().toDouble / 400
    assert(acc2 > 0.7, s"MLP accuracy $acc2")
  }

  test("fraud model learns a separable signal (AUC > 0.8)") {
    // fraud iff amt high and distance large — linearly separable-ish
    val n = 2000
    val data = spark.range(n).select(
      ($"id" % 100).as("cc_num"),
      when($"id" % 10 === 0, rand(1) * 500 + 300).otherwise(rand(2) * 80).as("amt"),
      ($"id" % 24).cast("int").as("hour_of_day"),
      ($"id" % 7 + 1).cast("int").as("day_of_week"),
      (rand(3) * 50 + 20).as("age_at_txn"),
      when($"id" % 10 === 0, rand(4) * 900 + 100).otherwise(rand(5) * 30).as("distance_to_merchant"),
      lit(1).as("txn_count_last_10_min"),
      (rand(6) * 100).as("avg_amt_last_1_hour"),
      when($"id" % 3 === 0, "grocery").when($"id" % 3 === 1, "gas").otherwise("travel").as("category"),
      when($"id" % 2 === 0, "F").otherwise("M").as("gender"),
      lit(5000).as("city_pop"),
      when($"id" % 10 === 0, 1).otherwise(0).as("is_fraud"))
    val (_, metrics) = FraudModel.train(data)
    assert(metrics.rocAuc > 0.8, s"AUC ${metrics.rocAuc}")
    assert(metrics.accuracy > 0.8, s"acc ${metrics.accuracy}")
    // class-weighted path (no downsampling) learns the same signal
    val (_, wMetrics) = FraudModel.trainWeighted(data)
    assert(wMetrics.rocAuc > 0.8, s"weighted AUC ${wMetrics.rocAuc}")
    assert(wMetrics.recall > 0.5, s"weighted recall ${wMetrics.recall}")
  }

  test("model selection picks the best validation PR-AUC over the reg grid") {
    val n = 2000
    val data = spark.range(n).select(
      ($"id" % 100).as("cc_num"),
      when($"id" % 10 === 0, rand(1) * 500 + 300).otherwise(rand(2) * 80).as("amt"),
      ($"id" % 24).cast("int").as("hour_of_day"),
      ($"id" % 7 + 1).cast("int").as("day_of_week"),
      (rand(3) * 50 + 20).as("age_at_txn"),
      when($"id" % 10 === 0, rand(4) * 900 + 100).otherwise(rand(5) * 30).as("distance_to_merchant"),
      lit(1).as("txn_count_last_10_min"),
      (rand(6) * 100).as("avg_amt_last_1_hour"),
      when($"id" % 3 === 0, "grocery").when($"id" % 3 === 1, "gas").otherwise("travel").as("category"),
      when($"id" % 2 === 0, "F").otherwise("M").as("gender"),
      lit(5000).as("city_pop"),
      when($"id" % 10 === 0, 1).otherwise(0).as("is_fraud"))
    val (model, metrics) = FraudModel.trainSelected(data,
      regGrid = Seq(0.0, 10.0), maxIter = 20)
    // one validation metric per grid point; the kept model is the argmax
    assert(model.validationMetrics.length == 2)
    assert(model.validationMetrics.max ==
      model.validationMetrics(model.validationMetrics.indexOf(model.validationMetrics.max)))
    // reg=10 cripples LR on this signal; selection must not pick it
    val bestReg = model.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
      .stages.last.asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
      .getRegParam
    assert(bestReg == 0.0, s"selection picked regParam=$bestReg")
    assert(metrics.rocAuc > 0.8, s"AUC ${metrics.rocAuc}")
  }

  test("balancing caps the non-fraud:fraud ratio near 5:1") {
    val df = spark.range(10000).select(
      when($"id" % 100 === 0, 1).otherwise(0).as("is_fraud"), $"id")
    val b = FraudModel.balance(df).groupBy("is_fraud").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ratio = b(0).toDouble / b(1)
    assert(ratio > 3.0 && ratio < 7.0, s"ratio $ratio")
  }

  test("metrics describe the FRAUD class: hand-computed confusion matrix") {
    import org.apache.spark.ml.linalg.Vectors
    // TP=3 FP=1 FN=2 TN=4  →  prec=3/4  rec=3/5  f1=2pr/(p+r)=2/3  acc=7/10
    val rows = Seq(
      (1, 1.0, 0.9), (1, 1.0, 0.8), (1, 1.0, 0.7),          // TP
      (0, 1.0, 0.6),                                        // FP
      (1, 0.0, 0.4), (1, 0.0, 0.3),                         // FN
      (0, 0.0, 0.2), (0, 0.0, 0.1), (0, 0.0, 0.15), (0, 0.0, 0.05)) // TN
    val pred = rows.toDF("is_fraud", "prediction", "p")
      .withColumn("rawPrediction",
        udf((p: Double) => Vectors.dense(1 - p, p)).apply($"p"))
    val m = FraudModel.metricsFrom(pred)
    assert(math.abs(m.precision - 0.75) < 1e-9, s"precision ${m.precision}")
    assert(math.abs(m.recall - 0.6) < 1e-9, s"recall ${m.recall}")
    assert(math.abs(m.f1 - 2.0 / 3.0) < 1e-9, s"f1 ${m.f1}")
    assert(math.abs(m.accuracy - 0.7) < 1e-9, s"accuracy ${m.accuracy}")
    assert(m.rocAuc > 0.9 && m.prAuc > 0.8, s"auc ${m.rocAuc}/${m.prAuc}")
  }

  test("model save/load round-trip yields identical predictions") {
    val data = spark.range(300).select(
      ($"id" % 10).as("cc_num"),
      when($"id" % 2 === 0, lit(400.0) + rand(7) * 100).otherwise(rand(8) * 50).as("amt"),
      lit(10).as("hour_of_day"), lit(2).as("day_of_week"), lit(30.0).as("age_at_txn"),
      lit(1.0).as("distance_to_merchant"), lit(1).as("txn_count_last_10_min"),
      lit(10.0).as("avg_amt_last_1_hour"), lit("grocery").as("category"),
      lit("F").as("gender"), lit(1000).as("city_pop"),
      when($"id" % 2 === 0, 1).otherwise(0).as("is_fraud"))
    val (model, _) = FraudModel.train(data)
    val dir = java.nio.file.Files.createTempDirectory("graft_model_").toString + "/m"
    FraudModel.save(model, dir)
    val reloaded = FraudModel.load(dir)
    val a = FraudModel.infer(model, data).select("cc_num", "amt", "fraud_pred")
    val b = FraudModel.infer(reloaded, data).select("cc_num", "amt", "fraud_pred")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("inference applies the 0.5 threshold column") {
    val feats = Seq(row(1L, 500.0, "2024-01-01 00:00:00", 1),
      row(2L, 5.0, "2024-01-02 00:00:00", 0)).toDS().toDF()
    val (model, _) = FraudModel.train(
      spark.range(200).select(
        ($"id" % 10).as("cc_num"),
        when($"id" % 2 === 0, lit(400.0) + rand(7) * 100).otherwise(rand(8) * 50).as("amt"),
        lit(10).as("hour_of_day"), lit(2).as("day_of_week"), lit(30.0).as("age_at_txn"),
        lit(1.0).as("distance_to_merchant"), lit(1).as("txn_count_last_10_min"),
        lit(10.0).as("avg_amt_last_1_hour"), lit("grocery").as("category"),
        lit("F").as("gender"), lit(1000).as("city_pop"),
        when($"id" % 2 === 0, 1).otherwise(0).as("is_fraud")))
    val out = FraudModel.infer(model, feats)
    assert(out.columns.contains("fraud_pred"))
    assert(out.select("fraud_pred").as[Int].collect().forall(v => v == 0 || v == 1))
  }

  test("metrics parity envelope vs the reference's published numbers (BASELINE.md)") {
    // The reference publishes acc/prec/rec/F1 = 0.9714/0.9666/0.8564/
    // 0.9080 for its feature-store-path model (README.md:152-155).
    // Same pipeline shape here: BenchPipeline's learnable synthetic
    // transactions -> the full 13-column FeaturePipeline -> balanced
    // train -> fraud-class metrics. Measured at the 1.3M bench scale:
    // 0.973/0.918/0.872/0.895 (PLANS.md r7 table); this spec re-runs
    // the identical flow at 200k rows and floors the envelope so a
    // pipeline/metric regression (label leak, wrong metricLabel,
    // broken scaling) fails by name. Deterministic seeds throughout.
    val txns = BenchPipeline.syntheticTxns(spark, 200000L, 4)
    val feats = graft.batch.FeaturePipeline.features(txns)
    val (_, m) = FraudModel.train(feats)
    assert(m.accuracy >= 0.94, s"accuracy ${m.accuracy}")
    assert(m.precision >= 0.85, s"fraud precision ${m.precision}")
    assert(m.recall >= 0.80, s"fraud recall ${m.recall}")
    assert(m.f1 >= 0.84, s"fraud F1 ${m.f1}")
  }
}
