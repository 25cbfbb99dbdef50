package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.Similarity
import graft.serve.{FeatureStore, HttpApi}

/** Serving-path latency probe (dev tooling): stands up the real HTTP
  * layer over a parquet feature store + a mounted IVF-PQ index and
  * measures per-route request latency (p50/p95/max over `reps`
  * requests after warmup), sequential and 4-way concurrent — the
  * numbers behind PLANS.md's serving table. Point lookups ride the
  * pushed-down parquet filter; /similar rides the probe-pruned ADC
  * search + exact rerank (the `ns_ann_recall`-gated config).
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[8]")
      .appName("serve-bench").config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SERVE_REPS", "50").toInt

    // offline store: the FULL FeaturePipeline output over 200k synthetic
    // txns — the exact schema FeatureStore serves (cc_num,
    // feature_timestamp, the 13 feature columns)
    val storePath = java.nio.file.Files.createTempDirectory("graft_servebench_").toString + "/offline"
    graft.batch.FeaturePipeline.features(
        graft.BenchPipeline.syntheticTxns(spark, 200000L, 8))
      .write.mode("overwrite").parquet(storePath)
    val emb = Tables.load(spark, dir, "embeddings")
    val index = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCells = 8, m = 8, kCodes = 256)
    // production config: the driver-resident ANN replica (result-
    // identical to the Spark-job backend — parity spec-pinned); the
    // Spark-path /similar is measured separately below for contrast
    val api = new HttpApi(spark, new FeatureStore(spark, storePath),
      ann = Some(HttpApi.localIvfPqBackend(index, emb, "vec_id", "embedding")))
    api.start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    val client = HttpClient.newHttpClient()
    val someCc = spark.read.parquet(storePath)
      .select(col("cc_num")).limit(1).collect()(0).getLong(0)
    val vec = emb.select(col("embedding")).limit(1).collect()(0)
      .getSeq[Float](0).mkString("[", ",", "]")

    def fire(method: String, path: String, body: String = null): Long = {
      val b = HttpRequest.newBuilder(URI.create(base + path))
      val req = (if (method == "POST")
        b.header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body))
        else b.GET()).build()
      val t0 = System.nanoTime()
      val r = client.send(req, HttpResponse.BodyHandlers.ofString())
      require(r.statusCode() == 200, s"$path -> ${r.statusCode()}: ${r.body().take(200)}")
      (System.nanoTime() - t0) / 1000 // micros
    }

    val routes: Seq[(String, () => Long)] = Seq(
      "GET /health" -> (() => fire("GET", "/health")),
      "GET /features?limit=100" -> (() => fire("GET", "/features?limit=100")),
      s"GET /features/by-ccnum" -> (() => fire("GET", s"/features/by-ccnum/$someCc")),
      "GET /transactions/recent" -> (() => fire("GET", s"/transactions/$someCc/recent?k=5")),
      "GET /similar/{id}" -> (() => fire("GET", "/similar/3?k=5")),
      "POST /similar (raw vector)" -> (() =>
        fire("POST", "/similar", s"""{"vector":$vec,"k":5}""")))

    println(s"route, p50_ms, p95_ms, max_ms  (reps=$reps after 5 warmup)")
    routes.foreach { case (name, f) =>
      (1 to 5).foreach(_ => f()) // warmup: plan cache, JIT, broadcast reuse
      val ls = (1 to reps).map(_ => f()).sorted
      def pct(p: Double) = ls((p * (ls.length - 1)).round.toInt) / 1000.0
      println(f"$name%-28s ${pct(0.5)}%8.1f ${pct(0.95)}%8.1f ${ls.last / 1000.0}%8.1f")
    }

    // 4-way concurrent mixed load: all handler threads busy at once
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val mixed = routes.map(_._2)
    val t0 = System.nanoTime()
    val futs = (0 until 4 * reps).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = mixed(i % mixed.length)()
      })
    }
    futs.foreach(_.get())
    val total = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    println(f"concurrent mixed: ${4 * reps}%d requests on 4 threads in " +
      f"$total%.1f s = ${4 * reps / total}%.0f req/s")
    api.stop()

    // contrast: the Spark-job /similar path (per-request job scheduling
    // is its floor) — the number the local replica replaces
    val apiSpark = new HttpApi(spark, new FeatureStore(spark, storePath),
      ann = Some(HttpApi.ivfPqBackend(index, emb, "vec_id", "embedding")))
    apiSpark.start()
    val base2 = s"http://127.0.0.1:${apiSpark.boundPort}"
    def fire2(path: String): Long = {
      val req = HttpRequest.newBuilder(URI.create(base2 + path)).GET().build()
      val t0 = System.nanoTime()
      val r = client.send(req, HttpResponse.BodyHandlers.ofString())
      require(r.statusCode() == 200)
      (System.nanoTime() - t0) / 1000
    }
    (1 to 5).foreach(_ => fire2("/similar/3?k=5"))
    val ls2 = (1 to reps).map(_ => fire2("/similar/3?k=5")).sorted
    println(f"GET /similar (spark-job path)  p50 ${ls2(ls2.length / 2) / 1000.0}%.1f ms")
    apiSpark.stop()
    spark.stop()
  }
}
