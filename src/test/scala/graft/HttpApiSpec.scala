package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.FeatureRow
import graft.serve.{FeatureStore, HttpApi}

/** The HTTP serving layer end-to-end: real sockets, real requests —
  * the reference's FastAPI route surface (`back_end/app/main.py`,
  * `app/routes/feature.py`) exercised over the wire against a parquet
  * offline store. JDK HttpClient on an ephemeral port; no mocks.
  */
class HttpApiSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def row(cc: Long, amt: Double, at: String, fraud: Int) =
    FeatureRow(cc, amt, 10, 2, 33.5, 12.0, 1, amt, "grocery", "F", 1000, ts(at), fraud)

  private lazy val storePath = {
    val p = java.nio.file.Files.createTempDirectory("graft_http_").toString + "/offline"
    Seq(
      row(1L, 10.0, "2024-01-01 10:00:00", 0),
      row(1L, 20.0, "2024-01-02 11:00:00", 0),
      row(1L, 30.0, "2024-01-03 12:00:00", 1),
      row(2L, 40.0, "2024-01-02 09:00:00", 0)
    ).toDS().toDF().write.parquet(p)
    p
  }

  private lazy val api = {
    val a = new HttpApi(spark, new FeatureStore(spark, storePath))
    a.start()
    a
  }
  private lazy val base = s"http://127.0.0.1:${api.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def countRows(json: String): Int =
    "\"cc_num\"".r.findAllIn(json).length

  test("health endpoint answers") {
    val r = get("/health")
    assert(r.statusCode() == 200 && r.body().contains("\"ok\""))
  }

  test("GET /features bulk with limit cap") {
    val all = get("/features")
    assert(all.statusCode() == 200 && countRows(all.body()) == 4)
    val two = get("/features?limit=2")
    assert(countRows(two.body()) == 2)
  }

  test("GET /features/by-ccnum/{cc} point lookup") {
    val r = get("/features/by-ccnum/1")
    assert(r.statusCode() == 200 && countRows(r.body()) == 3)
    assert(!r.body().contains("\"cc_num\":2"))
    val bad = get("/features/by-ccnum/notanumber")
    assert(bad.statusCode() == 400 && bad.body().contains("integer"))
  }

  test("GET /features/by-date inclusive day bounds") {
    val r = get("/features/by-date?start=2024-01-02&end=2024-01-03")
    assert(r.statusCode() == 200 && countRows(r.body()) == 3)
    val missing = get("/features/by-date?start=2024-01-02")
    assert(missing.statusCode() == 400 && missing.body().contains("end"))
    val malformed = get("/features/by-date?start=02-01-2024&end=2024-01-03")
    assert(malformed.statusCode() == 400)
  }

  test("GET /transactions/{cc}/recent top-k newest-first") {
    val r = get("/transactions/1/recent?k=2")
    assert(r.statusCode() == 200 && countRows(r.body()) == 2)
    // newest (30.0 on Jan 3) must appear before 20.0 (Jan 2)
    val b = r.body()
    assert(b.indexOf("30.0") >= 0 && b.indexOf("30.0") < b.indexOf("20.0"))
  }

  test("POST /features ingests JSON lines and the rows become queryable") {
    val newRow =
      """{"cc_num":3,"amt":55.5,"hour_of_day":9,"day_of_week":1,
        |"age_at_txn":40.0,"distance_to_merchant":3.2,
        |"txn_count_last_10_min":1,"avg_amt_last_1_hour":55.5,
        |"category":"travel","gender":"M","city_pop":500,
        |"feature_timestamp":"2024-02-01T08:00:00.000Z","is_fraud":0}"""
        .stripMargin.replace("\n", "")
    val r = post("/features", newRow)
    assert(r.statusCode() == 201 && r.body().contains("\"ingested\":1"))
    val back = get("/features/by-ccnum/3")
    assert(countRows(back.body()) == 1 && back.body().contains("55.5"))
  }

  test("POST /features rejects a malformed body as 400, not a poisoned table") {
    val before = countRows(get("/features").body())
    val r = post("/features", """{"cc_num": this is not json}""")
    assert(r.statusCode() == 400)
    assert(countRows(get("/features").body()) == before)
  }

  test("POST /features rejects rows with absent fields (FAILFAST alone parses them to null)") {
    val before = countRows(get("/features").body())
    val r = post("/features", """{"cc_num":99,"amt":1.0}""")
    assert(r.statusCode() == 400, s"got ${r.statusCode()}: ${r.body()}")
    assert(r.body().contains("missing"), r.body())
    assert(countRows(get("/features").body()) == before)
    assert(countRows(get("/features/by-ccnum/99").body()) == 0)
  }

  test("chunked streaming: full-cap responses on all 4 handler threads concurrently") {
    // a dedicated store with a response big enough that 4 concurrent
    // full materializations WOULD have been 4 large driver strings —
    // the chunked toLocalIterator path bounds heap at partitions, and
    // every concurrent response must still arrive complete and valid
    val bigPath = java.nio.file.Files.createTempDirectory("graft_http_big_").toString + "/offline"
    val n = 20000
    (0 until n).map(i => row(1000L + i % 50, i.toDouble, "2024-03-01 10:00:00", 0))
      .toDS().toDF().repartition(8).write.parquet(bigPath)
    val bigApi = new HttpApi(spark, new FeatureStore(spark, bigPath), maxRows = n)
    bigApi.start()
    try {
      val b = s"http://127.0.0.1:${bigApi.boundPort}"
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val futures = (1 to 4).map { _ =>
          pool.submit(new java.util.concurrent.Callable[(Int, Int, Boolean)] {
            override def call(): (Int, Int, Boolean) = {
              val r = HttpClient.newHttpClient().send(
                HttpRequest.newBuilder(URI.create(b + s"/features?limit=$n")).GET().build(),
                HttpResponse.BodyHandlers.ofString())
              val body = r.body()
              (r.statusCode(), countRows(body),
                body.startsWith("[") && body.endsWith("]"))
            }
          })
        }
        futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS)).foreach {
          case (status, rows, wellFormed) =>
            assert(status == 200 && rows == n && wellFormed,
              s"concurrent full-cap response: status=$status rows=$rows ok=$wellFormed")
        }
      } finally pool.shutdown()
    } finally bigApi.stop()
  }

  test("unknown routes 404") {
    assert(get("/features/unknown/route").statusCode() == 404)
    assert(get("/transactions/1").statusCode() == 404)
    // extra path segments under a valid prefix are unknown routes, not bad params
    assert(get("/features/by-ccnum/1/extra").statusCode() == 404)
  }

  test("GET /similar 404s when no index is mounted") {
    assert(get("/similar/3").statusCode() == 404)
  }

  test("GET /similar/{id} serves ANN neighbors from a mounted IVF-PQ index") {
    import graft.llm.Similarity
    val emb = Tables.load(spark, sf0001, "embeddings")
    val index = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCells = 4, m = 8, kCodes = 8)
    val annApi = new HttpApi(spark, new FeatureStore(spark, storePath),
      ann = Some(HttpApi.ivfPqBackend(index, emb, "vec_id", "embedding")))
    annApi.start()
    try {
      val b = s"http://127.0.0.1:${annApi.boundPort}"
      def g(p: String) = client.send(
        HttpRequest.newBuilder(URI.create(b + p)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val ok = g("/similar/3?k=2")
      assert(ok.statusCode() == 200, ok.body())
      val ids = "\"neighbor_id\":(\\d+)".r.findAllMatchIn(ok.body())
        .map(_.group(1).toLong).toSeq
      assert(ids.length == 2 && !ids.contains(3L), ok.body())
      // served scores are exact-rerank cosines, not raw ADC distances
      assert(ok.body().contains("\"rank\":1") && ok.body().contains("\"cos\""))
      // bad id syntax and unknown ids are client errors, not 500s
      assert(g("/similar/abc").statusCode() == 400)
      val missing = g("/similar/999999999")
      assert(missing.statusCode() == 400 && missing.body().contains("unknown"))
      // deeper paths under the prefix are unknown routes
      assert(g("/similar/3/extra").statusCode() == 404)
    } finally annApi.stop()
  }

  test("local ANN replica is result-identical to the Spark-job backend") {
    import graft.llm.Similarity
    val emb = Tables.load(spark, sf0001, "embeddings")
    val index = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCells = 4, m = 8, kCodes = 8)
    val sparkSide = HttpApi.ivfPqBackend(index, emb, "vec_id", "embedding")
    val localSide = HttpApi.localIvfPqBackend(index, emb, "vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Option[Double])] =
      df.orderBy("rank").collect().toSeq.map(r =>
        (r.getLong(0), r.getInt(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // GET path: several stored ids, identical (neighbor, rank, cos)
    Seq(3L, 17L, 42L, 101L).foreach { id =>
      assert(rows(localSide.similar(id, 5)) == rows(sparkSide.similar(id, 5)),
        s"GET parity broke for id $id")
    }
    // POST path: raw query vectors, incl. a stored vector's values
    val v = emb.where(org.apache.spark.sql.functions.col("vec_id") === 7L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    assert(rows(localSide.similarTo(v, 5)) == rows(sparkSide.similarTo(v, 5)))
    // unknown id errors on both
    intercept[IllegalArgumentException] { localSide.similar(999999999L, 3) }
  }

  test("local backend /similar wire format matches the Spark backend byte-for-byte") {
    import graft.llm.Similarity
    val emb = Tables.load(spark, sf0001, "embeddings")
    val index = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCells = 4, m = 8, kCodes = 8)
    val apiSpark = new HttpApi(spark, new FeatureStore(spark, storePath),
      ann = Some(HttpApi.ivfPqBackend(index, emb, "vec_id", "embedding")))
    val apiLocal = new HttpApi(spark, new FeatureStore(spark, storePath),
      ann = Some(HttpApi.localIvfPqBackend(index, emb, "vec_id", "embedding")))
    apiSpark.start(); apiLocal.start()
    try {
      def get(port: Int, p: String): String = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$p")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body()
      def post(port: Int, body: String): String = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/similar"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString()).body()
      Seq(3L, 42L).foreach { id =>
        assert(get(apiLocal.boundPort, s"/similar/$id?k=4") ==
          get(apiSpark.boundPort, s"/similar/$id?k=4"),
          s"wire-format parity broke for id $id")
      }
      val v = emb.where(org.apache.spark.sql.functions.col("vec_id") === 7L)
        .select("embedding").head().getSeq[Float](0).mkString("[", ",", "]")
      assert(post(apiLocal.boundPort, s"""{"vector":$v,"k":3}""") ==
        post(apiSpark.boundPort, s"""{"vector":$v,"k":3}"""))
    } finally { apiSpark.stop(); apiLocal.stop() }
  }

  test("POST /similar serves ANN neighbors for a raw query vector") {
    import graft.llm.Similarity
    val emb = Tables.load(spark, sf0001, "embeddings")
    val index = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCells = 4, m = 8, kCodes = 8)
    val annApi = new HttpApi(spark, new FeatureStore(spark, storePath),
      ann = Some(HttpApi.ivfPqBackend(index, emb, "vec_id", "embedding")))
    annApi.start()
    try {
      val b = s"http://127.0.0.1:${annApi.boundPort}"
      def p(path: String, body: String) = client.send(
        HttpRequest.newBuilder(URI.create(b + path))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      def g(path: String) = client.send(
        HttpRequest.newBuilder(URI.create(b + path)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      def ids(body: String): Seq[Long] =
        "\"neighbor_id\":(\\d+)".r.findAllMatchIn(body).map(_.group(1).toLong).toSeq

      // POSTing a STORED vector's values must rank that vector itself
      // first (ADC distance 0 to its own code), and the remaining
      // neighbors must equal the GET path's ranking for that id —
      // raw-vector serving and stored-id serving share one search.
      val v3 = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 3)
        .select("embedding").head().getSeq[Float](0)
      val body = v3.mkString("""{"vector":[""", ",", """],"k":3}""")
      val ok = p("/similar", body)
      assert(ok.statusCode() == 200, ok.body())
      val got = ids(ok.body())
      assert(got.length == 3 && got.head == 3L, ok.body())
      assert(got.tail == ids(g("/similar/3?k=2").body()), ok.body())

      // wrong dimension, malformed JSON, and a missing/empty vector
      // are client errors that NAME the problem, never 500s
      val short = p("/similar", """{"vector":[1.0,2.0]}""")
      assert(short.statusCode() == 400 && short.body().contains("dimensions"))
      assert(p("/similar", """{"vector":[1.0,""").statusCode() == 400)
      val missing = p("/similar", """{"k":5}""")
      assert(missing.statusCode() == 400 && missing.body().contains("vector"))
      assert(p("/similar", """{"vector":[]}""").statusCode() == 400)
    } finally annApi.stop()
  }

  test("POST /similar 404s when no index is mounted") {
    assert(post("/similar", """{"vector":[1.0]}""").statusCode() == 404)
  }

  test("concurrent requests share one SparkSession safely") {
    // the serving pool is 4 threads over ONE SparkSession — Spark jobs
    // are thread-safe to submit concurrently, but this pins it: 16
    // parallel mixed reads must all succeed with correct bodies (no
    // cross-request bleed, no 500s from shared-session state)
    import java.util.concurrent.{Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(8)
    try {
      val tasks = (0 until 16).map { i =>
        pool.submit(new java.util.concurrent.Callable[(Int, String, Int)] {
          override def call(): (Int, String, Int) = i % 3 match {
            case 0 => val r = get("/features/by-ccnum/1"); (i, r.body(), r.statusCode())
            case 1 => val r = get("/features/by-ccnum/2"); (i, r.body(), r.statusCode())
            case _ => val r = get("/health"); (i, r.body(), r.statusCode())
          }
        })
      }
      tasks.foreach { f =>
        val (i, body, status) = f.get(120, TimeUnit.SECONDS)
        assert(status == 200, s"request $i failed: $body")
        i % 3 match {
          // cc 1 has 3 rows, cc 2 has 1 — counts prove no result bleed
          case 0 => assert(countRows(body) == 3, s"request $i: $body")
          case 1 => assert(countRows(body) == 1, s"request $i: $body")
          case _ => assert(body.contains("\"ok\""))
        }
      }
    } finally pool.shutdown()
  }
}
