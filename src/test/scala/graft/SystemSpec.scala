package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Chunker, CorpusPrep, Similarity, Tokenize}
import graft.ml.FraudModel
import graft.schema.StreamTxn
import graft.serve.FeatureStore
import graft.stream.{OnlineStore, StreamPipeline}

/** Whole-system integration: the four reference planes chained the way
  * the reference's architecture runs them (producer → Flink → Redis;
  * Postgres; API sync; training flows):
  *
  *   stream ingest → windowed stats → stateful merge → online store
  *   → offline ingest (serving plane) → online/offline sync counts
  *   → model train/save/load → inference over served features.
  *
  * Each plane is covered in depth by its own spec; this test pins the
  * SEAMS — column names, types, and keys survive every hop without
  * adapters, which is the "a user could switch" claim in executable
  * form. */
class SystemSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def txn(id: String, cc: Long, amt: Double, at: String) =
    StreamTxn(id, cc, amt, 40.0, -74.0, 40.1, -74.1, ts(at))

  test("stream -> online store -> offline sync -> trained-model inference") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sys_").toString

    // Plane 1: streaming ingest through windows + latest-wins merge
    // into the online snapshot store.
    val mem = MemoryStream[StreamTxn](spark)
    val stats = StreamPipeline.pipeline(mem.toDS(),
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val online = new OnlineStore(spark, tmp + "/online", ttlSeconds = 86400)
    val q = online.sink(stats, tmp + "/ckpt").start()
    mem.addData(
      txn("t1", 1L, 50.0, "2024-01-01 10:00:05"),
      txn("t2", 1L, 70.0, "2024-01-01 10:00:15"),
      txn("t3", 2L, 30.0, "2024-01-01 10:00:25"),
      txn("t4", 3L, 900.0, "2024-01-01 10:00:35"))
    q.processAllAvailable()
    mem.addData(txn("zz", 9L, 1.0, "2024-01-01 12:00:00")) // advance watermark
    q.processAllAvailable(); q.stop()

    val now = ts("2024-01-01 12:30:00").getTime / 1000
    val latest = online.stats(now)
    assert(latest.count() >= 3, "online store missing cards")

    // Plane 2: serving — materialize the online stats as offline
    // feature rows (the reference's Postgres insert path), no manual
    // schema glue beyond the static demographics the stream lacks.
    val offline = new FeatureStore(spark, tmp + "/offline")
    val featureRows = latest.select(
      $"cc_num", $"amount".as("amt"),
      hour($"last_update").as("hour_of_day"),
      dayofweek($"last_update").as("day_of_week"),
      lit(33.5).as("age_at_txn"), $"distance_to_merchant",
      $"txn_count_last_10_min".cast("int").as("txn_count_last_10_min"),
      $"avg_amt_last_1_hour", lit("grocery").as("category"),
      lit("F").as("gender"), lit(1000).as("city_pop"),
      $"last_update".as("feature_timestamp"),
      when($"amount" > 500, 1).otherwise(0).as("is_fraud"))
    offline.ingest(featureRows)
    assert(offline.bulk().count() == latest.count())

    // Plane 3: sync — every offline card exists online, none skipped
    // (feature.py:199-213's synced/skipped counters).
    val (synced, skipped) = offline.sync(latest.select($"cc_num"))
    assert(synced == latest.count() && skipped == 0, s"sync=($synced,$skipped)")

    // Plane 4: ML — train on a balanced synthetic corpus, persist,
    // reload, and run thresholded inference over the SERVED features.
    val corpus = (1 to 400).map { i =>
      val fraud = i % 5 == 0
      val amt = if (fraud) 800.0 + i else 20.0 + (i % 50)
      graft.schema.FeatureRow(i.toLong, amt, i % 24, i % 7 + 1, 30.0 + i % 20,
        if (fraud) 80.0 else 5.0, i % 4 + 1, amt * 0.9, "grocery", "F",
        1000 + i, ts("2024-01-01 10:00:00"), if (fraud) 1 else 0)
    }.toDS().toDF()
    val (model, _) = FraudModel.train(corpus, useMlp = false)
    model.write.overwrite().save(tmp + "/model")
    val reloaded = FraudModel.load(tmp + "/model")
    val scored = FraudModel.infer(reloaded, offline.bulk())
    assert(scored.count() == latest.count())
    val byCard = scored.collect()
      .map(r => r.getAs[Long]("cc_num") -> r.getAs[Int]("fraud_pred")).toMap
    assert(byCard(3L) == 1, s"high-amount card not flagged: $byCard")
    assert(byCard(1L) == 0, s"normal card flagged: $byCard")
  }

  /** The LLM data plane chained end-to-end the way a training-data
    * pipeline runs it: corpus prep (gate → dedup → decontaminate →
    * mixture → shard) → chunking → tokenizer fit/apply → sequence
    * packing, plus the ANN serving side (IVF-PQ index build → persist →
    * reload → query). Each stage has its own deep spec; this pins the
    * SEAMS — ids, schemas, and token accounting survive every hop. */
  test("LLM data plane: prep -> chunk -> tokenize -> pack; index -> persist -> serve") {
    val docs = Tables.load(spark, sf0001, "documents")
    val benchmark = docs.filter($"doc_id" % 37 === 0)
    // 1. corpus prep — survivors keep their ids; shards well-formed
    val prepped = CorpusPrep.prepare(docs, benchmark, "doc_id", "text", "source",
      rates = Map("cc" -> 1.0), defaultRate = 0.5, minOverlap = 6, nShards = 8)
    val nPrep = prepped.count()
    assert(nPrep > 0 && nPrep < docs.count())
    assert(prepped.select($"shard").distinct().count() <= 8)
    // 2. chunk the survivors (ids flow through the prep join)
    val survivors = docs.join(prepped.select($"doc_id"), Seq("doc_id"), "left_semi")
    val chunks = Chunker.chunkByTokens(survivors, "doc_id", "text", 64, 48)
    assert(chunks.select($"doc_id").distinct().count() == nPrep)
    // 3. tokenizer fit on the survivors, applied to the CHUNK texts —
    // chunk token counts must tile the doc token counts exactly when
    // stride == window (repartition-free seam: n_chunk_tokens is the
    // whitespace count tokenize also sees)
    val vocab = Tokenize.fitVocab(survivors, "text", 128)
    val tokenized = Tokenize.tokenize(
      chunks.select($"doc_id", $"chunk_id", $"chunk_text"), "chunk_text", vocab)
    assert(tokenized.filter($"n_tokens" <= 0).isEmpty)
    assert(tokenized.count() == chunks.count())
    // 4. pack chunk token counts into 256-token training rows; packing
    // conserves every chunk exactly once
    val withKey = tokenized.select(
      ($"doc_id" * 10000L + $"chunk_id").as("ck"), $"n_tokens")
    val packs = graft.llm.Shards.packGreedy(withKey, "ck", "n_tokens", maxTokens = 256)
    assert(packs.count() == withKey.count())
    assert(packs.groupBy($"pack_id").agg(sum($"n_tokens").as("s"))
      .filter($"s" > 256).isEmpty)
    // 5. serving side: build the ANN index over embeddings, persist,
    // reload, and answer a query batch
    val emb = Tables.load(spark, sf0001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_sys_idx_").toString
    Similarity.writeIvfPqIndex(
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", nCells = 4), dir)
    val served = Similarity.ivfPqTopKIndexed(
      emb.filter($"vec_id" < 5), Similarity.readIvfPqIndex(spark, dir),
      "vec_id", "embedding", k = 5)
    assert(served.groupBy($"query_id").count().collect().forall(_.getLong(1) == 5L))
  }
}
