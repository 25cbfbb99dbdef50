package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard preparation — the loader-prep step between a cleaned
  * corpus and the training job: assign every row a deterministic shard,
  * then write size-bounded, internally-ordered shard files a data
  * loader can stream independently.
  *
  * The shard id is a pure function of the KEY (md5-derived), not of
  * partition layout, `monotonically_increasing_id`, or RNG state — so
  * assignment is reproducible run-to-run, stable under repartitioning,
  * and portable across engines (any SQL engine with md5 computes the
  * same shards, which is what makes [[shardId]] oracle-checkable).
  */
object Shards {

  /** Deterministic shard in [0, nShards): the first four hex digits of
    * md5(key) read as a 16-bit integer, mod nShards. Uniform when
    * nShards divides 65536 (powers of two up to 2^16 — the practical
    * shard counts); bias ≤ nShards/65536 otherwise. Codegen'd column
    * ops only — the assignment adds no shuffle to the pipeline. */
  def shardId(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 65536, s"nShards in [1, 65536], got $nShards")
    val hex = md5(key.cast("string"))
    val v = (0 until 4).map { d =>
      (instr(lit("0123456789abcdef"), substring(hex, d + 1, 1)) - 1) *
        lit(1 << (4 * (3 - d)))
    }.reduce(_ + _)
    (v % nShards).cast("int")
  }

  /** Deterministic per-group mixture sampling — the data-mixing step
    * that downweights overrepresented sources: keep each row iff its
    * key's hash falls under the group's rate. The "coin flip" is the
    * same 16-bit md5 value as [[shardId]] (hash/65536 < rate), so the
    * sample is reproducible, engine-portable (oracle-checkable), and —
    * unlike rank-based quotas — needs NO shuffle and NO per-group sort:
    * it is a pure filter riding the scan, the only mixture-sampling
    * shape that works when one source has 10¹² rows. Rates quantize to
    * 1/65536 steps. Unlisted groups default to `defaultRate`. */
  def mixtureSampleByRate(df: DataFrame, keyCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val hex = md5(col(keyCol).cast("string"))
    val v = (0 until 4).map { d =>
      (instr(lit("0123456789abcdef"), substring(hex, d + 1, 1)) - 1) *
        lit(1 << (4 * (3 - d)))
    }.reduce(_ + _)
    val cut = rates.foldLeft(lit((defaultRate * 65536).toInt)) {
      case (acc, (g, r)) => when(col(groupCol) === g, (r * 65536).toInt).otherwise(acc)
    }
    df.filter(v < cut)
  }

  /** Quality-weighted (soft) sampling — keep each row with probability
    * proportional to a per-row quality score instead of a hard
    * threshold: keep iff h16 < 65536·clamp((score−lo)/(hi−lo), 0, 1).
    * The soft gate several published corpus pipelines use in place of
    * a binary filter (hard thresholds cliff-edge the distribution; a
    * ramp keeps a graded sample of mid-quality docs). Same 16-bit md5
    * coin as [[shardId]]/[[mixtureSampleByRate]]: deterministic,
    * engine-portable, zero shuffle — a pure filter riding the scan.
    * Rows at/below `lo` are always dropped, at/above `hi` always kept. */
  def softSampleByScore(df: DataFrame, keyCol: String, score: Column,
      lo: Double, hi: Double): DataFrame = {
    require(hi > lo, s"hi=$hi must exceed lo=$lo")
    val hex = md5(col(keyCol).cast("string"))
    val v = (0 until 4).map { d =>
      (instr(lit("0123456789abcdef"), substring(hex, d + 1, 1)) - 1) *
        lit(1 << (4 * (3 - d)))
    }.reduce(_ + _)
    val rate = least(lit(1.0), greatest(lit(0.0), (score - lo) / (hi - lo)))
    df.filter(v.cast("double") < rate * 65536.0)
  }

  /** Temperature-based mixture weights (the multilingual/multi-source
    * sampling rule of T5/mT5 — Raffel et al. 2020 §3.4.4, p(L) ∝ |L|^α
    * with α < 1 upweighting low-resource groups): per group, the doc
    * count and its normalized sampling weight count^alpha / Σ count^alpha.
    * The output feeds [[mixtureSampleByRate]] as rate = weight·target /
    * share. One tiny hash-aggregate (rows = #groups) + a broadcast
    * 1-row total — no window over a single partition, no second scan. */
  def sourceWeights(docs: DataFrame, groupCol: String, alpha: Double): DataFrame = {
    val counts = docs.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__w", pow(col("n_docs").cast("double"), alpha))
    counts.crossJoin(broadcast(counts.agg(sum(col("__w")).as("__tot"))))
      .withColumn("weight", round(col("__w") / col("__tot"), 6))
      .drop("__w", "__tot")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    * each row draws the "exponential race" key −ln(u)/w from a
    * deterministic uniform u and its weight w; the k SMALLEST keys are
    * a weighted sample without replacement (inclusion probability
    * proportional to weight, exactly the A-ES guarantee). u derives
    * from the first EIGHT hex digits of md5(key) — a 32-bit uniform,
    * (v + 0.5)/2³², the reproducible/engine-portable coin the other
    * samplers here use (16 bits there, 32 here: the race key needs the
    * resolution). Scale: the selection is `TakeOrderedAndProject` —
    * per-partition partial top-k then a k-row merge on the driver — so
    * NO global sort and NO shuffle of the corpus, the only weighted
    * sampler shape that holds at 10¹² rows. The race key is returned
    * in integer micro-units for exact cross-engine comparison. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, k: Int): DataFrame = {
    val hex = md5(col(keyCol).cast("string"))
    val v = (0 until 8).map { d =>
      (instr(lit("0123456789abcdef"), substring(hex, d + 1, 1)) - 1).cast("long") *
        lit(1L << (4 * (7 - d)))
    }.reduce(_ + _)
    val u = (v.cast("double") + 0.5) / 4294967296.0
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", -log(u) / col(weightCol).cast("double"))
      .orderBy(col("es_key"), col(keyCol))
      .limit(k)
      .select(col(keyCol), col(weightCol),
        round(col("es_key") * 1e6, 0).cast("long").as("es_key6"))
  }

  /** Exact per-group quotas (rank-based): keep the first `quota(g)`
    * rows of each group in deterministic md5-of-key order. Needs one
    * shuffle + per-group sort — use for bounded group counts (label
    * balancing); [[mixtureSampleByRate]] is the unbounded-scale path. */
  def quotaSample(df: DataFrame, keyCol: String, groupCol: String,
      quotas: Map[String, Int], defaultQuota: Int = Int.MaxValue): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    val cut = quotas.foldLeft(lit(defaultQuota)) {
      case (acc, (g, q)) => when(col(groupCol) === g, q).otherwise(acc)
    }
    df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= cut).drop("__rk")
  }

  /** Greedy sequence packing — fill training sequences of at most
    * `maxTokens` tokens with whole documents, the standard step between
    * a tokenized corpus and an LLM data loader. Packing is inherently
    * sequential, so it runs per partition (`mapPartitions`): rows are
    * taken in partition order and cut into a new pack when the budget
    * would overflow; an oversized single doc gets a pack of its own.
    * Pack ids are (partitionId << 32 | localSeq) — unique, and
    * deterministic iff the input's partitioning+order is (pair with
    * [[shardId]] repartition + sortWithinPartitions, as [[write]] does).
    * Per-partition packing never shuffles and wastes at most one
    * partial pack per partition — the accepted trade against a global
    * (unparallelizable) first-fit. */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: String,
      maxTokens: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(maxTokens > 0)
    df.select(col(idCol).cast("long"), col(tokensCol).cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var seq = -1L
        var used = 0L
        var pos = 0
        it.map { case (id, n) =>
          if (seq < 0 || used + n > maxTokens) { seq += 1; used = 0L; pos = 0 }
          used += n; pos += 1
          (pid << 32 | seq, pos, id, n)
        }
      }
      .toDF("pack_id", "pack_pos", "doc_id", "n_tokens")
  }

  /** Materialize [[packGreedy]] assignments into training rows: one
    * row per pack, member texts concatenated in pack order with `sep`
    * (the usual end-of-text sentinel). ONE equi-join of the assignment
    * table against the docs (both shuffle on doc id) and ONE pack-keyed
    * aggregate — the sort is per-pack inside the aggregate (array_sort
    * on (pos, text) structs), never a global order. Output:
    * (pack_id, n_docs, n_tokens, text). */
  def packTexts(packs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, sep: String = "<|endoftext|>"): DataFrame = {
    val joined = packs.join(
      docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t")),
      Seq("doc_id"))
    joined.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("pack_pos"), col("__t")))),
          s => s.getField("__t")), sep).as("text"))
  }

  /** Deterministic random negative sampling for contrastive training:
    * for each query, the `k` corpus ids ranked smallest by
    * md5(query_id | corpus_id) — uniform over the corpus, reproducible,
    * engine-portable — excluding self-pairs and the given positives
    * (the anchor's true neighbors; leaking those as negatives poisons
    * the loss). Query side broadcasts (same shape as brute top-k), the
    * per-query rank truncates partially before the exchange
    * (WindowGroupLimit), so the shuffle carries ~k rows per query, not
    * the corpus. Output: (query_id, rank, neg_id). */
  def negativeSamples(queries: DataFrame, corpus: DataFrame, idCol: String,
      k: Int, positives: DataFrame): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"))
    val c = corpus.select(col(idCol).as("neg_id"))
    val pos = positives.toDF("query_id", "neg_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__r"), col("neg_id"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neg_id"))
      .join(broadcast(pos), Seq("query_id", "neg_id"), "left_anti")
      .withColumn("__r", md5(concat_ws("|", col("query_id"), col("neg_id"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neg_id"))
  }

  /** Leakage-safe train/val/test split: the assignment hashes the
    * GROUP key (dedup cluster, author, domain …), not the row, so every
    * member of a group lands in the SAME split — row-hash splits leak
    * near-duplicates of training docs into eval. Same md5 16-bit coin
    * as [[shardId]]; fractions quantize to 1/65536. Zero shuffle — a
    * projection riding the scan. Output: input columns + `split`. */
  def groupAwareSplit(df: DataFrame, groupCol: String,
      trainFrac: Double, valFrac: Double): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      s"bad fractions: train=$trainFrac val=$valFrac")
    val hex = md5(col(groupCol).cast("string"))
    val v = (0 until 4).map { d =>
      (instr(lit("0123456789abcdef"), substring(hex, d + 1, 1)) - 1) *
        lit(1 << (4 * (3 - d)))
    }.reduce(_ + _)
    df.withColumn("split",
      when(v < (trainFrac * 65536).toInt, "train")
        .when(v < ((trainFrac + valFrac) * 65536).toInt, "val")
        .otherwise("test"))
  }

  /** Write `df` as training shards under `path`: one directory per
    * shard (`shard=N/`), each holding files of at most
    * `maxRecordsPerFile` rows, rows ordered by `orderCols` inside each
    * file. `repartition(nShards, shard)` lines partitions up with shard
    * dirs so each shard is written by one task (no tiny-file spray);
    * at 100 TB raise nShards, not file size — shards stay
    * executor-memory-bounded and loaders stream file-by-file. */
  def write(df: DataFrame, path: String, keyCol: String, nShards: Int,
      maxRecordsPerFile: Long, orderCols: Seq[String]): Unit = {
    val sharded = df.withColumn("shard", shardId(col(keyCol), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard") +: orderCols.map(col): _*)
    sharded.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(path)
  }
}
