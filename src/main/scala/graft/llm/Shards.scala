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
