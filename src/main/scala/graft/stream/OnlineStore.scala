package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.schema.CardStats

/** The online snapshot store replacing the reference's Redis key layout
  * (`redis_writer.py:17-44`; FIXTURES.md §D):
  *
  *   txn:{cc}:data:{id} hash → `txn_log` rows (append, TTL-filtered)
  *   txn:{cc}:stats hash     → latest row per key of `txn_log`
  *   txn:{cc}:timeline zset  → ORDER BY last_update DESC per key
  *
  * Implemented as a parquet append table maintained by `foreachBatch`
  * — idempotent upserts keyed by txn_id (exactly-once on top of
  * at-least-once delivery, unlike the reference's side-effecting map),
  * TTL as a retention predicate at read time, periodic compaction as
  * keep-latest-per-key rewrite.
  *
  * Scale notes: the log is partitioned by ingest date so the TTL
  * predicate prunes partitions; "latest per key" is one hash shuffle
  * (or none, if the sink bucketed by cc_num).
  */
class OnlineStore(spark: SparkSession, path: String, ttlSeconds: Long = 86400L) {
  import spark.implicits._

  /** foreachBatch sink body (S7): idempotent append of the micro-batch. */
  def upsertBatch(batch: Dataset[CardStats], batchId: Long): Unit =
    batch.toDF()
      .withColumn("batch_id", lit(batchId))
      .withColumn("ingest_date", to_date(col("last_update")))
      .write.mode("append").partitionBy("ingest_date").parquet(path)

  /** Attach as the sink of a streaming Dataset[CardStats]. */
  def sink(stats: Dataset[CardStats], checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[CardStats] =
    stats.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[CardStats], id: Long) => upsertBatch(batch, id) }

  private def log: DataFrame = spark.read.parquet(path)

  /** TTL retention predicate (redis EXPIRE 86400, redis_writer.py:25,38). */
  def retained(asOfEpochSec: Long): DataFrame =
    log.filter(col("last_update").cast("long") >= asOfEpochSec - ttlSeconds)
      .dropDuplicates("txn_id") // idempotency: replayed micro-batches collapse

  /** `txn:{cc}:stats` — latest stats row per card. */
  def stats(asOfEpochSec: Long): DataFrame = {
    val w = Window.partitionBy(col("cc_num"))
      .orderBy(col("last_update").desc, col("txn_id").desc)
    retained(asOfEpochSec)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "batch_id", "ingest_date")
  }

  /** `txn:{cc}:timeline` top-k — k most recent per card (feature.py:164). */
  def topKRecent(cc: Long, k: Int, asOfEpochSec: Long): DataFrame =
    retained(asOfEpochSec)
      .filter(col("cc_num") === cc)
      .orderBy(col("last_update").desc, col("txn_id").desc)
      .limit(k)
      .drop("batch_id", "ingest_date")

  /** Compaction: rewrite the log keeping only retained rows (bounds
    * storage growth the way Redis TTL bounds keyspace). */
  def compact(asOfEpochSec: Long, tmpSuffix: String = ".compact"): Unit = {
    val keep = retained(asOfEpochSec).cache()
    keep.count()
    keep.write.mode("overwrite").parquet(path + tmpSuffix)
    spark.read.parquet(path + tmpSuffix)
      .write.mode("overwrite").partitionBy("ingest_date").parquet(path)
    keep.unpersist()
  }
}
