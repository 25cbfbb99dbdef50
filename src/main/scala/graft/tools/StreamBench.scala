package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.Tables
import graft.schema.StreamTxn
import graft.stream.{OnlineStore, StreamPipeline}

/** Streaming-plane throughput probe (dev tooling, not a driver
  * contract): pushes SPARK_GRAFT_STREAM_N synthetic transactions
  * (default 200k, 983-card pool — the reference's key cardinality)
  * through the full graph — sliding windows → latest-wins merge →
  * online-store sink — via MemoryStream micro-batches, and prints
  * end-to-end rows/sec. The reference's producer emits 1 txn/s
  * (producer.py:44); its Flink job never sees more load than that.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_N", "200000").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "20").toInt
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val mem = MemoryStream[StreamTxn](spark)
    val stats = StreamPipeline.pipeline(mem.toDS(),
      timeout = GroupStateTimeout.NoTimeout)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sbench_").toString
    val store = new OnlineStore(spark, tmp + "/log")
    val q = store.sink(stats, tmp + "/ckpt").start()

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def txn(i: Int) = StreamTxn(s"t$i", i % 983L, (i % 500) + 1.0,
      40.0, -74.0, 40.1, -74.1, new Timestamp(base + i.toLong * 50))

    val t0 = System.nanoTime()
    val per = n / batches
    (0 until batches).foreach { b =>
      mem.addData((b * per until (b + 1) * per).map(txn))
      q.processAllAvailable()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    val stored = spark.read.parquet(tmp + "/log").count()
    println(f"stream_bench: $n%d txns in $secs%.1f s = ${n / secs}%.0f rows/s " +
      f"($batches micro-batches, $stored%d stat rows stored)")
    spark.stop()
  }
}
