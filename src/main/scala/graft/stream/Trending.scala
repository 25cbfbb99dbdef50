package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming trending-token screen — the continuous-ingest analog of
  * the batch heavy-hitters query: which tokens are spiking in the
  * current ingest window? Corpus-ops use it to catch template floods
  * and scraper loops (a burst of one boilerplate token family) before
  * they reach dedup.
  *
  * Shape: tokens explode in the scan projection, then ONE shuffle into
  * a watermarked sliding-window count aggregate — map-side partial
  * combine bounds per-token traffic, and the watermark bounds state to
  * the open windows. Ranking is deliberately NOT in the stream: top-k
  * needs the window CLOSED (a rank over an open window is a rank over
  * partial counts), so append mode emits each window's final counts
  * once the watermark passes and [[topKPerWindow]] ranks the emitted
  * batch (foreachBatch / downstream job). `minCount` prunes the
  * singleton long-tail BEFORE it leaves the aggregate — at corpus
  * scale the tail is almost all of the output rows.
  */
object Trending {

  /** Watermarked sliding-window token counts (append-mode streaming
    * aggregate). Tokenization: lowercase whitespace split, same
    * convention as the batch token histogram. */
  def tokenWindowCounts(docs: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String, size: String, slide: String,
      minCount: Long = 1L): DataFrame =
    docs.withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol).as("ts"),
        explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(window(col("ts"), size, slide), col("token"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)

  /** Batch finisher over the emitted (closed) windows: top-k tokens per
    * window, most-frequent first, token tiebreak. */
  def topKPerWindow(counts: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("window")).orderBy(col("n").desc, col("token").asc)
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
