package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.Bloom
import graft.llm.Dedup

/** Streaming decontamination — the continuous-ingest form of the batch
  * [[graft.llm.Dedup.contaminationFlags]]/[[graft.llm.Dedup.bloomDecontaminate]]
  * pair: benchmark eval sets must never leak into a training corpus, and
  * a pipeline that ingests continuously needs the screen ON the stream,
  * not in a nightly sweep after contaminated docs already shipped.
  *
  * Both screens are STATELESS projections (no watermark, no state
  * store): the benchmark artifact is built once in batch — a Bloom
  * filter or the distinct shingle set — and rides the streaming plan as
  * a broadcast/literal, exactly like the batch-fit/stream-apply scaler
  * split ([[graft.llm.Similarity.fitMoments]]/`standardizeWith`). That
  * makes them trivially scalable: per-row cost only, any input rate,
  * zero reprocessing on restart.
  */
object StreamScreen {

  /** Word-3-gram shingles as a per-row column, empty for texts under 3
    * tokens (the guard [[Dedup.shingleRowsRaw]] applies as a filter —
    * here the row must survive, unscreened). */
  private def shinglesOrEmpty(text: Column): Column = {
    val t = split(text, " ")
    when(size(t) >= 3, Dedup.shingles3(text))
      .otherwise(array().cast("array<string>"))
  }

  /** Approximate screen: `n_hits` = number of the doc's distinct
    * shingles that MIGHT be in the benchmark bloom; `contaminated` when
    * ≥ `minOverlap`. No false negatives — a clean verdict is exact;
    * positives carry the filter's fpp and (as in batch) are confirmed
    * by the exact downstream join before anything is dropped. The
    * bloom is a plan literal probed inside codegen — use this form when
    * the benchmark shingle set outgrows a broadcast. */
  def bloomScreen(stream: DataFrame, textCol: String, bloom: Array[Byte],
      minOverlap: Int): DataFrame =
    stream
      .withColumn("n_hits",
        size(filter(shinglesOrEmpty(col(textCol)),
          sh => Bloom.mightContain(bloom, sh))))
      .withColumn("contaminated", col("n_hits") >= minOverlap)

  /** Exact screen: the benchmark's distinct shingle set (built by one
    * batch aggregate over the SMALL side) broadcast as a hash set,
    * probed per row. Bit-identical to the batch
    * [[Dedup.contaminationFlags]] verdicts — LlmSpec/StreamSpec pin the
    * parity. Use while the benchmark fits a broadcast (tens of
    * millions of shingles); past that, [[bloomScreen]] + batch
    * confirm. */
  def exactScreen(stream: DataFrame, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      minOverlap: Int): DataFrame = {
    val spark = stream.sparkSession
    val shingleSet = Dedup.shingleRows(benchmark, benchIdCol, benchTextCol)
      .select(col("sh")).distinct()
      .collect().map(_.getString(0)).toSet
    val bc = spark.sparkContext.broadcast(shingleSet)
    val hits = udf { (shs: Seq[String]) =>
      val s = bc.value
      shs.count(s.contains)
    }
    stream
      .withColumn("n_hits", hits(shinglesOrEmpty(col(textCol))))
      .withColumn("contaminated", col("n_hits") >= minOverlap)
  }
}
