package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the retrieval/RAG prep step that
  * turns documents into embedder-sized passages, and the long-document
  * split of a training-data pipeline (context-window packing's upstream
  * twin).
  *
  * 100 TB shape: everything is a per-row array projection — tokenize,
  * window-start sequence, posexplode, slice — so the operator is a ZERO
  * SHUFFLE map pass that inherits the scan's partitioning; output rows
  * only fan out by ~len/stride per doc. No UDF: `split`/`sequence`/
  * `posexplode`/`slice`/`array_join` are all codegen'd builtins.
  */
object Chunker {

  /** Split `textCol` into whitespace tokens and emit one row per
    * (window-start multiple of `stride`) chunk of up to `window`
    * tokens. Starts run until the first window that REACHES the end of
    * the doc — every token is covered, the final chunk may be short,
    * and no fully-redundant tail chunks are emitted (a start whose
    * predecessor already covered the end adds no content). Emits
    * (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text).
    * `stride < window` ⇒ consecutive chunks overlap by
    * `window − stride` tokens. */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1,
      s"window/stride must be >= 1: $window/$stride")
    // Empty/whitespace-only docs have ZERO tokens and emit NO chunks —
    // without the filter, split(trim(''), "\\s+") returns [""] and a
    // phantom 1-token empty chunk would flow into embedding/packing.
    val toks = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .withColumn("__n", size(col("__toks")))
    toks
      .select(col(idCol), col("__toks"), col("__n"),
        // last start = smallest stride multiple s with s + window >= n,
        // i.e. all multiples <= n - window + stride - 1 (floored at 0;
        // capped at n-1 so stride > window gap-sampling never emits
        // empty past-the-end chunks)
        posexplode(sequence(lit(0),
          least(col("__n") - 1,
            greatest(lit(0), col("__n") - (window - stride) - 1)), lit(stride)))
          .as(Seq("chunk_id", "chunk_start")))
      .select(col(idCol), col("chunk_id"), col("chunk_start"),
        least(lit(window), col("__n") - col("chunk_start")).as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("chunk_start") + 1, lit(window)), " ")
          .as("chunk_text"))
  }
}
