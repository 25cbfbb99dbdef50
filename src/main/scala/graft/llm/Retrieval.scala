package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking fusion for hybrid retrieval — combining a lexical ranking
  * (BM25) with a dense ranking (embedding cosine) is the standard
  * recipe for RAG corpus retrieval: each ranker covers the other's
  * blind spot (exact terms vs paraphrase).
  *
  * Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * fused(q, d) = Σ_lists 1 / (k₀ + rank_list(q, d)), k₀ = 60. RRF uses
  * only RANKS, so the input scores never need calibrating against each
  * other — exactly why it wins over score interpolation in practice.
  */
object Retrieval {

  /** Fuse per-query rankings from N retrievers into one top-`k` ranking.
    *
    * Each input frame must expose (`queryCol`, `idCol`, `rankCol`) with
    * rank 1 = best (extra columns are dropped). Contributions are
    * integer micro-units — `1e12 div (rrfK + rank)` — so the fused
    * score is a LONG sum: associative, order-independent, engine-exact
    * (double 1/(k₀+r) sums would re-associate under Spark's partial
    * aggregation). Ties break on `idCol` for a total order.
    *
    * Scale shape: inputs are top-k lists (query-count × k rows, NOT
    * corpus-sized), so the union + one hash aggregate + one per-query
    * window is index-output-scale work — the corpus is never touched.
    */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, idCol: String,
      rankCol: String, k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    val contrib = rankings.map { r =>
      r.select(col(queryCol), col(idCol),
        expr(s"1000000000000L div (CAST($rrfK AS BIGINT) + `$rankCol`)").as("c"))
    }.reduce(_ unionByName _)
    val fused = contrib.groupBy(col(queryCol), col(idCol))
      .agg(sum(col("c")).as("rrf_e12"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("rrf_e12").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryCol), col("rank"), col(idCol),
        col("rrf_e12"), col("n_lists"))
  }
}
