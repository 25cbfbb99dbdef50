package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus-preparation recipe — the composition a training-
  * data pipeline actually runs, wired from the library's own operators
  * so the whole chain stays one declarative plan per stage:
  *
  *   quality gate (Gopher rules) → exact dedup (keep-first) →
  *   benchmark decontamination (Bloom-prefiltered) →
  *   deterministic per-source mixture sampling → shard assignment.
  *
  * Scale shape: every stage is linear — the gate is codegen'd column
  * rules, dedup is one fingerprint hash-agg + semi join, decon is a
  * Bloom-guarded probe + anti join of the SMALL contaminated id set,
  * the mixture is a zero-shuffle hash filter riding the scan, and the
  * shard id is a projection. No stage materializes pairs or reshuffles
  * the corpus on anything but its own keys. Semantics pinned by the
  * per-stage oracles (`ns_gopher_filter`, `ns_dedup_exact`,
  * `ns_bloom_decontaminate`, `ns_mixture_sample`, `ns_shard_assign`)
  * AND by the composed `ns_corpus_prep` oracle end-to-end.
  */
object CorpusPrep {

  /** Returns the surviving corpus as (idCol, sourceCol, shard). Docs
    * too short to shingle pass decontamination unscreened (same
    * convention as [[Dedup.contaminationFlags]]).
    *
    * Each stage's DECISION (an id set, corpus-fraction sized, id-only)
    * is `localCheckpoint`ed before the next stage consumes it —
    * without the barrier, stage N's lineage re-evaluates every prior
    * stage's full computation (measured at the 10× probe: the Gopher
    * aggregates ran 4×, the dedup hash-agg 3×; 11.9 s → 5.3 s). The
    * corpus rows themselves are never materialized — the big side of
    * every join is the original scan plus cheap semi joins. */
  def prepare(docs: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      minOverlap: Int = 6, nShards: Int = 16): DataFrame = {
    val pass = TextStats.gopherFilter(docs, idCol, textCol)
      .filter(col("keep")).select(col("doc_id").as("__kid"))
      .localCheckpoint()
    val clean = docs.join(pass, col(idCol) === col("__kid"), "left_semi")
    val dedKeep = Dedup.exactGroups(clean, idCol, md5(col(textCol)))
      .select(col("keep_id").as("__did"))
      .localCheckpoint()
    val ded = clean.join(dedKeep, col(idCol) === col("__did"), "left_semi")
    val contaminated = Dedup.bloomDecontaminate(ded, benchmark, idCol, textCol, minOverlap)
      .filter(col("contaminated")).select(col("doc_id").as("__cid"))
      .localCheckpoint()
    val decon = ded.join(contaminated, col(idCol) === col("__cid"), "left_anti")
    Shards.mixtureSampleByRate(decon, idCol, sourceCol, rates, defaultRate)
      .select(col(idCol), col(sourceCol),
        Shards.shardId(col(idCol), nShards).as("shard"))
  }
}
