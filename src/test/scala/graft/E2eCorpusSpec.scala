package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Dedup, TextStats}
import graft.operators.{MaterializedAgg, Snapshots}

/** End-to-end incremental corpus pipeline — the layers built across
  * rounds composing as a DAILY INGEST would run them at 100 TB:
  *
  *   raw docs → snapshot commitBatch (exactly-once landing)
  *            → readChanges (O(batch) — history never rescanned)
  *            → quality screen (columnar, shuffle-free)
  *            → incrementalNearDups vs the ACCEPTED corpus
  *              (increment×corpus bucket joins — corpus² never again)
  *            → accepted commitBatch into the clean table
  *            → MaterializedAgg.merge of per-source stats (O(delta))
  *
  * The invariant that makes incremental processing trustworthy: after
  * any number of batches, the clean table and the stats MV must equal
  * the ONE-SHOT pipeline over everything ingested so far. */
class E2eCorpusSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val keys = Seq("lang")
  private val measures = Seq(
    MaterializedAgg.countRows("n_docs"),
    MaterializedAgg.sumOf(TextStats.regexTokenCount(col("text")), "n_tokens"))

  private def screen(df: DataFrame): DataFrame =
    df.filter(TextStats.regexTokenCount($"text") >= 5 &&
      TextStats.qualityScore($"text") > 0.3)

  // NOTE: the incremental policy is ARRIVAL-order keep-first (a doc is
  // judged against the corpus accepted before it); a one-shot batch run
  // is GLOBAL-id keep-first. On transitive near-dup chains the two
  // legitimately diverge, so the test asserts the invariants the
  // incremental contract actually promises, not set-equality with a
  // differently-policied batch.

  test("incremental snapshot ingest: dup-free corpus, full accounting, O(delta) MV") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"lang", $"text")
    // three "days" of ingest; day 2 re-sends some of day 1 (late data /
    // producer retry) — the dedup layer must keep exactly one
    val days = Seq(
      docs.filter($"doc_id" % 3 === 0),
      docs.filter($"doc_id" % 3 === 1)
        .unionAll(docs.filter($"doc_id" % 3 === 0 && $"doc_id" % 5 === 0)
          .withColumn("doc_id", $"doc_id" + 1000000L)), // same text, new id
      docs.filter($"doc_id" % 3 === 2))

    val landing = java.nio.file.Files.createTempDirectory("graft_e2e_raw_").toString
    val clean = java.nio.file.Files.createTempDirectory("graft_e2e_clean_").toString
    var mv: Option[DataFrame] = None
    var lastLanded = -1L
    var screened = 0L
    var flagged = 0L

    days.zipWithIndex.foreach { case (day, i) =>
      val v = Snapshots.commitBatch(spark, landing, day, batchId = i).get
      // the day's work reads ONLY the new commit
      val batch = Snapshots.readChanges(spark, landing, lastLanded, v)
      lastLanded = v
      val good = screen(batch).localCheckpoint()
      val corpus =
        if (Snapshots.latestVersion(spark, clean).isEmpty) good.limit(0)
        else Snapshots.read(spark, clean)
      val dups = Dedup.incrementalNearDups(corpus, good, "doc_id", "text",
        n = 16, minMatches = 8).localCheckpoint()
      val accepted = good.join(dups.select($"doc_id"), Seq("doc_id"), "left_anti")
      Snapshots.commitBatch(spark, clean, accepted, batchId = i)
      screened += good.count(); flagged += dups.count()
      val delta = MaterializedAgg.build(accepted, keys, measures)
      mv = Some(mv.fold(delta)(m => MaterializedAgg.merge(m, delta, keys, measures))
        .localCheckpoint())
    }

    val incremental = Snapshots.read(spark, clean).localCheckpoint()
    // 1. full accounting: every screened doc was either accepted or flagged
    assert(incremental.count() + flagged == screened,
      s"accepted ${incremental.count()} + flagged $flagged != screened $screened")
    // 2. the accepted corpus is PAIRWISE dup-free at the same threshold
    //    (same-batch pairs die by smaller-id, cross-batch by the corpus
    //    check — so the batch pair-scan over the final corpus finds none)
    val residual = Dedup.minhashCandidatePairs(incremental, "doc_id", "text",
      n = 16, minMatches = 8)
    assert(residual.isEmpty, "accepted corpus must contain no near-dup pair")
    // 3. re-sent identical texts always die: an identical copy carries an
    //    identical signature, so whatever its original matched (or the
    //    original itself, if accepted) flags the copy
    assert(incremental.filter($"doc_id" >= 1000000L).count() == 0)
    // 4. MV folded from per-batch deltas == one-shot over the accepted corpus
    val mvOneShot = MaterializedAgg.build(incremental, keys, measures)
    val got = mv.get
    assert(got.exceptAll(mvOneShot).isEmpty && mvOneShot.exceptAll(got).isEmpty,
      "delta-merged stats must equal the one-shot aggregate")
  }
}
