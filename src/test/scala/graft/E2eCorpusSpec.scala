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

  /** Right-to-be-forgotten over the same composed layers: a forget
    * request deletes specific doc_ids from the corpus snapshot
    * copy-on-write (bloom-candidate discovery — O(touched files)),
    * the skipping indexes fold the file delta instead of rebuilding,
    * the stats MV RETRACTS the deleted contributions instead of
    * re-aggregating history, and vacuum makes the deletion physical.
    * Every layer stays equal to its from-scratch twin. */
  test("right-to-be-forgotten: cow delete + index fold + MV retraction, all consistent") {
    import graft.operators.Layout
    val docs = screen(Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"lang", $"text")).localCheckpoint()
    val corpus = java.nio.file.Files.createTempDirectory("graft_e2e_rtbf_").toString
    Snapshots.commit(spark, corpus, docs.repartitionByRange(8, $"doc_id"))
    val files0 = Snapshots.filesAt(spark, corpus, 0L)
    var bloom = Layout.bloomIndexFiles(spark, files0, "doc_id", 256)
      .localCheckpoint()
    var mv = MaterializedAgg.build(docs, keys, measures).localCheckpoint()

    // the forget request: 5 specific documents
    val forget = docs.select($"doc_id").orderBy($"doc_id").limit(5)
      .as[Long].collect().toSeq
    val deleted = Snapshots.read(spark, corpus)
      .filter($"doc_id".isin(forget: _*)).localCheckpoint()
    assert(deleted.count() == 5)

    // 1. targeted delete: bloom candidates bound discovery AND rewrite
    val cand = Layout.pruneFilesByKeys(bloom, forget)
    assert(cand.size < files0.size)
    val cow = Snapshots.deleteWhere(spark, corpus,
      $"doc_id".isin(forget: _*), candidates = Some(cand))
    assert(cow.filesRewritten <= cand.size)
    val after = Snapshots.read(spark, corpus)
    assert(after.filter($"doc_id".isin(forget: _*)).isEmpty)
    assert(after.count() == docs.count() - 5)

    // 2. index maintenance: fold the file delta; pruning == rebuild
    val (added, removed) = Snapshots.changedFiles(spark, corpus, cow.version.get)
    bloom = Layout.bloomIndexApply(spark, bloom, "doc_id", 256, added, removed)
    val latestFiles = Snapshots.filesAt(spark, corpus, cow.version.get)
    val rebuilt = Layout.bloomIndexFiles(spark, latestFiles, "doc_id", 256)
    val probes: Seq[Any] = forget ++ Seq(docs.agg(max($"doc_id")).head.getLong(0))
    assert(Layout.pruneFilesByKeys(bloom, probes).sorted ==
      Layout.pruneFilesByKeys(rebuilt, probes).sorted)

    // 3. MV retraction == one-shot rebuild over the post-delete corpus
    mv = MaterializedAgg.retract(mv,
      MaterializedAgg.build(deleted, keys, measures), keys, measures,
      dropWhen = Some($"n_docs" === 0L))
    val mvRebuilt = MaterializedAgg.build(after, keys, measures)
    assert(mv.exceptAll(mvRebuilt).isEmpty && mvRebuilt.exceptAll(mv).isEmpty,
      "retracted MV must equal the one-shot rebuild")

    // 4. vacuum makes it physical: the pre-delete version is gone loudly
    Snapshots.vacuum(spark, corpus, retainVersions = 1)
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, corpus, Some(0L))
    }
    assert(Snapshots.read(spark, corpus).count() == docs.count() - 5)
  }
}
