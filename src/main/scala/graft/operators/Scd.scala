package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance (type 2): the upsert-with-
  * history operator every warehouse serving a feature store needs —
  * the reference's offline store overwrites rows in place
  * (`insert_offline.py` upsert path), which silently destroys the
  * point-in-time view its own PIT joins (J11) depend on. SCD2 keeps
  * every version with a validity interval instead.
  */
object Scd {

  /** Merge one batch of `updates` into an SCD2 `history` table.
    *
    * `history` carries `keyCols ++ trackedCols ++ (validFrom, validTo,
    * isCurrent)`; `updates` carries `keyCols ++ trackedCols ++ tsCol`
    * with AT MOST ONE row per key (pre-collapse a multi-version batch
    * with a latest-per-key window first — W4's shape). Per update key:
    *
    *  - key absent from current history → new current row
    *    `[ts, null)`;
    *  - present with any tracked column differing (null-safe `<=>`
    *    compare) → the old current row closes at `ts`, a new current
    *    row opens at `ts`;
    *  - present and identical → untouched (idempotent re-delivery of
    *    the same snapshot is a no-op).
    *
    * Scale shape: `updates` is the daily-increment side — small by
    * construction next to the accumulated history. The change
    * detection joins updates AGAINST ONLY THE CURRENT SLICE, and the
    * close/keep split joins the current slice against the (smaller
    * still) changed-key set, so with AQE both joins broadcast the
    * update-derived side and the history table itself is NEVER
    * shuffled — closed history rows stream through untouched via
    * union. No window over history, no global sort.
    *
    * Returns the full merged SCD2 table (same schema as `history`). */
  def scd2Merge(history: DataFrame, updates: DataFrame,
      keyCols: Seq[String], trackedCols: Seq[String], tsCol: String,
      validFrom: String = "valid_from", validTo: String = "valid_to",
      isCurrent: String = "is_current"): DataFrame = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty)
    val outCols = (keyCols ++ trackedCols ++ Seq(validFrom, validTo, isCurrent)).map(col)

    val cur = history.filter(col(isCurrent))
    val closedHist = history.filter(!col(isCurrent))
    val u = updates.select(
      (keyCols ++ trackedCols).map(col) :+ col(tsCol).as("__ts"): _*)

    // Changed-or-new detection against the current slice only.
    val curTagged = cur.select(
      keyCols.map(col) ++ trackedCols.map(c => col(c).as(s"__cur_$c"))
        :+ lit(1).as("__present"): _*)
    val differs: Column = trackedCols
      .map(c => !(col(c) <=> col(s"__cur_$c"))).reduce(_ || _)
    val changed = u.join(curTagged, keyCols, "left_outer")
      .filter(col("__present").isNull || differs)
      .select((keyCols ++ trackedCols).map(col) :+ col("__ts"): _*)

    // Close the superseded current rows; keep the rest as-is.
    val closingKeys = changed.select(keyCols.map(col) :+ col("__ts"): _*)
    val closedNow = cur.drop(validTo).join(closingKeys, keyCols, "inner")
      .withColumn(validTo, col("__ts"))
      .withColumn(isCurrent, lit(false))
      .select(outCols: _*)
    val keptCur = cur.join(closingKeys.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    val opened = changed
      .withColumn(validFrom, col("__ts"))
      .withColumn(validTo, lit(null).cast(
        history.schema(validTo).dataType))
      .withColumn(isCurrent, lit(true))
      .select(outCols: _*)

    closedHist.select(outCols: _*)
      .unionByName(keptCur.select(outCols: _*))
      .unionByName(closedNow)
      .unionByName(opened)
  }

  /** Plain MERGE (type-1 upsert, no history): rows of `updates` replace
    * same-key rows of `target`; new keys append — update-else-insert,
    * the standing warehouse MERGE. Schemas must match.
    *
    * Scale shape: ONE left-anti join of the big target against the
    * (daily-increment-sized) update KEY set — AQE broadcasts it — plus
    * a union; the target is never shuffled and never scanned twice.
    * Last-writer-wins within a batch is the caller's contract (collapse
    * multi-version batches with a latest-per-key window first, as in
    * [[scd2Merge]]).
    *
    * Key matching is NULL-SAFE (`<=>`): a NULL key value is one key,
    * so a NULL-keyed update REPLACES the NULL-keyed target row instead
    * of appending a duplicate (plain-equality anti-joins match NULL to
    * nothing, which would keep both). */
  def mergeUpsert(target: DataFrame, updates: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val uk = updates
      .select(keyCols.map(c => col(c).as(s"__u_$c")): _*).distinct()
    val cond = keyCols.map(c => col(c) <=> col(s"__u_$c")).reduce(_ && _)
    target.join(uk, cond, "left_anti")
      .unionByName(updates.select(target.columns.map(col): _*))
  }

  /** Apply a CDC changelog to a snapshot: `changelog` carries
    * `keyCols ++ payload ++ (opCol, tsCol)` with op ∈ {I, U, D}
    * (insert / update / delete — upstream CDC taps like Debezium emit
    * exactly this shape; any other op value, INCLUDING NULL, raises at
    * execution — a malformed record must not silently act as a delete
    * or an upsert). Per key the LATEST changelog entry wins, ordered
    * by `tsCol` with ties broken by `seqCol` when given (a CDC
    * stream's log sequence number — pass it whenever the source has
    * one: it makes the order total, and exact re-delivery is then
    * idempotent). Without a seq, DISTINCT ops sharing one coarse
    * timestamp tick have no true order; the tie resolves to D — the
    * conservative reading (a key both updated and deleted in the same
    * tick stays deleted; an I-after-D within one tick needs the real
    * sequence a source emitting such logs carries). D drops the key
    * from the snapshot, I/U upsert the payload. Earlier entries for
    * the key are superseded wholesale — applying a changelog prefix
    * then the suffix equals applying the whole log (composition),
    * which is what makes this the catch-up operator for an
    * incremental materialized snapshot.
    *
    * Scale shape: the latest-per-key window runs over the CHANGELOG
    * (the daily-increment side, small next to the snapshot); the
    * snapshot itself takes ONE null-safe left-anti join against the
    * touched-key set (AQE broadcasts it) plus a union of the
    * surviving upserts — never shuffled, never scanned twice, no
    * window over the snapshot. The op check is a codegen'd
    * `raise_error` branch inside the same scan — zero extra jobs. */
  def applyChangelog(snapshot: DataFrame, changelog: DataFrame,
      keyCols: Seq[String], opCol: String = "op", tsCol: String = "ts",
      seqCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog: keyCols must be non-empty")
    val checked = changelog.withColumn(opCol,
      when(col(opCol).isin("I", "U", "D"), col(opCol))
        .otherwise(raise_error(concat(
          lit("applyChangelog: invalid op '"),
          coalesce(col(opCol), lit("NULL")), lit("' (expected I/U/D)")))))
    // ts desc, seq desc, then op ASC so 'D' outranks 'I'/'U' on a
    // genuine tie — delete wins when the log carries no finer order
    val ord = (col(tsCol).desc +: seqCol.map(c => col(c).desc).toSeq) :+
      col(opCol).asc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val latest = checked.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val survivors = latest.filter(col(opCol) =!= "D")
      .select(snapshot.columns.map(col): _*)
    val touched = latest
      .select(keyCols.map(c => col(c).as(s"__u_$c")): _*).distinct()
    val cond = keyCols.map(c => col(c) <=> col(s"__u_$c")).reduce(_ && _)
    snapshot.join(touched, cond, "left_anti").unionByName(survivors)
  }
}
