package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact incremental aggregate-table maintenance — the EXACT twin of the
  * sketch slice tables ([[Sketches]]): a materialized GROUP BY whose rows
  * are updated from deltas instead of recomputed from raw history.
  *
  * The 100 TB shape: raw events are scanned once per ingest slice and
  * reduced to one row per key holding DECOMPOSABLE measures (count, sum,
  * min, max — each combines associatively and commutatively), then every
  * later refresh folds the new slice's pre-aggregated rows into the
  * stored table with one null-safe full-outer join. The stored table is
  * key-cardinality-sized; the 100 TB of history is never re-read. Avg and
  * stddev derive from (count, sum, sumsq) at read time — store the
  * decomposed moments, never the ratio (ratios don't merge).
  *
  * Exactly-once contract: counts and sums ADD, so re-delivering a delta
  * double-counts (unlike HLL's max-merge registers). Feed this from a
  * `foreachBatch` loop keyed by batchId (the repo's idempotent-sink
  * pattern, StreamSpec) or any other exactly-once delivery.
  *
  * Reference analogue: the reference recomputes its feature aggregates
  * from the full parquet scan every run (`back_end/flows/
  * batch_processing.py` groupBy over all history); this operator is what
  * replaces that full rescan once history no longer fits a nightly scan.
  */
object MaterializedAgg {

  /** One mergeable measure: `build` aggregates raw rows into the stored
    * column; `combine` folds a stored partial with a delta partial when
    * both sides are present (either side may be NULL only when its row
    * didn't exist — [[merge]] coalesces around that). */
  final case class Measure(out: String, build: Column,
      combine: (Column, Column) => Column,
      retractCombine: Option[(Column, Column) => Column] = None)

  /** Row count. Combine = addition. */
  def countRows(as: String): Measure =
    Measure(as, count(lit(1)).as(as), (a, b) => a + b,
      retractCombine = Some((a, b) => a - b))

  /** Sum of a column (use an integer-unit column for engine-exact
    * results; double sums re-associate under merge). Combine = addition.
    * `sum` over all-NULL groups yields NULL — kept as NULL (SQL
    * semantics), and merge treats a NULL partial as absent mass. */
  def sumOf(valueCol: Column, as: String): Measure =
    Measure(as, sum(valueCol).as(as),
      (a, b) => when(a.isNull, b).when(b.isNull, a).otherwise(a + b),
      // subtracting an absent (NULL) deleted mass keeps the stored sum;
      // a NULL stored sum with non-NULL deleted mass is the caller's
      // inconsistency and surfaces as NULL, never a silent zero
      retractCombine = Some((a, b) => when(b.isNull, a).otherwise(a - b)))

  /** Minimum. Combine = least (null-skipping in Spark). */
  def minOf(valueCol: Column, as: String): Measure =
    Measure(as, min(valueCol).as(as), (a, b) => least(a, b))

  /** Maximum. Combine = greatest (null-skipping in Spark). */
  def maxOf(valueCol: Column, as: String): Measure =
    Measure(as, max(valueCol).as(as), (a, b) => greatest(a, b))

  /** Sum of squares — with [[countRows]] + [[sumOf]] this decomposes
    * variance/stddev: var = (ssq - s*s/n) / (n-1) at read time. */
  def sumSqOf(valueCol: Column, as: String): Measure =
    sumOf(valueCol * valueCol, as)

  /** Build an aggregate table (or a delta of one) from raw rows: one row
    * per key, one column per measure. This is the per-slice reduce — run
    * it on each ingest slice / micro-batch, then fold with [[merge]]. */
  def build(df: DataFrame, keyCols: Seq[String],
      measures: Seq[Measure]): DataFrame = {
    require(measures.nonEmpty, "MaterializedAgg.build: no measures")
    df.groupBy(keyCols.map(col): _*)
      .agg(measures.head.build, measures.tail.map(_.build): _*)
  }

  /** Fold a delta aggregate table into a stored one: same-key rows
    * combine per measure, untouched stored keys stream through, new
    * delta keys append. ONE null-safe (`<=>`) full-outer join — one scan
    * of each side, NULL key values merge as one key (the [[Sketches]]
    * merge shape; see `mergeSliceTables` for why plain equality would
    * duplicate NULL-keyed rows). Both inputs must already be aggregate
    * tables over the SAME keys and measures ([[build]] output). */
  def merge(stored: DataFrame, delta: DataFrame, keyCols: Seq[String],
      measures: Seq[Measure]): DataFrame = {
    // __s/__d presence literals distinguish "row absent from that side"
    // from "measure NULL on an existing row" (e.g. sum over all-NULL
    // values): after the full outer join a missing side leaves its
    // presence flag NULL, so absence is decided by the join, never by
    // inspecting a measure (NULL keys make key-nullability unusable).
    val st = stored.withColumn("__s", lit(true))
    val d = delta.select(
      keyCols.map(c => col(c).as(s"__d_$c")) ++
        measures.map(m => col(m.out).as(s"__d_${m.out}")) :+
        lit(true).as("__d"): _*)
    val cond = keyCols.map(k => col(k) <=> col(s"__d_$k")).reduce(_ && _)
    val keyOut = keyCols.map(k => coalesce(col(k), col(s"__d_$k")).as(k))
    val measureOut = measures.map { m =>
      val a = col(m.out); val b = col(s"__d_${m.out}")
      when(col("__d").isNull, a).when(col("__s").isNull, b)
        .otherwise(m.combine(a, b)).as(m.out)
    }
    st.join(d, cond, "full_outer").select(keyOut ++ measureOut: _*)
  }

  /** RETRACTION fold — the inverse of [[merge]] for row DELETIONS
    * (right-to-be-forgotten, corrections): subtract a delta built from
    * the deleted rows out of the stored table. Only measures with a
    * subtractive inverse participate (count/sum/sum-of-squares);
    * min/max CANNOT retract incrementally — deleting the max forces a
    * rescan of that key — so their presence is refused loudly rather
    * than silently wrong. Keys whose `dropWhen` turns true after the
    * fold (typically `col("n") === 0`) leave the table entirely.
    * `validate` (skippable) rejects a delta carrying keys the stored
    * table does not have — retracting rows that were never merged is
    * always a pipeline bug. One broadcast-friendly left join: the
    * stored table streams, the deletion-sized delta probes. */
  def retract(stored: DataFrame, delta: DataFrame, keyCols: Seq[String],
      measures: Seq[Measure], dropWhen: Option[Column] = None,
      validate: Boolean = true): DataFrame = {
    val nonRetractable = measures.filter(_.retractCombine.isEmpty).map(_.out)
    require(nonRetractable.isEmpty,
      s"MaterializedAgg.retract: measures ${nonRetractable.mkString(",")} have " +
        "no subtractive inverse (min/max) — rebuild their keys instead")
    if (validate) {
      val cond0 = keyCols.map(k => stored(k) <=> delta(k)).reduce(_ && _)
      val orphan = delta.join(stored, cond0, "left_anti").limit(1).count()
      require(orphan == 0L,
        "MaterializedAgg.retract: delta has keys absent from the stored " +
          "table — retracting never-merged rows (pass validate = false to skip)")
    }
    val d = delta.select(
      keyCols.map(c => col(c).as(s"__d_$c")) ++
        measures.map(m => col(m.out).as(s"__d_${m.out}")) :+
        lit(true).as("__d"): _*)
    val cond = keyCols.map(k => col(k) <=> col(s"__d_$k")).reduce(_ && _)
    val measureOut = measures.map { m =>
      val a = col(m.out); val b = col(s"__d_${m.out}")
      when(col("__d").isNull, a)
        .otherwise(m.retractCombine.get(a, b)).as(m.out)
    }
    val folded = stored.join(broadcast(d), cond, "left_outer")
      .select(keyCols.map(col) ++ measureOut: _*)
    dropWhen.fold(folded)(c => folded.filter(!coalesce(c, lit(false))))
  }
}
