package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators — the incremental-analytics primitives a
  * 100 TB deployment runs INSTEAD of full rescans.
  *
  * The shape that matters at scale: raw events are scanned ONCE per
  * ingest slice (a day, an hour), reduced to a constant-size sketch row
  * per (group, slice), and every later question — "distinct users per
  * source this quarter?" — is answered by unioning kilobyte sketches,
  * never by touching the 100 TB again. Both sketches here are
  * order-independent and mergeable, so partial aggregation, AQE
  * re-planning, and incremental appends all compose exactly.
  *
  * HLL: Spark's Apache DataSketches HllSketch agg (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate` — SQL-native, codegen'd,
  * no UDF). CMS: Spark's CountMinSketch (`count_min_sketch` agg), point
  * lookups served from the driver-side deserialized sketch.
  */
object Sketches {

  /** One distinct-count sketch row per key group: the stored layout of
    * an incremental distinct-count table. `lgK` trades size for error
    * (lgK=12 → 4 KB / ~1.6% stderr). The sketch column is plain binary —
    * parquet round-trips it, so slices persist and reload freely. */
  def distinctSketchTable(df: DataFrame, keyCols: Seq[String],
      valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll a sketch table up to coarser keys by UNIONING sketches —
    * answers "distinct over any slice union" without re-reading rows.
    * `keepCols` empty → one global row. */
  def rollupDistinct(sketchTable: DataFrame,
      keepCols: Seq[String]): DataFrame = {
    val merged =
      if (keepCols.isEmpty)
        sketchTable.agg(hll_union_agg(col("sketch")).as("sketch"))
      else sketchTable.groupBy(keepCols.map(col): _*)
        .agg(hll_union_agg(col("sketch")).as("sketch"))
    merged.withColumn("distinct_est", hll_sketch_estimate(col("sketch")))
  }

  /** Merge a delta of sketch rows into a stored slice table: same-key
    * sketches UNION (HLL registers max-merge, so re-delivering a delta
    * is idempotent), new keys append. This is the maintenance op of the
    * incremental-distinct loop: a streaming `foreachBatch` sketches
    * each micro-batch with [[distinctSketchTable]] and merges the
    * result here — the stored table stays one 4 KB row per (group,
    * slice) forever, and no question ever re-reads raw history. */
  def mergeSliceTables(stored: DataFrame, delta: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    // Only keys the delta actually touches re-aggregate; everything
    // else streams through untouched. A blanket union+groupBy would
    // deserialize/re-union/re-serialize EVERY stored sketch per merge —
    // O(history) per micro-batch instead of O(delta keys).
    val dk = delta.select(keyCols.map(col): _*).distinct()
    val untouched = stored.join(dk, keyCols, "left_anti")
    val touched = stored.join(dk, keyCols, "left_semi")
    untouched.unionByName(
      touched.unionByName(delta)
        .groupBy(keyCols.map(col): _*)
        .agg(hll_union_agg(col("sketch")).as("sketch")))
  }

  /** Build ONE count-min sketch over `valueCol` — a fixed-size frequency
    * summary answering point queries for ANY key with a one-sided error
    * (never under-counts; over-counts by ≤ eps·N with prob ≥ confidence).
    * Returns the serialized sketch (driver-scale: width×depth longs). */
  def cmsBuild(df: DataFrame, valueCol: String, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): Array[Byte] =
    df.agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence),
      lit(seed)).as("cms")).head().getAs[Array[Byte]](0)

  /** Point-estimate frequencies for `keys` from a serialized sketch.
    * Addition is commutative, so the estimates are deterministic
    * across partition orders — only the (sketch-bounded) collision
    * error is data-dependent. */
  def cmsEstimates(sketch: Array[Byte], keys: Seq[Long]): Seq[(Long, Long)] = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch))
    keys.map(k => k -> cms.estimateCount(k))
  }
}
