package graft.expr

import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` UDAFs (SURVEY.md §2.10) — the custom-aggregate
  * extension point the engine offers beyond built-ins, registered for
  * both the Column API and `spark.sql`.
  *
  * These are real gaps, not re-implementations: Spark's built-in `mode`
  * is nondeterministic on ties (any max-count value may win), and no
  * built-in returns a bounded per-group sample of distinct values.
  * Both aggregates are algebraic (associative + commutative merge), so
  * Spark runs them as partial aggregates — map-side combine before one
  * shuffle of small buffers, the same two-phase shape as a built-in
  * `sum`. Buffers are Catalyst-encoded (ExpressionEncoder), not kryo
  * blobs, so they stay in Tungsten rows off-heap.
  */
object Aggregators {

  /** Exact mode with a DETERMINISTIC tie-break: the SMALLEST value among
    * those with the maximal count (engine-portable — any SQL engine can
    * reproduce it with a (count DESC, value ASC) rank). Buffer = value →
    * count map; merge adds counts, so partial aggregation applies.
    * Memory is O(distinct values per group) — the same bound any exact
    * mode pays; for unbounded domains use a sketch instead. */
  object ModeLong extends Aggregator[Long, Map[Long, Long], Long] {
    def zero: Map[Long, Long] = Map.empty
    def reduce(b: Map[Long, Long], v: Long): Map[Long, Long] =
      b.updated(v, b.getOrElse(v, 0L) + 1L)
    def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      if (a.size < b.size) merge(b, a)
      else b.foldLeft(a) { case (acc, (v, n)) => acc.updated(v, acc.getOrElse(v, 0L) + n) }
    def finish(b: Map[Long, Long]): Long =
      if (b.isEmpty) 0L
      else b.minBy { case (v, n) => (-n, v) }._1
    def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Long] = ExpressionEncoder()
  }

  /** Bounded distinct sample: the `k` SMALLEST distinct values per
    * group, ascending — deterministic example values for data profiling
    * ("show me what this key column contains per segment") with a hard
    * memory bound per group. Keeping the k smallest (not "first seen")
    * makes the result independent of partitioning and row order. */
  final case class DistinctTopK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], v: Long): Seq[Long] =
      if (b.contains(v)) b
      else if (b.size < k) (b :+ v).sorted
      else if (v < b.last) (b.init :+ v).sorted
      else b
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    def finish(b: Seq[Long]): Seq[Long] = b
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Column-API forms. */
  def modeDet(c: Column): Column = udaf(ModeLong).apply(c)
  def distinctTopK(c: Column, k: Int): Column = udaf(DistinctTopK(k)).apply(c)

  /** SQL registration: `mode_det(x)`, `distinct_top8(x)`. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("mode_det", udaf(ModeLong))
    spark.udf.register("distinct_top8", udaf(DistinctTopK(8)))
  }
}
