package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.util.sketch.BloomFilter

/** Explicitly-driven Bloom filters, built on the SAME internal machinery
  * Spark's own `InjectRuntimeFilter` rule uses: a distributed
  * `BloomFilterAggregate` builds the filter (partial blooms merged by OR
  * across partitions — never a driver-side item loop), and
  * `BloomFilterMightContain` probes it inside whole-stage codegen (no
  * UDF, no interpreted path on the 100 TB side).
  *
  * The built filter travels as a binary literal in the probe plan —
  * exactly how Spark inlines its runtime-filter subquery results. Size
  * it by the SMALL side's cardinality: a 1 M-item / 1 % filter is
  * ~1.2 MB of plan literal; the big side is filtered in place, unshuffled.
  */
object Bloom {

  /** Build a serialized Bloom filter of `keyCol`'s values via a
    * distributed aggregate. One tiny job; the result is the only thing
    * that reaches the driver. */
  def build(df: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val numBits = BloomFilter.optimalNumOfBits(math.max(expectedItems, 1L), fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(expression(df.col(keyCol)))),
      Literal(math.max(expectedItems, 1L)), Literal(numBits))
      .toAggregateExpression()
    df.select(column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Probe predicate: true when `c` MIGHT be in the filter (no false
    * negatives; false-positive rate = the build fpp). Codegen'd. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    column(BloomFilterMightContain(Literal(bloom),
      new XxHash64(Seq(expression(c)))))
}
