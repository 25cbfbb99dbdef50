package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §7.4 design rule). AQE's skew-join
  * split handles most cases at runtime; explicit salting remains the
  * tool for pathological hot keys (one card with millions of rows) or
  * for skewed *aggregations* where AQE can't split a single key.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key` with an `nSalts`-way salt:
    * the large side gets a deterministic pseudo-random salt per row (from
    * a hash of the whole row's partition offset via monotonically
    * increasing id is NOT deterministic across runs — we hash the key
    * plus a uniformly-distributed companion column instead when given),
    * the small side is exploded `nSalts`×. Result equals the plain join.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      nSalts: Int, saltSource: Column): DataFrame = {
    val l = large.withColumn("_salt", pmod(hash(saltSource), lit(nSalts)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-safe aggregation: count per (key, salt) partially,
    * then merge per key — caps any single reducer's load at ~1/nSalts
    * of the hottest key. */
  def saltedCount(df: DataFrame, key: String, nSalts: Int,
      saltSource: Column): DataFrame =
    df.withColumn("_salt", pmod(hash(saltSource), lit(nSalts)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).as("n"))
}
