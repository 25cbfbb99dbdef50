package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins (SURVEY.md §2 scale
  * posture: "salting for skew"). AQE's skew-join split handles most
  * skew at runtime, but it only splits within what one join key allows
  * on the MAP side — a single pathological key (one user behind a NAT,
  * one null-ish default id) still lands on one reducer. Salting is the
  * standing production answer: spread the hot key over `factor`
  * reducers by widening the join key, replicating the cheap side.
  */
object SkewJoin {

  /** Inner equi-join of a skewed `fact` side against a (relatively)
    * small `dim` side, salted by `factor`:
    *
    *  - fact rows get `salt = pmod(xxhash64(id-ish), factor)` — any
    *    per-row value works; the salt only steers SHUFFLE placement,
    *    never the join result;
    *  - dim rows replicate `factor`× with salt 0..factor−1 (a fused
    *    `explode(sequence(...))` — no shuffle to build);
    *  - the join keys become (keys..., salt), so one hot key's rows
    *    split across `factor` reducers instead of one.
    *
    * The result is EXACTLY the plain inner join (spec-pinned — every
    * fact row meets every matching dim row exactly once, under exactly
    * one salt value). Cost: `factor`× the dim side's shuffle bytes —
    * the side that is small by construction. For left/right outer the
    * same construction holds (unmatched fact rows survive with their
    * salt and are dropped on projection); semi/anti need the dedup the
    * inner form gets for free, so they are not offered here. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val f = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong)).cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    f.join(d, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase skew-safe aggregation (the agg twin of [[saltedEquiJoin]]):
    * count per (key, salt) partially, then merge per key — caps any single
    * reducer's load at ~1/factor of the hottest key. AQE cannot split a
    * single key inside one aggregate, so this stays a manual tool.
    * `saltSource` should be any roughly-uniform companion column (an id);
    * it steers only shuffle placement, never the result. */
  def saltedCount(df: DataFrame, key: String, factor: Int,
      saltSource: Column): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(factor)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("n"))

  /** Bloom-prefiltered inner equi-join: when `dim` is too big to
    * broadcast but still far more selective than `fact` (the classic
    * "join 100 TB of lineitems to this month's flagged orders"), the
    * dominant cost is shuffling ALL of `fact` — including the ~99 % of
    * rows that will never find a partner. Build a Bloom filter of the
    * dim keys (one tiny distributed aggregate; ~1.2 MB plan literal per
    * million keys at 1 % fpp) and drop non-matching fact rows BEFORE
    * the exchange, inside the scan's whole-stage codegen.
    *
    * Result is EXACTLY the plain inner join: the Bloom pass admits a
    * superset (no false negatives), and the real join discards the
    * false positives. Spark's own `InjectRuntimeFilter` does this
    * opportunistically when its thresholds line up; this is the
    * explicit, threshold-free form for when the pipeline KNOWS the
    * selectivity (same machinery — `expr.Bloom` wraps the internal
    * BloomFilterAggregate / BloomFilterMightContain pair).
    *
    * `expectedItems <= 0` derives the build size from a dim count (one
    * extra O(dim) job); pass the known cardinality to skip it. */
  def bloomEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val items = if (expectedItems > 0) expectedItems else dim.count()
    val bloom = graft.expr.Bloom.build(dim, key, items, fpp)
    fact.filter(graft.expr.Bloom.mightContain(bloom, fact(key)))
      .join(dim, key)
  }
}
