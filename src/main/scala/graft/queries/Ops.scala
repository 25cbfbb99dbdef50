package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Layout, MaterializedAgg, Quality, Scd}

/** Round-4 table-maintenance / data-quality / layout operators
  * (SURVEY.md §2.15): SCD2 merge, one-pass profiling, expectation
  * validation, Morton (Z-order) interleave. All oracle-checked.
  */
object Ops {
  import Inventory.Q

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // M1: SCD2 merge — history seeded from customer, one update batch
  // exercising all three cases (changed, unchanged because the segment
  // already matched, brand-new key).
  val scd2Merge: Q = (s, dir) => {
    import s.implicits._
    val c = t(s, dir, "customer")
    val history = c.select($"c_custkey", $"c_mktsegment", $"c_nationkey",
      to_timestamp(lit("1992-01-01 00:00:00")).as("valid_from"),
      lit(null).cast("timestamp").as("valid_to"),
      lit(true).as("is_current"))
    val ts = to_timestamp(lit("1995-06-01 00:00:00"))
    val updates = c.filter($"c_custkey" % 5 === 0)
      .select($"c_custkey", lit("MACHINERY").as("c_mktsegment"),
        $"c_nationkey", ts.as("ts"))
      .unionByName(c.filter($"c_custkey" % 7 === 3)
        .select(($"c_custkey" + 10000000L).as("c_custkey"),
          lit("NEWSEG").as("c_mktsegment"), $"c_nationkey", ts.as("ts")))
    // Open rows surface the 2200-01-01 sentinel (pandas ns-epoch caps at 2262, so the classic 9999 sentinel overflows downstream compare engines) instead of
    // NULL: a null timestamp's hash treatment varies by compare engine
    // (pandas NaT != NaT), and the sentinel keeps BETWEEN-style PIT
    // predicates sargable without a null branch.
    Scd.scd2Merge(history, updates, Seq("c_custkey"),
      Seq("c_mktsegment", "c_nationkey"), "ts")
      .withColumn("valid_to", coalesce($"valid_to",
        to_timestamp(lit("2200-01-01 00:00:00"))))
      // NTZ on the dumped columns: the session writes TIMESTAMP_MICROS
      // (adjusted-to-UTC) parquet, which downstream compare engines read
      // tz-AWARE while the DuckDB oracle's TIMESTAMP literal is naive;
      // the session TZ is UTC, so the wall-clock value is unchanged
      .withColumn("valid_from", $"valid_from".cast("timestamp_ntz"))
      .withColumn("valid_to", $"valid_to".cast("timestamp_ntz"))
      .orderBy($"c_custkey", $"valid_from")
  }

  // M2: one-pass exact profile of four customer columns (the approx
  // form is the 100 TB path; exact is the oracle-checkable twin —
  // QualitySpec pins the approx form's tolerance).
  val profileTable: Q = (s, dir) =>
    Quality.profile(t(s, dir, "customer"),
      Seq("c_custkey", "c_mktsegment", "c_name", "c_nationkey"),
      exact = true)

  // M3: expectation suite over lineitem — mixed passing and violated
  // rules, single-aggregate scalars + one FK anti-join.
  val validateRules: Q = (s, dir) => {
    import Quality._
    validate(t(s, dir, "lineitem"), Seq(
      NotNull("r1_returnflag_not_null", "l_returnflag"),
      InRange("r2_quantity_1_49", "l_quantity", 1, 49),
      Matches("r3_linestatus_of", "l_linestatus", "^[OF]$"),
      Unique("r4_order_line_unique", Seq("l_orderkey", "l_linenumber")),
      Unique("r5_orderkey_unique", Seq("l_orderkey")),
      ForeignKey("r6_orderkey_fk", "l_orderkey",
        t(s, dir, "orders"), "o_orderkey")))
  }

  // F23: Morton interleave (the Z-order curve value) on deterministic
  // 8-bit dims — the layout op itself (quantile bucketing + range
  // repartition) is plan/spec-verified in LayoutSpec.
  val mortonInterleave: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem").select($"l_orderkey", $"l_linenumber",
      Layout.mortonInterleave(
        Seq(pmod($"l_partkey", lit(256)), pmod($"l_suppkey", lit(256))), 8)
        .as("zval"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // M4: plain MERGE upsert (type-1, no history) — updates reprice every
  // 13th order (+1.00 exact in IEEE, so both engines produce the same
  // double bit-for-bit) and add new orders under NEGATED keys (disjoint
  // from the positive orderkey space at ANY scale factor — a fixed
  // +10M offset would collide with real keys once SF ≥ ~1.7).
  val mergeUpsert: Q = (s, dir) => {
    import s.implicits._
    val target = t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    val updates = target.filter($"o_orderkey" % 13 === 0)
      .select($"o_orderkey", $"o_custkey", lit("U").as("o_orderstatus"),
        ($"o_totalprice" + 1.0).as("o_totalprice"))
      .unionByName(target.filter($"o_orderkey" % 1009 === 0)
        .select((-$"o_orderkey").as("o_orderkey"), $"o_custkey",
          lit("N").as("o_orderstatus"), $"o_totalprice"))
    Scd.mergeUpsert(target, updates, Seq("o_orderkey"))
      .orderBy($"o_orderkey")
  }

  // M5: CDC changelog apply — a three-epoch log over orders exercising
  // every path: superseded update (ts=1 U then ts=2 U → latest wins),
  // delete at ts=3 (including keys updated earlier — the update must
  // NOT resurrect), inserts under negated keys (disjoint at any SF),
  // and untouched snapshot rows streaming through. Price deltas are
  // +1.0/+2.0: exact in IEEE, so both engines agree bit-for-bit.
  val cdcApply: Q = (s, dir) => {
    import s.implicits._
    val snap = t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    val log = snap.filter($"o_orderkey" % 11 === 0)
      .select($"o_orderkey", $"o_custkey", lit("U1").as("o_orderstatus"),
        ($"o_totalprice" + 1.0).as("o_totalprice"), lit("U").as("op"), lit(1).as("ts"))
      .unionByName(snap.filter($"o_orderkey" % 11 === 0)
        .select($"o_orderkey", $"o_custkey", lit("U2").as("o_orderstatus"),
          ($"o_totalprice" + 2.0).as("o_totalprice"), lit("U").as("op"), lit(2).as("ts")))
      .unionByName(snap.filter($"o_orderkey" % 17 === 0)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice", lit("D").as("op"), lit(3).as("ts")))
      .unionByName(snap.filter($"o_orderkey" % 997 === 0)
        .select((-$"o_orderkey").as("o_orderkey"), $"o_custkey",
          lit("N").as("o_orderstatus"), $"o_totalprice",
          lit("I").as("op"), lit(1).as("ts")))
    Scd.applyChangelog(snap, log, Seq("o_orderkey"), "op", "ts")
      .orderBy($"o_orderkey")
  }

  // M6: incremental aggregate-table maintenance — the EXACT materialized
  // view the reference recomputes from scratch every run
  // (back_end/flows/batch_processing.py full-history groupBy), rebuilt
  // as slice-build + delta-merge: three disjoint time slices of events
  // each reduce once, then fold into one stored table via null-safe
  // full-outer merges. The oracle is the ONE-SHOT aggregate over all
  // history — merge(slices) == recompute is exactly the contract.
  // Measures are integer-exact (centi-unit value sums, epoch seconds)
  // so the compare is engine-bit-exact; avg/stddev derive from
  // (n, sum, sumsq) at read time and are not stored (ratios don't merge).
  val incrementalAgg: Q = (s, dir) => {
    import s.implicits._
    import MaterializedAgg._
    val ev = t(s, dir, "events")
      .withColumn("ts_sec", Tables.tsSec($"ts"))
      .withColumn("v_c", round($"value" * 100, 0).cast("long"))
    val measures = Seq(
      countRows("n_events"), sumOf($"v_c", "sum_value_c"),
      sumSqOf($"v_c", "sum_sq_c"),
      minOf($"ts_sec", "min_ts_sec"), maxOf($"ts_sec", "max_ts_sec"))
    val cut1 = lit("2024-01-08").cast("date")
    val cut2 = lit("2024-01-15").cast("date")
    val d = to_date($"ts")
    val keys = Seq("user_id")
    val stored = build(ev.filter(d < cut1), keys, measures)
    val merged1 = merge(stored,
      build(ev.filter(d >= cut1 && d < cut2), keys, measures), keys, measures)
    merge(merged1, build(ev.filter(d >= cut2), keys, measures), keys, measures)
      .orderBy($"user_id")
  }

  val queries: Map[String, Q] = Map(
    "m6_incremental_agg" -> incrementalAgg,
    "m4_merge_upsert" -> mergeUpsert,
    "m5_cdc_apply" -> cdcApply,
    "m1_scd2_merge" -> scd2Merge,
    "m2_profile_table" -> profileTable,
    "m3_validate_rules" -> validateRules,
    "f23_morton_interleave" -> mortonInterleave
  )

  val oracle: Map[String, String] = Map(
    "m6_incremental_agg" ->
      """WITH b AS (
        | SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS v_c,
        |        CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec
        | FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |       CAST(SUM(v_c) AS BIGINT) AS sum_value_c,
        |       CAST(SUM(v_c * v_c) AS BIGINT) AS sum_sq_c,
        |       MIN(ts_sec) AS min_ts_sec, MAX(ts_sec) AS max_ts_sec
        |FROM b GROUP BY user_id ORDER BY user_id""".sm,
    "m5_cdc_apply" ->
      """WITH snap AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |log AS (
        | SELECT o_orderkey, o_custkey, 'U1' AS o_orderstatus,
        |        o_totalprice + 1.0 AS o_totalprice, 'U' AS op, 1 AS ts
        | FROM snap WHERE o_orderkey % 11 = 0
        | UNION ALL
        | SELECT o_orderkey, o_custkey, 'U2', o_totalprice + 2.0, 'U', 2
        | FROM snap WHERE o_orderkey % 11 = 0
        | UNION ALL
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'D', 3
        | FROM snap WHERE o_orderkey % 17 = 0
        | UNION ALL
        | SELECT -o_orderkey, o_custkey, 'N', o_totalprice, 'I', 1
        | FROM snap WHERE o_orderkey % 997 = 0),
        |latest AS (
        | SELECT * FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
        |    ORDER BY ts DESC, op ASC) AS rn FROM log) WHERE rn = 1)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM (
        | SELECT s.* FROM snap s LEFT JOIN (SELECT DISTINCT o_orderkey FROM latest) l
        |  ON s.o_orderkey = l.o_orderkey WHERE l.o_orderkey IS NULL
        | UNION ALL
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        | FROM latest WHERE op <> 'D')
        |ORDER BY o_orderkey""".sm,
    "m4_merge_upsert" ->
      """WITH tgt AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        | SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |        o_totalprice + 1.0 AS o_totalprice
        | FROM tgt WHERE o_orderkey % 13 = 0
        | UNION ALL
        | SELECT -o_orderkey, o_custkey, 'N', o_totalprice
        | FROM tgt WHERE o_orderkey % 1009 = 0)
        |SELECT * FROM (
        | SELECT t.* FROM tgt t LEFT JOIN (SELECT DISTINCT o_orderkey FROM upd) u
        |  ON t.o_orderkey = u.o_orderkey WHERE u.o_orderkey IS NULL
        | UNION ALL
        | SELECT * FROM upd)
        |ORDER BY o_orderkey""".sm,
    "m1_scd2_merge" ->
      """WITH hist AS (
        | SELECT c_custkey, c_mktsegment, c_nationkey,
        |        TIMESTAMP '1992-01-01 00:00:00' AS valid_from,
        |        CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
        | FROM customer),
        |upd AS (
        | SELECT c_custkey, 'MACHINERY' AS c_mktsegment, c_nationkey,
        |        TIMESTAMP '1995-06-01 00:00:00' AS ts
        | FROM customer WHERE c_custkey % 5 = 0
        | UNION ALL
        | SELECT c_custkey + 10000000, 'NEWSEG', c_nationkey,
        |        TIMESTAMP '1995-06-01 00:00:00'
        | FROM customer WHERE c_custkey % 7 = 3),
        |chg AS (
        | SELECT u.c_custkey, u.c_mktsegment, u.c_nationkey, u.ts
        | FROM upd u LEFT JOIN hist h ON u.c_custkey = h.c_custkey AND h.is_current
        | WHERE h.c_custkey IS NULL
        |    OR u.c_mktsegment IS DISTINCT FROM h.c_mktsegment
        |    OR u.c_nationkey IS DISTINCT FROM h.c_nationkey)
        |SELECT c_custkey, c_mktsegment, c_nationkey, valid_from,
        |       COALESCE(valid_to, TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
        |       is_current
        |FROM (
        | SELECT h.c_custkey, h.c_mktsegment, h.c_nationkey, h.valid_from,
        |        c.ts AS valid_to, FALSE AS is_current
        | FROM hist h JOIN chg c ON h.c_custkey = c.c_custkey
        | UNION ALL
        | SELECT h.c_custkey, h.c_mktsegment, h.c_nationkey, h.valid_from,
        |        h.valid_to, h.is_current
        | FROM hist h LEFT JOIN chg c ON h.c_custkey = c.c_custkey
        | WHERE c.c_custkey IS NULL
        | UNION ALL
        | SELECT c_custkey, c_mktsegment, c_nationkey, ts,
        |        CAST(NULL AS TIMESTAMP), TRUE
        | FROM chg)
        |ORDER BY c_custkey, valid_from""".sm,
    "m2_profile_table" ->
      """WITH p AS (
        | SELECT 'c_custkey' AS "column", COUNT(*) AS n_rows,
        |  COUNT(*) - COUNT(c_custkey) AS n_nulls,
        |  COUNT(DISTINCT c_custkey) AS n_distinct,
        |  CAST(MIN(c_custkey) AS VARCHAR) AS min_value,
        |  CAST(MAX(c_custkey) AS VARCHAR) AS max_value FROM customer
        | UNION ALL
        | SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
        |  COUNT(DISTINCT c_mktsegment),
        |  CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR)
        | FROM customer
        | UNION ALL
        | SELECT 'c_name', COUNT(*), COUNT(*) - COUNT(c_name),
        |  COUNT(DISTINCT c_name),
        |  CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR)
        | FROM customer
        | UNION ALL
        | SELECT 'c_nationkey', COUNT(*), COUNT(*) - COUNT(c_nationkey),
        |  COUNT(DISTINCT c_nationkey),
        |  CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR)
        | FROM customer)
        |SELECT "column", n_rows, n_nulls, n_distinct, min_value, max_value
        |FROM p ORDER BY "column"""".sm,
    "m3_validate_rules" ->
      """WITH v AS (
        | SELECT 'r1_returnflag_not_null' AS rule, CAST(SUM(
        |   CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_violations FROM lineitem
        | UNION ALL
        | SELECT 'r2_quantity_1_49', CAST(SUM(CASE WHEN l_quantity IS NOT NULL
        |   AND (l_quantity < 1 OR l_quantity > 49) THEN 1 ELSE 0 END) AS BIGINT)
        | FROM lineitem
        | UNION ALL
        | SELECT 'r3_linestatus_of', CAST(SUM(CASE WHEN l_linestatus IS NOT NULL
        |   AND NOT regexp_matches(l_linestatus, '^[OF]$') THEN 1 ELSE 0 END) AS BIGINT)
        | FROM lineitem
        | UNION ALL
        | SELECT 'r4_order_line_unique', CAST(
        |   (SELECT COUNT(*) FROM lineitem) - (SELECT COUNT(*) FROM
        |    (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS BIGINT)
        | UNION ALL
        | SELECT 'r5_orderkey_unique', CAST(
        |   (SELECT COUNT(*) FROM lineitem) -
        |   (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS BIGINT)
        | UNION ALL
        | SELECT 'r6_orderkey_fk', CAST((SELECT COUNT(*) FROM lineitem l
        |   LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |     ON l.l_orderkey = o.o_orderkey
        |   WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL) AS BIGINT))
        |SELECT rule, n_violations FROM v ORDER BY rule""".sm,
    "f23_morton_interleave" ->
      """SELECT l_orderkey, l_linenumber, CAST(
        |   (((l_partkey % 256) >> 0) & 1) * 1     + (((l_suppkey % 256) >> 0) & 1) * 2 +
        |   (((l_partkey % 256) >> 1) & 1) * 4     + (((l_suppkey % 256) >> 1) & 1) * 8 +
        |   (((l_partkey % 256) >> 2) & 1) * 16    + (((l_suppkey % 256) >> 2) & 1) * 32 +
        |   (((l_partkey % 256) >> 3) & 1) * 64    + (((l_suppkey % 256) >> 3) & 1) * 128 +
        |   (((l_partkey % 256) >> 4) & 1) * 256   + (((l_suppkey % 256) >> 4) & 1) * 512 +
        |   (((l_partkey % 256) >> 5) & 1) * 1024  + (((l_suppkey % 256) >> 5) & 1) * 2048 +
        |   (((l_partkey % 256) >> 6) & 1) * 4096  + (((l_suppkey % 256) >> 6) & 1) * 8192 +
        |   (((l_partkey % 256) >> 7) & 1) * 16384 + (((l_suppkey % 256) >> 7) & 1) * 32768
        | AS BIGINT) AS zval
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".sm
  )

  implicit private class Sm(private val s: String) {
    def sm: String = s.stripMargin.replace('\n', ' ')
  }
}
