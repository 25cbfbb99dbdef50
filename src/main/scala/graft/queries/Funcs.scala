package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.expr.{Functions, Haversine}

/** Scalar-function + source-operator inventory — SURVEY.md §2.1 (S6, S12)
  * and §2.8 (F1–F15, H1) — plus the flagship batch-pipeline replica.
  */
object Funcs {
  import Inventory.Q

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // S6/F14: JSON field extraction (pipeline.py:44)
  val s6JsonParse: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .orderBy($"event_id")
  }

  // S12: factorize / dense codes (load_data.py:20) — distinct-keys sort
  // + zipWithIndex + broadcast join back, never a global window.
  val s12Factorize: Q = (s, dir) => {
    import s.implicits._
    Functions.factorize(t(s, dir, "customer"), "c_custkey", "code")
      .select($"c_custkey", $"code")
      .orderBy($"c_custkey")
  }

  // F1-F4 + F2: timestamp parts (batch_processing.py:24-30). The +0 shim
  // for DuckDB's Sunday=0 convention lives in the oracle.
  val f1TimeParts: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id",
        Tables.tsSec($"ts").as("ts_sec"),
        hour($"ts").as("hod"),
        dayofweek($"ts").as("dow"),
        dayofmonth($"ts").as("dom"),
        month($"ts").as("mon"),
        year($"ts").as("yr"))
      .orderBy($"event_id")
  }

  // F5: timestamp arithmetic → fractional years (batch_processing.py:31)
  val f5AgeYears: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey",
        Functions.ageYears($"o_orderdate", to_timestamp(lit("1992-01-01 00:00:00")))
          .as("age_years"))
      .orderBy($"o_orderkey")
  }

  // H1: haversine distance (batch_processing.py:32-37) over synthesized
  // coordinates; rounded to 6 dp to absorb libm last-ulp differences.
  val h1Haversine: Q = (s, dir) => {
    import s.implicits._
    val e = t(s, dir, "events")
      .withColumn("lat1", $"value" % 89.0 - 44.0)
      .withColumn("lon1", ($"value" * 7.3) % 179.0 - 89.0)
      .withColumn("lat2", ($"user_id" % 89 - 44).cast("double"))
      .withColumn("lon2", ($"user_id" * 13 % 179 - 89).cast("double"))
    e.select($"event_id",
        round(Haversine.haversineMiles($"lat1", $"lon1", $"lat2", $"lon2"), 6)
          .as("dist_miles"))
      .orderBy($"event_id")
  }

  // F9: string concat / key formatting (redis_writer.py:20-22)
  val f9Concat: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "customer")
      .select($"c_custkey",
        concat_ws(":", lit("cust"), $"c_custkey", $"c_mktsegment").as("key"))
      .orderBy($"c_custkey")
  }

  // F10: string split / part extraction (feature.py:118)
  val f10Split: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "customer")
      .select($"c_custkey", substring_index($"c_name", "#", -1).as("name_id"))
      .orderBy($"c_custkey")
  }

  // F11: numeric rounding (producer.py:23-27). Operands chosen so no
  // value sits on a rounding half (discount/tax are exact 2-dp).
  val f11Round: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        round($"l_discount" * 100.0, 0).as("disc_pct"),
        round($"l_tax" * 100.0, 0).as("tax_pct"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // F12: casts (feature.py:74; stream_features.py:14). floor() first —
  // Spark truncates double→int, DuckDB rounds, floor makes them agree.
  val f12Cast: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id",
        floor($"value").cast("int").as("value_int"),
        $"user_id".cast("string").as("user_str"))
      .orderBy($"event_id")
  }

  // F13: dynamic try_cast (feature.py:180-187)
  val f13TryCast: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("k_str", get_json_object($"props", "$.k"))
      .select($"event_id",
        expr("try_cast(k_str AS int)").as("k_int"),
        expr("try_cast(event_type AS int)").as("bad_int"),
        Functions.tryCastAny($"k_str").as("k_any"))
      .orderBy($"event_id")
  }

  // F20: regex surface — group extract, extract-all count, mask-replace
  // (Spark regexp_replace is global by default; DuckDB needs the 'g'
  // flag). All three are per-row codegen'd string ops, zero shuffle.
  val f20Regexp: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id",
        regexp_extract($"props", "\"k\": ([0-9]+)", 1).cast("long").as("k_val"),
        size(regexp_extract_all($"props", lit("[0-9]+"), lit(0))).cast("long").as("n_nums"),
        regexp_replace($"props", "[0-9]", "#").as("masked"))
      .orderBy($"event_id")
  }

  // F22: VARIANT ingestion (Spark 4) — parse_json once into the binary
  // semi-structured type, then typed variant_get paths. For repeated
  // multi-path access this beats get_json_object (which re-parses the
  // string per call); the shredded variant also carries to parquet.
  val f22Variant: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id", parse_json($"props").as("v"))
      .select($"event_id",
        try_variant_get($"v", "$.k", "int").as("k_int"),
        try_variant_get($"v", "$.missing", "string").as("missing"),
        is_variant_null($"v").as("is_null"))
      .orderBy($"event_id")
  }

  // F21: array-function surface + lexical diversity — the typed-array
  // ops every token pipeline leans on (sort/distinct/slice/join/
  // contains/position) plus type-token ratio and hapax-adjacent stats,
  // all per-row codegen'd column work, zero shuffle.
  val f21ArrayOps: Q = (s, dir) => {
    import s.implicits._
    val tk = split($"text", " ")
    val types = array_sort(array_distinct(tk))
    t(s, dir, "documents")
      .select($"doc_id",
        size(tk).cast("long").as("n_tokens"),
        size(types).cast("long").as("n_types"),
        round(size(types).cast("double") / size(tk), 6).as("ttr"),
        array_join(slice(types, 1, 3), ",").as("first_types"),
        array_contains(tk, "the").as("has_the"),
        array_position(tk, "spark").as("pos_spark"))
      .orderBy($"doc_id")
  }

  // F15: conditional / threshold label (training.py:114)
  val f15Conditional: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("label", when($"value" > 100.0, 1).otherwise(0))
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy($"label")
  }

  // Flagship: the reference batch pipeline end-to-end on `events` as the
  // transaction stand-in (user_id↔cc_num, value↔amt; FIXTURES.md §E).
  // scan → derive time parts/age/haversine → two trailing range frames
  // per key → project (batch_processing.py:21-52).
  val replicaBatchFeatures: Q = (s, dir) => {
    import s.implicits._
    val byKey = Window.partitionBy($"user_id").orderBy($"ts_sec")
    val w10 = byKey.rangeBetween(-600, 0)
    val w1h = byKey.rangeBetween(-3600, 0)
    t(s, dir, "events")
      .withColumn("ts_sec", Tables.tsSec($"ts"))
      .withColumn("lat1", $"value" % 89.0 - 44.0)
      .withColumn("lon1", ($"value" * 7.3) % 179.0 - 89.0)
      .withColumn("lat2", ($"user_id" % 89 - 44).cast("double"))
      .withColumn("lon2", ($"user_id" * 13 % 179 - 89).cast("double"))
      .withColumn("__age_n",
        lit(1704067200L) + $"user_id" * 10000000L - lit(631152000L))
      .select(
        $"event_id", $"user_id", $"value".as("amt"),
        hour($"ts").as("hour_of_day"),
        dayofweek($"ts").as("day_of_week"),
        // age in EXACT integer micro-years, then one IEEE double divide:
        // the numerator reaches ~9e15 at sf1 (shifted user_ids), where a
        // double divide + 6-dp decimal round can split on an ULP between
        // engines; split-div integer arithmetic stays in BIGINT range
        // ((n mod y)·1e6 < 3.2e13) and is bit-identical anywhere, and
        // micro/1e6 is exactly representable (< 2^53) on both sides.
        (expr("(__age_n div 31557600) * 1000000 + ((__age_n % 31557600) * 1000000) div 31557600")
          .cast("double") / 1e6).as("age_years"),
        round(Haversine.haversineMiles($"lat1", $"lon1", $"lat2", $"lon2"), 6)
          .as("distance_to_merchant"),
        count(lit(1)).over(w10).as("txn_count_last_10_min"),
        (sum($"value".cast(DecimalType(18, 2))).over(w1h).cast("double") /
          count(lit(1)).over(w1h)).as("avg_amt_last_1_hour"))
      .orderBy($"event_id")
  }

  val queries: Map[String, Q] = Map(
    "s6_json_parse" -> s6JsonParse,
    "s12_factorize" -> s12Factorize,
    "f1_time_parts" -> f1TimeParts,
    "f5_age_years" -> f5AgeYears,
    "h1_haversine" -> h1Haversine,
    "f9_concat" -> f9Concat,
    "f10_split" -> f10Split,
    "f11_round" -> f11Round,
    "f12_cast" -> f12Cast,
    "f13_try_cast" -> f13TryCast,
    "f15_conditional" -> f15Conditional,
    "f20_regexp" -> f20Regexp,
    "f21_array_ops" -> f21ArrayOps,
    "f22_variant" -> f22Variant,
    "replica_batch_features" -> replicaBatchFeatures
  )

  private val hav =
    """2 * 3963.0 * ASIN(SQRT(
      |  POW(SIN((RADIANS(lat2) - RADIANS(lat1)) / 2), 2) +
      |  COS(RADIANS(lat1)) * COS(RADIANS(lat2)) *
      |  POW(SIN((RADIANS(lon2) - RADIANS(lon1)) / 2), 2)))""".stripMargin

  private val coords =
    """FMOD(value, 89.0) - 44.0 AS lat1,
      | FMOD(value * 7.3, 179.0) - 89.0 AS lon1,
      | CAST(user_id % 89 - 44 AS DOUBLE) AS lat2,
      | CAST(user_id * 13 % 179 - 89 AS DOUBLE) AS lon2""".stripMargin

  val oracle: Map[String, String] = Map(
    "s6_json_parse" ->
      """SELECT event_id, CAST(regexp_extract(props, ': ([0-9]+)', 1) AS INTEGER) AS k
        |FROM events ORDER BY event_id""".sm,
    "s12_factorize" ->
      """SELECT c_custkey, DENSE_RANK() OVER (ORDER BY c_custkey) - 1 AS code
        |FROM customer ORDER BY c_custkey""".sm,
    "f1_time_parts" ->
      """SELECT event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
        | CAST(hour(ts) AS INTEGER) AS hod, CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        | CAST(day(ts) AS INTEGER) AS dom, CAST(month(ts) AS INTEGER) AS mon,
        | CAST(year(ts) AS INTEGER) AS yr
        |FROM events ORDER BY event_id""".sm,
    "f5_age_years" ->
      """SELECT o_orderkey,
        | (FLOOR(epoch(o_orderdate)) - 694224000) / 31557600.0 AS age_years
        |FROM orders ORDER BY o_orderkey""".sm,
    "h1_haversine" ->
      s"""SELECT event_id, ROUND($hav, 6) AS dist_miles FROM (
        |SELECT event_id, $coords FROM events) ORDER BY event_id""".sm,
    "f9_concat" ->
      """SELECT c_custkey, concat_ws(':', 'cust', c_custkey, c_mktsegment) AS key
        |FROM customer ORDER BY c_custkey""".sm,
    "f10_split" ->
      "SELECT c_custkey, split_part(c_name, '#', 2) AS name_id FROM customer ORDER BY c_custkey",
    "f11_round" ->
      """SELECT l_orderkey, l_linenumber, ROUND(l_discount * 100.0, 0) AS disc_pct,
        | ROUND(l_tax * 100.0, 0) AS tax_pct
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".sm,
    "f12_cast" ->
      """SELECT event_id, CAST(FLOOR(value) AS INTEGER) AS value_int,
        | CAST(user_id AS VARCHAR) AS user_str
        |FROM events ORDER BY event_id""".sm,
    "f13_try_cast" ->
      """SELECT event_id, TRY_CAST(k_str AS INTEGER) AS k_int,
        | TRY_CAST(event_type AS INTEGER) AS bad_int,
        | CASE WHEN regexp_matches(k_str, '^-?[0-9]+\.[0-9]+$') THEN CAST(k_str AS DOUBLE)
        |      WHEN regexp_matches(k_str, '^-?[0-9]+$') THEN CAST(CAST(k_str AS BIGINT) AS DOUBLE)
        |      ELSE NULL END AS k_any
        |FROM (SELECT event_id, event_type, regexp_extract(props, ': ([0-9]+)', 1) AS k_str FROM events)
        |ORDER BY event_id""".sm,
    "f15_conditional" ->
      """SELECT CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS label, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY label""".sm,
    "f20_regexp" ->
      """SELECT event_id,
        | CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_val,
        | CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_nums,
        | regexp_replace(props, '[0-9]', '#', 'g') AS masked
        |FROM events ORDER BY event_id""".sm,
    "f22_variant" ->
      """SELECT event_id,
        | CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
        | CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing,
        | false AS is_null
        |FROM events ORDER BY event_id""".sm,
    "f21_array_ops" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |t AS (SELECT doc_id, tk, list_sort(list_distinct(tk)) AS types FROM d)
        |SELECT doc_id,
        | CAST(len(tk) AS BIGINT) AS n_tokens,
        | CAST(len(types) AS BIGINT) AS n_types,
        | ROUND(CAST(len(types) AS DOUBLE) / len(tk), 6) AS ttr,
        | array_to_string(types[1:3], ',') AS first_types,
        | list_contains(tk, 'the') AS has_the,
        | CAST(COALESCE(list_position(tk, 'spark'), 0) AS BIGINT) AS pos_spark
        |FROM t ORDER BY doc_id""".sm,
    "replica_batch_features" ->
      s"""SELECT event_id, user_id, value AS amt,
        | CAST(hour(ts) AS INTEGER) AS hour_of_day,
        | CAST(dayofweek(ts) + 1 AS INTEGER) AS day_of_week,
        | ((n // 31557600) * 1000000 + ((n % 31557600) * 1000000) // 31557600) / 1000000.0 AS age_years,
        | ROUND($hav, 6) AS distance_to_merchant,
        | COUNT(*) OVER w10 AS txn_count_last_10_min,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w1h AS DOUBLE) / COUNT(*) OVER w1h AS avg_amt_last_1_hour
        |FROM (SELECT event_id, user_id, value, ts, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
        |  1704067200 + user_id * 10000000 - 631152000 AS n, $coords FROM events)
        |WINDOW
        | w10 AS (PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 600 PRECEDING AND CURRENT ROW),
        | w1h AS (PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".sm
  )

  implicit private class Sm(private val s: String) {
    def sm: String = s.stripMargin.replace("\n", " ")
  }
}
