package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Hand-traced semantics + plan-shape pins for the event-analytics
  * operators (funnel, retention, interpolation, streaks, baskets). */
class AnalyticsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("funnel: completes in order, skips, and honors the 7-day window") {
    // u1 completes all 3 steps; u2 clicks BEFORE viewing (no step 2);
    // u3 clicks 8 days after viewing (outside window); u4 views only
    val day = 86400L
    val rows = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "click", 100L), (2L, "view", 200L),
      (3L, "view", 100L), (3L, "click", 100L + 8 * day),
      (4L, "view", 50L))
    val e = rows.toDF("user_id", "event_type", "ts_sec")
    val win = 7L * day
    val s1 = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts_sec").as("t1"))
    val s2 = e.filter($"event_type" === "click").join(s1, "user_id")
      .filter($"ts_sec" > $"t1" && $"ts_sec" <= $"t1" + win)
      .groupBy($"user_id").agg(min($"ts_sec").as("t2"))
    val s3 = e.filter($"event_type" === "purchase").join(s2, "user_id")
      .filter($"ts_sec" > $"t2" && $"ts_sec" <= $"t2" + win)
      .groupBy($"user_id").agg(min($"ts_sec").as("t3"))
    assert(s1.count() == 4 && s2.count() == 1 && s3.count() == 1)
    assert(s2.head.getLong(0) == 1L)
  }

  test("interpolation: middle missing is linear, edges clamp") {
    val rows = Seq(
      // user 1: known at t=0 (v=10) and t=10 (v=20); missing at t=4
      (1L, 1L, 0L, "view", 10.0), (2L, 1L, 4L, "error", 99.0),
      (3L, 1L, 10L, "view", 20.0),
      // user 2: missing leads and trails
      (4L, 2L, 0L, "error", 99.0), (5L, 2L, 5L, "view", 7.0),
      (6L, 2L, 9L, "error", 99.0))
    val e = rows.toDF("event_id", "user_id", "ts_sec", "event_type", "value")
      .withColumn("v", when($"event_type" =!= "error", $"value"))
    val wp = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wn = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
      .rowsBetween(0, Window.unboundedFollowing)
    val pv = last($"v", ignoreNulls = true).over(wp)
    val pt = last(when($"v".isNotNull, $"ts_sec"), ignoreNulls = true).over(wp)
    val nv = first($"v", ignoreNulls = true).over(wn)
    val nt = first(when($"v".isNotNull, $"ts_sec"), ignoreNulls = true).over(wn)
    val out = e.select($"event_id",
        round(when($"v".isNotNull, $"v")
          .when(pv.isNull, nv).when(nv.isNull, pv)
          .otherwise(pv + (nv - pv) * (($"ts_sec" - pt) / (nt - pt))), 6)
          .as("vi"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) == 14.0) // 10 + (20-10) * 4/10
    assert(out(4L) == 7.0)  // leading clamp to next
    assert(out(6L) == 7.0)  // trailing clamp to prev
  }

  test("streaks: island arithmetic finds the longest run") {
    val days = Seq((1L, 0), (1L, 1), (1L, 2), (1L, 5), (1L, 6), (2L, 3))
      .toDF("user_id", "dn")
    val w = Window.partitionBy($"user_id").orderBy($"dn")
    val runs = days.withColumn("island", $"dn" - row_number().over(w))
      .groupBy($"user_id", $"island").agg(count(lit(1)).as("len"))
    val got = runs.groupBy($"user_id")
      .agg(max($"len").as("ls"), sum($"len").as("nd"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((3L, 5L)))
    assert(got(2L) == ((1L, 1L)))
  }

  test("streaks pipeline reuses ONE user_id partitioning (single Exchange)") {
    val e = Tables.load(spark, sf0001, "events")
    val days = e.select($"user_id",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date")).as("dn"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"dn")
    val out = days.withColumn("island", $"dn" - row_number().over(w))
      .groupBy($"user_id", $"island").agg(count(lit(1)).as("len"))
      .groupBy($"user_id").agg(max($"len").as("longest_streak"))
    val plan = out.queryExecution.executedPlan.toString
    // distinct needs its own (user_id, dn) exchange; after the window's
    // user_id exchange, BOTH downstream aggregates must reuse it
    val n = "Exchange".r.findAllIn(plan).length
    assert(n == 2, s"expected 2 Exchanges (distinct + window), got $n:\n$plan")
  }

  test("interval merge: overlap and touch coalesce, gaps split, dups collapse") {
    // user 1: [0,600) + [300,900) overlap -> [0,900); [900,1500) touches
    // -> extends to [0,1500); [3000,3600) is a new island. user 2: two
    // events at the SAME second collapse into one interval.
    val e = Seq((1L, 0L), (1L, 300L), (1L, 900L), (1L, 3000L),
        (2L, 50L), (2L, 50L))
      .toDF("user_id", "st").withColumn("en", $"st" + 600L)
    val w = Window.partitionBy($"user_id").orderBy($"st", $"en")
    val isl = e
      .withColumn("pmax", max($"en").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_i", when($"pmax".isNull || $"st" > $"pmax", 1).otherwise(0))
      .withColumn("inum", sum($"new_i").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val got = isl.groupBy($"user_id", $"inum")
      .agg(min($"st").as("ist"), max($"en").as("ien"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"ien" - $"ist").as("cov"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2L, 1500L + 600L)), got.toString) // [0,1500)+[3000,3600)
    assert(got(2L) == ((1L, 600L)), got.toString)
  }

  test("attribution: first touch is session-start, last touch skips purchases") {
    // session A (user 1): view(0) click(100) purchase(200,$10) purchase(300,$5)
    //   -> both purchases ft=view; lt=click for BOTH (purchase at 200 is
    //      not a creditable last touch for the one at 300)
    // session B (user 1, after a >30min gap): lone purchase(10000,$7)
    //   -> ft credits "purchase" itself (direct conversion), lt absent
    val rows = Seq(
      (1L, 1L, 0L, "view", 0.0), (2L, 1L, 100L, "click", 0.0),
      (3L, 1L, 200L, "purchase", 10.0), (4L, 1L, 300L, "purchase", 5.0),
      (5L, 1L, 10000L, "purchase", 7.0))
    val e = rows.toDF("event_id", "user_id", "ts_sec", "event_type", "value")
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val wS = Window.partitionBy($"user_id", $"snum").orderBy($"ts_sec", $"event_id")
    val g = e
      .withColumn("new_s",
        when($"ts_sec" - lag($"ts_sec", 1).over(wOrd) > 1800L, 1).otherwise(0))
      .withColumn("snum", sum($"new_s").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("first_ch",
        first($"event_type").over(wS.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("last_ch",
        last(when($"event_type" =!= "purchase", $"event_type"), ignoreNulls = true)
          .over(wS.rowsBetween(Window.unboundedPreceding, -1)))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"first_ch", $"last_ch", $"value")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), Option(r.getString(2))))).toMap
    assert(g(3L) == (("view", Some("click"))))
    assert(g(4L) == (("view", Some("click"))))
    assert(g(5L) == (("purchase", None)))
  }

  test("interval merge and attribution plan shapes: one scan, minimal Exchanges") {
    // a32: window Exchange + final orderBy Exchange, nothing else — both
    // aggregates must reuse the window's user_id partitioning
    val a32 = graft.queries.Relational.a32IntervalMerge(spark, sf0001)
    val p32 = a32.queryExecution.executedPlan.toString
    val n32 = "Exchange".r.findAllIn(p32).length
    assert(n32 == 2, s"a32 expected 2 Exchanges, got $n32:\n$p32")
    // a33: the credit explode must NOT re-evaluate the sessionize
    // pipeline per rollup — exactly ONE parquet scan; Exchanges are the
    // user window + channel aggregate + output sort
    val a33 = graft.queries.Relational.a33Attribution(spark, sf0001)
    val p33 = a33.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p33).length
    val n33 = "Exchange".r.findAllIn(p33).length
    assert(scans == 1, s"a33 expected 1 scan, got $scans:\n$p33")
    assert(n33 == 3, s"a33 expected 3 Exchanges, got $n33:\n$p33")
  }

  test("basket pairs: hand-counted co-occurrence with threshold") {
    // the query's formulation: sorted distinct arrays + double Generate
    // (duplicate line items for part 10 in order 1 must not double-count)
    val items = Seq(
      (1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 40L)).toDF("ok", "pk")
    val baskets = items.groupBy($"ok")
      .agg(sort_array(collect_set($"pk")).as("items"))
    val pairs = baskets
      .select(posexplode($"items").as(Seq("i", "a")), $"items")
      .select($"a", explode(slice($"items", $"i" + 2, size($"items"))).as("b"))
      .groupBy($"a".as("pa"), $"b".as("pb"))
      .agg(count(lit(1)).as("n"))
    val all = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(all((10L, 20L)) == 3L)
    assert(all((10L, 30L)) == 1L)
    assert(all((20L, 30L)) == 1L)
    assert(pairs.filter($"n" >= 3).count() == 1)
  }
}
