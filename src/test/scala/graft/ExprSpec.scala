package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{Haversine, HaversineMiles}

/** Native Catalyst HaversineMiles vs the composed-Column form. */
class ExprSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val coords = Tables.load(spark, sf0001, "events")
    .select($"event_id",
      ($"value" % 89.0 - 44.0).as("lat1"),
      (($"value" * 7.3) % 179.0 - 89.0).as("lon1"),
      ($"user_id" % 89 - 44).cast("double").as("lat2"),
      ($"user_id" * 13 % 179 - 89).cast("double").as("lon2"))

  test("native expression matches the composed form on 1000 rows") {
    val both = coords.select(
      HaversineMiles.native($"lat1", $"lon1", $"lat2", $"lon2").as("native"),
      Haversine.haversineMiles($"lat1", $"lon1", $"lat2", $"lon2").as("composed"))
    val maxDiff = both.agg(max(abs($"native" - $"composed"))).head().getDouble(0)
    assert(maxDiff < 1e-9, s"max diff $maxDiff")
  }

  test("native expression stays inside whole-stage codegen") {
    val plan = coords.select(
      HaversineMiles.native($"lat1", $"lon1", $"lat2", $"lon2").as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
  }

  test("two native instances in one projection codegen cleanly (freshName locals)") {
    // range ids are non-nullable, so nullSafeCodeGen inlines both blocks
    // unscoped into one generated function — duplicate local names would
    // fail Janino here. fallback=false turns that silent degrade into a
    // test failure.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(100).select(
        ($"id" % 89 - 44).cast("double").as("lat1"),
        ($"id" * 7 % 179 - 89).cast("double").as("lon1"),
        ($"id" % 67 - 33).cast("double").as("lat2"),
        ($"id" * 13 % 179 - 89).cast("double").as("lon2"))
      val two = df.select(
        HaversineMiles.native($"lat1", $"lon1", $"lat2", $"lon2").as("d1"),
        HaversineMiles.native($"lat2", $"lon2", $"lat1", $"lon1").as("d2"))
      val rows = two.collect()
      assert(rows.length == 100)
      // haversine is symmetric
      assert(rows.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
      assert(two.queryExecution.executedPlan.toString.contains("*(1) Project"))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("array_dot native matches the HOF fold bit-for-bit and fuses into codegen") {
    import graft.llm.Similarity
    // arrays built from plain expressions (array(), not transform()) so
    // the projection's codegen eligibility is decided by array_dot alone
    val vecs = spark.range(500).select($"id",
      array((1 to 64).map(i =>
        (($"id" * 31 + i * 17) % 97).cast("double") / 7.0 - 6.0): _*).as("a"),
      array((1 to 64).map(i =>
        (($"id" * 13 + i * 11) % 89).cast("double") / 5.0 - 8.0): _*).as("b"))
    val both = vecs.select(
      Similarity.dot($"a", $"b").as("native"),
      Similarity.dotHof($"a", $"b").as("hof"))
    // identical fold order → EXACT equality, not epsilon
    assert(both.filter($"native" =!= $"hof").count() == 0)
    val plan = vecs.select(Similarity.dot($"a", $"b").as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("array_dot null semantics: length mismatch and null element give NULL") {
    import graft.llm.Similarity
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq(
        (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
        (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),
        (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0))
      ).toDF("id", "a", "b")
      // two instances in one projection: freshName guard for the loop locals
      val out = df.select($"id", Similarity.dot($"a", $"b").as("d"),
          Similarity.dot($"b", $"a").as("d2")).collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
      assert(out(1L) == (Some(11.0), Some(11.0)))
      assert(out(2L) == (None, None), "length mismatch must be NULL")
      assert(out(3L) == (None, None), "null element must be NULL")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("factorize: dense codes in key order, no full-table global sort") {
    import graft.expr.Functions
    val df = spark.range(1000).select(($"id" * 37 % 13).as("k"), $"id")
    val out = Functions.factorize(df, "k", "code")
    val codes = out.select("k", "code").distinct().orderBy("k").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(codes.toSeq == codes.map(_._1).sorted.zipWithIndex.map { case (k, i) => k -> i.toLong }.toSeq)
    assert(out.count() == 1000)
    // the only Sort in the plan must feed the distinct-key code table,
    // never the full input: the main branch joins via broadcast
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("factorize: null keys keep their rows and code as -1 (pandas NaN semantics)") {
    import graft.expr.Functions
    val df = Seq(Some("b"), None, Some("a"), None, Some("b")).toDF("k")
    val out = Functions.factorize(df, "k", "code")
    assert(out.count() == 5, "null-key rows must not be dropped")
    val byKey = out.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byKey(Some("a")) == 0L && byKey(Some("b")) == 1L)
    assert(byKey(None) == -1L, "null key must code as -1, not vanish")
  }

  test("nulls propagate") {
    val r = Seq((Some(1.0), 2.0), (None, 2.0)).toDF("a", "b")
      .select(HaversineMiles.native($"a", $"b", lit(3.0), lit(4.0)).as("d"))
      .collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }

  test("registered SQL function works") {
    HaversineMiles.register(spark)
    val d = spark.sql(
      "SELECT haversine_miles(37.7749D, -122.4194D, 34.0522D, -118.2437D) AS d")
      .head().getDouble(0)
    assert(math.abs(d - 347.4) < 1.0, s"got $d")
  }

  test("ewma closed form matches the sequential pandas-ewm recursion") {
    import graft.expr.Functions
    val rnd = new scala.util.Random(11)
    val rows = (0 until 60).map(i => (1L + i % 3, i.toLong, rnd.nextDouble() * 100))
    val df = rows.toDF("k", "t", "v")
    val got = Functions.ewma(df, Seq("k"), Seq("t"), "v", alpha = 0.1, "ewma")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // reference recursion: adjust=True pandas form
    rows.groupBy(_._1).foreach { case (k, rs) =>
      var num = 0.0; var den = 0.0
      rs.sortBy(_._2).foreach { case (_, t, v) =>
        num = num * 0.9 + v; den = den * 0.9 + 1.0
        assert(math.abs(got((k, t)) - num / den) < 1e-9,
          s"k=$k t=$t got ${got((k, t))} want ${num / den}")
      }
    }
  }

  test("ewma epoch rescale: 1e6-row single key matches the sequential fold, no Inf/NaN") {
    import graft.expr.Functions
    // The naive (1-α)^{-rn} running-sum form overflows double at
    // rn ≈ 6,600 for α=0.1; this key is 150× past that bound.
    val n = 1000000
    val df = spark.range(n).select(col("id").as("t"))
      .withColumn("k", lit(1L))
      .withColumn("v", expr("cast(abs(hash(t)) % 10000 as double) / 100.0"))
    val got = Functions.ewma(df, Seq("k"), Seq("t"), "v", alpha = 0.1, "ewma")
      .select("t", "v", "ewma").orderBy("t")
      .collect()
    assert(got.length == n)
    var num = 0.0; var den = 0.0
    var checked = 0
    got.foreach { r =>
      val v = r.getDouble(1); val e = r.getDouble(2)
      num = num * 0.9 + v; den = den * 0.9 + 1.0
      assert(!e.isNaN && !e.isInfinite, s"t=${r.getLong(0)} produced $e")
      // spot-check densely early (epoch boundaries land at 953) and
      // sparsely late; the fold reference is exact throughout
      if (r.getLong(0) < 5000 || r.getLong(0) % 997 == 0) {
        assert(math.abs(e - num / den) < 1e-9,
          s"t=${r.getLong(0)} got $e want ${num / den}")
        checked += 1
      }
    }
    assert(checked > 5500)
  }

  test("mode_det UDAF: exact mode, smallest value wins ties, survives repartition") {
    import graft.expr.Aggregators
    // values 7 and 3 both appear twice: deterministic mode must pick 3
    val df = Seq(7L, 3L, 7L, 3L, 9L).toDF("v").repartition(8)
    val m = df.agg(Aggregators.modeDet($"v").as("m")).head().getLong(0)
    assert(m == 3L, s"tie must break to the smallest value, got $m")
  }

  test("distinct_topk UDAF: k smallest distinct, order- and partition-independent") {
    import graft.expr.Aggregators
    val df = Seq(9L, 1L, 5L, 1L, 9L, 2L, 8L, 7L).toDF("v")
    val a = df.repartition(1).agg(Aggregators.distinctTopK($"v", 3)).head().getSeq[Long](0)
    val b = df.repartition(7).agg(Aggregators.distinctTopK($"v", 3)).head().getSeq[Long](0)
    assert(a == Seq(1L, 2L, 5L) && b == a, s"got $a / $b")
  }

  test("UDAFs are SQL-registered and group-aware") {
    graft.expr.Aggregators.register(spark)
    Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L)).toDF("g", "v")
      .createOrReplaceTempView("udaf_t")
    val rows = spark.sql(
      "SELECT g, mode_det(v) AS m, distinct_top8(v) AS s FROM udaf_t GROUP BY g ORDER BY g")
      .collect()
    assert(rows(0).getLong(1) == 1L)
    assert(rows(0).getSeq[Long](2) == Seq(1L, 2L))
    assert(rows(1).getLong(1) == 5L)
  }

  test("DvBitmapDeleted: codegen == interpreted eval at word boundaries, absent files, short bitmaps") {
    import graft.expr.{DvBitmap, DvBitmapDeleted}
    import org.apache.spark.unsafe.types.UTF8String
    // one file with bits {0, 63, 64, 1000} set; 'other' absent entirely
    val words = new Array[Long]((1000 >>> 6) + 1)
    Seq(0, 63, 64, 1000).foreach(i => words(i >>> 6) |= 1L << i)
    val m = new java.util.HashMap[String, Array[Long]]()
    m.put("f1", words)
    val bc = spark.sparkContext.broadcast(m)
    val ris = Seq(0L, 1L, 62L, 63L, 64L, 65L, 999L, 1000L, 1001L,
      (words.length.toLong * 64) + 5L) // beyond the bitmap's words
    val rows = ris.flatMap(ri => Seq(("f1", ri), ("other", ri)))
    val df = rows.toDF("f", "ri")
    // codegen path (whole-stage): the predicate as a selected column
    val got = df.select($"f", $"ri",
        DvBitmap.deleted(bc, $"f", $"ri").as("del"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    val set = Set(0L, 63L, 64L, 1000L)
    rows.foreach { case (f, ri) =>
      val want = f == "f1" && set.contains(ri)
      assert(got((f, ri)) == want, s"codegen ($f, $ri): got ${got((f, ri))}, want $want")
    }
    // interpreted eval path (direct Expression.eval) must agree
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{LongType, StringType}
    rows.foreach { case (f, ri) =>
      val e = DvBitmapDeleted(
        BoundReference(0, StringType, nullable = true),
        BoundReference(1, LongType, nullable = false), bc)
      val v = e.eval(InternalRow(UTF8String.fromString(f), ri))
      assert(v == (f == "f1" && set.contains(ri)), s"eval ($f, $ri) = $v")
    }
    // NULL file path reads as "not deleted" in interpreted eval
    val eNull = DvBitmapDeleted(Literal(null, StringType),
      BoundReference(1, LongType, nullable = false), bc)
    assert(eNull.eval(InternalRow(null, 0L)) == false)
  }

  test("DvBitmap.cachedBroadcast: same immutable key returns the same broadcast") {
    import graft.expr.DvBitmap
    val dv = Seq(("fA", 1L), ("fA", 9L)).toDF("file_path", "row_index")
    val a = DvBitmap.cachedBroadcast(spark, Seq("s1", "s2"), Seq("fA"), dv)
    val b = DvBitmap.cachedBroadcast(spark, Seq("s2", "s1"), Seq("fA"),
      sys.error("must not rebuild"))
    assert(a eq b, "sidecar-set + dirty-set key must hit the cache (order-insensitive)")
    val c = DvBitmap.cachedBroadcast(spark, Seq("s1", "s3"), Seq("fA"), dv)
    assert(!(a eq c), "a different sidecar set must rebuild")
    assert(a.value.get("fA") != null &&
      (a.value.get("fA")(0) & (1L << 1)) != 0L && (a.value.get("fA")(0) & (1L << 9)) != 0L)
  }
}
