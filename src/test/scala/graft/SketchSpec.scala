package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** Mergeable-sketch operators: HLL distinct tables (slice → union
  * rollup, parquet persistence) and CMS frequency point estimates —
  * tolerance, one-sided error, and partition-order determinism. */
class SketchSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def events = Tables.load(spark, sf0001, "events")
    .withColumn("day", to_date(timestamp_seconds(Tables.tsSec($"ts"))))

  test("hll rollup estimate stays within 5% of exact per-group distinct") {
    val slices = Sketches.distinctSketchTable(events, Seq("event_type", "day"), "user_id")
    val est = Sketches.rollupDistinct(slices, Seq("event_type"))
      .select($"event_type", $"distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val e = est(k)
      assert(math.abs(e - ex).toDouble / ex <= 0.05,
        s"$k: est $e vs exact $ex drifted past 5%")
    }
  }

  test("union of day slices equals the sketch of the whole table") {
    // HLL registers are max-merged: sketch(union of slices) and
    // union(sketches of slices) hold identical registers, so the
    // rollup answers EXACTLY what a one-shot sketch would — the
    // property that makes incremental daily builds safe.
    val slices = Sketches.distinctSketchTable(events, Seq("event_type", "day"), "user_id")
    val viaSlices = Sketches.rollupDistinct(slices, Seq("event_type"))
      .select($"event_type", $"distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = Sketches.rollupDistinct(
      Sketches.distinctSketchTable(events, Seq("event_type"), "user_id"),
      Seq("event_type"))
      .select($"event_type", $"distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSlices == oneShot)
  }

  test("sketch slices persist to parquet and answer after reload") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_").toString
    Sketches.distinctSketchTable(events, Seq("event_type", "day"), "user_id")
      .write.mode("overwrite").parquet(dir)
    val live = Sketches.rollupDistinct(
      Sketches.distinctSketchTable(events, Seq("event_type", "day"), "user_id"),
      Seq("event_type"))
      .select($"event_type", $"distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reloaded = Sketches.rollupDistinct(spark.read.parquet(dir), Seq("event_type"))
      .select($"event_type", $"distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reloaded == live)
  }

  test("global rollup (no keep cols) estimates the overall distinct count") {
    val slices = Sketches.distinctSketchTable(events, Seq("event_type", "day"), "user_id")
    val est = Sketches.rollupDistinct(slices, Seq.empty)
      .select($"distinct_est").head().getLong(0)
    val exact = events.select(countDistinct($"user_id")).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= 0.05, s"est $est vs exact $exact")
  }

  test("slice-table maintenance: merge deltas == one-shot build; re-delivery idempotent") {
    // the incremental loop: day-1 table, then day-2 arrives as a delta
    val keys = Seq("event_type", "day")
    val d1 = events.filter($"day" <= "2024-01-10")
    val d2 = events.filter($"day" > "2024-01-10")
    val bound = events.agg(min($"day"), max($"day")).head()
    assert(d1.count() > 0 && d2.count() > 0, s"split degenerate: $bound")
    val stored = Sketches.distinctSketchTable(d1, keys, "user_id")
    val delta = Sketches.distinctSketchTable(d2, keys, "user_id")
    def est(t: org.apache.spark.sql.DataFrame) =
      Sketches.rollupDistinct(t, Seq("event_type"))
        .select($"event_type", $"distinct_est")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = Sketches.mergeSliceTables(stored, delta, keys)
    val oneShot = Sketches.distinctSketchTable(events, keys, "user_id")
    assert(est(merged) == est(oneShot))
    // idempotence: merging the SAME delta again changes nothing
    // (HLL registers max-merge — replayed micro-batches are safe)
    assert(est(Sketches.mergeSliceTables(merged, delta, keys)) == est(oneShot))
  }

  test("streaming foreachBatch maintains the slice table incrementally") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_stream_").toString
    val mem = MemoryStream[(String, java.sql.Timestamp, Long)](spark)
    val q = mem.toDF().toDF("event_type", "ts", "user_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = Sketches.distinctSketchTable(
          batch.withColumn("day", to_date($"ts")),
          Seq("event_type", "day"), "user_id")
        val merged =
          try Sketches.mergeSliceTables(
            spark.read.parquet(dir), delta, Seq("event_type", "day"))
          catch { case _: org.apache.spark.sql.AnalysisException => delta }
        // read fully materializes before the overwrite via the merge agg
        val rows = merged.collect()
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq), merged.schema)
          .write.mode("overwrite").parquet(dir)
      }.start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(("click", t("2024-01-01 10:00:00"), 1L),
      ("click", t("2024-01-01 11:00:00"), 2L))
    q.processAllAvailable()
    mem.addData(("click", t("2024-01-01 12:00:00"), 2L), // dup user
      ("click", t("2024-01-01 13:00:00"), 3L),
      ("view", t("2024-01-02 10:00:00"), 7L))
    q.processAllAvailable(); q.stop()
    val estMap = Sketches.rollupDistinct(spark.read.parquet(dir), Seq("event_type"))
      .select($"event_type", $"distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estMap == Map("click" -> 3L, "view" -> 1L), estMap.toString)
  }

  test("merge treats a NULL key value as ONE key (null-safe join)") {
    // to_date of a null ts yields a null day — with plain-equality
    // anti/semi joins the null-keyed stored and delta rows would BOTH
    // survive as separate rows; the null-safe full-outer merges them.
    val keys = Seq("event_type", "day")
    def rows(users: Seq[Long]) = users.toDF("user_id")
      .withColumn("event_type", lit("click"))
      .withColumn("day", lit(null).cast("date"))
    val stored = Sketches.distinctSketchTable(rows(Seq(1L, 2L)), keys, "user_id")
    val delta = Sketches.distinctSketchTable(rows(Seq(2L, 3L)), keys, "user_id")
    val merged = Sketches.mergeSliceTables(stored, delta, keys)
    assert(merged.count() == 1L,
      "null-keyed stored and delta rows must merge to one row, not duplicate")
    val est = Sketches.rollupDistinct(merged, Seq("event_type"))
      .select($"distinct_est").head().getLong(0)
    assert(est == 3L)
  }

  test("merge scans the stored table ONCE (plan assertion)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_scan_").toString
    val keys = Seq("event_type", "day")
    Sketches.distinctSketchTable(events.filter($"day" <= "2024-01-10"), keys, "user_id")
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val delta = Sketches.distinctSketchTable(
      events.filter($"day" > "2024-01-10"), keys, "user_id")
    val merged = Sketches.mergeSliceTables(stored, delta, keys)
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val scans = merged.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation if h.location.rootPaths.exists(_.toString.contains(dir)) => 1
        case _ => 0
      }
    }.sum
    assert(scans == 1,
      s"stored table scanned $scans times — the merge is specified as one pass")
  }

  test("cms slice merge == one-shot build") {
    // CMS cells are plain counters: building per-day slices and
    // merging them (mergeInPlace) must estimate identically to one
    // sketch over the whole table — the contract that lets frequency
    // tables maintain incrementally like the HLL slice tables.
    val slices = Sketches.cmsSliceTable(events, Seq("day"), "user_id")
      .select($"cms").collect().map(_.getAs[Array[Byte]](0)).toSeq
    assert(slices.size > 1, "need multiple day slices for a meaningful merge")
    val merged = Sketches.cmsMergeSlices(slices)
    val oneShot = Sketches.cmsBuild(events, "user_id")
    val keys = Seq.range(0L, 50L)
    assert(Sketches.cmsEstimates(merged, keys) == Sketches.cmsEstimates(oneShot, keys))
  }

  test("distributed cms rollup == driver merge == one-shot; rollup to coarser keys works") {
    val slices = Sketches.cmsSliceTable(events, Seq("event_type", "day"), "user_id")
    // global rollup, fully distributed (no driver collect of slices)
    val global = Sketches.cmsRollup(slices, Seq.empty)
      .select($"cms").head().getAs[Array[Byte]](0)
    val oneShot = Sketches.cmsBuild(events, "user_id")
    val keys = Seq.range(0L, 50L)
    assert(Sketches.cmsEstimates(global, keys) == Sketches.cmsEstimates(oneShot, keys))
    // partial rollup day→event_type matches per-group one-shot builds
    val perType = Sketches.cmsRollup(slices, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val types = events.select($"event_type").distinct().as[String].collect()
    types.foreach { t =>
      val direct = Sketches.cmsBuild(events.filter($"event_type" === t), "user_id")
      assert(Sketches.cmsEstimates(perType(t), keys) ==
        Sketches.cmsEstimates(direct, keys), s"type $t rollup diverged")
    }
  }

  test("cms slice-table merge: delta merge == one-shot; streaming foreachBatch loop") {
    // batch half: day-split merge equals a one-shot slice build
    val keys = Seq("event_type", "day")
    val d1 = events.filter($"day" <= "2024-01-10")
    val d2 = events.filter($"day" > "2024-01-10")
    val merged = Sketches.cmsMergeSliceTables(
      Sketches.cmsSliceTable(d1, keys, "user_id"),
      Sketches.cmsSliceTable(d2, keys, "user_id"), keys)
    val oneShot = Sketches.cmsSliceTable(events, keys, "user_id")
    def globalEst(t: org.apache.spark.sql.DataFrame) =
      Sketches.cmsEstimates(
        Sketches.cmsRollup(t, Seq.empty).select($"cms").head().getAs[Array[Byte]](0),
        Seq.range(0L, 50L))
    assert(globalEst(merged) == globalEst(oneShot))
    assert(merged.count() == oneShot.count())

    // streaming half: foreachBatch maintains the frequency table —
    // each micro-batch merges ONCE (the engine's exactly-once
    // foreachBatch contract supplies the idempotence CMS addition
    // lacks on its own)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_cms_stream_").toString
    val mem = MemoryStream[(String, java.sql.Timestamp, Long)](spark)
    val q = mem.toDF().toDF("event_type", "ts", "user_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = Sketches.cmsSliceTable(
          batch.withColumn("day", to_date($"ts")), Seq("event_type", "day"), "user_id")
        val m =
          try Sketches.cmsMergeSliceTables(
            spark.read.parquet(dir), delta, Seq("event_type", "day"))
          catch { case _: org.apache.spark.sql.AnalysisException => delta }
        val rows = m.collect()
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq), m.schema)
          .write.mode("overwrite").parquet(dir)
      }.start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(("click", t("2024-01-01 10:00:00"), 1L),
      ("click", t("2024-01-01 11:00:00"), 1L))
    q.processAllAvailable()
    mem.addData(("click", t("2024-01-01 12:00:00"), 1L),
      ("click", t("2024-01-01 13:00:00"), 2L))
    q.processAllAvailable(); q.stop()
    val sk = Sketches.cmsRollup(spark.read.parquet(dir), Seq("event_type"))
      .select($"cms").head().getAs[Array[Byte]](0)
    // user 1 appeared 3 times across batches, user 2 once — CMS never
    // undercounts and here (tiny keyspace) is exact
    assert(Sketches.cmsEstimates(sk, Seq(1L, 2L)) == Seq(1L -> 3L, 2L -> 1L))
  }

  test("cms estimates are one-sided: never below exact, overshoot within eps·N") {
    val eps = 0.001
    val n = events.count()
    val sketch = Sketches.cmsBuild(events, "user_id", eps = eps)
    val exact = events.groupBy($"user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keys = exact.keys.toSeq.sorted.take(50)
    Sketches.cmsEstimates(sketch, keys).foreach { case (k, est) =>
      val ex = exact(k)
      assert(est >= ex, s"CMS under-counted key $k: $est < $ex")
      assert(est - ex <= math.ceil(eps * n).toLong + 1,
        s"CMS overshoot for $k: $est vs $ex exceeds eps·N")
    }
  }

  test("cms estimates are identical across partition layouts") {
    val a = Sketches.cmsBuild(events, "user_id")
    val b = Sketches.cmsBuild(events.repartition(7), "user_id")
    val keys = Seq.range(0L, 20L)
    assert(Sketches.cmsEstimates(a, keys) == Sketches.cmsEstimates(b, keys))
  }

  // ---------------- KLL quantile sketches ----------------

  /** True normalized rank of `est` among a group's exact values. */
  private def trueRank(values: Array[Double], est: Double): Double =
    values.count(_ <= est).toDouble / values.length

  // KLL k=200 bounds normalized rank error at ~1.65% (99% conf);
  // 5% tolerance leaves generous head-room against compaction coins.
  private val rankTol = 0.05

  test("kll rollup quantiles land within rank tolerance of exact per group") {
    val slices = Sketches.kllSliceTable(events, Seq("event_type", "day"), "value")
    val rolled = Sketches.kllRollup(slices, Seq("event_type"), Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = events.select($"event_type", $"value".cast("double"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    rolled.foreach { case (tpe, (q50, q90, q99)) =>
      val vals = exact(tpe)
      assert(math.abs(trueRank(vals, q50) - 0.5) <= rankTol, s"$tpe p50: $q50")
      assert(math.abs(trueRank(vals, q90) - 0.9) <= rankTol, s"$tpe p90: $q90")
      assert(math.abs(trueRank(vals, q99) - 0.99) <= rankTol, s"$tpe p99: $q99")
    }
  }

  test("kll slice merge preserves item weight EXACTLY and ranks within tolerance") {
    // n is conserved exactly under merge (weights add) — a deterministic
    // assertion the randomized quantile positions can't give us.
    val slices = Sketches.kllSliceTable(events, Seq("event_type", "day"), "value")
    val global = Sketches.kllRollup(slices, Seq.empty, Seq(0.5)).collect()(0)
    val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(global.getAs[Array[Byte]]("kll")))
    val nonNull = events.filter($"value".isNotNull).count()
    assert(sk.getN == nonNull, s"merged weight ${sk.getN} != row count $nonNull")
    val vals = events.select($"value".cast("double")).collect().map(_.getDouble(0)).sorted
    assert(math.abs(trueRank(vals, global.getAs[Double]("q50")) - 0.5) <= rankTol)
  }

  test("kll slices persist to parquet and answer after reload") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kll_").toString
    Sketches.kllSliceTable(events, Seq("event_type"), "value")
      .write.mode("overwrite").parquet(tmp)
    val rolled = Sketches.kllRollup(spark.read.parquet(tmp), Seq("event_type"))
    assert(rolled.count() == events.select($"event_type").distinct().count())
    assert(rolled.filter($"q99".isNull).count() == 0)
  }

  test("kll slice-table maintenance: day-split merge == within tolerance of one-shot") {
    val days = events.select($"day").distinct().orderBy($"day").collect().map(_.getDate(0))
    val split = days(days.length / 2)
    val stored = Sketches.kllSliceTable(
      events.filter($"day" < split), Seq("event_type"), "value")
    val delta = Sketches.kllSliceTable(
      events.filter($"day" >= split), Seq("event_type"), "value")
    val merged = Sketches.kllMergeSliceTables(stored, delta, Seq("event_type"))
    val est = Sketches.kllRollup(merged, Seq("event_type"), Seq(0.9))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exact = events.select($"event_type", $"value".cast("double"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    est.foreach { case (tpe, q90) =>
      assert(math.abs(trueRank(exact(tpe), q90) - 0.9) <= rankTol,
        s"$tpe merged p90 off: $q90")
    }
    // weight conservation across the merge, per key
    merged.collect().foreach { r =>
      val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(r.getAs[Array[Byte]]("kll")))
      val n = events.filter($"event_type" === r.getString(0) && $"value".isNotNull).count()
      assert(sk.getN == n, s"${r.getString(0)}: ${sk.getN} != $n")
    }
  }

  test("kll slice table shuffles SKETCH BLOBS, not raw values (plan assertion)") {
    // the one Exchange must sit ABOVE the mapPartitions pre-reduce: the
    // shuffle carries one ~KB sketch per (key, partition), never the
    // raw value rows — the map-side-combine contract of the scaladoc
    val t = Sketches.kllSliceTable(events, Seq("event_type"), "value")
    val plan = t.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges == 1, s"expected 1 shuffle, got $nExchanges:\n$plan")
    // plans print top-down: the Exchange (above) must appear BEFORE the
    // MapPartitions pre-reduce (below) in the string
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val mpIdx = plan.indexOf("MapPartitions")
    assert(mpIdx > exIdx && exIdx >= 0,
      s"mapPartitions pre-reduce must sit below the shuffle:\n$plan")
  }

  test("kll streaming foreachBatch maintains the quantile table incrementally") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_kll_stream_").toString
    val mem = MemoryStream[(String, Double)](spark)
    val q = mem.toDF().toDF("g", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = Sketches.kllSliceTable(batch, Seq("g"), "v")
        val merged =
          try Sketches.kllMergeSliceTables(
            spark.read.parquet(dir), delta, Seq("g"))
          catch { case _: org.apache.spark.sql.AnalysisException => delta }
        val rows = merged.collect()
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq), merged.schema)
          .write.mode("overwrite").parquet(dir)
      }.start()
    mem.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
    q.processAllAvailable()
    mem.addData(("a", 3.0), ("a", 4.0), ("b", 20.0))
    q.processAllAvailable(); q.stop()
    // at this size the sketch is exact: medians and weights are pinned
    val rolled = Sketches.kllRollup(spark.read.parquet(dir), Seq("g"), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rolled("a") >= 2.0 && rolled("a") <= 3.0, rolled.toString)
    assert(rolled("b") >= 10.0 && rolled("b") <= 20.0, rolled.toString)
    spark.read.parquet(dir).collect().foreach { r =>
      val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(r.getAs[Array[Byte]]("kll")))
      val expect = if (r.getString(0) == "a") 4L else 2L
      assert(sk.getN == expect, s"${r.getString(0)} weight ${sk.getN}")
    }
  }

  test("kll: NULL values are skipped; an all-NULL group yields a NULL quantile") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", None),
      ("b", Option.empty[Double])
    ).toDF("g", "v")
    val t = Sketches.kllSliceTable(df, Seq("g"), "v")
    assert(t.count() == 2, "all-NULL group must still produce a row")
    val rolled = Sketches.kllRollup(t, Seq("g"), Seq(0.5))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rolled("a").exists(q => q >= 1.0 && q <= 2.0))
    assert(rolled("b").isEmpty, "empty sketch must surface NULL, not crash")
  }

  test("streaming foreachBatch maintains the EXACT aggregate table (MaterializedAgg)") {
    // the exact-MV twin of the HLL/CMS/KLL loops: each micro-batch
    // pre-reduces with build() and folds into the stored table with one
    // merge() — counts/sums ADD, so the engine's exactly-once
    // foreachBatch contract supplies idempotence (same as CMS/KLL)
    import graft.operators.MaterializedAgg
    import MaterializedAgg._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val measures = Seq(countRows("n"), sumOf($"v", "s"),
      minOf($"v", "mn"), maxOf($"v", "mx"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_stream_").toString
    val mem = MemoryStream[(Long, Long)](spark)
    val q = mem.toDF().toDF("user_id", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = MaterializedAgg.build(batch, Seq("user_id"), measures)
        val merged =
          try MaterializedAgg.merge(
            spark.read.parquet(dir), delta, Seq("user_id"), measures)
          catch { case _: org.apache.spark.sql.AnalysisException => delta }
        val rows = merged.collect()
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq), merged.schema)
          .write.mode("overwrite").parquet(dir)
      }.start()
    mem.addData((1L, 10L), (1L, 20L), (2L, 5L))
    q.processAllAvailable()
    mem.addData((2L, 7L), (3L, 1L))
    q.processAllAvailable(); q.stop()
    val all = Seq((1L, 10L), (1L, 20L), (2L, 5L), (2L, 7L), (3L, 1L))
      .toDF("user_id", "v")
    val oneShot = MaterializedAgg.build(all, Seq("user_id"), measures)
    val stored = spark.read.parquet(dir)
      .select(oneShot.columns.map(col): _*)
    assert(stored.exceptAll(oneShot).isEmpty && oneShot.exceptAll(stored).isEmpty,
      "stream-maintained table must equal the one-shot aggregate")
  }
}
