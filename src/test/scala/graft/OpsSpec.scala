package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Layout, MaterializedAgg, Quality, Scd}

/** Round-4 maintenance/quality/layout operators: SCD2 merge semantics,
  * one-pass profiling (exact + approx), expectation validation against
  * hand-built violations, Morton interleave bit layout, and the
  * Z-order layout's measurable locality win over a linear sort. */
class OpsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // ---------------- SCD2 ----------------

  private def hist0 = Seq(
    // key, tracked, valid_from, valid_to, is_current
    (1L, "A", java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
      null.asInstanceOf[java.sql.Timestamp], true),
    (2L, "B", java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
      null.asInstanceOf[java.sql.Timestamp], true),
    // key 3 already has one closed version + a current one
    (3L, "C0", java.sql.Timestamp.valueOf("2019-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), false),
    (3L, "C1", java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
      null.asInstanceOf[java.sql.Timestamp], true)
  ).toDF("k", "v", "valid_from", "valid_to", "is_current")

  private def upd(rows: (Long, String)*) = rows.toSeq
    .toDF("k", "v")
    .withColumn("ts", lit(java.sql.Timestamp.valueOf("2021-06-01 00:00:00")))

  test("scd2Merge: changed key closes old version and opens a new one") {
    val out = Scd.scd2Merge(hist0, upd(1L -> "A2"), Seq("k"), Seq("v"), "ts")
      .orderBy("k", "valid_from").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.length == 2)
    val (closed, opened) = (k1(0), k1(1))
    assert(closed.getString(1) == "A" && !closed.getBoolean(4) &&
      closed.getTimestamp(3) == java.sql.Timestamp.valueOf("2021-06-01 00:00:00"))
    assert(opened.getString(1) == "A2" && opened.getBoolean(4) &&
      opened.getTimestamp(2) == java.sql.Timestamp.valueOf("2021-06-01 00:00:00") &&
      opened.getTimestamp(3) == null)
    // untouched keys intact (2 current; 3 has closed + current)
    assert(out.count(_.getLong(0) == 2L) == 1)
    assert(out.count(_.getLong(0) == 3L) == 2)
  }

  test("scd2Merge: identical update is a no-op (idempotent re-delivery)") {
    val out = Scd.scd2Merge(hist0, upd(2L -> "B"), Seq("k"), Seq("v"), "ts")
    assert(out.count() == hist0.count())
    assert(out.filter($"k" === 2L).count() == 1)
    assert(out.filter($"k" === 2L && $"is_current").head.getString(1) == "B")
  }

  test("scd2Merge: new key inserts an open row; closed history never touched") {
    val out = Scd.scd2Merge(hist0, upd(9L -> "Z"), Seq("k"), Seq("v"), "ts")
      .orderBy("k", "valid_from")
    val k9 = out.filter($"k" === 9L).collect()
    assert(k9.length == 1 && k9(0).getBoolean(4) && k9(0).getTimestamp(3) == null)
    // pre-existing closed version of key 3 flows through byte-identical
    val c3 = out.filter($"k" === 3L && !$"is_current").head
    assert(c3.getString(1) == "C0" &&
      c3.getTimestamp(3) == java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
  }

  test("scd2Merge: merging twice with the same batch equals merging once") {
    val batch = upd(1L -> "A2", 9L -> "Z")
    val once = Scd.scd2Merge(hist0, batch, Seq("k"), Seq("v"), "ts")
    val twice = Scd.scd2Merge(once, batch, Seq("k"), Seq("v"), "ts")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("scd2Merge: null-safe tracked-column compare (null -> value and value -> null)") {
    val h = Seq((1L, null.asInstanceOf[String],
      java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
      null.asInstanceOf[java.sql.Timestamp], true))
      .toDF("k", "v", "valid_from", "valid_to", "is_current")
    // null -> "x" is a change; null -> null is not
    val changed = Scd.scd2Merge(h, upd(1L -> "x"), Seq("k"), Seq("v"), "ts")
    assert(changed.count() == 2)
    val same = Scd.scd2Merge(h,
      Seq(1L).toDF("k").withColumn("v", lit(null).cast("string"))
        .withColumn("ts", lit(java.sql.Timestamp.valueOf("2021-06-01 00:00:00"))),
      Seq("k"), Seq("v"), "ts")
    assert(same.count() == 1)
  }

  // ---------------- profiling ----------------

  test("mergeUpsert: basic update-else-insert semantics") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val updates = Seq((2L, "B2"), (3L, "c")).toDF("k", "v")
    val out = Scd.mergeUpsert(target, updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
  }

  test("mergeUpsert: NULL key upserts as one key, not a duplicate append") {
    // plain-equality anti-joins match NULL to nothing: the NULL-keyed
    // target row would always survive AND the NULL-keyed update would
    // always append. The null-safe <=> condition replaces instead.
    val target = Seq((Some(1L), "a"), (None, "old")).toDF("k", "v")
    val updates = Seq((Option.empty[Long], "new")).toDF("k", "v")
    val out = Scd.mergeUpsert(target, updates, Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1))
      .toMap
    assert(out == Map(Some(1L) -> "a", None -> "new"),
      s"expected the null-keyed row replaced, got $out")
  }

  // ---------------- CDC changelog apply ----------------

  test("applyChangelog: latest entry per key wins; D deletes; I inserts; untouched rows survive") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val log = Seq(
      (1L, "a1", "U", 1), (1L, "a2", "U", 2), // superseded then final
      (2L, "b", "D", 1),                      // delete
      (4L, "d", "I", 1)                       // insert
    ).toDF("k", "v", "op", "ts")
    val out = Scd.applyChangelog(snap, log, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a2", 3L -> "c", 4L -> "d"))
  }

  test("applyChangelog: delete after update does not resurrect; prefix+suffix == whole log") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val prefix = Seq((1L, "a1", "U", 1)).toDF("k", "v", "op", "ts")
    val suffix = Seq((1L, "x", "D", 2), (2L, "b2", "U", 2)).toDF("k", "v", "op", "ts")
    val composed = Scd.applyChangelog(
      Scd.applyChangelog(snap, prefix, Seq("k")), suffix, Seq("k"))
    val whole = Scd.applyChangelog(snap, prefix.unionByName(suffix), Seq("k"))
    val cm = composed.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val wm = whole.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cm == Map(2L -> "b2"), s"delete must not resurrect: $cm")
    assert(cm == wm, "changelog application must compose")
  }

  test("applyChangelog: seq column breaks same-ts ties; exact re-delivery is idempotent") {
    val snap = Seq((1L, "a")).toDF("k", "v")
    val log = Seq(
      (1L, "first", "U", 5, 10L), (1L, "second", "U", 5, 11L),
      (1L, "second", "U", 5, 11L) // exact duplicate re-delivery
    ).toDF("k", "v", "op", "ts", "seq")
    val out = Scd.applyChangelog(snap, log, Seq("k"), seqCol = Some("seq"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.toSeq == Seq(1L -> "second"))
    // replaying the whole log over the result changes nothing
    val again = Scd.applyChangelog(
      Scd.applyChangelog(snap, log, Seq("k"), seqCol = Some("seq")),
      log, Seq("k"), seqCol = Some("seq"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(again.toSeq == Seq(1L -> "second"))
  }

  test("applyChangelog: without seq, a same-tick U/D tie resolves to DELETE") {
    val snap = Seq((1L, "a")).toDF("k", "v")
    val log = Seq((1L, "a1", "U", 5), (1L, "a1", "D", 5)).toDF("k", "v", "op", "ts")
    val out = Scd.applyChangelog(snap, log, Seq("k")).collect()
    assert(out.isEmpty, "delete must win an un-sequenced same-ts tie")
  }

  test("applyChangelog: a NULL or unknown op raises instead of acting as a silent delete") {
    val snap = Seq((1L, "a")).toDF("k", "v")
    val nullOp = Seq((1L, "x", Option.empty[String], 1)).toDF("k", "v", "op", "ts")
    val e1 = intercept[Exception] {
      Scd.applyChangelog(snap, nullOp, Seq("k")).collect()
    }
    assert(e1.getMessage.contains("invalid op") ||
      Option(e1.getCause).exists(_.getMessage.contains("invalid op")), e1.getMessage)
    val badOp = Seq((1L, "x", "delete", 1)).toDF("k", "v", "op", "ts")
    val e2 = intercept[Exception] {
      Scd.applyChangelog(snap, badOp, Seq("k")).collect()
    }
    assert(e2.getMessage.contains("invalid op") ||
      Option(e2.getCause).exists(_.getMessage.contains("invalid op")), e2.getMessage)
  }

  test("applyChangelog scans the snapshot ONCE and never windows it (plan assertion)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_scan_").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    val snap = spark.read.parquet(dir)
    val log = Seq((1L, "a1", "U", 1), (3L, "c", "I", 1)).toDF("k", "v", "op", "ts")
    val out = Scd.applyChangelog(snap, log, Seq("k"))
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val plan = out.queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation if h.location.rootPaths.exists(_.toString.contains(dir)) => 1
        case _ => 0
      }
    }.sum
    assert(scans == 1, s"snapshot scanned $scans times — specified as one pass")
    // the latest-per-key window must run over the changelog subtree only:
    // no Window operator may sit above the snapshot scan
    val windowsOverSnap = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.collectLeaves().exists {
            case l: LogicalRelation => l.relation match {
              case h: HadoopFsRelation =>
                h.location.rootPaths.exists(_.toString.contains(dir))
              case _ => false
            }
            case _ => false
          } => w
    }
    assert(windowsOverSnap.isEmpty, "a Window sits above the snapshot scan")
  }

  test("applyChangelog: NULL key merges as one key") {
    val snap = Seq((Some(1L), "a"), (None, "old")).toDF("k", "v")
    val log = Seq((Option.empty[Long], "new", "U", 1)).toDF("k", "v", "op", "ts")
    val out = Scd.applyChangelog(snap, log, Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1))
      .toMap
    assert(out == Map(Some(1L) -> "a", None -> "new"))
  }

  test("profile: exact metrics match hand-computed values; one job") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (3L, Some("a"))
    ).toDF("id", "s")
    val p = Quality.profile(df, Seq("id", "s"), exact = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 3L, "1", "3")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("profile: approx path has no Expand in the plan and lands within HLL tolerance") {
    val docs = Tables.load(spark, sf0001, "documents")
    val approx = Quality.profile(docs, Seq("doc_id", "source"), exact = false)
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile must be a single-pass aggregate (no count-distinct Expand)")
    val exact = Quality.profile(docs, Seq("doc_id", "source"), exact = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    approx.collect().foreach { r =>
      val (c, est) = (r.getString(0), r.getLong(3))
      val ex = exact(c).toDouble
      assert(math.abs(est - ex) / ex < 0.1, s"$c: est=$est exact=$ex")
    }
  }

  // ---------------- expectations ----------------

  test("validate: hand-built violations are counted exactly") {
    import Quality._
    val df = Seq(
      (1L, Some(5.0), "ok"), (2L, Some(500.0), "ok"), // 500 out of range
      (2L, None, "bad!"),                             // null value, regex fail
      (3L, Some(7.0), "ok")                           // dup of key 2? no: key 3
    ).toDF("k", "v", "s")
      .unionByName(Seq((3L, Some(8.0), "ok")).toDF("k", "v", "s")) // dup key 3
    val dim = Seq(1L, 2L).toDF("dk") // 3L has no referent (2 rows violate)
    val out = validate(df, Seq(
      NotNull("not_null_v", "v"),
      InRange("range_v", "v", 0, 100),
      Matches("regex_s", "s", "^[a-z]+$"),
      Unique("unique_k", Seq("k")),
      ForeignKey("fk_k", "k", dim, "dk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("not_null_v" -> 1L, "range_v" -> 1L, "regex_s" -> 1L,
      "unique_k" -> 2L, "fk_k" -> 2L))
  }

  test("validate: scalar rules fold into one aggregate (single scan, no Expand beyond unique)") {
    import Quality._
    val df = Tables.load(spark, sf0001, "lineitem")
    val noUnique = validate(df, Seq(
      NotNull("a", "l_returnflag"), InRange("b", "l_quantity", 1, 49),
      Matches("c", "l_linestatus", "^[OF]$")))
    val plan = noUnique.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "scalar-only rules must not Expand")
    // scan appears once: all three rules share one aggregate
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
  }

  test("validate: UniqueApprox stays Expand-free and agrees with exact on clean/dirty keys") {
    import Quality._
    val df = Tables.load(spark, sf0001, "lineitem")
    val approx = validate(df, Seq(
      NotNull("a", "l_returnflag"),
      UniqueApprox("uq_line", Seq("l_orderkey", "l_linenumber")),
      UniqueApprox("uq_order", Seq("l_orderkey"))))
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "UniqueApprox must not Expand")
    val a = approx.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = validate(df, Seq(
      Unique("uq_line", Seq("l_orderkey", "l_linenumber")),
      Unique("uq_order", Seq("l_orderkey"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // both keys are genuinely dirty in this testdata (the generator
    // reuses (orderkey, linenumber)); approx must land near exact
    assert(e("uq_line") > 0 && e("uq_order") > 0)
    Seq("uq_line", "uq_order").foreach { k =>
      assert(math.abs(a(k) - e(k)).toDouble / e(k) < 0.1,
        s"$k: approx ${a(k)} vs exact ${e(k)}")
    }
    // a truly clean key estimates ~0 violations (HLL error can push the
    // raw difference slightly negative; the greatest(0,·) clamp holds)
    val clean = validate(spark.range(100000).toDF("id"),
      Seq(UniqueApprox("uq_id", Seq("id"))))
      .collect().head.getLong(1)
    assert(clean < 10000, s"clean key must report ~0 (within 2x HLL rsd=0.05), got $clean")
  }

  // ---------------- layout ----------------

  test("mortonInterleave: exact bit layout on known values") {
    // a=0b101 (bits 0,2), b=0b011 (bits 0,1) at 3 bits:
    // z bits: a0->0, b0->1, a1->2, b1->3, a2->4, b2->5
    // = 1 + 2 + 0 + 8 + 16 + 0 = 27
    val z = spark.range(1).select(
      Layout.mortonInterleave(Seq(lit(5L), lit(3L)), 3).as("z"))
      .head.getLong(0)
    assert(z == 27L, s"got $z")
    // interleave is monotone in each dim when the other is fixed
    val zs = (0 until 8).map(a => spark.range(1).select(
      Layout.mortonInterleave(Seq(lit(a.toLong), lit(4L)), 3)).head.getLong(0))
    assert(zs == zs.sorted, s"not monotone: $zs")
  }

  test("zorderBy: a trailing-dim predicate can prune partitions (linear sort cannot)") {
    // The data-skipping claim is PER-DIMENSION: a filter on the sort's
    // trailing dim prunes nothing under a linear layout (every file's
    // envelope spans ~the full range) but prunes most files under
    // z-order, where each partition's envelope covers a small fraction
    // of BOTH dims. Envelope fraction = avg per-partition
    // (max−min)/range. Dims chosen independent + high-cardinality
    // (orderkey × partkey; suppkey at sf0.001 has ~10 values).
    val df = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey")
    def fractions(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.agg(
        (max($"l_orderkey") - min($"l_orderkey")).cast("double"),
        (max($"l_partkey") - min($"l_partkey")).cast("double")).head
      val (ro, rp) = (r.getDouble(0), r.getDouble(1))
      val s = laid
        .withColumn("__pid", spark_partition_id())
        .groupBy("__pid")
        .agg((max($"l_orderkey") - min($"l_orderkey")).as("os"),
          (max($"l_partkey") - min($"l_partkey")).as("ps"))
        .agg(avg($"os"), avg($"ps")).head
      (s.getDouble(0) / ro, s.getDouble(1) / rp)
    }
    val nParts = 16
    val (zo, zp) = fractions(Layout.zorderBy(df,
      Seq("l_orderkey", "l_partkey"), bits = 8, numPartitions = nParts))
    val (lo, lp) = fractions(df.repartitionByRange(nParts, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey"))
    assert(lo < 0.2, s"sanity: linear sort clusters its own key ($lo)")
    assert(lp > 0.8, s"sanity: linear leaves the trailing dim unclustered ($lp)")
    assert(zo < 0.6 && zp < 0.6,
      s"z-order envelopes must shrink on BOTH dims, got ($zo, $zp)")
  }

  test("zorderBy: result is a pure re-layout (same rows, schema unchanged)") {
    val df = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    val laid = Layout.zorderBy(df, Seq("l_partkey", "l_suppkey"), bits = 4)
    assert(laid.schema == df.schema)
    assert(laid.exceptAll(df).isEmpty && df.exceptAll(laid).isEmpty)
  }

  // ---------------- zone map (file-skipping index) ----------------

  test("zoneMap: per-file envelopes reconstruct the global stats and index incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zmx_").toString
    val df = Tables.load(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_totalprice",
        // a column WITH nulls, so the null accounting is exercised
        when($"o_orderkey" % 3 === 0, $"o_custkey").as("c_sparse"))
    df.repartitionByRange(6, $"o_totalprice").write.mode("overwrite").parquet(dir)
    val zm = Layout.zoneMap(spark, dir, Seq("o_totalprice", "c_sparse"))
    assert(zm.count() == Layout.parquetFileCount(spark, dir),
      "one manifest row per data file")
    val g = zm.agg(sum($"n_rows"), min($"o_totalprice_min"),
      max($"o_totalprice_max"), sum($"c_sparse_nulls")).head
    val e = df.agg(count(lit(1)), min($"o_totalprice"), max($"o_totalprice"),
      sum(when($"c_sparse".isNull, 1L).otherwise(0L))).head
    assert(g.getLong(0) == e.getLong(0) && g.getLong(3) == e.getLong(3))
    assert(g.getDouble(1) == e.getDouble(1) && g.getDouble(2) == e.getDouble(2))
    // incremental by construction: indexing ONE file alone reproduces
    // exactly that file's manifest row (append batches index only their
    // own files and union with the stored manifest)
    val one = zm.orderBy($"file").head.getString(0)
    val inc = Layout.zoneMap(spark, one, Seq("o_totalprice", "c_sparse"))
    assert(inc.exceptAll(zm.filter($"file" === one)).isEmpty && inc.count() == 1)
  }

  test("zoneMap pruning: skips files, stays a result-superset, handles empty and all-null") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zmp_").toString
    Tables.load(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_totalprice")
      .repartitionByRange(8, $"o_totalprice").write.mode("overwrite").parquet(dir)
    val zm = Layout.zoneMap(spark, dir, Seq("o_totalprice"))
    val lo = lit(50000.0); val hi = lit(100000.0)
    val files = Layout.pruneFiles(zm, Layout.rangeEnvelope("o_totalprice", lo, hi))
    val total = Layout.parquetFileCount(spark, dir)
    assert(files.nonEmpty && files.size < total,
      s"a narrow box over a range-partitioned layout must skip files (kept ${files.size}/$total)")
    val exact = spark.read.parquet(dir)
      .filter($"o_totalprice".between(50000.0, 100000.0))
    val pruned = Layout.prunedParquet(spark, dir, files)
      .filter($"o_totalprice".between(50000.0, 100000.0))
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty)
    // a box missing every envelope → zero files; the scan still resolves
    val none = Layout.pruneFiles(zm,
      Layout.rangeEnvelope("o_totalprice", lit(-2.0), lit(-1.0)))
    assert(none.isEmpty)
    val empty = Layout.prunedParquet(spark, dir, none)
    assert(empty.schema == exact.schema && empty.count() == 0)
    // all-null file: NULL min/max → the range envelope prunes it
    // (correct — NULL never satisfies a range predicate); IS NULL
    // queries route on the nulls count instead
    val dir2 = java.nio.file.Files.createTempDirectory("graft_zmn_").toString
    spark.range(10).select(lit(null).cast("double").as("v")).coalesce(1)
      .write.mode("overwrite").parquet(dir2)
    spark.range(10).select(($"id" + 1.0).as("v")).coalesce(1)
      .write.mode("append").parquet(dir2)
    val zm2 = Layout.zoneMap(spark, dir2, Seq("v"))
    assert(Layout.pruneFiles(zm2,
      Layout.rangeEnvelope("v", lit(1.0), lit(5.0))).size == 1)
    assert(Layout.pruneFiles(zm2, $"v_nulls" > 0).size == 1)
  }

  test("zoneMap + zorderBy: a 2-D box prunes files in BOTH dims; linear sort cannot") {
    val df = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey")
    val r = df.agg(min($"l_orderkey"), max($"l_orderkey"),
      min($"l_partkey"), max($"l_partkey")).head
    // a box covering ~25 % of each dim's range
    val (oLo, oHi) = (r.getLong(0), r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 4)
    val (pLo, pHi) = (r.getLong(2), r.getLong(2) + (r.getLong(3) - r.getLong(2)) / 4)
    // one file per range partition (no maxRecordsPerFile splitting):
    // deterministic file counts, so the z-vs-linear comparison is a
    // property of the LAYOUT, not of write-task row distribution
    def survivors(laid: org.apache.spark.sql.DataFrame): (Seq[String], Long, String) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_zmz_").toString
      laid.write.mode("overwrite").parquet(dir)
      val zm = Layout.zoneMap(spark, dir, Seq("l_orderkey", "l_partkey"))
      val kept = Layout.pruneFiles(zm,
        Layout.rangeEnvelope("l_orderkey", lit(oLo), lit(oHi)) &&
        Layout.rangeEnvelope("l_partkey", lit(pLo), lit(pHi)))
      (kept, Layout.parquetFileCount(spark, dir), dir)
    }
    val (zKept, zTotal, zDir) = survivors(
      Layout.zorderBy(df, Seq("l_orderkey", "l_partkey"), bits = 8, numPartitions = 64))
    val (lKept, lTotal, lDir) = survivors(
      df.repartitionByRange(64, $"l_orderkey").sortWithinPartitions($"l_orderkey"))
    // the linear sort prunes on its leading dim only (~1/4 of files stay
    // by orderkey; partkey skips nothing inside them). Z-order must keep
    // a smaller fraction — both box dims contribute.
    assert(zKept.size.toDouble / zTotal < lKept.size.toDouble / lTotal,
      s"z-order must out-prune the linear layout: z=${zKept.size}/$zTotal linear=${lKept.size}/$lTotal")
    // and both layouts agree with the exact filter
    val want = df.filter($"l_orderkey".between(oLo, oHi) && $"l_partkey".between(pLo, pHi))
    for ((kept, dir) <- Seq((zKept, zDir), (lKept, lDir))) {
      val got = Layout.prunedParquet(spark, dir, kept)
        .filter($"l_orderkey".between(oLo, oHi) && $"l_partkey".between(pLo, pHi))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  // ---------------- per-file bloom index (point-lookup skipping) ----------------

  test("bloomIndex: point lookups prune hash-scattered files with no false negatives") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bix_").toString
    val orders = Tables.load(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    // scatter by an UNRELATED column: every file's orderkey envelope
    // spans the domain — the zone map keeps everything, the bloom wins
    orders.repartition(16, $"o_custkey").write.mode("overwrite").parquet(dir)
    val perFile = (orders.count() / 16).max(1)
    val idx = Layout.bloomIndex(spark, dir, "o_orderkey", perFile)
    assert(idx.count() == Layout.parquetFileCount(spark, dir))
    // the zone map really is useless on this layout (motivates the
    // bloom): a MID-domain key falls inside nearly every scattered
    // file's [min,max] envelope (an edge key could prune by accident)
    val zm = Layout.zoneMap(spark, dir, Seq("o_orderkey"))
    assert(Layout.pruneFiles(zm,
      Layout.rangeEnvelope("o_orderkey", lit(750L), lit(750L))).size >= 14)
    // a single key lives in exactly one file; bloom keeps it + ~fpp
    val one = Layout.pruneFilesByKeys(idx, Seq(750L))
    assert(one.nonEmpty && one.size <= 3,
      s"single-key lookup kept ${one.size}/16 files")
    // no false negatives across a key batch: pruned scan + exact
    // predicate == full-table filter
    val keys: Seq[Any] = (0L until 100L).map(_ * 13L)
    val kept = Layout.pruneFilesByKeys(idx, keys)
    val got = Layout.prunedParquet(spark, dir, kept)
      .filter($"o_orderkey".isin(keys: _*))
    val want = spark.read.parquet(dir).filter($"o_orderkey".isin(keys: _*))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("bloomIndex: width-sensitive hashing is absorbed, manifest survives parquet, strings index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_biw_").toString
    Tables.load(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey")
      .repartition(8, $"o_custkey").write.mode("overwrite").parquet(dir)
    val idx = Layout.bloomIndex(spark, dir, "o_orderkey", 256)
    // an Int probe against the Long-typed index must hash identically
    // (the manifest's key_type drives a cast before xxhash64)
    assert(Layout.pruneFilesByKeys(idx, Seq(42)).toSet ==
      Layout.pruneFilesByKeys(idx, Seq(42L)).toSet)
    // the manifest is plain data: parquet round-trip probes identically
    val mdir = java.nio.file.Files.createTempDirectory("graft_bim_").toString
    idx.write.mode("overwrite").parquet(mdir)
    val back = spark.read.parquet(mdir)
    assert(Layout.pruneFilesByKeys(back, Seq(42L)).toSet ==
      Layout.pruneFilesByKeys(idx, Seq(42L)).toSet)
    // string keys: unique customer names, one file each + fpp
    val cdir = java.nio.file.Files.createTempDirectory("graft_bis_").toString
    val cust = Tables.load(spark, sf0001, "customer").select($"c_custkey", $"c_name")
    cust.repartition(8, $"c_custkey").write.mode("overwrite").parquet(cdir)
    val cidx = Layout.bloomIndex(spark, cdir, "c_name", (cust.count() / 8).max(1))
    val name = cust.orderBy($"c_custkey").head.getString(1)
    val hits = Layout.pruneFilesByKeys(cidx, Seq(name))
    assert(hits.nonEmpty && hits.size <= 3)
    val got = Layout.prunedParquet(spark, cdir, hits).filter($"c_name" === name)
    assert(got.count() == cust.filter($"c_name" === name).count())
  }

  // ---------------- bloom-prefiltered join ----------------

  test("bloomEquiJoin: exactly the plain inner join; the prefilter actually thins the fact side") {
    import graft.operators.SkewJoin
    val fact = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    val dim = Tables.load(spark, sf0001, "orders")
      .filter($"o_orderkey" % 97 === 0)
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val got = SkewJoin.bloomEquiJoin(fact, dim, "l_orderkey")
    val want = fact.join(dim, "l_orderkey")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the prefilter passes matches + at most ~fpp of the rest (no false
    // negatives is the correctness property; thinning is the point)
    val bloom = graft.expr.Bloom.build(dim, "l_orderkey", dim.count())
    val passed = fact.filter(graft.expr.Bloom.mightContain(bloom, $"l_orderkey")).count()
    val matching = fact.join(dim.select("l_orderkey"), "l_orderkey").count()
    val nonMatching = fact.count() - matching
    assert(passed >= matching, "a Bloom prefilter must never drop a real match")
    assert(passed - matching <= (nonMatching * 0.05).toLong + 10,
      s"prefilter admitted ${passed - matching} of $nonMatching non-matching rows")
  }

  // The hive-style partitioned layout is THE 100 TB table format: one
  // directory per partition value, scans prune at the directory level
  // before reading a byte, and incremental loads rewrite only the
  // partitions they touch. OnlineStore already ships it for ingest_date;
  // this pins the three contract points generically.
  test("partitioned layout: directory layout, partition-pruned scan, dynamic overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    val docs = Tables.load(spark, sf0001, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    // 1. hive layout on disk
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("lang=")))
    // 2. a lang filter becomes a PartitionFilter — pruned BEFORE the
    // scan, no row-level filtering of other languages
    val scan = spark.read.parquet(dir).filter($"lang" === "en")
    val plan = scan.queryExecution.executedPlan.toString
    // NON-EMPTY PartitionFilters naming lang — `PartitionFilters: []`
    // with a row-level Filter above the scan would mean pruning
    // regressed (and would still satisfy a bare contains check)
    assert("""PartitionFilters: \[[^\]]*lang""".r.findFirstIn(plan).isDefined,
      s"lang filter must appear INSIDE PartitionFilters:\n$plan")
    val enCount = scan.count()
    assert(enCount == docs.filter($"lang" === "en").count())
    // 3. dynamic partition overwrite: rewriting ONE lang's rows leaves
    // every other partition untouched (static mode would drop them)
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      docs.filter($"lang" === "en").limit(3)
        .write.mode("overwrite").partitionBy("lang").parquet(dir)
      val after = spark.read.parquet(dir)
      assert(after.filter($"lang" === "en").count() == 3)
      assert(after.filter($"lang" =!= "en").count() ==
        docs.filter($"lang" =!= "en").count(),
        "dynamic overwrite must not touch unwritten partitions")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  // ---------------- incremental aggregate-table maintenance ----------------

  private def aggMeasures = {
    import MaterializedAgg._
    Seq(countRows("n"), sumOf($"v", "s"), sumSqOf($"v", "ssq"),
      minOf($"v", "mn"), maxOf($"v", "mx"))
  }

  private def aggRows(rows: (Option[Long], Option[Long])*) =
    rows.toDF("k", "v")

  test("MaterializedAgg: slice-build + merge == one-shot build") {
    import MaterializedAgg._
    val all = aggRows(Some(1L) -> Some(10L), Some(1L) -> Some(20L),
      Some(2L) -> Some(5L), Some(2L) -> Some(7L), Some(3L) -> Some(1L))
    val s1 = aggRows(Some(1L) -> Some(10L), Some(2L) -> Some(5L))
    val s2 = aggRows(Some(1L) -> Some(20L), Some(2L) -> Some(7L))
    val s3 = aggRows(Some(3L) -> Some(1L))
    val merged = merge(merge(build(s1, Seq("k"), aggMeasures),
        build(s2, Seq("k"), aggMeasures), Seq("k"), aggMeasures),
      build(s3, Seq("k"), aggMeasures), Seq("k"), aggMeasures)
    val oneShot = build(all, Seq("k"), aggMeasures)
    assert(merged.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(merged).isEmpty)
  }

  test("MaterializedAgg: NULL key merges as ONE row; empty delta is a no-op") {
    import MaterializedAgg._
    val stored = build(aggRows(None -> Some(3L), Some(1L) -> Some(1L)),
      Seq("k"), aggMeasures)
    val delta = build(aggRows(None -> Some(4L)), Seq("k"), aggMeasures)
    val out = merge(stored, delta, Seq("k"), aggMeasures).collect()
    assert(out.length == 2, "NULL-keyed rows must combine, not duplicate")
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) == 2 && nullRow.getLong(2) == 7)
    val empty = merge(stored, stored.limit(0), Seq("k"), aggMeasures)
    assert(empty.exceptAll(stored).isEmpty && stored.exceptAll(empty).isEmpty)
  }

  test("MaterializedAgg: NULL measure on one side keeps the other side's mass") {
    import MaterializedAgg._
    // sum over an all-NULL group is NULL (SQL): merging it with a real
    // partial must keep the real value; min/max skip the NULL side too
    val stored = build(Seq((1L, Some(5L))).toDF("k", "v"), Seq("k"), aggMeasures)
    val delta = build(Seq((1L, Option.empty[Long])).toDF("k", "v"),
      Seq("k"), aggMeasures)
    val r = merge(stored, delta, Seq("k"), aggMeasures).collect()(0)
    assert(r.getLong(1) == 2, "count sums both sides")
    assert(r.getLong(2) == 5 && r.getLong(3) == 25 &&
      r.getLong(4) == 5 && r.getLong(5) == 5,
      s"NULL partials must not erase stored mass: $r")
  }

  test("MaterializedAgg.retract: subtracts deletions, drops emptied keys, refuses min/max") {
    import MaterializedAgg._
    val subtractive = Seq(countRows("n"), sumOf($"v", "s"), sumSqOf($"v", "ssq"))
    val all = aggRows(Some(1L) -> Some(10L), Some(1L) -> Some(20L),
      Some(2L) -> Some(5L), None -> Some(3L))
    val stored = build(all, Seq("k"), subtractive)
    // delete one of key 1's rows and ALL of key 2's — key 2 leaves
    val deleted = aggRows(Some(1L) -> Some(20L), Some(2L) -> Some(5L))
    val out = retract(stored, build(deleted, Seq("k"), subtractive),
      Seq("k"), subtractive, dropWhen = Some($"n" === 0L))
    val want = build(aggRows(Some(1L) -> Some(10L), None -> Some(3L)),
      Seq("k"), subtractive)
    assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty,
      "retract must equal a rebuild over the surviving rows")
    // a delta keyed off rows never merged is a pipeline bug — loud
    intercept[IllegalArgumentException] {
      retract(stored, build(aggRows(Some(9L) -> Some(1L)), Seq("k"), subtractive),
        Seq("k"), subtractive)
    }
    // min/max have no subtractive inverse — refused by name
    val ex = intercept[IllegalArgumentException] {
      retract(stored.withColumn("mn", lit(0L)),
        stored.withColumn("mn", lit(0L)),
        Seq("k"), subtractive :+ minOf($"v", "mn"))
    }
    assert(ex.getMessage.contains("mn"))
  }

  test("MaterializedAgg: new keys append, untouched keys stream through") {
    import MaterializedAgg._
    val stored = build(aggRows(Some(1L) -> Some(10L)), Seq("k"), aggMeasures)
    val delta = build(aggRows(Some(9L) -> Some(2L)), Seq("k"), aggMeasures)
    val out = merge(stored, delta, Seq("k"), aggMeasures)
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 9L))
    assert(out(0).getLong(2) == 10 && out(1).getLong(2) == 2)
  }

  // ---------------- small-file compaction ----------------

  test("Layout.compact: bounded files per partition, data intact, hive layout kept") {
    val in = java.nio.file.Files.createTempDirectory("graft_cmp_in_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_out_").toString
    val docs = Tables.load(spark, sf0001, "documents")
    // simulate a micro-batch-fragmented table: 16 files per partition
    docs.repartition(16).write.mode("overwrite")
      .partitionBy("lang").parquet(in)
    val before = Layout.parquetFileCount(spark, in)
    val nLangs = docs.select("lang").distinct().count()
    assert(before >= nLangs * 2, s"fixture must be fragmented, got $before")
    val stats = Layout.compact(spark, in, out, Seq("lang"),
      targetRowsPerFile = 1000)
    assert(stats.filesBefore == before && stats.partitions == nLangs)
    // docs-per-lang at sf0.001 << 1000 → exactly one file per partition
    assert(stats.filesAfter == nLangs,
      s"expected $nLangs compacted files, got ${stats.filesAfter}")
    val re = spark.read.parquet(out)
    assert(re.count() == docs.count() &&
      re.select(docs.columns.map(col): _*).exceptAll(docs).isEmpty)
    // partition pruning must survive the rewrite
    val plan = re.filter($"lang" === "en").queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*lang""".r.findFirstIn(plan).isDefined)
  }

  test("Layout.compact: maxRecordsPerFile caps file sizes by construction") {
    val in = java.nio.file.Files.createTempDirectory("graft_cap_in_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cap_out_").toString
    val ev = Tables.load(spark, sf0001, "events")
      .withColumn("part", pmod($"user_id", lit(2)))
    ev.repartition(12).write.mode("overwrite").partitionBy("part").parquet(in)
    val target = 100L
    Layout.compact(spark, in, out, Seq("part"), targetRowsPerFile = target)
    // every output file individually respects the row cap
    val files = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(out))
    }
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= target, s"${f.getName} has $n rows > cap $target")
    }
    assert(spark.read.parquet(out).count() == ev.count())
  }

  test("Layout.compact: NULL-keyed partitions get their computed file budget (null-safe join)") {
    val in = java.nio.file.Files.createTempDirectory("graft_null_in_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_null_out_").toString
    // most rows land in the NULL partition (__HIVE_DEFAULT_PARTITION__)
    val ev = Tables.load(spark, sf0001, "events")
      .withColumn("part",
        when(pmod($"user_id", lit(10)) === 0, lit("kept")).otherwise(lit(null)))
    ev.repartition(12).write.mode("overwrite").partitionBy("part").parquet(in)
    val target = 100L
    // AQE's small-partition coalescing merges the (tiny) test buckets
    // back into one task and would mask exactly the parallelism this
    // test witnesses — disable it for the compact call only
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      Layout.compact(spark, in, out, Seq("part"), targetRowsPerFile = target)
    } finally spark.conf.set(coalesceKey, prev)
    val re = spark.read.parquet(out)
    assert(re.count() == ev.count())
    val nullRows = re.filter($"part".isNull).count()
    assert(nullRows > target, "fixture must overflow one file in the NULL partition")
    // the NULL partition must be WRITTEN IN PARALLEL across its
    // ~ceil(n/target) bucket of tasks — a plain (non-null-safe) counts
    // join would leave __files NULL for these rows, collapse them all
    // into bucket 0, and serialize the whole partition through ONE
    // write task (maxRecordsPerFile still splits the files, so file
    // COUNT can't witness the bug; distinct writer-task prefixes can)
    val nullDir = new java.io.File(out, "part=__HIVE_DEFAULT_PARTITION__")
    assert(nullDir.isDirectory, s"missing ${nullDir}")
    val taskPrefixes = nullDir.listFiles().toSeq
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getName.split("-").take(2).mkString("-")).distinct
    assert(taskPrefixes.length > 1,
      s"NULL partition written by ${taskPrefixes.length} task(s) — " +
        "its file budget was lost (non-null-safe counts join)")
  }
}
