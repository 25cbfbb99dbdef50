package graft.operators

import java.io.ByteArrayInputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import org.apache.spark.util.sketch.BloomFilter

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * standard answer to "queries filter on BOTH x and y but a sort can
  * only privilege one". Linearly sorting 100 TB by `x` gives parquet
  * min/max pruning on `x` and nothing on `y`; interleaving the bits of
  * both ranks gives every file a tight min/max envelope on BOTH, so
  * either predicate prunes ~√(files) instead of scanning everything.
  * Same layout trick Delta/Iceberg OPTIMIZE ZORDER applies — built here
  * from plain Spark primitives: one quantile aggregate, one projection,
  * one range repartition + local sort.
  */
object Layout {

  /** Morton value: interleave the low `bits` bits of each (non-negative
    * integral) column — bit i of dimension d lands at position
    * `i * n + d`. Pure bit arithmetic on longs → whole-stage-codegen'd,
    * zero shuffle. Requires `bits * cols.length <= 63`. */
  def mortonInterleave(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 1 && bits >= 1 && bits * n <= 63,
      s"need bits*dims <= 63, got $bits*$n")
    val terms = for {
      (c, d) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** Per-column equi-depth bucket ids (0 .. nBuckets−1) from one
    * `approx_percentile` aggregate: ranks, not raw values, feed the
    * interleave, so skewed columns still spread across the curve.
    * The boundary arrays are driver-bounded literals (nBuckets−1 values
    * per column); the bucket lookup is a literal-array comparison scan
    * — no join, no shuffle, riding the row projection. */
  private def bucketIds(df: DataFrame, cols: Seq[String],
      nBuckets: Int): Seq[Column] = {
    val pcts = array((1 until nBuckets)
      .map(i => lit(i.toDouble / nBuckets)): _*)
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), pcts, lit(10000)).as(c))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val bs = bounds.getSeq[Double](i)
      size(filter(array(bs.map(lit): _*), b => b <= col(c).cast("double")))
        .cast("long")
    }
  }

  /** Re-layout `df` along a Z-order curve over `cols`: rank each column
    * into `2^bits` equi-depth buckets, interleave the bucket ids into a
    * Morton value, range-partition on it, sort within partitions.
    * Downstream writes then produce files whose min/max envelopes are
    * tight in EVERY clustered dimension (LayoutSpec measures the
    * per-partition spread shrink vs a linear sort).
    *
    * Cost at scale: one quantile aggregate (driver gets nBuckets−1
    * doubles per column), one codegen'd projection, one range exchange
    * — exactly what a linear `orderBy` costs. The curve value is
    * dropped after the sort; the visible schema is unchanged. */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 8,
      numPartitions: Int = 0): DataFrame = {
    require(cols.size >= 2, "z-order needs >= 2 dimensions")
    val ids = bucketIds(df, cols, 1 << bits)
    val withZ = df.withColumn("__z", mortonInterleave(ids, bits))
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }

  /** Before/after file counts from a [[compact]] run. */
  final case class CompactStats(filesBefore: Long, filesAfter: Long,
      partitions: Long)

  /** Count leaf parquet data files under `path` (recursing through
    * hive-partition directories; `_`-prefixed metadata files excluded). */
  def parquetFileCount(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: Path): Long = {
      val entries = fs.listStatus(dir)
      entries.map { e =>
        if (e.isDirectory) walk(e.getPath)
        else if (e.getPath.getName.startsWith("_") ||
          e.getPath.getName.startsWith(".")) 0L
        else 1L
      }.sum
    }
    walk(p)
  }

  /** Per-FILE zone map (min/max/null-count envelope) over `cols` — the
    * data-skipping index Delta/Iceberg keep in their metadata layer,
    * built here as a plain DataFrame from one column-pruned scan using
    * the `_metadata.file_path` hidden column. At 100 TB the build cost
    * is one scan of ONLY the indexed columns (ReadSchema stays pruned;
    * `_metadata` is constant-folded per file, not read from disk), and
    * the manifest is file-count-sized — the same budget any table
    * format's metadata layer holds. The groupBy key is the file itself,
    * so the index is incremental BY CONSTRUCTION: index only the files
    * a new batch appended and union with the stored manifest.
    *
    * Schema: `file`, `n_rows`, then per col `<c>_min`, `<c>_max`,
    * `<c>_nulls`. An all-null file surfaces NULL min/max (a range
    * envelope then evaluates NULL → the file prunes, which is correct:
    * NULLs never satisfy a range predicate). */
  def zoneMap(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    zoneMapOf(spark.read.parquet(path), cols)

  /** [[zoneMap]] over an explicit file list — e.g. ONE snapshot
    * version's files ([[Snapshots.filesAt]]), so versioned tables index
    * without sweeping other versions' commit directories. */
  def zoneMapFiles(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(files.nonEmpty, "zoneMapFiles: no files")
    zoneMapOf(spark.read.parquet(files: _*), cols)
  }

  private def zoneMapOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zoneMap: no columns")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c => Seq(
      min(col(c)).as(s"${c}_min"),
      max(col(c)).as(s"${c}_max"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    }
    df.select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Envelope-intersection predicate over a [[zoneMap]] manifest: true
    * when the file MIGHT contain a row with `c` in [lo, hi] — the
    * file-skipping test for a range/equality predicate (equality =
    * lo == hi). NULL-only files evaluate NULL → pruned (correct for
    * range predicates; use `col(s"${c}_nulls") > 0` for IS NULL). */
  def rangeEnvelope(c: String, lo: Column, hi: Column): Column =
    col(s"${c}_min") <= hi && col(s"${c}_max") >= lo

  /** Files surviving a skipping predicate over the manifest's stats
    * columns. Driver-bounded at manifest scale (file paths only) —
    * exactly what every query planner holds to enumerate a scan's
    * splits. AND several [[rangeEnvelope]]s for a multi-dimensional box
    * (tight in every dimension after a [[zorderBy]] layout). */
  def pruneFiles(zmap: DataFrame, keep: Column): Seq[String] =
    zmap.filter(keep).select("file").collect().map(_.getString(0)).toSeq

  /** Scan ONLY the surviving files. Pruning is a correctness-neutral
    * SUPERSET: the caller still applies the exact row predicate — the
    * zone map only removed files that could not contain a match, the
    * same contract as parquet row-group min/max skipping one level up.
    * Empty survivor list → empty relation with the schema read from the
    * full path (a query whose box misses every file must still resolve). */
  def prunedParquet(spark: SparkSession, path: String,
      files: Seq[String]): DataFrame =
    if (files.isEmpty)
      spark.read.parquet(path).limit(0)
    else spark.read.parquet(files: _*)

  /** Per-FILE Bloom-filter index over `keyCol` — the point-lookup
    * complement to [[zoneMap]]: when keys are hash-scattered across
    * files (any layout not sorted on the key), every file's min/max
    * envelope spans the whole domain and range pruning keeps
    * everything; a per-file Bloom answers "might THIS file contain key
    * k" and prunes to ~1 file + fpp·files. Same structure parquet's own
    * column bloom filters and Delta's BLOOMFILTER index hold, built as
    * a plain manifest DataFrame: one column-pruned scan, one grouped
    * `BloomFilterAggregate` per file (partial blobs OR-merged across
    * partitions — never a per-item driver loop).
    *
    * `expectedItemsPerFile` sizes the filter (≈18 KB/file at 4 k items,
    * 1 % fpp). Undersizing SATURATES the filter — fpp rises, more files
    * survive — but never drops a real match: pruning stays a
    * correctness-neutral superset. NULL keys hash to the seed value;
    * equality probes are for non-null keys (SQL `=` never matches NULL).
    *
    * The manifest records `key_type` (the indexed column's Catalyst
    * type as JSON) because xxhash64 is WIDTH-SENSITIVE: an Int probe
    * against a Long-typed index would silently hash differently and
    * miss every file. [[pruneFilesByKeys]] casts probe keys to the
    * recorded type, so the manifest is self-contained and survives a
    * parquet round-trip — persist it next to the table exactly like a
    * table format's metadata layer. */
  def bloomIndex(spark: SparkSession, path: String, keyCol: String,
      expectedItemsPerFile: Long, fpp: Double = 0.01): DataFrame =
    bloomIndexOf(spark.read.parquet(path), keyCol, expectedItemsPerFile, fpp)

  /** [[bloomIndex]] over an explicit file list (e.g. one snapshot
    * version's files) — same pairing as [[zoneMapFiles]]. */
  def bloomIndexFiles(spark: SparkSession, files: Seq[String], keyCol: String,
      expectedItemsPerFile: Long, fpp: Double = 0.01): DataFrame = {
    require(files.nonEmpty, "bloomIndexFiles: no files")
    bloomIndexOf(spark.read.parquet(files: _*), keyCol, expectedItemsPerFile, fpp)
  }

  private def bloomIndexOf(df: DataFrame, keyCol: String,
      expectedItemsPerFile: Long, fpp: Double): DataFrame = {
    require(expectedItemsPerFile > 0, "bloomIndex: expectedItemsPerFile must be > 0")
    val keyType = df.schema(keyCol).dataType
    val numBits = BloomFilter.optimalNumOfBits(expectedItemsPerFile, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(expression(col(keyCol)))),
      Literal(expectedItemsPerFile), Literal(numBits)).toAggregateExpression()
    df.select(col("_metadata.file_path").as("file"), col(keyCol))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"), column(agg).as("key_bloom"))
      .withColumn("key_type", lit(keyType.json))
  }

  /** A path may appear as a FileSystem-qualified string (`file:/x`, a
    * snapshot manifest's form) or `_metadata.file_path`'s URI form
    * (`file:///x`, an index manifest's key). Both forms, for driver-side
    * membership tests across the two layers. */
  private def pathForms(p: String): Seq[String] = {
    val n = new Path(p).toString
    val alt =
      if (n.startsWith("file:/") && !n.startsWith("file:///"))
        "file://" + n.stripPrefix("file:")
      else n
    Seq(p, n, alt).distinct
  }

  /** Apply a table's file-set delta to a [[zoneMap]]-style manifest
    * WITHOUT rebuilding it: drop `removed` files' rows, index and
    * append `added` files' rows. Paired with
    * [[Snapshots.changedFiles]], this keeps the skipping index in
    * lockstep with every commit — append ingest indexes O(new files),
    * a copy-on-write replace re-indexes O(touched files) — instead of
    * the O(table) rebuild that is unpayable per-commit at 100 TB.
    * `removed` is file-path-scale and probed via an in-list (a replace
    * touches a handful of files; after a full overwrite/compaction,
    * rebuild instead). */
  def zoneMapApply(spark: SparkSession, zmap: DataFrame, cols: Seq[String],
      added: Seq[String], removed: Seq[String]): DataFrame = {
    val rm = removed.flatMap(pathForms)
    val kept =
      if (rm.isEmpty) zmap
      else zmap.filter(!col("file").isin(rm: _*))
    if (added.isEmpty) kept
    else kept.unionByName(zoneMapFiles(spark, added, cols))
  }

  /** [[zoneMapApply]]'s twin for a [[bloomIndex]] manifest: same
    * drop-and-append fold, re-hashing only the added files. Size the
    * filter with the SAME `expectedItemsPerFile`/`fpp` as the original
    * build so probe behavior stays uniform across old and new rows. */
  def bloomIndexApply(spark: SparkSession, index: DataFrame, keyCol: String,
      expectedItemsPerFile: Long, added: Seq[String], removed: Seq[String],
      fpp: Double = 0.01): DataFrame = {
    val rm = removed.flatMap(pathForms)
    val kept =
      if (rm.isEmpty) index
      else index.filter(!col("file").isin(rm: _*))
    if (added.isEmpty) kept
    else kept.unionByName(
      bloomIndexFiles(spark, added, keyCol, expectedItemsPerFile, fpp))
  }

  /** Files that MIGHT contain any of `keys` per a [[bloomIndex]]
    * manifest: no false negatives (the survivor scan + exact predicate
    * equals the full-table filter), ~fpp false positives. The manifest
    * is collected and probed driver-side — file-count-sized, the same
    * budget [[pruneFiles]] and every planner's split enumeration hold —
    * and each probe key is cast to the recorded `key_type` before
    * hashing (see the width-sensitivity note on [[bloomIndex]]). */
  def pruneFilesByKeys(index: DataFrame, keys: Seq[Any]): Seq[String] = {
    require(keys.nonEmpty, "pruneFilesByKeys: no keys")
    val rows = index.select("file", "key_bloom", "key_type").collect()
    if (rows.isEmpty) return Seq.empty
    val keyType = DataType.fromJson(rows.head.getString(2))
    val hashes = keys.map { k =>
      val cast = Cast(Literal(k), keyType, Some("UTC")).eval(InternalRow.empty)
      require(cast != null, s"pruneFilesByKeys: key $k is null or not castable to $keyType")
      new XxHash64(Seq(Literal.create(cast, keyType)))
        .eval(InternalRow.empty).asInstanceOf[Long]
    }
    rows.toSeq.flatMap { r =>
      val bf = BloomFilter.readFrom(
        new ByteArrayInputStream(r.getAs[Array[Byte]]("key_bloom")))
      if (hashes.exists(bf.mightContainLong)) Some(r.getString(0)) else None
    }
  }

  /** Small-file compaction for a hive-partitioned parquet table — the
    * maintenance op every streaming ingest needs: each micro-batch
    * appends a file per partition, and a year of 1-minute batches turns
    * a 100 TB table into 10⁸ kilobyte files whose OPEN cost dominates
    * every scan. Rewrite each partition's rows into
    * ceil(rows / targetRowsPerFile) files.
    *
    * Shape at scale: one scan of the input, one count aggregate per
    * partition key (driver gets partition-cardinality rows — the same
    * budget any metastore holds), one hash exchange keyed on
    * (partition, bucket) so file sizes are bounded BY CONSTRUCTION, one
    * partitioned write. Writes to `outPath` (staging): atomically
    * swapping staging over live is the caller's move — same protocol as
    * Delta/Iceberg OPTIMIZE, which this mirrors with plain Spark
    * primitives. Rows within a rewritten file keep no particular order;
    * pair with [[zorderBy]] when min/max pruning matters more than file
    * count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      partitionCols: Seq[String],
      targetRowsPerFile: Long = 4L * 1024 * 1024): CompactStats = {
    require(partitionCols.nonEmpty, "compact: no partition columns")
    val df = spark.read.parquet(inPath)
    val counts = df.groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__files",
        ceil(col("__n").cast("double") / targetRowsPerFile).cast("int"))
      .drop("__n")
    val nParts = counts.count()
    // Two mechanisms, two jobs: the row-hash bucket spreads a large
    // partition across its ~file-budget of WRITE TASKS (parallelism —
    // without it one task serializes the whole partition), while
    // maxRecordsPerFile enforces the per-file row cap EXACTLY even when
    // distinct (partition, bucket) groups hash-collide into one task.
    // NULL-SAFE (<=>) join keys: hive's __HIVE_DEFAULT_PARTITION__ rows
    // carry NULL partition values, and a plain equi-join would never
    // match them to their counts row — __files would be NULL, the
    // greatest(NULL, 1) fallback would collapse the whole NULL-keyed
    // partition to bucket 0, and its write parallelism silently to one
    // task (the MaterializedAgg.merge key idiom)
    // counts derives from df, so the key columns are RENAMED on the
    // counts side before joining (DetectAmbiguousSelfJoin would reject
    // df(c) <=> counts(c) as ambiguous)
    val keyed = counts.select(
      partitionCols.map(c => col(c).as(s"__k_$c")) :+ col("__files"): _*)
    val bucketed = df.join(broadcast(keyed),
        partitionCols.map(c => df(c) <=> keyed(s"__k_$c")).reduce(_ && _), "left")
      .select(df.columns.map(df(_)) :+ col("__files"): _*)
      .withColumn("__bucket",
        pmod(hash(df.columns.map(col): _*), greatest(col("__files"), lit(1))))
      .drop("__files")
    val filesBefore = parquetFileCount(spark, inPath)
    bucketed
      .repartition(partitionCols.map(col) :+ col("__bucket"): _*)
      .drop("__bucket")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(outPath)
    CompactStats(filesBefore, parquetFileCount(spark, outPath), nParts)
  }
}
