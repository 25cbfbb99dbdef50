package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Testdata table loaders (see TESTDATA.md / FIXTURES.md §E).
  *
  * All tables are parquet under `/root/testdata/sfN/<name>.parquet`. The
  * `events.ts` column has shipped under several parquet encodings across
  * testdata regenerations — TIMESTAMP(NANOS) (read as LongType nanos via
  * `spark.sql.legacy.parquet.nanosAsLong=true`) and TIMESTAMP(MICROS)
  * with `isAdjustedToUTC=false` (read by Spark 4 as TIMESTAMP_NTZ). Both
  * are normalized HERE, in one place, to a plain session-zoned
  * `ts: timestamp` so no downstream query ever sees the drift. The
  * session time zone is pinned UTC ([[configure]]), so the NTZ→LTZ cast
  * reinterprets the same wall-clock instant without shifting it.
  */
object Tables {
  /** Resolved-table memo per session: `spark.read.parquet` re-reads a
    * footer for schema inference and rebuilds a file index on EVERY
    * call — ~70 ms of driver work per table reference, paid by every
    * query construction when tables resolve by path instead of through
    * a catalog (measured: 200 warm loads = 13.9 s; the bench pays it
    * ~350× per pass). A catalog/metastore resolves a table's schema
    * ONCE per session — this memo is that catalog behavior for the
    * path-addressed testdata tables. It caches the LOGICAL PLAN only:
    * execution still scans the parquet files fresh on every action
    * (no data or result is cached; the plan is immutable and safely
    * shared across queries). Keyed weakly by session so test sessions
    * don't leak. */
  private val loadMemo =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = loadMemo.synchronized {
      var m = loadMemo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        loadMemo.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(s"$dir/$name", _ => loadUncached(spark, dir, name))
  }

  private def loadUncached(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    // Integer `div`, not `/`: the double division rounds 1.7e18 ns to the
    // nearest 256 ns before dividing, which can flip a floor-to-second
    // boundary vs an engine computing from exact nanos.
    val df =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    // Any NTZ column (parquet micros with isAdjustedToUTC=false) becomes
    // session-zoned TimestampType — identity under the pinned-UTC session —
    // so the whole engine keeps ONE timestamp type regardless of how the
    // testdata generator encoded it.
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType).map(_.name)
    ntz.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  /** Canonical timestamp→epoch-seconds conversion. All query-side epoch
    * math routes through here so a future type drift is absorbed in one
    * place: the leading cast to TimestampType is a no-op for the
    * already-normalized loader output and converts NTZ (session TZ is
    * UTC) if a caller ever feeds a raw column. */
  def tsSec(c: Column): Column = c.cast(TimestampType).cast(LongType)

  /** All testdata table names. */
  val AllTables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view plus graft's native SQL
    * functions (`haversine_miles`, `array_dot`) — the `spark.sql(...)`
    * face of the engine: after this, any query in the inventory is
    * writable as plain SQL against the named tables. */
  def createViews(spark: SparkSession, dir: String): Unit = {
    AllTables.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    graft.expr.HaversineMiles.register(spark)
    graft.expr.ArrayDotProduct.register(spark)
    graft.expr.Aggregators.register(spark)
    registeredDir.put(spark, dir)
  }

  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** [[createViews]] unless this session already has views for `dir` —
    * the cheap path for SQL-surface queries called repeatedly (each
    * registration re-reads ten parquet footers). The cache alone can't
    * see a view dropped or overwritten elsewhere in the session, so the
    * fast path also probes one sentinel table; a vanished sentinel
    * forces re-registration. (A view REPLACED with different content
    * under the same name is indistinguishable from ours by name alone —
    * callers owning that scenario should call [[createViews]] directly.) */
  def ensureViews(spark: SparkSession, dir: String): Unit =
    if (registeredDir.get(spark) != dir ||
        !spark.catalog.tableExists(AllTables.head)) createViews(spark, dir)

  /** Standard session config every entry point (Verify/Bench/tests) applies. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    // let AQE apply its normal partition coalescing INSIDE cached plans
    // (off by default in Spark): persisted intermediates — the graph
    // operators' edge tables, the bm25 postings — otherwise pin exactly
    // spark.sql.shuffle.partitions partitions however small the data,
    // and every downstream pass over the cache pays that task count.
    // Scale-adaptive by construction: AQE only coalesces shuffles below
    // the advisory size, so cluster-scale caches keep full parallelism
    // (guide §2 — derive partitioning from input size, not a constant).
    // Result-safe: no declared query computes partition-dependent
    // values over a cached plan (rand/sample/salt queries read base
    // scans), re-verified by a byte-level diff of all 200 dumped
    // outputs with the flag on vs off.
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // modern MICROS instead of the deprecated INT96 default: INT96
    // footers carry no usable min/max, so snapshot stats-in-log could
    // never prune a timestamp retention column (the single most common
    // one) on engine-written tables
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.ui.enabled", "false")
}
