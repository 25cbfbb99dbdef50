package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata table loaders (see TESTDATA.md / FIXTURES.md §E).
  *
  * All tables are parquet under `/root/testdata/sfN/<name>.parquet`. The
  * `events` table carries a parquet TIMESTAMP(NANOS) column which Spark's
  * micros-based TimestampType cannot hold natively; with
  * `spark.sql.legacy.parquet.nanosAsLong=true` Spark reads it as LongType
  * nanoseconds and we normalize to a micros TimestampType column here, in
  * one place, so every query sees a plain `ts: timestamp`.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Integer `div`, not `/`: the double division rounds 1.7e18 ns to the
    // nearest 256 ns before dividing, which can flip a floor-to-second
    // boundary vs an engine computing from exact nanos.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

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
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
}
